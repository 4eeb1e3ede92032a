package graft.monitor

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline-monitoring operators — the reference's 3σ volume anomaly
  * detection over a 30-day daily-count window
  * (reference: scripts/monitoring/pipeline_monitor.py:164-189 +
  * sql/queries/monitoring_queries.sql:30-37) and per-source data-freshness
  * lag with thresholded status (pipeline_monitor.py:143-157), computed
  * over the `events` table against the fixed as-of timestamp
  * (non-deterministic CURRENT_* replaced per SURVEY §7.4).
  *
  * Determinism: mean/stddev are derived from exact integer sums
  * (Σn, Σn²) so the double arithmetic is a fixed expression tree —
  * identical in Spark and DuckDB regardless of partitioning — instead of
  * a distributed float stddev aggregate, whose summation order is not.
  */
object Monitor {
  type Q = (SparkSession, String) => DataFrame

  /** Daily event counts in the 30-day window before as-of, flagged when
    * outside mean ± 3σ (pipeline_monitor.py:171-183). */
  def volumeAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val asOf = to_date(lit(Det.AsOfEventDate))
    val daily = Tables.events(spark, dir)
      .filter(to_date(col("ts")) >= date_sub(asOf, 30) && to_date(col("ts")) < asOf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("event_count"))
    val stats = daily.agg(
      count(lit(1)).as("n"),
      sum("event_count").as("s"),
      sum(col("event_count") * col("event_count")).as("sq"))
    val mean = col("s").cast(DoubleType) / col("n").cast(DoubleType)
    // n = 1 would divide by zero (Spark: NULL with ANSI off; DuckDB:
    // NaN — the engines would then DISAGREE on is_anomaly). A single
    // observation has no dispersion estimate: stddev NULL, not anomalous.
    val std = when(col("n") > 1,
      sqrt((col("sq").cast(DoubleType) - col("n").cast(DoubleType) * mean * mean)
        / (col("n").cast(DoubleType) - lit(1.0))))
      .otherwise(lit(null).cast(DoubleType))
    daily.crossJoin(broadcast(stats)).select(
      date_format(col("day"), "yyyy-MM-dd").as("day"), col("event_count"),
      mean.as("mean_count"),
      std.as("stddev_count"),
      coalesce(abs(col("event_count").cast(DoubleType) - mean) > lit(3.0) * std,
        lit(false)).as("is_anomaly"))
  }

  val volumeAnomalySql: String = s"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS event_count
  FROM events
  WHERE CAST(ts AS DATE) >= DATE '${Det.AsOfEventDate}' - INTERVAL 30 DAY
    AND CAST(ts AS DATE) < DATE '${Det.AsOfEventDate}'
  GROUP BY CAST(ts AS DATE)),
stats AS (
  SELECT COUNT(*) AS n, SUM(event_count) AS s, SUM(event_count * event_count) AS sq
  FROM daily)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.event_count,
       CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean_count,
       CASE WHEN s.n > 1 THEN
         sqrt((CAST(s.sq AS DOUBLE) - CAST(s.n AS DOUBLE) * (CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE)) * (CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE)))
              / (CAST(s.n AS DOUBLE) - 1.0)) END AS stddev_count,
       coalesce(ABS(CAST(d.event_count AS DOUBLE) - CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE))
         > 3.0 * CASE WHEN s.n > 1 THEN
                    sqrt((CAST(s.sq AS DOUBLE) - CAST(s.n AS DOUBLE) * (CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE)) * (CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE)))
                         / (CAST(s.n AS DOUBLE) - 1.0)) END, false) AS is_anomaly
FROM daily d CROSS JOIN stats s"""

  /** Per-source freshness: hours since last event vs as-of, with the
    * reference's threshold statuses (staging>24h critical, >1h delayed —
    * pipeline_monitor.py:146-157). Lag computed on whole seconds (both
    * engines truncate identically). */
  def freshnessLag(spark: SparkSession, dir: String): DataFrame = {
    val asOfSec = unix_timestamp(lit(Det.AsOfTs), "yyyy-MM-dd HH:mm:ss")
    val lagHours = (asOfSec - unix_timestamp(max(col("ts")))).cast(DoubleType) / lit(3600.0)
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(lagHours.as("lag_hours"))
      .select(
        col("event_type"), col("lag_hours"),
        when(col("lag_hours") > 24.0, "critical")
          .when(col("lag_hours") > 1.0, "delayed")
          .otherwise("fresh").as("status"))
  }

  val freshnessLagSql: String = s"""
SELECT event_type,
       CAST(CAST(floor(epoch(TIMESTAMP '${Det.AsOfTs}')) AS BIGINT)
            - CAST(floor(epoch(MAX(ts))) AS BIGINT) AS DOUBLE) / 3600.0 AS lag_hours,
       CASE WHEN CAST(CAST(floor(epoch(TIMESTAMP '${Det.AsOfTs}')) AS BIGINT)
                      - CAST(floor(epoch(MAX(ts))) AS BIGINT) AS DOUBLE) / 3600.0 > 24.0 THEN 'critical'
            WHEN CAST(CAST(floor(epoch(TIMESTAMP '${Det.AsOfTs}')) AS BIGINT)
                      - CAST(floor(epoch(MAX(ts))) AS BIGINT) AS DOUBLE) / 3600.0 > 1.0 THEN 'delayed'
            ELSE 'fresh' END AS status
FROM events
GROUP BY event_type"""

  val inventory: Map[String, Q] = Map(
    "monitor_volume_anomaly" -> (volumeAnomaly _),
    "monitor_freshness_lag"  -> (freshnessLag _))

  val oracle: Map[String, String] = Map(
    "monitor_volume_anomaly" -> volumeAnomalySql,
    "monitor_freshness_lag"  -> freshnessLagSql)
}
