package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism conventions shared by every verified query.
  *
  * The driver hash-compares our results against a DuckDB oracle, and Spark
  * distributes aggregation across partitions, so floating-point sums are
  * NOT reproducible (double addition is order-dependent). Every money/ratio
  * measure therefore follows one convention, mirrored 1:1 in the oracle SQL
  * ([[OracleSql]]):
  *
  *   1. per-row value computed in double (deterministic per row, identical
  *      IEEE result in both engines), cast to DECIMAL(18,6);
  *   2. SUM over the decimal (exact, associative → partition-order
  *      independent);
  *   3. ROUND(...,2) → DECIMAL(18,2) → DOUBLE at the final projection
  *      (scale-2 decimals convert to double via an exact int/100.0 divide —
  *      correctly rounded and identical in both engines; casting a scale-6
  *      decimal directly can double-round once the unscaled value exceeds
  *      2^53).
  *
  * Averages are exact-decimal-sum / count. Dates are fixed ("as-of"
  * 2002-01-01) instead of current_date() (reference uses CURRENT_DATE at
  * sql/queries/analytical_queries.sql:109 — non-deterministic, SURVEY §7.4).
  * Every query orders by a unique key set so row order is a total order.
  */
object Det {
  val AsOfDate = "2002-01-01"
  /** `events` lives in Jan 2024 — windows over it anchor here. */
  val AsOfEventDate = "2024-02-01"
  val AsOfTs   = "2024-02-01 00:00:00"
  /** Fixed "previous pipeline run finished" instant for the monitoring
    * health rollup (the reference reads it from the prior execution
    * report — non-deterministic, replaced per SURVEY §7.4). 1.5h before
    * [[AsOfTs]], so the registered query exercises the `ok` branch; the
    * >25h `critical` branch is spec-covered with an injected timestamp. */
  val LastRunTs = "2024-01-31 22:30:00"

  /** Per-row money cast: double → DECIMAL(18,6). */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Exact decimal sum finished as a scale-2 decimal (keep decimal when the
    * value feeds a window/second aggregate). */
  def msumDec(c: Column): Column = round(sum(dec6(c)), 2).cast(DecimalType(18, 2))

  /** Exact decimal sum finished as double — the standard output measure. */
  def msum(c: Column): Column = msumDec(c).cast(DoubleType)

  /** Exact mean: decimal sum / row count, in double. */
  def mavg(c: Column): Column = msum(c) / count(lit(1))

  /** DECIMAL(18,2) → DOUBLE (exact-int / 100.0, safe). */
  def d2d(c: Column): Column = c.cast(DoubleType)
}

/** SQL-string twins of [[Det]] for the DuckDB oracle. */
object Sql {
  def dec6(e: String): String   = s"CAST($e AS DECIMAL(18,6))"
  def msumDec(e: String): String = s"CAST(ROUND(SUM(CAST($e AS DECIMAL(18,6))),2) AS DECIMAL(18,2))"
  def msum(e: String): String   = s"CAST(${msumDec(e)} AS DOUBLE)"
  def mavg(e: String): String   = s"${msum(e)} / COUNT(*)"
}
