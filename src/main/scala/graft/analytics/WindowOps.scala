package graft.analytics

import graft.{Det, Sql}
import graft.warehouse.OracleSql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full window-function family the reference never uses (SURVEY §2.5
  * notes its only window is the %-of-total in Q5): ranking, lag, and a
  * running frame — per-customer purchase timelines with order rank, gap
  * since the previous order, and cumulative revenue.
  *
  * Scale posture: one shuffle on the partition key (customer), then all
  * three functions evaluate in a single WindowExec pass over each
  * partition — no per-function re-sort (same partitionBy/orderBy spec).
  */
object WindowOps {
  type Q = (SparkSession, String) => DataFrame

  /** Per-customer order timeline: rank, days since previous order,
    * running revenue (rows-between frame), and share of the customer's
    * total. Grain: one row per (customer, order). */
  def customerTimeline(spark: SparkSession, dir: String): DataFrame = {
    val f = graft.warehouse.Warehouse.fact(spark, dir)
    val orders = f.groupBy(col("o_custkey").as("customer_id"),
        col("l_orderkey").as("order_id"), col("order_date"))
      .agg(Det.msumDec(col("line_total")).as("order_total"))
    val w = Window.partitionBy("customer_id").orderBy("order_date", "order_id")
    orders.select(
        col("customer_id"), col("order_id"),
        date_format(col("order_date"), "yyyy-MM-dd").as("order_date"),
        col("order_total"),
        row_number().over(w).cast(LongType).as("order_rank"),
        datediff(col("order_date"), lag(col("order_date"), 1).over(w))
          .cast(LongType).as("days_since_prev"),
        sum(col("order_total"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast(DoubleType).as("running_revenue"),
        (col("order_total").cast(DoubleType) * lit(100.0) /
          sum(col("order_total")).over(Window.partitionBy("customer_id"))
            .cast(DoubleType)).as("pct_of_customer_revenue"))
      .withColumn("order_total", col("order_total").cast(DoubleType))
  }

  val customerTimelineSql: String = OracleSql.q(s"""
SELECT customer_id, order_id,
       strftime(order_date, '%Y-%m-%d') AS order_date,
       CAST(order_total AS DOUBLE) AS order_total,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_rank,
       CAST(date_diff('day', lag(order_date) OVER w, order_date) AS BIGINT) AS days_since_prev,
       CAST(SUM(order_total) OVER (PARTITION BY customer_id ORDER BY order_date, order_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue,
       CAST(order_total AS DOUBLE) * 100.0
         / CAST(SUM(order_total) OVER (PARTITION BY customer_id) AS DOUBLE) AS pct_of_customer_revenue
FROM (
  SELECT o_custkey AS customer_id, l_orderkey AS order_id, order_date,
         ${Sql.msumDec("line_total")} AS order_total
  FROM fact
  GROUP BY o_custkey, l_orderkey, order_date)
WINDOW w AS (PARTITION BY customer_id ORDER BY order_date, order_id)""")

  val inventory: Map[String, Q] = Map(
    "window_customer_timeline" -> (customerTimeline _))

  val oracle: Map[String, String] = Map(
    "window_customer_timeline" -> customerTimelineSql)
}
