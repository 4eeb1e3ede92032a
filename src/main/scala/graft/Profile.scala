package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch profiling main (not part of the library surface). */
object Profile {
  def time[A](label: String, n: Int = 5)(f: => A): Unit = {
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $label%-40s ${ts.map(t => f"$t%.3f").mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val f = warehouse.Warehouse.fact(spark, sfDir)
    f.count(); f.count()

    // warm all headline queries
    Bench.headline.foreach(q => SparkEntry.queries(q)(spark, sfDir).collect())

    time("q01 (current)")(Analytics01.collect(spark, sfDir))
    time("noop count on cached fact")(f.count())
    time("plain long sum quantity by product")(
      f.groupBy("product_key").agg(sum("quantity")).collect())
    time("decimal msum by product")(
      f.groupBy("product_key").agg(Det.msum(col("line_total"))).collect())
    time("micros long sum by product")(
      f.groupBy("product_key")
        .agg(sum((col("line_total") * lit(1000000)).cast(LongType))).collect())
    time("countDistinct orderkey by product")(
      f.groupBy("product_key").agg(countDistinct(col("l_orderkey"))).collect())
    time("q02 (current)")(SparkEntry.queries("q02_monthly_trend")(spark, sfDir).collect())
    time("q07 (current)")(SparkEntry.queries("q07_customer_ltv")(spark, sfDir).collect())
    time("q09 (current)")(SparkEntry.queries("q09_dow_pattern")(spark, sfDir).collect())
    time("analysis only q01") {
      val df = SparkEntry.queries("q01_top_products")(spark, sfDir)
      df.queryExecution.executedPlan
    }
    spark.stop()
  }

  object Analytics01 {
    def collect(spark: SparkSession, dir: String): Unit =
      SparkEntry.queries("q01_top_products")(spark, dir).collect()
  }
}
