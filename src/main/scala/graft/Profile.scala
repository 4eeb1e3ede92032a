package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ad-hoc profiling harness (dev tool, not part of the library surface):
  * times micro-variants of the headline aggregations against the cached
  * fact to attribute per-query cost (JIT warm-up, decimal vs bigint
  * sums, countDistinct). Findings feed Bench.scala's methodology notes.
  */
object Profile {
  def time[A](label: String, n: Int = 5)(f: => A): Unit = {
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $label%-40s ${ts.map(t => f"$t%.3f").mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(cores = 32, shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")

    val f = warehouse.Warehouse.fact(spark, sfDir)
    f.count(); f.count()
    Bench.headline.foreach(q => SparkEntry.queries(q)(spark, sfDir).collect())

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
    Bench.headline.foreach(q =>
      time(q)(SparkEntry.queries(q)(spark, sfDir).collect()))
    spark.stop()
  }
}
