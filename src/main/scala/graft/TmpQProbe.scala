package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Scratch decomposition of quantiles_line_total (deleted before commit). */
object TmpQProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(cores = 32, shufflePartitions = 8, adaptive = false)
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f); System.gc()
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[tprobe] $label%-36s median=${runs.sorted.apply(2)}%.3f s  (${runs.map(r => f"$r%.2f").mkString(" ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val vals = () => graft.warehouse.Warehouse.fact(spark, sfDir).select(
      col("payment_method"), (col("line_total") * lit(1000000)).cast(LongType).as("v"))
    t("fact scan+project (noop)")(noop(vals()))
    t("counts agg (noop)")(noop(vals().groupBy("payment_method", "v").agg(count(lit(1)).as("c"))))
    val withCum = () => {
      val counts = vals().groupBy("payment_method", "v").agg(count(lit(1)).as("c"))
      counts.withColumn("cum", sum("c").over(Window.partitionBy("payment_method").orderBy("v")))
    }
    t("counts+cum window (noop)")(noop(withCum()))
    t("full op (collect)")(SparkEntry.queries("quantiles_line_total")(spark, sfDir).collect())
    // raw-row alternative: no cells agg, rank over raw rows via one window
    t("ALT raw window (noop)")({
      val w = Window.partitionBy("payment_method").orderBy("v")
      noop(vals().withColumn("rn", row_number().over(w)))
    })
    spark.stop()
  }
}
