package graft

import org.apache.spark.sql.SparkSession

/** Extension-operator benchmark (dev tool; the driver's bench contract
  * is [[Bench]]): steady-state timings for the training-data operators
  * — dedup, ANN, text, curation — at SPARK_GRAFT_SF_DIR. Same
  * methodology as Bench (warm passes + best-of-3). Numbers are recorded
  * in SURVEY §8. */
object BenchExt {
  val ops: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "dedup_clusters", "ann_cosine_topk", "ann_lsh_buckets",
    "ann_lsh_near_dup_pairs",
    "text_stats", "corpus_curation", "quantiles_line_total",
    "asof_click_attribution", "range_join_click_purchase")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(cores = 32, shufflePartitions = 8)
    spark.sparkContext.setLogLevel("WARN")

    val (qs, missing) = ops.partition(SparkEntry.queries.contains)
    if (missing.nonEmpty) {
      // a renamed/unregistered op must not silently shrink the benchmark
      System.err.println(s"[benchext] ops missing from SparkEntry.queries: ${missing.mkString(", ")}")
      spark.stop()
      sys.exit(1)
    }
    try {
      (1 to 3).foreach(_ =>
        qs.foreach(q => SparkEntry.queries(q)(spark, sfDir).collect()))
      System.gc()
    } catch {
      case e: Throwable =>
        System.err.println(s"[benchext] warm-up failed: ${e.getMessage}")
    }
    val results = qs.map { name =>
      try {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).collect()
          (System.nanoTime() - t0) / 1e9
        }
        name -> runs.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[benchext] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }
    val failures = results.count(_._2 < 0)
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"ext_total","value":$total,"unit":"sec","queries":$qjson,"failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
