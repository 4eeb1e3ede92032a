package graft

/** Dev-tool main: time a single registered query once (or N times) at a
  * given SF dir — the per-op triage step between "the full bench ladder
  * is slow" and knowing WHICH operator crossed a scale cliff. Prints
  * the row count too, because at scale the interesting failures are
  * output-cardinality explosions, not slow scans.
  *
  * Usage: runMain graft.Probe <sfDir> <queryName> [runs]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val spark = Sessions.local(cores = 32,
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
