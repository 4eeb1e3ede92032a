package graft

/** Targeted per-op timing probe (dev tool, not part of the library
  * surface): times ONLY the ops named on the command line, with the
  * Bench methodology (same session profile, warm passes, median of 5,
  * per-op System.gc outside the timed window), so an optimization can
  * be A/B-measured in seconds instead of re-running the full roster.
  * Usage: runMain graft.ProbeOps op1,op2[,...]   (SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS and SPARK_GRAFT_SHUFFLE as in Bench).
  */
object ProbeOps {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeOps op1,op2[,...]")
    val ops = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val missing = ops.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown ops: ${missing.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8").toInt,
      adaptive = sys.env.get("SPARK_GRAFT_AQE").contains("1"))
    spark.sparkContext.setLogLevel("ERROR")
    ops.foreach { q =>
      (1 to 2).foreach(_ => SparkEntry.queries(q)(spark, sfDir).collect())
      System.gc()
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sfDir).collect().length
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(2)
      println(f"[probe] $q%-32s median=$med%.3f s  rows=${runs.head._2}  " +
        runs.map(r => f"${r._1}%.3f").mkString(" "))
    }
    spark.stop()
  }
}
