package graft.sim

import graft.Sessions
import org.apache.spark.sql.functions._

/** Dev-tool main: time the semantic-dedup BUILD under single-probe vs
  * multi-probe blocking at a given corpus — the measurement behind the
  * round-11 done-criterion "multi-probe cost ≤ 2× the single-probe op
  * at the 100× rung". The bench rungs report the CACHED serve cost
  * (the CC result materializes once per session), so the build delta
  * the second probe actually costs — two assignments per vector, ≤ 2n
  * probe rows into the star-edge kernel, one global CC instead of the
  * per-cell shortcut — needs this from-scratch timing. Both forms run
  * against the SAME persisted IVF index (loaded first, untimed), so
  * the comparison isolates the blocking strategy, not index training.
  *
  * Usage: runMain graft.sim.SemanticBuildProbe <sfDir> [runs]
  */
object SemanticBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 1
    val spark = Sessions.local(cores = 32,
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val idx = Ivf.index(spark, sfDir) // untimed: shared by both forms
    idx.assignments.count()           // force the load/build off the clock

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val df = mk
        val n = df.count()
        val keepers = df.filter(col("is_keeper")).count()
        println(f"[semprobe] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs" +
          f" rows=$n keepers=$keepers")
      }

    time("single-probe") {
      Similarity.semanticDedupRepsOver(idx.assignments, Similarity.SemanticCellCap)
    }
    time("multi-probe") {
      Similarity.semanticDedupRepsMultiOver(
        Similarity.multiProbeAssignments(idx), Similarity.SemanticCellCap)
    }
    spark.stop()
  }
}
