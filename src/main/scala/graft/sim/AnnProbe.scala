package graft.sim

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dev-tool main: candidate-mass triage for the banded SRP-LSH ops.
  *
  * For each depth r in [8, rMax] over the 64-plane signature this
  * prints the (band, bucket) occupancy histogram summary and the
  * resulting candidate-pair mass Σ_cells C(min(occ, cap), 2) — the
  * number of same-cell id pairs the banded self-join will emit before
  * `distinct`/rescore. The number answers the triage question the
  * occupancy-target heuristic cannot: occupancy n/2^r can look healthy
  * while candidate mass is still ~quadratic, because mass is driven by
  * the corpus's directional concentration (how far plane agreement sits
  * above 0.5), not by mean occupancy.
  *
  * Usage: runMain graft.sim.AnnProbe <sfDir> [rMax]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rMax = if (args.length > 1) args(1).toInt else 16
    val spark = Sessions.local(cores = 32, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    val sigs = e.select(col("vec_id"),
      graft.functions.SrpSig64.of(col("embedding")).as("sig")).cache()
    sigs.count()
    println(s"[annprobe] n=$n adaptiveRows=${Similarity.adaptiveLshRows(n)} cap=${Similarity.LshBucketCap}")

    (8 to rMax).foreach { r =>
      val bands = 64 / r
      val cells = sigs
        .select(col("vec_id"),
          explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
        .selectExpr("band",
          s"cast(shiftright(sig, band * $r) & ${if (r == 64) -1L else (1L << r) - 1} as bigint) as bucket")
        .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
      val row = cells.agg(
        count(lit(1)).as("cells"),
        max("c").as("maxOcc"),
        avg("c").as("avgOcc"),
        sum(expr(s"least(c, ${Similarity.LshBucketCap}) * (least(c, ${Similarity.LshBucketCap}) - 1) / 2")).as("mass"),
        sum(expr(s"if(c > ${Similarity.LshBucketCap}, 1, 0)")).as("capped"))
        .collect()(0)
      println(f"[annprobe] r=$r%2d bands=$bands cells=${row.getLong(0)}%7d " +
        f"maxOcc=${row.getLong(1)}%7d avgOcc=${row.getDouble(2)}%9.1f " +
        f"candMass=${row.getDouble(3).toLong}%12d cappedCells=${row.getLong(4)}%5d")
    }
    sigs.unpersist()
    spark.stop()
  }
}
