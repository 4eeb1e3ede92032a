package graft

import graft.sim.EmbeddingDrift

/** Centroid-drift semantics on hand-built shifts, plus corpus sanity. */
class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Long, Int, Seq[Float])*) =
    rows.toDF("vec_id", "label", "embedding")

  test("identical halves have cosine exactly 1 and shift exactly 0") {
    // even and odd vec_ids carry the same two vectors
    val e = frame(
      (0L, 1, Seq(1f, 0f, 2f)), (2L, 1, Seq(0f, 1f, 0f)),
      (1L, 1, Seq(1f, 0f, 2f)), (3L, 1, Seq(0f, 1f, 0f)))
    val r = EmbeddingDrift.embeddingDriftOver(e).head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("centroid_cosine") == 1.0)
    assert(r.getAs[Double]("centroid_l2_shift") == 0.0)
  }

  test("a pure translation shows up as the exact L2 shift") {
    // half A at (1,0), half B at (1,0.5): centroids differ by (0, 0.5)
    val e = frame(
      (0L, 7, Seq(1f, 0f)), (2L, 7, Seq(1f, 0f)),
      (1L, 7, Seq(1f, 0.5f)), (3L, 7, Seq(1f, 0.5f)))
    val r = EmbeddingDrift.embeddingDriftOver(e).head()
    // shift = 0.5 in dim 1 (exact on the 1e7 grid)
    assert(r.getAs[Double]("centroid_l2_shift") == 0.5)
    val expectedCos = 1.0 / math.sqrt(1.25) // cos between (1,0) and (1,0.5)
    assert(math.abs(r.getAs[Double]("centroid_cosine") - expectedCos) < 1e-9)
  }

  test("labels are independent rows") {
    val e = frame(
      (0L, 1, Seq(1f, 0f)), (1L, 1, Seq(1f, 0f)),
      (10L, 2, Seq(0f, 1f)), (11L, 2, Seq(0f, -1f)))
    val rows = EmbeddingDrift.embeddingDriftOver(e).collect()
    assert(rows.map(_.getAs[Int]("label")).toSeq == Seq(1, 2))
    // label 2's halves point in opposite directions: cosine -1
    assert(rows(1).getAs[Double]("centroid_cosine") == -1.0)
  }

  test("registered frame is sane on the corpus") {
    val rows = EmbeddingDrift.embeddingDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum == total)
    rows.foreach { r =>
      val c = r.getAs[Double]("centroid_cosine")
      assert(c >= -1.0 && c <= 1.0 + 1e-12)
      assert(r.getAs[Double]("centroid_l2_shift") >= 0.0)
    }
  }
}
