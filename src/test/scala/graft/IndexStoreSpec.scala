package graft

import graft.sim.{IndexStore, Pq}
import org.apache.spark.sql.functions._

/** The persisted-index store's contract: build once, serve the stored
  * artifact, and NEVER serve a stale one — a collection that changed
  * under the same directory must be detected by the fingerprint and
  * trigger a rebuild (the failure mode that would silently break the
  * oracle's training-replay equality). */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def writeCorpus(dir: String, shift: Float): Unit =
    (0 until 64).map { i =>
      (i.toLong, (0 until 64).map(d => (i * 64 + d) / 4096.0f + shift), s"l${i % 3}")
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("a changed collection under the same path rebuilds the index") {
    val dir = java.nio.file.Files.createTempDirectory("idxstore").toString
    writeCorpus(dir, 0.0f)
    val v1 = canon(Pq.index(spark, dir).codes)
    // same bytes → fingerprint hit → served artifact identical
    assert(canon(Pq.index(spark, dir).codes) == v1)
    // regenerate the collection IN PLACE (same row count, same vec_ids,
    // different components) — count+key checksums alone would miss it;
    // the component checksum must not
    writeCorpus(dir, 0.25f)
    val v2 = canon(Pq.index(spark, dir).codes)
    val fresh = canon(Pq.buildIndex(spark, dir).codes)
    assert(v2 == fresh, "served index must equal a fresh build on the new collection")
    // and the codebooks really differ across the two collection vintages
    val cb2 = canon(Pq.index(spark, dir).codebook)
    writeCorpus(dir, 0.0f)
    assert(canon(Pq.index(spark, dir).codebook) != cb2,
      "reverting the collection must revert the served codebook")
  }

  test("fingerprint distinguishes component changes at fixed count and keys") {
    val dir = java.nio.file.Files.createTempDirectory("idxstore-fp").toString
    writeCorpus(dir, 0.0f)
    val f0 = IndexStore.embeddingsFingerprint(spark, dir)
    writeCorpus(dir, 0.25f)
    assert(IndexStore.embeddingsFingerprint(spark, dir) != f0)
  }

  test("fingerprint sees a change confined to one non-zero dimension") {
    // regression: a first-component-only content checksum passed any
    // in-place regeneration that left dim 0 untouched — the
    // file-status fingerprint catches EVERY rewrite because parquet
    // writers mint fresh part-file names
    val dir = java.nio.file.Files.createTempDirectory("idxstore-fp1").toString
    def write(bump: Float): Unit =
      (0 until 64).map { i =>
        (i.toLong,
          (0 until 64).map(d =>
            (i * 64 + d) / 4096.0f + (if (d == 7) bump else 0.0f)),
          s"l${i % 3}")
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    write(0.0f)
    val f0 = IndexStore.embeddingsFingerprint(spark, dir)
    write(0.5f)
    assert(IndexStore.embeddingsFingerprint(spark, dir) != f0,
      "a dim-7-only edit must change the fingerprint")
  }

  test("fingerprint sees a dimension permutation at fixed component sums") {
    // swapping two components per row would fool a plain component-sum
    // checksum; the rewrite itself must invalidate
    val dir = java.nio.file.Files.createTempDirectory("idxstore-fpperm").toString
    def write(swap: Boolean): Unit =
      (0 until 64).map { i =>
        val base = (0 until 64).map(d => (i * 64 + d) / 4096.0f)
        val emb = if (swap) base.updated(0, base(1)).updated(1, base(0)) else base
        (i.toLong, emb, s"l${i % 3}")
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    write(swap = false)
    val f0 = IndexStore.embeddingsFingerprint(spark, dir)
    write(swap = true)
    assert(IndexStore.embeddingsFingerprint(spark, dir) != f0,
      "a component swap must change the fingerprint")
  }
}
