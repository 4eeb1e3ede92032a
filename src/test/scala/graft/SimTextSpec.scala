package graft

import graft.sim.Similarity
import graft.text.TextOps
import org.apache.spark.sql.functions._

class SimTextSpec extends SparkSpec {

  test("text_stats ratios are well-formed") {
    val rows = TextOps.textStats(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val p = r.getAs[Double]("punct_ratio"); val s = r.getAs[Double]("stopword_ratio")
      p >= 0 && p <= 1 && s >= 0 && s <= 1 && r.getAs[Long]("n_tokens") > 0
    })
  }

  test("exact jaccard pairs are all above threshold and symmetric-free") {
    val rows = TextOps.dedupJaccardPairs(spark, sf).collect()
    assert(rows.nonEmpty, "expected near-duplicate documents in test data")
    assert(rows.forall(r => r.getAs[Double]("jaccard") >= 0.7))
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("minhash-lsh candidates recall high-jaccard pairs") {
    val exact = TextOps.dedupJaccardPairs(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = TextOps.dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = exact.count(cand.contains).toDouble / exact.size
      assert(recall >= 0.5, s"LSH recall of J>=0.9 pairs was $recall")
    }
  }

  test("simhash pairs respect the hamming bound") {
    val rows = TextOps.dedupSimhashPairs(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("hamming") <= 4))
  }

  test("simhash banding is pigeonhole-exact: every hamming<=4 pair shares a 12-bit block") {
    // the candidate-generation guarantee the whole join rests on: 4
    // differing bits cannot touch all 5 blocks. Deterministic sweep of
    // adversarial bit placements: all C(4, k) spreads of up to 4 flips
    // across block boundaries, plus flips packed inside one block.
    def blocks(h: Long): Seq[Long] =
      Seq(h & 4095, (h >> 12) & 4095, (h >> 24) & 4095, (h >> 36) & 4095, (h >> 48) & 4095)
    val base = 0x0FEDCBA987654321L & ((1L << 60) - 1)
    val flipSets = for {
      a <- 0 until 60; b <- a until 60; c <- b until 60; d <- c until 60
      if Seq(a, b, c, d).distinct.size == Seq(a, b, c, d).size || (a == b && b == c && c == d)
    } yield Seq(a, b, c, d).distinct
    // bounded sample of the full sweep (every 97th) keeps the test fast
    // while still crossing every block-boundary pattern
    flipSets.zipWithIndex.filter(_._2 % 97 == 0).map(_._1).foreach { flips =>
      val other = flips.foldLeft(base)((h, j) => h ^ (1L << j))
      assert(java.lang.Long.bitCount(base ^ other) <= 4)
      assert(blocks(base).zip(blocks(other)).exists { case (x, y) => x == y },
        s"pair with flips at $flips shares no block")
    }
  }

  test("dedup_exact keeps one representative per content hash") {
    val df = TextOps.dedupExact(spark, sf)
    assert(df.count() == df.select("content_md5").distinct().count())
  }

  test("ann topk returns 10 descending-ranked neighbors per query") {
    val rows = Similarity.annCosineTopK(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    byQuery.foreach { case (_, rs) =>
      assert(rs.length == 10)
      val ordered = rs.sortBy(_.getAs[Int]("rank"))
      val cosines = ordered.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("lsh buckets partition all vectors into 8-bit buckets") {
    val rows = Similarity.annLshBuckets(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bucket_size")).sum ==
      Tables.embeddings(spark, sf).count())
    assert(rows.forall { r =>
      val b = r.getAs[Int]("bucket"); b >= 0 && b <= 255
    })
  }
}
