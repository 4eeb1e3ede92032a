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
