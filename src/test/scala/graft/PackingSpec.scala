package graft

import graft.text.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("chunking covers every token with the declared stride overlap") {
    import spark.implicits._
    // synthetic docs around the interesting sizes: under one chunk, at
    // the boundary, one past it, several strides, and a stride-exact end
    val sizes = Seq(1, 199, 200, 201, 350, 500, 650, 1000)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(t => s"t$t").mkString(" "))
    }.toDF("doc_id", "text")
    val chunks = Packing.chunkDocumentsOver(docs)
      .select("doc_id", "chunk_seq", "chunk_tokens")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    sizes.zipWithIndex.foreach { case (n, i) =>
      val cs = chunks(i.toLong)
      val expectedK = if (n <= 200) 1 else 1 + math.ceil((n - 200).toDouble / 150).toInt
      assert(cs.length == expectedK, s"doc of $n tokens: ${cs.length} chunks")
      // all but the last are full windows; coverage reaches exactly n
      cs.init.foreach(c => assert(c == Packing.ChunkTokens))
      assert((cs.length - 1) * Packing.ChunkStride + cs.last == n,
        s"doc of $n tokens not fully covered")
    }
  }

  test("packing is a gapless concatenation in doc_id order") {
    val rows = Packing.packSequences(spark, sf)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // starts are the exclusive prefix sums: doc N starts where N-1 ended
    rows.sliding(2).foreach {
      case Array((_, est, start, _, _), (_, _, nextStart, _, _)) =>
        assert(nextStart == start + est, s"gap at start=$start est=$est next=$nextStart")
      case _ =>
    }
    assert(rows.head._3 == 0L)
    // seq coordinates are consistent with the start positions
    rows.foreach { case (_, _, start, seqId, off) =>
      assert(seqId == start / Packing.SeqLen && off == start % Packing.SeqLen)
      assert(off >= 0 && off < Packing.SeqLen)
    }
  }

  test("BPE packing is gapless and agrees with the accounting op's totals") {
    val rows = Packing.packSequencesBpe(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bpe_tokens"),
        r.getAs[Long]("start_token"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_offset")))
      .sortBy(_._1)

    // one row per document, including zero-word ones
    assert(rows.length == Tables.documents(spark, sf).count())

    // gapless: each start is the previous start + previous tokens, and
    // seq_id/seq_offset are the div/mod of the start
    rows.sliding(2).foreach {
      case Array((_, t0, s0, _, _), (_, _, s1, _, _)) => assert(s1 == s0 + t0)
      case _ =>
    }
    rows.foreach { case (_, _, s, q, o) =>
      assert(q == s / Packing.SeqLen && o == s % Packing.SeqLen)
    }

    // cross-op invariant: total packed tokens == the per-source exact
    // accounting's total (two independent plans over the same trained
    // tokenizer must price the corpus identically)
    val packedTotal = rows.map(_._2).sum
    val accountedTotal = graft.text.TextOps.bpeSourceTokenAccounting(spark, sf)
      .agg(sum("exact_tokens")).collect()(0).getLong(0)
    assert(packedTotal == accountedTotal)
  }

  test("length-bucket batching equals a from-scratch recomputation") {
    val got = Packing.lengthBucketBatches(spark, sf).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_batches"), r.getAs[Long]("padded_tokens"),
        r.getAs[Long]("real_tokens"), r.getAs[Long]("wasted_tokens")))
      .toSeq

    // from scratch: tok = ceil(chars/4), bucket = tok/64, shard = the
    // md5 coin, length-sorted 16-deep batches within (bucket, shard)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val id = r.getAs[Long]("doc_id")
        val tok = math.ceil(r.getString(1).length.toDouble / 4.0).toLong
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s"lbb:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val shard = java.lang.Long.parseLong(md5.take(8), 16) % Packing.PadShards
        (id, tok, tok / Packing.BucketTokens, shard)
      }
    val want = docs.groupBy(_._3).toSeq.sortBy(_._1).map { case (bucket, ds) =>
      val batches = ds.groupBy(_._4).values.flatMap { sh =>
        sh.sortBy { case (id, tok, _, _) => (-tok, id) }
          .grouped(Packing.PadBatchSize.toInt).toSeq
      }.toSeq
      val padded = batches.map(b => b.map(_._2).max * b.length).sum
      val real = ds.map(_._2).sum
      (bucket, ds.length.toLong, batches.length.toLong, padded, real, padded - real)
    }
    assert(got == want)
    assert(got.forall { case (_, _, _, p, r, w) => w == p - r && w >= 0 })
  }

  test("cumsum helper is stable across repeated runs and input layouts") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7 + 1)).toDF("k", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.exclusiveCumsum(d, "k", "v", "c")
        .select("k", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(df.repartition(13))
    val b = run(df.repartition(3))
    assert(a == b)
    // spot-check the closed form: v = k%7+1
    val expected = (1L to 1000L).scanLeft(0L)((acc, k) => acc + (k % 7 + 1)).init
    assert(a == (1L to 1000L).zip(expected).toSet.map((p: (Long, Long)) => p))
  }
}
