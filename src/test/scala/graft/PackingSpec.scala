package graft

import graft.text.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

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
