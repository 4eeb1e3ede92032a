package graft

import graft.text.Incremental

/** The incremental band-index membership probe: increments are flagged
  * against the persisted corpus index without pair enumeration, so hot
  * corpus buckets cost nothing extra. Split convention under test:
  * doc_id % 10 < 8 → corpus, >= 8 → increment. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("clone of a corpus doc is flagged, novel text is not") {
    val d = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "data pipelines shuffle partitions across the cluster nodes"),
      // increment: 18 clones corpus doc 10, 28 is genuinely new
      (18L, "the quick brown fox jumps over the lazy dog tonight"),
      (28L, "completely unrelated sentence with its own fresh words")
    ).toDF("doc_id", "text")
    val out = Incremental.dedupIncrementalOver(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // only increment docs appear
    assert(out.keySet == Set(18L, 28L))
    assert(out(18L) == ((4L, false)), s"clone should hit all 4 bands: ${out(18L)}")
    assert(out(28L) == ((0L, true)), s"novel doc should hit none: ${out(28L)}")
  }

  test("hot corpus pile stays a membership test, not a pair join") {
    // 160 identical corpus docs (doc_id % 10 < 8) — one scorching band
    // bucket — plus one increment clone: output is ONE row per
    // increment doc with matched_bands = 4, however hot the bucket
    val corpus = (0 until 200).filter(_ % 10 < 8)
      .map(i => (i.toLong, "data query spark table row column key value join filter"))
    val d = (corpus :+
      (208L, "data query spark table row column key value join filter")).toDF("doc_id", "text")
    val rows = Incremental.dedupIncrementalOver(d).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 208L && rows.head.getLong(1) == 4L
      && !rows.head.getBoolean(2))
  }

  test("sub-3-token docs carry no signature on either side") {
    val d = Seq(
      (10L, "too short"),            // corpus, unsigned
      (18L, "too short"),            // increment, unsigned → absent
      (28L, "three whole tokens here")
    ).toDF("doc_id", "text")
    val rows = Incremental.dedupIncrementalOver(d).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(28L))
    assert(rows.head.getLong(1) == 0L && rows.head.getBoolean(2))
  }
}
