package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The (band, band_hash) cap is the safety valve of the MinHash-LSH
  * join: a band hash is wide (4×56-bit minhashes), so a hot bucket
  * means many docs with near-identical shingle sets — still bucket²
  * join work. A low-entropy corpus piles clones into one bucket and
  * candidates grow O(N²) without the cap (measured 10.3× runtime for
  * 3× docs on the 30× scale replica before it existed). */
class MinhashCapSpec extends SparkSpec {
  import spark.implicits._

  test("band cap keeps a single-signature pile from exploding the join") {
    // 200 identical docs (one shingle set → one MinHash signature →
    // every band bucket hot) plus one genuine duplicate pair with its
    // own distinct text
    val docs = (1 to 200).map(i =>
      (i.toLong, "data query spark table row column key value join filter")) ++
      Seq((301L, "the quick brown fox jumps over the lazy dog tonight"),
          (302L, "the quick brown fox jumps over the lazy dog tonight"))
    val d = docs.toDF("doc_id", "text")

    val uncapped = TextOps.minhashPairsOverDocs(d, Int.MaxValue).count()
    val capped = TextOps.minhashPairsOverDocs(d, 50)
    assert(uncapped > 19000, s"expected ~C(200,2) pairs uncapped, got $uncapped")
    // the hot pile is dropped wholesale (the documented recall
    // tradeoff: wide-hash band equality certifies its members are
    // near-clones — exact-dedup/cluster territory, not pairwise
    // enumeration territory), while the small-bucket genuine pair
    // survives with a full-match signature
    val cappedRows = capped.collect()
    assert(cappedRows.length < 50,
      s"cap did not bound the join: ${cappedRows.length} pairs")
    assert(cappedRows.exists(r =>
      r.getLong(0) == 301L && r.getLong(1) == 302L && r.getDouble(2) == 1.0),
      "the non-hot duplicate pair must still be found")
  }
}
