package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The hot-shingle frequency cap is the safety valve of the Jaccard
  * blocking join: one boilerplate shingle shared by N documents costs
  * O(N²) join rows without it. */
class JaccardCapSpec extends SparkSpec {
  import spark.implicits._

  test("df cap keeps a ubiquitous shingle from exploding the blocking join") {
    // 100 docs sharing one boilerplate trigram + 2 genuine duplicates
    val docs = (1 to 100).map(i =>
      (i.toLong, s"all rights reserved unique$i alpha$i beta$i gamma$i")) ++
      Seq((201L, "the quick brown fox jumps over the lazy dog repeatedly"),
          (202L, "the quick brown fox jumps over the lazy dog repeatedly"))
    val sh = docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextOps.shinglesNative).as("s"))

    // threshold 0 exposes every candidate the blocking join produced
    val uncapped = TextOps.jaccardPairsOverShingles(sh,
      dfCap = Int.MaxValue, threshold = 0.0).count()
    val capped = TextOps.jaccardPairsOverShingles(sh,
      dfCap = 10, threshold = 0.0).count()
    assert(uncapped > 4000, s"expected ~C(100,2) candidates, got $uncapped")
    assert(capped < 50, s"cap did not bound the join: $capped candidate pairs")

    // genuine near-duplicates still pair at the production threshold
    val pairs = TextOps.jaccardPairsOverShingles(sh, dfCap = 10).collect()
    assert(pairs.exists(r =>
      r.getLong(0) == 201L && r.getLong(1) == 202L && r.getDouble(2) == 1.0))
  }
}
