package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The planted-passage contract of DataGen's passage piles (ids
  * b+20..b+22 per 50-block append a 16-token md5-gibberish passage
  * unique to the pile): the REGISTERED winnow overlap detector must
  * recall every member pair with shared_fps >= WinnowSharedMin at any
  * corpus size — the pile passage's fingerprints have df = 3 by
  * construction, so unlike common-vocabulary fingerprints they can
  * never age past the df-cap as the corpus grows (the round-13 ladder
  * artifact: winnow_overlap_pairs emitted 0 rows at the 300× rung
  * because every shared fingerprint was corpus boilerplate). */
class WinnowPassagePileSpec extends SparkSpec {

  test("passage-pile member pairs are recalled by winnowOverlapPairs") {
    val docs = graft.datagen.DataGen.documents(spark, 500)
    val found = TextOps.winnowOverlapPairsOver(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 10 piles in [0, 500): bases 20, 70, ..., 470; 3 member pairs each
    val planted = (0 until 10).flatMap { p =>
      val b = p * 50 + 20
      Seq((b.toLong, b + 1L), (b.toLong, b + 2L), (b + 1L, b + 2L))
    }
    planted.foreach { pair =>
      assert(found.contains(pair), s"planted passage pair $pair not recalled")
      assert(found(pair) >= TextOps.WinnowSharedMin,
        s"pair $pair shared only ${found(pair)} fingerprints")
    }
  }

  test("the passage is unique per pile: its fingerprints stay df-cold at scale") {
    // two piles must not share passage fingerprints — df is pile size
    // (3), never corpus-proportional. Check on the passage SUFFIX alone
    // (the last 143 chars of a member's text).
    val docs = graft.datagen.DataGen.documents(spark, 200)
      .filter(col("doc_id") % 50 >= 20 && col("doc_id") % 50 < 23)
      .select(col("doc_id"),
        expr("substring(text, length(text) - 142, 143)").as("text"))
    val fps = TextOps.winnowFpsOver(docs)
      .withColumn("pile", expr("doc_id - (doc_id % 50)"))
      .groupBy("fp").agg(countDistinct("pile").as("n_piles"),
        count(lit(1)).as("df"))
      .collect()
    assert(fps.nonEmpty)
    fps.foreach { r =>
      assert(r.getLong(1) == 1L,
        s"fingerprint ${r.getLong(0)} crosses piles (${r.getLong(1)})")
      assert(r.getLong(2) <= 3L)
    }
  }
}
