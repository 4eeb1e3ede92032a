package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Broder containment dedup — the asymmetric companion to the Jaccard
  * op: subset-duplication (a document quoted verbatim inside a larger
  * one) must be caught at containment ≥ 0.9 even where resemblance is
  * far below any sane Jaccard threshold. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def shingled(d: org.apache.spark.sql.DataFrame) =
    d.select(col("doc_id"), explode(TextOps.shinglesNative).as("s"))

  test("quote inclusion: contained doc pairs at 1.0 while Jaccard misses it") {
    val core = words("w", 50)                       // 48 shingles
    val page = words("p", 30) + " " + core + " " + words("q", 30)
    val d = Seq((1L, core), (2L, page), (3L, words("z", 40)))
      .toDF("doc_id", "text")
    val sh = shingled(d)
    val cont = TextOps.containmentPairsOverShingles(sh).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(cont.contains((1L, 2L)), s"contained pair missing: ${cont.keys}")
    val (nc, na, nb, c) = cont((1L, 2L))
    assert(na == 48L && c == 1.0,
      s"all 48 core shingles must be inside the page: n_common=$nc n_a=$na n_b=$nb c=$c")
    assert(nb > 100L, "the page must be much larger than the core")
    assert(!cont.keys.exists(k => k._1 == 3L || k._2 == 3L),
      "the unrelated doc must not pair")
    // the same corpus through the Jaccard op: resemblance is blind here
    val jac = TextOps.jaccardPairsOverShingles(sh).collect()
    assert(jac.isEmpty,
      s"J = 48/|page| ≈ 0.44 must be below the 0.7 resemblance threshold: ${jac.toSeq}")
  }

  test("exact duplicates appear at containment 1.0 with equal sizes") {
    val t = words("d", 20)
    val d = Seq((10L, t), (11L, t)).toDF("doc_id", "text")
    val rows = TextOps.containmentPairsOverShingles(shingled(d)).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 10L && r.getLong(1) == 11L &&
      r.getLong(2) == 18L && r.getLong(3) == 18L && r.getLong(4) == 18L &&
      r.getDouble(5) == 1.0)
  }

  test("the df cap drops boilerplate shingles from the representation") {
    // one boilerplate sentence shared by MANY docs plus per-doc unique
    // tails: with the cap below the boilerplate df, the shared shingles
    // leave every representation and no pair survives
    val boiler = words("b", 10)
    val d = (1 to 30).map(i => (i.toLong, boiler + " " + words(s"u$i-", 12)))
      .toDF("doc_id", "text")
    val capped = TextOps.containmentPairsOverShingles(shingled(d), dfCap = 10)
    assert(capped.count() == 0L,
      "boilerplate-only overlap must not pair once the hot shingles drop")
    // sanity: uncapped, the boilerplate alone is a large shared fraction
    // of every pair's min side, but still under the 0.9 containment bar
    val un = TextOps.containmentPairsOverShingles(shingled(d), dfCap = Int.MaxValue)
    assert(un.count() == 0L, "8 shared of 20 min-side shingles is 0.4 < 0.9")
  }

  test("layout invariance: repartitioned input yields the identical pair set") {
    val core = words("w", 30)
    val page = words("p", 20) + " " + core + " " + words("q", 20)
    val d = Seq((1L, core), (2L, page), (3L, core), (4L, words("y", 25)))
      .toDF("doc_id", "text")
    val a = TextOps.containmentPairsOverShingles(shingled(d)).collect()
      .map(_.toSeq).toSet
    val b = TextOps.containmentPairsOverShingles(shingled(d.repartition(7)))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
