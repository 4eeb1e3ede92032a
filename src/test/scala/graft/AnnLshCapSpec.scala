package graft

import graft.sim.Similarity

/** The (band, bucket) cap is the safety valve of the SRP-LSH join: the
  * bucket key space is fixed (2^rows cells per band), so a
  * near-constant embedding corpus piles into one cell per band and
  * candidates grow O(N²). AQE skew-join can rebalance the compute of
  * that hot cell but cannot shrink its quadratic candidate OUTPUT —
  * only the cap bounds it (worst cell = cap² comparisons). */
class AnnLshCapSpec extends SparkSpec {
  import spark.implicits._

  test("bucket cap keeps a near-constant embedding pile from exploding the join") {
    // 200 identical vectors (one SRP signature: every cell they occupy
    // is hot) plus one genuine duplicate pair in its own direction
    val pile = Array(0.5f, 0.25f, -0.125f, 0.75f, -0.5f, 0.3f, 0.1f, -0.2f)
    val dup = Array(-0.7f, 0.6f, 0.45f, -0.1f, 0.2f, -0.55f, 0.35f, 0.15f)
    val vecs = (1 to 200).map(i => (i.toLong, pile)) ++
      Seq((301L, dup), (302L, dup))
    val e = vecs.toDF("vec_id", "embedding")

    val uncapped = Similarity.annLshNearDupPairsOver(
      e, Similarity.LshBands, Similarity.LshRows, 0.4, Int.MaxValue).count()
    assert(uncapped > 19000, s"expected ~C(200,2) pairs uncapped, got $uncapped")

    val capped = Similarity.annLshNearDupPairsOver(
      e, Similarity.LshBands, Similarity.LshRows, 0.4, 50).collect()
    // the hot pile is dropped wholesale (the documented recall
    // tradeoff: a cell holding the whole corpus is exact-dedup
    // territory), while the two-vector cells of the genuine pair
    // survive in every band where its bucket differs from the pile's
    assert(capped.length < 50,
      s"cap did not bound the join: ${capped.length} pairs")
    assert(capped.exists(r =>
      r.getLong(0) == 301L && r.getLong(1) == 302L && r.getDouble(2) > 0.999),
      "the non-hot duplicate pair must still be found")
  }
}
