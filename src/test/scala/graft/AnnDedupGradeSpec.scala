package graft

import graft.sim.Similarity

/** The dedup-grade SRP-LSH operating point (8 bands × 8 rows, cosine
  * ≥ 0.8 — [[graft.sim.Similarity.annLshDedupPairs]]): on a corpus that
  * actually CONTAINS near-clones, deep bands keep recall near 1 while
  * passing a tiny fraction of random pairs as candidates — the property
  * the shallow 16×4 demo config cannot have at its 0.4 threshold. The
  * driver corpus tops out at cosine 0.6, so the registered query's
  * oracle checks the empty result; this spec supplies the non-trivial
  * evidence on a clone-pile corpus. */
class AnnDedupGradeSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus: 20 base directions × 5 jittered
  // clones each (pairwise cosine ≈ 0.999 within a pile) + 150 unrelated
  // random vectors
  // 64 dims like the driver corpus: random-pair cosine has σ ≈ 1/8, so
  // a random pair at 0.8 is a >6σ accident (at 16 dims it actually
  // happens among 11k pairs)
  private val rnd = new scala.util.Random(42)
  private def randVec(): Array[Float] =
    Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
  private val piles = (0 until 20).map { p =>
    val base = randVec()
    (0 until 5).map { c =>
      (p * 10 + c).toLong ->
        base.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    }
  }
  private val noise = (0 until 150).map(i => (1000 + i).toLong -> randVec())
  private val corpus = (piles.flatten ++ noise).toSeq

  private def pileOf(id: Long): Long = id / 10

  test("8x8 bands at cosine >= 0.8 recall clone piles with precision 1") {
    val e = corpus.toDF("vec_id", "embedding")
    val found = Similarity.annLshNearDupPairsOver(e, 8, 8, 0.8, Similarity.LshBucketCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted pair is exactly rescored, so nothing below 0.8
    // survives — on this corpus that means only within-pile pairs
    assert(found.forall { case (a, b) => a < 1000 && b < 1000 && pileOf(a) == pileOf(b) },
      s"non-clone pair passed the 0.8 rescore: ${found.filterNot { case (a, b) => a < 1000 && b < 1000 && pileOf(a) == pileOf(b) }}")
    // recall: 20 piles x C(5,2) = 200 true pairs; >= 0.99 expected at
    // cosine ~0.999 (plane agreement ~0.99), leave slack for md5-plane
    // determinism quirks
    assert(found.size >= 190, s"recall too low: ${found.size}/200 clone pairs")
  }

  test("dedup reps collapse each clone pile to one keeper, output one row per vector") {
    val e = corpus.toDF("vec_id", "embedding")
    val reps = Similarity.annDedupRepsOver(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // bounded output: exactly one row per vector, whatever the clone structure
    assert(reps.length == corpus.size, s"${reps.length} rows for ${corpus.size} vectors")
    // every pile collapses to its min vec_id (piles are cliques at
    // cosine ~0.999, recall ~1 at the adaptive operating point)
    val pileRows = reps.filter(_._1 < 1000)
    pileRows.groupBy(t => pileOf(t._1)).foreach { case (p, rows) =>
      val clusterIds = rows.map(_._2).toSet
      assert(clusterIds == Set(p * 10),
        s"pile $p should collapse to cluster ${p * 10}, got $clusterIds")
      assert(rows.count(_._4) == 1, s"pile $p must elect exactly one keeper")
      assert(rows.forall(_._3 == 5), s"pile $p cluster_size must be 5")
    }
    // unrelated vectors stay their own keepers
    val noiseRows = reps.filter(_._1 >= 1000)
    assert(noiseRows.forall(t => t._2 == t._1 && t._3 == 1 && t._4),
      "noise vectors must be singleton keepers")
  }

  test("mass refinement keeps the occupancy base on a direction-diverse corpus") {
    // 250 well-spread vectors: measured candidate mass at the base depth
    // is far under the 32/vec budget, so the rule must not deepen
    val e = corpus.toDF("vec_id", "embedding")
    assert(Similarity.adaptiveLshRowsByMass(e, corpus.size.toLong) ==
      Similarity.adaptiveLshRows(corpus.size.toLong))
  }

  test("mass refinement deepens to the ceiling on a direction-concentrated corpus") {
    // 1200 vectors in only 4 directions: every cell at every depth holds
    // ~a full pile, so Σ C(occ,2) stays quadratic no matter how deep the
    // buckets go — the rule must run to LshMassMaxRows and stop (the
    // residual mass is genuine near-dup output, which belongs to the
    // rescore, not to deeper hashing). The occupancy base for n=1200
    // is 8, so this is exactly the case the base rule gets wrong.
    val dense = (0 until 4).flatMap { p =>
      val base = randVec()
      (0 until 300).map { c =>
        (p * 1000 + c).toLong ->
          base.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
      }
    }
    val e = dense.toDF("vec_id", "embedding")
    assert(Similarity.adaptiveLshRows(dense.size.toLong) == 8)
    assert(Similarity.adaptiveLshRowsByMass(e, dense.size.toLong) ==
      Similarity.LshMassMaxRows)
  }

  /** Reference CC over the FULL qualifying pair list (what the oracle's
    * recursive CTE computes) — the equivalence target for the
    * bounded-state star-edge path. */
  private def ccOverFullPairs(e: org.apache.spark.sql.DataFrame,
                              bands: Int, rows: Int): Map[Long, (Long, Long, Boolean)] = {
    import org.apache.spark.sql.functions.col
    val pairs = Similarity
      .annLshNearDupPairsOver(e, bands, rows, 0.8, Similarity.LshBucketCap)
      .select(col("vec_a"), col("vec_b"))
    graft.text.DedupClusters
      .connectedComponents(e.select(col("vec_id").as("id")), pairs, maxRounds = 30)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  private def ccOverStarEdges(e: org.apache.spark.sql.DataFrame,
                              bands: Int, rows: Int): Map[Long, (Long, Long, Boolean)] = {
    import org.apache.spark.sql.functions.col
    val edges = Similarity.annLshStarEdgesOver(e, bands, rows, 0.8,
      Similarity.LshBucketCap)
    graft.text.DedupClusters
      .connectedComponents(e.select(col("vec_id").as("id")), edges, maxRounds = 30)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("star edges yield the exact full-pair-list components on the pile corpus") {
    val e = corpus.toDF("vec_id", "embedding")
    assert(ccOverStarEdges(e, 8, 8) == ccOverFullPairs(e, 8, 8))
  }

  test("star edges survive the within-bucket chain case") {
    // adversarial shape for any member↔bucket-min-ONLY rescore: a chain
    // v0–v1–v2–... where consecutive vectors pass 0.8 but the bucket's
    // min-id member and a far member do NOT — connectivity must still
    // come out whole because the per-cell union-find compares ALL
    // not-yet-connected member pairs, not just pairs with the min.
    // Build: walk a base direction in small steps; step k vs k+1 has
    // cosine ~0.97, step 0 vs 5 ~0.75 (below threshold).
    val base = randVec()
    val dirStep = randVec()
    val chain = (0 until 6).map { k =>
      k.toLong -> {
        val t = k * 0.17
        base.indices.map(i => (base(i) + t * dirStep(i)).toFloat).toArray
      }
    }
    val e = (chain ++ noise.take(60)).toDF("vec_id", "embedding")
    val full = ccOverFullPairs(e, 8, 8)
    val star = ccOverStarEdges(e, 8, 8)
    assert(star == full, "star-edge CC diverged from full-pair CC on a chain corpus")
    // the shape is only adversarial if the chain actually chains:
    // endpoints must NOT be directly >= 0.8 while the whole walk is one
    // component in the exact answer
    assert(full(0L)._1 == full(5L)._1,
      "chain endpoints should share a component via transitivity")
  }

  test("star edges match full pairs on a clone-pile corpus at the adaptive depth") {
    // the reps operator's exact configuration: depth from the mass rule
    val e = corpus.toDF("vec_id", "embedding")
    val rows = Similarity.adaptiveLshRowsByMass(e, corpus.size.toLong)
    assert(ccOverStarEdges(e, 64 / rows, rows) == ccOverFullPairs(e, 64 / rows, rows))
  }

  /** Ground truth for the in-pass stats: the same five aggregates over
    * the materialized distinct-candidate join at identical parameters. */
  private def joinFormStats(frame: org.apache.spark.sql.DataFrame,
                            bands: Int, rows: Int, thr: Double,
                            cap: Int): org.apache.spark.sql.Row = {
    import org.apache.spark.sql.functions._
    Similarity.annLshNearDupPairsOver(frame, bands, rows, thr, cap)
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("vec_a")).as("n_vec_a"),
        countDistinct(col("vec_b")).as("n_vec_b"),
        min(col("cosine")).as("min_cosine"),
        max(col("cosine")).as("max_cosine"))
      .head()
  }

  private def assertStatsEqual(inPass: org.apache.spark.sql.Row,
                               join: org.apache.spark.sql.Row): Unit = {
    assert(inPass.getLong(0) == join.getLong(0),
      s"n_pairs: in-pass ${inPass.getLong(0)} vs join ${join.getLong(0)}")
    assert(inPass.getLong(1) == join.getLong(1), "n_vec_a diverged")
    assert(inPass.getLong(2) == join.getLong(2), "n_vec_b diverged")
    assert(inPass.isNullAt(3) == join.isNullAt(3), "min_cosine nullability")
    if (!join.isNullAt(3)) {
      // bit-equality expected: both sides run the identical QDot
      // integer rescore and IEEE divide
      assert(inPass.getDouble(3) == join.getDouble(3), "min_cosine diverged")
      assert(inPass.getDouble(4) == join.getDouble(4), "max_cosine diverged")
    }
  }

  test("in-pass pair stats equal the join-form stats on the clone-pile corpus") {
    val e = corpus.toDF("vec_id", "embedding")
    assertStatsEqual(
      Similarity.annDedupPairStatsOver(e, 8, 8, 0.8, Similarity.LshBucketCap).head(),
      joinFormStats(e, 8, 8, 0.8, Similarity.LshBucketCap))
  }

  test("in-pass pair stats survive hot-cell attribution under a tiny cap") {
    // shallow 16x4 banding + cap 25 on the 250-vector corpus: average
    // cell occupancy ~15 with piles pushing many cells over the cap, so
    // plenty of pairs have their EARLIEST colliding band dropped as hot
    // and must be attributed to a later kept band — exactly the case a
    // hotness-blind min-band attribution double-drops. Threshold 0.45
    // keeps the qualifying set output-bearing across random pairs.
    val e = corpus.toDF("vec_id", "embedding")
    assertStatsEqual(
      Similarity.annDedupPairStatsOver(e, 16, 4, 0.45, 25).head(),
      joinFormStats(e, 16, 4, 0.45, 25))
  }

  test("in-pass pair stats on an empty qualifying set: zero counts, null extrema") {
    val e = noise.toDF("vec_id", "embedding")
    val r = Similarity.annDedupPairStatsOver(e, 8, 8, 0.8, Similarity.LshBucketCap).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("deep bands pass few random pairs as candidates; shallow bands cannot") {
    val e = noise.toDF("vec_id", "embedding")
    val allPairs = 150 * 149 / 2.0
    // threshold -1 accepts every rescored candidate, exposing the raw
    // candidate set through the public result
    val deep = Similarity.annLshNearDupPairsOver(e, 8, 8, -1.0, Similarity.LshBucketCap).count()
    val shallow = Similarity.annLshNearDupPairsOver(e, 16, 4, -1.0, Similarity.LshBucketCap).count()
    // 8-plane bands: random pair passes ≈ 1-(1-0.5^8)^8 ≈ 3% of pairs
    assert(deep / allPairs < 0.10,
      f"deep banding passed ${deep / allPairs}%.3f of random pairs (expected ~0.03)")
    // 4-plane bands: ≈ 1-(1-0.5^4)^16 ≈ 64% — the documented ceiling of
    // the shallow demo config
    assert(shallow / allPairs > 0.40,
      f"shallow banding passed only ${shallow / allPairs}%.3f of random pairs (expected ~0.64)")
    assert(deep * 5 < shallow,
      s"deep banding should generate far fewer candidates: $deep vs $shallow")
  }
}
