package graft

import graft.sim.{Ivf, Ivfpq, Pq}

/** IVF-PQ composition invariants. */
class IvfpqSpec extends SparkSpec {

  test("results are a subset of the probed cells' members") {
    val idx = Ivf.buildIndexFull(spark, sf, Ivf.K)
    val members = idx.assignments.select("vec_id", "cell").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val rows = Ivfpq.search(spark, sf).collect()
    assert(rows.nonEmpty)
    // every returned candidate must belong to SOME cell (i.e. came
    // through the inverted lists, not a full scan)
    rows.foreach(r => assert(members.contains(r.getAs[Long]("vec_id"))))
  }

  test("per-query ranks are contiguous and distances match PQ on shared hits") {
    val ivfpq = Ivfpq.search(spark, sf).collect()
    val byQ = ivfpq.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= Pq.TopK)
    }
    // the ADC distance of a (query, vec) pair is index-independent:
    // where IVF-PQ and plain PQ both return the pair, distances agree
    val pq = Pq.search(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Long]("approx_d2")).toMap
    ivfpq.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      pq.get(k).foreach(d => assert(d == r.getAs[Long]("approx_d2"),
        s"ADC distance of $k differs between indexes"))
    }
  }

  test("recall frame covers every query with sane bounds") {
    val pruned = Ivfpq.recallVsExact(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("recall_at_k"))).toMap
    assert(pruned.keySet == (0L until Ivf.NQueries.toLong).toSet)
    pruned.foreach { case (q, (hits, recall)) =>
      assert(hits >= 0 && hits <= Pq.TopK, s"query $q hits $hits")
      assert(recall == hits.toDouble / Pq.TopK, s"query $q recall mismatch")
    }
    // the index must find SOMETHING across the sample — an all-zero
    // recall row would mean the probe or the code join is broken
    assert(pruned.values.map(_._1).sum > 0)
  }
}
