package graft

import graft.analytics.Graph
import org.apache.spark.sql.functions._

/** Integer PageRank invariants (the oracle proves cross-engine value
  * equality; these prove the algorithm's contract). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed two-node graph, one iteration") {
    // A -> B (w=1). outw(A)=1. After 1 iter:
    //   contrib(B) = (INIT*1) div 1 = INIT
    //   r(B) = 15%INIT + 85%INIT = INIT; r(A) = 15%INIT (no in-edges)
    val edges = Seq(("A", "B", 1L)).toDF("src", "dst", "w")
    val r = Graph.pagerank(edges, iters = 1).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val base = 15L * Graph.RankInit / 100L
    assert(r("A") == base)
    assert(r("B") == base + 85L * Graph.RankInit / 100L)
  }

  test("rank mass is bounded and every node keeps the damping floor") {
    val ranks = Graph.pagerankNationTrade(spark, sf).collect()
    assert(ranks.nonEmpty)
    val base = 15L * Graph.RankInit / 100L
    assert(ranks.forall(_.getAs[Long]("rank_units") >= base),
      "a node fell below the teleport floor")
    // total mass can only shrink (floor division + rank lost at sinks)
    val total = ranks.map(_.getAs[Long]("rank_units")).sum
    assert(total <= ranks.length * Graph.RankInit)
  }

  test("iteration is deterministic under repartitioning") {
    val edges = Graph.tradeEdges(spark, sf)
    val a = Graph.pagerank(edges, 3).orderBy("node").collect().toSeq
    val b = Graph.pagerank(edges.repartition(7), 3).orderBy("node").collect().toSeq
    assert(a == b, "rank values depend on partitioning")
  }

  test("triangle census on a hand-computed co-purchase graph") {
    // baskets {1,2,3}, {3,4}, {2,3,4}, {5} → edges (1,2)(1,3)(2,3)(3,4)(2,4)
    // triangles {1,2,3} and {2,3,4}; degrees 2,3,3,2 → 1+3+3+1 = 8 wedges
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 3L), (20L, 4L),
      (30L, 2L), (30L, 3L), (30L, 4L),
      (40L, 5L),
      (10L, 1L)) // duplicate line must not create a self-edge or recount
      .toDF("l_orderkey", "l_partkey")
    val r = Graph.triangleCountOver(li).head()
    assert(r.getAs[Long]("n_vertices") == 4L) // isolated part 5 excluded
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("n_wedges") == 8L)
    assert(r.getAs[Long]("n_triangles") == 2L)
    assert(r.getAs[Double]("transitivity") == 3.0 * 2L / 8L)
    // census is partition-layout invariant
    val again = Graph.triangleCountOver(li.repartition(7)).head()
    assert(r.toSeq == again.toSeq)
  }

  test("triangle census degrades gracefully on an edge-free corpus") {
    // single-item baskets → no co-purchase edges: the census must emit
    // zeros and a NULL transitivity, not NPE on a null wedge sum or
    // divide 0/0 into NaN
    val li = Seq((10L, 1L), (20L, 2L)).toDF("l_orderkey", "l_partkey")
    val r = Graph.triangleCountOver(li).head()
    assert(r.getAs[Long]("n_vertices") == 0L)
    assert(r.getAs[Long]("n_edges") == 0L)
    assert(r.getAs[Long]("n_wedges") == 0L)
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.isNullAt(r.fieldIndex("transitivity")))
  }
}
