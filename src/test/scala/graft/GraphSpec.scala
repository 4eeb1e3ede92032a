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
}
