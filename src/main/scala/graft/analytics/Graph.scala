package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Weighted PageRank over the nation-level trade graph — which
  * countries sit at the center of the order flow (customers in nation
  * A buying from suppliers in nation B). The reference's dashboards
  * show per-region revenue rollups but never a graph centrality; this
  * closes the iterative-graph family next to the connected-components
  * dedup (text/DedupClusters.scala).
  *
  * Determinism (the hard part of verifying an iterative double-typed
  * algorithm): ranks live as BIGINT in units of 1e-12 — every
  * per-edge contribution is floor(r·w/ow) computed WITHOUT forming
  * the raw product: `(r div ow)*w + ((r mod ow)*w) div ow` (an exact
  * identity for non-negative integers; floor division of positives is
  * identical in Spark and DuckDB), the damping update is
  * `(15*INIT) div 100 + (85*Σ) div 100`, so five iterations stay
  * bit-exact across engines and partition orders. No floats anywhere.
  * The split form bounds intermediates by max(r, ow·w) instead of
  * r·w: a direct `(r*w) div ow` overflows Long once concentrated rank
  * (~|V|·1e12) meets large edge weights, wrapping silently in Spark
  * (ANSI off) while DuckDB errors — the split keeps the contract to
  * any scale with ow < ~3e9 (√Long.MaxValue; a 100 TB lineitem count
  * per source nation sits well under that).
  *
  * Scale posture: the edge build pays ONE big-big shuffle (lineitem ⋈
  * orders on the order key) with every dim broadcast; edges aggregate
  * to node-pair grain before any iteration, so each PageRank step is a
  * join + partial-combined aggregate on frames bounded by |V| and |E|
  * — never by fact rows. Each step shuffles on the join key once; at
  * a 100 TB edge list you'd pre-partition `edges` by src and reuse the
  * exchange across all five steps (the loop reuses one cached edge
  * frame, so AQE does exactly that).
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** 1.0 of rank in integer units. */
  val RankInit = 1000000000000L

  val Iters = 5

  /** Generic integer-arithmetic weighted PageRank over an edge frame
    * `(src, dst, w)`. Damping 0.85 as exact integer 85/100 splits. */
  private[graft] def pagerank(edges: DataFrame, iters: Int = Iters): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val outw = edges.groupBy("src").agg(sum("w").cast(LongType).as("ow"))
    val ew = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("ow"))
    var ranks = nodes.withColumn("r", lit(RankInit))
    for (_ <- 1 to iters) {
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(r div ow) * w + ((r % ow) * w) div ow"))
          .cast(LongType).as("contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(15L * RankInit / 100L) +
            expr("(85 * coalesce(contrib, 0L)) div 100")).as("r"))
    }
    ranks
  }

  /** Customer-nation → supplier-nation edges weighted by lineitem
    * count: one order-key shuffle, all four dims broadcast. */
  private[graft] def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .join(broadcast(n).as("cn"), c("c_nationkey") === col("cn.n_nationkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n).as("sn"), s("s_nationkey") === col("sn.n_nationkey"))
      .groupBy(col("cn.n_name").as("src"), col("sn.n_name").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  def pagerankNationTrade(spark: SparkSession, dir: String): DataFrame =
    pagerank(tradeEdges(spark, dir))
      .select(col("node").as("nation"), col("r").as("rank_units"))
      .orderBy(col("rank_units").desc, col("nation"))

  val pagerankNationTradeSql: String = {
    val iterCtes = (1 to Iters).map { i =>
      s"""r$i AS (
  SELECT n.node,
         CAST((15 * $RankInit) // 100 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM((r.r // e.ow) * e.w + ((r.r % e.ow) * e.w) // e.ow) AS BIGINT) AS contrib
    FROM ew e JOIN r${i - 1} r ON e.src = r.node
    GROUP BY e.dst) c ON n.node = c.node)"""
    }.mkString(",\n")
    s"""
WITH edges AS (
  SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  GROUP BY cn.n_name, sn.n_name),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
ew AS (
  SELECT e.src, e.dst, e.w, o.ow
  FROM edges e JOIN (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src) o
    ON e.src = o.src),
r0 AS (SELECT node, CAST($RankInit AS BIGINT) AS r FROM nodes),
$iterCtes
SELECT node AS nation, r AS rank_units FROM r$Iters
ORDER BY rank_units DESC, nation"""
  }

  val inventory: Map[String, Q] = Map(
    "pagerank_nation_trade" -> (pagerankNationTrade _))

  val oracle: Map[String, String] = Map(
    "pagerank_nation_trade" -> pagerankNationTradeSql)
}
