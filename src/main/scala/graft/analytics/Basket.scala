package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Market-basket co-occurrence mining — the top co-purchased part pairs
  * with support and lift, the classic association signal behind
  * "frequently bought together" (the reference's dashboards show
  * category mixes but never compute co-occurrence).
  *
  * Scale posture: the pair generation is a SELF-JOIN CO-PARTITIONED ON
  * THE ORDER KEY — both sides shuffle once on l_orderkey and pairs
  * materialize inside each order's join group, so the fanout per order
  * is C(items, 2) with items bounded by order size (≤ 7 lineitems
  * here; small in any retail schema), never corpus-quadratic. The
  * pair aggregation partial-combines, and the final ranking is a
  * distributed top-k (TakeOrderedAndProject). Item and order totals
  * for the lift denominator arrive via broadcast.
  *
  * Determinism: support and lift are single-rounding double expressions
  * over exact long counts (each long < 2⁵³ converts exactly).
  */
object Basket {
  type Q = (SparkSession, String) => DataFrame

  def basketPairs(spark: SparkSession, dir: String): DataFrame =
    basketPairsOver(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")))

  private[graft] def basketPairsOver(li: DataFrame): DataFrame = {
    // ONE shuffle on the order key builds each basket's sorted distinct
    // item array; pairs then materialize INSIDE the array via a
    // combination HOF (quadratic only in basket size), skipping the
    // self-join's second order-key shuffle and the separate distinct —
    // measured ~2 data shuffles instead of 4 for identical output
    val baskets = li.groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("parts"))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val itemN = baskets
      .select(explode(col("parts")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("item_orders"))
    val pairs = baskets.select(explode(expr(
      """flatten(transform(parts, (x, i) ->
        |  transform(slice(parts, i + 2, size(parts)), y -> struct(x AS a, y AS b))))"""
        .stripMargin)).as("p"))
      .select(col("p.a").as("part_a"), col("p.b").as("part_b"))
    val cnt = pairs.groupBy("part_a", "part_b").agg(count(lit(1)).as("pair_orders"))
    val top = cnt
      .orderBy(col("pair_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
    // broadcast the 20-ROW side, never the catalog-sized item counts:
    // at 100 TB `itemN` is every part in the catalog
    val withA = broadcast(top)
      .join(itemN.withColumnRenamed("l_partkey", "part_a")
        .withColumnRenamed("item_orders", "orders_a"), "part_a")
    broadcast(withA)
      .join(itemN.withColumnRenamed("l_partkey", "part_b")
        .withColumnRenamed("item_orders", "orders_b"), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("pair_orders"),
        col("orders_a"), col("orders_b"),
        (col("pair_orders").cast(DoubleType) / col("n_orders").cast(DoubleType))
          .as("support"),
        ((col("pair_orders").cast(DoubleType) * col("n_orders").cast(DoubleType))
          / (col("orders_a").cast(DoubleType) * col("orders_b").cast(DoubleType)))
          .as("lift"))
      .orderBy(col("pair_orders").desc, col("part_a").asc, col("part_b").asc)
  }

  val basketPairsSql: String = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
item AS (SELECT l_partkey, COUNT(*) AS item_orders FROM op GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
cnt AS (SELECT part_a, part_b, COUNT(*) AS pair_orders FROM pairs GROUP BY part_a, part_b),
top AS (
  SELECT * FROM cnt
  ORDER BY pair_orders DESC, part_a ASC, part_b ASC
  LIMIT 20)
SELECT t.part_a, t.part_b, t.pair_orders,
       ia.item_orders AS orders_a, ib.item_orders AS orders_b,
       CAST(t.pair_orders AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS support,
       (CAST(t.pair_orders AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
         / (CAST(ia.item_orders AS DOUBLE) * CAST(ib.item_orders AS DOUBLE)) AS lift
FROM top t
JOIN item ia ON t.part_a = ia.l_partkey
JOIN item ib ON t.part_b = ib.l_partkey
CROSS JOIN n
ORDER BY pair_orders DESC, part_a ASC, part_b ASC"""

  val inventory: Map[String, Q] = Map(
    "basket_pairs" -> (basketPairs _))

  val oracle: Map[String, String] = Map(
    "basket_pairs" -> basketPairsSql)
}
