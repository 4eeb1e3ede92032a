package graft

import graft.warehouse.Scd2
import org.apache.spark.sql.functions._

/** Point-in-time SCD2 join invariants (the oracle proves value
  * equality; these prove the semantic contract). */
class Scd2PitSpec extends SparkSpec {

  test("every order matches exactly one dimension version") {
    val n = Tables.orders(spark, sf).count()
    val matched = Scd2.pitOrders(spark, sf).agg(sum("n_orders")).head().getLong(0)
    assert(matched == n, s"PIT join lost or fanned out orders: $matched vs $n")
  }

  test("upgraded segments only carry orders from the v2 era") {
    val rows = Scd2.pitOrders(spark, sf)
      .filter(col("segment").endsWith("+")).collect()
    assert(rows.nonEmpty, "synthetic v2 versions produced no orders")
    val v2Year = Scd2.PitV2Date.take(4).toLong
    assert(rows.forall(_.getAs[Long]("order_year") >= v2Year),
      "an order landed in a '+' segment before that version existed")
  }

  test("version intervals partition each key's timeline") {
    val dim = Scd2.fromHistory(Scd2.pitHistory(spark, sf), "c_custkey", "changed_on")
    // one open version per key; no overlaps (next effective == prior end)
    val open = dim.filter(col("is_current")).groupBy("c_custkey").count()
      .filter(col("count") =!= 1).count()
    assert(open == 0, "a key has != 1 open version")
    val overlap = dim.alias("a").join(dim.alias("b"), "c_custkey")
      .filter(col("a.effective_date") < col("b.effective_date")
        && col("b.effective_date") < col("a.end_date")).count()
    assert(overlap == 0, "overlapping version intervals")
  }
}
