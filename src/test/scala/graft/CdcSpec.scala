package graft

import graft.etl.Cdc

/** Snapshot-diff semantics: insert/delete/update classification, null-safe
  * column comparison, and silence on identical snapshots.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, Option[String], Double)*) =
    rows.toDF("k", "status", "price")

  private def diff(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame) =
    Cdc.snapshotDiff(a, b, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("classifies inserts, deletes, updates; unchanged rows are silent") {
    val old = snap((1L, Some("A"), 10.0), (2L, Some("B"), 20.0),
      (3L, Some("C"), 30.0), (4L, Some("D"), 40.0))
    val neu = snap((1L, Some("A"), 10.0),          // unchanged
      (2L, Some("B"), 25.0),                        // update (price)
      (4L, Some("E"), 40.0),                        // update (status)
      (5L, Some("F"), 50.0))                        // insert; 3 deleted
    assert(diff(old, neu) == Map(
      2L -> "update", 3L -> "delete", 4L -> "update", 5L -> "insert"))
  }

  test("null-safe compare: null->value is an update, null->null is not") {
    val old = snap((1L, None, 10.0), (2L, None, 20.0))
    val neu = snap((1L, None, 10.0), (2L, Some("X"), 20.0))
    assert(diff(old, neu) == Map(2L -> "update"))
  }

  test("identical snapshots diff to empty") {
    val s = snap((1L, Some("A"), 1.0), (2L, Some("B"), 2.0))
    assert(diff(s, s).isEmpty)
  }

  test("ivm delta-merge equals a full recompute of the perturbed snapshot") {
    import org.apache.spark.sql.functions._
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // keys chosen to hit every CDC class: 97 deletes, 100 updates
    // (+1.00), 101 re-inserts under key+1e10, others unchanged
    val orders = Seq(
      (97L, d("2024-03-01"), 50.0),
      (100L, d("2024-03-01"), 10.0),
      (101L, d("2024-03-02"), 20.0),
      (1L, d("2024-03-02"), 5.0),
      (2L, d("2024-03-03"), 7.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Cdc.ivmDailySalesOver(orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // Mar 1: key 97 deleted, key 100 updated to 11.00 → 1 order, 11.00
    assert(out("2024-03-01") == (1L, 11.0))
    // Mar 2: 101 (20) + its re-insert (20) + key 1 (5) → 3 orders, 45.00
    assert(out("2024-03-02") == (3L, 45.0))
    assert(out("2024-03-03") == (1L, 7.0))
    // and the delta path must equal a Spark-side full recompute too
    val full = Cdc.perturbedOrders(orders)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(graft.Det.dec6(col("o_totalprice"))), 2)
          .cast("decimal(18,2)").cast("double").as("rev"))
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == full)
  }

  test("registered orders diff matches the perturbation arithmetic") {
    val orders = Tables.orders(spark, sf)
    import org.apache.spark.sql.functions._
    val k = col("o_orderkey")
    val nDel = orders.filter(k % 97 === 0).count()
    val nUpd = orders.filter(k % 100 === 0 && k % 97 =!= 0).count()
    val nIns = orders.filter(k % 101 === 0).count()
    val out = Cdc.cdcOrdersDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.getOrElse("delete", 0L) == nDel)
    assert(out.getOrElse("update", 0L) == nUpd)
    assert(out.getOrElse("insert", 0L) == nIns)
  }
}
