package graft

import graft.quality.Profile
import org.apache.spark.sql.functions._

/** Column-profiling semantics: the melted metric frame agrees with
  * directly-computed aggregates, and the long shape is well-formed
  * (unique metric keys, fixed four-column schema).
  */
class ProfileSpec extends SparkSpec {

  private lazy val prof = Profile.profileTables(spark, sf).collect()

  private def value(tbl: String, col: String, metric: String): Double =
    prof.find(r => r.getAs[String]("tbl") == tbl &&
        r.getAs[String]("col_name") == col &&
        r.getAs[String]("metric") == metric)
      .getOrElse(fail(s"missing metric $tbl/$col/$metric"))
      .getAs[Double]("value")

  test("profile schema is the fixed four-column long shape with unique keys") {
    val df = Profile.profileTables(spark, sf)
    assert(df.columns.toSeq == Seq("tbl", "col_name", "metric", "value"))
    val keys = prof.map(r => (r.getAs[String]("tbl"),
      r.getAs[String]("col_name"), r.getAs[String]("metric")))
    assert(keys.distinct.length == keys.length)
    assert(prof.map(_.getAs[String]("tbl")).toSet == Set("documents", "orders"))
  }

  test("row counts and distincts agree with direct aggregates") {
    val docs = Tables.documents(spark, sf)
    assert(value("documents", "_table_", "row_count") == docs.count().toDouble)
    assert(value("documents", "doc_id", "distinct_count") ==
      docs.select("doc_id").distinct().count().toDouble)
    val orders = Tables.orders(spark, sf)
    assert(value("orders", "_table_", "row_count") == orders.count().toDouble)
    assert(value("orders", "o_orderstatus", "distinct_count") ==
      orders.select("o_orderstatus").distinct().count().toDouble)
  }

  test("numeric min/max and string length metrics are consistent") {
    val docs = Tables.documents(spark, sf)
    val Array(mn, mx) = docs.agg(min("n_chars"), max("n_chars")).head()
      .toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    assert(value("documents", "n_chars", "min") == mn)
    assert(value("documents", "n_chars", "max") == mx)
    assert(value("documents", "n_chars", "min") <= value("documents", "n_chars", "max"))
    assert(value("documents", "text", "min_len") <= value("documents", "text", "avg_len"))
    assert(value("documents", "text", "avg_len") <= value("documents", "text", "max_len"))
  }

  test("completeness is the exact non-null fraction") {
    // test tables are fully populated: completeness must be exactly 1.0
    // (an exact ratio of equal longs, not approximately one)
    prof.filter(_.getAs[String]("metric") == "completeness").foreach { r =>
      assert(r.getAs[Double]("value") == 1.0, r.toString)
    }
  }

  test("k-anonymity audit reports exactly the under-k cells") {
    import org.apache.spark.sql.functions._
    val rows = Profile.kAnonymityAudit(spark, sf).collect()
    val n = Tables.customer(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("cell_size") < Profile.KAnon)
      assert(r.getAs[Long]("cell_size") >= 1)
      assert(r.getAs[Long]("n_customers") == n)
      assert(r.getAs[Double]("share_at_risk") ==
        r.getAs[Long]("cell_size").toDouble / n.toDouble)
    }
    // recompute one flagged cell's population independently
    rows.headOption.foreach { r =>
      val cnt = Tables.customer(spark, sf)
        .filter(col("c_nationkey") === r.getAs[Long]("nationkey")
          && col("c_mktsegment") === r.getAs[String]("segment"))
        .filter(expr("((cast(round(c_acctbal * 100) as bigint) + 10000000) div 100000) - 100")
          === r.getAs[Long]("acctbal_band_k"))
        .count()
      assert(cnt == r.getAs[Long]("cell_size"))
    }
  }
}
