package graft

import graft.etl.{Cleanse, Load}
import graft.monitor.Monitor
import graft.quality.Quality
import org.apache.spark.sql.functions._

class EtlQualitySpec extends SparkSpec {

  test("cleanse_lineitems recompute is always consistent and filters hold") {
    val df = Cleanse.cleanseLineitems(spark, sf)
    assert(df.filter(!col("is_consistent")).count() == 0)
    assert(df.filter(col("quantity") <= 0).count() == 0)
  }

  test("cleanse_customers title-cases and strips digits") {
    val row = Cleanse.cleanseCustomers(spark, sf)
      .filter(col("customer_id") === 1).head
    assert(row.getAs[String]("name_clean").startsWith("Customer#"))
    assert(row.getAs[String]("id_digits").forall(_.isDigit))
    assert(row.getAs[String]("segment") == row.getAs[String]("segment").toLowerCase)
  }

  test("incremental load returns exactly the not-yet-loaded keys") {
    val keys = Load.incrementalNewOrders(spark, sf).select("order_id")
    assert(keys.filter(col("order_id") % 3 =!= 0).count() == 0)
    assert(keys.count() > 0)
  }

  test("quality_checks has 12 checks and zero orphans") {
    val checks = Quality.qualityChecks(spark, sf).collect()
    assert(checks.length == 12)
    val orphans = checks.filter(r =>
      r.getAs[String]("check_name").startsWith("orphan_"))
    assert(orphans.nonEmpty && orphans.forall(_.getAs[Long]("violations") == 0))
  }

  test("quality_score is a valid grade over actual records") {
    val r = Quality.qualityScore(spark, sf).head
    val score = r.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 100.0)
    assert(Set("A", "B", "C", "D").contains(r.getAs[String]("grade")))
  }

  test("reconcile_counts covers the four entities") {
    val rows = Load.reconcileCounts(spark, sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).toSet ==
      Set("customer", "part", "orders", "lineitem"))
    assert(rows.forall(r => r.getAs[Long]("loaded_rows") <= r.getAs[Long]("source_rows")))
  }

  test("freshness probes all three layers with non-negative lag") {
    val rows = Load.freshnessUnion(spark, sf).collect()
    assert(rows.map(_.getAs[String]("layer")).toSet ==
      Set("staging", "production", "warehouse"))
    assert(rows.forall(_.getAs[Long]("lag_days") >= 0))
  }

  test("volume anomaly window has rows and finite stats") {
    val rows = Monitor.volumeAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getAs[Double]("stddev_count").isNaN))
  }

  test("backlog aging partitions exactly the unfinished orders") {
    import org.apache.spark.sql.functions._
    val rows = graft.etl.Load.backlogAging(spark, sf).collect()
    assert(rows.nonEmpty)
    val open = Tables.orders(spark, sf)
      .filter(col("o_orderstatus").isin("O", "P")).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == open)
    val buckets = Set("1_under_90d", "2_under_1y", "3_under_2y", "4_over_2y")
    rows.foreach { r =>
      assert(buckets(r.getAs[String]("age_bucket")))
      assert(r.getAs[Double]("open_value") > 0.0)
    }
  }

  test("hourly heatmap covers the week grid with shares summing to 1") {
    val rows = graft.analytics.Funnels.hourlyHeatmap(spark, sf).collect()
    assert(rows.length <= 168 && rows.nonEmpty)
    rows.foreach { r =>
      val (dow, hod) = (r.getAs[Int]("dow"), r.getAs[Int]("hod"))
      assert(dow >= 1 && dow <= 7 && hod >= 0 && hod <= 23)
    }
    val s = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(s - 1.0) < 1e-9)
  }
}
