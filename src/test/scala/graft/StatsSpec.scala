package graft

import graft.analytics.Stats
import org.apache.spark.sql.functions._

/** Key-skew diagnosis and equi-depth histogram semantics. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("skew diagnosis ranks heavy keys with exact shares and ratios") {
    // 16 rows over 6 keys: A=10, B=2, C..F=1 → avg load 16/6
    val keyed = (Seq.fill(10)("A") ++ Seq.fill(2)("B") ++ Seq("C", "D", "E", "F"))
      .toDF("key")
    val rows = Stats.skewDiagnosisOver(keyed).collect()
    assert(rows.length == 5)
    val top = rows.head
    assert(top.getAs[Long]("rank") == 1L && top.getAs[String]("key") == "A")
    assert(top.getAs[Long]("cnt") == 10L)
    assert(top.getAs[Double]("share_of_rows") == 10.0 / 16.0)
    assert(top.getAs[Double]("skew_x_avg") == 10.0 / (16.0 / 6.0))
    assert(top.getAs[Double]("max_skew_x_avg") == top.getAs[Double]("skew_x_avg"))
    assert(top.getAs[Long]("n_keys") == 6L && top.getAs[Long]("total_rows") == 16L)
    // ties below rank 2 break on the key, ascending
    assert(rows.map(_.getAs[String]("key")).toSeq == Seq("A", "B", "C", "D", "E"))
  }

  test("skew diagnosis plans a top-k, not a global key sort") {
    val plan = Stats.skewDiagnosis(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("revenue concentration: gini in [0,1), top quintile holds >= its share") {
    val r = Stats.revenueConcentration(spark, sf).head()
    val gini = r.getAs[Double]("gini")
    assert(gini >= 0.0 && gini < 1.0, s"gini $gini")
    val share = r.getAs[Double]("top20pct_share")
    // the top 20% of products can never hold LESS than 20% of revenue
    assert(share >= 0.2 - 1e-12 && share <= 1.0, s"share $share")
    assert(r.getAs[Long]("n_products") > 0 && r.getAs[Long]("total_cents") > 0)
  }

  test("OLS moments: r bounded, slope/intercept reproduce the means") {
    val r = Stats.olsDiscountQuantity(spark, sf).head()
    assert(r.getAs[Long]("n_rows") == Tables.lineitem(spark, sf).count())
    val pr = r.getAs[Double]("pearson_r")
    assert(pr >= -1.0 && pr <= 1.0)
    // the fitted line passes through (x̄, ȳ): intercept = ȳ − slope·x̄
    val m = Tables.lineitem(spark, sf).agg(
      avg(round(col("l_discount") * 100)), avg(round(col("l_quantity")))).head()
    val (mx, my) = (m.getDouble(0), m.getDouble(1))
    val fitted = r.getAs[Double]("intercept") + r.getAs[Double]("slope_per_pct") * mx
    assert(math.abs(fitted - my) < 1e-6, s"line misses the centroid: $fitted vs $my")
  }

  test("spearman rho is bounded and rank maps cover every row") {
    val r = Stats.spearmanDiscountQuantity(spark, sf).head()
    assert(r.getAs[Long]("n_rows") == Tables.lineitem(spark, sf).count(),
      "every row must survive the value->rank joins")
    val rho = r.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("per-brand OLS partitions rows and global moments dominate") {
    val rows = Stats.olsByBrand(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("slope_per_pct")))
        assert(!r.getAs[Double]("slope_per_pct").isNaN)
    }
  }

  test("fulfillment lag quantiles are ordered and nonnegative") {
    val rows = graft.analytics.Quantiles.fulfillmentLag(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Long]("p50_days"),
        r.getAs[Long]("p90_days"), r.getAs[Long]("p99_days"))
      assert(p50 >= 0 && p50 <= p90 && p90 <= p99, r.toString)
    }
  }

  test("equi-depth bounds are non-decreasing and end at the group max") {
    val rows = Stats.equiDepthHistogram(spark, sf).collect()
    val fact = graft.warehouse.Warehouse.fact(spark, sf)
      .select(col("payment_method"),
        (col("line_total") * lit(1000000)).cast("long").as("v"))
    val maxes = fact.groupBy("payment_method").agg(max("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = fact.groupBy("payment_method").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (pm, rs) =>
      assert(rs.length == 8, s"$pm should have 8 buckets")
      val bounds = rs.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Long]("upper_micros"))
      assert(bounds.zip(bounds.tail).forall { case (a, b) => a <= b }, s"$pm: $bounds")
      assert(bounds.last == maxes(pm), s"$pm final bound must be the max")
      assert(rs.head.getAs[Long]("n_rows") == counts(pm))
    }
    // equi-depth: each bucket holds between floor and ceil of n/8 rows
    // (exact on distinct-heavy data; duplicates can only move a bound)
    val pm0 = rows.map(_.getString(0)).min
    val b = rows.filter(_.getString(0) == pm0).sortBy(_.getAs[Long]("bucket"))
      .map(_.getAs[Long]("upper_micros"))
    val n = counts(pm0)
    val vals = fact.filter(col("payment_method") === pm0)
      .select("v").as[Long].collect().sorted
    (1 to 8).foreach { i =>
      val atOrBelow = vals.count(_ <= b(i - 1))
      assert(atOrBelow >= math.ceil(n * i / 8.0).toLong,
        s"bucket $i bound covers rank ceil(n*i/8)")
    }
  }
}
