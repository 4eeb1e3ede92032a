package graft

import graft.analytics.Analytics
import graft.etl.Cleanse

/** Plan-shape regression tests — the properties that make these queries
  * scale-safe must survive refactors: filter pushdown into the parquet
  * scan, column pruning, broadcast dims, top-k without a global sort.
  */
class PlanSpec extends SparkSpec {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("cleanse filters are pushed down to the parquet scan") {
    val plan = physicalPlan(Cleanse.cleanseProducts(spark, sf))
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThan(p_retailprice,0.0)"), plan.take(2000))
  }

  test("cleanse scan reads only the needed columns") {
    val plan = physicalPlan(Cleanse.cleanseProducts(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_retailprice") && !readSchema.contains("p_brand"),
      s"expected pruned schema, got: $readSchema")
  }

  test("q01 plans a top-k (TakeOrderedAndProject), not a global sort") {
    val plan = physicalPlan(Analytics.q01(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("q01 joins dims via broadcast, never shuffles a dimension") {
    val plan = physicalPlan(Analytics.q01(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"),
      "dimension join fell back to sort-merge")
  }

  test("fact build shuffles only on the order key (dims all broadcast)") {
    // count Exchange operators in the UNCACHED fact plan: the only
    // shuffle allowed is lineitem<->orders co-partitioning (2 exchange
    // nodes, one per side) plus the line_seq window which reuses the
    // same l_orderkey partitioning; dims must arrive via broadcast.
    val plan = physicalPlan(SparkEntry.queries("fact_sales")(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected 3 broadcast dim joins, got $broadcasts")
    assert(!plan.contains("CartesianProduct"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(exchanges.forall(_ => plan.contains("l_orderkey")),
      "fact shuffle must be keyed by l_orderkey")
  }

  test("no query plan contains a cartesian product") {
    // cross joins are only legal against single-row or broadcast stats
    // relations (grand totals); a CartesianProduct over two big inputs
    // is always a bug.
    Seq("q02_monthly_trend", "q06_geo_revenue", "dedup_jaccard_pairs")
      .foreach { q =>
        val plan = physicalPlan(SparkEntry.queries(q)(spark, sf))
        assert(!plan.contains("CartesianProduct"), s"$q has a cartesian product")
      }
  }
}
