package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}

/** The measured-size broadcast gate for scaling dimensions: the hint
  * must track the DATA, not the (opaque, RDD-backed) stats — broadcast
  * at or under the row budget, plain join above it. The fact build,
  * trade-edge build, and the headline dim joins all route scaling dims
  * through this, so the same code broadcasts at driver SFs and
  * degrades to a shuffle join on the dim-scaled ladder rungs. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
    // the optimized plan is where EliminateResolvedHint has folded the
    // broadcast() marker into Join.hint — the unanalyzed plan has not
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.hint != JoinHint.NONE => j
    }.nonEmpty

  test("a dim at or under the budget is broadcast") {
    val dim = (1 to 10).map(i => (i.toLong, s"d$i")).toDF("k", "v")
    val fact = (1 to 100).map(i => (i.toLong % 10 + 1, i)).toDF("k", "m")
    val joined = fact.join(Joins.broadcastIfSmall(dim, maxRows = 10), "k")
    assert(hasBroadcastHint(joined), "expected a broadcast hint at 10 <= 10")
    assert(joined.count() == 100)
  }

  test("a dim past the budget is NOT force-broadcast") {
    val dim = (1 to 11).map(i => (i.toLong, s"d$i")).toDF("k", "v")
    val fact = (1 to 100).map(i => (i.toLong % 10 + 1, i)).toDF("k", "m")
    val joined = fact.join(Joins.broadcastIfSmall(dim, maxRows = 10), "k")
    assert(!hasBroadcastHint(joined), "expected no hint at 11 > 10")
    assert(joined.count() == 100)
  }

  test("the fact build's scaling-dim joins arrive via broadcast at spec scale") {
    // at sf0.001 both gated dims are far under the budget, so the
    // physical plan must show broadcast joins — the measured gate
    // choosing, where the static planner (opaque Dist-ranked stats)
    // would sort-merge a 1500-row dimension at any scale
    val plan = graft.warehouse.Warehouse.buildFact(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"expected >= 3 broadcast dim joins in:\n$plan")
  }

  test("the served fact is a stored parquet scan, value-equal to the build") {
    // the store discards the join lineage (the 300x ENOSPC lesson: a
    // cached plan pins its shuffle files for the session's lifetime)
    val served = graft.warehouse.Warehouse.fact(spark, sf)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("parquet"), s"expected a parquet scan serve path in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "served fact must not re-run the build joins")
    val built = graft.warehouse.Warehouse.buildFact(spark, sf)
    assert(served.count() == built.count())
    assert(served.exceptAll(built).isEmpty && built.exceptAll(served).isEmpty,
      "stored fact differs from a fresh build")
  }
}
