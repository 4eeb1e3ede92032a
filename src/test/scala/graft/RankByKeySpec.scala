package graft

import graft.warehouse.Warehouse
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** rankByUniqueKey must equal the single-partition
  * `row_number().over(Window.orderBy(key))` it replaced — on key sets
  * far nastier than the dims it numbers in production (the dim oracles
  * cover those). */
class RankByKeySpec extends SparkSpec {
  import spark.implicits._

  private def check(keys: Seq[Long]): Unit = {
    val df = keys.toDF("k").repartition(7) // scramble the input layout
    val got = Warehouse.rankByUniqueKey(df, "k", "rk")
      .select("k", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.select(col("k"),
        row_number().over(Window.orderBy("k")).cast("long").as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("matches the global window on skewed, negative, and sparse keys") {
    // clustered runs + far outliers + negatives: range partitions will be
    // unbalanced and some will be empty-ish
    check(Seq(-5000000L, -1L, 0L, 1L, 2L, 3L, 1000L, 1001L, 1002L,
      900000000L, 900000001L, Long.MaxValue / 2))
    // dense block (single range dominates)
    check((1L to 500L) ++ Seq(1000000L))
    // reversed insertion order must not matter
    check((500L to 1L by -1L))
  }

  test("fewer rows than partitions still numbers densely from 1") {
    check(Seq(42L, 7L))
    check(Seq(7L))
  }

  test("rankByKeys matches the composite-order global window, incl. heavy ties") {
    // the revenue_concentration shape: rank by (measure, tiebreak id)
    // where the measure carries heavy duplicate runs — range partitions
    // split INSIDE a tie run, which is exactly where a composite-key
    // bug would show
    val rows = Seq((5L, 1L), (5L, 9L), (5L, 3L), (1L, 7L), (1L, 2L),
      (9L, 1L), (0L, 0L), (5L, 2L), (1L, 1L), (5L, 11L), (5L, 4L))
    val df = rows.toDF("m", "id").repartition(7)
    val got = Dist.rankByKeys(df, Seq("m", "id"), "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.select(col("m"), col("id"),
        row_number().over(Window.orderBy("m", "id")).cast("long").as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("exclusiveCumsum equals the single-partition running sum directly") {
    // the shared primitive under rankByUniqueKey AND Packing's offsets —
    // covered here on its own so neither caller's spec is its only net
    val rows = Seq((10L, 3L), (2L, 5L), (7L, 0L), (30L, 11L), (1L, 2L), (15L, 7L))
    val df = rows.toDF("k", "v").repartition(5)
    val got = Dist.exclusiveCumsum(df, "k", "v", "cum")
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.select(col("k"),
        (sum("v").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, 0)) - col("v")).as("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }
}
