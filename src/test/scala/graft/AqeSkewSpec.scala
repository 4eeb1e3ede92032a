package graft

import graft.etl.Skew
import graft.{Det, Tables}
import org.apache.spark.sql.functions._

/** AQE skew-join is the runtime complement to manual salting
  * (etl/Skew.scala): with `spark.sql.adaptive.skewJoin.enabled`, Spark
  * splits oversized shuffle partitions of a sort-merge join at runtime —
  * no code change, no salt column. Salting is still needed where AQE
  * cannot reach: skewed AGGREGATION keys (AQE only splits join
  * partitions), and deterministic pre-partitioning for repeated
  * pipelines. This spec documents the boundary by planning the same
  * skewed join both ways and asserting identical results.
  */
class AqeSkewSpec extends SparkSpec {

  /** The unsalted form of [[Skew.saltedBrandRevenue]]'s join+agg. */
  private def plainBrandRevenue(s: org.apache.spark.sql.SparkSession) = {
    val li = Tables.lineitem(s, sf)
      .select(col("l_partkey"), col("l_extendedprice"))
    val p = Tables.part(s, sf).select("p_partkey", "p_brand")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_lines"),
        Det.msum(col("l_extendedprice")).as("revenue"))
      .orderBy("p_brand")
  }

  test("AQE skew-join on the unsalted join matches the salted rewrite exactly") {
    val aqe = spark.newSession()
    aqe.conf.set("spark.sql.adaptive.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // aggressive thresholds so runtime skew handling engages even at
    // test scale; -1 broadcast threshold forces the shuffle join AQE
    // skew-splitting applies to
    aqe.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    aqe.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    aqe.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    aqe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val viaAqe = plainBrandRevenue(aqe).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val viaSalt = Skew.saltedBrandRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // exact equality: both sum in decimal space, so the doubles are
    // order-independent and must agree bit-for-bit
    assert(viaAqe.nonEmpty)
    assert(viaAqe.sameElements(viaSalt),
      s"AQE result diverged from salted result:\n${viaAqe.take(3).mkString}\n${viaSalt.take(3).mkString}")

    // and the unsalted plan under AQE really is a shuffle join (the
    // shape skew-splitting applies to), not a broadcast
    val plan = plainBrandRevenue(aqe).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle join under AQE:\n${plan.take(1500)}")
  }
}
