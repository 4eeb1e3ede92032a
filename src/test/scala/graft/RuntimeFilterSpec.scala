package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the row-level complement of the
  * static pushdown PlanSpec asserts: with a selective filter on one
  * join side, Spark injects a bloom filter built from that side into
  * the other side's scan, so most non-matching fact rows die before
  * the shuffle. Part of the 100 TB posture alongside AQE skew-join
  * (Sessions.clusterDefaults keeps both on for cluster runs).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a runtime bloom filter into the fact scan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

    val li = s.read.parquet(s"$sf/lineitem.parquet")
    val o = s.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))

    val optimized = j.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optimized.contains("bloom"),
      s"no bloom filter injected:\n${optimized.take(1500)}")

    // and the filtered join still returns exactly the unfiltered-engine rows
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
    assert(j.count() == plain.count() && plain.count() > 0)
  }
}
