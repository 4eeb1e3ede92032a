package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Bucketing is the shuffle-elimination story at 100 TB: the
  * lineitem⋈orders co-partition join — the one unavoidable shuffle in
  * the fact build — disappears entirely when both tables are bucketed
  * on the order key at write time. This spec proves the claim on the
  * physical plan, not just in scaladoc. Broadcast is disabled for the
  * assertion because at test scale orders fits under the threshold; at
  * fact-to-fact scale neither side broadcasts and the bucket layout is
  * what saves the exchange.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed")
    val buckets = 4
    Sources.writeBucketed(Tables.orders(spark, sf),
      "orders_bkt", s"$dir/orders", Seq("o_orderkey"), buckets, Seq("o_orderkey"))
    Sources.writeBucketed(Tables.lineitem(spark, sf),
      "lineitem_bkt", s"$dir/lineitem", Seq("l_orderkey"), buckets, Seq("l_orderkey"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderpriority")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a bucket-local join:\n${plan.take(2000)}")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n${plan.take(2000)}")
      // and the shuffle-free join returns exactly the plain join's rows
      val viaBuckets = joined.count()
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(viaBuckets == plain && plain > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
