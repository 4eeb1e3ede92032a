package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing demo: pre-bucketing both join sides on the join key makes
  * the join shuffle-free — the co-located-join strategy SURVEY §2.3
  * prescribes for the lineitem⋈orders fact build at warehouse scale.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_bucket").toString
    val db = "graft_bucket_db"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")
    try {
      Tables.orders(spark, sf)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
      Tables.lineitem(spark, sf)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.substring(plan.indexOf("Join"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(3000)}")

      // and it computes the same result as the unbucketed join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.except(expected).count() == 0)
      assert(expected.except(joined).count() == 0)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
