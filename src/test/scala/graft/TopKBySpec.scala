package graft

import graft.functions.TopKBy
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKBySpec extends SparkSpec {
  import spark.implicits._

  test("topk_by equals the row_number window formulation, including ties") {
    val data = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 7.0), (1L, 13L, 1.0),
      (2L, 20L, 3.0), (2L, 21L, 3.0), (2L, 22L, 3.0))
      .toDF("g", "id", "score")
      .repartition(4) // force partial buffers + a merge across partitions
    val viaAgg = data.groupBy("g")
      .agg(TopKBy.of(col("score"), col("id"), 2).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("g"), col("p.tag").as("id"), col("p.v").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
    val viaWindow = data
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(desc("score"), asc("id"))))
      .filter(col("rank") <= 2)
      .select("g", "id", "score", "rank")
    assert(viaAgg.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaAgg).count() == 0)
  }

  test("topk_by with fewer rows than k returns all of them, best first") {
    val out = Seq((1L, 5L, 2.0), (1L, 6L, 9.0)).toDF("g", "id", "score")
      .groupBy("g").agg(TopKBy.of(col("score"), col("id"), 10).as("top"))
      .select(explode(col("top")).as("p"))
      .select(col("p.tag"), col("p.v")).as[(Long, Double)].collect()
    assert(out.toSeq == Seq((6L, 9.0), (5L, 2.0)))
  }

  test("topk_by survives many partitions and large groups") {
    val n = 10000
    val df = spark.range(n).select(
      (col("id") % 7).as("g"), col("id").as("tag"),
      (col("id") % 1000).cast("double").as("v"))
      .repartition(32)
    val viaAgg = df.groupBy("g")
      .agg(TopKBy.of(col("v"), col("tag"), 5).as("top"))
      .select(col("g"), explode(col("top")).as("p"))
      .select(col("g"), col("p.tag").as("tag"), col("p.v").as("v"))
    val viaWindow = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(desc("v"), asc("tag"))))
      .filter(col("rn") <= 5).select("g", "tag", "v")
    assert(viaAgg.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaAgg).count() == 0)
  }

  test("topk_by is registered as a SQL function") {
    graft.functions.GraftExtensions.register(spark)
    spark.range(100).select((col("id") % 3).as("g"), col("id").as("t"),
      col("id").cast("double").as("v"))
      .createOrReplaceTempView("topk_sql_test")
    val rows = spark.sql(
      "SELECT g, topk_by(v, t, 3) AS top FROM topk_sql_test GROUP BY g")
      .select(col("g"), explode(col("top"))).count()
    assert(rows == 9)
  }
}
