package graft

import graft.functions.QDot
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class QDotSpec extends SparkSpec {

  test("native qdot is bit-equal to the HOF formulation on every embedding pair") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("b")))
    val mismatches = pairs.select(
        QDot.of("a", "b").as("native"),
        expr(Similarity.dotE("a", "b")).cast("long").as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("qdot self-product equals the HOF norm squared") {
    val e = Tables.embeddings(spark, sf).limit(100)
    val bad = e.select(
        sqrt(QDot.of("embedding", "embedding").cast("double")).as("native"),
        expr(Similarity.normE("embedding")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(bad == 0)
  }

  test("qdot participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
    val plan = e.select(QDot.of("embedding", "embedding").as("d"))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    // the projection evaluating qdot must sit INSIDE a codegen stage
    assert(codegenStages.exists(_.toString.contains("qdot")), plan.toString)
  }

  test("qdot is registered as a SQL function") {
    graft.functions.GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_qdot_test")
    val n = spark.sql(
      "SELECT qdot(embedding, embedding) AS d FROM emb_qdot_test WHERE qdot(embedding, embedding) > 0")
      .count()
    assert(n == 5)
  }
}
