package graft

import graft.functions.QL2
import org.apache.spark.sql.functions._

class QL2Spec extends SparkSpec {

  private def quantized = Tables.embeddings(spark, sf).limit(50)
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1e7) as bigint))")
        .as("qe"))

  test("native ql2 is bit-equal to the HOF formulation on every pair") {
    val q = quantized
    val pairs = q.select(col("vec_id").as("ida"), col("qe").as("a"))
      .crossJoin(q.select(col("vec_id").as("idb"), col("qe").as("b")))
    val mismatches = pairs.select(
        QL2.of(col("a"), col("b")).as("native"),
        expr("""aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
               |          cast(0 as bigint), (acc, v) -> acc + v)""".stripMargin)
          .as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("ql2 self-distance is zero and symmetric on a hand pair") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 0L, 5L))).toDF("a", "b")
    val r = df.select(
      QL2.of(col("a"), col("a")).as("aa"),
      QL2.of(col("a"), col("b")).as("ab"),
      QL2.of(col("b"), col("a")).as("ba")).head()
    assert(r.getAs[Long]("aa") == 0L)
    // (1-4)² + (2-0)² + (3-5)² = 9 + 4 + 4
    assert(r.getAs[Long]("ab") == 17L)
    assert(r.getAs[Long]("ba") == 17L)
  }

  test("ql2 participates in whole-stage codegen") {
    val plan = quantized.select(QL2.of(col("qe"), col("qe")).as("d"))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.exists(_.toString.contains("ql2")), plan.toString)
  }
}
