package graft

import graft.functions.SimHashSig
import graft.text.TextOps
import org.apache.spark.sql.functions._

class SimHashSigSpec extends SparkSpec {

  test("native simhash is bit-equal to the HOF formulation on every document") {
    val mismatches = Tables.documents(spark, sf)
      .select(
        SimHashSig.of(expr(TextOps.toksE)).as("native"),
        expr(TextOps.simhashHofE).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("simhash of an empty token array is 0 (all counters negative or zero)") {
    import spark.implicits._
    val out = Seq(Array.empty[String]).toDF("toks")
      .select(SimHashSig.of(col("toks")).as("s")).head.getLong(0)
    assert(out == 0L)
  }
}
