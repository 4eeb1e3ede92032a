package graft

import graft.functions.WordShingles
import graft.text.TextOps
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {

  test("native shingles are bit-equal to the HOF formulation on every document") {
    val mismatches = Tables.documents(spark, sf)
      .select(
        TextOps.shinglesNative.as("native"),
        expr(TextOps.shinglesE).as("hof"))
      .filter(col("native") =!= col("hof")) // array equality = length + elementwise + order
      .count()
    assert(mismatches == 0)
  }

  test("shingles below the width yield an empty array, width is configurable") {
    import spark.implicits._
    val out = Seq("a b", "a b c d").toDF("text")
      .select(
        WordShingles.of(expr("split(text, ' ')")).as("tri"),
        WordShingles.of(expr("split(text, ' ')"), 2).as("bi"))
      .collect()
    assert(out(0).getSeq[String](0) == Seq())
    assert(out(0).getSeq[String](1) == Seq("a b"))
    assert(out(1).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](1) == Seq("a b", "b c", "c d"))
  }

  test("duplicate shingles keep first-occurrence order like array_distinct") {
    import spark.implicits._
    val out = Seq("x y x y x y").toDF("text")
      .select(WordShingles.of(expr("split(text, ' ')")).as("sh"))
      .head.getSeq[String](0)
    assert(out == Seq("x y x", "y x y"))
  }
}
