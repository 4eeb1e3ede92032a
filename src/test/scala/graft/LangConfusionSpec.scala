package graft

import graft.text.TextOps

/** Confusion-matrix rollup consistency with the underlying lang-id frame. */
class LangConfusionSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("confusion counts partition the corpus and shares row-normalize") {
    val conf = TextOps.langConfusion(spark, sf).collect()
    assert(conf.nonEmpty)
    val total = conf.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
    conf.groupBy(_.getAs[String]("labeled_lang")).foreach { case (l, rows) =>
      val s = rows.map(_.getAs[Double]("row_share")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$l shares sum to $s")
    }
  }

  test("diagonal mass equals the lang-id agreement count") {
    val agrees = TextOps.langId(spark, sf).filter(col("agrees")).count()
    val diag = TextOps.langConfusion(spark, sf)
      .filter(col("labeled_lang") === col("predicted_lang"))
      .agg(sum("n_docs")).head().getLong(0)
    assert(diag == agrees)
  }
}
