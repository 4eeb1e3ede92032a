package graft

import graft.functions.TextStatsSig
import graft.text.TextOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Bit-equality of the native single-pass [[TextStatsSig]] against the
  * HOF formulation it replaced ([[TextOps.textStatsHof]]), plus edge
  * cases covering the exact `split(trim(text), '\s+')` limit=-1
  * semantics the native scan re-implements. */
class TextStatsSpec extends SparkSpec {

  test("native textStats is bit-equal to the HOF formulation on every document") {
    val native = TextOps.textStats(spark, sf)
    val hof = TextOps.textStatsHof(spark, sf)
    assert(native.schema.map(f => (f.name, f.dataType)) ==
      hof.schema.map(f => (f.name, f.dataType)))
    assert(native.count() == hof.count())
    // except() compares doubles bitwise — exactly the strictness we want
    assert(native.exceptAll(hof).count() == 0)
    assert(hof.exceptAll(native).count() == 0)
  }

  test("tokenization edge cases match split(trim(text), '\\s+') exactly") {
    import spark.implicits._
    val cases = Seq(
      "",                 // one empty token
      " ",                // trim -> "" -> one empty token
      "\t",               // leading sep run -> ["", ""]
      "a",
      "a b\tc",
      "\tleading",        // -> ["", "leading"]
      "trailing\n",       // limit -1 keeps the trailing empty token
      "  padded  ",       // trim strips spaces only
      "the a of and to in is it",   // all stopwords
      "The THE thE",      // case-sensitive: none are stopwords
      "café über",  // multi-byte: lengths in code points
      "a b")         // NBSP is NOT Java-regex \s -> one 3-cp token
    val df = cases.toDF("text")
    val expected = df.select(
      col("text"),
      expr(s"size(${TextOps.toksE})").cast("long").as("n_tokens"),
      expr(s"aggregate(transform(${TextOps.toksE}, t -> length(t)), 0, (a, x) -> a + x)")
        .cast("long").as("sum_token_len"),
      expr(s"size(filter(${TextOps.toksE}, t -> t IN ('the','a','of','and','to','in','is','it')))")
        .cast("long").as("stopword_count"))
    val actual = df.select(col("text"), TextStatsSig.of(col("text")).as("s"))
      .select(col("text"), col("s.n_tokens"), col("s.sum_token_len"),
        col("s.stopword_count"))
    val exp = expected.collect().map(r => r.getString(0) -> r).toMap
    actual.collect().foreach { r =>
      val e = exp(r.getString(0))
      assert(r == Row(e.getString(0), e.getLong(1), e.getLong(2), e.getLong(3)),
        s"mismatch for ${r.getString(0).map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("text_stats_sig is callable from SQL via the extension registry") {
    graft.functions.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT text_stats_sig('the quick fox') AS s").select("s.*").head()
    assert(row == Row(3L, 11L, 1L))
  }
}
