package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

class DedupCanonicalSpec extends SparkSpec {
  import spark.implicits._

  // the canonical digest references nfc_normalize by SQL name; the
  // bare test session has no extensions installed
  graft.functions.GraftExtensions.register(spark)

  test("composed and decomposed Unicode accents canonicalize identically") {
    val composed = "Café au lait"          // é as U+00E9
    val decomposed = "Café au lait"       // e + combining acute
    val out = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
      .select(expr(TextOps.canonicalMd5E).as("h")).distinct().count()
    assert(out == 1, "NFC forms must share one canonical digest")
  }

  test("case / punctuation / whitespace variants collapse; real edits do not") {
    val variants = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "the quick  brown fox, jumps over the lazy dog!"),
      (3L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG."),
      (4L, "  the quick brown\tfox jumps over the lazy dog  "),
      (5L, "the quick brown fox jumped over the lazy dog"), // token edit
      (6L, "an entirely different document"))
      .toDF("doc_id", "text")
    val groups = variants
      .groupBy(expr(TextOps.canonicalMd5E).as("canonical_md5"))
      .agg(collect_set("doc_id").as("ids"))
      .select("ids").as[Seq[Long]].collect().map(_.sorted.toList).toSet
    assert(groups == Set(List(1L, 2L, 3L, 4L), List(5L), List(6L)))
  }

  test("canonical groups partition the corpus and never exceed exact groups") {
    val canonical = TextOps.dedupCanonical(spark, sf)
    val exact = TextOps.dedupExact(spark, sf)
    val total = graft.Tables.documents(spark, sf).count()
    assert(canonical.agg(sum("dup_count")).head().getLong(0) == total)
    assert(canonical.count() <= exact.count())
  }
}
