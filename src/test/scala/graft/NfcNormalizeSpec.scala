package graft

import graft.functions.NfcNormalize
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes — source-file encoding must not decide which
  // normalization form these literals are in
  private val composed = "Café"          // é as U+00E9
  private val decomposed = "Café"       // e + combining acute

  test("matches java.text.Normalizer on mixed composed/decomposed text") {
    val cases = Seq(
      composed, decomposed,
      "Ångström",                  // ring/diaeresis decomposed
      "Ångström",                    // composed
      "plain ascii stays",
      "한글") // Hangul jamo → syllables
    val out = cases.toDF("s")
      .select(col("s"), NfcNormalize.of(col("s")).as("n"))
      .as[(String, String)].collect()
    out.foreach { case (s, n) =>
      assert(n == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    assert(out(0)._2 == out(1)._2, "accent spellings must converge")
    assert(out(2)._2 == out(3)._2, "ring/diaeresis spellings must converge")
    assert(out(4)._2 == "plain ascii stays")
    assert(out(5)._2 == "한글", "jamo must compose to syllables")
  }

  test("idempotent: a second application is the identity") {
    Seq(composed, decomposed, "Ångström", "한글", "mixed Café x").foreach { s =>
      val once = NfcNormalize.compute(UTF8String.fromString(s))
      assert(NfcNormalize.compute(once) == once)
    }
  }

  test("ASCII fast path returns the input buffer unchanged") {
    val s = UTF8String.fromString("ascii only")
    assert(NfcNormalize.compute(s).eq(s))
  }

  test("null propagates; SQL name resolves") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize(CAST(NULL AS STRING)) AS a, nfc_normalize('$decomposed') AS b")
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getString(1) == composed)
  }
}
