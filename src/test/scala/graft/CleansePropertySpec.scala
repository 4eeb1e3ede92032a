package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based tests for the cleansing expressions (SURVEY §5):
  * idempotence of the string normalizations and the line-total recompute
  * invariant, evaluated through the real Catalyst expressions (not
  * reimplementations). Uses seeded ScalaCheck generators directly (the
  * scalatest bridge isn't available offline); 100 cases per property,
  * batched through one DataFrame per property for speed. */
class CleansePropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.oneOf('a' to 'z'), Gen.oneOf('A' to 'Z'),
      Gen.oneOf('0' to '9'), Gen.const(' '), Gen.const('-'), Gen.const('#')))
      .map(_.take(50).mkString)

  private def evalBatch(inputs: Seq[String], c: org.apache.spark.sql.Column): Seq[String] = {
    import spark.implicits._
    inputs.toDF("x").select(c.as("y")).collect().map(_.getString(0)).toSeq
  }

  test("trim/lower/initcap normalization is idempotent") {
    val norm = initcap(lower(trim(col("x"))))
    val in = samples(asciiText, 100)
    val once = evalBatch(in, norm)
    val twice = evalBatch(once, norm)
    once.zip(twice).zip(in).foreach { case ((a, b), orig) =>
      assert(a == b, s"not idempotent for input '$orig': '$a' -> '$b'")
    }
  }

  test("digit-strip leaves only digits and is idempotent") {
    val strip = regexp_replace(col("x"), "[^0-9]", "")
    val in = samples(asciiText, 100)
    val once = evalBatch(in, strip)
    assert(once.forall(_.forall(_.isDigit)))
    assert(evalBatch(once, strip) == once)
  }

  test("line_total recompute equals stored net amount within tolerance") {
    import spark.implicits._
    val cases = for {
      qty <- Gen.choose(1, 50)
      price <- Gen.choose(1.0, 2000.0)
      disc <- Gen.choose(0.0, 0.5)
    } yield (qty, math.round(price * 100) / 100.0, math.round(disc * 100) / 100.0)
    val rows = samples(cases, 200)
    val df = rows.toDF("q", "p", "d").select(
      round((col("q") * col("p") * (lit(1.0) - col("d"))).cast("decimal(18,6)"), 2)
        .cast("double").as("recomputed"),
      round(((col("q") * col("p")).cast("decimal(18,6)")
        * (lit(1.0) - col("d")).cast("decimal(18,6)")), 2)
        .cast("double").as("stored"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 0.011,
        s"recompute drifted: $r")
    }
  }
}
