package graft

import graft.functions.MinHashSig
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The native expression must stay bit-identical to the executable
  * higher-order-function spec (TextOps.minhashE) — which is what the
  * DuckDB oracle mirrors. */
class MinHashSigSpec extends SparkSpec {

  test("MinHashSig equals the higher-order-function formulation") {
    val docs = Tables.documents(spark, sf)
      .filter(expr(s"size(${TextOps.toksE}) >= 3"))
    val hof = docs.select(col("doc_id"), expr(TextOps.minhashE).as("m"))
    val fast = docs.select(col("doc_id"), expr(TextOps.shinglesE).as("sh"))
      .select(col("doc_id"), MinHashSig.signatureOf("sh").as("m"))
    assert(hof.except(fast).count() == 0)
    assert(fast.except(hof).count() == 0)
  }

  test("MinHashSig fails loudly on empty shingle arrays") {
    import spark.implicits._
    // The HOF twin yields NULL minima (array_min over empty) for empty
    // input; a sentinel signature would silently diverge from the oracle
    // form, so the contract is: callers pre-filter short docs (the
    // registered query requires size(toks) >= 3) and empty input throws.
    val df = Seq(Seq.empty[String]).toDF("sh")
      .select(MinHashSig.signatureOf("sh").as("m"))
    val ex = intercept[Exception](df.collect())
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: causes(e.getCause))
    assert(causes(ex).exists(c =>
      c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("non-empty shingle array")))
  }

  test("MinHashSig produces 16-permutation signatures for non-empty input") {
    import spark.implicits._
    val rows = Seq(Seq("a b c"), Seq("x", "y")).toDF("sh")
      .select(MinHashSig.signatureOf("sh").as("m")).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getSeq[Long](0).length == 16))
  }
}
