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

  test("MinHashSig handles empty shingle arrays") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("a b c")).toDF("sh")
      .select(MinHashSig.signatureOf("sh").as("m"))
    val rows = df.collect()
    assert(rows.length == 2)
    // empty input -> Long.MaxValue sentinel mins, 16 perms
    assert(rows.forall(_.getSeq[Long](0).length == 16))
  }
}
