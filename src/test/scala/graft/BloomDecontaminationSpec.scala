package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The Bloom decontamination op publishes its no-false-negative
  * guarantee through the oracle; what the oracle CANNOT see — the
  * false-positive rate the sketch trades for its 8-bits-per-member size,
  * and agreement of the flagged set with the exact operator — is bounded
  * here. */
class BloomDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("flagged set equals the exact decontamination key set, contract all-true") {
    val out = TextOps.bloomDecontamination(spark, sf).collect()
    val exact = TextOps.decontamination(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(out.map(_.getLong(0)).toSet == exact)
    assert(out.forall(_.getBoolean(2)), "bloom produced a false negative")
  }

  test("bloom probe rejects most non-members at the built size") {
    val b = org.apache.spark.sql.GraftColumnBridge
    val vocab = spark.range(1000).select(concat(lit("member"), col("id")).as("s"))
    val bytes = vocab
      .agg(b.toColumn(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          b.toExpression(xxhash64(col("s"))), 1000L).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mc = b.toColumn(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        b.toExpression(lit(bytes)), b.toExpression(xxhash64(col("s")))))
    // every member hits (no false negatives by construction)
    val memberHits = vocab.agg(sum(when(mc, 1L).otherwise(0L))).head().getLong(0)
    assert(memberHits == 1000L)
    // non-members: false-positive rate well under 10% at 8 bits/member
    val probes = spark.range(20000).select(concat(lit("other"), col("id")).as("s"))
    val fp = probes.agg(sum(when(mc, 1L).otherwise(0L))).head().getLong(0)
    assert(fp < 2000L, s"false-positive rate too high: $fp / 20000")
  }
}
