package graft

import graft.quality.Pii
import graft.text.Curation
import org.apache.spark.sql.functions._

/** PII scrubbing invariants and exact-stratified-sampling semantics. */
class PiiSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("scrubbed customers carry no digits and no raw keys") {
    val out = Pii.scrubCustomers(spark, sf).cache()
    try {
      assert(out.count() == Tables.customer(spark, sf).count())
      // masked name has every digit replaced
      assert(out.filter(col("name_masked").rlike("[0-9]")).count() == 0)
      // pseudonyms are unique per customer and never embed the key
      assert(out.select("pseudonym").distinct().count() == out.count())
      assert(out.filter(col("pseudonym").rlike("^cust_[0-9a-f]{16}$"))
        .count() == out.count())
      // balance bands are multiples of 1000
      assert(out.filter(col("acctbal_band") % 1000 =!= 0).count() == 0)
    } finally out.unpersist()
  }

  test("pseudonym join reproduces the raw-key join exactly") {
    val viaPseudonym = Pii.referentialRollup(spark, sf)
      .select("mktsegment", "n_customers", "n_orders")
    val raw = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(countDistinct("c_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"))
    assert(viaPseudonym.exceptAll(raw).count() == 0)
    assert(raw.exceptAll(viaPseudonym).count() == 0)
  }

  test("stratified sample: exact per-stratum size, hash-pinned membership") {
    val docs = (0L until 400L)
      .map(i => (i, if (i % 4 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val out = Curation.stratifiedSampleOver(docs).collect()
    val byLang = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // weight-1 cut ⇒ n_sampled == (n_g*10) div 100 EXACTLY, per stratum
    assert(byLang("de")._1 == 100L && byLang("de")._2 == 10L && byLang("de")._3 == 10L)
    assert(byLang("en")._1 == 300L && byLang("en")._2 == 30L && byLang("en")._3 == 30L)
    // membership is a pure function of doc_id: invariant under physical layout
    val again = Curation.stratifiedSampleOver(docs.repartition(7)).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
