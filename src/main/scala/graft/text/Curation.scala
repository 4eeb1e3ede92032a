package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The operators composed into an actual corpus-curation pass — what a
  * training-data pipeline runs end-to-end: exact-dedup to a canonical
  * representative, a quality gate over the text statistics, the
  * deterministic stratified sampler, then per-language corpus accounting.
  * One registered query proves the pieces COMPOSE (same semantics in the
  * DuckDB oracle, which nests the individual queries' SQL as CTEs).
  *
  * Determinism note: per-language mean quality is reported as an exact
  * integer sum of 1e-6-quantized scores (`qsum_micros`) rather than a
  * floating AVG — distributed double summation is partition-order
  * dependent, the quantized BIGINT sum is not ([[graft.Det]] rules).
  *
  * Scale posture: dedup is one hash-groupBy; the gates are semi-joins on
  * doc_id (broadcastable once filtered); stats are a narrow no-shuffle
  * projection — the whole pass is two shuffles (dedup + final groupBy)
  * regardless of corpus size.
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  def corpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // exact-dedup representatives: min doc_id per content hash
    val reps = d.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val stats = TextOps.textStats(spark, dir)
      .select(col("doc_id"), col("est_bpe_tokens"), col("quality_score"))
    val sampled = DedupClusters.stratifiedSample(spark, dir).select("doc_id")
    d.select("doc_id", "lang")
      .join(reps, "doc_id")
      .join(sampled, "doc_id")
      .join(stats, "doc_id")
      .filter(col("quality_score") >= 60.0)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("est_bpe_tokens").as("total_bpe_tokens"),
        min("quality_score").as("min_quality"),
        max("quality_score").as("max_quality"),
        sum(floor(col("quality_score") * lit(1e6)).cast(LongType)).as("qsum_micros"))
      .orderBy("lang")
  }

  /** The oracle nests the already-verified stats and sampler SQL as CTEs
    * — verifying the composition, not re-deriving the pieces. */
  val corpusCurationSql: String = s"""
WITH reps AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
stats AS (${TextOps.textStatsSql}),
sampled AS (${DedupClusters.stratifiedSampleSql})
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(s.est_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       MIN(s.quality_score) AS min_quality,
       MAX(s.quality_score) AS max_quality,
       CAST(SUM(CAST(floor(s.quality_score * 1e6) AS BIGINT)) AS BIGINT) AS qsum_micros
FROM documents d
JOIN reps r ON d.doc_id = r.doc_id
JOIN sampled sm ON d.doc_id = sm.doc_id
JOIN stats s ON d.doc_id = s.doc_id
WHERE s.quality_score >= 60.0
GROUP BY d.lang
ORDER BY d.lang"""

  val inventory: Map[String, Q] = Map(
    "corpus_curation" -> (corpusCuration _))

  val oracle: Map[String, String] = Map(
    "corpus_curation" -> corpusCurationSql)
}
