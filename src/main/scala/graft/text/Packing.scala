package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — the batch-preparation step of a pre-training
  * pipeline: documents are concatenated in a canonical order (doc_id)
  * into one token stream and cut into fixed-length training sequences.
  * Each document gets its global start position, its sequence id, and
  * its offset within that sequence; a document whose tokens straddle a
  * boundary simply spans two sequences (token-level packing).
  *
  * The global EXCLUSIVE cumulative sum is the interesting part at
  * scale: a `SUM(...) OVER (ORDER BY ...)` window would single-thread
  * 100 TB through one partition. Instead: range-partition on doc_id,
  * sort within partitions, and run two passes over ONE materialized
  * lineage — per-partition totals (a job whose result is bounded by
  * the partition count) feed per-partition starting offsets, then a
  * partition-local running sum adds them. Sharing one RDD instance is
  * load-bearing: range boundaries are sampled per instance, so two
  * separate DataFrame actions could see different partitionings (same
  * rule as [[graft.warehouse.Warehouse]]'s key numbering).
  */
object Packing {
  type Q = (SparkSession, String) => DataFrame

  /** Tokens per training sequence. */
  val SeqLen = 2048L

  /** Exclusive cumulative sum of `valueCol` (Long) in `key` order,
    * appended as `out` — [[graft.Dist.exclusiveCumsum]] (shared with the
    * warehouse's surrogate-key numbering). */
  private[graft] def exclusiveCumsum(df: DataFrame, key: String,
                                     valueCol: String, out: String): DataFrame =
    graft.Dist.exclusiveCumsum(df, key, valueCol, out)

  /** (doc_id, est_bpe_tokens, start_token, seq_id, seq_offset) for the
    * whole corpus packed at [[SeqLen]]. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(
      col("doc_id"),
      TextOps.estBpeTokens.as("est_bpe_tokens"))
    exclusiveCumsum(d, "doc_id", "est_bpe_tokens", "start_token")
      .select(
        col("doc_id"), col("est_bpe_tokens"), col("start_token"),
        expr(s"start_token div $SeqLen").as("seq_id"),
        expr(s"start_token % $SeqLen").as("seq_offset"))
  }

  val packSequencesSql: String = s"""
WITH d AS (SELECT doc_id,
                  ${TextOps.estBpeTokensSqlE} AS est_bpe_tokens
           FROM documents),
c AS (SELECT doc_id, est_bpe_tokens,
             CAST(COALESCE(SUM(est_bpe_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
      FROM d)
SELECT doc_id, est_bpe_tokens, start_token,
       start_token // $SeqLen AS seq_id,
       start_token % $SeqLen AS seq_offset
FROM c"""

  val inventory: Map[String, Q] = Map(
    "pack_sequences" -> (packSequences _))

  val oracle: Map[String, String] = Map(
    "pack_sequences" -> packSequencesSql)
}
