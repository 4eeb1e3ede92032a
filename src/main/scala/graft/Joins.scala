package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-side sizing for SCALING dimensions (customer/part/supplier —
  * tables that grow with SF in TPC-H-shaped data, unlike nation/region/
  * payment whose cardinality is bounded by construction).
  *
  * A hard `broadcast()` hint on a scaling dim is the classic 100 TB
  * failure: it overrides the planner unconditionally, and the build
  * side that was 20k rows at sf0.1 is 200M rows at sf1000 — a driver
  * OOM the small-SF tests can never see. But simply DELETING the hint
  * does not hand the choice to the planner here, because the dims are
  * Dist-ranked frames (RDD-backed lineage after the partition-offset
  * numbering) whose logical stats are the worst-case default — the
  * static planner reads "huge" and sort-merges a 1500-row dimension
  * at every scale (measured: 3 PlanSpec broadcast assertions went SMJ
  * the moment the hints came off).
  *
  * So the gate is a measured row count, not an estimate: broadcast iff
  * the frame is at or under [[MaxBroadcastRows]]. The count is cheap
  * where it matters — parquet scans answer from footer metadata, the
  * persisted warehouse dims answer from the cache they materialize
  * anyway — and the decision tracks the DATA, so the same code
  * broadcasts at driver SFs and degrades to a shuffle join on the
  * dim-scaled ladder rungs (and on AQE profiles the runtime stats can
  * still upgrade the shuffle back to broadcast when actual sizes
  * allow).
  */
object Joins {

  /** Broadcast budget for a scaling dimension, in rows: the dims this
    * gates are narrow (≤ a dozen scalar columns), so 1M rows is a
    * ~30-80 MB broadcast — the conventional upper band. Past it the
    * shuffle join is the right plan anyway. */
  val MaxBroadcastRows = 1000000L

  /** Memoized gate decisions, keyed by (applicationId, canonicalized
    * analyzed-plan hash, budget). The measuring `count()` is an eager
    * Spark job, and before memoization it executed inside every gated
    * query invocation — i.e. in the TIMED serve path (measured: q06
    * 0.26→0.41 s, q07 0.31→0.49 s, +56% each, once the stored-dim
    * serve made the query itself cheaper than its gate). The decision
    * is a pure function of the dim's data, and within one application
    * the dims it gates are immutable vintages (stored parquet assets,
    * or deterministic builds of read-only source tables), so one count
    * per (app, plan) is sound. Keying on the canonicalized plan hash
    * means any structurally identical `dim.select(...)` re-derivation
    * hits — callers don't thread cache keys — while a different data
    * directory (different parquet relation) or a different projection
    * misses and measures fresh. Entries of stopped applications are
    * evicted on the next call (same idiom as Warehouse.cache). */
  private[graft] val decisions =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Long), Boolean]

  /** The measured-size broadcast gate (see object scaladoc). */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = MaxBroadcastRows): DataFrame = {
    val appId = df.sparkSession.sparkContext.applicationId
    decisions.keys.filter(_._1 != appId).foreach(decisions.remove)
    val key = (appId, df.queryExecution.analyzed.semanticHash(), maxRows)
    if (decisions.getOrElseUpdate(key, df.count() <= maxRows)) broadcast(df) else df
  }
}
