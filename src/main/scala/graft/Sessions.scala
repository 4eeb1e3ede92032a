package graft

import org.apache.spark.sql.SparkSession

/** Session factories encoding the two deployment profiles this library
  * is tuned for. The settings differ because the bottlenecks differ:
  * locally, task-scheduling overhead dominates tiny shuffles; on a
  * cluster, data volume dominates and the adaptive machinery earns its
  * overhead. Bench.scala documents the local measurements behind the
  * small-scale numbers.
  */
object Sessions {

  /** Local development/bench profile (single JVM, data ≤ a few GB):
    * shuffle partitions sized to data not cores, AQE off (its stage
    * re-materializations cost more than they save at this scale),
    * shuffle compression off (pure CPU overhead on in-memory blocks).
    *
    * `adaptive = true` is the SCALE-LADDER profile: one configuration
    * honest at every rung. A fixed partition count cannot be — 8 is
    * right at 1× and starves 300×, 32 is right at 300× and pays ~3.3 s
    * of task-scheduling overhead at 1× (measured, round 10) — so the
    * ladder lets AQE coalesce from a high initial count down to
    * whatever the RUNTIME shuffle bytes justify (`parallelismFirst`
    * off, or the coalescer would pin partitions ≈ cores and reproduce
    * exactly the small-rung overhead this profile removes; 16 MB
    * advisory size keeps a few partitions alive on compute-heavy
    * medium shuffles). Skew-join splitting rides along — the same
    * machinery a real cluster run enables ([[clusterDefaults]]).
    *
    * Under `adaptive = true` the `shufflePartitions` argument is the
    * FLOOR of the initial (pre-coalesce) partition count — AQE needs
    * headroom to coalesce DOWN from, so a small static value is raised
    * to 256, while a caller sizing for a bigger box can pass more and
    * be honored (previously the argument was silently ignored). */
  def local(cores: Int = 4, shufflePartitions: Int = 8,
            adaptive: Boolean = false): SparkSession = {
    val initialPartitions = math.max(shufflePartitions, 256)
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts nanos vintage reads as long (Tables.normalizeTs);
      // set at construction so concurrent callers never mutate runtime
      // conf (Tables.events still sets it defensively for foreign
      // sessions — constant value, so the write is race-free)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val tuned =
      if (adaptive) b
        .config("spark.sql.shuffle.partitions", initialPartitions.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initialPartitions.toString)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
      else b
        .config("spark.sql.shuffle.partitions", shufflePartitions)
        .config("spark.sql.adaptive.enabled", "false")
    val s = tuned
      .withExtensions(new functions.GraftExtensions)
      .getOrCreate()
    muteBoundedWindowWarning()
    s
  }

  /** Every unpartitioned window a registered query plans runs over a
    * provably BOUNDED frame — a top-k result after a limit
    * (`analytics/Stats.scala:47`: 5 rows), distinct-value slabs of a
    * fixed domain (`Stats.scala:268`: ≤101 discount / ~50 quantity
    * values), a ≤30-row daily roster (`monitor/Monitor.scala:113`),
    * letter-pair and vocab-bounded BPE ranks (`text/TextOps.scala:1117,
    * 1445`) — anything corpus-sized goes through [[Dist]]'s
    * range-partitioned cumsums instead. WindowExec cannot see that
    * invariant, so its per-instance "No Partition Defined" WARN is pure
    * noise here, and dozens of them flooded the r15 bench tail, burying
    * real plan warnings. Pin that ONE logger package to ERROR.
    *
    * `sparkContext.setLogLevel` goes through log4j2's `setAllLevels`,
    * which rewrites EVERY existing logger config — including this one —
    * so mains that lower their log level (Bench/Verify/Prebuild) must
    * re-apply the mute AFTER that call; the registration here covers
    * sessions that never touch the log level. */
  private[graft] def muteBoundedWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)

  /** Cluster profile (the 100 TB posture — values are the starting
    * point a deployment tunes from, applied via builder so a spark-submit
    * can still override):
    *  - AQE ON with skew-join splitting and partition coalescing: at
    *    real volume, runtime stats beat static planning (skewed keys
    *    get split without manual salting; small shuffles coalesce).
    *  - shuffle.partitions high (AQE coalesces down): target ~64-128 MB
    *    per post-AQE partition.
    *  - broadcast threshold raised to 64 MB: every dimension in this
    *    schema fits and must never sort-merge.
    *  - compression back ON (network/disk bound, not CPU bound).
    *  - UTC timezone is load-bearing for the date logic; the
    *    GraftExtensions registration makes minhash_sig/qdot/topk_by
    *    available to plain SQL users.
    */
  def clusterDefaults(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
      .config("spark.sql.shuffle.partitions", "2000")
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new functions.GraftExtensions)
}
