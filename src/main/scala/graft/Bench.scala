package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the 10 headline analytics queries (the set
  * BASELINE.md measures) at SPARK_GRAFT_SF_DIR and prints one JSON line.
  * A single warm-up run of q01 first amortizes JVM/codegen startup, like
  * the baseline's warm local DB.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_top_products", "q02_monthly_trend", "q03_customer_segments",
    "q04_category_performance", "q05_payment_distribution", "q06_geo_revenue",
    "q07_customer_ltv", "q08_product_profitability", "q09_dow_pattern",
    "q10_discount_impact")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle sizing is per-DATA, not per-core: at bench scale (~600k
    // fact rows, ~15 MB cached) 8 partitions keeps ~75k rows/partition;
    // 32 just multiplies task-scheduling overhead (measured 0.71s→0.34s
    // per shuffle query). AQE off for the same reason — its extra stage
    // materializations cost ~0.2s/query here. A cluster run at real
    // scale flips both: partitions sized to ~64-128 MB of shuffle data,
    // AQE on for skew splits and runtime coalescing.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    // the shared local profile (Sessions.local) — one place for the
    // AQE-off/compression-off/locality-wait tuning story.
    // SPARK_GRAFT_AQE=1 switches to the ladder profile (AQE coalescing
    // from a high initial partition count — ONE config honest at every
    // rung, replacing the per-rung SPARK_GRAFT_SHUFFLE guesswork).
    val spark = Sessions.local(cores = cpus.toInt,
      shufflePartitions = shufflePartitions.toInt,
      adaptive = sys.env.get("SPARK_GRAFT_AQE").contains("1"))
    spark.sparkContext.setLogLevel("WARN")
    Sessions.muteBoundedWindowWarning() // setLogLevel rewrites all logger configs

    val qs = headline.filter(SparkEntry.queries.contains)
    // Warm-up: materialize the star schema once (the reference times its
    // queries against a pre-loaded warehouse, generate_analytics.py:20-24)
    // and run each query once so JIT/codegen is steady-state — the
    // baseline's numbers are from a warm local DB (BASELINE.md).
    try {
      warehouse.Warehouse.fact(spark, sfDir).count()
      warehouse.Warehouse.dimDate(spark, sfDir).count()
      warehouse.Warehouse.dimCustomer(spark, sfDir).count()
      warehouse.Warehouse.dimPayment(spark, sfDir).count()
      // 4 passes: C2 JIT of the generated code needs several executions
      // to reach steady state (measured: pass 1 ≈ 2-3× pass 5). Per-query
      // try: one failing query must not leave the REST of the warm-up
      // unrun (they'd be measured cold and read as regressions).
      (1 to 4).foreach(_ =>
        qs.foreach(q =>
          try SparkEntry.queries(q)(spark, sfDir).collect()
          catch {
            // warm-up only: the failure will surface as -1 in the timed
            // pass below, but log it so warm-up problems are visible
            case e: Throwable =>
              System.err.println(s"[bench] warm-up $q failed: ${e.getClass.getName}: ${e.getMessage}")
          }))
      System.gc() // drain warm-up garbage so GC pauses don't land in the timed pass
    } catch {
      case e: Throwable => // fact/dim materialization above
        System.err.println(s"[bench] warm-up failed: ${e.getClass.getName}: ${e.getMessage}")
    }

    // Timed pass: MEDIAN of 5 consecutive runs per query with the
    // relative spread (max-min)/median alongside — the BenchExt
    // methodology, adopted for the headline artifact too: best-of-3
    // systematically flatters and was measured drifting 2-4× against
    // the committed median artifacts, making round-over-round per-query
    // deltas unreadable. A failing query must not record a near-zero
    // time and silently improve the total: emit -1 for it, count it,
    // and exit nonzero.
    // Output row count rides along (free — the timed pass collects
    // anyway): at scale the interesting failures are output-cardinality
    // cliffs, not slow scans — e.g. a capped bucket join silently
    // truncating to 0 rows at an occupancy the cap can't hold reads as a
    // 14× "speed-up" unless the artifact shows the rows went to zero.
    def timed(name: String): (String, Double, Double, Long) =
      try {
        // drain the PREVIOUS op's garbage before timing this one: a
        // pair-listing op that collects millions of rows (9.9M for
        // ann_lsh_dedup_pairs at the 100x rung) leaves the old gen full,
        // and without this the NEXT three ops in sequence measured 3-5x
        // their fresh-JVM cost — a sick-JVM artifact misattributed to
        // the ops (text_stats read as 10x superlinear; it is exactly
        // linear). The pause lands outside the timed window.
        System.gc()
        var rows = 0L
        val runs = (1 to TimedRuns).map { _ =>
          val t0 = System.nanoTime()
          rows = SparkEntry.queries(name)(spark, sfDir).collect().length.toLong
          (System.nanoTime() - t0) / 1e9
        }
        val med = median(runs)
        (name, med, (runs.max - runs.min) / med, rows)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          (name, -1.0, 0.0, -1L)
      }
    val results = qs.map(timed)
    // Extension-operator pass (dedup/ANN/text/curation/temporal): folded
    // into the same artifact so a regression in the native expressions
    // (WordShingles/MinHashSig/SimHashSig/SrpSig/QDot/TopKBy) is caught
    // round-over-round, not only in the dev-tool BenchExt run. "value"
    // stays the headline total — the BASELINE.md-comparable number.
    // SPARK_GRAFT_BENCH_SKIP: comma-separated ext ops to leave out of a
    // run (a scale-ladder knob — e.g. the pair-LISTING dedup ops whose
    // output is intrinsically quadratic in clone multiplicity and whose
    // collect() dominates a 300× rung). Never set by the driver; skips
    // are visible because the op's key is absent from the artifact.
    val skip = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    // SPARK_GRAFT_BENCH_SKIP_CLASS: roster CLASSES to leave out (see
    // SparkEntry.rosterClass) — the ladder sets `listing` at the 300×
    // rung, so the skip list is derived from the in-code tags instead
    // of a hand-maintained op list (the round-12 failure mode).
    val skipClasses = sys.env.get("SPARK_GRAFT_BENCH_SKIP_CLASS")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val rosterClass = SparkEntry.rosterClass
    val extQs = BenchExt.ops.filter(SparkEntry.queries.contains)
      .filterNot(skip)
      .filterNot(q => skipClasses.contains(rosterClass(q)))
    (1 to 2).foreach(_ =>
      extQs.foreach(q =>
        try SparkEntry.queries(q)(spark, sfDir).collect()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ext warm-up $q failed: ${e.getClass.getName}: ${e.getMessage}")
        }))
    System.gc()
    val extResults = extQs.map(timed)

    val failures = results.count(_._2 < 0) + extResults.count(_._2 < 0)
    def js(rs: Seq[(String, Double, Double, Long)]): String =
      rs.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.4f" }.mkString("{", ",", "}")
    def sjs(rs: Seq[(String, Double, Double, Long)]): String =
      rs.map { case (k, _, s, _) => "\"" + k + "\":" + f"$s%.3f" }.mkString("{", ",", "}")
    def rjs(rs: Seq[(String, Double, Double, Long)]): String =
      rs.map { case (k, _, _, r) => "\"" + k + "\":" + r }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val extTotal = extResults.map(_._2).filter(_ >= 0).sum
    // Two artifacts from one measurement (round-9 driver artifact had
    // parsed:null — the full line with ~40 ext ops × 4 maps outgrew the
    // captured stdout tail window):
    //  - STDOUT gets ONE compact, always-parseable line: headline
    //    queries + totals + failure count (the BASELINE.md-comparable
    //    numbers), with a pointer to the detail file.
    //  - The FULL detail (ext per-op medians, spreads, row counts)
    //    goes to docs/BENCH_LAST.json (override: SPARK_GRAFT_BENCH_OUT),
    //    written BEFORE the stdout line so a tail capture can never
    //    race the file.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "docs/BENCH_LAST.json")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$TimedRuns,"stat":"median",""" +
      s""""queries":${js(results)},"spread":${sjs(results)},""" +
      s""""ext_total":$extTotal,"ext_queries":${js(extResults)},"ext_spread":${sjs(extResults)},""" +
      s""""ext_rows":${rjs(extResults)},""" +
      s""""failures":$failures,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $detailPath: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$TimedRuns,"stat":"median",""" +
      s""""queries":${js(results)},"ext_total":$extTotal,""" +
      s""""failures":$failures,"sf":"$sfDir","detail":"$detailPath"}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }

  private val TimedRuns = 5

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
}
