package graft

/** Extension-operator benchmark (dev tool; the driver's bench contract
  * is [[Bench]]): steady-state timings for the training-data operators
  * — dedup, ANN, text, curation — as an SF ladder (sf0.01 and sf0.1 by
  * default; override with SPARK_GRAFT_SF_DIR for a single rung).
  *
  * Methodology: 2 warm passes, then 5 timed runs per op; we report the
  * MEDIAN (robust to one GC/JIT outlier, unlike best-of-3 which
  * systematically flatters) plus the relative spread (max-min)/median —
  * two consecutive ladder runs should agree per-op within ~20%, and the
  * spread column makes a noisy box visible in the artifact itself.
  * Output: one JSON line per SF rung (committed as docs/BENCH_EXT.json;
  * numbers summarized in SURVEY §8). */
object BenchExt {
  val ops: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "dedup_clusters", "ann_cosine_topk", "ann_lsh_buckets",
    "ann_lsh_near_dup_pairs_demo", "ann_lsh_dedup_pairs", "ann_dedup_reps",
    "ivf_search",
    "text_stats", "corpus_curation", "quantiles_line_total",
    "asof_click_attribution", "range_join_click_purchase",
    "doc_fingerprint_winnow", "winnow_overlap_pairs",
    "dedup_canonical", "heavy_hitter_ngrams", "bloom_decontamination",
    "chunk_documents", "events_type_transitions", "cdc_orders_diff",
    "ivm_daily_sales", "bm25_search", "rfm_segments", "basket_pairs",
    "events_active_users", "embedding_drift",
    "pq_search", "pq_search_rerank", "ivfpq_search", "fuzzy_name_pairs",
    "token_budget_exact", "pagerank_nation_trade", "scd2_pit_orders",
    "monitor_seasonal_anomaly",
    // round-10 additions (joined the roster AFTER the round-10 ladder
    // completed — the op list stays frozen across a ladder)
    "ivf_delta_assign", "hybrid_rrf_search",
    "stratified_sample_exact", "pii_referential_rollup",
    // round-11 additions: the output-bounded dedup-family rollups (the
    // rows a 300× rung runs where the pair LISTING's collect can't)
    "ann_dedup_pair_stats", "ann_dedup_cluster_hist",
    "multimodal_phash_pairs",
    // joined AFTER the round-11 ladder froze (first measured by the
    // round-13 ladder)
    "dedup_containment_pairs", "semantic_dedup_reps",
    // round-12 addition: the DOULION-sampled census — the scale-path
    // twin of the exact census (which moved to the eval class in round
    // 13, alongside semantic_dedup_capture_t45: the Θ(n²) capture eval
    // stalled round 12's 300× rung for ~6 h — see SparkEntry.evalOnly,
    // the mechanized policy that keeps eval rows off every rung)
    "triangle_doulion_copurchase",
    // round-13 additions (joined AFTER the round-13 ladder's classpath
    // snapshot froze — first measured by the next ladder): the
    // cross-encoder-slot rerank over the fused shortlist and the batch
    // twin of the streaming perceptual-hash ingest dedup
    "hybrid_rerank_search", "dedup_stream_phash", "bpe_merge_pairs",
    // the full tokenizer-training loop (8 argmax+re-segment iterations
    // over the cached vocabulary) and the trained-tokenizer corpus
    // histogram — corpus touched once each, iterations vocab-bounded
    "bpe_train_merges", "bpe_token_histogram",
    // exact per-source token accounting under the trained tokenizer,
    // next to the ceil(chars/4) estimate the pipeline budgets with
    "bpe_source_token_accounting",
    // contrastive training-pair mining: positives + ANN-assisted hard
    // negatives from the anchor's own IVF cell (serve-path join
    // against the stored inverted lists; anchors a bounded batch)
    "contrastive_triples",
    // padded-batch geometry accounting: length-sorted batching within
    // (bucket, md5-shard) — windows bounded by a shard's bucket slice
    "length_bucket_batches",
    // diversity-preserving downsample: deterministic per-IVF-cell cap
    // over the stored inverted lists (output bounded by cells x cap)
    "cluster_balanced_sample",
    // which-feeds-copy-each-other: sources^2-bounded rollup of the
    // LSH near-dup pairs (df-capped pair set, co-partitioned lookups)
    "dedup_source_matrix",
    // packing under the TRAINED tokenizer's exact counts (the end of
    // the tokenizer story: mine -> train -> account -> pack)
    "pack_sequences_bpe",
    // tokenizer-training stability: the same 8 merges trained on each
    // doc_id-parity half, lined up by rank (two vocab-bounded loops)
    "bpe_merge_drift")

  private val WarmPasses = 2
  private val TimedRuns = 5

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDirs = sys.env.get("SPARK_GRAFT_SF_DIR") match {
      case Some(d) => Seq(d)
      case None => Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    }
    val spark = Sessions.local(cores = 32, shufflePartitions = 8)
    spark.sparkContext.setLogLevel("WARN")
    Sessions.muteBoundedWindowWarning() // setLogLevel rewrites all logger configs

    val (qs, missing) = ops.partition(SparkEntry.queries.contains)
    if (missing.nonEmpty) {
      // a renamed/unregistered op must not silently shrink the benchmark
      System.err.println(s"[benchext] ops missing from SparkEntry.queries: ${missing.mkString(", ")}")
      spark.stop()
      sys.exit(1)
    }

    var anyFailure = false
    sfDirs.foreach { sfDir =>
      try {
        (1 to WarmPasses).foreach(_ =>
          qs.foreach(q => SparkEntry.queries(q)(spark, sfDir).collect()))
        System.gc()
      } catch {
        case e: Throwable =>
          System.err.println(s"[benchext] warm-up failed at $sfDir: ${e.getMessage}")
      }
      val results = qs.map { name =>
        try {
          // per-op gc, outside the timed window: without it a
          // multi-million-row pair-listing collect leaves the old gen
          // full and the NEXT ops measure their neighbor's GC debt
          // (same rationale as Bench.timed)
          System.gc()
          val runs = (1 to TimedRuns).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sfDir).collect()
            (System.nanoTime() - t0) / 1e9
          }
          val med = median(runs)
          (name, med, (runs.max - runs.min) / med)
        } catch {
          case e: Throwable =>
            System.err.println(s"[benchext] $name FAILED at $sfDir: ${e.getMessage}")
            (name, -1.0, 0.0)
        }
      }
      val failures = results.count(_._2 < 0)
      if (failures > 0) anyFailure = true
      val qjson = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
      val sjson = results.map { case (k, _, s) => "\"" + k + "\":" + f"$s%.3f" }
        .mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      println(s"""{"metric":"ext_total","value":$total,"unit":"sec","runs":$TimedRuns,"stat":"median","queries":$qjson,"spread":$sjson,"failures":$failures,"sf":"$sfDir"}""")
    }
    spark.stop()
    if (anyFailure) sys.exit(1)
  }
}
