package graft

import graft.multimodal.Multimodal
import graft.orchestrate.Orchestrator
import graft.sources.Sources
import graft.warehouse.Scd2
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("orchestrator retries with backoff then succeeds") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Int]
    val r = Orchestrator.run(
      Seq("flaky" -> (() => { calls += 1; if (calls < 3) sys.error("boom") })),
      sleeper = sleeps += _)
    assert(r.status == "success")
    assert(r.steps.head.attempts == 3)
    assert(sleeps.toSeq == Seq(1, 2))
  }

  test("orchestrator fails fast and skips downstream steps") {
    var ran = false
    val r = Orchestrator.run(
      Seq(
        "always_fails" -> (() => sys.error("nope")),
        "never_runs" -> (() => { ran = true })),
      sleeper = _ => ())
    assert(r.status == "failed" && !ran)
    assert(r.steps.map(_.status) == Seq("failed", "skipped"))
    val json = Orchestrator.toJson(r)
    assert(json.contains("\"status\":\"failed\"") && json.contains("never_runs"))
  }

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Tables.nation(spark, sf)
    Sources.writeCsv(df, s"$dir/nation_csv")
    val back = Sources.readCsv(spark, s"$dir/nation_csv", df.schema)
    assert(back.count() == df.count())
    assert(back.except(df).count() == 0)
  }

  test("jsonl round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    val df = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    Sources.writeJsonl(df, dir)
    val back = Sources.readJsonl(spark, dir, df.schema)
    assert(back.count() == df.count())
    assert(back.except(df).count() == 0)
  }

  test("orc round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/docs"
    val df = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    Sources.writeOrc(df, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    assert(back.except(df).count() == 0)
  }

  test("incremental append loads only new keys") {
    val dir = Files.createTempDirectory("graft_inc").toString + "/t"
    val all = Tables.region(spark, sf)
    val first = all.filter(col("r_regionkey") < 3)
    assert(Sources.incrementalAppend(spark, first, dir, Seq("r_regionkey")) == 3)
    // re-loading the same rows inserts nothing
    assert(Sources.incrementalAppend(spark, first, dir, Seq("r_regionkey")) == 0)
    // the rest appends
    val n = all.count() - 3
    assert(Sources.incrementalAppend(spark, all, dir, Seq("r_regionkey")) == n)
    assert(spark.read.parquet(dir).count() == all.count())
  }

  test("scd2 from history assigns version ranges via lead") {
    import spark.implicits._
    val hist = Seq(
      (1L, "gold", "2020-01-01"), (1L, "silver", "2021-06-15"),
      (2L, "bronze", "2020-03-01")).toDF("id", "tier", "changed_on")
    val dim = Scd2.fromHistory(hist, "id", "changed_on").collect()
    assert(dim.length == 3)
    val v1 = dim.find(r => r.getLong(0) == 1L && r.getString(1) == "gold").get
    assert(v1.getAs[java.sql.Date]("end_date").toString == "2021-06-15")
    assert(!v1.getAs[Boolean]("is_current"))
    val v2 = dim.find(r => r.getLong(0) == 1L && r.getString(1) == "silver").get
    assert(v2.getAs[Boolean]("is_current"))
  }

  test("scd2 applyUpdates closes changed rows and opens new versions") {
    import spark.implicits._
    val current = Seq(
      (1L, "gold", "2020-01-01", "9999-12-31", true),
      (2L, "bronze", "2020-01-01", "9999-12-31", true))
      .toDF("id", "tier", "effective_date", "end_date", "is_current")
      .withColumn("effective_date", col("effective_date").cast("date"))
      .withColumn("end_date", col("end_date").cast("date"))
    val updates = Seq((1L, "platinum"), (2L, "bronze")).toDF("id", "tier")
    val out = Scd2.applyUpdates(current, updates, "id", Seq("tier"), "2024-06-01")
    assert(out.count() == 3)
    assert(out.filter(col("id") === 1 && col("is_current")).head.getAs[String]("tier") == "platinum")
    assert(out.filter(col("id") === 1 && !col("is_current")).head
      .getAs[java.sql.Date]("end_date").toString == "2024-06-01")
    // unchanged key untouched
    assert(out.filter(col("id") === 2).count() == 1)
  }

  test("scd2 applyUpdates inserts brand-new keys as open versions") {
    import spark.implicits._
    val current = Seq(
      (1L, "gold", "2020-01-01", "9999-12-31", true))
      .toDF("id", "tier", "effective_date", "end_date", "is_current")
      .withColumn("effective_date", col("effective_date").cast("date"))
      .withColumn("end_date", col("end_date").cast("date"))
    // key 3 has never been seen before
    val updates = Seq((1L, "gold"), (3L, "silver")).toDF("id", "tier")
    val out = Scd2.applyUpdates(current, updates, "id", Seq("tier"), "2024-06-01")
    assert(out.count() == 2)
    val fresh = out.filter(col("id") === 3).head
    assert(fresh.getAs[String]("tier") == "silver")
    assert(fresh.getAs[Boolean]("is_current"))
    assert(fresh.getAs[java.sql.Date]("effective_date").toString == "2024-06-01")
    assert(fresh.getAs[java.sql.Date]("end_date").toString == "9999-12-31")
    // existing unchanged key untouched
    assert(out.filter(col("id") === 1 && col("is_current")).count() == 1)
  }

  test("scd2 applyUpdates reactivates keys whose history was fully closed") {
    import spark.implicits._
    val current = Seq(
      // key 9's only version was closed in an earlier batch
      (9L, "gold", "2020-01-01", "2023-01-01", false))
      .toDF("id", "tier", "effective_date", "end_date", "is_current")
      .withColumn("effective_date", col("effective_date").cast("date"))
      .withColumn("end_date", col("end_date").cast("date"))
    val updates = Seq((9L, "silver")).toDF("id", "tier")
    val out = Scd2.applyUpdates(current, updates, "id", Seq("tier"), "2024-06-01")
    assert(out.count() == 2)
    val reopened = out.filter(col("is_current")).head
    assert(reopened.getAs[String]("tier") == "silver")
    assert(reopened.getAs[java.sql.Date]("effective_date").toString == "2024-06-01")
    // the closed history row is untouched
    assert(out.filter(!col("is_current")).head.getAs[String]("tier") == "gold")
  }

  test("scd2 applyUpdates rejects duplicate keys in one batch") {
    import spark.implicits._
    val current = Seq((1L, "gold", "2020-01-01", "9999-12-31", true))
      .toDF("id", "tier", "effective_date", "end_date", "is_current")
      .withColumn("effective_date", col("effective_date").cast("date"))
      .withColumn("end_date", col("end_date").cast("date"))
    val updates = Seq((1L, "silver"), (1L, "bronze")).toDF("id", "tier")
    intercept[IllegalArgumentException] {
      Scd2.applyUpdates(current, updates, "id", Seq("tier"), "2024-06-01")
    }
  }

  test("multimodal decode pipeline produces sane features") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length == Tables.documents(spark, sf).count())
    assert(feats.forall(f => f.n_bytes > 0 && f.checksum > 0 &&
      f.mean_byte > 0 && f.mean_byte < 256))
  }

  test("end-to-end pipeline produces all artifacts with a success report") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val report = Pipeline.run(spark, sf, out)
    assert(report.status == "success")
    assert(report.steps.map(_.name) == Seq("stream_ingest_events",
      "cleanse_production", "quality_checks", "load_warehouse", "analytics",
      "monitoring", "curate_corpus", "retention_cleanup"))
    assert(new java.io.File(s"$out/quality/quality_report.json").exists())
    assert(spark.read.parquet(s"$out/warehouse/fact_sales").count() > 0)
    assert(new java.io.File(s"$out/analytics/q01_top_products").exists())

    // streaming stage landed every distinct event exactly once …
    val landed = spark.read.parquet(s"$out/streaming/events")
    val nDistinct = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(landed.count() == nDistinct)
    // … and an end-to-end REPLAY of the stage (same source, same sink —
    // an upstream redelivery or an orchestrator retry) appends nothing
    graft.streaming.Streams.streamToIncrementalParquet(spark, sf,
      s"$out/streaming/events").awaitTermination()
    assert(spark.read.parquet(s"$out/streaming/events").count() == nDistinct)

    // curated corpus shipped as the full hash-stable shard layout,
    // minus the benchmark slice and the passage-level decontamination
    // flags (the shared Curation.publishedCorpus definition)
    val shardDirs = new java.io.File(s"$out/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(shardDirs.length == Pipeline.CorpusShards,
      s"expected ${Pipeline.CorpusShards} shard dirs, got ${shardDirs.toSeq}")
    val corpus = spark.read.parquet(s"$out/corpus")
    val expected = graft.text.Curation.publishedCorpus(spark, sf)
    assert(corpus.count() == expected.count())
    assert(corpus.count() > 0, "decontamination gate must not empty the corpus")
    // the strongest contamination: the benchmark slice itself must not
    // ship in the training corpus
    val benchIds = Tables.documents(spark, sf)
      .filter(col("source") === graft.text.TextOps.BenchmarkSource).select("doc_id")
    assert(corpus.join(benchIds, "doc_id").count() == 0,
      "published corpus must not contain benchmark-source documents")
    assert(corpus.filter(col("shard") =!=
      pmod(hash(col("doc_id")), lit(Pipeline.CorpusShards))).count() == 0)
  }

  test("sharded writer produces exactly N hash-stable shards") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/docs"
    graft.sources.Sources.writeSharded(docs, dir, "doc_id", 8)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length == 8, s"expected 8 shard dirs, got ${dirs.toSeq}")
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    // membership is a pure function of the key — not of input layout
    val bad = back.filter(col("shard") =!= pmod(hash(col("doc_id")), lit(8))).count()
    assert(bad == 0)
    // one shard can be opened alone via partition pruning
    val one = spark.read.parquet(dir).filter(col("shard") === 3)
    assert(one.count() == back.filter(pmod(hash(col("doc_id")), lit(8)) === 3).count())
  }

  test("compaction bin-packs a fragmented table and preserves every row") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/docs"
    // simulate a micro-batch-fragmented table: 64 tiny files
    docs.repartition(64).write.parquet(dir)
    val charSum = docs.agg(sum("n_chars")).head().getLong(0)
    val bytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    val target = bytes / 4 + 1 // aim for ~4 output files
    val (before, after) = graft.sources.Sources.compactParquet(spark, dir, target)
    assert(before == 64)
    assert(after <= 5 && after >= 1, s"expected ~4 files, got $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) == charSum)
    assert(!new java.io.File(dir + "._compacting").exists())
    assert(!new java.io.File(dir + "._pre_compact").exists())
  }

  test("mergeSchema read unions evolving schemas with NULL backfill") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    // vintage 1: (id, v); vintage 2 adds `lang`
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").write.parquet(dir)
    Seq((3L, 30.0, "en"), (4L, 40.0, "de")).toDF("id", "v", "lang")
      .write.mode("append").parquet(dir)
    val merged = graft.sources.Sources.readParquetMergeSchema(spark, dir)
    assert(merged.columns.toSet == Set("id", "v", "lang"))
    assert(merged.count() == 4)
    // pre-evolution rows read NULL for the added column
    assert(merged.filter(col("lang").isNull).select("id")
      .as[Long].collect().toSet == Set(1L, 2L))
    assert(merged.filter(col("lang") === "en").select("id")
      .as[Long].collect().toSeq == Seq(3L))
  }
}
