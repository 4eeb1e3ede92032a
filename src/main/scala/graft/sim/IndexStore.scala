package graft.sim

import graft.Tables
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.Paths

/** Persisted index artifacts — the build/serve separation every trained
  * ANN structure needs at scale. Training an IVF coarse quantizer or a
  * PQ codebook is a multi-pass job over the collection; SERVING a query
  * is a few joins against the trained tables. A 100 TB deployment
  * builds the index once per collection vintage and answers millions of
  * queries against the stored artifact — retraining inline per query
  * batch (what [[Pq.search]] and [[Ivfpq.search]] did through round 9)
  * conflates the two costs and re-pays the expensive one every call.
  *
  * The store is deliberately dumb: each index is a directory of parquet
  * tables plus a `_manifest` file written LAST (the commit marker). A
  * manifest records the artifact VERSION (index family + every training
  * hyperparameter baked into the layout) and a cheap FINGERPRINT of the
  * source collection; a load whose manifest is missing or disagrees on
  * either string rebuilds. Because every build is deterministic (fixed
  * Lloyd iterations, integer-grid arithmetic, total tie-break orders —
  * the property the DuckDB oracles already verify), load-or-build is
  * referentially transparent: the served tables are bit-identical to
  * what an inline retrain would produce, so the oracle replay of the
  * TRAINING still hash-proves the SERVED index.
  *
  * Fingerprint = one column-pruned aggregate over the collection (row
  * count + key checksum + TWO full-component checksums, one plain and
  * one position-weighted so dimension permutations change it too), NOT
  * a cryptographic content hash. It reads every embedding component —
  * a collection regenerated in place with unchanged ids but different
  * values in ANY dimension invalidates the index (a first-component-only
  * probe missed exactly that) — but it stays one narrow linear scan
  * with no shuffle: microseconds of parquet at driver scale, ~1 s at
  * the 100× ladder rung. A vintage system with real mutation tracking
  * would key on a table version instead; plain parquet dirs have none.
  *
  * Durability protocol (what makes the commit marker honest on a real
  * deployment): EVERYTHING — tables and manifest — goes through the
  * Hadoop FileSystem of the index root's scheme, so a cluster whose
  * default FS is not the driver's local disk keeps marker and data on
  * the SAME filesystem. A build writes tables into a fresh temp
  * directory, writes the manifest there LAST, then swaps the temp dir
  * into place with a delete + atomic-per-directory rename — a reader
  * in another process sees either the complete old vintage, nothing
  * (rebuilds), or the complete new vintage, never a half-overwritten
  * table. In-JVM builds additionally serialize on a per-path lock.
  *
  * Location: `GRAFT_INDEX_DIR` (default: a `graft-indexes` directory
  * under java.io.tmpdir), keyed by the canonical data directory — the
  * read-only source tables are never written to.
  */
object IndexStore {

  def root: String = sys.env.getOrElse("GRAFT_INDEX_DIR",
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-indexes")

  /** One directory per (collection dir, index family). URI-style data
    * dirs (scheme://…) are keyed verbatim — nio canonicalization would
    * resolve them against the driver cwd, which is meaningless for a
    * remote scheme and unstable across processes. */
  private def indexDir(dataDir: String, name: String): String = {
    val canon =
      if (dataDir.contains("://")) dataDir
      else Paths.get(dataDir).toAbsolutePath.normalize.toString
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
    s"$root/${canon.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(48)}-$key/$name"
  }

  /** Per-row checksums stay under this before summing, so the corpus
    * total cannot overflow a 64-bit sum until ~9e9 rows (and ANSI mode
    * never throws on the fingerprint path). */
  private val FpMod = 1000000007L

  /** Row count + key checksum + plain and position-weighted checksums
    * over EVERY embedding component (1e-7 integer grid, so the string
    * is stable across runs and engines). The weighted sum makes
    * component permutations visible; the plain sum makes any value
    * change visible even if a permutation-compensating edit fooled one
    * of them. One column-pruned scan, no shuffle. */
  def embeddingsFingerprint(spark: SparkSession, dataDir: String): String = {
    val q = "cast(floor(cast(x as double) * 1e7) as bigint)"
    val r = Tables.embeddings(spark, dataDir)
      .agg(count(lit(1)).as("n"),
        sum(col("vec_id")).as("sid"),
        sum(expr(
          s"""pmod(aggregate(transform(embedding, x -> $q),
                cast(0 as bigint), (acc, v) -> acc + v), ${FpMod}L)"""))
          .as("sall"),
        sum(expr(
          s"""pmod(aggregate(zip_with(embedding, sequence(1, size(embedding)),
                (x, i) -> cast(i as bigint) * $q),
                cast(0 as bigint), (acc, v) -> acc + v), ${FpMod}L)"""))
          .as("swt"))
      .head()
    def l(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    s"n=${l(0)};sid=${l(1)};sall=${l(2)};swt=${l(3)}"
  }

  /** Row count + key checksum + content checksum of the documents
    * table — the staleness guard for text indexes ([[graft.text
    * .Relevance]]'s BM25 postings). xxhash64 of the text reads every
    * byte, so any in-place edit invalidates; still one narrow scan. */
  def documentsFingerprint(spark: SparkSession, dataDir: String): String = {
    val r = Tables.documents(spark, dataDir)
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("sid"),
        sum(expr(s"pmod(xxhash64(text), ${FpMod}L)")).as("st"))
      .head()
    def l(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    s"n=${l(0)};sid=${l(1)};st=${l(2)}"
  }

  /** Serialize build-once semantics per index path within this JVM; the
    * temp-dir + rename protocol covers cross-process readers. */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readManifest(fs: FileSystem, p: HPath): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }

  /** Load the named index's tables if a committed build for this
    * (version, fingerprint) exists; otherwise run `build`, persist each
    * returned table into a temp directory, commit via manifest-last +
    * atomic directory rename, and read the tables back — so the caller
    * ALWAYS serves from the stored parquet (identical plans on the hit
    * and miss paths). */
  def loadOrBuild(spark: SparkSession, dataDir: String, name: String,
                  version: String, fingerprint: String, tables: Seq[String])
                 (build: => Map[String, DataFrame]): Map[String, DataFrame] = {
    val dir = indexDir(dataDir, name)
    val lock = locks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val fs = fsOf(spark, dir)
      val dirP = new HPath(dir)
      val manifest = new HPath(dirP, "_manifest")
      val want = s"version=$version\nfingerprint=$fingerprint\ntables=${tables.mkString(",")}"
      val hit = readManifest(fs, manifest).contains(want)
      if (!hit) {
        val built = build
        require(tables.forall(built.contains),
          s"index build for $name must produce ${tables.mkString(",")}; got ${built.keys.mkString(",")}")
        // stage the whole vintage in a temp sibling, manifest LAST,
        // then swap it in with one directory rename — another process
        // never observes tables without their manifest or a mix of
        // vintages
        val tmpP = new HPath(s"$dir.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
        tables.foreach(t =>
          built(t).write.mode("overwrite").parquet(new HPath(tmpP, t).toString))
        val out = fs.create(new HPath(tmpP, "_manifest"), true)
        try out.write(want.getBytes(StandardCharsets.UTF_8)) finally out.close()
        if (fs.exists(dirP)) fs.delete(dirP, true)
        fs.mkdirs(dirP.getParent)
        if (!fs.rename(tmpP, dirP))
          throw new java.io.IOException(s"could not commit index build: rename $tmpP -> $dirP failed")
      }
      tables.map(t => t -> spark.read.parquet(new HPath(dirP, t).toString)).toMap
    }
  }
}
