package graft.sim

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

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
  * Fingerprint = one cheap aggregate over the collection (row count +
  * key checksum + a component checksum), NOT a full content hash: it
  * costs one column-pruned scan per serve call — microseconds of
  * parquet metadata at driver scale, well under a second at the 100×
  * ladder rung — and catches regenerated/substituted collections. A
  * vintage system with real mutation tracking would key on a table
  * version instead; plain parquet directories have none.
  *
  * Location: `GRAFT_INDEX_DIR` (default: a `graft-indexes` directory
  * under java.io.tmpdir), keyed by the canonical data directory — the
  * read-only source tables are never written to.
  */
object IndexStore {

  def root: String = sys.env.getOrElse("GRAFT_INDEX_DIR",
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-indexes")

  /** One directory per (collection dir, index family). */
  private def indexDir(dataDir: String, name: String): String = {
    val canon = Paths.get(dataDir).toAbsolutePath.normalize.toString
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
    s"$root/${canon.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(48)}-$key/$name"
  }

  /** Row count + key checksum + first-component checksum of the
    * embeddings collection — the staleness guard for every vector
    * index. All integer arithmetic (grid-quantized component), so the
    * string is stable across runs and engines. */
  def embeddingsFingerprint(spark: SparkSession, dataDir: String): String = {
    val r = Tables.embeddings(spark, dataDir)
      .agg(count(lit(1)).as("n"),
        sum(col("vec_id")).as("sid"),
        sum(expr("cast(floor(cast(embedding[0] as double) * 1e7) as bigint)"))
          .as("s0"))
      .head()
    def l(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    s"n=${l(0)};sid=${l(1)};s0=${l(2)}"
  }

  /** Serialize build-once semantics per index path within this JVM; the
    * manifest-last protocol covers (best-effort) cross-process reuse. */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Load the named index's tables if a committed build for this
    * (version, fingerprint) exists; otherwise run `build`, persist each
    * returned table, commit the manifest, and read the tables back —
    * so the caller ALWAYS serves from the stored parquet (identical
    * plans on the hit and miss paths). */
  def loadOrBuild(spark: SparkSession, dataDir: String, name: String,
                  version: String, fingerprint: String, tables: Seq[String])
                 (build: => Map[String, DataFrame]): Map[String, DataFrame] = {
    val dir = indexDir(dataDir, name)
    val lock = locks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val manifest = Paths.get(s"$dir/_manifest")
      val want = s"version=$version\nfingerprint=$fingerprint\ntables=${tables.mkString(",")}"
      val hit = Files.exists(manifest) &&
        new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8) == want
      if (!hit) {
        Files.deleteIfExists(manifest) // uncommit before touching tables
        val built = build
        require(tables.forall(built.contains),
          s"index build for $name must produce ${tables.mkString(",")}; got ${built.keys.mkString(",")}")
        tables.foreach(t =>
          built(t).write.mode("overwrite").parquet(s"$dir/$t"))
        Files.createDirectories(manifest.getParent)
        Files.write(manifest, want.getBytes(StandardCharsets.UTF_8))
      }
      tables.map(t => t -> spark.read.parquet(s"$dir/$t")).toMap
    }
  }
}
