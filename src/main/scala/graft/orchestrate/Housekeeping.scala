package graft.orchestrate

import java.nio.file.{Files, Path, Paths}
import java.time.{Instant, LocalDate, ZoneOffset}
import scala.jdk.CollectionConverters._

/** Operational housekeeping — the reference's retention cleanup and
  * YAML-config-with-env-override surface (reference:
  * scripts/cleanup_old_data.py:39-111 deletes files older than 7 days
  * while preserving summary/report/metadata files and today's files;
  * scripts/ingestion/ingest_to_staging.py:26-32 layers env vars over
  * config/config.yaml, env winning).
  */
object Housekeeping {

  /** Names always preserved regardless of age (cleanup_old_data.py:39-40). */
  val PreservePatterns: Seq[String] = Seq("summary", "report", "metadata")

  /** Delete regular files under `dir` older than `retentionDays` relative
    * to `today`, preserving protected name patterns and files modified
    * today. Returns deleted paths. Ages derive from file mtime; `today` is
    * injectable so tests are deterministic. */
  def cleanupOldFiles(dir: String, retentionDays: Int = 7,
                      today: LocalDate = LocalDate.now(ZoneOffset.UTC)): Seq[Path] = {
    require(retentionDays >= 0, s"retentionDays must be >= 0, got $retentionDays")
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Seq.empty
    val cutoff = today.minusDays(retentionDays.toLong)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[Path]
    scala.util.Using.resource(Files.walk(root)) { stream =>
      stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .foreach { p =>
          val name = p.getFileName.toString.toLowerCase
          val preserved = PreservePatterns.exists(name.contains)
          val mday = Instant.ofEpochMilli(Files.getLastModifiedTime(p).toMillis)
            .atZone(ZoneOffset.UTC).toLocalDate
          // mday.isBefore(cutoff) with cutoff <= today already excludes
          // today's files (retentionDays >= 0 is required above)
          if (!preserved && mday.isBefore(cutoff)) {
            Files.delete(p)
            deleted += p
          }
        }
    }
    deleted.toSeq
  }

  /** Flat key config: `key: value` lines (the YAML subset the reference
    * uses), with environment-variable override — env wins, mirroring
    * ingest_to_staging.py:26-32. `envKey` maps config keys to env names
    * (e.g. "db.host" → "DB_HOST"). */
  def loadConfig(path: String,
                 env: Map[String, String] = sys.env): Map[String, String] = {
    val fromFile: Map[String, String] =
      if (Files.exists(Paths.get(path)))
        Files.readAllLines(Paths.get(path)).asScala
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains(":"))
          .map { l =>
            val i = l.indexOf(':')
            l.substring(0, i).trim -> l.substring(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
          }.toMap
      else Map.empty
    fromFile.map { case (k, v) => k -> env.getOrElse(envKey(k), v) }
  }

  def envKey(k: String): String = k.toUpperCase.replaceAll("[^A-Z0-9]", "_")

  /** Lock-file mutual exclusion for scheduled runs (reference:
    * scripts/scheduler.py:53-61 skips a run when a lockfile exists and
    * reclaims stale ones). Returns Some(body result) when the lock was
    * acquired, None when another run holds a fresh lock. Acquisition is
    * atomic (createFile throws if the file appears concurrently); the
    * lock is released even when body throws; locks older than
    * `staleAfterMs` are treated as leftovers of a crashed run. */
  def withLock[A](lockPath: String, staleAfterMs: Long = 2L * 3600 * 1000)(
      body: => A): Option[A] = {
    val p = Paths.get(lockPath)
    if (p.getParent != null) Files.createDirectories(p.getParent)

    def tryAcquire(): Boolean =
      try { Files.createFile(p); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }

    val acquired = tryAcquire() || {
      // lock exists: reclaim only if stale, and reclaim via an atomic
      // rename — a delete-then-create sequence would let two processes
      // both pass the age check, with the second deleting the first's
      // freshly created lock (TOCTOU). Only one mover wins a rename.
      val stale =
        try System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis >= staleAfterMs
        catch { case _: java.nio.file.NoSuchFileException => true } // holder just released
      stale && {
        // tomb name is unique per reclaimer: a crashed reclaimer leaves
        // only its own tomb behind, never a fixed-name file that would
        // jam every future reclaim's move
        val tomb = p.resolveSibling(
          s"${p.getFileName}.reclaimed.${ProcessHandle.current().pid()}.${System.nanoTime()}")
        val moved =
          try { Files.move(p, tomb); true }
          catch { case _: Exception => false } // lost the race, or lock vanished
        if (moved) {
          // verify the moved lock was GENUINELY stale (rename preserves
          // mtime): if a concurrent winner re-created a fresh lock
          // between our age check and our move, we stole a live lock —
          // restore it and skip this run instead of double-running
          val tombStale =
            try System.currentTimeMillis() - Files.getLastModifiedTime(tomb).toMillis >= staleAfterMs
            catch { case _: Exception => false }
          if (tombStale) { Files.deleteIfExists(tomb); tryAcquire() }
          else {
            try { Files.move(tomb, p); () }
            catch { case _: Exception => Files.deleteIfExists(tomb); () }
            false
          }
        } else tryAcquire() // another reclaimer may have freed it
      }
    }
    if (!acquired) return None
    try Some(body)
    finally Files.deleteIfExists(p)
  }
}
