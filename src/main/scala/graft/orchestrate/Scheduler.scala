package graft.orchestrate

import java.time.{Duration, Instant, LocalTime, ZoneOffset}

/** Daily scheduler loop — the in-process twin of the reference's
  * schedule-based runner (reference: scripts/scheduler.py:77-121; lock
  * handling :53-70, cleanup-always :96-103). Production deployments
  * should still prefer cron (SURVEY §2.11 documents that call); this
  * gives the library the same capability self-contained, with clock and
  * sleeper injectable so tests neither sleep nor depend on wall time.
  */
object Scheduler {

  sealed trait Tick
  case object Ran extends Tick
  case object Failed extends Tick
  case object Skipped extends Tick

  /** Sleep until the next occurrence of `at` (UTC), then run `job`
    * under the lockfile: a fresh foreign lock skips the tick
    * (scheduler.py:66-70); `cleanup` runs after every executed job,
    * success or failure (scheduler.py:96-103), but not on a skipped
    * tick; a job failure is contained so the loop survives to the next
    * day. Returns the per-tick outcomes after `ticks` iterations
    * (production callers pass Int.MaxValue and ignore the result). */
  def runDaily(at: LocalTime, lockPath: String, job: () => Unit,
               cleanup: () => Unit = () => (),
               clock: () => Instant = () => Instant.now(),
               sleeper: Duration => Unit = d => Thread.sleep(d.toMillis),
               ticks: Int = Int.MaxValue): Seq[Tick] = {
    val outcomes = scala.collection.mutable.ArrayBuffer.empty[Tick]
    var i = 0
    while (i < ticks) {
      val now = clock().atZone(ZoneOffset.UTC)
      var next = now.toLocalDate.atTime(at).atZone(ZoneOffset.UTC)
      if (!next.isAfter(now)) next = next.plusDays(1)
      sleeper(Duration.between(now, next))
      val result = Housekeeping.withLock(lockPath) {
        try { job(); Ran }
        catch { case e: Throwable =>
          System.err.println(s"[scheduler] job failed: ${e.getClass.getName}: ${e.getMessage}")
          Failed
        } finally {
          // a throwing cleanup must not kill the loop either — the
          // documented contract is "survives to the next day"
          try cleanup()
          catch { case e: Throwable =>
            System.err.println(s"[scheduler] cleanup failed: ${e.getClass.getName}: ${e.getMessage}")
          }
        }
      }
      outcomes += result.getOrElse(Skipped)
      i += 1
    }
    outcomes.toSeq
  }
}
