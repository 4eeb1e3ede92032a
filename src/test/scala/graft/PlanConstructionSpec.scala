package graft

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Regression net for plan-CONSTRUCTION pathologies: an operator whose
  * expression tree grows super-linearly (e.g. a when-chain fold that
  * re-embeds its accumulator, O(2^k) — the r6 `Ivf.assign` bug) hangs
  * Catalyst analysis before a single row is read, which kills every
  * downstream gate at once. This spec forces `queryExecution.analyzed`
  * for EVERY registered query — no execution, no I/O beyond schema
  * reads — each under its own timeout, so a pathological plan fails
  * fast with the offending query's name instead of wedging the JVM.
  */
class PlanConstructionSpec extends SparkSpec {

  private val perQueryTimeout = 60.seconds
  private val totalBudget = 120.seconds

  test("every registered query's plan analyzes within the time budget") {
    val pool = Executors.newSingleThreadExecutor()
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    try {
      SparkEntry.queries.foreach { case (name, fn) =>
        val analyzed = Future {
          fn(spark, sf).queryExecution.analyzed
        }
        try Await.result(analyzed, perQueryTimeout)
        catch {
          case _: TimeoutException =>
            fail(s"$name did not finish Catalyst analysis in $perQueryTimeout " +
              "— likely a super-linear expression tree; check fold/when chains")
        }
      }
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(5, TimeUnit.SECONDS)
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(wallSec < totalBudget.toSeconds,
      f"analyzing all ${SparkEntry.queries.size} registered plans took " +
        f"$wallSec%.1f s (> ${totalBudget.toSeconds} s budget) — some plan " +
        "is constructing pathologically even if none timed out individually")
  }
}
