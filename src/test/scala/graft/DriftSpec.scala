package graft

import graft.monitor.{Drift, Monitor}
import org.apache.spark.sql.DataFrame

/** PSI distribution drift and the robust MAD anomaly — semantics on
  * synthetic shapes (identical mixes → zero PSI; a contaminated window
  * the 3σ rule mis-scores but MAD flags) plus sanity on the corpus.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: String) = java.sql.Timestamp.valueOf(s"2024-01-$day 12:00:00")

  /** n events of each type on the given January day. */
  private def mix(day: String, counts: (String, Int)*): Seq[(String, java.sql.Timestamp)] =
    counts.flatMap { case (t, n) => Seq.fill(n)((t, ts(day))) }

  test("identical mixes in both windows give zero PSI everywhere") {
    // baseline window = Jan 4-17, current = Jan 18-31
    val ev = (mix("05", "view" -> 10, "click" -> 5, "purchase" -> 2) ++
      mix("20", "view" -> 10, "click" -> 5, "purchase" -> 2))
      .toDF("event_type", "ts")
    val out = Drift.driftPsiOver(ev).collect()
    assert(out.length == 4) // 3 types + __total__
    out.foreach { r => assert(r.getAs[Double]("psi_term") == 0.0) }
  }

  test("PSI terms are nonnegative and the total is their sum") {
    val ev = (mix("05", "view" -> 100, "click" -> 50, "purchase" -> 10) ++
      mix("20", "view" -> 50, "click" -> 100, "purchase" -> 10))
      .toDF("event_type", "ts")
    val rows = Drift.driftPsiOver(ev).collect()
    val (tot, per) = rows.partition(_.getAs[String]("event_type") == "__total__")
    per.foreach { r =>
      assert(r.getAs[Double]("psi_term") >= 0.0, r.toString)
      assert(r.getAs[Double]("base_share") > 0.0 && r.getAs[Double]("cur_share") > 0.0)
    }
    val sum = per.map(_.getAs[Double]("psi_term")).sum
    assert(math.abs(tot.head.getAs[Double]("psi_term") - sum) < 1e-6)
    // purchase share unchanged relative? no — totals equal (160 each side),
    // purchase 10/160 both sides → exactly zero term
    val purchase = per.find(_.getAs[String]("event_type") == "purchase").get
    assert(purchase.getAs[Double]("psi_term") == 0.0)
  }

  test("a category absent from one window yields NULL term, not a fudge") {
    val ev = (mix("05", "view" -> 10) ++
      mix("20", "view" -> 10, "signup" -> 5)).toDF("event_type", "ts")
    val rows = Drift.driftPsiOver(ev).collect()
    val signup = rows.find(_.getAs[String]("event_type") == "signup").get
    assert(signup.isNullAt(signup.fieldIndex("psi_term")))
    assert(signup.getAs[Double]("base_share") == 0.0)
  }

  /** 27 quiet days (99/101 alternating) + 3 spike days at 500: the
    * spikes contaminate mean AND stddev enough that the 3σ rule scores
    * them z≈2.95 and stays silent; median/MAD shrug off the
    * contamination and flag all three. */
  private lazy val contaminated: DataFrame = {
    val quiet = (2 to 28).flatMap { d =>
      val day = f"$d%02d"
      mix(day, "view" -> (if (d % 2 == 0) 99 else 101))
    }
    val spikes = Seq("29", "30", "31").flatMap(day => mix(day, "view" -> 500))
    (quiet ++ spikes).toDF("event_type", "ts")
  }

  test("MAD flags the spike days the 3-sigma rule misses") {
    val classical = Monitor.volumeAnomalyOver(contaminated).collect()
    assert(classical.count(_.getAs[Boolean]("is_anomaly")) == 0,
      "3-sigma unexpectedly flagged the contaminated window")
    val robust = Monitor.madAnomalyOver(contaminated).collect()
    val flagged = robust.filter(_.getAs[Boolean]("is_anomaly"))
      .map(_.getAs[String]("day")).toSet
    assert(flagged == Set("2024-01-29", "2024-01-30", "2024-01-31"))
    // robust z on a spike is enormous; quiet days are within 3
    robust.filterNot(r => flagged(r.getAs[String]("day"))).foreach { r =>
      assert(math.abs(r.getAs[Double]("robust_z")) <= 3.0)
    }
  }

  test("MAD=0 degenerates to exact-deviation flagging with NULL z") {
    val ev = ((2 to 30).flatMap(d => mix(f"$d%02d", "view" -> 100)) ++
      mix("31", "view" -> 101)).toDF("event_type", "ts")
    val rows = Monitor.madAnomalyOver(ev).collect()
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("robust_z")))
      assert(r.getAs[Boolean]("is_anomaly") == (r.getAs[Long]("event_count") != 100L))
    }
  }

  test("registered drift and MAD frames are sane on the corpus") {
    val drift = Drift.driftPsi(spark, sf).collect()
    assert(drift.length >= 2)
    assert(drift.count(_.getAs[String]("event_type") == "__total__") == 1)
    val mad = Monitor.madAnomaly(spark, sf).collect()
    assert(mad.nonEmpty)
    val med = mad.head.getAs[Long]("median_count")
    assert(mad.forall(_.getAs[Long]("median_count") == med))
  }
}
