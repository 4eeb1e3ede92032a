package graft

import graft.analytics.Quantiles
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {

  test("per-lang token quantiles equal a driver-side type-1 computation") {
    val out = Quantiles.quantilesTokensByLang(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val local = Tables.documents(spark, sf)
      .select(col("lang"), graft.text.TextOps.estBpeTokens.as("v"))
      .as[(String, Long)](org.apache.spark.sql.Encoders.product[(String, Long)])
      .collect().groupBy(_._1)
    assert(out.keySet == local.keySet && out.nonEmpty)
    local.foreach { case (lang, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def q(p: Double) = sorted(math.ceil(p * n).toInt - 1)
      assert(out(lang) == ((n.toLong, q(0.5), q(0.9), q(0.99))), s"lang $lang")
    }
  }

  test("approx quantiles stay within 2% of the exact rank-selection values") {
    val exact = Quantiles.quantilesLineTotal(spark, sf)
      .select("payment_method", "p50_micros", "p90_micros", "p99_micros")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = Quantiles.approxQuantilesRaw(spark, sf)
      .select("payment_method", "p50_micros", "p90_micros", "p99_micros")
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (e50, e90, e99) = exact(r.getString(0))
      Seq((r.getLong(1), e50), (r.getLong(2), e90), (r.getLong(3), e99)).foreach {
        case (a, e) =>
          assert(math.abs(a - e).toDouble / e <= 0.02,
            s"${r.getString(0)}: approx $a vs exact $e off by >2%")
      }
    }
  }

  test("registered bound check reports every sketch value within its rank contract") {
    val rows = Quantiles.approxQuantilesLineTotal(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("p50_in_bounds", "p90_in_bounds", "p99_in_bounds").foreach { c =>
        assert(r.getAs[Boolean](c),
          s"${r.getString(0)}: $c is false — sketch broke its rank-error contract")
      }
    }
  }

  test("exact quantiles are ordered and within the data range") {
    val rows = Quantiles.quantilesLineTotal(spark, sf).collect()
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Long]("p50_micros"),
        r.getAs[Long]("p90_micros"), r.getAs[Long]("p99_micros"))
      assert(p50 <= p90 && p90 <= p99, s"quantiles out of order: $r")
      assert(p50 > 0)
    }
  }

  test("token-weighted length quantiles dominate the unweighted ones") {
    val unw = analytics.Quantiles.quantilesTokensByLang(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("p50_tokens")).toMap
    val rows = analytics.Quantiles.quantilesDocLengthWeighted(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Long]("p50_wlen"),
        r.getAs[Long]("p90_wlen"), r.getAs[Long]("p99_wlen"))
      assert(p50 <= p90 && p90 <= p99, s"out of order: $r")
      // weighting by length shifts mass toward long docs: the weighted
      // median can never sit below the unweighted median
      assert(p50 >= unw(r.getAs[String]("lang")),
        s"${r.getAs[String]("lang")}: weighted p50 $p50 below unweighted")
    }
  }
}
