package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._

/** The Misra–Gries summary's guarantees are what the registered
  * heavy-hitter query publishes, so they are what gets property-tested:
  * `est <= true`, `true - est <= N/(k+1)` (est = 0 when absent), and
  * therefore presence of every item with `true > N/(k+1)` — under
  * arbitrary repartitioning (which changes merge structure). */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** (item, trueCount, est) rows for a given stream and k, after the
    * stream is spread over `parts` partitions. */
  private def guaranteeRows(items: Seq[String], k: Int, parts: Int) = {
    val df = items.toDF("item").repartition(parts)
    val est = df.agg(MisraGries.of(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val estMap = est.as[(String, Long)].collect().toMap
    (exact, estMap)
  }

  private def assertGuarantee(items: Seq[String], k: Int, parts: Int): Unit = {
    val (exact, est) = guaranteeRows(items, k, parts)
    val n = items.size.toLong
    val err = n / (k + 1)
    assert(est.size <= k, s"summary exceeded capacity: ${est.size} > $k")
    // every sketch entry is a real item and never overcounts
    est.foreach { case (item, e) =>
      assert(exact.contains(item), s"phantom item $item")
      assert(e <= exact(item), s"overcount: $item est=$e true=${exact(item)}")
    }
    // undercount bounded, and heavy items therefore present
    exact.foreach { case (item, t) =>
      val e = est.getOrElse(item, 0L)
      assert(t - e <= err, s"bound broken: $item true=$t est=$e err<=$err")
      if (t > err) assert(est.contains(item), s"heavy item $item (true=$t > $err) absent")
    }
  }

  test("distinct domain <= k is counted exactly") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c")
    val (exact, est) = guaranteeRows(scala.util.Random.shuffle(items), 8, 3)
    assert(est == exact)
  }

  test("guarantee holds on a Zipfian-ish stream across partitionings") {
    // deterministic pseudo-random stream: item i drawn with mass ~ 1/(i+1)
    val rnd = new scala.util.Random(42)
    val items = (0 until 5000).map { _ =>
      val r = rnd.nextDouble()
      val i = math.min((1.0 / (r + 0.02)).toInt, 99)
      s"w$i"
    }
    for (parts <- Seq(1, 4, 13)) assertGuarantee(items, k = 16, parts = parts)
    assertGuarantee(items, k = 4, parts = 7)
  }

  test("adversarial stream: k+1 equal-mass items still bound the error") {
    val items = scala.util.Random.shuffle(
      (0 to 16).flatMap(i => Seq.fill(100)(s"x$i")): Seq[String])
    assertGuarantee(items, k = 16, parts = 5)
  }

  test("nulls are skipped") {
    val out = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("item")
      .agg(MisraGries.of(col("item"), 4).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("SQL registration: misra_gries(item, k) callable from spark.sql") {
    graft.functions.GraftExtensions.register(spark)
    Seq("p", "p", "q").toDF("item").createOrReplaceTempView("mg_in")
    val rows = spark.sql(
      "SELECT explode(misra_gries(item, 4)) AS e FROM mg_in")
      .select("e.item", "e.est").as[(String, Long)].collect().toMap
    assert(rows == Map("p" -> 2L, "q" -> 1L))
  }

  test("composes under groupBy: the guarantee holds per group") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 3000).map { i =>
      val g = s"g${i % 3}"
      val item = s"${g}_w${math.min((1.0 / (rnd.nextDouble() + 0.05)).toInt, 19)}"
      (g, item)
    }
    val est = rows.toDF("g", "item").repartition(7)
      .groupBy("g").agg(MisraGries.of(col("item"), 8).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.item"), col("e.est"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    rows.groupBy(_._1).foreach { case (g, members) =>
      val exact = members.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = members.size.toLong
      val err = n / 9
      val e = est.getOrElse(g, Map.empty)
      exact.foreach { case (item, t) =>
        assert(e.getOrElse(item, 0L) <= t)
        assert(t - e.getOrElse(item, 0L) <= err, s"group $g item $item")
      }
    }
  }

  test("registered heavy_hitter_ngrams contract is all-true and ordered") {
    val out = graft.ext.Extensions.heavyHitterNgrams(spark, sf).collect()
    assert(out.length == graft.ext.Extensions.HeavyHitterTop)
    assert(out.forall(_.getBoolean(2)), "sketch contract violated")
    val counts = out.map(_.getLong(1)).toSeq
    assert(counts == counts.sortBy(-_), "not ordered by n_exact desc")
  }
}
