package graft

import org.apache.spark.sql.functions._

/** Dev-tool main: measure the basket a-priori prune on a corpus where
  * it can actually BITE. The driver corpus is near-uniform (every item
  * support ≈ the 20th-best pair count), so the shipped selectivity
  * guard correctly declines to prune there and the prune path's win was
  * only ever hypothesized. This harness materializes a power-law
  * item-popularity replica of the sf0.1 baskets — the realistic retail
  * shape, where a head item appears in a few percent of ALL orders —
  * and A/Bs the registered operator's pruned plan against the forced
  * plain plan on the SAME cached input, asserting bit-identical output.
  *
  * Skew transform: replica r of each (order, item) row remaps the item
  * to `floor(P · u^alpha)` with u a hash-uniform of (order, item, r) —
  * u³ concentrates ~17% of all occurrence mass in the top ~0.5% of a
  * 100k-item universe, the classic Zipf-ish head the a-priori bound
  * exploits. Replicas land `basketMult` to an order (same order key,
  * fresh items) before the key shifts to a new PK space (the ScaleGen
  * discipline), so baskets grow to realistic retail size — basket
  * mining's dominant cost is the C(basket, 2) pair fanout, and a ~4
  * item TPC-H basket (fanout 6) never lets ANY candidate prune matter;
  * a 20-40 item basket (fanout hundreds) is the regime the prune
  * exists for, and the one a recommender corpus actually has.
  *
  * Usage: runMain graft.BasketSkewBench [factor] [srcDir] [alpha] [basketMult]
  * Output: one JSON line (also appended by hand to
  * docs/BENCH_BASKET_SKEW.json when committed).
  */
object BasketSkewBench {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 30
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val alpha = if (args.length > 2) args(2).toDouble else 3.0
    val basketMult = if (args.length > 3) args(3).toInt else 8
    val spark = Sessions.local(cores = 32,
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val Offset = 1000000000L
    val P = 100000
    val base = Tables.lineitem(spark, src).select("l_orderkey", "l_partkey")
    val li = base
      .withColumn("_r", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        (col("l_orderkey") +
          expr(s"cast(_r div $basketMult as bigint)") * Offset)
          .as("l_orderkey"),
        expr(s"""cast(floor($P * pow(
                   pmod(hash(l_orderkey, l_partkey, _r), 1000000) / 1000000.0,
                   $alpha)) as bigint)""").as("l_partkey"))
      .persist()
    val nRows = li.count() // materialize once; both arms read the cache

    def timed(runs: Int)(f: => Long): (Double, Long) = {
      var rows = 0L
      val ts = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        rows = f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(runs / 2), rows)
    }

    // warm both plans once (JIT/codegen steady state); the decision is
    // read from the construction that made it, not a JVM-global
    val (warmDf, pruneActive) =
      analytics.Basket.basketPairsOverWithDecision(li, allowPrune = true)
    warmDf.collect()
    analytics.Basket.basketPairsOver(li, allowPrune = false).collect()

    val (tPruned, nPruned) =
      timed(3)(analytics.Basket.basketPairsOver(li, allowPrune = true).collect().length.toLong)
    val (tPlain, nPlain) =
      timed(3)(analytics.Basket.basketPairsOver(li, allowPrune = false).collect().length.toLong)

    // exactness: the prune must be invisible in the output
    val a = analytics.Basket.basketPairsOver(li, allowPrune = true)
      .collect().map(_.toSeq).toSeq
    val b = analytics.Basket.basketPairsOver(li, allowPrune = false)
      .collect().map(_.toSeq).toSeq
    val identical = a == b

    li.unpersist()
    println(s"""{"metric":"basket_skew_ab","factor":$factor,"alpha":$alpha,""" +
      s""""basket_mult":$basketMult,"rows_in":$nRows,""" +
      s""""prune_active":$pruneActive,"identical":$identical,""" +
      s""""pruned_sec":$tPruned,"plain_sec":$tPlain,""" +
      s""""rows_out":$nPruned,"rows_out_plain":$nPlain,"src":"$src"}""")
    spark.stop()
    if (!identical || !pruneActive) sys.exit(1)
  }
}
