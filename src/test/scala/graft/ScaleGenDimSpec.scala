package graft

import java.nio.file.Files

/** The dim-scaling mode of ScaleGen: facts replicate `factor` times,
  * customer/part/supplier replicate `dimFactor` times, and fact
  * replica r's foreign keys land on dim replica r mod dimFactor — so
  * BOTH sides of every fact⋈dim join grow with the rung instead of the
  * build side staying at 1× forever (the untested-broadcast blind spot
  * the round-13 ladder carried: shared dims meant a forced broadcast
  * hint never met a non-broadcastable build side). */
class ScaleGenDimSpec extends SparkSpec {

  test("dim-scaled replica keeps FK consistency and scales both join sides") {
    val out = Files.createTempDirectory("graft_scalegen").toString
    val n = ScaleGen.generate(spark, sf, out, 4, 2)

    def t(name: String) = spark.read.parquet(s"$out/$name.parquet")
    def base(name: String) = spark.read.parquet(s"$sf/$name.parquet")

    assert(n == 4 * base("lineitem").count())
    assert(t("orders").count() == 4 * base("orders").count())
    assert(t("customer").count() == 2 * base("customer").count())
    assert(t("part").count() == 2 * base("part").count())
    assert(t("supplier").count() == 2 * base("supplier").count())
    assert(t("nation").count() == base("nation").count())

    // FK consistency: every fact FK resolves against the scaled dims
    val (li, pt, sp, od, cu) =
      (t("lineitem"), t("part"), t("supplier"), t("orders"), t("customer"))
    assert(li.join(pt, li("l_partkey") === pt("p_partkey"), "left_anti")
      .count() == 0, "dangling l_partkey")
    assert(li.join(sp, li("l_suppkey") === sp("s_suppkey"), "left_anti")
      .count() == 0, "dangling l_suppkey")
    assert(od.join(cu, od("o_custkey") === cu("c_custkey"), "left_anti")
      .count() == 0, "dangling o_custkey")

    // both dim replicas carry fact mass (r mod dimFactor cycles evenly):
    // orders split across the two customer-key ranges 2:2
    val perRange = t("orders")
      .groupBy((org.apache.spark.sql.functions.col("o_custkey") /
        ScaleGen.Offset).cast("long"))
      .count().collect().map(_.getLong(1)).toSeq
    assert(perRange.length == 2 && perRange.distinct.length == 1,
      s"fact mass must split evenly across dim replicas, got $perRange")

    // the star build stays keyed: fact grain == lineitem grain
    assert(graft.warehouse.Warehouse.fact(spark, out).count() == n)
  }
}
