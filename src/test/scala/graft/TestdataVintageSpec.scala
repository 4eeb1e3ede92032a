package graft

import org.apache.spark.sql.types._

/** Schema guard for the DRIVER-regenerated testdata: round 8 lost two
  * operators and eight tests to a silent events.ts vintage flip
  * (TIMESTAMP(NANOS) → naive micros) discovered only at judging time.
  * This spec pins the adapter-level schema of EVERY table at every SF
  * dir, so the next regeneration that changes a dtype fails ONE named
  * test pointing at the exact table/column instead of scattering
  * analysis errors across the suite.
  *
  * The assertion is on [[Tables]] output (post-normalization), which is
  * the contract every operator compiles against — an on-disk flip that
  * `normalizeTs`-style adapters absorb is fine and stays green.
  */
class TestdataVintageSpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  private val expected: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, Map[String, DataType])] = Seq(
    ("events", Tables.events _, Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)),
    ("documents", Tables.documents _, Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)),
    ("embeddings", Tables.embeddings _, Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)),
    ("orders", Tables.orders _, Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType)),
    ("lineitem", Tables.lineitem _, Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType)),
    ("customer", Tables.customer _, Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_acctbal" -> DoubleType)),
    ("part", Tables.part _, Map(
      "p_partkey" -> LongType, "p_retailprice" -> DoubleType)),
    ("supplier", Tables.supplier _, Map("s_suppkey" -> LongType)),
    ("nation", Tables.nation _, Map(
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)),
    ("region", Tables.region _, Map("r_regionkey" -> IntegerType)))

  test("every driver table reads with the adapter-contract dtypes at every SF") {
    for (dir <- dirs; (name, reader, want) <- expected) {
      val got = fields(reader(spark, dir))
      want.foreach { case (c, t) =>
        assert(got.contains(c), s"$dir/$name lost column $c (has ${got.keys.toSeq.sorted})")
        assert(got(c) == t,
          s"$dir/$name.$c vintage flip: expected $t, driver now ships ${got(c)} — " +
            "absorb it in graft.Tables (the operators compile against this contract)")
      }
    }
  }

  test("ordering/tiebreak key columns stay unique per table") {
    // per-table primary keys several operators use as deterministic
    // tiebreaks (event_id in lead() windows, doc_id in dedup) — a
    // regenerated vintage with duplicate ids would silently break
    // cross-engine row-order determinism rather than fail analysis
    val sf = dirs.head
    assert(Tables.events(spark, sf).groupBy("event_id").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0)
    assert(Tables.documents(spark, sf).groupBy("doc_id").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0)
    assert(Tables.embeddings(spark, sf).groupBy("vec_id").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0)
  }
}
