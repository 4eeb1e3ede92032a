package graft

import graft.functions.SrpSig
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class SrpSigSpec extends SparkSpec {

  test("native srp bucket is bit-equal to the HOF formulation on every vector") {
    val mismatches = Tables.embeddings(spark, sf)
      .select(
        SrpSig.of(col("embedding")).as("native"),
        expr(Similarity.srpHofE).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("srp buckets stay in the 8-bit range") {
    val mm = Tables.embeddings(spark, sf)
      .select(SrpSig.of(col("embedding")).as("b"))
      .agg(min("b"), max("b")).head
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= 255)
  }
}
