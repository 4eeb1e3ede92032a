package graft

import org.apache.spark.sql.types._

/** Meta-guard for the oracle conventions (graft.Det): every registered
  * query's PUBLISHED schema may only carry long/int/double/string/
  * boolean columns — DATE and DECIMAL render differently across the
  * parquet/pandas/DuckDB comparison hop and fail the gate in ways that
  * look like float noise. Catching a forgotten edge cast here is a
  * compile-time-cheap analysis pass (no query executes). */
class PublishedSchemaSpec extends SparkSpec {

  private val allowed: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, StringType, BooleanType)

  test("every registered query publishes only oracle-safe column types") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sf).schema // analysis only, nothing runs
        schema.fields.collect {
          case f if !allowed.contains(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"queries publishing DATE/DECIMAL/other non-oracle-safe types:\n${offenders.mkString("\n")}")
  }

  test("every oracle entry has a matching query (and names line up)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${o -- q}")
    // every registered query is oracled — the sketch ops register their
    // bound checks (deterministic booleans), not their raw estimates
    val unoracled = q -- o
    assert(unoracled.isEmpty, s"unexpected unoracled queries: $unoracled")
  }

  test("the flagship entry query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
