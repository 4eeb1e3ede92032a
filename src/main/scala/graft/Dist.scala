package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed order-dependent numbering primitives. Global sequential
  * quantities (ranks, prefix sums) are the one thing a declarative plan
  * cannot express without a single-partition window; the scalable form
  * is: range-partition on the ordering key, sort within partitions, and
  * combine partition-local scans with per-partition offsets whose count
  * is bounded by the partition count — never by the data.
  *
  * The single-lineage rule is load-bearing everywhere here: range
  * boundaries are SAMPLED per materialized RDD instance (seeded by RDD
  * id), so the offsets job and the data pass must share one `.rdd`
  * call. Two separate DataFrame actions over the same logical plan can
  * see different partitionings — observed as colliding dim keys when
  * this was first written as a two-action DataFrame derivation.
  */
object Dist {

  /** Exclusive cumulative sum of `valueCol` (LongType) in `key` order,
    * appended as `out`. */
  def exclusiveCumsum(df: DataFrame, key: String, valueCol: String,
                      out: String): DataFrame =
    exclusiveCumsumBy(df, Seq(key), valueCol, out)

  /** Exclusive cumulative sum in lexicographic (key1, key2, …) order —
    * the composite-key form ([[rankByKeys]] ranks ties-broken tuples
    * through this). */
  def exclusiveCumsumBy(df: DataFrame, keys: Seq[String], valueCol: String,
                        out: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val ranged = df.repartitionByRange(parts, keys.map(col): _*)
      .sortWithinPartitions(keys.head, keys.tail: _*)
    val schema = ranged.schema.add(out, LongType, nullable = false)
    val vIdx = ranged.schema.fieldIndex(valueCol)
    val rows = ranged.rdd // ONE materialization — see the class scaladoc
    val partTotals = rows
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(vIdx))
        Iterator.single(i -> s)
      }.collect().toMap
    val offsets = new Array[Long](parts + 1)
    (0 until parts).foreach { i =>
      offsets(i + 1) = offsets(i) + partTotals.getOrElse(i, 0L)
    }
    val withCum = rows.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val o = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(vIdx)
        o
      }
    }
    spark.createDataFrame(withCum, schema)
  }

  /** Global 1-based rank of a UNIQUE key, appended as `out` — the
    * exclusive cumsum of ones, plus one. Keys equal the
    * `row_number().over(Window.orderBy(key))` form because ranges are
    * ordered and the key is unique (RankByKeySpec). */
  def rankByUniqueKey(df: DataFrame, key: String, out: String): DataFrame =
    rankByKeys(df, Seq(key), out)

  /** Global 1-based rank in lexicographic order of a key TUPLE that is
    * unique as a whole (e.g. a measure plus a tie-breaking id) — equal
    * to `row_number().over(Window.orderBy(k1, k2, …))` without the
    * single-partition window (RankByKeySpec pins the equivalence). */
  def rankByKeys(df: DataFrame, keys: Seq[String], out: String): DataFrame =
    exclusiveCumsumBy(df.withColumn("__one", lit(1L)), keys, "__one", out)
      .withColumn(out, col(out) + 1L)
      .drop("__one")
}
