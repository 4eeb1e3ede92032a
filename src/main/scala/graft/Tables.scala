package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table adapters over the driver test data (TESTDATA.md).
  *
  * Plays the role of the reference's staging-layer scans (reference:
  * scripts/ingestion/ingest_to_staging.py:80 reads raw CSVs;
  * scripts/transformation/staging_to_production.py:138-141 re-scans whole
  * tables). Here every scan is a lazy columnar Parquet read — Catalyst
  * pushes filters and prunes columns into the scan, so downstream
  * operators never pay for unused columns (unlike the reference's
  * `SELECT *` into pandas).
  */
object Tables {
  private def rd(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = rd(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark has no nanosecond
    * timestamp, so read nanos as long (legacy flag) and rebuild a
    * microsecond timestamp — identical to DuckDB's nanos→micros
    * truncation, so oracle comparisons line up.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = rd(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer division — float division of epoch-nanos loses the low
      // digits past 2^53 and shifts timestamps by a microsecond
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
