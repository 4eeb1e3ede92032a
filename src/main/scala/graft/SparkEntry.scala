package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per SURVEY §2
  * operator family), `oracleSql` the DuckDB-equivalent SQL per entry over
  * the same parquet tables. Column names and values match exactly — see
  * [[Det]] for the determinism conventions that make double-valued
  * measures hash-identical between Spark and DuckDB.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Analytics.q01(spark, "/root/testdata/sf0.001")

  /** The per-module inventories, merged (left to right) into [[queries]].
    * Kept as a Seq so the registry spec can prove no key is shadowed by
    * a later module (`inventorySizes.sum == queries.size`). */
  private[graft] def inventories: Seq[Map[String, (SparkSession, String) => DataFrame]] = Seq(
    analytics.Analytics.inventory,
    etl.Cleanse.inventory,
    etl.Load.inventory,
    quality.Quality.inventory,
    quality.Pii.inventory,
    monitor.Monitor.inventory,
    warehouse.WarehouseQueries.inventory,
    text.TextOps.inventory,
    sim.Similarity.inventory,
    sim.Ivf.inventory,
    sim.Pq.inventory,
    sim.Ivfpq.inventory,
    streaming.Streams.inventory,
    multimodal.Multimodal.inventory,
    ext.Extensions.inventory,
    text.DedupClusters.inventory,
    analytics.WindowOps.inventory,
    etl.Skew.inventory,
    ext.TemporalJoins.inventory,
    ext.Reshape.inventory,
    analytics.Quantiles.inventory,
    ext.SetOps.inventory,
    text.Curation.inventory,
    text.Packing.inventory,
    text.Incremental.inventory,
    text.Relevance.inventory,
    analytics.Funnels.inventory,
    quality.Profile.inventory,
    monitor.Drift.inventory,
    etl.Cdc.inventory,
    sim.EmbeddingDrift.inventory,
    analytics.Stats.inventory,
    analytics.Basket.inventory,
    analytics.Rfm.inventory,
    analytics.Graph.inventory)

  private[graft] def inventorySizes: Seq[Int] = inventories.map(_.size)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventories.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.Analytics.oracle ++
      etl.Cleanse.oracle ++
      etl.Load.oracle ++
      quality.Quality.oracle ++
      quality.Pii.oracle ++
      monitor.Monitor.oracle ++
      warehouse.WarehouseQueries.oracle ++
      text.TextOps.oracle ++
      sim.Similarity.oracle ++
      sim.Ivf.oracle ++
      sim.Pq.oracle ++
      sim.Ivfpq.oracle ++
      streaming.Streams.oracle ++
      multimodal.Multimodal.oracle ++
      ext.Extensions.oracle ++
      text.DedupClusters.oracle ++
      analytics.WindowOps.oracle ++
      etl.Skew.oracle ++
      ext.TemporalJoins.oracle ++
      ext.Reshape.oracle ++
      analytics.Quantiles.oracle ++
      ext.SetOps.oracle ++
      text.Curation.oracle ++
      text.Packing.oracle ++
      text.Incremental.oracle ++
      text.Relevance.oracle ++
      analytics.Funnels.oracle ++
      quality.Profile.oracle ++
      monitor.Drift.oracle ++
      etl.Cdc.oracle ++
      sim.EmbeddingDrift.oracle ++
      analytics.Stats.oracle ++
      analytics.Basket.oracle ++
      analytics.Rfm.oracle ++
      analytics.Graph.oracle
}
