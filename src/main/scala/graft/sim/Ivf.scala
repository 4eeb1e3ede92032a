package graft.sim

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor — the inverted-file scale path
  * for similarity search (complementing [[Similarity.annLshBuckets]]):
  * a small k-means coarse quantizer partitions the vector space; queries
  * probe only the `nprobe` nearest cells, scanning a fraction of the
  * collection instead of all of it.
  *
  * Deterministic by construction: centroids initialize from the first k
  * vectors by vec_id, Lloyd iterations are fixed-count, every argmin
  * tie-breaks on centroid id — no RNG anywhere — and cell means come
  * from exact integer sums of 1e-7-quantized components (a distributed
  * double avg() merges partials in shuffle order and is not
  * run-to-run reproducible).
  *
  * Scale posture: the index build is `iterations` × (one broadcast of k
  * centroids + one map-side argmin + one groupBy(k) mean) — no all-pairs
  * work. The k×dim centroid table is the only driver-side state (k ≤ a
  * few thousand at any realistic scale) and is emitted as a DataFrame so
  * search never recomputes it. Search is one declarative plan — queries
  * broadcast-cross-join the k centroids to pick their `nprobe` cells,
  * then equality-join the inverted lists — so the number of Spark jobs
  * is constant in the number of queries (IvfSpec asserts this), and cost
  * is |collection| × nprobe / k per query batch.
  */
object Ivf {

  /** The built index: per-vector cell assignments (vec_id, embedding,
    * cell) and the k centroid rows (cell, centroid: array<double>). */
  final case class IvfIndex(assignments: DataFrame, centroids: DataFrame)

  /** L2² distance between an embedding column and a broadcast centroid
    * array literal, in double. */
  private def dist2(embCol: String, centroid: Array[Double]): org.apache.spark.sql.Column = {
    val lit = centroid.mkString("array(", ",", ")")
    expr(s"""aggregate(zip_with($embCol, $lit,
               (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
             cast(0 as double), (a, v) -> a + v)""")
  }

  /** Argmin centroid id for each row of `vecs` given driver-side
    * centroids (k small; the when-chain compiles into one projection). */
  private def assign(vecs: DataFrame, centroids: Array[(Int, Array[Double])]) = {
    val dists = centroids.map { case (cid, c) => (cid, dist2("embedding", c)) }
    val best = dists.tail.foldLeft(
      struct(dists.head._2.as("d"), lit(dists.head._1).as("cid"))) {
      case (acc, (cid, d)) =>
        when(d < acc.getField("d"), struct(d.as("d"), lit(cid).as("cid")))
          .otherwise(acc)
    }
    vecs.withColumn("cell", best.getField("cid"))
  }

  /** Fixed-iteration Lloyd k-means over the collection; returns the final
    * centroids (the per-iteration groupBy(k) collect is k rows — bounded
    * driver state, not data). */
  private def lloyd(vecs: DataFrame, k: Int, iterations: Int): Array[(Int, Array[Double])] = {
    var centroids: Array[(Int, Array[Double])] = vecs
      .orderBy("vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i, r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      }
    val dim = centroids.head._2.length
    (1 to iterations).foreach { _ =>
      val assigned = assign(vecs, centroids)
      // means from EXACT integer sums of 1e-7-quantized components (the
      // Det convention): a distributed double avg() merges partials in
      // shuffle order and is not reproducible run-to-run — an
      // equidistant vector could flip cells and change search results
      val sumCols = (0 until dim).map(i =>
        sum(expr(s"cast(floor(cast(element_at(embedding, ${i + 1}) as double) * 1e7) as bigint)"))
          .as(s"s$i")) :+ count(lit(1)).as("n")
      val means = assigned.groupBy("cell")
        .agg(sumCols.head, sumCols.tail: _*)
        .collect()
      val updated = means.map { r =>
        val n = r.getAs[Long]("n").toDouble
        (r.getAs[Int]("cell"),
          (0 until dim).map(i => r.getAs[Long](s"s$i").toDouble / n / 1e7).toArray)
      }.toMap
      // empty cells keep their previous centroid
      centroids = centroids.map { case (cid, c) => (cid, updated.getOrElse(cid, c)) }
    }
    centroids
  }

  /** Build the IVF index: assignments plus the centroid table (computed
    * once here, in the Lloyd loop — search probes it via broadcast join
    * instead of recomputing cell means). */
  def buildIndexFull(spark: SparkSession, dir: String, k: Int = 16,
                     iterations: Int = 3): IvfIndex = {
    val vecs = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    val centroids = lloyd(vecs, k, iterations)
    val centroidDf = spark.createDataFrame(
      centroids.toSeq.map { case (cid, c) => (cid, c.toSeq) })
      .toDF("cell", "centroid")
    IvfIndex(
      assign(vecs, centroids).select(col("vec_id"), col("embedding"), col("cell")),
      centroidDf)
  }

  /** Cell assignment per vector (back-compat surface over
    * [[buildIndexFull]]). */
  def buildIndex(spark: SparkSession, dir: String, k: Int = 16,
                 iterations: Int = 3): DataFrame =
    buildIndexFull(spark, dir, k, iterations).assignments

  /** Top-k search probing the `nprobe` nearest cells per query. Queries
    * are the first `nQueries` vectors (self excluded), as in
    * [[Similarity.annCosineTopK]] — so recall against the exact result is
    * directly measurable.
    *
    * One declarative plan, no per-query jobs: queries ⨯ broadcast(k
    * centroids) → windowed nprobe-nearest cells → equality join on cell
    * against the inverted lists → exact cosine → windowed top-k. Job
    * count is therefore independent of nQueries (spec-asserted).
    */
  def search(spark: SparkSession, dir: String, k: Int = 16, nprobe: Int = 4,
             topK: Int = 10, nQueries: Int = 5): DataFrame = {
    val idx = buildIndexFull(spark, dir, k)
    val queries = idx.assignments.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))

    val probes = queries
      .crossJoin(broadcast(idx.centroids))
      .withColumn("d2",
        expr("""aggregate(zip_with(q, centroid,
                  (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
                cast(0 as double), (a, v) -> a + v)"""))
      .withColumn("prank", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("d2"), asc("cell"))))
      .filter(col("prank") <= nprobe)
      .select("query_id", "q", "cell")

    probes.join(idx.assignments, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        expr("""aggregate(zip_with(q, embedding,
                  (x, y) -> cast(x as double) * cast(y as double)),
                cast(0 as double), (a, v) -> a + v)""")
          / (sqrt(expr("""aggregate(q, cast(0 as double),
                           (a, v) -> a + cast(v as double) * cast(v as double))""")) *
             sqrt(expr("""aggregate(embedding, cast(0 as double),
                           (a, v) -> a + cast(v as double) * cast(v as double))"""))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))))
      .filter(col("rank") <= topK)
      .select("query_id", "vec_id", "cosine", "rank")
  }
}
