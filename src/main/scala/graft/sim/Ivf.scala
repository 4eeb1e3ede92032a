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
  * vectors by vec_id, Lloyd iterations are fixed-count, and every argmin
  * tie-breaks on centroid id — no RNG anywhere.
  *
  * Scale posture: the index build is `iterations` × (one broadcast of k
  * centroids + one map-side argmin + one groupBy(k) mean) — no all-pairs
  * work. Search cost is |collection| × nprobe / k per query batch. The
  * k×dim centroid table is the only driver-side state (k ≤ a few
  * thousand at any realistic scale).
  */
object Ivf {

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

  /** Build the IVF index: fixed-iteration Lloyd k-means, returning the
    * cell assignment per vector. */
  def buildIndex(spark: SparkSession, dir: String, k: Int = 16,
                 iterations: Int = 3): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    var centroids: Array[(Int, Array[Double])] = vecs
      .orderBy("vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i, r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      }
    val dim = centroids.head._2.length
    (1 to iterations).foreach { _ =>
      val assigned = assign(vecs, centroids)
      val meanCols = (0 until dim).map(i =>
        avg(expr(s"cast(element_at(embedding, ${i + 1}) as double)")).as(s"m$i"))
      val means = assigned.groupBy("cell")
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
      val updated = means.map { r =>
        (r.getAs[Int]("cell"), (0 until dim).map(i => r.getAs[Double](s"m$i")).toArray)
      }.toMap
      // empty cells keep their previous centroid
      centroids = centroids.map { case (cid, c) => (cid, updated.getOrElse(cid, c)) }
    }
    assign(vecs, centroids)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** Top-k search probing the `nprobe` nearest cells per query. Queries
    * are the first `nQueries` vectors (self excluded), as in
    * [[Similarity.annCosineTopK]] — so recall against the exact result is
    * directly measurable. */
  def search(spark: SparkSession, dir: String, k: Int = 16, nprobe: Int = 4,
             topK: Int = 10, nQueries: Int = 5): DataFrame = {
    val index = buildIndex(spark, dir, k).cache()
    val queries = index.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
      .collect()

    // per query: order this query's cells by centroid distance — approximate
    // with distance from the query to each cell's members' cells: compute
    // distances query→centroid via the index's cells.
    val probed = queries.map { qr =>
      val qid = qr.getAs[Long]("query_id")
      val q = qr.getAs[Seq[Float]]("q").map(_.toDouble).toArray
      val qLit = q.mkString("array(", ",", ")")
      // distance of q to each centroid = min over... we kept centroids in
      // the index only as assignments; recompute cell centroids on the fly
      val qMeanCols = (0 until q.length).map(i =>
        avg(expr(s"cast(element_at(embedding, ${i + 1}) as double)")).as(s"m$i"))
      val cellDist = index.groupBy("cell")
        .agg(qMeanCols.head, qMeanCols.tail: _*)
        .select(col("cell"),
          expr((0 until q.length)
            .map(i => s"(m$i - ${q(i)}) * (m$i - ${q(i)})").mkString("+"))
            .as("d2"))
        .orderBy("d2").limit(nprobe)
        .select("cell").collect().map(_.getInt(0)).toSet
      index
        .filter(col("cell").isin(cellDist.toSeq: _*) && col("vec_id") =!= qid)
        .select(
          lit(qid).as("query_id"), col("vec_id"),
          (expr(s"""aggregate(zip_with($qLit, embedding, (x, y) -> x * cast(y as double)),
                     cast(0 as double), (a, v) -> a + v)""")
            / (sqrt(expr(s"""aggregate($qLit, cast(0 as double), (a, v) -> a + v * v)""")) *
               sqrt(expr("""aggregate(embedding, cast(0 as double), (a, v) -> a + cast(v as double) * cast(v as double))"""))))
            .as("cosine"))
    }
    val all = probed.reduce(_.unionByName(_))
    all.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))))
      .filter(col("rank") <= topK)
  }
}
