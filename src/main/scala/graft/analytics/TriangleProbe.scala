package graft.analytics

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dev-tool main: stage decomposition of the co-purchase triangle
  * censuses at a given corpus — how much of the exact and the DOULION
  * cost is the SHARED edge derivation (basket pair-stream explode +
  * distinct over the lineitem⋈itself co-purchase relation) vs the
  * census proper (degree orientation + wedge self-join + close). The
  * round-13 300× rung measured doulion at only ~1.4× cheaper than the
  * r11 exact census end-to-end: the per-edge md5 coin needs the pair
  * to exist, so sparsification cannot touch the pair-stream explode —
  * this probe quantifies exactly which stage owns the time.
  *
  * Usage: runMain graft.analytics.TriangleProbe <sfDir>
  */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Sessions.local(cores = 32,
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[triprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      r
    }

    // shared stage: derive + count the exact edge set (pair explode +
    // distinct; the count forces the full relation)
    time("edges_exact (pair explode + distinct)") {
      Graph.undirectedEdges(li).count()
    }
    // the coin-sampled edge set (same explode, 1/k distinct volume)
    time("edges_sampled (explode + coin + distinct)") {
      Graph.sampledUndirectedEdges(li, Graph.DoulionK).count()
    }
    // full censuses end-to-end (edge derivation + orientation + wedges)
    time("census_doulion (end-to-end)") {
      Graph.triangleDoulion(spark, sfDir).collect().toSeq
    }
    time("census_exact (end-to-end)") {
      Graph.triangleCount(spark, sfDir).collect().toSeq
    }

    // census stage ALONE on a GIVEN (materialized) edge list — the
    // regime DOULION is actually for: the graph is a stored table and
    // the derivation cost is out of the picture
    val edges = Graph.undirectedEdges(li).persist()
    edges.count() // materialize off the clock
    try {
      time("census_exact (given edge list)") {
        Graph.trianglesOfEdges(edges)
      }
      val sampled = edges.filter(expr(
        s"""pmod(cast(conv(substr(md5(concat('tri:', cast(a as string), '_',
           |cast(b as string))), 1, 8), 16, 10) as bigint), ${Graph.DoulionK}) = 0"""
          .stripMargin.replace("\n", " "))).persist()
      sampled.count()
      try {
        time("census_doulion (given edge list)") {
          Graph.trianglesOfEdges(sampled)
        }
      } finally sampled.unpersist(false)
    } finally edges.unpersist(false)
    spark.stop()
  }
}
