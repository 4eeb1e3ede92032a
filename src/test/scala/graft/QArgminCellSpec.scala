package graft

import graft.functions.QArgminCell
import org.apache.spark.sql.functions._

class QArgminCellSpec extends SparkSpec {

  /** Independent plain-Scala reference: quantize to the 1e-7 grid,
    * exact integer L2² per centroid, lowest-(d, cid) wins. */
  private def refArgmin(emb: scala.collection.Seq[Float],
                        centroids: Array[(Int, Array[Long])]): Int = {
    val q = emb.map(f => math.floor(f.toDouble * 1e7).toLong)
    centroids.map { case (cid, c) =>
      (q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
    }.min._2
  }

  private def someCentroids(n: Int): Array[(Int, Array[Long])] = {
    // grid points derived from real vectors so distances are realistic
    val rows = Tables.embeddings(spark, sf).orderBy("vec_id").limit(n).collect()
    rows.zipWithIndex.map { case (r, i) =>
      (i, r.getAs[Seq[Float]]("embedding")
        .map(f => math.floor(f.toDouble * 1e7).toLong).toArray)
    }
  }

  test("native argmin matches the plain-Scala reference on every vector") {
    val cents = someCentroids(16)
    val got = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), col("embedding"),
        QArgminCell.of("embedding", cents).as("cell"))
      .collect()
    got.foreach { r =>
      val expected = refArgmin(r.getAs[scala.collection.Seq[Float]]("embedding"), cents)
      assert(r.getAs[Int]("cell") == expected,
        s"vec ${r.getLong(0)}: native ${r.getAs[Int]("cell")} vs reference $expected")
    }
  }

  test("equal-distance ties break to the LOWEST cid regardless of order") {
    import spark.implicits._
    val v = Seq((1L, Array(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val c = Array(5000000L, -2500000L)
    // duplicate centroid under different cids, deliberately unsorted
    val cents = Array(7 -> c, 3 -> c, 5 -> c)
    val cell = v.select(QArgminCell.of("embedding", cents).as("cell"))
      .head().getAs[Int]("cell")
    assert(cell == 3, s"tie must keep lowest cid, got $cell")
  }

  test("native argmin participates in whole-stage codegen") {
    val cents = someCentroids(4)
    val plan = Tables.embeddings(spark, sf)
      .select(QArgminCell.of("embedding", cents).as("cell"))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.exists(_.toString.contains("qargmincell")), plan.toString)
  }
}
