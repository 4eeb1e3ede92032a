package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{TypeCheckResult, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The SECOND-nearest centroid under the exact (L2² distance, cid)
  * ordering — [[QArgminCell]]'s runner-up, for multi-probe assignment:
  * SemDeDup-style dedup blocking loses every near-dup pair the coarse
  * quantizer splits across a cell boundary, and the standard fix is to
  * block each vector into its top-2 cells (the same move IVF search
  * makes with nprobe > 1). One tight JVM loop per row tracks best and
  * runner-up simultaneously; arithmetic, quantization and tie-break are
  * identical to [[QArgminCell]], so the result is exactly the `rn = 2`
  * row of the oracle's `ROW_NUMBER() OVER (ORDER BY d2, cell)` replay.
  *
  * Null handling matches the parent: nullIntolerant, caller routes null
  * embeddings; null COMPONENTS are refused loudly. Requires ≥ 2
  * centroids (a 1-cell quantizer has no runner-up).
  */
case class QRunnerUpCell(child: Expression,
                         centroids: Array[Array[Long]],
                         cids: Array[Int]) extends UnaryExpression {
  require(centroids.length >= 2 && centroids.length == cids.length,
    s"need >= 2 centroids and one cid per centroid, got ${centroids.length} centroids / ${cids.length} cids")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qrunnerup_cell requires array<float>, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(e: Any): Any =
    QRunnerUpCell.compute(e.asInstanceOf[ArrayData], centroids, cids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
    val idRef = ctx.addReferenceObj("cids", cids, "int[]")
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = graft.functions.QRunnerUpCell.compute($e, $cRef, $idRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QRunnerUpCell =
    copy(child = newChild)
}

object QRunnerUpCell {
  def compute(e: ArrayData, cs: Array[Array[Long]], cids: Array[Int]): Int = {
    val n = e.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (e.isNullAt(i)) throw new IllegalArgumentException(
        s"qrunnerup_cell requires non-null components, found null at index $i")
      q(i) = math.floor(e.getFloat(i).toDouble * 1e7).toLong
      i += 1
    }
    // track the two smallest (d, cid) pairs under the same total order
    // QArgminCell uses — the runner-up is the rn=2 row of the oracle
    var bestD = Long.MaxValue
    var bestCid = Int.MaxValue
    var secD = Long.MaxValue
    var secCid = Int.MaxValue
    var c = 0
    while (c < cs.length) {
      val cent = cs(c)
      if (cent.length != n) throw new IllegalArgumentException(
        s"qrunnerup_cell centroid $c has ${cent.length} dims, vector has $n")
      var d = 0L
      var j = 0
      while (j < n) {
        val diff = q(j) - cent(j)
        d += diff * diff
        j += 1
      }
      val cid = cids(c)
      if (d < bestD || (d == bestD && cid < bestCid)) {
        secD = bestD; secCid = bestCid
        bestD = d; bestCid = cid
      } else if (d < secD || (d == secD && cid < secCid)) {
        secD = d; secCid = cid
      }
      c += 1
    }
    secCid
  }

  /** Column wrapper: runner-up cell id for `embCol` against driver-side
    * (cid, grid-point centroid) pairs. */
  def of(embCol: String, centroids: Array[(Int, Array[Long])]): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      QRunnerUpCell(UnresolvedAttribute(embCol),
        centroids.map(_._2), centroids.map(_._1)))
}
