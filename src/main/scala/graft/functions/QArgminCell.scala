package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{TypeCheckResult, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for IVF cell assignment: the argmin over k
  * grid-quantized centroids of the exact integer L2² distance, with the
  * (distance, cid) tie-break — the d-then-cid struct ordering of the HOF
  * form ([[graft.sim.Ivf.assign]]'s previous `array_min` over
  * `transform(sequence(...))`), as one tight JVM loop per row.
  *
  * Why native: the HOF formulation evaluates interpreted — per row it
  * allocates a zipped array and ~2·dim boxed lambda frames PER CANDIDATE,
  * and the Lloyd loop runs it over the whole collection every iteration
  * plus once for the final assignment. Measured at sf0.1 (2k vectors ×
  * k=16 × 64 dims × 4 passes) the interpreted argmin dominated the whole
  * `ivf_search` query. Here the embedding quantizes ONCE into a primitive
  * array and the k·dim loop is branch-free arithmetic; the centroid
  * matrix rides along as a codegen reference object, not k expression
  * subtrees, so per-iteration Janino recompiles (fresh centroids each
  * iteration) stay small.
  *
  * Determinism: identical arithmetic to the HOF form — float→double
  * widening, ×1e7, floor, integer diffs/squares/sums (associative), and
  * the same lowest-cid-on-equal-distance tie-break the DuckDB oracle
  * mirrors with `ORDER BY d2, cell`. Magnitudes: |q| < 1e7 → diff <
  * 2e7, squares < 4e14, ×64 dims < 3e16 — no 64-bit overflow.
  *
  * Null handling: `nullIntolerant` (null embedding → null out; the
  * caller's `when`/`coalesce` routes those rows to cell -1 and keeps the
  * output schema non-nullable). Null COMPONENTS are refused loudly,
  * matching [[QDot]]'s posture — a primitive-long loop cannot represent
  * them and silently skipping would diverge from the oracle untraceably.
  */
case class QArgminCell(child: Expression,
                       centroids: Array[Array[Long]],
                       cids: Array[Int]) extends UnaryExpression {
  require(centroids.nonEmpty && centroids.length == cids.length,
    s"need one cid per centroid, got ${centroids.length} centroids / ${cids.length} cids")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qargmin_cell requires array<float>, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(e: Any): Any =
    QArgminCell.compute(e.asInstanceOf[ArrayData], centroids, cids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
    val idRef = ctx.addReferenceObj("cids", cids, "int[]")
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = graft.functions.QArgminCell.compute($e, $cRef, $idRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QArgminCell =
    copy(child = newChild)
}

object QArgminCell {
  def compute(e: ArrayData, cs: Array[Array[Long]], cids: Array[Int]): Int = {
    val n = e.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (e.isNullAt(i)) throw new IllegalArgumentException(
        s"qargmin_cell requires non-null components, found null at index $i")
      q(i) = math.floor(e.getFloat(i).toDouble * 1e7).toLong
      i += 1
    }
    var bestD = Long.MaxValue
    var bestCid = Int.MaxValue
    var c = 0
    while (c < cs.length) {
      val cent = cs(c)
      if (cent.length != n) throw new IllegalArgumentException(
        s"qargmin_cell centroid $c has ${cent.length} dims, vector has $n")
      var d = 0L
      var j = 0
      while (j < n) {
        val diff = q(j) - cent(j)
        d += diff * diff
        j += 1
      }
      if (d < bestD || (d == bestD && cids(c) < bestCid)) {
        bestD = d; bestCid = cids(c)
      }
      c += 1
    }
    bestCid
  }

  /** Column wrapper: argmin cell id for `embCol` against driver-side
    * (cid, grid-point centroid) pairs. */
  def of(embCol: String, centroids: Array[(Int, Array[Long])]): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      QArgminCell(UnresolvedAttribute(embCol),
        centroids.map(_._2), centroids.map(_._1)))
}
