package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for the 8-plane sign-random-projection
  * LSH bucket of a float vector.
  *
  * Semantically identical to the HOF formulation in
  * [[graft.sim.Similarity.annLshBuckets]] (plane p's sign for dimension
  * i is the low bit of the first 8 md5 hex chars of "p_i"; bucket bit p
  * is set iff the signed sum of 1e-7-quantized components is strictly
  * positive) — the DuckDB oracle keeps verifying that form. The HOF
  * tree recomputes the md5-derived sign for every (row, plane, dim)
  * triple even though it is a constant of (plane, dim); this expression
  * reads the signs from a JVM-wide precomputed matrix.
  */
case class SrpSig(child: Expression, planes: Int = 8) extends UnaryExpression {

  require(planes >= 1 && planes <= SrpSig.MaxPlanes,
    s"srp_sig supports 1..${SrpSig.MaxPlanes} planes, got $planes")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_sig requires array<float>, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SrpSig.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpSig.compute($c, $planes);")

  override protected def withNewChildInternal(newChild: Expression): SrpSig =
    copy(child = newChild)
}

/** 64-plane variant of [[SrpSig]] producing a LONG signature — the raw
  * material for banded LSH (split into b bands of r bits with shift/mask;
  * near-duplicate recall at a given cosine is 1-(1-p^r)^b, tunable where
  * a single monolithic bucket's p^planes is not). Plane p's sign for
  * dimension i is the SAME md5("p_i") rule as [[SrpSig]], so bits 0..15
  * of this signature equal the 16-plane [[SrpSig]] bucket (spec-asserted).
  */
case class SrpSig64(child: Expression, planes: Int = 64) extends UnaryExpression {

  require(planes >= 1 && planes <= SrpSig.MaxSignPlanes,
    s"srp_sig64 supports 1..${SrpSig.MaxSignPlanes} planes, got $planes")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_sig64 requires array<float>, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SrpSig.computeLong(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpSig.computeLong($c, $planes);")

  override protected def withNewChildInternal(newChild: Expression): SrpSig64 =
    copy(child = newChild)
}

object SrpSig64 {
  def of(embedding: Column, planes: Int = 64): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(SrpSig64(b.toExpression(embedding), planes))
  }
}

object SrpSig {
  val MaxPlanes = 16
  /** Sign-matrix depth — the ceiling for [[SrpSig64]]. */
  val MaxSignPlanes = 64
  val MaxDims = 1024

  /** sign(p)(i-1) for dimension i (1-based in the HOF form): +1 iff the
    * low bit of the first 4 md5 bytes of "p_i" is 1. Built once per JVM. */
  private lazy val signs: Array[Array[Byte]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(MaxSignPlanes) { p =>
      val row = new Array[Byte](MaxDims)
      var i = 1
      while (i <= MaxDims) {
        md.reset()
        val d = md.digest(s"${p}_$i".getBytes(StandardCharsets.UTF_8))
        // low bit of the 32-bit value = low bit of the 4th byte
        row(i - 1) = if ((d(3) & 1) == 1) 1 else -1
        i += 1
      }
      row
    }
  }

  def compute(emb: ArrayData, planes: Int): Int =
    computeLong(emb, planes).toInt

  def computeLong(emb: ArrayData, planes: Int): Long = {
    val n = emb.numElements()
    // fail loudly instead of silently hashing a truncated vector (the
    // bucket would diverge from the HOF/oracle form)
    if (n > MaxDims) throw new IllegalArgumentException(
      s"srp_sig sign matrix covers $MaxDims dims, embedding has $n")
    var bucket = 0L
    var p = 0
    var i0 = 0
    while (i0 < n) {
      // null components are refused loudly (the HOF twin would NULL the
      // plane sum; silently reading the slot as 0.0 would diverge)
      if (emb.isNullAt(i0)) throw new IllegalArgumentException(
        s"srp_sig requires non-null components, found null at index $i0")
      i0 += 1
    }
    while (p < planes) {
      val row = signs(p)
      var acc = 0L
      var i = 0
      while (i < n) {
        val q = math.floor(emb.getFloat(i).toDouble * 1e7).toLong
        acc += (if (row(i) == 1) q else -q)
        i += 1
      }
      if (acc > 0L) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  /** Column wrapper. */
  def of(embedding: Column, planes: Int = 8): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(SrpSig(b.toExpression(embedding), planes))
  }
}
