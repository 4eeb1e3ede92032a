package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the 32-bit SimHash of a token array.
  *
  * Semantically identical to the HOF formulation in
  * [[graft.text.TextOps.dedupSimhashPairs]] (bit j set iff
  * sum over tokens of ±1 by token-hash bit j is positive, token hash =
  * first 8 md5 hex chars as an integer) — the DuckDB oracle keeps
  * verifying that form. The HOF expression tree re-evaluates the
  * md5-per-token array once per bit position (32× the hashing work) and
  * interprets ~32·n lambda frames; this computes each token's md5 once
  * and accumulates all 32 bit counters in a single pass.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes as an unsigned 32-bit value — identical to
    * conv(substr(md5(t),1,8),16,10). */
  def compute(tokens: ArrayData): Long = {
    val md = digests.get()
    val n = tokens.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        // HOF twin: md5(null) -> null, the null bit test falls to the
        // else branch -> every counter decrements
        var j = 0
        while (j < 32) { counts(j) -= 1; j += 1 }
      } else {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Column wrapper over a tokens Column. */
  def of(tokens: Column): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(SimHashSig(b.toExpression(tokens)))
  }
}
