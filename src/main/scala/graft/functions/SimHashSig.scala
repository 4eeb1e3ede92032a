package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the 60-bit SimHash of a token array.
  *
  * Semantically identical to the HOF formulation in
  * [[graft.text.TextOps.dedupSimhashPairs]] (bit j set iff
  * sum over tokens of ±1 by token-hash bit j is positive, token hash =
  * first 15 md5 hex chars as an integer) — the DuckDB oracle keeps
  * verifying that form. The HOF expression tree re-evaluates the
  * md5-per-token array once per bit position (60× the hashing work) and
  * interprets ~60·n lambda frames; this computes each token's md5 once
  * and accumulates all 60 bit counters in a single pass.
  *
  * WIDTH: 60 bits (not 32, not 64). The pigeonhole banding downstream
  * keys 5 blocks; 32-bit blocks carry only 6-7 bits = 64-128 distinct
  * values, which saturates at corpus sizes in the tens of thousands
  * (measured: every block bucket over the 200-doc cap at 500k docs →
  * zero candidates). 60 bits give five exact 12-bit blocks (4096
  * values each — expected occupancy 122 at 500k docs) while staying
  * inside a signed BIGINT on both engines: 64 bits would wrap negative
  * through conv()/::UBIGINT casts and the two engines disagree on the
  * wrap. This is the Manku-et-al. fingerprint design scaled to the
  * signed-long constraint.
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
  val Bits = 60

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 md5 hex chars as an unsigned 60-bit value — identical to
    * conv(substr(md5(t),1,15),16,10): bytes 0-6 in full plus the high
    * nibble of byte 7. */
  def compute(tokens: ArrayData): Long = {
    val md = digests.get()
    val n = tokens.numElements()
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        // HOF twin: md5(null) -> null, the null bit test falls to the
        // else branch -> every counter decrements
        var j = 0
        while (j < Bits) { counts(j) -= 1; j += 1 }
      } else {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
          ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
          ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
          ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
        var j = 0
        while (j < Bits) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
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
