package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the whitespace-token statistics
  * of a text column in ONE compiled pass: returns
  * `struct(n_tokens, sum_token_len, stopword_count)` (all BIGINT).
  *
  * Semantically identical to the HOF formulation kept in
  * [[graft.text.TextOps.textStatsHof]] — `size(split(trim(text),
  * '\\s+'))`, `aggregate(transform(toks, length), ...)` and
  * `size(filter(toks, IN stopwords))` — which the DuckDB oracle keeps
  * verifying. The HOF tree materializes the token array THREE times
  * (once per measure) and interprets a lambda frame per token per
  * measure; this tokenizes once over the UTF8String bytes and
  * accumulates all three counters as it goes, never allocating the
  * token array at all.
  *
  * Tokenization bit-matches Spark's `split(trim(text), '\\s+')`:
  *  - `trim` strips only ASCII space (0x20) at both ends
  *    (UTF8String.trim, same as the StringTrim default);
  *  - Java-regex `\s` is ASCII-only: [ \t\n\x0B\f\r] — multi-byte
  *    UTF-8 code points are all >= 0x80 and never match, so a
  *    byte-level scan is exact;
  *  - Spark's two-arg `split` passes limit -1, so a LEADING separator
  *    run yields an empty first token AND a trailing run yields an
  *    empty last token (unlike Java's default limit 0), and the empty
  *    string yields one empty token;
  *  - token length is in code points (UTF8String.numChars semantics:
  *    count non-continuation bytes), matching `length(t)`.
  *
  * Stopword set: the fixed 8-word list shared with the oracle SQL
  * ('the','a','of','and','to','in','is','it').
  */
case class TextStatsSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsSig.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats_sig requires string, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextStatsSig.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStatsSig =
    copy(child = newChild)
}

object TextStatsSig {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("stopword_count", LongType, nullable = false)))

  /** The shared stopword list (mirrored in the oracle SQL IN-list). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopBytes: Array[Array[Byte]] =
    Stopwords.map(_.getBytes("UTF-8")).toArray

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private def isStopword(bytes: Array[Byte], from: Int, until: Int): Boolean = {
    val len = until - from
    var w = 0
    while (w < stopBytes.length) {
      val sw = stopBytes(w)
      if (sw.length == len) {
        var i = 0
        while (i < len && bytes(from + i) == sw(i)) i += 1
        if (i == len) return true
      }
      w += 1
    }
    false
  }

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.trim().getBytes
    val n = bytes.length
    var nTokens = 0L
    var sumLen = 0L
    var stopCount = 0L

    // one field per inter-separator segment, limit -1 semantics: leading
    // and trailing whitespace runs both contribute an empty field; the
    // empty string is one empty field
    var segStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || isWs(bytes(i))) {
        // close the segment [segStart, i)
        nTokens += 1
        var cp = 0L
        var j = segStart
        while (j < i) {
          if ((bytes(j) & 0xc0) != 0x80) cp += 1
          j += 1
        }
        sumLen += cp
        if (isStopword(bytes, segStart, i)) stopCount += 1
        if (i == n) {
          i += 1 // terminate
        } else {
          // skip the whole whitespace run (separators are maximal)
          i += 1
          while (i < n && isWs(bytes(i))) i += 1
          segStart = i
          // a trailing run still owes its empty final field: the loop's
          // i == n iteration emits it because segStart == n there
        }
      } else {
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nTokens, sumLen, stopCount))
  }

  /** Column wrapper over a text Column. */
  def of(text: Column): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(TextStatsSig(b.toExpression(text)))
  }
}
