package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for distinct word n-gram shingles of a
  * token array.
  *
  * Semantically identical to the HOF formulation in
  * [[graft.text.TextOps.shinglesE]] (`array_distinct(transform(
  * sequence(1, len-2), i -> tok(i) || ' ' || tok(i+1) || ' ' ||
  * tok(i+2)))`, empty below n tokens) including array_distinct's
  * first-occurrence ordering — the DuckDB oracle keeps verifying the
  * HOF semantics. The HOF tree interprets one lambda frame and builds
  * one concat expression per shingle; this emits them in a single
  * compiled pass over UTF8String slices with a LinkedHashSet dedup.
  *
  * `dedup = false` emits every n-gram occurrence in order instead
  * (the multiset the frequency/heavy-hitter accounting ops count) —
  * same compiled pass, minus the set.
  */
case class WordShingles(child: Expression, n: Int = 3, dedup: Boolean = true)
  extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n, dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n, $dedup);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, n: Int, dedup: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val count = len - n + 1
    val seen: java.util.Collection[UTF8String] =
      if (dedup) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](count)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // tokenizers never emit null tokens; refuse loudly rather than
        // replicate the HOF's null-shingle propagation
        if (tokens.isNullAt(i + j)) throw new IllegalArgumentException(
          s"word_shingles requires non-null tokens, found null at index ${i + j}")
        parts(j) = tokens.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def of(tokens: Column, n: Int = 3, dedup: Boolean = true): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(WordShingles(b.toExpression(tokens), n, dedup))
  }
}
