package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters summary as a mergeable custom aggregate:
  * at most `k` (item, counter) entries per buffer, one pass, no shuffle
  * of the distinct-item domain — the 100 TB shape for corpus
  * token/n-gram frequency accounting, where the exact `groupBy(item)`
  * twin would shuffle billions of distinct n-grams to find the handful
  * of frequent ones.
  *
  * Guarantees (N = stream length, est(x) = 0 when absent):
  *   - `est(x) <= true(x)`  (MG only undercounts), and
  *   - `true(x) - est(x) <= N / (k+1)`,
  * so every item with `true(x) > N/(k+1)` is present in the summary.
  * Both survive arbitrary partitioning and merge order: the merge
  * (counter-wise sum, then subtract the (k+1)-th largest counter and
  * drop non-positives) is the mergeable-summaries construction of
  * Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
  * PODS'12, §3.1 — whose error adds across merges to the same N/(k+1)
  * bound. The exact counter VALUES do depend on partitioning, which is
  * why the registered query (`heavy_hitter_ngrams`) publishes the
  * provable contract over the exact side, not raw sketch state — the
  * same discipline as the HLL/percentile sketch ops.
  *
  * Output: `array<struct<item string, est bigint>>`, largest estimate
  * first, ties by item ascending. Null items are skipped.
  */
case class MisraGries(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Buf] {

  require(k > 0, "misra_gries requires k > 0")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGries.outType

  override def checkInputDataTypes(): TypeCheckResult =
    item.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a string item, got $other")
    }

  override def createAggregationBuffer(): MisraGries.Buf = new MisraGries.Buf(k)

  override def update(buf: MisraGries.Buf, input: InternalRow): MisraGries.Buf = {
    val v = item.eval(input)
    // UTF8String may alias a reused scan buffer — copy via toString
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MisraGries.Buf, other: MisraGries.Buf): MisraGries.Buf = {
    buf.absorb(other)
    buf
  }

  override def eval(buf: MisraGries.Buf): Any =
    new GenericArrayData(buf.sortedBestFirst.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.toArray[Any])

  override def serialize(buf: MisraGries.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, c) => out.writeUTF(s); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MisraGries.Buf(k)
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(item = newChildren(0))
}

object MisraGries {
  val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  /** At most `k` counters. The decrement-all step costs O(k), but each
    * decrement EVENT destroys k+1 units of stream mass, so there are at
    * most N/(k+1) events — O(N) amortized for the whole pass. */
  final class Buf(k: Int) {
    private val m = mutable.HashMap.empty[String, Long]

    def size: Int = m.size

    /** MG update: count if present; insert if room; else decrement all
      * by one (the arriving item cancels against the k counters). */
    def offer(s: String): Unit = m.get(s) match {
      case Some(c) => m.update(s, c + 1)
      case None if m.size < k => m.update(s, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (key, c) =>
          if (c == 1L) dead += key else m.update(key, c - 1)
        }
        dead.foreach(m.remove)
    }

    /** Deserialization path: trusted (item, counter) entries. */
    def put(s: String, c: Long): Unit = m.update(s, c)

    /** Mergeable-summaries merge: counter-wise sum, then if over
      * capacity subtract the (k+1)-th largest counter from every entry
      * and drop non-positives — order-insensitive error ≤ N/(k+1). */
    def absorb(other: Buf): Unit = {
      other.m.foreach { case (s, c) => m.update(s, m.getOrElse(s, 0L) + c) }
      if (m.size > k) {
        val counts = m.values.toArray
        java.util.Arrays.sort(counts)
        val v = counts(counts.length - (k + 1)) // (k+1)-th largest
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (key, c) =>
          if (c - v <= 0L) dead += key else m.update(key, c - v)
        }
        dead.foreach(m.remove)
      }
    }

    def foreach(f: (String, Long) => Unit): Unit =
      m.foreach { case (s, c) => f(s, c) }

    def sortedBestFirst: Seq[(String, Long)] =
      m.toSeq.sortWith { case ((s1, c1), (s2, c2)) =>
        c1 > c2 || (c1 == c2 && s1 < s2)
      }
  }

  /** Column wrapper: misra_gries(item, k) over a computed column. */
  def of(item: Column, k: Int): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(MisraGries(b.toExpression(item), k).toAggregateExpression())
  }
}
