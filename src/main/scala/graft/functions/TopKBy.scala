package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a custom aggregate: keeps the k largest
  * (value, tag) pairs per group in a bounded buffer, mergeable across
  * partitions.
  *
  * Versus the window formulation
  * (`row_number().over(partitionBy(g).orderBy(desc(v))) <= k`): Spark
  * 3.5+ already infers a partial WindowGroupLimit, so the window form
  * also ships ≤k rows per (map partition, group) — but it must SORT
  * each map partition on (group, value) to do so, and re-sort after the
  * shuffle. This aggregate replaces both sorts with O(n log k) heap
  * maintenance inside a hash aggregation, and composes with any other
  * aggregates in the same pass. The bounded-heap pattern a dedicated
  * top-k physical operator would implement, expressed at the (b) tier
  * of SURVEY §7.3 (custom aggregate function) rather than a SparkPlan.
  *
  * Ordering: larger value wins; ties broken by SMALLER tag (matches
  * `orderBy(desc(value), asc(tag))`), so results are deterministic.
  * Null value or tag rows are skipped. Output: array<struct<v, tag>>
  * best-first.
  */
case class TopKBy(
    value: Expression,
    tag: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBy.Buf] {

  require(k > 0, "topk_by requires k > 0")

  override def children: Seq[Expression] = Seq(value, tag)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKBy.outType

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, tag.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by requires (double, bigint), got $other")
    }

  override def createAggregationBuffer(): TopKBy.Buf = new TopKBy.Buf(k)

  override def update(buf: TopKBy.Buf, input: InternalRow): TopKBy.Buf = {
    val v = value.eval(input)
    val t = tag.eval(input)
    if (v != null && t != null)
      buf.offer(v.asInstanceOf[Double], t.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBy.Buf, other: TopKBy.Buf): TopKBy.Buf = {
    other.foreach((v, t) => buf.offer(v, t))
    buf
  }

  override def eval(buf: TopKBy.Buf): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (v, t) =>
      InternalRow(v, t)
    }.toArray[Any])
  }

  override def serialize(buf: TopKBy.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (v, t) => out.writeDouble(v); out.writeLong(t) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBy.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBy.Buf(k)
    var i = 0
    while (i < n) { buf.offer(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(value = newChildren(0), tag = newChildren(1))
}

object TopKBy {
  val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("tag", LongType, nullable = false))),
    containsNull = false)

  /** Better = larger v, then smaller tag. */
  private def better(v1: Double, t1: Long, v2: Double, t2: Long): Boolean = {
    val c = java.lang.Double.compare(v1, v2)
    c > 0 || (c == 0 && t1 < t2)
  }

  /** Bounded buffer: a binary heap with the WORST pair at the root
    * (so a full-buffer insert is one root compare + O(log k) sift,
    * allocation-free). */
  final class Buf(k: Int) {
    private val vs = new Array[Double](k)
    private val ts = new Array[Long](k)
    private var n = 0

    def size: Int = n

    def offer(v: Double, t: Long): Unit =
      if (n < k) {
        vs(n) = v; ts(n) = t; n += 1
        siftUp(n - 1)
      } else if (better(v, t, vs(0), ts(0))) {
        vs(0) = v; ts(0) = t
        siftDown(0)
      }

    // invariant: a parent is worse than (or equal to) its children
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (better(vs(p), ts(p), vs(i), ts(i))) { swap(i, p); i = p }
        else return
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val v = vs(a); vs(a) = vs(b); vs(b) = v
      val t = ts(a); ts(a) = ts(b); ts(b) = t
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var worst = i
        if (l < n && better(vs(worst), ts(worst), vs(l), ts(l))) worst = l
        if (r < n && better(vs(worst), ts(worst), vs(r), ts(r))) worst = r
        if (worst == i) done = true
        else { swap(i, worst); i = worst }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(vs(i), ts(i)); i += 1 }
    }

    def sortedBestFirst: Seq[(Double, Long)] = {
      val pairs = (0 until n).map(i => (vs(i), ts(i)))
      pairs.sortWith { case ((v1, t1), (v2, t2)) => better(v1, t1, v2, t2) }
    }
  }

  /** Column wrapper: topk_by(value, tag, k) over computed columns. */
  def of(value: Column, tag: Column, k: Int): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(TopKBy(b.toExpression(value), b.toExpression(tag), k)
      .toAggregateExpression())
  }
}
