package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for winnowing document fingerprints
  * (the MOSS scheme: Schleimer/Wilkerson/Aiken, SIGMOD'03): Rabin-Karp
  * ROLLING hashes over character k-grams, then the minimum hash of each
  * sliding window of w consecutive k-gram hashes, deduplicated and
  * sorted. Guarantees of winnowing: any shared substring of length
  * >= k + w - 1 between two documents yields at least one shared
  * fingerprint, so matching fingerprints localize copied passages —
  * the classic document-fingerprinting primitive (vs the whole-document
  * md5 identity in `doc_fingerprint`, which only finds exact clones).
  *
  * Hash definition (shared EXACTLY with the HOF twin
  * [[graft.text.TextOps.winnowFpHofE]] and the DuckDB oracle):
  * h(i) = sum_{j=0..k-1} cp(i+j) * B^(k-1-j) mod M over character CODE
  * POINTS, B = 257, M = 1e9+7 (Horner form, mod each step — no 64-bit
  * overflow: h < 1e9, h*B + cp < 2.6e11). Windows: if the document has
  * m = numChars - k + 1 k-grams, windows are hs[t..t+w-1] for
  * t = 1..m-w+1; 0 < m <= w degenerates to one whole-list window;
  * m <= 0 (document shorter than k chars) yields no fingerprints.
  * Output is the SORTED DISTINCT fingerprint array — a canonical form,
  * so the HOF twin is bit-comparable and downstream explode+distinct
  * is already deduplicated per document.
  *
  * One compiled O(numChars) pass: the k-gram hash rolls
  * (h*B + cp_in - cp_out*B^(k-1), positive-mod corrected) instead of
  * re-walking k characters per position, and window minima come from a
  * monotonic ring-buffer deque — each hash enters and leaves the deque
  * at most once. The HOF formulation interprets O(k) lambda frames per
  * character plus O(w) per window; this allocates one int ring buffer
  * and one long deque regardless of document size.
  *
  * Code points are decoded straight from the UTF8String bytes (standard
  * UTF-8, matching DuckDB's `unicode(substr(text, i, 1))` on any input;
  * the HOF twin's `ascii()` agrees on ASCII text, which is what the
  * corpus and spec fixtures contain).
  */
case class WinnowFp(child: Expression,
                    k: Int = WinnowFp.DefaultK,
                    w: Int = WinnowFp.DefaultW) extends UnaryExpression {

  require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires string, got $other")
  }

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WinnowFp.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFp.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {
  /** char 8-grams; with w=4, shared substrings of >= 11 chars (~2 words)
    * are guaranteed a shared fingerprint. */
  val DefaultK = 8
  /** window of 4 k-gram hashes → keeps ~1/w of positions, 2.5 bits/char
    * of fingerprint density. */
  val DefaultW = 4
  /** Rabin-Karp base: a prime just above the byte range. */
  val B = 257L
  /** Modulus 1e9+7: prime, and B*M + maxCodePoint stays far below 2^63. */
  val M = 1000000007L

  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length

    // B^(k-1) mod M for the roll-out term
    var bk1 = 1L
    var p = 1
    while (p < k) { bk1 = bk1 * B % M; p += 1 }

    // ring buffer of the last k code points (for the outgoing term)
    val ring = new Array[Int](k)
    // monotonic deque of (hash, position) over the last w hashes,
    // increasing hash values front to back; parallel ring-buffered
    // arrays of capacity w+1 (tail exclusive, empty when head == tail —
    // holds at most w entries because the front drops BEFORE each push)
    val dqHash = new Array[Long](w + 1)
    val dqPos = new Array[Int](w + 1)
    var dqHead = 0
    var dqTail = 0 // exclusive; empty when head == tail

    val minima = new java.util.TreeSet[java.lang.Long]()
    var lastWholeMin = Long.MaxValue // for the m <= w degenerate case

    var h = 0L
    var nCp = 0 // code points decoded so far
    var m = 0 // k-gram hashes emitted so far
    var i = 0
    while (i < nBytes) {
      // decode one UTF-8 code point; a multi-byte sequence truncated at
      // end of input (reachable via cast(binary as string) or corrupt
      // data) must degrade gracefully — stop at the partial character
      // instead of reading past the array (UTF8String.numChars tolerates
      // malformed tails the same way)
      val b0 = bytes(i) & 0xff
      val seqLen = if (b0 < 0x80) 1 else if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
      if (i + seqLen > nBytes) { i = nBytes }
      else {
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xe0) { cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); i += 2 }
      else if (b0 < 0xf0) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        i += 4
      }

      // roll the hash: drop the code point leaving the k-window (if full)
      if (nCp >= k) {
        val out = ring(nCp % k)
        h = (h - out * bk1 % M + M) % M
      }
      ring(nCp % k) = cp
      h = (h * B + cp) % M
      nCp += 1

      if (nCp >= k) {
        // hash for k-gram position m (0-based)
        if (h < lastWholeMin) lastWholeMin = h
        // drop the front if it slid out of the window [m-w+1, m] —
        // BEFORE pushing, so the deque never exceeds w entries
        if (dqHead != dqTail && dqPos(dqHead) <= m - w)
          dqHead = (dqHead + 1) % (w + 1)
        // pop larger-or-equal from the back (ties don't matter: we emit
        // VALUES, and equal values produce the same minimum)
        while (dqHead != dqTail &&
          dqHash((dqTail - 1 + (w + 1)) % (w + 1)) >= h) {
          dqTail = (dqTail - 1 + (w + 1)) % (w + 1)
        }
        dqHash(dqTail) = h
        dqPos(dqTail) = m
        dqTail = (dqTail + 1) % (w + 1)
        // a full window ends at every position m >= w-1
        if (m >= w - 1) minima.add(dqHash(dqHead))
        m += 1
      }
      }
    }

    if (m == 0) return new GenericArrayData(Array.empty[Any])
    if (m <= w) return new GenericArrayData(Array[Any](lastWholeMin))
    val out = new Array[Any](minima.size)
    val it = minima.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def of(text: Column, k: Int = DefaultK, w: Int = DefaultW): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.toColumn(WinnowFp(b.toExpression(text), k, w))
  }
}
