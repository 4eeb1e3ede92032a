package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving as pure column arithmetic — the
  * multi-dimensional clustering key behind "z-ordered" table layouts.
  *
  * Why it matters at 100 TB: a table can only be RANGE-sorted on one
  * axis. Sorting the files by `a` makes predicates on `a` prune almost
  * everything and predicates on `b` prune NOTHING (every file spans the
  * full `b` domain). Interleaving the bits of both columns and range-
  * partitioning on the interleaved value gives every file a small
  * rectangle of (a, b) space, so Parquet min/max footer stats prune
  * ~sqrt-of-files for a predicate on EITHER axis — the standard layout
  * trade for fact tables filtered on two independent dimensions (date ×
  * customer, tenant × time). Pure shifts/masks, fully codegen'd; no
  * custom expression needed.
  *
  * Inputs are non-negative 32-bit surrogates (dictionary ranks, epoch
  * minutes, bucketed ids) — the caller maps raw values onto them, same
  * contract as any space-filling-curve layout tool.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` onto the even bit positions of a
    * 64-bit value (classic magic-mask doubling). */
  private def spread(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val v4 = v3.bitwiseOR(shiftleft(v3, 2)).bitwiseAND(lit(0x3333333333333333L))
    v4.bitwiseOR(shiftleft(v4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two non-negative 32-bit columns: bit i of
    * `a` lands at position 2i, bit i of `b` at position 2i+1. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Plain-Scala reference for the spec. */
  private[graft] def zValueRef(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a.toLong >> i) & 1L) << (2 * i)
      z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
