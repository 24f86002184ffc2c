package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the lakehouse clustering technique that makes min/max file skipping
  * work on TWO filter columns at once: sorting by the interleaved key
  * places rows close in (a, b) space close on disk, so a scan with
  * predicates on either or both columns prunes most files by their
  * zkey range. A single-column sort gives perfect pruning on that
  * column and none on the other; Z-order trades a little of each for
  * useful pruning on both — at 100 TB this is the difference between
  * touching a few percent of files and a full scan for the second
  * dimension.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative BIGINT columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure
    * Column arithmetic — the 2·bits shift-mask-add terms are one fused
    * codegen expression, evaluated in the scan (no UDF, no shuffle);
    * the terms occupy disjoint bits so `+` is `|`. Values must fit in
    * `bits` bits (callers quantize first); the result fits in 2·bits.
    */
  def zKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Plain-Scala twin of [[zKey]] for specs and driver-side checks. */
  private[graft] def zKeyScala(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc + (((a >>> i) & 1L) << (2 * i)) + (((b >>> i) & 1L) << (2 * i + 1))
    }
}
