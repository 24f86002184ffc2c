package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Column interleave must equal the plain-Scala twin bit-for-bit,
  * and the point of the layout — fewer storage buckets touched for a
  * second-dimension predicate than a row-major sort — is quantified on
  * a full 32×32 grid rather than asserted rhetorically.
  */
class ZOrderSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("Column zKey == plain-Scala interleave over the full 16x16 grid") {
    val grid = (for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)).toDF("a", "b")
    val got = grid.select($"a", $"b", ZOrder.zKey($"a", $"b", 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ZOrder.zKeyScala(a, b, 8), s"($a,$b)")
    }
    // interleave is a bijection on the grid
    assert(got.map(_._3).distinct.length == 256)
  }

  test("z-order layout prunes a second-dimension slice; row-major cannot") {
    // 32x32 grid of (x, y) cells, 16 storage buckets of 64 cells each.
    // Layout A: files cut along the z-order curve (zkey >> 6).
    // Layout B: files cut along row-major order ((x*32 + y) >> 6).
    val cells = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    def zBuckets(q: ((Long, Long)) => Boolean) =
      cells.filter(q).map { case (x, y) => ZOrder.zKeyScala(x, y, 5) >> 6 }.distinct.size
    def rowBuckets(q: ((Long, Long)) => Boolean) =
      cells.filter(q).map { case (x, y) => (x * 32 + y) >> 6 }.distinct.size
    // y-slice query (all x, y in [8, 11]): row-major scatters y across
    // every file — zero pruning; z-order confines it
    val ySlice = (c: (Long, Long)) => c._2 >= 8 && c._2 <= 11
    assert(rowBuckets(ySlice) == 16, "row-major reads EVERY bucket for a y-slice")
    assert(zBuckets(ySlice) <= 8, s"z-order should confine the y-slice, got ${zBuckets(ySlice)}")
    // x-slice: row-major is ideal (contiguous); z-order must still
    // prune to at most half the buckets — the documented trade
    val xSlice = (c: (Long, Long)) => c._1 >= 8 && c._1 <= 11
    assert(rowBuckets(xSlice) == 2)
    assert(zBuckets(xSlice) <= 8)
    // rectangle on BOTH dims: z-order beats row-major
    val rect = (c: (Long, Long)) => c._1 >= 8 && c._1 <= 15 && c._2 >= 8 && c._2 <= 15
    assert(zBuckets(rect) < rowBuckets(rect),
      s"z ${zBuckets(rect)} vs row ${rowBuckets(rect)}")
  }
}
