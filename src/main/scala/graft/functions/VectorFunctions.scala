package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT> embedding columns.
  *
  * Mirrors the reference's vector kernel (cosine scoring over
  * pre-normalizable vectors): `_unit` at reference
  * app/indexing/brute_force.py:8-11 (zero vector returned unchanged, so
  * its cosine against anything is 0 — no NaN) and `_dot` at
  * app/indexing/brute_force.py:14-16.
  *
  * All math is done in Double (the reference casts to float64 at
  * app/services/search_service.py:47). The hot-path scorer is a Scala
  * UDF with a tight while-loop over the array — measured faster than the
  * higher-order-function formulation (`aggregate(zip_with(..))`) on
  * 64-d vectors, and identical numerically. A codegen'd Catalyst
  * Expression variant lives in [[graft.expressions]] for the scale
  * path.
  */
object VectorFunctions {

  /** Force O(1) indexing: a UDF's Seq[Float] can arrive as a LinearSeq
    * (List) depending on the upstream deserializer, where `a(i)` is
    * O(i) — a silent O(n²)-per-row trap on the hot path. One bulk copy
    * beats n² pointer hops everywhere below.
    */
  @inline private[graft] def toArr(a: collection.Seq[Float]): Array[Float] = a match {
    case w: scala.collection.mutable.ArraySeq.ofFloat => w.array
    case w: scala.collection.immutable.ArraySeq.ofFloat => w.unsafeArray
    case other => other.toArray
  }

  @inline private def dotD(a0: collection.Seq[Float], b0: collection.Seq[Float]): Double = {
    val a = toArr(a0); val b = toArr(b0)
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  @inline private def normD(a0: collection.Seq[Float]): Double = {
    val a = toArr(a0)
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  /** cosine(a, b) in double precision; 0.0 when either side is the zero
    * vector (reference semantics: zero vectors are never normalized).
    */
  val cosineUdf = udf { (a: collection.Seq[Float], b: collection.Seq[Float]) =>
    if (a == null || b == null) null.asInstanceOf[java.lang.Double]
    else {
      val na = normD(a); val nb = normD(b)
      if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
      else java.lang.Double.valueOf(dotD(a, b) / (na * nb))
    }
  }

  /** dot(a, b) in double precision (cosine when both sides are already
    * unit-normalized — the reference normalizes at index build,
    * app/indexing/brute_force.py:29-30, so query-time cost is one dot).
    */
  val dotUdf = udf { (a: collection.Seq[Float], b: collection.Seq[Float]) =>
    if (a == null || b == null) null.asInstanceOf[java.lang.Double]
    else java.lang.Double.valueOf(dotD(a, b))
  }

  /** L2-normalize; the zero vector is returned unchanged
    * (app/indexing/brute_force.py:10-11). Normalize-on-write is the
    * scale-path optimization the reference misses: it re-normalizes the
    * whole corpus on every query because it rebuilds the index per query.
    */
  /** Row-side L2 normalize on a primitive array — THE single
    * definition every quantizer/evaluator/UDF shares, so their
    * normalization can never drift a bit apart. Zero vector returned
    * unchanged. */
  def l2NormalizeArr(a: Array[Float]): Array[Float] = {
    val n = normD(a)
    if (n == 0.0) a
    else {
      val out = new Array[Float](a.length)
      var i = 0
      while (i < a.length) { out(i) = (a(i).toDouble / n).toFloat; i += 1 }
      out
    }
  }

  val l2NormalizeUdf = udf { (a0: collection.Seq[Float]) =>
    if (a0 == null) null else l2NormalizeArr(toArr(a0))
  }

  /** Primary scorer: the codegen'd native Catalyst expression
    * ([[graft.expressions.CosineSimilarity]]); bitwise-equal to
    * [[cosineUdf]] but reads floats straight from columnar buffers
    * inside whole-stage codegen.
    */
  def cosine(a: Column, b: Column): Column = graft.expressions.CosineSimilarity(a, b)
  def dot(a: Column, b: Column): Column = dotUdf(a, b)
  def l2Normalize(a: Column): Column = l2NormalizeUdf(a)

  /** Sparse random projection to `outDim` dims (Achlioptas 2003 — the
    * database-friendly Johnson–Lindenstrauss transform): R(i,j) ∈
    * {+1, −1, 0} with P = {1/6, 1/6, 2/3}, scaled by sqrt(3/outDim) so
    * norms (hence distances) are preserved in expectation. The matrix
    * is never STORED: entry (i,j) is a pure function of
    * floorMod(splitmix64(j·srcDim + i), 6) — any executor (and the
    * DuckDB oracle) regenerates any entry independently, so the op is
    * a row-local map with zero shuffle and zero broadcast, the shape
    * that lets a 100 TB corpus be projected in the scan itself (e.g.
    * to cheapen a downstream ANN build or near-dup pass). Returns
    * ARRAY<DOUBLE>; null in, null out.
    */
  def randomProject(outDim: Int) = udf { (v: collection.Seq[Float]) =>
    if (v == null) null
    else {
      val srcDim = v.length
      val scale = math.sqrt(3.0 / outDim)
      Array.tabulate(outDim) { j =>
        var s = 0.0
        var i = 0
        while (i < srcDim) {
          val r = java.lang.Math.floorMod(
            graft.functions.TextFunctions.splitmix64(j.toLong * srcDim + i), 6L)
          if (r == 0L) s += v(i) else if (r == 1L) s -= v(i)
          i += 1
        }
        s * scale
      }
    }
  }

  /** Pure-Catalyst (whole-stage-codegen-friendly) cosine built from
    * higher-order functions — no UDF, usable where serialization of the
    * UDF closure is undesirable. Numerically identical (double math).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val dotP = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dotP / (na * nb))
  }
}
