package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-REQUEST ADC lookup table as a column (the batched counterpart
  * of [[AdcScore]]'s driver-built constant LUT): for a request vector
  * column, emit the flattened `m × k` table
  * `lut[s*k + c] = dot(qn_sub_s, centroid_{s,c})` over the
  * L2-normalized request — bit-identical arithmetic and accumulation
  * order to [[graft.index.PqKnn.adcTable]], so a batched shortlist
  * ranks exactly like the per-request one. Evaluated ONCE per request
  * row on the (broadcast) request side; the per-pair work stays in
  * [[AdcScoreDyn]]'s `m` lookups.
  *
  * The codebooks ride the codegen references array once per task
  * (same rationale as [[AdcScore]]'s LUT), and the expression is a
  * pure function of the request vector — safe on a broadcast side.
  */
case class PqLut(child: Expression, cents: Array[Array[Array[Float]]],
                 subDim: Int, k: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> request vectors, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(q: Any): Any = {
    val arr = q.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // L2-normalize exactly like PqKnn.normalize (zero vector kept)
    var ss = 0.0
    var i = 0
    while (i < n) { val v = arr.getFloat(i).toDouble; ss += v * v; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](cents.length * k)
    var s = 0
    while (s < cents.length) {
      val cs = cents(s)
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var acc = 0.0
        var j = 0
        while (j < cent.length) {
          val qi = s * subDim + j
          val qv = if (qi < n) {
            val raw = arr.getFloat(qi)
            if (norm == 0.0) raw.toDouble
            else (raw / norm).toFloat.toDouble // float-rounded like PqKnn.normalize
          } else 0.0
          acc += qv * cent(j).toDouble
          j += 1
        }
        out(s * k + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  // CodegenFallback: evaluated once per REQUEST row on the small
  // broadcast side, so generated code would buy nothing — the fallback
  // keeps surrounding operators (the per-pair AdcScoreDyn loop) in
  // whole-stage codegen while this one interprets

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score of one PQ code against a PER-ROW lookup-table column
  * (the flattened `m × k` table [[PqLut]] emits) — `m` array lookups
  * and adds per (request, code) pair, the same inner loop as
  * [[AdcScore]] with the LUT read from the row instead of the codegen
  * references. This is what makes BATCHED PQ serving an ADC scan
  * rather than a decode-and-dot: the per-pair cost is 8 lookups, not
  * `dim` multiplies.
  */
case class AdcScoreDyn(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY code, ARRAY<DOUBLE> lut), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_score_dyn"

  override def nullSafeEval(code: Any, lut: Any): Any = {
    val c = code.asInstanceOf[Array[Byte]]
    val t = lut.asInstanceOf[ArrayData]
    var acc = 0.0
    var s = 0
    val m = math.min(c.length, t.numElements() / k)
    while (s < m) { acc += t.getDouble(s * k + (c(s) & 0xFF)); s += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      s"""
         |double $acc = 0.0;
         |final int $m = java.lang.Math.min($c.length, $t.numElements() / $k);
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $t.getDouble($s * $k + ($c[$s] & 0xFF));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Signed-byte dot against a per-row double-weight column — the SQ8
  * batched scoring loop ([[AdcScoreDyn]]'s sibling; SQ8's "LUT" is
  * just the scale-folded normalized request,
  * `w(d) = qn(d) * scale(d)`, so the per-pair work is one
  * multiply-add per dimension over i8 codes, never the float vector).
  * Accumulation order and signed-byte arithmetic are identical to
  * [[graft.index.SqKnn.searchEncoded]]'s inner loop, so a batched
  * shortlist ranks exactly like the per-request one.
  */
case class ByteDotDyn(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY code, ARRAY<DOUBLE> weights), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_dot_dyn"

  override def nullSafeEval(code: Any, w: Any): Any = {
    val c = code.asInstanceOf[Array[Byte]]
    val t = w.asInstanceOf[ArrayData]
    var acc = 0.0
    var d = 0
    val n = math.min(c.length, t.numElements())
    while (d < n) { acc += c(d) * t.getDouble(d); d += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      s"""
         |double $acc = 0.0;
         |final int $n = java.lang.Math.min($c.length, $t.numElements());
         |for (int $d = 0; $d < $n; $d++) {
         |  $acc += $c[$d] * $t.getDouble($d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
