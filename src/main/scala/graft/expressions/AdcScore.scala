package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Native Catalyst ADC (asymmetric distance computation) score of one
  * PQ code against a per-query lookup table — the scoring expression
  * [[graft.plans.LshProbeRewrite]] substitutes for
  * `cosine_similarity(embedding, q)` when the registered index kind is
  * PQ (r14 verdict #4: ADC needs a SCORING rewrite, not a probe
  * filter). The `lut` is built driver-side at rewrite time from the
  * registered codebooks and the literal query
  * ([[graft.index.PqKnn.adcTable]]: lut(s)(c) = dot(q_s, centroid_{s,c})
  * over the L2-normalized query), so the expression is a pure function
  * of the code bytes — m array lookups + adds per row, vs dim
  * multiplies for the exact dot. Accumulation order and arithmetic are
  * identical to [[graft.index.PqKnn.adcScore]], so the rewrite's
  * shortlist is bit-equal to the hand-built ADC search's.
  *
  * Same Expression-not-UDF rationale as [[CosineSimilarity]]: the
  * generated code reads the code bytes straight out of the UnsafeRow
  * buffer inside whole-stage codegen — no boxing, no closure, and the
  * ~16 KB lut rides the codegen references array once per task, not
  * per row.
  */
case class AdcScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY code column, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_score"

  override def nullSafeEval(code: Any): Any = {
    val c = code.asInstanceOf[Array[Byte]]
    var acc = 0.0
    var s = 0
    val m = math.min(c.length, lut.length)
    while (s < m) { acc += lut(s)(c(s) & 0xFF); s += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("adcLut", lut, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      s"""
         |double $acc = 0.0;
         |final int $m = java.lang.Math.min($c.length, $lutRef.length);
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $lutRef[$s][$c[$s] & 0xFF];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
