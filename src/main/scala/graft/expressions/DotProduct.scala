package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two ARRAY<FLOAT> columns — the
  * accumulation loop of [[CosineSimilarity]] without the norm passes.
  *
  * Exists for pairwise scoring where the norms are join-invariant: an
  * all-pairs cosine via `CosineSimilarity` re-walks both arrays' norms
  * for every PAIR (3 loops/pair); precomputing `sqrt(DotProduct(v, v))`
  * once per ROW and dotting per pair does a third of the work at the
  * same bitwise result (each accumulator runs the same double additions
  * in the same order — see
  * [[graft.dedup.Dedup.embeddingNearDupsExact]]).
  *
  * Same totality rules as [[CosineSimilarity]]: double accumulation
  * over the common prefix, NULL elements contribute 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    @inline def elem(arr: ArrayData, i: Int): Double =
      if (arr.isNullAt(i)) 0.0 else arr.getFloat(i).toDouble
    var dot = 0.0
    var i = 0
    while (i < n) { dot += elem(x, i) * elem(y, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ($a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i))
         |        * ($b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    SqlShims.column(DotProduct(SqlShims.expression(a), SqlShims.expression(b)))
}
