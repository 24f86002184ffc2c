package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst cosine similarity over two ARRAY<FLOAT> columns.
  *
  * Semantics are identical to [[graft.functions.VectorFunctions.cosineUdf]]
  * (double accumulation, dot over the common prefix, norms over each
  * full array, 0.0 for a zero vector — reference brute_force.py:8-16):
  * same operation order, so results are bitwise equal on null-free
  * arrays. NULL *elements* (legal in ARRAY<FLOAT> with
  * containsNull=true, e.g. any parquet-read embedding column) are
  * treated as 0.0 in both eval and codegen — the UDF cannot accept them
  * at all (Catalyst's Seq[Float] conversion rejects null elements), so
  * a defined zero-contribution is the only total semantics available.
  *
  * Why an Expression and not a UDF: the generated code reads floats
  * straight out of the columnar/UnsafeArrayData buffers inside the
  * whole-stage-codegen loop — no Row→Scala deserialization, no boxing,
  * no closure serialization per task. On the brute-force scan this is
  * the difference between a memory-bandwidth-bound scan and an
  * allocation-bound one at 100 TB.
  */
case class CosineSimilarity(left: Expression, right: Expression)
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
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    @inline def elem(arr: ArrayData, i: Int): Double =
      if (arr.isNullAt(i)) 0.0 else arr.getFloat(i).toDouble
    var dot = 0.0
    var i = 0
    while (i < n) { dot += elem(x, i) * elem(y, i); i += 1 }
    var na = 0.0
    i = 0
    while (i < nx) { val v = elem(x, i); na += v * v; i += 1 }
    var nb = 0.0
    i = 0
    while (i < ny) { val v = elem(y, i); nb += v * v; i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |final int $n = java.lang.Math.min($nx, $ny);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ($a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i))
         |        * ($b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i));
         |}
         |double $na = 0.0;
         |for (int $i = 0; $i < $nx; $i++) {
         |  final double $v = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i); $na += $v * $v;
         |}
         |double $nb = 0.0;
         |for (int $i = 0; $i < $ny; $i++) {
         |  final double $v = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i); $nb += $v * $v;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    SqlShims.column(CosineSimilarity(SqlShims.expression(a), SqlShims.expression(b)))

  /** Register `cosine_similarity(a, b)` for Spark SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs.head, exprs(1)), "scala_udf")
}
