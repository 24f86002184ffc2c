package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst nearest-centroid assignment over an ARRAY<FLOAT>
  * column against a driver-inlined centroid matrix — the codegen'd
  * replacement for the k-struct `zip_with`/`aggregate`/`array_min`
  * Column stack: higher-order functions never enter WholeStageCodegen
  * and re-allocate a lambda frame per element, which made the
  * interpreted form the bottleneck of the cluster-blocked operators
  * once k grew past the gate's k=8 (measured 10.2 s -> sub-second on
  * the 64-cluster DedupProbe corpus).
  *
  * Bit-identical semantics to the Column form it replaces: per center
  * (ascending cid), squared-L2 accumulated in doubles over ascending
  * component index; strict `<` keeps the FIRST minimum, matching the
  * (dist, cid) struct-min lexicographic tie-break. A NULL element
  * SKIPS its term entirely — the same semantics as the DuckDB
  * replay, where the unnested NULL component makes its (x-c)^2 term
  * NULL and SUM drops it (fixture vectors carry no NULL elements,
  * but the type checker admits containsNull arrays, so the two
  * engines must agree on them). A NULL array yields NULL (callers
  * filter `isNotNull` first).
  */
case class NearestCentroid(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centers.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires at least one centroid")
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<FLOAT> input, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(a: Any): Any =
    NearestCentroid.compute(a.asInstanceOf[ArrayData], centers)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.NearestCentroid.compute($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {

  /** Shared by eval and the generated code (Scala object static
    * forwarders keep the call codegen-safe).
    */
  def compute(v: ArrayData, cs: Array[Array[Double]]): Long = {
    var best = Double.PositiveInfinity
    var bestC = 0
    var c = 0
    while (c < cs.length) {
      val cen = cs(c)
      val n = math.min(v.numElements(), cen.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        // NULL element -> term skipped, matching the SQL replay where
        // SUM drops the NULL (x - c)^2 row
        if (!v.isNullAt(i)) {
          val d = v.getFloat(i).toDouble - cen(i)
          acc += d * d
        }
        i += 1
      }
      if (acc < best) { best = acc; bestC = c }
      c += 1
    }
    bestC.toLong
  }

  /** Column-level entry point. */
  def apply(v: Column, centers: Array[Array[Double]]): Column =
    SqlShims.column(NearestCentroid(SqlShims.expression(v), centers))
}
