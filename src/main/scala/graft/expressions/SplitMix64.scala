package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst splitmix64 over a BIGINT column — the codegen'd
  * twin of [[graft.functions.TextFunctions.samplingBucket]]'s private
  * scrambler (Steele/Lea/Flood 2014, the `java.util.SplittableRandom`
  * mixer; public-domain constants).
  *
  * Exists for the hot path where the hash IS the shuffle/order key
  * ([[graft.pipeline.TrainingOps.shuffleShard]]): a Scala UDF there
  * would box every id of the corpus and fence whole-stage codegen
  * right at the exchange that dominates the job. This stays inside
  * the codegen span: three multiply-xor-shift lines on an unboxed
  * long. Java long arithmetic wraps (no ANSI overflow check applies
  * to the generated code), exactly the semantics the hash needs.
  *
  * Deterministic in the input — no seed, no partition state — so the
  * derived ordering is reproducible across runs, partitionings and
  * cluster sizes, and the DuckDB oracle replays it bit-exactly with
  * the HUGEINT smix ladder (OracleHashSql.smix).
  */
case class SplitMix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "splitmix64"

  override def nullSafeEval(input: Any): Any = {
    var x = input.asInstanceOf[Long] + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val x = ctx.freshName("x")
      s"""
         |long $x = $c + 0x9E3779B97F4A7C15L;
         |$x = ($x ^ ($x >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$x = ($x ^ ($x >>> 27)) * 0x94D049BB133111EBL;
         |${ev.value} = $x ^ ($x >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SplitMix64 {
  /** Column-level entry point. */
  def apply(c: Column): Column = SqlShims.column(SplitMix64(SqlShims.expression(c)))
}
