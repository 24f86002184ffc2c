package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst sliding word n-grams (shingles) over a STRING
  * column — the codegen'd replacement for the Scala UDF that used to
  * sit on the dedup hot path (the UDF was itself the fix for the
  * pure-Column form re-evaluating the regex split per `element_at`;
  * this removes the remaining per-row ScalaUDF conversion and keeps
  * the shingle build inside WholeStageCodegen).
  *
  * Semantics are bit-identical to the UDF it replaces
  * ([[graft.functions.TextFunctions.wordNgramsFast]]'s contract):
  * `text.trim.split(" +").sliding(n).map(_.mkString(" "))`, with NULL
  * and fewer-than-n-token documents both yielding an EMPTY array (the
  * expression is never null — exploding callers see no rows either
  * way, array-keeping callers see a well-typed empty).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_ngrams"

  override def eval(input: InternalRow): Any =
    WordNgrams.compute(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.expressions.WordNgrams.compute(
            ${childGen.isNull} ? null : ${childGen.value}, $n);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {

  /** Shared by eval and the generated code (Scala emits a static
    * forwarder on the companion class, so generated Java calls this
    * directly). One tokenize per document; n-grams joined with a
    * single space exactly as the UDF's `mkString(" ")`.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val toks = text.toString.trim.split(" +")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point, curried to match the UDF call shape. */
  def ngrams(n: Int)(c: Column): Column =
    SqlShims.column(WordNgrams(SqlShims.expression(c), n))
}
