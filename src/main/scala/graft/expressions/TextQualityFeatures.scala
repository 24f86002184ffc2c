package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst single-pass text-feature extractor — the codegen'd
  * replacement for the regex stack behind
  * [[graft.pipeline.TrainingOps.qualityLogit]]'s four features
  * (token count, non-space char count, stopword hits, distinct token
  * count). The Column form needs a regex tokenize, a regex
  * whitespace-strip, a higher-order filter() and an array_distinct
  * per row — and the HOF blocks whole-stage-codegen subexpression
  * elimination, so even a materialized token array leaves ~3 regex
  * passes plus two array walks (measured 41 s over the 500k probe
  * corpus). This is one code-point scan with a small hash set: same
  * outputs, no regex, no array materialization.
  *
  * Bit-identical semantics to the Column formulas it replaces (and to
  * the DuckDB oracle, which keeps the original SQL):
  *  - tokens are the ' '-separated runs of `split(trim(text), " +")`
  *    — literal space is the only separator (Spark's `trim` strips
  *    spaces only, and the corpus regex is `" +"`); an empty or
  *    all-space input yields Java split's single empty token
  *    (n_tok = 1, n_distinct = 1), exactly what Spark/DuckDB produce;
  *  - n_char counts non-space CODE POINTS (Spark's `length()` counts
  *    code points, not UTF-16 units), which equals
  *    `length(regexp_replace(trim(text), " +", ""))` on any input;
  *  - stop_hits counts every token occurrence in the dictionary
  *    (duplicates included), matching `size(filter(toks, in dict))`;
  *  - n_distinct matches `size(array_distinct(toks))` — exact string
  *    equality, duplicates collapsed, order irrelevant.
  * NULL text yields NULL (callers guard or filter).
  */
case class TextQualityFeatures(child: Expression, stopwords: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_char", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_quality_features"

  override def nullSafeEval(input: Any): Any =
    TextQualityFeatures.compute(input.asInstanceOf[UTF8String], stopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", stopwords, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextQualityFeatures.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextQualityFeatures {

  /** Shared by eval and the generated code (Scala object static
    * forwarders keep the call codegen-safe). One scan over the
    * decoded string; token substrings are allocated only for the
    * distinct set / dictionary probe, never an array of them.
    */
  def compute(s: UTF8String, stopwords: Array[String]): InternalRow = {
    val str = s.toString
    val len = str.length
    var nTok = 0L
    var nChar = 0L
    var stopHits = 0L
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') { i += 1 }
      else {
        val start = i
        while (i < len && str.charAt(i) != ' ') {
          // count code points, not UTF-16 units (Spark length())
          if (!Character.isLowSurrogate(str.charAt(i))) nChar += 1
          i += 1
        }
        val tok = str.substring(start, i)
        nTok += 1
        distinct.add(tok)
        var d = 0
        while (d < stopwords.length) {
          if (stopwords(d) == tok) { stopHits += 1; d = stopwords.length }
          else d += 1
        }
      }
    }
    if (nTok == 0) {
      // empty / all-space input: Java split(trim, " +") yields [""] —
      // one empty token, one distinct value, zero chars, zero hits
      nTok = 1; distinct.add("")
    }
    new GenericInternalRow(Array[Any](nTok, nChar, stopHits, distinct.size.toLong))
  }

  /** Column-level entry point. */
  def apply(text: Column, stopwords: Seq[String]): Column =
    SqlShims.column(TextQualityFeatures(SqlShims.expression(text), stopwords.toArray))
}
