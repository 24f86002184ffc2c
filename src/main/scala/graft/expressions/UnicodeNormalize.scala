package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode normalization (NFC/NFD/NFKC/NFKD) — the
  * text-cleaning pass every web-scale corpus needs before hashing or
  * deduplicating: the same visible string can arrive precomposed
  * (U+00E1) or decomposed (U+0061 U+0301) and would otherwise hash to
  * different digests, silently defeating exact dedup and fingerprints.
  *
  * Spark ships no normalization builtin, so this is a codegen'd
  * `UnaryExpression` (not a Scala UDF): the JVM's `java.text.Normalizer`
  * does the composition, a fast-path scan skips allocation entirely for
  * pure-ASCII rows (`Normalizer.isNormalized` on ASCII never allocates,
  * and at 100 TB most rows of an English-heavy corpus take this path),
  * and the call stays inside WholeStageCodegen like the other graft
  * expressions ([[WordNgrams]] sets the pattern).
  *
  * NULL in → NULL out (standard string-function contract).
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if UnicodeNormalize.Forms.contains(form.toUpperCase) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $form")
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  private lazy val normForm = Normalizer.Form.valueOf(form.toUpperCase)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], normForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = form.toUpperCase
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UnicodeNormalize.compute(" +
        s"$c, java.text.Normalizer.Form.$f);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  private[expressions] val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Shared by eval and generated code. ASCII fast path: every ASCII
    * string is already normalized under all four forms, and UTF8String
    * exposes the byte count, so a byte scan (vectorizable, no copy)
    * gates the only allocating branch. Non-ASCII rows pay one
    * `isNormalized` check (no allocation when already normal — the
    * common case for NFC on real corpora) before the normalize+copy.
    */
  def compute(s: UTF8String, form: Normalizer.Form): UTF8String = {
    if (s == null) return null
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { // getByte is the unsafe in-place read
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column entry points, named like the DuckDB builtin family. */
  def nfc(c: Column): Column = of(c, "NFC")
  def nfd(c: Column): Column = of(c, "NFD")
  def nfkc(c: Column): Column = of(c, "NFKC")
  def nfkd(c: Column): Column = of(c, "NFKD")
  def of(c: Column, form: String): Column =
    SqlShims.column(UnicodeNormalize(SqlShims.expression(c), form))
}
