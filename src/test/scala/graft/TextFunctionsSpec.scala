package graft

import graft.functions.TextFunctions
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("tokenCount handles runs of whitespace and empty-ish strings") {
    val df = Seq("a b  c", "  x ", "one").toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n")).as[Int].collect()
    assert(df.toSeq == Seq(3, 1, 1))
  }

  test("langId picks the dictionary with most hits; und when none") {
    val rows = Seq(
      "the cat is on the mat and happy",  // en
      "der hund und die katze ist da",     // de
      "xyzzy plugh qwerty")                // und
      .toDF("text")
      .select(TextFunctions.langId(col("text")).as("l")).as[String].collect()
    assert(rows.toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint is casing/punctuation/whitespace robust") {
    val fps = Seq("Hello,  World!", "hello world", "HELLO ... world")
      .toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("f")).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("quality score in [0,1], higher for longer non-stopword text") {
    val q = Seq(
      ("short", "the the the the"),
      ("long", Seq.fill(120)("word").mkString(" ")))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.qualityScore(col("text")).as("q"))
      .as[(String, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q("long") > q("short"))
  }

  test("simhash64 is deterministic and identical for identical texts") {
    val df = Seq((0L, "spark catalyst engine"), (1L, "spark catalyst engine"),
      (2L, "completely different words"))
      .toDF("id", "text")
    val m = TextFunctions.simhash64(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == m(1L))
    assert(m(0L) != m(2L))
  }

  test("simhash64: null, empty and whitespace-only docs sketch to null, not a seed hash") {
    val df = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "   "),
      (3L, "real tokens here"))
      .toDF("id", "text")
    val rows = TextFunctions.simhash64(df, "id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(0L).isEmpty && rows(1L).isEmpty && rows(2L).isEmpty)
    assert(rows(3L).isDefined)
  }

  test("multimodal decode stub: deterministic metadata from binary payload") {
    val docs = Seq((7L, "abcdef")).toDF("doc_id", "text")
    val meta = Multimodal.fromDocuments(spark, docs).collect().head
    assert(meta.doc_id == 7L && meta.n_bytes == 6L)
    assert(meta.width == 64 + (6 % 57) * 16 && meta.format == "png")
  }
}
