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

  test("piiRedact: ordered typed tags, counts, and java.util.regex replay agreement") {
    val cases = Seq(
      (0L, "mail me at alice.smith+x@sub.example.co.uk today"),
      (1L, "call 555-0142 or 555-9999 now"),
      (2L, "server at 10.0.12.255 and 10.255.1.2"),
      (3L, "a@b.io then 555-1234 then 10.1.2.3 all three"),
      (4L, "no pii here at all"),
      (5L, "not-a-phone 1555-12345 and not-an-ip 110.1.2.3 stay"), // \b guards
      (6L, ""))
    val df = cases.toDF("id", "t")
      .select($"id", $"t",
        TextFunctions.piiRedact($"t").as("red"),
        TextFunctions.piiCount($"t", TextFunctions.EmailRx).as("ne"),
        TextFunctions.piiCount($"t", TextFunctions.PhoneRx).as("np"),
        TextFunctions.piiCount($"t", TextFunctions.Ipv4Rx).as("ni"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap

    assert(df(0L) == (("mail me at [EMAIL] today", 1, 0, 0)))
    assert(df(1L) == (("call [PHONE] or [PHONE] now", 0, 2, 0)))
    assert(df(2L) == (("server at [IP] and [IP]", 0, 0, 2)))
    assert(df(3L) == (("[EMAIL] then [PHONE] then [IP] all three", 1, 1, 1)))
    assert(df(4L) == (("no pii here at all", 0, 0, 0)))
    // \b keeps 1555-12345 (digit before 555) and 110.1.2.3 (digit before 10.)
    assert(df(5L) == (("not-a-phone 1555-12345 and not-an-ip 110.1.2.3 stay", 0, 0, 0)))
    assert(df(6L) == (("", 0, 0, 0)))

    // the engine's redaction == plain java.util.regex applied in the
    // same order (the patterns are the shared-dialect contract)
    cases.foreach { case (id, t) =>
      val want = t.replaceAll(TextFunctions.EmailRx, "[EMAIL]")
        .replaceAll(TextFunctions.PhoneRx, "[PHONE]")
        .replaceAll(TextFunctions.Ipv4Rx, "[IP]")
      assert(df(id)._1 == want, s"case $id")
    }
  }
  test("UnicodeNormalize: NFC composes, NFD decomposes, NFKC folds compatibility") {
    import graft.expressions.UnicodeNormalize
    val nfdCafe = "café"            // e + combining acute
    val nfcCafe = "café"             // precomposed
    val rows = Seq((0L, nfdCafe), (1L, nfcCafe), (2L, "ﬁle"), // fi-ligature
        (3L, null.asInstanceOf[String]), (4L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"),
        UnicodeNormalize.nfc(col("t")).as("c"),
        UnicodeNormalize.nfd(col("t")).as("d"),
        UnicodeNormalize.nfkc(col("t")).as("kc"))
      .as[(Long, Option[String], Option[String], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(0L) == ((Some(nfcCafe), Some(nfdCafe), Some(nfcCafe))))
    assert(rows(1L) == ((Some(nfcCafe), Some(nfdCafe), Some(nfcCafe))))
    // NFC leaves the ligature alone; NFKC folds it to "fi"
    assert(rows(2L) == ((Some("ﬁle"), Some("ﬁle"), Some("file"))))
    assert(rows(3L) == ((None, None, None))) // NULL in -> NULL out
    assert(rows(4L) == ((Some("plain ascii"), Some("plain ascii"), Some("plain ascii"))))
  }

  test("UnicodeNormalize survives non-BMP input and is idempotent") {
    import graft.expressions.UnicodeNormalize
    import java.text.Normalizer
    // supplementary plane (surrogate pair) + decomposed mark after it
    val s0 = "😀áz"
    val out = Seq(s0).toDF("t")
      .select(UnicodeNormalize.nfc(col("t")).as("c")).as[String].collect()(0)
    assert(out == Normalizer.normalize(s0, Normalizer.Form.NFC))
    val again = Seq(out).toDF("t")
      .select(UnicodeNormalize.nfc(col("t")).as("c")).as[String].collect()(0)
    assert(again == out)
  }

  test("UnicodeNormalize is a codegen Expression: no ScalaUDF in the plan") {
    import graft.expressions.UnicodeNormalize
    val plan = Seq("x").toDF("t")
      .select(UnicodeNormalize.nfc(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // invalid form fails analysis loudly, not at runtime
    intercept[Exception] {
      Seq("x").toDF("t").select(UnicodeNormalize.of(col("t"), "NFX")).collect()
    }
  }
}

