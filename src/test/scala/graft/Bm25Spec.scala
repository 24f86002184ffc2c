package graft

import graft.search.Bm25
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark scan table"),
    (2L, "table table table join"),
    (3L, "merge sort shuffle"),
    (4L, "completely unrelated words here")
  ).toDF("doc_id", "text")

  /** Direct transcription of the BM25 formula for one (doc, query). */
  private def bm25(tfs: Map[String, Int], dl: Double, avgdl: Double, n: Double,
                   dfs: Map[String, Int], query: Seq[String],
                   k1: Double = 1.2, b: Double = 0.75): Double =
    query.distinct.collect {
      case t if tfs.contains(t) =>
        val tf = tfs(t).toDouble
        val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
        idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    }.sum

  test("scores match the hand-computed Okapi formula") {
    val got = Bm25.search(corpus, "doc_id", "text", Seq("table", "merge"), 10)
      .as[(Long, Double)].collect().toMap
    val avgdl = (3 + 4 + 3 + 4) / 4.0
    val dfs = Map("table" -> 2, "merge" -> 1)
    val exp1 = bm25(Map("table" -> 1), 3, avgdl, 4, dfs, Seq("table", "merge"))
    val exp2 = bm25(Map("table" -> 3), 4, avgdl, 4, dfs, Seq("table", "merge"))
    val exp3 = bm25(Map("merge" -> 1), 3, avgdl, 4, dfs, Seq("table", "merge"))
    assert(got.keySet == Set(1L, 2L, 3L)) // doc 4 matches nothing -> absent
    assert(math.abs(got(1L) - exp1) < 1e-12)
    assert(math.abs(got(2L) - exp2) < 1e-12)
    assert(math.abs(got(3L) - exp3) < 1e-12)
  }

  test("rare terms outrank common ones; k caps the result") {
    // "merge" (df=1) must score doc 3 above doc 1's single "table" (df=2)
    val ranked = Bm25.search(corpus, "doc_id", "text", Seq("table", "merge"), 2)
      .as[(Long, Double)].collect()
    assert(ranked.length == 2)
    val all = Bm25.search(corpus, "doc_id", "text", Seq("table", "merge"), 10)
      .as[(Long, Double)].collect().toMap
    assert(all(3L) > all(1L))
  }

  test("query terms absent from the corpus contribute nothing") {
    val a = Bm25.search(corpus, "doc_id", "text", Seq("table"), 10)
      .as[(Long, Double)].collect().toMap
    val b = Bm25.search(corpus, "doc_id", "text", Seq("table", "zzz_missing"), 10)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("RRF output is an exact function of the two rank lists") {
    val rows = Queries.hybridRrf(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val tr = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val vr = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(tr.nonEmpty || vr.nonEmpty)
      val exp = tr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vr.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(1) - math.rint(exp * 1e6) / 1e6) < 1e-9)
    }
    // fused order is descending in rrf
    val rrfs = rows.map(_.getDouble(1)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("batch-embedded knn query is deterministic with unit-norm vectors") {
    val sfDir = "/root/testdata/sf0.001"
    val r1 = Queries.embedKnnText(spark, sfDir).as[(Long, Double)].collect().toSeq
    val r2 = Queries.embedKnnText(spark, sfDir).as[(Long, Double)].collect().toSeq
    assert(r1 == r2 && r1.length == 5)
    val e = graft.embed.HashingEmbedder(64).embed("table scan merge")
    val norm = math.sqrt(e.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }
}
