package graft

import graft.pipeline.TrainingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** API-level tests of the DataFrame-parameterized pipeline operators
  * on a hand-built schema DIFFERENT from the fixture tables — the
  * gate queries prove fixture behavior, these prove the functions are
  * genuinely column-parameterized (a user's own id/text/strata names
  * work) and pin the small semantic contracts a caller relies on.
  */
class TrainingOpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (100L, "alpha beta gamma delta epsilon zeta", "web"),
    (101L, "alpha beta gamma delta epsilon zeta", "web"),   // exact dup of 100
    (102L, "one two three four five six seven eight", "web"),
    (103L, "unrelated words entirely here nothing shared", "books"),
    (104L, "alpha beta gamma delta other tail tokens", "books")) // shares the 100-prefix 4-gram
    .toDF("id", "body", "domain")

  test("decontaminate flags exactly the docs sharing a 4-gram with the benchmark split") {
    // benchmark = doc 100; docs 101 (exact dup) and 104 (shared prefix)
    // share "alpha beta gamma delta"; 102/103 share nothing
    val hits = TrainingOps.decontaminate(corpus, "id", "body", isBenchmark = col("id") === 100L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(hits.map(_._1) == Seq(101L, 104L))
    assert(hits.head._2 == 3L) // 101 shares all three distinct 4-grams of 100
    assert(hits(1)._2 == 1L)   // 104 shares only the prefix gram
  }

  test("stratifiedKept is deterministic and honors a 0/100 rate split") {
    val kept = TrainingOps.stratifiedKept(corpus, "id",
        ratePct = when(col("domain") === "web", 100).otherwise(0))
      .select($"id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(Seq(100L, 101L, 102L).forall(kept(_)))
    assert(Seq(103L, 104L).forall(!kept(_)))
    // and a mid rate is a pure function of id: two runs agree
    val r1 = TrainingOps.stratifiedKept(corpus, "id", lit(50))
      .select($"id", $"kept").as[(Long, Boolean)].collect().toSeq.sorted
    val r2 = TrainingOps.stratifiedKept(corpus, "id", lit(50))
      .select($"id", $"kept").as[(Long, Boolean)].collect().toSeq.sorted
    assert(r1 == r2)
  }

  test("packSequences with a custom bin size cuts where the cumsum crosses") {
    // token counts: 6, 6, 8, 6, 7 — bins of 10 tokens within one shard
    val packed = TrainingOps.packSequences(
        corpus.withColumn("shard", lit(0)), "id", "body",
        Seq(col("shard")), binTokens = 10)
      .orderBy("bin_id").select($"bin_id", $"n_docs", $"n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    // cumsums 6,12,20,26,33 → bins 0,1,1,2,3
    assert(packed == Seq((0L, 1L, 6L), (1L, 2L, 14L), (2L, 1L, 6L), (3L, 1L, 7L)))
    assert(packed.map(_._3).sum == 33L)
  }

  test("mixtureWeights: min stratum gets weight 1.0, weights equalize token volume") {
    val w = TrainingOps.mixtureWeights(corpus, "domain", "body")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._5)).toMap
    val (webTok, webW) = w("web"); val (bookTok, bookW) = w("books")
    assert(bookTok < webTok && bookW == 1.0)
    assert(math.abs(webW * webTok - bookTok) <= 0.0001 * webTok)
  }
}
