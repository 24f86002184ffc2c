package graft

import graft.pipeline.BpeTrainer
import org.scalatest.funsuite.AnyFunSuite

/** BPE training against the worked example of Sennrich et al. 2016
  * (§3.2: corpus {low×5, lower×2, newest×6, widest×3}) plus the two
  * determinism contracts the distributed decomposition relies on: the
  * pure-Column [[BpeTrainer.pairCounts]] stage must agree exactly with
  * the driver loop's own iteration-0 counting, and the top-vocab
  * truncation must be a total order.
  */
class BpeTrainerSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val paperCorpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
  private val docs = Seq((1L, paperCorpus)).toDF("id", "text")

  test("learns the paper's merge sequence with deterministic tie-breaks") {
    val got = BpeTrainer.train(docs, "text", 5).map(m => (m.rank, m.left, m.right, m.freq))
    // freq-9 three-way tie (e,s)/(s,t)/(t,</w>) resolves lexicographically
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)))
  }

  test("pairCounts (distributed, pure-Column) matches the driver loop's iteration-0 counts") {
    val distributed = BpeTrainer.pairCounts(BpeTrainer.wordCounts(docs, "text"))
      .as[(String, String, Long)].collect()
      .map { case (l, r, f) => ((l, r), f) }.toMap
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val expected = collection.mutable.HashMap.empty[(String, String), Long]
    wc.foreach { case (w, c) =>
      val syms = w.map(_.toString) :+ "</w>"
      syms.sliding(2).foreach { p =>
        val k = (p(0), p(1)); expected.update(k, expected.getOrElse(k, 0L) + c)
      }
    }
    assert(distributed == expected.toMap)
  }

  test("mergePair is greedy left-to-right with no overlap") {
    assert(BpeTrainer.mergePair(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(BpeTrainer.mergePair(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
    assert(BpeTrainer.mergePair(Array("x"), "a", "b").toSeq == Seq("x"))
  }

  test("single-char words contribute only their terminal pair") {
    val d = Seq((1L, "a a b")).toDF("id", "text")
    val pairs = BpeTrainer.pairCounts(BpeTrainer.wordCounts(d, "text"))
      .as[(String, String, Long)].collect().map { case (l, r, f) => ((l, r), f) }.toMap
    assert(pairs == Map(("a", "</w>") -> 2L, ("b", "</w>") -> 1L))
  }

  test("encodeWord segments held-out words with the learned merges") {
    val merges = BpeTrainer.train(docs, "text", 5)
    // "lowest" was never a training word; es→est→est</w> then lo→low
    assert(BpeTrainer.encodeWord("lowest", merges) == Seq("low", "est</w>"))
    // "lower" keeps e/r unmerged (no (e,r) merge was learned)
    assert(BpeTrainer.encodeWord("lower", merges) == Seq("low", "e", "r", "</w>"))
    // unseen characters fall back to char-level
    assert(BpeTrainer.encodeWord("xyz", merges) == Seq("x", "y", "z", "</w>"))
  }

  test("tokenCounts prices a corpus under the trained tokenizer, row-locally") {
    val merges = BpeTrainer.train(docs, "text", 5)
    val priced = BpeTrainer.tokenCounts(
        Seq((1L, "lowest lower"), (2L, null.asInstanceOf[String])).toDF("id", "text"),
        "text", merges)
      .select($"id", $"bpe_tokens").as[(Long, Long)].collect().toMap
    assert(priced == Map(1L -> 6L, 2L -> 0L)) // [low est</w>] + [low e r </w>]
  }

  test("maxVocabWords truncation is deterministic at the (cnt, word) tie boundary") {
    // "aa" and "bb" tie at count 2; cap 1 keeps the lexicographically
    // smaller word "aa", whose pairs (a,a) and (a,</w>) tie at 2 —
    // ("a","</w>") < ("a","a") lexicographically ('<' sorts below 'a')
    val d = Seq((1L, "bb aa bb aa")).toDF("id", "text")
    val m = BpeTrainer.train(d, "text", 1, maxVocabWords = 1)
    assert(m == Seq(BpeTrainer.Merge(1, "a", "</w>", 2L)))
  }
}
