package graft

import graft.pipeline.NaiveBayes
import org.scalatest.funsuite.AnyFunSuite

class NaiveBayesSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // tiny corpus where the classes are separable but share one token, so
  // the hand computation exercises priors, shared-token likelihoods and
  // Laplace smoothing at once
  private def corpus = Seq(
    (0L, "apple apple banana", "fruit"),
    (1L, "apple cherry", "fruit"),
    (2L, "hammer nail nail", "tool"),
    (3L, "hammer apple", "tool"),
    (4L, "nail hammer hammer", "tool"))
    .toDF("doc_id", "text", "lang")

  /** Independent plain-Scala refit — the spec's oracle. */
  private def handModel(docs: Seq[(Long, String, String)], vocabCap: Int): (Map[String, Long], Map[(String, String), Long]) = {
    val toks = docs.flatMap { case (_, t, l) => t.trim.split(" +").filter(_.nonEmpty).map(l -> _) }
    val vocab = toks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(vocabCap).map(_._1)
    val labels = docs.map(_._3).distinct.sorted
    val nDocs = docs.size
    val priors = labels.map { l =>
      l -> math.round(math.log(docs.count(_._3 == l).toDouble / nDocs) * 1e6)
    }.toMap
    val inVocab = toks.filter(t => vocab.contains(t._2))
    val weights = (for (l <- labels; t <- vocab) yield {
      val cnt = inVocab.count(p => p._1 == l && p._2 == t)
      val tot = inVocab.count(_._1 == l)
      (t, l) -> math.round(math.log((cnt + 1).toDouble / (tot + vocab.size)) * 1e6)
    }).toMap
    (priors, weights)
  }

  test("train matches an independent plain-Scala refit, including smoothing") {
    val m = NaiveBayes.train(corpus, "text", "lang")
    val (priors, weights) = handModel(
      Seq((0L, "apple apple banana", "fruit"), (1L, "apple cherry", "fruit"),
        (2L, "hammer nail nail", "tool"), (3L, "hammer apple", "tool"),
        (4L, "nail hammer hammer", "tool")), 500)
    assert(m.classes.map(c => c.label -> c.iprior).toMap == priors)
    assert(m.weights.map(w => (w.tok, w.label) -> w.ilp).toMap == weights)
    // dense: every vocab token has a row for every class
    val vocabSize = m.weights.map(_.tok).distinct.size
    assert(m.weights.size == vocabSize * m.classes.size)
  }

  test("score reproduces a hand-computed argmax and exact integer scores") {
    val m = NaiveBayes.train(corpus, "text", "lang")
    val ilp = m.weights.map(w => (w.tok, w.label) -> w.ilp).toMap
    val iprior = m.classes.map(c => c.label -> c.iprior).toMap
    val got = NaiveBayes.score(corpus, "doc_id", "text", m)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    for ((id, pred, iscore) <- got) {
      val text = corpus.where($"doc_id" === id).select("text").as[String].head()
      val counts = text.trim.split(" +").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong)
      val scores = m.classes.map { c =>
        c.label -> (iprior(c.label) +
          counts.toSeq.flatMap { case (t, n) => ilp.get((t, c.label)).map(_ * n) }.sum)
      }
      val best = scores.minBy { case (l, s) => (-s, l) }
      assert((pred, iscore) == best, s"doc $id")
    }
    // separability sanity: the trained model actually classifies
    assert(got.count { case (id, pred, _) =>
      pred == (if (id <= 1) "fruit" else "tool") } >= 4)
  }

  test("all-OOV and empty documents fall back to the prior argmax") {
    val m = NaiveBayes.train(corpus, "text", "lang")
    // "tool" has 3 of 5 docs -> larger prior
    val oov = Seq((100L, "zzz qqq"), (101L, ""), (102L, "   "))
      .toDF("doc_id", "text")
    val got = NaiveBayes.score(oov, "doc_id", "text", m)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val toolPrior = m.classes.find(_.label == "tool").get.iprior
    assert(got.forall { case (_, pred, s) => pred == "tool" && s == toolPrior })
    assert(got.length == 3)
  }

  test("exact score ties break toward the lexicographically smaller label") {
    // two classes with identical doc counts and identical token
    // profiles -> every score pair ties exactly in integer arithmetic
    val sym = Seq((0L, "x y", "b"), (1L, "x y", "a")).toDF("doc_id", "text", "lang")
    val m = NaiveBayes.train(sym, "text", "lang")
    val got = NaiveBayes.score(sym, "doc_id", "text", m)
      .as[(Long, String, Long)].collect()
    assert(got.forall(_._2 == "a"))
  }

  test("vocabCap truncates by (count desc, token asc) deterministically") {
    val m = NaiveBayes.train(corpus, "text", "lang", vocabCap = 3)
    // counts: apple 4, hammer 4, nail 3, banana 1, cherry 1
    assert(m.weights.map(_.tok).distinct.sorted == Seq("apple", "hammer", "nail"))
    // OOV-at-cap tokens contribute nothing: a banana-only doc scores as prior-only
    val got = NaiveBayes.score(Seq((7L, "banana")).toDF("doc_id", "text"), "doc_id", "text", m)
      .as[(Long, String, Long)].collect().head
    assert(got._2 == "tool")
  }

  test("scoring is reproducible across partitionings (integer arithmetic has no order hazard)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = NaiveBayes.train(docs, "text", "lang")
    val a = NaiveBayes.score(docs, "doc_id", "text", m)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val b = NaiveBayes.score(docs.repartition(7), "doc_id", "text", m)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.size == docs.count())
  }
}
