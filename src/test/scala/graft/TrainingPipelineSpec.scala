package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-5 training-pipeline additions: within-document repetition
  * signals, the composite quality gate, and watermarked streaming
  * dedup. Each is cross-checked against an independent plain-Scala
  * recomputation (not the same Spark expressions), and the streaming
  * test asserts the redelivery is non-vacuous.
  */
class TrainingPipelineSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("text_repetition matches a plain-Scala recomputation per document") {
    val expected = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val w = text.trim.split(" +")
        val bg = if (w.length < 2) Array.empty[String]
                 else w.sliding(2).map(_.mkString(" ")).toArray
        val dupW = BigDecimal(1.0 - w.distinct.length.toDouble / w.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val dupB = if (bg.isEmpty) 0.0
          else BigDecimal(1.0 - bg.distinct.length.toDouble / bg.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, w.length.toLong, dupW, dupB)
      }.sortBy(_._1)
    val got = Queries.textRepetition(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"doc ${e._1}") }
    // the signal is live: some doc in the corpus repeats at least one word
    assert(got.exists(_._3 > 0.0))
  }

  test("quality_gate pass counts match a plain-Scala recomputation per lang") {
    val stop = Set("the", "is", "and", "of", "to", "a", "in")
    val expected = Tables.documents(spark, sfDir)
      .select($"lang", $"text").as[(String, String)].collect()
      .groupBy(_._1).map { case (lang, docs) =>
        val passes = docs.count { case (_, text) =>
          val w = text.trim.split(" +")
          val nt = w.length
          val atl = if (nt == 0) 0.0 else w.map(_.length).sum.toDouble / nt
          val sr = if (nt == 0) 0.0 else w.count(stop).toDouble / nt
          nt >= 30 && atl >= 4.0 && atl <= 5.0 && sr <= 0.10
        }
        lang -> (docs.length.toLong, passes.toLong)
      }
    val got = Queries.qualityGate(spark, sfDir)
      .select($"lang", $"n_docs", $"n_pass").as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, nDocs, nPass) =>
      assert((nDocs, nPass) == expected(lang), s"lang $lang")
    }
    // the gate splits the corpus: neither all-pass nor all-fail
    val (docs, passes) = (got.map(_._2).sum, got.map(_._3).sum)
    assert(passes > 0 && passes < docs)
  }

  test("chunk_cdc matches a plain-Scala recomputation per document") {
    def smix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val expected = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val w = text.trim.split(" +")
        val breaks = w.dropRight(1).count { t =>
          var h = 1125899906842597L
          t.foreach(c => h = smix(h ^ c.toLong))
          (h & 15L) == 0L
        }
        val nc = breaks + 1L
        (id, w.length.toLong, nc,
          BigDecimal(w.length.toDouble / nc)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy(_._1)
    val got = Queries.chunkCdc(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == expected.toSeq)
    // content-defined boundaries are live: some doc splits, none vanish
    assert(got.exists(_._3 > 1L) && got.forall(_._3 >= 1L))
  }

  test("stream-static enrichment matches the batch left join per segment") {
    val ev = Tables.events(spark, sfDir)
    val batch = ev.join(
        Tables.customer(spark, sfDir).select($"c_custkey", $"c_mktsegment"),
        ev("user_id") === $"c_custkey", "left")
      .groupBy(coalesce($"c_mktsegment", lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"segment").collect().toSeq
    val streamed = Queries.eventsEnrichStream(spark, sfDir).collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming dedup drops every redelivered duplicate (sink == batch)") {
    val ev = Tables.events(spark, sfDir)
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    val redelivered = ev
      .where($"ts" >= lit(new java.sql.Timestamp(maxTs.getTime - 3600L * 1000))).count()
    assert(redelivered > 0, "redelivery window is empty — the dedup test would be vacuous")
    val batch = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"event_type").collect().toSeq
    val streamed = Queries.eventsDedupStream(spark, sfDir).collect().toSeq
    assert(streamed == batch)
  }

  test("streaming sessionization equals the batch window-function sessionization") {
    val batch = Queries.eventsSessionize(spark, sfDir)
      .select($"user_id", $"n_sessions", $"n_events")
      .as[(Long, Long, Long)].collect().toSeq
    val streamed = Queries.eventsSessionizeStream(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
    // non-vacuous: at least one user has more than one session, so the
    // gap-split logic (not just the single-session fold) is exercised
    assert(streamed.exists(_._2 > 1L))
  }

  test("session_window native formulation equals the lag/cumsum formulation") {
    val batch = Queries.eventsSessionize(spark, sfDir)
      .select($"user_id", $"n_sessions", $"n_events")
      .as[(Long, Long, Long)].collect().toSeq
    val native = Queries.eventsSessionWindowNative(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(native == batch && native.nonEmpty)
  }

  test("session_window STREAMED (native merging state store) equals the batch table") {
    val batch = Queries.eventsSessionize(spark, sfDir)
      .select($"user_id", $"n_sessions", $"n_events")
      .as[(Long, Long, Long)].collect().toSeq
    val streamed = Queries.eventsSessionWindowStream(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("update-mode upsert sink converges to the batch hourly aggregate") {
    val batch = Queries.eventsHourly(spark, sfDir).collect().toSeq
    val upserted = Queries.eventsHourlyUpsertStream(spark, sfDir).collect().toSeq
    assert(upserted == batch && upserted.nonEmpty)
  }

  test("decontaminate_ngram matches a plain-Scala set-intersection recomputation") {
    // sf0.01: the 0.001 corpus has a 1-doc benchmark split with no
    // 4-gram overlap — the check would be vacuously empty there
    val dir = "/root/testdata/sf0.01"
    val all = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def grams(t: String): Set[String] = {
      val w = t.trim.split(" +")
      if (w.length < 4) Set.empty else w.sliding(4).map(_.mkString(" ")).toSet
    }
    val bench = all.filter(_._1 % 50 == 0).flatMap(d => grams(d._2)).toSet
    val expected = all.filter(_._1 % 50 != 0)
      .map { case (id, t) => id -> grams(t).count(bench) }
      .filter(_._2 > 0).sortBy(_._1).toSeq
    val got = Queries.decontaminateNgram(spark, dir)
      .as[(Long, Long)].collect().toSeq.map { case (id, n) => (id, n.toInt) }
    assert(got == expected && got.nonEmpty)
  }

  test("sample_stratified is a pure function of doc_id (independent splitmix64)") {
    def smix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val expected = Tables.documents(spark, sfDir)
      .select($"lang", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (lang, rows) =>
        val rate = if (lang == "en") 25 else 75
        val kept = rows.filter(r => java.lang.Math.floorMod(smix(r._2), 100L) < rate)
        lang -> (rows.length.toLong, kept.length.toLong, kept.map(_._2).sum)
      }
    val got = Queries.sampleStratified(spark, sfDir)
      .select($"lang", $"n_docs", $"n_kept", $"kept_id_sum")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, n, k, s) =>
      assert((n, k, s) == expected(lang), s"lang $lang") }
    // the stratification bites: en is downsampled below the others' rate
    val rates = got.map(r => r._1 -> r._3.toDouble / r._2).toMap
    assert(rates("en") < rates.filterNot(_._1 == "en").values.min)
  }

  test("pack_sequences matches a plain-Scala concat-then-chunk recomputation") {
    val all = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id", $"text").as[(String, Long, String)].collect()
    val expected = all.groupBy(d => (d._1, d._2 / 100000)).toSeq.flatMap { case ((src, shard), docs) =>
      var cum = 0L
      docs.sortBy(_._2).toSeq.map { case (_, _, text) =>
        val n = text.trim.split(" +").length.toLong
        cum += n
        (src, shard, (cum - 1) / 512, n)
      }
    }.groupBy(t => (t._1, t._2, t._3))
      .map { case ((src, shard, bin), rows) => (src, shard, bin, rows.size.toLong, rows.map(_._4).sum) }
      .toSeq.sortBy(t => (t._1, t._2, t._3))
    val got = Queries.packSequences(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected && got.nonEmpty)
    // every token is packed exactly once
    assert(got.map(_._5).sum == all.map(_._3.trim.split(" +").length.toLong).sum)
  }

  test("decontaminate_ngram broadcasts the benchmark gram set (plan assertion)") {
    val df = Queries.decontaminateNgram(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the holdout side must reach the training scan as a broadcast
    // hash relation — a sort-merge join here would shuffle the full
    // exploded gram table at 100 TB
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("pipeline_survivors matches a plain-Scala recomputation of the composed stages") {
    // sf0.01: the sf0.001 benchmark split (1 doc) produces no 4-gram
    // hits, which would leave the decontamination stage vacuous
    val dir = "/root/testdata/sf0.01"
    val all = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    def toks(t: String) = t.trim.split(" +")
    def grams(t: String): Set[String] = {
      val w = toks(t)
      if (w.length < 4) Set.empty else w.sliding(4).map(_.mkString(" ")).toSet
    }
    def smix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val stop = Set("the", "is", "and", "of", "to", "a", "in")
    val bench = all.filter(_._1 % 50 == 0).flatMap(d => grams(d._3)).toSet
    val survivors = all.filter(_._1 % 50 != 0)
      .filter { case (_, _, text) =>
        val w = toks(text); val nt = w.length
        val atl = if (nt == 0) 0.0 else w.map(_.length).sum.toDouble / nt
        val sr = if (nt == 0) 0.0 else w.count(stop).toDouble / nt
        nt >= 30 && atl >= 4.0 && atl <= 5.0 && sr <= 0.10
      }
      .groupBy(_._3).values.map(_.minBy(_._1)).toSeq          // keep-first per text
      .filter(d => grams(d._3).intersect(bench).isEmpty)      // decontaminate
      .filter { case (id, lang, _) =>                         // sample
        val rate = if (lang == "en") 25 else 75
        java.lang.Math.floorMod(smix(id), 100L) < rate
      }
    val expected = survivors.groupBy(_._2).map { case (lang, ds) =>
      lang -> (ds.size.toLong, ds.map(d => toks(d._3).length.toLong).sum, ds.map(_._1).sum)
    }
    val got = Queries.pipelineSurvivors(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, n, tok, ids) =>
      assert((n, tok, ids) == expected(lang), s"lang $lang") }
    assert(got.map(_._1).toSet == expected.keySet)
    // the composition bites: fewer survivors than raw training docs
    assert(got.map(_._2).sum < all.count(_._1 % 50 != 0))
  }

  test("dedup_substring matches a plain-Scala shared-window recomputation") {
    // sf0.01 — cross-doc 8-token window sharing needs the near-dup pairs
    val dir = "/root/testdata/sf0.01"
    val all = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def windows(t: String): Set[String] = {
      val w = t.trim.split(" +")
      if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val perDoc = all.map { case (id, t) => id -> windows(t) }.filter(_._2.nonEmpty)
    val counts = scala.collection.mutable.Map.empty[String, Int]
    perDoc.foreach { case (_, ws) => ws.foreach(w => counts(w) = counts.getOrElse(w, 0) + 1) }
    val expected = perDoc.map { case (id, ws) =>
      id -> (ws.size.toLong, ws.count(w => counts(w) >= 2).toLong)
    }.filter(_._2._2 > 0).toMap
    val got = Queries.dedupSubstring(spark, dir)
      .select($"doc_id", $"n_windows", $"n_shared").as[(Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length == expected.size)
    got.foreach { case (id, nw, ns) => assert((nw, ns) == expected(id), s"doc $id") }
    // the signal is partial coverage, not all-or-nothing
    assert(got.exists { case (_, nw, ns) => ns < nw })
  }

  test("lm_score matches a plain-Scala unigram surprisal recomputation") {
    val all = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = all.map { case (id, t) => id -> t.trim.split(" +").toSeq }
    val freq = toks.flatMap(_._2).groupBy(identity).map { case (w, o) => w -> o.length }
    val total = toks.map(_._2.length).sum.toDouble
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val expected = toks.map { case (id, ws) =>
      val bits = ws.map(w => log2(total) - log2(freq(w).toDouble)).sum / ws.length
      id -> (ws.length.toLong,
        BigDecimal(bits).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = Queries.lmScore(spark, sfDir).as[(Long, Long, Double)].collect()
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { case (id, n, bits) =>
      val (en, ebits) = expected(id)
      assert(n == en, s"doc $id token count")
      // recomputation sums in a different order — allow 1 ulp of 4-dp
      assert(math.abs(bits - ebits) <= 0.00011, s"doc $id: $bits vs $ebits")
    }
    // the signal separates docs: not all scores identical
    assert(got.map(_._3).distinct.length > 1)
  }

  test("perplexity_buckets: terciles partition the corpus and order by surprisal") {
    val rows = Queries.perplexityBuckets(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("head", "middle", "tail"))
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == total)
    // terciles are roughly balanced (ties on 4-dp surprisal values
    // cross a threshold together, so exact N/3 splits are not owed)
    assert(rows.map(_._2).max - rows.map(_._2).min <= total / 5)
    // mean surprisal strictly increases head -> middle -> tail
    assert(rows(0)._4 < rows(1)._4 && rows(1)._4 < rows(2)._4)
  }

  test("mix_resample equalizes per-language token volume near the minimum") {
    def smix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val all = Tables.documents(spark, sfDir)
      .select($"lang", $"doc_id", $"text").as[(String, Long, String)].collect()
      .map { case (l, id, t) => (l, id, t.trim.split(" +").length.toLong) }
    val perLang = all.groupBy(_._1).map { case (l, ds) => l -> ds.map(_._3).sum }
    val minT = perLang.values.min
    val expected = all.groupBy(_._1).map { case (l, ds) =>
      val thr = math.min(10000L, math.round(minT * 10000.0 / perLang(l)))
      val kept = ds.filter(d => java.lang.Math.floorMod(smix(d._2), 10000L) < thr)
      l -> (kept.length.toLong, kept.map(_._3).sum, kept.map(_._2).sum)
    }
    val got = Queries.mixResample(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (l, n, tok, ids) => assert((n, tok, ids) == expected(l), s"lang $l") }
    // the rebalance lands every language's surviving volume near the
    // minimum (generous band: small strata sample noisily)
    got.foreach { case (l, _, tok, _) =>
      assert(tok >= minT / 2 && tok <= minT * 2, s"lang $l volume $tok vs target $minT") }
  }

  test("mix_weights rebalances to the minority language") {
    val got = Queries.mixWeights(spark, sfDir)
      .select($"lang", $"n_tokens", $"weight").as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    val minTokens = got.map(_._2).min
    got.foreach { case (lang, n, w) =>
      assert(w > 0.0 && w <= 1.0, s"lang $lang")
      // weight * tokens ≈ min_tokens (to rounding): uniform contribution
      assert(math.abs(w * n - minTokens) <= 0.0001 * n, s"lang $lang")
    }
    assert(got.filter(_._2 == minTokens).forall(_._3 == 1.0))
  }

  test("curriculum_order: 3 stages x 4 shards partition the corpus exactly") {
    val got = Queries.curriculumOrder(spark, sfDir)
      .select($"bucket", $"shard", $"n_docs").as[(String, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).distinct.length === got.length)
    assert(got.map(_._1).distinct.sorted.toSeq === Seq("head", "middle", "tail"))
    got.groupBy(_._1).foreach { case (b, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L), s"stage $b shards")
    }
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(got.map(_._3).sum === nDocs, "stages/shards do not partition the corpus")
  }

  test("decontaminate_semantic: one nearest-benchmark row per training vector, splits disjoint") {
    val got = Queries.decontaminateSemantic(spark, sfDir)
      .select($"vec_id", $"bench_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).distinct.length === got.length, "duplicate training rows")
    got.foreach { case (v, b) =>
      assert(v % 50 != 0, s"benchmark vector $v leaked into the training side")
      assert(b % 50 == 0, s"non-benchmark neighbor $b")
    }
    val nTrain = Tables.embeddings(spark, sfDir)
      .where(col("embedding").isNotNull && col("vec_id") % 50 =!= 0).count()
    assert(got.length.toLong === nTrain, "a training vector has no neighbor row")
  }

  test("token_budget: cumulative share is monotone, ends at 1.0, matches recomputation") {
    val got = Queries.tokenBudget(spark, sfDir)
      .select($"source", $"n_docs", $"n_tokens", $"cum_frac")
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // ordered largest-first with name tiebreak
    assert(got.map(r => (-r._3, r._1)).toSeq === got.map(r => (-r._3, r._1)).sorted.toSeq)
    // cumulative share is monotone nondecreasing and ends at exactly 1.0
    got.map(_._4).sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
    assert(got.last._4 === 1.0)
    // per-source totals match a plain-Scala recomputation
    val expected = Tables.documents(spark, sfDir)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues { ds =>
        (ds.length.toLong, ds.map(_._2.trim.split(" +").length.toLong).sum)
      }.toMap
    got.foreach { case (src, nDocs, nTok, _) =>
      assert((nDocs, nTok) === expected(src), s"source $src")
    }
  }
}
