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

  test("quotaKept caps each group at quota, reproducibly, via a group-limit plan") {
    val kept = TrainingOps.quotaKept(corpus, "id", "domain", 2)
    val rows = kept.select($"id", $"domain", $"qrank")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    val perGroup = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perGroup == Map("web" -> 2, "books" -> 2))
    assert(rows.forall(_._3 <= 2))
    // survivors are exactly the two lowest splitmix64(id) priorities
    // per group — the kept set is a pure function of the ids
    def expect(ids: Seq[Long]) = ids.sortBy(id =>
      (graft.functions.TextFunctions.splitmix64(id), id)).take(2).toSet
    assert(rows.filter(_._2 == "web").map(_._1).toSet == expect(Seq(100L, 101L, 102L)))
    assert(rows.filter(_._2 == "books").map(_._1).toSet == expect(Seq(103L, 104L)))
    val again = TrainingOps.quotaKept(corpus, "id", "domain", 2)
      .select($"id", $"domain", $"qrank").as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(rows == again)
    // scale posture: the rank filter must compile to WindowGroupLimit
    // (map-side per-group top-k BEFORE the exchange), not a full
    // window over the shuffled corpus
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("temperatureKept: sqrt-tempered keep rates; the smallest stratum keeps everything") {
    val out = TrainingOps.temperatureKept(corpus, "domain", "id")
      .select($"id", $"domain", $"keep_e4", $"kept")
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1).toSeq
    // web has 3 docs, books 2 → rate_web = sqrt(2/3), rate_books = 1
    val expWeb = math.floor(math.sqrt(2.0 / 3.0) * 10000).toLong
    assert(out.filter(_._2 == "web").forall(_._3 == expWeb))
    assert(out.filter(_._2 == "books").forall(_._3 == 10000L))
    assert(out.filter(_._2 == "books").forall(_._4), "smallest stratum must keep all")
    // keeps are the splitmix64 bucket rule — recompute independently
    out.foreach { case (id, _, e4, kept) =>
      val bucket = java.lang.Math.floorMod(
        graft.functions.TextFunctions.splitmix64(id), 10000L)
      assert(kept == (bucket < e4), s"id $id")
    }
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

  test("decontaminateBloom equals the exact operator even when the sketch false-positives") {
    val exact = TrainingOps.decontaminate(corpus, "id", "body",
        isBenchmark = col("id") === 100L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // deliberately undersized sketch at 50% FPP: screen false
    // positives are likely, and the exact verify join must remove
    // every one — the output is bit-identical to the exact operator
    val bloomed = TrainingOps.decontaminateBloom(corpus, "id", "body",
        isBenchmark = col("id") === 100L, expectedGrams = 8L, fpp = 0.5)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(bloomed == exact)
    assert(bloomed.map(_._1) == Seq(101L, 104L))
  }

  test("tfIdfTopK matches a plain-Scala smooth-idf recomputation") {
    val rows = corpus.select($"id", $"body").as[(Long, String)].collect().toSeq
    val n = rows.length
    val tf = rows.flatMap { case (id, b) =>
        b.trim.split(" +").filter(_.nonEmpty).map(t => (id, t))
      }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val dfq = tf.keys.toSeq.groupBy(_._2).map { case (t, ks) => (t, ks.size.toLong) }
    val expected = tf.toSeq
      .map { case ((id, t), f) =>
        val s = BigDecimal(f * (math.log((n + 1).toDouble / (dfq(t) + 1).toDouble) + 1.0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, t, f, dfq(t), s)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, ts) =>
        ts.sortBy { case (_, t, _, _, s) => (-s, t) }.take(3).zipWithIndex
          .map { case ((id, t, f, d, s), i) => (id, i + 1, t, f, d, s) }
      }.sortBy(r => (r._1, r._2))
    val got = TrainingOps.tfIdfTopK(corpus, "id", "body", k = 3)
      .orderBy("id", "term_rank")
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    // the persistTf scale lever changes the physical plan only
    val persisted = TrainingOps.tfIdfTopK(corpus, "id", "body", k = 3, persistTf = true)
      .orderBy("id", "term_rank")
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(persisted == expected)
    // caller-managed cache: materialize termFrequencies under a
    // lifetime the CALLER owns, pass it in, unpersist afterward —
    // the long-lived-server contract persistTf can't offer
    val tfOwned = TrainingOps.termFrequencies(corpus, "id", "body")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val supplied = TrainingOps.tfIdfTopK(corpus, "id", "body", k = 3, tf = Some(tfOwned))
        .orderBy("id", "term_rank")
        .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
      assert(supplied == expected)
    } finally {
      tfOwned.unpersist(blocking = true)
      assert(tfOwned.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    }
  }

  test("clusterBalance: argmin-L2 assignment, first-min tie-break, floor-div rates, splitmix keeps") {
    def smix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    def bucket(id: Long): Long = { val m = smix(id) % 100; if (m < 0) m + 100 else m }
    val vecs = Seq(
      (0L, Array(0.1f, 0.0f)), (1L, Array(-0.2f, 0.1f)), (2L, Array(0.0f, 0.2f)),
      (3L, Array(9.8f, 10.1f)),        // near center 1
      (4L, Array(5.0f, 5.0f)),         // EXACTLY equidistant → first-min picks cid 0
      (5L, null.asInstanceOf[Array[Float]])) // skipped
      .toDF("vid", "v")
    val centers = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val got = TrainingOps.clusterBalance(vecs, "vid", "v", centers)
      .orderBy("cluster_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // sizes: c0 = {0,1,2,4}, c1 = {3}; total 5, k=2 → target 2;
    // rates: c0 = (100*2) div 4 = 50, c1 = min(100, 200) = 100
    val kept0 = Seq(0L, 1L, 2L, 4L).filter(bucket(_) < 50L)
    assert(got == Seq(
      (0L, 4L, 50L, kept0.size.toLong, kept0.sum),
      (1L, 1L, 100L, 1L, 3L)))
  }

  test("semDedup finds within-cluster cosine pairs and never compares across clusters") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),    // c0
      (1L, Array(0.9f, 0.1f)),    // c0; cos(0,1) ≈ 0.9939
      (2L, Array(0.0f, 1.0f)),    // c0; orthogonal to 0
      (3L, Array(5.1f, 5.1f)),    // c1 (48.02 vs 52.02 beyond midpoint)
      (4L, Array(9.0f, 9.0f)),    // c1; cos(3,4) = 1.0
      (5L, Array(4.9f, 4.9f)))    // c0 — cos(3,5) = 1.0 but CROSS-cluster
      .toDF("vid", "v")
    val centers = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TrainingOps.semDedup(vecs, "vid", "v", centers, tau = 0.9)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val v = vecs.as[(Long, Array[Float])].collect().toMap
    assert(got == Seq(
      (0L, 0L, 1L, r4(cos(v(0L), v(1L)))),
      (1L, 3L, 4L, r4(cos(v(3L), v(4L))))))
    // the defining approximation: (3,5) has cosine 1.0 but lives in
    // different clusters, so SemDeDup never emits it
    assert(!got.exists(p => p._2 == 3L && p._3 == 5L))
  }

  test("semDedup maxBlock sub-blocks an oversized cluster: adjacency predicate, exactly-once pairs") {
    def smix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    // one giant cluster: 12 near-identical vectors, every pair's cosine
    // clears tau — so output is governed purely by the block predicate
    val n = 12
    val vecs = (0 until n).map(i => (i.toLong, Array(1.0f, 0.001f * i)))
      .toDF("vid", "v")
    val centers = Array(Array(1.0, 0.0))
    // maxBlock=3 → nb = ceil(12/3) = 4: distance-2 block pairs dropped
    val nb = 4L
    def block(id: Long): Long = java.lang.Math.floorMod(smix(id), nb)
    def adjacent(x: Long, y: Long): Boolean = {
      val d = java.lang.Math.floorMod(block(x) - block(y), nb)
      d == 0L || d == 1L || d == nb - 1
    }
    val got = TrainingOps.semDedup(vecs, "vid", "v", centers, tau = 0.9, maxBlock = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    // exactly-once: the explode-key join must never emit a pair twice
    assert(got.size == got.distinct.size)
    val expected = (for {
      x <- 0L until n; y <- (x + 1) until n; if adjacent(x, y)
    } yield (x, y)).toSeq
    assert(got.sorted == expected.sorted)
    // the bound genuinely drops non-adjacent pairs here...
    assert(expected.size < n * (n - 1) / 2)
    // ...and the default maxBlock leaves a small cluster exhaustive
    val all = TrainingOps.semDedup(vecs, "vid", "v", centers, tau = 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(all.sorted == (for { x <- 0L until n; y <- (x + 1) until n } yield (x, y)).sorted)
  }

  test("nearestCentroid is a codegen Expression agreeing with the HOF Column formula") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("embedding").isNotNull)
    val centers = Array.tabulate(16, 64)((c, i) => math.sin(c * 64 + i))
    // the zip_with/aggregate/array_min stack the expression replaced —
    // kept here as the independent reference formula
    val dists = centers.zipWithIndex.map { case (carr, cid) =>
      struct(
        aggregate(zip_with(col("embedding"), typedLit(carr.toSeq),
            (x, y) => { val d = x.cast("double") - y; d * d }),
          lit(0.0), (a, v) => a + v).as("dist"),
        lit(cid).as("cid"))
    }
    val hof = array_min(array(dists: _*)).getField("cid").cast("long")
    val df = emb.select(
      TrainingOps.nearestCentroid(col("embedding"), centers).as("fast"), hof.as("slow"))
    assert(df.where(col("fast") =!= col("slow")).count() == 0)
    // the assignment stays inside WholeStageCodegen over a file scan
    val plan = emb.select(TrainingOps.nearestCentroid(col("embedding"), centers).as("c"))
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
    // exact tie -> FIRST minimum (lowest cid)
    val tie = Seq((0L, Array(1.0f, 1.0f))).toDF("id", "v")
      .select(TrainingOps.nearestCentroid(col("v"),
        Array(Array(0.0, 0.0), Array(2.0, 2.0))).as("c"))
      .as[Long].head()
    assert(tie == 0L)
    // NULL element SKIPS its term (the DuckDB-replay semantics where
    // SUM drops the NULL (x-c)^2 row): [5, NULL] vs c0=[5,9] scores 0
    // (not 81 as a zero-filled element would), tying c1=[5,0] at 0 ->
    // first-min keeps cid 0
    val nullElem = Seq((0L, Seq[Option[Float]](Some(5.0f), None))).toDF("id", "v")
      .select(TrainingOps.nearestCentroid(col("v"),
        Array(Array(5.0, 9.0), Array(5.0, 0.0))).as("c"))
      .as[Long].head()
    assert(nullElem == 0L)
  }

  test("mixtureWeights: min stratum gets weight 1.0, weights equalize token volume") {
    val w = TrainingOps.mixtureWeights(corpus, "domain", "body")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._5)).toMap
    val (webTok, webW) = w("web"); val (bookTok, bookW) = w("books")
    assert(bookTok < webTok && bookW == 1.0)
    assert(math.abs(webW * webTok - bookTok) <= 0.0001 * webTok)
  }

  // plain-Scala splitmix64, the independent reference for shuffleShard
  private def smix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  test("shuffleShard: a deterministic permutation into shards, ordered by splitmix64") {
    val ids = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id").as[Long].collect().toSeq
    val out = TrainingOps.shuffleShard(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", numShards = 8)
      .select($"doc_id", $"skey", $"shard", $"pos")
      .as[(Long, Long, Long, Long)].collect().toSeq

    // a permutation: every doc exactly once, nothing invented
    assert(out.map(_._1).sorted == ids.sorted)
    // skey/shard are the plain-Scala splitmix64 of the id
    out.foreach { case (id, skey, shard, _) =>
      assert(skey == smix(id))
      assert(shard == java.lang.Math.floorMod(smix(id), 8L))
    }
    // positions are contiguous 0..n-1 within each shard, in (skey, id) order
    out.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      assert(sorted.map(_._4) == sorted.indices.map(_.toLong))
    }
    // bit-for-bit reproducible across runs
    val again = TrainingOps.shuffleShard(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", numShards = 8)
      .select($"doc_id", $"shard", $"pos")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(again == out.map(r => (r._1, r._3, r._4)).sorted)
  }

  test("writeShards: each shard file holds its full shard in exact pos order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards-").toFile
    try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      TrainingOps.writeShards(docs, "doc_id", numShards = 8, dir.toString)
      val want = TrainingOps.shuffleShard(docs, "doc_id", numShards = 8)
        .select($"shard", $"pos", $"doc_id")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (s, rows) =>
          s -> rows.sortBy(_._2).map(_._3).toSeq
        }
      (0 until 8).foreach { s =>
        val files = new java.io.File(dir, s"shard=$s").listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $s: one task writes one ordered run")
        // file order IS the training order: read back without any sort
        val shardDf = spark.read.parquet(files.head.toString)
        val got = shardDf.select($"doc_id").as[Long].collect().toSeq
        assert(got == want(s.toLong), s"shard $s order")
        // the derivable skey helper is NOT persisted
        assert(!shardDf.columns.contains("skey"))
      }
      assert(want.values.map(_.size).sum == docs.count())
      // the writer's (shard, skey, id) sort is the ordering the window
      // already established, so RemoveRedundantSorts elides it:
      // exactly ONE SortExec (the window's own) in the physical plan.
      // AQE wraps stages in leaf QueryStageExec nodes that hide their
      // subtrees from collect(), so plan the query with AQE off for
      // this one inspection (the physical preparation rules, including
      // RemoveRedundantSorts, are the same either way)
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val sorts =
        try {
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          TrainingOps.shuffleShard(docs, "doc_id", numShards = 8)
            .sortWithinPartitions($"shard", $"skey", $"doc_id").drop("skey")
            .queryExecution.executedPlan.collect {
              case x: org.apache.spark.sql.execution.SortExec => x
            }
        } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      assert(sorts.length == 1, s"redundant writer sort not elided: $sorts")
    } finally TestSpark.rmTree(dir)
  }

  test("SplitMix64 expression: codegen over a file scan, agrees with eval and the UDF path") {
    val emb = Tables.documents(spark, "/root/testdata/sf0.001")
    // interpreted eval == codegen'd column == plain Scala
    val vals = emb.select($"doc_id",
        graft.expressions.SplitMix64($"doc_id").as("h"))
      .as[(Long, Long)].collect()
    vals.foreach { case (id, h) => assert(h == smix(id)) }
    // stays inside WholeStageCodegen over the parquet scan
    val plan = emb.select(graft.expressions.SplitMix64($"doc_id").as("h"))
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
    // null in, null out
    val n = Seq[Option[Long]](None, Some(7L)).toDF("x")
      .select(graft.expressions.SplitMix64($"x").as("h")).collect()
    assert(n(0).isNullAt(0) && n(1).getLong(0) == smix(7L))
  }

  test("TextQualityFeatures: single-pass features == the Column regex stack, codegen, edges") {
    val stop = Seq("the", "is", "and", "of", "to", "a", "in")
    val cases = Seq(
      (0L, "the quick the fox is a a fox"),
      (1L, "   leading and trailing   "),
      (2L, "one"),
      (3L, ""),
      (4L, "   "),
      (5L, "a  b   a")) // multi-space runs, dup token
    val df = cases.toDF("id", "t")
    // independent reference: the exact Column formulas the expression replaced
    val toks = split(trim($"t"), " +")
    val ref = df.select($"id",
      size(toks).cast("long").as("n_tok"),
      length(regexp_replace(trim($"t"), " +", "")).cast("long").as("n_char"),
      size(filter(toks, x => x.isInCollection(stop))).cast("long").as("stop_hits"),
      size(array_distinct(toks)).cast("long").as("n_distinct"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val got = df.select($"id",
      graft.expressions.TextQualityFeatures($"t", stop).as("f"))
      .select($"id", $"f.n_tok", $"f.n_char", $"f.stop_hits", $"f.n_distinct")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == ref)
    // stays inside WholeStageCodegen over a file scan
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.expressions.TextQualityFeatures($"text", stop).as("f"))
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
    // null in, null out
    val n = Seq[Option[String]](None).toDF("t")
      .select(graft.expressions.TextQualityFeatures($"t", stop).as("f")).collect()
    assert(n(0).isNullAt(0))
  }

  test("qualityLogit: logit matches a plain-Scala feature recomputation, kept == logit > 0") {
    val stop = Set("the", "is", "and", "of", "to", "a", "in")
    val got = TrainingOps.qualityLogit(
        Tables.documents(spark, "/root/testdata/sf0.001"), "text")
      .select($"text", $"logit", $"kept")
      .as[(String, Double, Boolean)].collect()
    assert(got.length > 100)
    var keptN = 0
    got.foreach { case (text, logit, kept) =>
      val w = text.trim.split(" +").filter(_.nonEmpty)
      val nt = w.length.toDouble
      val atl = if (w.isEmpty) 0.0 else w.map(_.length).sum / nt
      val sr = if (w.isEmpty) 0.0 else w.count(stop) / nt
      val dup = if (w.isEmpty) 0.0 else 1.0 - w.distinct.length / nt
      val want = 0.05 * (nt - 56.0) + 2.0 * (atl - 4.5) -
        6.0 * (sr - 0.06) - 3.0 * (dup - 0.54)
      assert(logit == want, s"text=${text.take(40)}")
      assert(kept == (logit > 0.0))
      if (kept) keptN += 1
    }
    // the model discriminates on the fixture corpus: neither 0% nor 100%
    assert(keptN > got.length / 5 && keptN < got.length * 4 / 5)
  }
}
