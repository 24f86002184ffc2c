package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup pipelines at 10× the bench corpus: every document appears in
  * `copies` copies (distinct ids), so the pipelines face a genuinely
  * duplicate-heavy corpus — minhash candidate generation must surface
  * ~N·C(copies,2) true pairs through band buckets without a cartesian.
  * Usage: runMain graft.DedupProbe [copies]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, "/root/testdata/sf0.1") // 5000 docs
    // derive the re-basing offset so copies can never collide even if
    // the fixture's id range changes
    val idBase = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val big = base.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * idBase).as("doc_id"),
        col("text"), col("source"))
    val bigPath = "target/dedup-probe/corpus"
    big.write.mode("overwrite").parquet(bigPath)
    val corpus = spark.read.parquet(bigPath)
    println(s"DEDUP corpus rows=${corpus.count()}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DEDUP $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("exact stats (md5 hash-agg)") {
      Dedup.exactStats(corpus, col("source"), col("text")).count()
    }
    time("minhash near-dups (sig + band join + array verify)") {
      Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.9).count()
    }
    time("simhash near-dups (64-bit sketch + band blocking)") {
      Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = 3).count()
    }
    // the rest of the training-pipeline tier on the same corpus — with
    // every doc duplicated `copies`×, decontamination faces a gram
    // table `copies`× wider and the benchmark split is still broadcast
    import graft.pipeline.TrainingOps
    time("decontaminate (4-gram overlap vs broadcast benchmark split)") {
      TrainingOps.decontaminate(corpus, "doc_id", "text",
        isBenchmark = col("doc_id") % 50 === 0).count()
    }
    time("stratified sample (splitmix64 of id, agg by source)") {
      TrainingOps.stratifiedKept(corpus, "doc_id", lit(50))
        .groupBy(col("source")).agg(count(when(col("kept"), 1))).count()
    }
    time("pack sequences (512-token bins, (source, id-range) shards)") {
      TrainingOps.packSequences(
        corpus.withColumn("shard", expr("doc_id div 100000")),
        "doc_id", "text", Seq(col("source"), col("shard"))).count()
    }
    // every doc has 9 exact copies, so EVERY 8-token window is shared:
    // the md5-digest window table faces its worst case (full corpus in
    // both the shared-set agg and the coverage join)
    time("substring coverage (8-token md5 windows, countDistinct >= 2)") {
      TrainingOps.substringCoverage(corpus, "doc_id", "text").count()
    }
    time("unigram surprisal (freq join + per-doc mean)") {
      TrainingOps.unigramSurprisal(corpus, "doc_id", "text").count()
    }
    // with every doc copied 10x, the benchmark gram set is the same
    // but the training-side gram stream is 10x wider — the regime
    // where the bloom screen (applied before any shuffle) pays
    time("decontaminate via bloom screen (sketch + exact verify)") {
      TrainingOps.decontaminateBloom(corpus, "doc_id", "text",
        isBenchmark = col("doc_id") % 50 === 0).count()
    }
    time("tf-idf top-3 terms (pre-agg df join + WindowGroupLimit)") {
      TrainingOps.tfIdfTopK(corpus, "doc_id", "text").count()
    }
    // image tier on the same duplicate-heavy corpus: every doc's P5
    // blob is decoded by the real codec and fingerprinted to 8 bytes;
    // with `copies` exact copies per image the banded join faces
    // ~N·C(copies,2) true hash-identical pairs — the shared
    // banded-Hamming machinery must surface them without a cartesian,
    // and the join input is hashes, never pixels
    time("image aHash + banded-Hamming pairs (decode + 8B/image join)") {
      Dedup.hammingBandPairs(
        graft.multimodal.Multimodal.imagePhashes(spark,
          corpus.withColumn("blob",
            graft.multimodal.Multimodal.syntheticPgmUdf(col("text"))),
          "doc_id", "blob").toDF(),
        "doc_id", "phash", maxHamming = 8).count()
    }

    // ---- incremental ingest vs full re-dedup ----------------------
    // The claim under test: with the corpus's MinHash index stored
    // (corpusIndex → parquet, read back like any at-rest table), a
    // fixed-size nightly batch costs the SAME regardless of corpus
    // size, while re-running the full self-dedup grows with the
    // corpus. Corpus = k copies of sf0.1, batch = one sf0.1 copy
    // re-based above every corpus id.
    locally {
      val batch = base.select((col("doc_id") + copies * idBase).as("doc_id"),
        col("text"), col("source"))
      Seq(2, 5, copies).distinct.sorted.foreach { k =>
        val corpusK = corpus.where(col("doc_id") < k * idBase)
        val (shC, bandC) = Dedup.corpusIndex(corpusK, "doc_id", "text")
        val idxPath = s"target/dedup-probe/idx-$k"
        val tb = System.nanoTime()
        shC.write.mode("overwrite").parquet(s"$idxPath/shingles")
        bandC.write.mode("overwrite").parquet(s"$idxPath/bands")
        println(f"DEDUP corpus-index build+store (${k}x): ${(System.nanoTime() - tb) / 1e9}%.2f s")
        val shStored = spark.read.parquet(s"$idxPath/shingles")
        val bandStored = spark.read.parquet(s"$idxPath/bands")
        time(s"incremental ingest, 5k batch vs stored ${k}x index") {
          Dedup.incrementalNearDupsAgainst(shStored, bandStored,
            batch, "doc_id", "text", threshold = 0.9).count()
        }
        time(s"full re-dedup, corpus ${k}x + batch") {
          Dedup.minhashNearDups(corpusK.unionByName(batch),
            "doc_id", "text", threshold = 0.9).count()
        }
      }
    }

    // embedding tier at 10x: every vector appears `copies` times with
    // distinct ids, so semantic dedup faces ~N*C(copies,2) true
    // within-cluster pairs. k=64, not the gate's k=8: SemDeDup's
    // regime scales the cluster count with the corpus so per-cluster
    // membership (and the quadratic pair expansion) stays bounded —
    // this probe exercises exactly that knob.
    val embBase = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .where(col("embedding").isNotNull)
    val vecBase = embBase.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val bigEmbPath = "target/dedup-probe/emb"
    embBase.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * vecBase).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(bigEmbPath)
    val embCorpus = spark.read.parquet(bigEmbPath)
    println(s"DEDUP emb rows=${embCorpus.count()}")
    // ---- LSH near-dup shuffle width: three formulations of the ----
    // same pair set, measured head-to-head. The shipped one scores
    // inside the bucket join and dedups (id, id, cos) triples of
    // PASSING pairs; "dedup-then-score" dedups raw candidate keys
    // first (the threshold cannot run before that exchange — every
    // occurrence crosses it); "wide-distinct" dedups (ids + both
    // embeddings) then scores, surviving only because Catalyst pushes
    // the cos filter below the distinct. Same output (asserted); the
    // shuffle-bytes ranking is the design evidence in Dedup's
    // Scaladoc.
    locally {
      import graft.functions.VectorFunctions
      import org.apache.spark.sql.DataFrame
      val numTables = 8
      def bucketedWide(emb: DataFrame): DataFrame = {
        val lsh = graft.index.RandomHyperplaneLsh(numTables, 8, 42L)
        lsh.withBuckets(emb.where(col("embedding").isNotNull), col("embedding"), 64)
          .select(col("vec_id").as("id"), col("embedding").as("emb"),
            explode(array((0 until numTables).map(t =>
              struct(lit(t).as("t"), col("buckets").getItem(t).as("bucket"))): _*)).as("tb"))
          .select(col("id"), col("emb"), col("tb.t"), col("tb.bucket"))
      }
      def wideDistinct(emb: DataFrame, threshold: Double): DataFrame = {
        val bucketed = bucketedWide(emb)
        val a = bucketed.toDF("id_a", "emb_a", "t", "bucket")
        val b = bucketed.toDF("id_b", "emb_b", "t", "bucket")
        a.join(b, Seq("t", "bucket"))
          .where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("emb_a"), col("emb_b"))
          .distinct()
          .withColumn("cos", VectorFunctions.cosine(col("emb_a"), col("emb_b")))
          .where(col("cos") >= threshold)
          .select(col("id_a"), col("id_b"), col("cos"))
      }
      def dedupThenScore(emb: DataFrame, threshold: Double): DataFrame = {
        val keys = bucketedWide(emb).select(col("id"), col("t"), col("bucket"))
        val a = keys.toDF("id_a", "t", "bucket")
        val b = keys.toDF("id_b", "t", "bucket")
        val pairs = a.join(b, Seq("t", "bucket"))
          .where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
          .distinct()
        val vecs = emb.where(col("embedding").isNotNull)
          .select(col("vec_id").as("id"), col("embedding").as("emb"))
        pairs
          .join(vecs.toDF("id_a", "emb_a"), "id_a")
          .join(vecs.toDF("id_b", "emb_b"), "id_b")
          .withColumn("cos", VectorFunctions.cosine(col("emb_a"), col("emb_b")))
          .where(col("cos") >= threshold)
          .select(col("id_a"), col("id_b"), col("cos"))
      }
      // Measure in the 100 TB REGIME: broadcasts off. At probe scale
      // the engine hides the legacy formulation's width by
      // broadcasting the bucket join (the wide distinct then collapses
      // map-side inside a handful of partitions); past ~100 GB neither
      // side is broadcastable and every byte below goes through a real
      // exchange — that is the regime the keys-only redesign is for,
      // so that is the regime the A/B must measure.
      val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val savedAqeBc = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        val (nNew, bNew, sNew) = Probe.withShuffleBytes(spark) {
          Dedup.embeddingNearDupsLsh(embCorpus, "vec_id", "embedding", 0.9, dim = 64).count()
        }
        val (nWide, bWide, sWide) = Probe.withShuffleBytes(spark) {
          wideDistinct(embCorpus, 0.9).count()
        }
        val (nKeys, bKeys, sKeys) = Probe.withShuffleBytes(spark) {
          dedupThenScore(embCorpus, 0.9).count()
        }
        assert(nNew == nWide && nNew == nKeys,
          s"LSH formulations disagree on the pair set: $nNew / $nWide / $nKeys")
        println(f"DEDUP lsh-neardup score-in-join (shipped):  $sNew%.2f s, shuffle ${bNew / 1e6}%.1f MB ($nNew pairs)")
        println(f"DEDUP lsh-neardup wide-distinct:            $sWide%.2f s, shuffle ${bWide / 1e6}%.1f MB")
        println(f"DEDUP lsh-neardup dedup-then-score:         $sKeys%.2f s, shuffle ${bKeys / 1e6}%.1f MB")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
        savedAqeBc match {
          case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
          case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
      }
    }

    val t0 = System.nanoTime()
    val centers = graft.index.MllibIndexes
      .kmeansIvfWithCenters(embCorpus, "embedding", k = 64, maxIter = 3)._2
    println(f"DEDUP kmeans fit (k=64, 3 iters): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    time("cluster balance (1-pass bucket histogram off inlined centroids)") {
      TrainingOps.clusterBalance(embCorpus, "vec_id", "embedding", centers).count()
    }
    time("semantic dedup (within-cluster pairs, tau 0.4)") {
      TrainingOps.semDedup(embCorpus, "vec_id", "embedding", centers, tau = 0.4).count()
    }
    spark.stop()
  }
}
