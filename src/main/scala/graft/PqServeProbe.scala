package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the split-PQ-layout serving claim (r15 open thread #2) with
  * MEASURED reads, not an argument. Three quantities, reported as
  * parquet ROWS READ per stage (`inputMetrics.recordsRead` — byte
  * counters are unreliable on the local filesystem scheme, and rows ×
  * row width is the honest proxy: a float row is ~264 B, a codes row
  * ~17 B):
  *
  *  1. FUSED serve (the rule's ann_pq_rule shape): one scan of the
  *     codes+floats table reads every row at FLOAT width — the
  *     baseline.
  *  2. SPLIT shortlist stage: the codes-only scan reads every row at
  *     CODES width (~15× fewer bytes for the same row count).
  *  3. SPLIT float fetch: the pushed `id IN (shortlist)` prunes row
  *     groups off min/max stats, so its effect depends on the FLOAT
  *     LAYOUT — over an unsorted single file nothing can be skipped
  *     (every row group spans the full id range; the fetch reads the
  *     corpus and only the post-scan filter drops it), while over an
  *     id-range-partitioned, id-sorted layout the fetch reads only the
  *     row groups containing shortlist ids. Both layouts are measured
  *     side by side; the ranged number shrinks with file count (100
  *     shortlist ids touch ≤ 100 files no matter how many exist — at
  *     100 TB that is ≤ 100 of ~100k).
  *
  * The fused side runs THROUGH THE OPTIMIZER RULE (registerPq + the
  * staged LshProbeTopK rewrite) — the real serving path, not an
  * emulation. Results identical across all paths is asserted.
  *
  * Usage: runMain graft.PqServeProbe [rows]   (default 1,000,000)
  * Results recorded in README's ANN serving section.
  */
object PqServeProbe {

  private final class RowsRead extends SparkListener {
    @volatile var inputRecords = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) inputRecords += m.inputMetrics.recordsRead
    }
    def reset(): Unit = inputRecords = 0L
  }

  private def smix(x: Long): Long = graft.functions.TextFunctions.splitmix64(x)

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // above this threshold Spark pushes an IN-list to parquet as a
      // single [min,max] RANGE — 100 uniform shortlist ids span the
      // whole id range, so nothing is skipped (measured: 990k of 1M
      // rows still read). Sized >= the shortlist, the or-chained
      // point predicates skip precisely.
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new RowsRead
    spark.sparkContext.addSparkListener(listener)

    // deterministic 64-d corpus (uniform per coordinate — PQ recall is
    // not under test here; reads are)
    val dim = 64
    val vecOf = udf { (id: Long) =>
      Array.tabulate(dim)(j => ((smix(id * dim + j) % 2000L) / 1000.0).toFloat)
    }
    val naivePath = "target/pq-serve-probe/floats-naive"   // 1 unsorted file
    val rangedPath = "target/pq-serve-probe/floats-ranged" // 512 id-ranged sorted files
    val indexPath = "target/pq-serve-probe/index"
    val fusedPath = "target/pq-serve-probe/fused"
    if (!new java.io.File(naivePath, "_SUCCESS").exists()) {
      val gen = spark.range(rows)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      gen.coalesce(1).write.mode("overwrite").parquet(naivePath)
      gen.repartitionByRange(512, col("vec_id")).sortWithinPartitions("vec_id")
        .write.mode("overwrite").parquet(rangedPath)
    }
    val naive = spark.read.parquet(naivePath)
    val ranged = spark.read.parquet(rangedPath)

    val store = graft.index.PqIndexStore()
    if (!new java.io.File(s"$indexPath/codes/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      store.write(naive, col("vec_id"), col("embedding"), dim, indexPath,
        knownCount = rows)
      println(f"PQSERVE build (train+encode, one-time): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else println("PQSERVE build: skipped (exists)")
    val cb = store.loadCodebooks(spark, indexPath, dim)
    if (!new java.io.File(fusedPath, "_SUCCESS").exists()) {
      naive.join(
          spark.read.parquet(s"$indexPath/codes").withColumnRenamed("id", "vec_id"),
          "vec_id")
        .write.mode("overwrite").parquet(fusedPath)
    }

    val q = naive.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    def probe[A](label: String)(f: => A): A = {
      listener.reset()
      val t0 = System.nanoTime()
      val out = f
      // elapsed BEFORE the listener drain: the sleep is measurement
      // plumbing, and inside the window it inflated every warm
      // sub-second stage by ~1.0 s (r15 ADVICE)
      val elapsed = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener bus is async; let TaskEnd drain
      println(f"PQSERVE $label: $elapsed%.2f s, rowsRead=${listener.inputRecords}")
      out
    }

    // ---- fused: through the optimizer rule (the ann_pq_rule path) ----
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LshProbeRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LshProbeRewrite
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[graft.plans.LshProbeStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.LshProbeStrategy(spark)
    graft.plans.LshProbeRewrite.registerPq(fusedPath, cb, shortlist = 100)
    def fusedServe(): Seq[(Long, Double)] = {
      val out = spark.read.parquet(fusedPath)
        .withColumn("score",
          graft.expressions.CosineSimilarity(col("embedding"), typedlit(q.toSeq)))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
      require(out.queryExecution.optimizedPlan.toString.contains("adc_score"),
        "fused probe must serve through the staged rewrite")
      out.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val f1 = probe("fused rule serve, every row at FLOAT+code width (cold)")(fusedServe())
    probe("fused rule serve (warm)")(fusedServe())

    // ---- split, staged so each stage's reads are separately visible ----
    def shortlistIds(): Array[Long] =
      graft.index.PqKnn.searchEncoded(
          spark.read.parquet(s"$indexPath/codes"), q, cb, 100)
        .select(col("id")).collect().map(_.getLong(0))
    val ids = probe("split stage 1: codes-only shortlist scan (~17 B/row)")(shortlistIds())
    probe("split stage 1 (warm)")(shortlistIds())

    def fetch(floats: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      graft.index.BruteForceKnn.search(
          floats.where(col("vec_id").isin(ids.map(Long.box): _*)),
          col("embedding"), col("vec_id"), q, 5)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sNaive = probe("split stage 2: float fetch, UNSORTED 1-file layout " +
      "(no row group skippable)")(fetch(naive))
    val sRanged = probe("split stage 2: float fetch, id-RANGED 512-file layout " +
      "(pushed IN + inFilterThreshold>=shortlist skips non-matching row groups)")(fetch(ranged))
    probe("split stage 2 ranged (warm)")(fetch(ranged))

    // ---- single-plan join form (r16 open thread #1): the shortlist
    // becomes the broadcast build side of one plan — no driver hop,
    // codes-only compute win kept, but the float scan has no static
    // pushdown, and Spark's runtime bloom filter only injects on
    // SHUFFLE-application joins, so the broadcast form reads the float
    // corpus. Measured here so the two-plan hop's value is a number,
    // not an argument.
    def joinedServe(floats: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] = {
      val cand = graft.index.PqKnn.searchEncoded(
          spark.read.parquet(s"$indexPath/codes"), q, cb, 100)
        .select(col("id"))
      val pool = floats.join(broadcast(cand), col("vec_id") === col("id")).drop("id")
      graft.index.BruteForceKnn.search(pool, col("embedding"), col("vec_id"), q, 5)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val sJoined = probe("single-plan join form (broadcast shortlist, id-RANGED floats)")(
      joinedServe(ranged))
    probe("single-plan join form (warm)")(joinedServe(ranged))

    // ---- shuffle-join + runtime bloom filter experiment (r16 open
    // thread #3): InjectRuntimeFilter only targets shuffle-application
    // joins, so force the shortlist join to sort-merge (broadcast off)
    // with the bloom knobs opened (the 10 GB application-side default
    // would veto a probe-sized table), and report whether the float
    // scan's reads actually drop — the one configuration under which
    // the single-plan form COULD match the two-plan hop's I/O.
    def shuffleJoinServe(): (Seq[(Long, Double)], Boolean) = {
      // save ALL four knobs (r15 ADVICE: restoring only the broadcast
      // threshold left the bloom/runtime-filter knobs set for the
      // subsequent end-to-end split-serve measurement)
      val knobs = Seq(
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtimeFilter.number.threshold")
      val prev = knobs.map(k => k -> spark.conf.getOption(k))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "100")
      try {
        val cand = graft.index.PqKnn.searchEncoded(
            spark.read.parquet(s"$indexPath/codes"), q, cb, 100)
          .select(col("id"))
        val pool = ranged.join(cand, col("vec_id") === col("id")).drop("id")
        val out = graft.index.BruteForceKnn.search(
          pool, col("embedding"), col("vec_id"), q, 5)
          .select(col("vec_id"), round(col("score"), 4).as("score"))
        val bloomInjected =
          out.queryExecution.optimizedPlan.toString.contains("bloom_filter") ||
            out.queryExecution.executedPlan.toString.contains("bloom")
        (out.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq, bloomInjected)
      } finally {
        prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }
    }
    val (sShuffle, bloomed) = probe(
      "shuffle-join + runtime bloom (broadcast off, thresholds opened)")(shuffleJoinServe())
    println(s"PQSERVE bloom filter injected: $bloomed")
    require(sShuffle == f1, s"shuffle-join serve diverged: $sShuffle")

    // end-to-end split serve (the gate's exact path) for the identity check
    val sFull = store.searchRefinedSplit(spark, indexPath, ranged, "vec_id",
        "embedding", q, k = 5, dim = dim, candidates = 100)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    require(f1 == sNaive && f1 == sRanged && f1 == sFull && f1 == sJoined,
      s"paths diverged: fused=$f1 naive=$sNaive ranged=$sRanged " +
        s"full=$sFull joined=$sJoined")

    // ---- STORE-OWNED split layout (r16; r15 verdict #3): writeSplit
    // writes the id-ranged, id-sorted floats itself and
    // searchRefinedSplit raises the pushdown floor itself — so this
    // stage runs with the session threshold UNSET and no hand-staged
    // layout, proving the operating point holds by store construction
    // alone (rows-read must match the hand-tuned ranged number above).
    spark.conf.unset("spark.sql.parquet.pushdown.inFilterThreshold")
    val ownedPath = "target/pq-serve-probe/index-owned"
    if (!new java.io.File(s"$ownedPath/floats/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      store.writeSplit(naive, col("vec_id"), col("embedding"), dim, ownedPath,
        floatFiles = 512, knownCount = rows)
      println(f"PQSERVE store-owned build (one-time): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def ownedServe(): Seq[(Long, Double)] =
      store.searchRefinedSplit(spark, ownedPath, "vec_id", "embedding", q,
          k = 5, dim = dim, candidates = 100)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // NB this stage times BOTH stages in one call, so its rowsRead is
    // codes scan (= corpus rows at ~17 B) + float fetch: subtract the
    // corpus row count to read the float-side number (≈ the hand-tuned
    // ranged fetch above; boundaries differ only by the range
    // partitioner's sampling)
    val sOwned = probe("store-owned split serve, both stages " +
      "(codes scan + pruned float fetch; session conf UNSET)")(ownedServe())
    probe("store-owned split serve (warm)")(ownedServe())
    require(sOwned == f1, s"store-owned serve diverged: $sOwned vs $f1")

    // --- the r16 answer to the two-plan residual: ShortlistFetch ----
    // Same staging, same store-owned layout, but the driver hop lives
    // INSIDE one physical operator (the fetch is re-planned at
    // execution with the literal id IN) — a fresh plan per serve, so
    // rows-read must land where the two-plan form lands (corpus codes
    // + shortlist-proportional floats), with zero caller-side collect.
    def planServe(): Seq[(Long, Double)] =
      store.searchRefinedSplitPlan(spark, ownedPath, "vec_id", "embedding", q,
          k = 5, dim = dim, candidates = 100)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sPlan = probe("single-plan ShortlistFetch serve, both stages " +
      "(codes scan + pruned float fetch inside one plan)")(planServe())
    probe("single-plan ShortlistFetch serve (warm)")(planServe())
    require(sPlan == f1, s"single-plan serve diverged: $sPlan vs $f1")
    println(s"PQSERVE results identical across paths: ${f1.mkString(", ")}")

    // ---- large-union fetches past the 512-point push ceiling (r17;
    // r16 verdict #3). r16 behavior past 512 ids: threshold capped, the
    // IN pushed as ONE [min,max] range -> uniform ids read ~the corpus
    // (measured 990k of 1M). Now the sorted list splits into
    // ceiling-sized chunked sub-scans (range + point list each), so:
    //  - no StackOverflowError at ANY width (each pushed or-chain is
    //    <= 512 points; the raw 2,000-point chain crashed the task
    //    stack when bisected in r16);
    //  - rows-read lands on the PHYSICAL floor: the row groups that
    //    actually contain a shortlist id. A clustered union reads a
    //    sliver of the corpus; a uniform union at n >= #files touches
    //    every file by pigeonhole — that floor belongs to the layout's
    //    row-group width, not to the fetch strategy, and is stated
    //    honestly here rather than hidden behind an average.
    def unionFetch(label: String, ids: Array[Long]): Unit = {
      import spark.implicits._
      val sl = ids.toSeq.toDF("id").queryExecution.analyzed
      val fetched = org.apache.spark.sql.graft.SqlShims.ofRows(spark,
        graft.plans.ShortlistFetch(sl.output.find(_.name == "id").get,
          ranged.queryExecution.analyzed, "vec_id", ids.length, sl))
      val n = probe(label)(fetched.count())
      require(n == ids.length.toLong, s"$label returned $n of ${ids.length} rows")
    }
    // 2,000 ids confined to the first ~1% of the id space: the chunk
    // ranges confine every sub-scan there (expect ~n-proportional reads)
    unionFetch("union-fetch 2000 CLUSTERED ids, chunked sub-scans",
      Array.tabulate(2000)(i => i.toLong * 5))
    // 2,000 / 5,000 uniform ids: every file holds one by pigeonhole —
    // the floor IS the corpus here; what the chunked path proves is
    // completion (no stack overflow) + exact results at widths where
    // r16's path either crashed (pushed points) or always read the
    // corpus (range degradation)
    unionFetch("union-fetch 2000 UNIFORM ids (no StackOverflow)",
      Array.tabulate(2000)(i => i.toLong * (rows / 2000)))
    unionFetch("union-fetch 5000 UNIFORM ids (no StackOverflow)",
      Array.tabulate(5000)(i => i.toLong * (rows / 5000)))

    // ---- the uniform-union floor moved (r17): the floor is the
    // row-group width, and writeSplit now owns it. A 32 KB-group float
    // layout (~120 rows/group at 264 B/row) gives the 2,000-uniform-id
    // fetch ~2,000 groups to skip INTO instead of reading every
    // 2,000-row default group — the write-amplification trade is the
    // build time + size printed alongside.
    val fineRanged = "target/pq-serve-probe/floats-fine"
    if (!new java.io.File(fineRanged, "_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      naive.repartitionByRange(512, col("vec_id")).sortWithinPartitions("vec_id")
        .write.mode("overwrite").option("parquet.block.size", "32768")
        .parquet(fineRanged)
      def duOf(p: String): Long = {
        def du(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
          else f.length()
        du(new java.io.File(p))
      }
      println(f"PQSERVE fine-group build (one-time): ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
        f"bytes=${duOf(fineRanged)} vs default=${duOf(rangedPath)}")
    }
    val fine = spark.read.parquet(fineRanged)
    def unionFetchOn(label: String, floats: org.apache.spark.sql.DataFrame,
                     ids: Array[Long]): Unit = {
      import spark.implicits._
      val sl = ids.toSeq.toDF("id").queryExecution.analyzed
      val fetched = org.apache.spark.sql.graft.SqlShims.ofRows(spark,
        graft.plans.ShortlistFetch(sl.output.find(_.name == "id").get,
          floats.queryExecution.analyzed, "vec_id", ids.length, sl))
      val n = probe(label)(fetched.count())
      require(n == ids.length.toLong, s"$label returned $n of ${ids.length} rows")
    }
    unionFetchOn("union-fetch 2000 UNIFORM ids, 32KB row groups",
      fine, Array.tabulate(2000)(i => i.toLong * (rows / 2000)))
    spark.stop()
  }
}
