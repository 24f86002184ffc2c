package graft

import org.apache.spark.sql.SparkSession

/** Long-session GC probe (r13 verdict #3): reproduce the DRIVER's
  * session shape — every correctness gate once (sf0.01), then
  * Bench-style 3-run timings of the allocator-heavy tier (sf0.1) — in
  * ONE JVM, recording per-gate gc_ms + post-gate heap, then fork a
  * fresh JVM per gate ([[Bench.freshJvmRerun]]) and report the
  * long-session / fresh-JVM spread. The r13 flag (simjoin 4.5 s warm
  * → 15–17 s with 13–14 s gc_ms late in the driver session) was
  * exactly this shape, and neither `sbt test` nor a fresh BenchOne
  * could see it.
  *
  * Heap lever A/B via env (run the probe twice, compare artifacts):
  *   SPARK_GRAFT_PERIODIC_GC=1min  → spark.cleaner.periodicGC.interval
  *     (forces the ContextCleaner's reference-tracking GC so dead
  *     broadcast/shuffle state from hundreds of prior gates is
  *     reclaimed instead of accumulating into old-gen pressure).
  *
  * Output: one JSON line to stdout + the same to
  * docs/LONG_SESSION_PROBE.json (override SPARK_GRAFT_PROBE_OUT).
  */
object LongSessionProbe {

  private val heavyTier = Seq(
    "simjoin_prefix_collapsed", "simjoin_prefix_jaccard",
    "dedup_trigram_jaccard", "tfidf_top_terms",
    "dedup_minhash", "dedup_incremental", "dedup_substring",
    // r15 heavy additions: the batched serving joins and the batched
    // escalation ladder — multi-join DAGs over broadcast request sides,
    // the new allocator-heavy shapes a long session accumulates
    "knn_serve_stream_batched_mp", "knn_filtered_adaptive_batched",
    // r16 additions: the rule-rewritten ladder (re-entrant optimization
    // per query — the one shape that builds plans INSIDE the optimizer)
    // and the REST bridge path (engine state + layout lease per serve)
    "knn_filtered_rule_adaptive", "knn_filtered_ivf_adaptive",
    "search_o12_registered",
    // r16 batched-rewrite additions: every shape that composes +
    // re-entrantly optimizes plans inside the rule (static batched,
    // ladder batched, split-PQ batched with its ShortlistFetch nested
    // execution + per-request LUT broadcast)
    "knn_serve_batched_rule", "knn_filtered_batched_rule",
    "knn_serve_batched_pq_rule")

  def main(args: Array[String]): Unit = {
    val sfSmall = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val sfBench = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val periodicGc = sys.env.get("SPARK_GRAFT_PERIODIC_GC")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    periodicGc.foreach(v => b.config("spark.cleaner.periodicGC.interval", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def heapMb: Long =
      java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / (1 << 20)

    // ---- phase 1: the correctness-shaped load (every gate once) ----
    val p0 = System.nanoTime(); val gc0 = gcMs
    var failed = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfSmall).collect() // driver retains nothing, like Verify
      catch { case _: Throwable => failed ::= name }
    }
    val phase1Sec = (System.nanoTime() - p0) / 1e9
    val phase1Gc = gcMs - gc0

    // ---- phase 2: Bench-style timings of the heavy tier, in-session --
    val inSession = heavyTier.map { name =>
      val runs = (1 to 3).map { _ =>
        graft.dedup.Dedup.releaseScratch(spark)
        val g0 = gcMs; val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(name)(spark, sfBench).count(); true }
                 catch { case _: Throwable => false }
        val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        (sec, gcMs - g0)
      }
      val med = runs.sortBy(_._1).apply(1)
      (name, med._1, runs.map(_._2).sum, heapMb, runs)
    }

    // ---- phase 3: fresh-JVM twin per gate (the clean baseline) ------
    val fresh = heavyTier.map { name =>
      name -> Bench.freshJvmRerun(sfBench)(name)
        .map(_.suspectSec).getOrElse(-1.0)
    }.toMap

    val gates = inSession.map { case (name, med, gcSum, heap, runs) =>
      val f = fresh(name)
      val spread = if (f > 0 && med > 0) med / f else -1.0
      val runsJson = runs.map { case (s, g) => f"""{"sec":$s%.3f,"gc_ms":$g}""" }
        .mkString("[", ",", "]")
      f""""$name":{"long_median_sec":$med%.3f,"fresh_jvm_sec":$f%.3f,"spread":$spread%.2f,"gc_ms_3runs":$gcSum,"heap_after_mb":$heap,"runs":$runsJson}"""
    }.mkString("{", ",", "}")
    val json =
      f"""{"probe":"long_session","periodic_gc":${periodicGc.map(v => "\"" + v + "\"").getOrElse("null")},"phase1_sec":$phase1Sec%.1f,"phase1_gc_ms":$phase1Gc,"phase1_failed":${failed.size},"gates":$gates}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "docs/LONG_SESSION_PROBE.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
