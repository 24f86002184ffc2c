package graft

import graft.state.{Engine, EngineSpill}
import org.apache.spark.sql.SparkSession

/** Engine spill tier at scale (r13 verdict stretch #8): EngineSpillSpec
  * proves semantics at 2.5× past the bound; nothing measured the
  * archived-tier CONTRACT at a realistic archive ratio — search latency
  * across resident+archived, and the Bloom filter's promise that a
  * definite miss never pays a distributed parquet scan while holding
  * the write lock.
  *
  * Shape: 1M chunks through a maxChunks=200k engine → 4 spill segments
  * (800k archived, 80%) + 200k resident. Measures:
  *  - load wall (1M driver-side adds incl. 4 segment writes),
  *  - chunksDF count + exact top-10 search over the full store ×3,
  *  - write-lock probe cost split by Bloom outcome: archived-id updates
  *    (Bloom HIT → one pruned parquet probe → typed immutability error)
  *    vs absent-id updates (Bloom MISS → no scan → NotFound), 20 each.
  *
  * Usage: runMain graft.SpillScaleProbe [nChunks] [maxResident]
  */
object SpillScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val maxResident = if (args.length > 1) args(1).toInt else n / 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_spill_probe_").toFile
    dir.delete()
    val dim = 16
    def vec(i: Int): Array[Float] = {
      // deterministic non-degenerate direction per chunk
      val a = Array.tabulate(dim)(j =>
        math.sin(0.7 * i + 1.3 * j + 0.1).toFloat)
      a
    }
    try {
      val e = new Engine(maxChunks = maxResident,
        spill = Some(EngineSpill(spark, dir.getAbsolutePath)))
      val lib = e.createLibrary("L")
      val doc = e.addDocument(lib.id, "D")
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        e.addChunk(lib.id, doc.id, s"chunk text $i", Some(vec(i)), id = Some(s"c$i"))
        i += 1
      }
      val loadSec = (System.nanoTime() - t0) / 1e9
      val segs = e.state.spillSegments.size
      println(f"LOAD n=$n maxResident=$maxResident segments=$segs " +
        f"resident=${e.state.chunks.size} load_sec=$loadSec%.1f")

      // full-store serving: count + exact top-10 search, 3 runs each
      for (r <- 1 to 3) {
        val c0 = System.nanoTime()
        val cnt = e.chunksDF(spark).count()
        val cSec = (System.nanoTime() - c0) / 1e9
        val s0 = System.nanoTime()
        val svc = new graft.search.SearchService(spark, e)
        val hits = svc.search(lib.id, queryEmbedding = Some(vec(7)), k = 10).hits
        val sSec = (System.nanoTime() - s0) / 1e9
        println(f"RUN$r count=$cnt count_sec=$cSec%.2f search_sec=$sSec%.2f " +
          s"top=${hits.head.chunk_id}")
      }

      // Bloom-split probe cost under the write lock: archived ids are
      // early adds (spilled), absent ids never existed. Both run
      // updateChunk, the path that needs the resident-miss / archived /
      // not-found distinction.
      // reported as (first, warm-mean): the resident lookup is the
      // lazy per-snapshot chunkByKey map (r14 verdict #6), so the
      // FIRST probe after a mutation pays its one O(resident) build
      // and every later probe on that snapshot is a hash lookup —
      // both numbers are the honest story (a write-heavy phase pays
      // ~the old linear scan once per snapshot, a read-heavy phase
      // amortizes it to ~zero)
      // warm numbers are reported as MEDIAN + MAX, not mean: the warm
      // miss distribution is bimodal — almost every probe is a hash
      // lookup + Bloom reject (μs), but a ~1%-per-filter Bloom false
      // positive pays one pruned parquet probe (~hundreds of ms), and
      // a mean smears the two regimes into a number that describes
      // neither. The max IS the FP cost, priced explicitly.
      // parquet rows materialized per archived-id probe: the id-sorted
      // segment layout (r15, Engine.spillSegment) is a rows-READ win —
      // at probe scale the latency is planning-dominated, so the
      // pruning shows here, not in the ms columns
      val rowsRead = new org.apache.spark.scheduler.SparkListener {
        val n = new java.util.concurrent.atomic.AtomicLong
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            n.addAndGet(te.taskMetrics.inputMetrics.recordsRead): Unit
      }
      spark.sparkContext.addSparkListener(rowsRead)
      def probeMs(ids: Seq[String]): (Double, Double, Double, Seq[String]) = {
        val outcomes = scala.collection.mutable.ListBuffer.empty[String]
        val times = ids.map { id =>
          val t = System.nanoTime()
          try { e.updateChunk(lib.id, doc.id, id, text = Some("x")); outcomes += "updated" }
          catch {
            case ex: graft.state.BadRequestError => outcomes += "immutable"
            case _: graft.state.NotFoundError    => outcomes += "notfound"
          }
          (System.nanoTime() - t) / 1e6
        }
        val warm = times.tail
        val med = if (warm.isEmpty) -1.0 else warm.sorted.apply(warm.size / 2)
        (times.head, med, if (warm.isEmpty) -1.0 else warm.max, outcomes.distinct.toSeq)
      }
      val archivedIds = (0 until 20).map(k => s"c${k * 997}") // early adds -> spilled
      val absentIds = (0 until 20).map(k => s"nope$k")
      val (missFirst, missMed, missMax, missOut) = probeMs(absentIds)
      // drain the async listener bus BEFORE resetting the counter
      // (r15 ADVICE): late TaskEnd events from the miss probes would
      // otherwise leak into hit_rows_read_per_probe
      Thread.sleep(1000)
      rowsRead.n.set(0L)
      val (hitFirst, hitMed, hitMax, hitOut) = probeMs(archivedIds)
      Thread.sleep(1000) // listener bus is async
      println(f"BLOOM hit_first_ms=$hitFirst%.1f hit_warm_median_ms=$hitMed%.1f hit_warm_max_ms=$hitMax%.1f outcomes=$hitOut " +
        f"miss_first_ms=$missFirst%.2f miss_warm_median_ms=$missMed%.4f miss_warm_max_ms=$missMax%.1f outcomes=$missOut " +
        f"warm_median_ratio=${hitMed / missMed}%.0f " +
        f"hit_rows_read_per_probe=${rowsRead.n.get / archivedIds.size}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
      spark.stop()
    }
  }
}
