package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch instrumentation main for stage-level timing.
  * Usage: runMain graft.Probe [queryName ...] — with args, times the
  * named gate queries (3 runs each) instead of the minhash stages.
  */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    r
  }

  /** Run `f` and report (result, shuffle read+write bytes, seconds) —
    * the shared instrument for probe mains arguing a shuffle-width
    * claim with a measurement instead of a plan reading. Probes run
    * their sections sequentially, so a stage-completed listener delta
    * attributes cleanly.
    */
  def withShuffleBytes[A](spark: SparkSession)(f: => A): (A, Long, Double) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      val r = f
      // drain the bus so late stage events land before the read
      try {
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        val m = bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount <= 1).get
        if (m.getParameterCount == 0) m.invoke(bus)
        else m.invoke(bus, java.lang.Long.valueOf(10000L))
      } catch { case _: Throwable => Thread.sleep(500) }
      (r, bytes.get(), (System.nanoTime() - t0) / 1e9)
    } finally sc.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.nonEmpty) {
      args.foreach { name =>
        (1 to 3).foreach { i =>
          time(s"$name run$i")(Queries.all(name)(spark, sfDir).count())
        }
      }
    } else {
      val docs = Tables.documents(spark, sfDir)
      val sh = Dedup.shingleTable(docs, "doc_id", "text", 3).cache()
      time("shingles")(sh.count())
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text").cache()
      time("signatures")(sigs.count())
      val cands = Dedup.minhashCandidatePairs(sigs).cache()
      time("candidates")(cands.count())
      val verified = Dedup.verifyJaccard(sh, cands)
      time("verify")(verified.where(col("jaccard") >= 0.5).count())
    }
    spark.stop()
  }
}
