package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale A/B for the two decontamination formulations
  * ([[graft.pipeline.TrainingOps.decontaminate]] — exact gram join —
  * vs [[graft.pipeline.TrainingOps.decontaminateBloom]] — a ~1.2 B/gram
  * Bloom sketch screens grams BEFORE the shuffle, exact verify on the
  * ~fpp survivors): same 200×-blown-up corpus (1M docs), 0.1% of docs
  * marked as the benchmark set, both paths must produce the identical
  * (doc, n_hits) table, and the question is what the pre-shuffle
  * screen is worth in wall time and exchanged bytes at corpus scale.
  * Shuffle bytes from the Spark listener, drained around each window
  * like Bench. Results in README's scale section.
  *
  * Usage: runMain graft.DecontamScaleProbe [copies]
  */
object DecontamScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-decontam-scale-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = (0 until copies).map(c =>
        Tables.documents(spark, "/root/testdata/sf0.1")
          .select(col("doc_id"), col("text"))
          .withColumn("doc_id", col("doc_id") + lit(c.toLong * 10000000L)))
      .reduce(_ unionByName _)
      .repartition(64)
      .persist()
    val n = docs.count()
    val isBench = col("doc_id") % 1000 === 0 // 0.1% benchmark docs

    @volatile var shuffle = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffle += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })
    def drainBus(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        val m = bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount <= 1).get
        if (m.getParameterCount == 0) m.invoke(bus)
        else m.invoke(bus, java.lang.Long.valueOf(10000L))
      } catch { case _: Throwable => Thread.sleep(200) }
    def timed[A](f: => A): (A, Double, Double) = {
      drainBus()
      val s0 = shuffle; val t0 = System.nanoTime()
      val a = f
      drainBus()
      ((a, (System.nanoTime() - t0) / 1e9, (shuffle - s0) / 1e6))
    }
    // checksum = (rows, Σ doc_id·n_hits) — order-free exact equality
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("doc_id") * col("n_hits"))).head()
      (r.getLong(0), r.getLong(1))
    }

    val (exactSig, exactSec, exactMb) = timed(sig(
      graft.pipeline.TrainingOps.decontaminate(docs, "doc_id", "text", isBench)))
    val (bloomSig, bloomSec, bloomMb) = timed(sig(
      graft.pipeline.TrainingOps.decontaminateBloom(docs, "doc_id", "text", isBench)))
    println(f"""{"probe":"decontam_scale","docs":$n,""" +
      f""""flagged_docs":${exactSig._1},"identical":${exactSig == bloomSig},""" +
      f""""exact_sec":$exactSec%.1f,"exact_shuffle_mb":$exactMb%.1f,""" +
      f""""bloom_sec":$bloomSec%.1f,"bloom_shuffle_mb":$bloomMb%.1f}""")
    spark.stop()
  }
}
