package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the watermarked stream-stream join: replays a
  * `copies`-fold blow-up of the sf0.1 events table through
  * [[graft.streaming.EventStreams.clickAttribution]] in EVENT-TIME
  * ORDER (range-split files, one micro-batch each), so the watermark
  * advances batch over batch exactly as it would against a live
  * ingest. The number under test is the state store's
  * `numRowsTotal` high-water mark: with a 2-hour watermark over a
  * 30-day stream it must track the join horizon (interval × arrival
  * rate), NOT the stream length — the property that lets the join run
  * indefinitely at 100 TB. Results recorded in docs/PIPELINE.md.
  *
  * Usage: runMain graft.StreamProbe [copies] [files]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev0 = Tables.events(spark, "/root/testdata/sf0.1")
    val ev = (0 until copies).map(c =>
        ev0.withColumn("event_id", col("event_id") + lit(c.toLong * 10000000L)))
      .reduce(_ unionByName _)
      .cache()
    val total = ev.count()

    // Event-time-ordered replay files: split [minTs, maxTs] into
    // nFiles ranges and write each range as one parquet file with
    // ascending mtimes, so FileStreamSource replays them in order.
    val (minMs, maxMs) = {
      val r = ev.agg(min(col("ts")), max(col("ts"))).head()
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }
    val dir = Files.createTempDirectory("graft_stream_probe_").toFile
    val inDir = dir.getAbsolutePath
    val span = math.max(1L, (maxMs - minMs) / nFiles + 1)
    (0 until nFiles).foreach { i =>
      val lo = minMs + i * span
      val hi = lo + span
      // unix_millis keeps sub-second precision — a cast-to-long floors
      // to whole seconds and silently drops the first partial second's
      // rows below every range's lower bound
      ev.where(unix_millis(col("ts")) >= lo && unix_millis(col("ts")) < hi)
        .coalesce(1).write.mode("append").parquet(inDir)
      // stamp ascending mtimes as ranges are written (2 s apart)
      dir.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .sortBy(_.lastModified).zipWithIndex
        .foreach { case (f, j) => f.setLastModified(1000000000000L + j * 2000L) }
    }

    val base = Files.createTempDirectory("graft_stream_probe_run_").toFile
    val outDir = s"${base.getAbsolutePath}/out"
    val ckDir = s"${base.getAbsolutePath}/ck"
    val stream = spark.readStream.schema(ev0.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val clicks = stream.where(col("event_type") === "click")
    val purchases = stream.where(col("event_type") === "purchase")
    // Accumulate the state high-water mark via a listener:
    // q.recentProgress keeps only the last ~100 entries, so a long
    // replay would evict the peak batch and underreport the exact
    // number this probe exists to measure.
    object HighWater extends org.apache.spark.sql.streaming.StreamingQueryListener {
      @volatile var maxState = 0L
      @volatile var batches = 0L
      override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        batches += 1
        e.progress.stateOperators.foreach(s => maxState = math.max(maxState, s.numRowsTotal))
      }
      override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(HighWater)
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStreams.clickAttribution(clicks, purchases)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .start()
    try q.processAllAvailable() finally {
      val sec = (System.nanoTime() - t0) / 1e9
      // the listener bus is async — take the union of the listener's
      // view and the (possibly truncated) recentProgress window so a
      // tail event still in flight can't shave the peak
      val recent = q.recentProgress.toSeq
      q.stop()
      Thread.sleep(500) // let the listener bus drain
      spark.streams.removeListener(HighWater)
      val maxState = math.max(HighWater.maxState,
        recent.flatMap(_.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max))
      val batches = math.max(HighWater.batches, recent.size.toLong)
      val pairs = spark.read.parquet(outDir).count()
      println(f"""{"probe":"stream_join","copies":$copies,"total_rows":$total,""" +
        f""""batches":$batches,"pairs":$pairs,"max_state_rows":$maxState,""" +
        f""""state_over_total":${maxState.toDouble / total}%.4f,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
