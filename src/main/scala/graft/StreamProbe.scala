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
      ev.where(col("ts").cast("long") * 1000 >= lo && col("ts").cast("long") * 1000 < hi)
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
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStreams.clickAttribution(clicks, purchases)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .start()
    try q.processAllAvailable() finally {
      val sec = (System.nanoTime() - t0) / 1e9
      val progresses = q.recentProgress.toSeq
      q.stop()
      val maxState = progresses.flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(0L)(math.max)
      val batches = progresses.size
      val pairs = spark.read.parquet(outDir).count()
      println(f"""{"probe":"stream_join","copies":$copies,"total_rows":$total,""" +
        f""""batches":$batches,"pairs":$pairs,"max_state_rows":$maxState,""" +
        f""""state_over_total":${maxState.toDouble / total}%.4f,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
