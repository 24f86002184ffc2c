package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Forensics probe for the streaming gates' per-run fixed cost: runs
  * the LEFT-OUTER stream-stream attribution join (the most expensive
  * streaming gate) exactly as the gate runs it (staged replay input,
  * maxFilesPerTrigger=1, AvailableNow, 2 shuffle/state partitions,
  * parquet sink, per-run checkpoint) and prints ONE JSON line per
  * micro-batch with Spark's own `durationMs` breakdown
  * (triggerExecution / queryPlanning / getBatch / addBatch /
  * walCommit / commitOffsets / latestOffset) plus the state
  * operators' commit times, then a summary line with the start/stop
  * overhead (wall − Σ triggerExecution). The point is to attribute
  * the ~3 s warm cost of a stream-stream gate to its components
  * before attempting to optimize any of them — the prior rounds'
  * knob results (RocksDB, tmpfs, memory sink: all measured
  * negative) live in README; this probe is how the next knob gets
  * chosen. Results recorded in docs/PIPELINE.md.
  *
  * Usage: runMain graft.StreamCostProbe [sfDir] [reps]
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-stream-cost-probe")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // A/B knob: checksum-free local fs for the checkpoint tree
      // (Hadoop's default LocalFileSystem writes a .crc twin for
      // every tiny state-delta file). POSIX rename stays atomic,
      // which is all CheckpointFileManager needs. MEASURED NEGATIVE
      // (like the RocksDB/tmpfs/memory-sink knobs): RawLocalFileSystem
      // moved the warm outer-attribution run 2.5 → 2.5 s — the page
      // cache absorbs the checksum twins too; the per-batch floor is
      // CPU-side machinery (incremental planning, task scheduling,
      // store version bookkeeping), not checkpoint I/O.
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_FS_IMPL",
          "org.apache.hadoop.fs.LocalFileSystem"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, sfDir)
    val inDir = Queries.stagedEventsReplayDir(spark, sfDir)

    object Batches extends StreamingQueryListener {
      val lines = new scala.collection.mutable.ArrayBuffer[String]
      @volatile var sumTriggerMs = 0L
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        import scala.jdk.CollectionConverters._
        val durs = dur.asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString(",")
        val st = p.stateOperators.map(s =>
          s"""{"op":"${s.operatorName}","rowsTotal":${s.numRowsTotal},""" +
            s""""commitMs":${s.commitTimeMs},"updateMs":${s.allUpdatesTimeMs},""" +
            s""""removeMs":${s.allRemovalsTimeMs}}""").mkString(",")
        Batches.synchronized {
          sumTriggerMs += Option(dur.get("triggerExecution")).map(_.toLong).getOrElse(0L)
          lines += s"""{"batch":${p.batchId},"rows":${p.numInputRows},$durs,"state":[$st]}"""
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(Batches)

    (0 until reps).foreach { rep =>
      Batches.synchronized { Batches.lines.clear(); Batches.sumTriggerMs = 0L }
      val base = Files.createTempDirectory("graft_stream_cost_").toFile
      val outDir = s"${base.getAbsolutePath}/out"
      val ckDir = s"${base.getAbsolutePath}/ck"
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val clicks = stream.where(col("event_type").isin("click", "sentinel"))
      val purchases = stream.where(col("event_type").isin("purchase", "sentinel"))
      val t0 = System.nanoTime()
      val q = graft.streaming.EventStreams.clickAttributionOuter(clicks, purchases)
        .writeStream.outputMode("append")
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .start()
      try q.awaitTermination() finally q.stop()
      val startStopSec = (System.nanoTime() - t0) / 1e9
      val readBack = spark.read.parquet(outDir).count()
      val wallSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain the async listener bus
      val (lines, trigMs) = Batches.synchronized {
        (Batches.lines.toSeq, Batches.sumTriggerMs)
      }
      lines.foreach(l => println(s"""{"rep":$rep,${l.drop(1)}"""))
      println(f"""{"rep":$rep,"summary":true,"wall_sec":$wallSec%.3f,""" +
        f""""query_sec":$startStopSec%.3f,"trigger_sec":${trigMs / 1000.0}%.3f,""" +
        f""""overhead_sec":${startStopSec - trigMs / 1000.0}%.3f,"sink_rows":$readBack}""")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) { val cs = f.listFiles(); if (cs != null) cs.foreach(rm) }
        f.delete()
      }
      rm(base)
    }
    spark.stop()
  }
}
