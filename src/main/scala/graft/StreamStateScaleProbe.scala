package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming STATE at realistic volume (r14 verdict #7): every streamed
  * gate's state is hundreds of keys, so the measured "RocksDB is a
  * negative" result (`runReplayToSink`'s provider knob) is only proven
  * at that size — native column-family setup per store instance per
  * micro-batch dominates when the state is tiny. This probe prices the
  * in-memory (HDFSBackedStateStoreProvider) vs RocksDB trade at the
  * sizes where the 100 TB sizing rule actually bites, the way
  * SpillScaleProbe priced the archive tier.
  *
  * Shape: streaming dedup (`dropDuplicates` on a long key — the
  * continuous-ingest dedup state shape) over a staged file replay of
  * `batches` micro-batches. Batch 1 INSERTS all `nKeys` keys (state
  * build), batches 2..B-1 replay the SAME keys (read-heavy: every row
  * probes existing state), batch B arrives with `nKeys` FRESH keys
  * (write-heavy append at full state). Shuffle partitions sized like a
  * real deployment (32), not the tiny-state gates' 2. Reported per
  * provider: per-batch wall times, state rows, and state memory from
  * the progress metrics.
  *
  * Where the crossover REALLY is: the in-memory provider keeps every
  * maintained version of the state map on the executor HEAP — its
  * failure mode is memory, not time. So the probe's verdict is a
  * two-axis statement: (time) which provider is faster at each size;
  * (memory) the measured heap bytes/key, from which the ceiling for a
  * given executor heap follows. RocksDB's loaded working set lives off
  * heap and spills to local disk — its time penalty at each size is
  * the insurance premium for removing the heap ceiling.
  *
  * Usage: runMain graft.StreamStateScaleProbe [nKeys] [batches]
  *   (SPARK_DRIVER_MEM=24g recommended at 10M keys)
  */
object StreamStateScaleProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.nonEmpty) args(0).toLong else 10000000L
    val batches = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_state_probe_").toFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    try {
      // stage: batches 1..B-1 carry keys [0, nKeys); batch B carries
      // fresh keys [nKeys, 2*nKeys) — one parquet file per micro-batch
      val inDir = new java.io.File(root, "in").getAbsolutePath
      (1 to batches).foreach { b =>
        val base = if (b == batches) nKeys else 0L
        spark.range(base, base + nKeys).select(col("id").as("key"))
          .coalesce(4).write.mode("append").parquet(inDir)
      }
      val schema = spark.read.parquet(inDir).schema

      def run(provider: String): String = {
        val ck = new java.io.File(root, s"ck-$provider").getAbsolutePath
        if (provider == "rocksdb")
          spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        else
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        val batchSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
        var lastRows = 0L; var lastMem = 0L
        val t0 = System.nanoTime()
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 4).parquet(inDir)
          .dropDuplicates("key")
          .writeStream
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val t = System.nanoTime()
            batch.write.mode("overwrite").format("noop").save()
            batchSecs += (System.nanoTime() - t) / 1e9
            ()
          }
          .start()
        try q.awaitTermination() finally {
          val progs = q.recentProgress
          progs.reverseIterator.flatMap(p => Option(p.stateOperators))
            .find(_.nonEmpty).foreach { ops =>
              lastRows = ops.map(_.numRowsTotal).sum
              lastMem = ops.map(_.memoryUsedBytes).sum
            }
          q.stop()
        }
        val total = (System.nanoTime() - t0) / 1e9
        val perBatch = batchSecs.map(s => f"$s%.1f").mkString("[", ",", "]")
        f"""{"probe":"stream_state","provider":"$provider","n_keys":$nKeys,"batches":${batchSecs.size},"total_sec":$total%.1f,"batch_secs":$perBatch,"state_rows":$lastRows,"state_mem_mb":${lastMem / 1e6}%.1f,"mem_bytes_per_key":${if (lastRows > 0) lastMem / lastRows else -1}}"""
      }

      // alternate providers so ambient drift hits both arms
      println(run("memory"))
      println(run("rocksdb"))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      rm(root)
      spark.stop()
    }
  }
}
