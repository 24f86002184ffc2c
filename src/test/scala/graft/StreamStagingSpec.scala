package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the replay-input layouts every streaming gate reads
  * ([[Queries.stagedEventsReplayDir]] /
  * [[Queries.stagedEventsTwoPhaseReplayDir]]): the round-12 batch
  * restructure made these load-bearing — a regression here (sentinel
  * in the wrong file, a boundary row in both halves, mtime ordering
  * lost) silently changes what the gates exercise or drops rows as
  * late data, while the oracle hashes may even keep passing.
  */
class StreamStagingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("single-phase staging: ONE file, all events + exactly one trailing sentinel") {
    val ev = Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val dir = Queries.stagedEventsReplayDir(spark, sfDir)
    assert(parquetFiles(dir).length === 1,
      "single-phase replay must be ONE data micro-batch")
    val staged = spark.read.parquet(dir)
    assert(staged.count() === nEvents + 1)
    val sentinels = staged.where(col("event_type") === "sentinel").collect()
    assert(sentinels.length === 1)
    val s = sentinels.head
    assert(s.getAs[Long]("user_id") === -1L)
    // 3 h past the horizon: past every real window's end (max + 1 h)
    // after the 2 h watermark delay, and its own windows can't close
    assert(s.getAs[java.sql.Timestamp]("ts").getTime === maxTs.getTime + 3L * 3600 * 1000)
  }

  test("two-phase staging: two files, halves partition at the midpoint, sentinel rides the LATER file") {
    val ev = Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val (minMs, maxMs) = {
      val r = ev.agg(min(col("ts")), max(col("ts"))).head()
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }
    val midMs = minMs + (maxMs - minMs) / 2
    val dir = Queries.stagedEventsTwoPhaseReplayDir(spark, sfDir)
    val files = parquetFiles(dir).sortBy(_.lastModified)
    assert(files.length === 2, "two-phase replay must be TWO data micro-batches")
    assert(files(0).lastModified < files(1).lastModified,
      "mtime order is the replay order — equal mtimes leave it undefined")
    val first = spark.read.parquet(files(0).getAbsolutePath)
    val second = spark.read.parquet(files(1).getAbsolutePath)
    // no row lost, none duplicated across the halves
    assert(first.count() + second.count() === nEvents + 1)
    assert(first.unionByName(second).where(col("event_type") =!= "sentinel")
      .select(col("event_id")).distinct().count() === nEvents)
    // strict partition at the midpoint: a boundary row in BOTH halves
    // would be processed twice; one in NEITHER would be dropped
    assert(first.where(unix_millis(col("ts")) >= midMs).count() === 0,
      "first half must hold only pre-midpoint rows")
    assert(second.where(col("event_type") =!= "sentinel")
      .where(unix_millis(col("ts")) < midMs).count() === 0,
      "second half must hold only post-midpoint rows")
    // both halves non-empty on the gate corpus (a degenerate corpus
    // may legally produce an empty first half; the fixture must not,
    // or the two-phase gates stop exercising cross-batch arrival)
    assert(first.count() > 0, "fixture regression: empty first half")
    // the watermark-release sentinel must arrive in the LAST batch
    assert(first.where(col("event_type") === "sentinel").count() === 0)
    assert(second.where(col("event_type") === "sentinel").count() === 1)
    // the late-data invariant the replay depends on: no second-half
    // row is late w.r.t. the post-batch-1 watermark at ANY gate delay
    // up to 1 h (sesswin's) — i.e. min(half2 ts) >= max(half1 ts) - 1 h
    val maxFirst = first.agg(max(unix_millis(col("ts")))).head().getLong(0)
    val minSecond = second.where(col("event_type") =!= "sentinel")
      .agg(min(unix_millis(col("ts")))).head().getLong(0)
    assert(minSecond >= maxFirst - 3600L * 1000,
      "a second-half row would be dropped as late data")
  }
}
