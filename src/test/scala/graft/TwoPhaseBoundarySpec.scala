package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial corpus for the two-phase streaming replay: every
  * cross-batch semantic the round-12 layout exists to exercise is
  * FORCED to straddle the event-time midpoint — a session whose gap
  * spans it (the session state store must merge across batches), an
  * attribution pair whose click lands in half 1 and purchase in
  * half 2 (the join state must carry the click), and an (hour, type)
  * aggregate key with events in both halves (the upsert must converge
  * by last-write-wins). The fixture corpus happens to contain such
  * rows; this corpus GUARANTEES them, so a staging regression (e.g. a
  * boundary row in the wrong half, a watermark that drops half 2)
  * cannot pass on luck. Each streamed gate must equal its batch twin
  * exactly — the same one-oracle contract the sf gates pin.
  */
class TwoPhaseBoundarySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // min = 00:30, max = 04:30 → midpoint = 02:30 (mid-hour, so one
  // 02:00 hour bucket can hold events on both sides of it)
  private def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_twophase_spec_").toFile
    val rows = Seq(
      // u2: click→purchase pair entirely in half 1
      (1L, ts("00:30"), 2L, "click", 1.0, "{}"),
      (2L, ts("01:00"), 2L, "purchase", 10.0, "{}"),
      // u1: click in half 1, purchase in half 2, 30 min apart — the
      // cross-batch attribution pair
      (3L, ts("02:15"), 1L, "click", 1.0, "{}"),
      (4L, ts("02:45"), 1L, "purchase", 20.0, "{}"),
      // u1: views 20 min apart across the midpoint — one session that
      // must MERGE inside the session state store, and two events of
      // the (02:00, view) hour bucket split across the halves
      (5L, ts("02:20"), 1L, "view", 0.0, "{}"),
      (6L, ts("02:40"), 1L, "view", 0.0, "{}"),
      // u3: purchase with no qualifying click (outer-null row)
      (7L, ts("04:30"), 3L, "purchase", 5.0, "{}"),
      // u4: two sessions, one per half (gap 2h15m > 30 min)
      (8L, ts("00:45"), 4L, "view", 0.0, "{}"),
      (9L, ts("03:00"), 4L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/events.parquet")
    Runtime.getRuntime.addShutdownHook(new Thread(() => TestSpark.rmTree(d)))
    d.getAbsolutePath
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("the staging really splits the crafted semantics across the halves") {
    val files = new java.io.File(Queries.stagedEventsTwoPhaseReplayDir(spark, dir))
      .listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.lastModified)
    assert(files.length == 2)
    val first = spark.read.parquet(files(0).getAbsolutePath)
      .select("event_id").as[Long].collect().toSet
    val second = spark.read.parquet(files(1).getAbsolutePath)
      .where(col("event_type") =!= "sentinel")
      .select("event_id").as[Long].collect().toSet
    assert(first == Set(1L, 2L, 3L, 5L, 8L), s"half 1 was $first")
    assert(second == Set(4L, 6L, 7L, 9L), s"half 2 was $second")
  }

  test("stream-stream attribution pairs survive the batch boundary (inner + outer)") {
    assert(rows(Queries.eventsAttributionStream(spark, dir)) ==
      rows(Queries.eventsAttribution(spark, dir)))
    val outer = rows(Queries.eventsAttributionOuterStream(spark, dir))
    assert(outer == rows(Queries.eventsAttributionOuter(spark, dir)))
    // the cross-batch pair is really in there: u1's purchase matched
    // its half-1 click (n_matched=1), u3's is the unmatched null row
    assert(outer.contains("[1,1,1,1,0]"), s"outer rollup was $outer")
    assert(outer.contains("[3,1,0,1,1]"), s"outer rollup was $outer")
  }

  test("a session spanning the midpoint merges inside the session state store") {
    val streamed = rows(Queries.eventsSessionWindowStream(spark, dir))
    assert(streamed == rows(Queries.eventsSessionWindowNative(spark, dir)))
    // u1's four events (02:15→02:45, max gap 20 min) straddle the
    // midpoint as ONE session; u4's two views are TWO sessions
    assert(streamed.contains("[1,1,4]"), s"sessions were $streamed")
    assert(streamed.contains("[4,2,2]"), s"sessions were $streamed")
  }

  test("an hour bucket split across the halves converges by last-write-wins") {
    assert(rows(Queries.eventsHourlyUpsertStream(spark, dir)) ==
      rows(Queries.eventsHourly(spark, dir)))
  }
}
