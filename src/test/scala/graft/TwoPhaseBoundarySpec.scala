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

  // ---- round-13 extension: the remaining streamed gates ------------
  // funnel / retention / sliding replay the SAME transform+present as
  // their gates (the *From variants) through the two-phase split;
  // dedup's gate staging is already two-batch (redelivery). A second
  // crafted corpus spans 14 days so retention windows close, with
  // every cross-batch semantic forced to straddle the midpoint.

  // min = Jan-01 01:00, max = Jan-14 12:00 → midpoint Jan-07 18:30
  private def dts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-$s:00")

  private lazy val dir2: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_twophase_spec2_").toFile
    val rows = Seq(
      // u1: view + click in half 1, purchase in half 2 — the funnel
      // buffer MUST survive the boundary (its half-1 timeout ts is
      // already below the post-batch-1 watermark, so only the
      // data-groups-are-not-timed-out rule keeps it alive; a premature
      // fold would emit reached=2 plus a spurious reached=1 and flip
      // three of the step counts). Days Jan-01/02 in half 1 and Jan-08
      // in half 2 also force the retention day-set to merge across the
      // boundary (offsets 0,1,7; the Jan-14 view is past the horizon
      // and must be filtered, not counted).
      (1L, dts("01 01:00"), 1L, "view", 0.0, "{}"),
      (4L, dts("02 01:00"), 1L, "click", 1.0, "{}"),
      (7L, dts("08 01:00"), 1L, "purchase", 20.0, "{}"),
      (9L, dts("14 12:00"), 1L, "view", 0.0, "{}"), // horizon driver
      // u2: views at 18:20 / 18:40 around the 18:30 midpoint — one
      // sliding window (18:00-19:00) holding rows from BOTH halves,
      // whose state must accumulate across the batch boundary
      (2L, dts("01 02:00"), 2L, "view", 0.0, "{}"),
      (5L, dts("07 18:20"), 2L, "view", 2.0, "{}"),
      (6L, dts("07 18:40"), 2L, "view", 3.0, "{}"),
      // u3: click in half 1 BEFORE its first view in half 2 — the
      // strictly-after funnel recurrence across the boundary (reached
      // must stay 1), and a cross-batch retention day-set {0, 7}
      (3L, dts("01 02:00"), 3L, "click", 1.0, "{}"),
      (8L, dts("08 02:00"), 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/events.parquet")
    Runtime.getRuntime.addShutdownHook(new Thread(() => TestSpark.rmTree(d)))
    d.getAbsolutePath
  }

  private def twoPhase2: String = Queries.stagedEventsTwoPhaseReplayDir(spark, dir2)

  test("the 14-day staging splits the crafted semantics across the halves") {
    val files = new java.io.File(twoPhase2)
      .listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.lastModified)
    assert(files.length == 2)
    val first = spark.read.parquet(files(0).getAbsolutePath)
      .select("event_id").as[Long].collect().toSet
    val second = spark.read.parquet(files(1).getAbsolutePath)
      .where(col("event_type") =!= "sentinel")
      .select("event_id").as[Long].collect().toSet
    assert(first == Set(1L, 2L, 3L, 4L, 5L), s"half 1 was $first")
    assert(second == Set(6L, 7L, 8L, 9L), s"half 2 was $second")
  }

  test("a funnel buffer spanning the midpoint folds once, after both halves") {
    val streamed = rows(Queries.eventsFunnelStreamFrom(spark, dir2, twoPhase2))
    assert(streamed == rows(Queries.eventsFunnel(spark, dir2)))
    // u1 completed all three steps ACROSS the boundary; u2/u3 stop at
    // view (u3's half-1 click precedes its half-2 first view)
    assert(streamed == Seq("[1_view,3]", "[2_click,1]", "[3_purchase,1]"),
      s"funnel steps were $streamed")
  }

  test("a retention day-set spanning the midpoint emits one final row per user") {
    val streamed = rows(Queries.eventsRetentionStreamFrom(spark, dir2, twoPhase2))
    assert(streamed == rows(Queries.eventsRetention(spark, dir2)))
    // offsets 0,1 arrive in half 1 and offset 7 in half 2 for u1 and
    // u3 (day-7 row = 2 users); u1's Jan-14 view is past the horizon
    // and contributes NO offset row
    assert(streamed == Seq("[2024-01-01,0,3]", "[2024-01-01,1,1]",
      "[2024-01-01,6,1]", "[2024-01-01,7,2]"), s"retention was $streamed")
  }

  test("a sliding window holding rows from both halves accumulates across the boundary") {
    val streamed = rows(Queries.eventsSlidingStreamFrom(spark, dir2, twoPhase2))
    assert(streamed == rows(Queries.eventsSliding(spark, dir2)))
    // the 18:00-19:00 window: ev5 (half 1) + ev6 (half 2) in ONE row
    assert(streamed.contains("[2024-01-07 18:00:00,view,2,5.0]"),
      s"straddling window missing from $streamed")
  }

  test("dedup redelivery on the crafted corpus drops exactly the redelivered rows") {
    // the gate's own staging is the two-batch layout: full corpus, then
    // the last hour redelivered. Pin that the redelivery really carried
    // the horizon row and that the sink counts every event exactly once.
    val staged = new java.io.File(Queries.stagedDedupReplayDir(spark, dir2))
      .listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.lastModified)
    assert(staged.length == 2)
    val redelivered = spark.read.parquet(staged(1).getAbsolutePath)
      .select("event_id").as[Long].collect().toSet
    assert(redelivered == Set(9L), s"redelivery was $redelivered")
    val streamed = rows(Queries.eventsDedupStream(spark, dir2))
    assert(streamed == Seq("[click,2,2.0]", "[purchase,1,20.0]", "[view,6,5.0]"),
      s"dedup sink was $streamed")
  }
}
