package graft

import java.sql.Timestamp

import graft.embed.HashingEmbedder
import graft.session._
import graft.streaming.{Event, EventStreams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionStreamingSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("interactive session: CLI happy path updates state, catalog, results") {
    val s = new InteractiveSession(spark, HashingEmbedder(dim = 16))
    s.submit(AddLibrary("demo"))
    val lib = s.status.libraryIds.head
    s.submit(AddDocument(lib, "landmarks"))
    val doc = s.engine.listDocuments(lib).head.id
    s.submit(AddChunk(lib, doc, "eiffel tower paris", Map("type" -> "landmark")))
    s.submit(AddChunk(lib, doc, "paris capital", Map("type" -> "city")))
    s.submit(SetQueryParams(k = 1, index = "brute"))
    s.submit(StartQuery(lib, "eiffel tower paris"))
    val st = s.status
    assert(st.libraryNames(lib) == "demo")
    assert(st.chunkCounts(lib) == 2)
    assert(st.metadataCatalog("type").toSet == Set("landmark", "city"))
    val res = s.partialResults.get
    assert(res.hits.size == 1 && res.hits.head.text == "eiffel tower paris")
    s.submit(Finish)
    assert(s.status.finished)
  }

  test("single-slot mailbox: last writer wins (interactive_workflow.py:225-229)") {
    val s = new InteractiveSession(spark, HashingEmbedder(dim = 8))
    s.mailbox.offer(AddLibrary("first"))
    s.mailbox.offer(AddLibrary("second")) // overwrites before drain
    s.step()
    assert(s.status.libraryIds.size == 1)
    assert(s.status.libraryNames.values.toSeq == Seq("second"))
    assert(!s.step()) // slot drained
  }

  test("errors are recorded to the timeline and the session survives") {
    val s = new InteractiveSession(spark, HashingEmbedder(dim = 8))
    s.submit(AddDocument("missing-lib", "t"))
    assert(s.status.timeline.exists(_.startsWith("error:")))
    s.submit(AddLibrary("after-error"))
    assert(s.status.libraryIds.size == 1)
  }

  test("metadata catalog caps at 20 distinct samples per key") {
    val s = new InteractiveSession(spark, HashingEmbedder(dim = 8))
    s.submit(AddLibrary("l"))
    val lib = s.status.libraryIds.head
    s.submit(AddDocument(lib, "d"))
    val doc = s.engine.listDocuments(lib).head.id
    (1 to 25).foreach(i => s.submit(AddChunk(lib, doc, s"text $i", Map("type" -> s"t$i"))))
    assert(s.status.metadataCatalog("type").size == 20)
  }

  test("streaming hourly counts with watermark (tumbling windows)") {
    val mem = MemoryStream[Event](spark)
    def ev(id: Long, t: String, typ: String, v: Double) =
      Event(id, Timestamp.valueOf(t), 1L, typ, v)
    mem.addData(
      ev(1, "2024-01-01 10:05:00", "click", 1.0),
      ev(2, "2024-01-01 10:55:00", "click", 2.0),
      ev(3, "2024-01-01 11:10:00", "view", 5.0))
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("append").start()
    try {
      mem.addData(ev(4, "2024-01-01 14:00:00", "click", 1.0)) // advances watermark past 11:00+2h? no; past 12:00 -> closes 10:00,11:00
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select(date_format(col("hour"), "HH:mm").as("h"), col("event_type"), col("n_events"))
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("10:00", "click", 2L)))
    } finally q.stop()
  }

  test("events_sliding_stream: the streaming replay lands on the batch window table") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = Queries.eventsSlidingStream(spark, sfDir)
      .as[(String, String, Long, Double)].collect().toSeq
    val batch = Queries.eventsSliding(spark, sfDir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
  }

  test("streaming funnel: correct under cross-batch OUT-OF-ORDER arrival") {
    val mem = MemoryStream[Event](spark)
    def ev(id: Long, t: String, u: Long, typ: String) =
      Event(id, Timestamp.valueOf(t), u, typ, 1.0)
    val q = EventStreams.funnelReach(spark, mem.toDS())
      .writeStream.format("memory").queryName("funnel_stream").outputMode("append").start()
    try {
      // batch 1: user 1's click and purchase arrive FIRST
      mem.addData(
        ev(2, "2024-01-01 10:05:00", 1L, "click"),
        ev(3, "2024-01-01 10:10:00", 1L, "purchase"),
        // user 2: click strictly BEFORE any view — must stop at view
        ev(4, "2024-01-01 09:00:00", 2L, "click"),
        ev(5, "2024-01-01 09:30:00", 2L, "view"))
      q.processAllAvailable()
      // batch 2: user 1's view arrives LATE but is EARLIER in event
      // time — an order-sensitive fold must re-qualify the click
      mem.addData(ev(1, "2024-01-01 10:00:00", 1L, "view"))
      q.processAllAvailable()
      // watermark release: an event far in the future times every user out
      mem.addData(ev(9, "2024-01-02 00:00:00", 99L, "error"))
      q.processAllAvailable()
      mem.addData(ev(10, "2024-01-03 00:00:00", 99L, "error"))
      q.processAllAvailable()
      val got = spark.table("funnel_stream")
        .select("user_id", "reached").as[(Long, Int)].collect().toMap
      assert(got == Map(1L -> 3, 2L -> 1))
    } finally q.stop()
  }

  test("streaming retention: emits ONCE at window close; resurfacing cannot re-cohort") {
    val mem = MemoryStream[Event](spark)
    def ev(id: Long, t: String, u: Long) = Event(id, Timestamp.valueOf(t), u, "view", 1.0)
    val q = EventStreams.retentionDays(spark, mem.toDS())
      .writeStream.format("memory").queryName("retention_stream").outputMode("append").start()
    try {
      // user 1 active on day 0, day 1 (twice — dedupes) and day 3
      mem.addData(
        ev(1, "2024-01-01 10:00:00", 1L), ev(2, "2024-01-02 09:00:00", 1L),
        ev(3, "2024-01-02 15:00:00", 1L), ev(4, "2024-01-04 11:00:00", 1L))
      q.processAllAvailable()
      // advance the watermark past cohort + 8 days → the row emits
      mem.addData(ev(9, "2024-01-10 12:00:00", 99L))
      q.processAllAvailable()
      mem.addData(ev(10, "2024-01-11 12:00:00", 99L))
      q.processAllAvailable()
      val rows = spark.table("retention_stream")
        .select("user_id", "cohort_day", "offsets")
        .as[(Long, String, Seq[Long])].collect().filter(_._1 == 1L)
      assert(rows.toSeq == Seq((1L, "2024-01-01", Seq(0L, 1L, 3L))))
      // user 1 resurfaces AFTER the window closed: no second row, no
      // second cohort — the tombstone absorbs it
      mem.addData(ev(11, "2024-01-12 08:00:00", 1L))
      q.processAllAvailable()
      mem.addData(ev(12, "2024-01-20 08:00:00", 99L))
      q.processAllAvailable()
      val after = spark.table("retention_stream")
        .select("user_id").as[Long].collect().count(_ == 1L)
      assert(after == 1, "resurfacing minted a second retention row")
    } finally q.stop()
  }

  test("events_retention_stream: the streaming replay lands on the batch cohort table") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = Queries.eventsRetentionStream(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    val batch = Queries.eventsRetention(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    assert(streamed == batch)
  }

  test("events_funnel_stream: the streaming replay lands on the batch funnel table") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = Queries.eventsFunnelStream(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val batch = Queries.eventsFunnel(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dedup by key and by content digest, bounded by watermark") {
    val mem = MemoryStream[Event](spark)
    def ev(id: Long, t: String, v: Double) =
      Event(id, Timestamp.valueOf(t), 1L, "click", v)
    val q = EventStreams.dedupedEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 1.0), ev(2, "2024-01-01 10:01:00", 2.0))
      q.processAllAvailable()
      // replayed ids within the watermark horizon are dropped
      mem.addData(ev(1, "2024-01-01 10:02:00", 1.0), ev(3, "2024-01-01 10:03:00", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events with the customer dim") {
    val mem = MemoryStream[Event](spark)
    val customers = Seq((1L, "n1", 0, 0.0, "BUILDING"), (2L, "n2", 0, 0.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val q = EventStreams.enrichedWithSegment(mem.toDF(), customers)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      mem.addData(
        Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
        Event(2, Timestamp.valueOf("2024-01-01 10:01:00"), 9L, "view", 2.0)) // no dim row
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select(col("event_id"), col("c_mktsegment"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, Some("BUILDING")), (2L, None))) // left join keeps dim-less rows
    } finally q.stop()
  }

  test("streaming sessionization emits closed sessions (flatMapGroupsWithState)") {
    val mem = MemoryStream[Event](spark)
    def ev(id: Long, t: String, u: Long, v: Double) =
      Event(id, Timestamp.valueOf(t), u, "click", v)
    // user 7: two events 10 min apart (one session), then a 3rd event
    // 2 h later that starts a new session and (via watermark) closes
    // the first.
    mem.addData(
      ev(1, "2024-01-01 10:00:00", 7, 1.0),
      ev(2, "2024-01-01 10:10:00", 7, 2.0))
    val sessions = EventStreams.sessionize(spark, mem.toDS())
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(ev(3, "2024-01-01 12:30:00", 7, 4.0))
      q.processAllAvailable()
      mem.addData(ev(4, "2024-01-01 20:00:00", 8, 0.5)) // advance watermark far
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select(col("user_id"), col("n_events"), col("sum_value"))
        .as[(Long, Long, Double)].collect().toSet
      assert(rows.contains((7L, 2L, 3.0)), s"got $rows") // first session closed
    } finally q.stop()
  }

  test("all sessionize forms agree AT the exact 30-min boundary (merge, not split)") {
    // An event at EXACTLY gap distance MERGES into the running session
    // in every implementation. Establishing this empirically mattered:
    // the built-in session_window unions windows INCLUSIVELY
    // (next_start <= prev_end yields one session for a 1800s gap),
    // which matches the batch lag form's strict `> 1800` split
    // predicate and the fMGWS sessionizer's `<= gap` merge. This is
    // not hypothetical: sf0.1 contains a real exactly-1800s same-user
    // gap, so a convention mismatch silently diverges the three gate
    // queries there.
    val boundary = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 7L, "click", 2.0), // gap == 1800 s
      (3L, Timestamp.valueOf("2024-01-01 10:40:00"), 7L, "click", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // batch lag/cumsum form (the eventsSessionize shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lagSessions = boundary
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s", when(col("prev_ts").isNull ||
        (col("ts").cast("double") - col("prev_ts").cast("double")) > 1800.0, 1).otherwise(0))
      .agg(sum(col("new_s"))).as[Long].head()
    assert(lagSessions == 1L, "lag form must MERGE at gap == 1800s")
    // built-in session_window
    val native = boundary
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().count()
    assert(native == 1L, "session_window must merge at gap == 1800s")
    // fMGWS streaming sessionizer
    val mem = MemoryStream[Event](spark)
    mem.addData(
      Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, Timestamp.valueOf("2024-01-01 10:30:00"), 7, "click", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 10:40:00"), 7, "click", 3.0))
    val q = EventStreams.sessionize(spark, mem.toDS())
      .writeStream.format("memory").queryName("boundary_sessions")
      .outputMode("append").start()
    try {
      mem.addData(Event(4, Timestamp.valueOf("2024-01-02 10:00:00"), 8, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("boundary_sessions")
        .where(col("user_id") === 7).count()
      assert(streamed == 1L, "fMGWS sessionizer must merge at gap == 1800s")
    } finally q.stop()
    // and the real corpus: batch form == native built-in at sf0.1,
    // WHERE the exactly-1800s gap actually occurs
    val sfDir = "/root/testdata/sf0.1"
    if (new java.io.File(s"$sfDir/events.parquet").exists()) {
      val a = Queries.eventsSessionize(spark, sfDir).collect().toSeq
      val b = Queries.eventsSessionWindowNative(spark, sfDir).collect().toSeq
      assert(a == b, "batch lag form and session_window diverge on sf0.1")
    }
  }
}
