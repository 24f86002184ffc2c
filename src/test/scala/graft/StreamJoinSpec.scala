package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join (EventStreams.clickAttribution) — the
  * join semantics on crafted rows, and the gate-level equivalence of
  * the streaming run against the batch twin on real driver data.
  */
class StreamJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String, value: Double = 1.0) =
    (id, Timestamp.valueOf(t), user, typ, value, "{}")

  test("interval semantics: trailing hour, boundaries inclusive, no cross-user pairs") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click"),
      ev(2, "2024-01-01 10:30:00", 1, "purchase", 5.0),   // pairs with 1 and 3
      ev(3, "2024-01-01 09:30:00", 1, "click"),           // exactly 1h before: included
      ev(4, "2024-01-01 09:29:59", 1, "click"),           // beyond the hour: excluded
      ev(5, "2024-01-01 10:31:00", 1, "click"),           // after the purchase: excluded
      ev(6, "2024-01-01 10:15:00", 2, "click"),           // other user: never pairs
      ev(7, "2024-01-01 11:00:00", 3, "purchase", 2.0)    // no clicks: inner join drops
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val pairs = graft.streaming.EventStreams.clickAttribution(
        events.where(col("event_type") === "click"),
        events.where(col("event_type") === "purchase"))
      .select(col("purchase_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((2L, 1L), (2L, 3L)))
  }

  test("streaming gate hash-matches the batch twin on sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = Queries.eventsAttribution(spark, sfDir).collect().toSeq
    val stream = Queries.eventsAttributionStream(spark, sfDir).collect().toSeq
    assert(batch.nonEmpty)
    assert(stream === batch)
  }

  test("outer join: unmatched purchases surface with null clicks") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click"),
      ev(2, "2024-01-01 10:30:00", 1, "purchase", 5.0),   // matched
      ev(3, "2024-01-01 11:00:00", 3, "purchase", 2.0)    // no clicks → null row
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = graft.streaming.EventStreams.clickAttributionOuter(
        events.where(col("event_type") === "click"),
        events.where(col("event_type") === "purchase"))
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows === Set((2L, 1L), (3L, -1L)))
  }

  /** The scale-critical property of the watermarked join: state is
    * EVICTED once the watermark passes its reachable window, so a late
    * row arriving after eviction cannot resurrect a match. (Spark
    * deliberately does NOT guarantee that a late row is dropped while
    * the other side's state still lingers — eviction runs lazily in
    * the batch after the watermark advances — so the test lets a
    * cleanup batch run before sending the late row.)
    */
  test("stream-stream join evicts state past the watermark: late rows cannot match") {
    import graft.streaming.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Event](spark)
    val df = mem.toDF()
    val joined = graft.streaming.EventStreams.clickAttribution(
      df.where(col("event_type") === "click"),
      df.where(col("event_type") === "purchase"))
    val q = joined.writeStream.format("memory").queryName("attr_late")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, Timestamp.valueOf("2024-01-01 10:30:00"), 1, "purchase", 5.0))
      q.processAllAvailable() // (2,1) matches
      // BOTH sides must advance: each side carries its own watermark
      // node and the global watermark is their min — the same reason
      // the gate keeps the sentinel in both replay inputs
      mem.addData(
        Event(3, Timestamp.valueOf("2024-01-01 20:00:00"), 9, "click", 1.0),
        Event(6, Timestamp.valueOf("2024-01-01 20:00:00"), 8, "purchase", 1.0))
      q.processAllAvailable() // wm -> 18:00 after this batch
      mem.addData(
        Event(5, Timestamp.valueOf("2024-01-01 20:01:00"), 9, "click", 1.0),
        Event(7, Timestamp.valueOf("2024-01-01 20:01:00"), 8, "purchase", 1.0))
      q.processAllAvailable() // cleanup batch: purchase 2 evicted (10:30 < 18:00)
      // arrives after eviction — would match purchase 2, but its state is gone
      mem.addData(Event(4, Timestamp.valueOf("2024-01-01 10:20:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val pairs = spark.table("attr_late").select(col("purchase_id"), col("click_id"))
        .as[(Long, Long)].collect().toSet
      assert(pairs === Set((2L, 1L)))
    } finally q.stop()
  }

  test("outer streaming gate hash-matches the batch twin on sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = Queries.eventsAttributionOuter(spark, sfDir).collect().toSeq
    val stream = Queries.eventsAttributionOuterStream(spark, sfDir).collect().toSeq
    assert(batch.nonEmpty)
    // the outer result strictly contains the inner result's users
    assert(batch.size >= Queries.eventsAttribution(spark, sfDir).count())
    assert(stream === batch)
  }
}
