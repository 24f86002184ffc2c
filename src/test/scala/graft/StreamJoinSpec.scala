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
