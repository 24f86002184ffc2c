package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built-events semantics for the funnel and retention gates —
  * the ORDER constraint is the part an oracle diff alone can mask
  * (a presence-only funnel gives the same counts on most corpora), so
  * it is pinned here on adversarial rows: steps out of order must not
  * convert.
  */
class EventsAnalyticsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** Write an events.parquet with the driver schema into a temp dir. */
  private def withEvents[A](rows: Seq[(Long, String, Long, String)])(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_spec_").toFile
    try {
      rows.zipWithIndex.map { case ((id, ts, u, et), i) => (id, ts, u, et, 1.0 + i, "{}") }
        .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
      f(dir.getAbsolutePath)
    } finally TestSpark.rmTree(dir)
  }

  test("funnel counts only strictly-ordered view → click → purchase progressions") {
    val rows = Seq(
      // user 1 converts fully, in order
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:10:00", 1L, "purchase"),
      // user 2: click BEFORE the first view — reaches view only
      (4L, "2024-01-02 09:00:00", 2L, "click"),
      (5L, "2024-01-02 09:30:00", 2L, "view"),
      // user 3: purchase BEFORE the click — reaches click only
      (6L, "2024-01-03 08:00:00", 3L, "purchase"),
      (7L, "2024-01-03 08:10:00", 3L, "view"),
      (8L, "2024-01-03 08:20:00", 3L, "click"),
      // user 4: never views — contributes to NO step
      (9L, "2024-01-04 07:00:00", 4L, "click"),
      // tie probe: user 5's click at the EXACT view instant — strictly
      // after is required, so it does not count
      (10L, "2024-01-05 06:00:00", 5L, "view"),
      (11L, "2024-01-05 06:00:00", 5L, "click"))
    withEvents(rows) { dir =>
      val got = Queries.eventsFunnel(spark, dir)
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("1_view", 4L), ("2_click", 2L), ("3_purchase", 1L)))
    }
  }

  test("retention cohorts users by first-seen day and dedupes user-days") {
    val rows = Seq(
      // user 1: first seen Jan 1, active again day+1 (twice — must
      // count once) and day+3
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-02 11:00:00", 1L, "click"),
      (3L, "2024-01-02 12:00:00", 1L, "view"),
      (4L, "2024-01-04 09:00:00", 1L, "view"),
      // user 2: same cohort day, never returns
      (5L, "2024-01-01 23:00:00", 2L, "view"),
      // user 3: later cohort, returns day+1; the day+9 visit is
      // outside the 7-day horizon
      (6L, "2024-01-05 08:00:00", 3L, "view"),
      (7L, "2024-01-06 08:00:00", 3L, "view"),
      (8L, "2024-01-14 08:00:00", 3L, "view"))
    withEvents(rows) { dir =>
      val got = Queries.eventsRetention(spark, dir)
        .as[(String, Long, Long)].collect().toSeq
      assert(got == Seq(
        ("2024-01-01", 0L, 2L),
        ("2024-01-01", 1L, 1L),
        ("2024-01-01", 3L, 1L),
        ("2024-01-05", 0L, 1L),
        ("2024-01-05", 1L, 1L)))
    }
  }
}
