package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("as-of semantics: greatest right time <= left time, inclusive ties, null when none") {
    val left = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")),
      (2L, 10L, t("2024-01-01 12:00:00")),
      (3L, 10L, t("2024-01-01 08:00:00")), // before any right row
      (4L, 20L, t("2024-01-01 10:00:00"))) // key with exact-tie right row
      .toDF("event_id", "key", "ts")
    val right = Seq(
      (10L, t("2024-01-01 09:00:00"), 100L, 9.0),
      (10L, t("2024-01-01 11:00:00"), 101L, 11.0),
      (20L, t("2024-01-01 10:00:00"), 200L, 10.0))
      .toDF("key", "rts", "ref_id", "ref_val")
    val out = AsOfJoin.join(left, right, "key", "key", "ts", "rts",
        Seq("ref_id", "ref_val"))
      .orderBy("event_id")
      .select("event_id", "ref_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq(
      (1L, 100L),  // 09:00 row is the latest <= 10:00
      (2L, 101L),  // 11:00 row
      (3L, -1L),   // nothing at or before 08:00
      (4L, 200L))) // equal timestamp matches (inclusive)
  }

  test("right side never leaks rows; output row count == left row count") {
    val left = Seq((1L, 1L, t("2024-01-01 00:00:00"))).toDF("event_id", "key", "ts")
    val right = Seq(
      (1L, t("2023-01-01 00:00:00"), 1L, 0.0),
      (1L, t("2023-06-01 00:00:00"), 2L, 0.0),
      (2L, t("2023-01-01 00:00:00"), 3L, 0.0))
      .toDF("key", "rts", "ref_id", "ref_val")
    val out = AsOfJoin.join(left, right, "key", "key", "ts", "rts", Seq("ref_id"))
    assert(out.count() == 1)
    assert(out.select("ref_id").as[Long].head() == 2L)
  }

  test("latestPerKeyTime dedupes to max tie-break") {
    val right = Seq(
      (1L, t("2023-01-01 00:00:00"), 5L),
      (1L, t("2023-01-01 00:00:00"), 9L))
      .toDF("key", "rts", "ref_id")
    val d = AsOfJoin.latestPerKeyTime(right, "key", "rts", "ref_id")
    assert(d.count() == 1)
    assert(d.select("ref_id").as[Long].head() == 9L)
  }
}
