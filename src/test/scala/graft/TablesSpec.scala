package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[Tables.events]] encoding chokepoint: the driver's
  * generator has emitted `ts` as TIMESTAMP(NANOS) (reads as raw longs
  * under the legacy conf) and as TIMESTAMP(MICROS, isAdjustedToUTC=0)
  * (reads as TIMESTAMP_NTZ) across rounds, and the round-9 regression
  * was exactly an encoding flip that only the driver gate caught.
  * Whatever the on-disk encoding, `Tables.events` must yield a
  * session-TZ TimestampType `ts` with unchanged UTC wall-clock.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val wallClock = "2024-03-01 12:34:56.789"

  /** Write an events-shaped parquet with `ts` in the given type into
    * dir/events.parquet, then load it through Tables.events.
    */
  private def roundTrip(tsType: DataType): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_spec_").toFile
    try {
      val df = Seq((1L, wallClock, 7L, "click", 1.5, "{}"))
        .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts_s").cast(tsType))
        .drop("ts_s")
      df.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
      val out = Tables.events(spark, dir.getAbsolutePath)
      out.cache().count() // materialize before the temp dir goes away
      out
    } finally TestSpark.rmTree(dir)
  }

  test("TIMESTAMP_NTZ events normalize to TimestampType with unchanged wall-clock") {
    val out = roundTrip(TimestampNTZType)
    assert(out.schema("ts").dataType === TimestampType)
    // Session TZ is pinned UTC, so the NTZ wall-clock IS the instant.
    val got = out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS")).head().getString(0)
    assert(got === wallClock)
    // The post-normalization column must support what round 9 broke:
    // cast to double and driver-side java.sql.Timestamp extraction.
    assert(out.select(col("ts").cast("double")).head().getDouble(0) > 0)
    assert(out.agg(max(col("ts"))).head().getTimestamp(0) != null)
  }

  test("TimestampType events pass through unchanged") {
    val out = roundTrip(TimestampType)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS")).head().getString(0)
    assert(got === wallClock)
  }
}
