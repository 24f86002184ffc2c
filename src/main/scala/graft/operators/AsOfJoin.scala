package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the right row with the
  * greatest `rightTime <= leftTime` for the same key (the
  * feature-at-event-time join every training pipeline needs; Spark has
  * no built-in).
  *
  * Shape: tag both inputs, UNION, one window pass per key ordered by
  * (time, side) carrying `last(right_payload, ignoreNulls)` forward,
  * keep left rows. ONE shuffle on the key, no time-range explode, no
  * non-equi join — the plan that survives skewed 100 TB event tables
  * (a range join would fan out per candidate; this stays 1 row in,
  * 1 row out). Right rows tie-sort before left rows at equal
  * timestamps, giving inclusive `<=` semantics (same as DuckDB/kdb
  * ASOF).
  *
  * The right side must be unique per (key, time) for deterministic
  * output — pre-dedupe with [[latestPerKeyTime]] when it isn't.
  */
object AsOfJoin {

  /** Keep one right row per (key, time): the one with max tieBreak. */
  def latestPerKeyTime(right: DataFrame, key: String, time: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key), col(time)).orderBy(col(tieBreak).desc)
    right.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)
    val l = left.select(
      col(leftKey).cast("long").as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__r"))
    val r = right.select(
      col(rightKey).cast("long").as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), lit(null).cast(l.schema("__l").dataType).as("__l"),
      payloadStruct.as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
