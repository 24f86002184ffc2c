package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE at write time
  * (`bucketBy` on the join key) so every subsequent equi-join or
  * aggregation on that key runs without an Exchange — the at-rest
  * answer to "big joins shuffle on their keys". At 100 TB, bucketing
  * orders+lineitem on the order key turns the nightly join from the
  * cluster's largest shuffle into a zip of co-located buckets.
  */
object BucketedTables {

  /** Write `df` as a bucketed managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortBy: Option[String] = None): Unit = {
    val w0 = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val w = sortBy.map(w0.sortBy(_)).getOrElse(w0)
    w.saveAsTable(table)
  }

  /** Join two tables bucketed on their join keys; with equal bucket
    * counts the planner emits a SortMergeJoin with NO Exchange on
    * either side.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
