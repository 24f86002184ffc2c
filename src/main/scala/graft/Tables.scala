package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  * All queries take `sfDir` (e.g. /root/testdata/sf0.01) and read one
  * parquet file per table. Filters/projections applied downstream are
  * pushed into the parquet scan by Catalyst (verify via .explain:
  * PushedFilters / ReadSchema).
  *
  * Tables are registered with Spark's storage cache on first load (per
  * session × sfDir): a multi-query run (Bench, Verify — and any real
  * engine session) scans each parquet file once and serves every later
  * query from columnar memory. This is the in-memory operating point of
  * the reference (whose whole corpus lives in process memory); on a
  * cluster the same call is a no-op safety: `.cache()` is lazy and LRU —
  * partitions that don't fit simply stay on disk.
  */
object Tables {

  // Session-scoped, with EXPLICIT eviction of stopped sessions.
  // (Weak keying doesn't work here: a cached DataFrame strongly
  // references its session through QueryExecution, and a WeakHashMap
  // entry whose value references its key is never collected.)
  private val cached = new SessionCache[(String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cached.getOrElseUpdate(spark, (sfDir, name))(
      normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet")).cache())

  /** The generator's timestamp encoding has flipped between rounds
    * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS, isAdjustedToUTC=0)); the
    * round-9 regression was events-only, but orders.o_orderdate and
    * lineitem.l_shipdate carry the same encoding and would break the
    * same way. Normalize every NTZ column to session-TZ TimestampType
    * at the one load chokepoint — the session TZ is pinned UTC, so the
    * wall-clock values (and the DuckDB oracle hashes) are unchanged.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.collect { case f if f.dataType == TimestampNTZType => f.name }
      .foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.parquet's `ts` encoding has varied across generator runs:
    * TIMESTAMP(NANOS) (no native Spark type — read as raw nanos under
    * the legacy conf and convert; the values are micro-precision so
    * DIV 1000 is lossless) and TIMESTAMP(MICROS, isAdjustedToUTC=0)
    * (read as TIMESTAMP_NTZ, normalized by [[load]]). Downstream code
    * may assume `ts` is TimestampType.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}

/** A memo keyed by (SparkSession, K) whose entries are evicted once
  * their session's context stops. A resident engine holds a handful of
  * live sessions, so the O(entries) sweep per lookup is noise; what
  * matters is that stopped sessions are actually released — weak keying
  * cannot do that when the cached value (a DataFrame) references the
  * session key.
  */
private[graft] final class SessionCache[K, V] {
  private val m = scala.collection.concurrent.TrieMap.empty[(SparkSession, K), V]
  def getOrElseUpdate(spark: SparkSession, key: K)(mk: => V): V = {
    m.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    m.getOrElseUpdate((spark, key), mk)
  }
}
