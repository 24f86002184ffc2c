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
    // The epoch value is pinned to the exact UTC instant so an encoding
    // flip that silently SHIFTED the instant (rather than changing the
    // type) would fail too — this is the same extraction DuckDB's
    // epoch(ts) performs on the oracle side of the sessionize gate.
    assert(out.select(col("ts").cast("double")).head().getDouble(0) === 1709296496.789)
    assert(out.agg(max(col("ts"))).head().getTimestamp(0) != null)
  }

  test("TimestampType events pass through unchanged") {
    val out = roundTrip(TimestampType)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS")).head().getString(0)
    assert(got === wallClock)
  }

  /** Physical-type-drift canary: the round-9 breakage shipped silently
    * because nothing asserted the loaded schemas. Every driver table's
    * POST-normalization schema must match the FIXTURES.md §4 contract
    * (timestamps as session-TZ TimestampType, embedding as
    * array<float>); a generator encoding flip that the Tables
    * chokepoint doesn't absorb turns this red with the actual type.
    */
  test("all driver tables load to the FIXTURES.md contract schema") {
    val sfDir = "/root/testdata/sf0.001"
    val contract = Map(
      "region" -> "r_regionkey:int, r_name:string",
      "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
        "c_acctbal:double, c_mktsegment:string"),
      "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
      "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, p_type:string, " +
        "p_size:int, p_retailprice:double"),
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
        "o_totalprice:double, o_orderdate:timestamp, o_orderpriority:string"),
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
        "l_linenumber:int, l_quantity:double, l_extendedprice:double, l_discount:double, " +
        "l_tax:double, l_returnflag:string, l_linestatus:string, l_shipdate:timestamp"),
      "events" -> ("event_id:bigint, ts:timestamp, user_id:bigint, event_type:string, " +
        "value:double, props:string"),
      "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")
    for ((name, want) <- contract) {
      val df = if (name == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, name)
      // simpleString deliberately ignores nullability: the contract is
      // about physical types, which is what the round-9 drift changed.
      val got = df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got === want, s"\ntable `$name` drifted from the FIXTURES.md contract" +
        s"\n  expected: $want\n  loaded:   $got" +
        "\n  (if the generator changed encodings again, absorb it in Tables.normalizeNtz/events)")
    }
    // The embedding DIM is part of the contract too: the LSH plane
    // matrix, PQ subspace split and the oracle's inlined planes(64)
    // all assume 64 — a dim change would pass the type check above
    // and fail obscurely inside the index gates.
    val dims = Tables.load(spark, sfDir, "embeddings")
      .where(col("embedding").isNotNull)
      .select(size(col("embedding"))).distinct().collect().map(_.getInt(0)).toSet
    assert(dims === Set(64),
      s"embeddings dim drifted from the 64 the index tier assumes: got $dims")
  }
}
