package graft

import org.scalatest.funsuite.AnyFunSuite

/** State-store provider portability (r16 stretch; r15 verdict #8):
  * StreamStateScaleProbe priced the in-memory/RocksDB crossover
  * (heap-bound at ~185 B/key; RocksDB is the ceiling-removal
  * insurance) — this spec pins that the escape hatch actually WORKS
  * end-to-end on a real stateful gate, not just in the probe: the
  * dedup replay (dropDuplicatesWithinWatermark — state-store-backed
  * first-seen tracking + watermark eviction) must produce identical
  * rows under the RocksDB provider, so flipping the provider at the
  * sizing rule's crossover is a pure config change, never a
  * correctness event.
  */
class RocksDbStateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("the stateful dedup stream is provider-portable: RocksDB twin equals the default run") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val sfDir = "/root/testdata/sf0.001"
    val default = Queries.eventsDedupStream(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(default.nonEmpty, "fixture produced no deduped rows")
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = Queries.eventsDedupStream(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(rocks == default,
        s"RocksDB-backed state diverged from the default provider:\n" +
          s"rocks=$rocks\ndefault=$default")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
