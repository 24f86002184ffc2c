package graft

import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("sketch aggregations land within error bounds of their exact twins") {
    val rows = Queries.aggSketchesRaw(spark, "/root/testdata/sf0.01")
      .select("event_type", "approx_users", "exact_users", "approx_p50", "exact_p50")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, approxU, exactU, approxP, exactP) =>
      // HLL++ default rsd = 5%
      assert(math.abs(approxU - exactU).toDouble / exactU <= 0.10,
        s"$et: approx_users $approxU vs $exactU")
      // approx_percentile(accuracy=1000) is rank-accurate to ~0.1%;
      // translate to a loose value tolerance on this distribution
      assert(math.abs(approxP - exactP) <= math.max(0.05 * math.abs(exactP), 0.5),
        s"$et: approx_p50 $approxP vs $exactP")
    }
  }

  test("the gated agg_sketches projection reports its bound checks as true") {
    val rows = Queries.aggSketches(spark, "/root/testdata/sf0.01")
      .select("event_type", "approx_users_ok", "approx_p50_ok")
      .as[(String, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, uOk, pOk) =>
      assert(uOk && pOk, s"$et: bound check false (users_ok=$uOk p50_ok=$pOk)")
    }
  }

  test("sketch query is deterministic across runs (seedless sketches)") {
    val a = Queries.aggSketches(spark, "/root/testdata/sf0.001").collect().toSeq
    val b = Queries.aggSketches(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(a == b)
  }
}
