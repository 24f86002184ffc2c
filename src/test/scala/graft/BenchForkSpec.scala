package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fresh-JVM adjudication fork, exercised FOR REAL: BenchBudgetSpec
  * pins the verdict logic with stubs, but the r13 blind spot was in the
  * machinery (the rerun ran inside the degraded session), so the fork
  * itself needs one live launch — classpath propagation, JVM flags,
  * the BENCHONE_MEDIAN handshake, and the parse.
  *
  * Runs the cheapest gate at sf0.001 to keep the forked session's cost
  * at JVM+session startup (~30 s), not query time.
  */
class BenchForkSpec extends AnyFunSuite {

  test("freshJvmRerun launches BenchOne on this classpath and parses its median") {
    val got = Bench.freshJvmRerun("/root/testdata/sf0.001")("region_customers")
    assert(got.isDefined, "fork produced no BENCHONE_MEDIAN line — launch failed")
    assert(got.get > 0.0 && got.get < 120.0, s"implausible median: $got")
  }

  test("freshJvmRerun returns None for an unknown gate instead of throwing") {
    // BenchOne dies on the name lookup -> no verdict line -> None; the
    // adjudicator then keeps the in-session verdict (loud, not a pass)
    assert(Bench.freshJvmRerun("/root/testdata/sf0.001")("no_such_gate").isEmpty)
  }
}
