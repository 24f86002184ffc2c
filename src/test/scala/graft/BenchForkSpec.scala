package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fresh-JVM adjudication fork, exercised FOR REAL: BenchBudgetSpec
  * pins the verdict logic with stubs, but the r13 blind spot was in the
  * machinery (the rerun ran inside the degraded session), so the fork
  * itself needs live launches — classpath propagation, JVM flags, the
  * BENCHONE_MEDIAN handshake (suspect + ambient canary), the parse,
  * and the isolated working directory (r14 ADVICE: a fork sharing the
  * parent's cwd rewrote the target/gate-index trees under the parent's
  * cached FileIndexes).
  *
  * Runs at sf0.001 to keep each forked session's cost at JVM+session
  * startup (~30 s), not query time.
  */
class BenchForkSpec extends AnyFunSuite {

  test("freshJvmRerun parses suspect + canary medians and never touches the parent's cwd") {
    // an INDEX-BACKED suspect on purpose: under the old shared-cwd fork
    // this overwrote the repo-relative target/gate-index layout the
    // parent session may hold cached FileIndexes over
    val repoLayout = new java.io.File(
      s"target/gate-index/lsh-rule-${math.abs("/root/testdata/sf0.001".hashCode)}")
    val before = (repoLayout.exists(), repoLayout.lastModified())
    val got = Bench.freshJvmRerun("/root/testdata/sf0.001")("knn_lsh_rule")
    assert(got.isDefined, "fork produced no BENCHONE_MEDIAN line — launch failed")
    val fr = got.get
    assert(fr.suspectSec > 0.0 && fr.suspectSec < 120.0,
      s"implausible suspect median: $fr")
    assert(fr.canarySec.exists(c => c > 0.0 && c < 120.0),
      s"canary (${Bench.canaryGate}) median missing or implausible: $fr")
    assert((repoLayout.exists(), repoLayout.lastModified()) == before,
      "the fork modified the parent cwd's gate-index layout — isolation broken")
  }

  test("freshJvmRerun returns None for an unknown gate instead of throwing") {
    // BenchOne dies on the name LOOKUP — before any verdict line — so a
    // config error reads as fork-unlaunchable (in-session verdict
    // stands), distinct from a query death below
    assert(Bench.freshJvmRerun("/root/testdata/sf0.001")("no_such_gate").isEmpty)
  }

  test("a query that DIES fresh yields the -1.0 sentinel, not a missing line") {
    // r14 ADVICE: BenchOne catches per-run failures and prints a
    // negative median, so adjudicate's died_fresh branch is reachable
    // and forensics can tell a fresh death from a launch failure
    val got = Bench.freshJvmRerun("/no/such/sfdir")("region_customers")
    assert(got.isDefined, "death must still produce a verdict line")
    assert(got.get.suspectSec == -1.0, s"expected the death sentinel: $got")
  }
}
