package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Verify ambient canary (r17 — Bench's suite_ambient_factor
  * honesty extended to the correctness dump): a fixed pure-CPU spin
  * with a frozen calm-host calibration, reported as
  * `verify_ambient_factor` on Verify's stdout.
  */
class VerifyAmbientSpec extends AnyFunSuite {

  test("the canary is repeatable within the load-classification tolerance") {
    val warm = Verify.cpuCanarySec() // JIT warm-up, discarded
    val runs = Seq.fill(3)(Verify.cpuCanarySec())
    assert(warm > 0 && runs.forall(_ > 0))
    // repeatability: same JVM, back to back — the spread must be far
    // below the 1.5x the bench adjudication calls "ambient", or the
    // canary classifies its own jitter as load
    assert(runs.max / runs.min < 1.5,
      s"canary unstable: $runs (warm $warm)")
    info(f"canary runs: ${runs.map(r => f"$r%.3f").mkString(", ")} " +
      f"(calibration ${Verify.canaryCalibrationSec}%.2f)")
  }

  test("the frozen calibration is the right order of magnitude for this host") {
    // a drifted constant (host change, JIT change) would silently skew
    // every factor — keep it within 4x of a live reading either way,
    // the widest swing SKILL.md records for ambient load
    val live = { Verify.cpuCanarySec(); Verify.cpuCanarySec() }
    val ratio = live / Verify.canaryCalibrationSec
    assert(ratio > 0.25 && ratio < 4.0,
      f"calibration ${Verify.canaryCalibrationSec}%.2f vs live $live%.3f " +
        f"(ratio $ratio%.2f) — re-measure the constant on a calm host")
  }
}
