package graft

import org.scalatest.funsuite.AnyFunSuite

/** The frozen-budget gate's two flagging rules + the re-run
  * adjudication, unit-tested without Spark (the r11 verdict's task #1:
  * the hard gate was structurally blind to same-plan regressions, and
  * its hand adjudication of ambient contention belongs in the harness).
  */
class BenchBudgetSpec extends AnyFunSuite {
  import BenchBudget._

  private val anchor = Anchor(anchorSec = 0.2, budgetSec = 0.4,
    jobs = 4, stages = 4, shuffleMb = 0.0)
  private def run(med: Double, min: Double, jobs: Long = 4, stages: Long = 4,
                  shuffleMb: Double = 0.0) =
    QueryRun(med, min, jobs, stages, shuffleMb)

  test("over_budget: needs BOTH min over budget and a moved profile") {
    val anchors = Map("q" -> anchor)
    // slow median, fast min, same profile: ambient -> not flagged
    assert(overBudget(Seq("q" -> run(2.0, 0.21)), anchors).isEmpty)
    // min over budget but identical profile: same-plan class, not this flag
    assert(overBudget(Seq("q" -> run(2.0, 1.9)), anchors).isEmpty)
    // profile moved but min within budget: plan changed cheaply -> fine
    assert(overBudget(Seq("q" -> run(0.3, 0.25, jobs = 9)), anchors).isEmpty)
    // min over budget AND profile moved: the real flag
    assert(overBudget(Seq("q" -> run(2.0, 1.9, jobs = 9)), anchors) == Seq("q"))
    // failed query (sentinel min) never flags here; `failed` carries it
    assert(overBudget(Seq("q" -> run(-1.0, -1.0, jobs = 9)), anchors).isEmpty)
    // unanchored query: skipped until the next freeze
    assert(overBudget(Seq("new" -> run(9.0, 9.0, jobs = 9)), anchors).isEmpty)
  }

  test("streaming gates: job/stage wobble is load noise, shuffle is the signature") {
    // r13 catch: an ambient-slow run scheduled extra no-data
    // micro-batches for a streamed gate (11 -> 15 jobs, identical
    // shuffle), which read as a plan change and turned load into a
    // hard over_budget flag. Streaming profile = shuffle bytes only.
    val anchors = Map("x_stream" -> anchor, "x" -> anchor)
    // jobs+stages moved, shuffle identical, min over budget: NOT a
    // flag for the streamed gate...
    assert(overBudget(
      Seq("x_stream" -> run(2.0, 1.9, jobs = 15, stages = 17)), anchors).isEmpty)
    // ...but still the real flag for a batch gate with the same shape
    assert(overBudget(
      Seq("x" -> run(2.0, 1.9, jobs = 15, stages = 17)), anchors) == Seq("x"))
    // a streamed gate whose SHUFFLE moved is a genuine plan change
    assert(overBudget(
      Seq("x_stream" -> run(2.0, 1.9, shuffleMb = 5.0)), anchors) == Seq("x_stream"))
    // and with jobs wobbling but shuffle stable, a 3x median IS a
    // same-profile suspect for the streamed gate (adjudicated by re-run)
    assert(sameProfileSuspects(
      Seq("x_stream" -> run(0.7, 0.2, jobs = 15, stages = 17)), anchors) == Seq("x_stream"))
  }

  test("same-profile suspects: median > 3x anchor with unchanged profile") {
    val anchors = Map("q" -> anchor)
    assert(sameProfileSuspects(Seq("q" -> run(0.7, 0.2)), anchors) == Seq("q"))
    // under the factor: not a suspect
    assert(sameProfileSuspects(Seq("q" -> run(0.55, 0.2)), anchors).isEmpty)
    // over the factor but profile moved: over_budget's class, not this one
    assert(sameProfileSuspects(Seq("q" -> run(0.7, 0.65, stages = 7)), anchors).isEmpty)
    // shuffle drift over 1 MB counts as a moved profile
    assert(sameProfileSuspects(Seq("q" -> run(0.7, 0.2, shuffleMb = 1.5)), anchors).isEmpty)
  }

  test("adjudication: ambient contention clears, a reproduction sticks") {
    val anchors = Map("amb" -> anchor, "reg" -> anchor)
    val runs = Map("amb" -> run(0.9, 0.2), "reg" -> run(0.9, 0.85))
    val rerun = Map("amb" -> 0.21, "reg" -> 0.88) // fresh timings
    val out = adjudicate(Seq("amb", "reg"), runs, anchors, rerun)
    assert(out.map(a => a.name -> a.reproduced).toMap ==
      Map("amb" -> false, "reg" -> true))
    // the stdout key carries only reproductions
    assert(out.filter(_.reproduced).map(_.name) == Seq("reg"))
  }

  test("a re-run that FAILS counts as reproduced, never silently passes") {
    val out = adjudicate(Seq("q"), Map("q" -> run(0.9, 0.2)),
      Map("q" -> anchor), _ => -1.0)
    assert(out.head.reproduced)
  }

  test("fresh-JVM fork: a GC-degraded session cannot confirm its own flag") {
    // the r13 simjoin_prefix_collapsed case replayed: the in-session
    // rerun inherits the session's GC distress and reads slow (the old
    // single-rerun adjudication flagged on this alone), but the forked
    // fresh JVM runs warm at ~1.2x anchor -> the suspect self-clears,
    // with BOTH numbers on the forensics record
    val anchors = Map("q" -> anchor) // anchor 0.2, factor 3 -> bar 0.6
    val out = adjudicate(Seq("q"), Map("q" -> run(0.9, 0.85)), anchors,
      rerun = _ => 0.9, freshRerun = _ => Some(0.25))
    assert(!out.head.reproduced)
    assert(out.head.rerunSec == 0.9 && out.head.freshJvmSec.contains(0.25))
  }

  test("fresh-JVM fork: a regression that reproduces fresh stays flagged") {
    val out = adjudicate(Seq("q"), Map("q" -> run(0.9, 0.85)),
      Map("q" -> anchor), rerun = _ => 0.9, freshRerun = _ => Some(0.88))
    assert(out.head.reproduced)
    // and a suspect that DIES in the fresh JVM flags too
    val dead = adjudicate(Seq("q"), Map("q" -> run(0.9, 0.85)),
      Map("q" -> anchor), rerun = _ => 0.9, freshRerun = _ => Some(-1.0))
    assert(dead.head.reproduced)
  }

  test("fresh-JVM fork: an unlaunchable fork lets the in-session verdict stand") {
    // None = the fork could not launch or printed no verdict line; the
    // adjudicator must stay loud rather than silently passing suspects
    val out = adjudicate(Seq("q"), Map("q" -> run(0.9, 0.85)),
      Map("q" -> anchor), rerun = _ => 0.9, freshRerun = _ => None)
    assert(out.head.reproduced && out.head.freshJvmSec.isEmpty)
  }

  test("fresh-JVM fork: skipped entirely when the in-session rerun clears") {
    var forked = 0
    val out = adjudicate(Seq("q"), Map("q" -> run(0.9, 0.2)),
      Map("q" -> anchor), rerun = _ => 0.21,
      freshRerun = _ => { forked += 1; Some(0.2) })
    assert(!out.head.reproduced && forked == 0 && out.head.freshJvmSec.isEmpty)
  }

  test("fresh-JVM fork: an IN-SESSION death always flags, even if fresh is fast") {
    // a query that dies under adjudication is a correctness event, not
    // a timing event — a fast fresh run must not launder it
    val out = adjudicate(Seq("q"), Map("q" -> run(0.9, 0.85)),
      Map("q" -> anchor), rerun = _ => -1.0, freshRerun = _ => Some(0.2))
    assert(out.head.reproduced)
  }
}
