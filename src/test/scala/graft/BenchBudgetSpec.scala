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
  // a mid-weight anchor for the adjudication tests so the 0.4 s slack
  // floor doesn't dominate the arithmetic: bar = 3*0.5 + 0.4 = 1.9
  private val midAnchor = Anchor(anchorSec = 0.5, budgetSec = 1.0,
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
    // Streamed-ness comes from GateRegistry (r14 ADVICE), so the
    // streamed case uses a REGISTERED gate name.
    val s = "events_sessionize_stream"
    val anchors = Map(s -> anchor, "x" -> anchor)
    // jobs+stages moved, shuffle identical, min over budget: NOT a
    // flag for the streamed gate...
    assert(overBudget(
      Seq(s -> run(2.0, 1.9, jobs = 15, stages = 17)), anchors).isEmpty)
    // ...but still the real flag for a batch gate with the same shape
    assert(overBudget(
      Seq("x" -> run(2.0, 1.9, jobs = 15, stages = 17)), anchors) == Seq("x"))
    // a streamed gate whose SHUFFLE moved is a genuine plan change
    assert(overBudget(
      Seq(s -> run(2.0, 1.9, shuffleMb = 5.0)), anchors) == Seq(s))
    // and with jobs wobbling but shuffle stable, a 3x median IS a
    // same-profile suspect for the streamed gate (adjudicated by re-run)
    assert(sameProfileSuspects(
      Seq(s -> run(0.7, 0.2, jobs = 15, stages = 17)), anchors) == Seq(s))
  }

  test("suite ambient factor: sum-ratio over unchanged-profile anchored gates") {
    val anchors = Map("a" -> anchor, "b" -> midAnchor)
    // calm host: medians at anchors -> ~1.0
    assert(suiteAmbientFactor(
      Seq("a" -> run(0.2, 0.2), "b" -> run(0.5, 0.5)), anchors)
      .exists(f => math.abs(f - 1.0) < 1e-9))
    // loaded host: both inflated 1.3x -> 1.3 (sum ratio)
    assert(suiteAmbientFactor(
      Seq("a" -> run(0.26, 0.26), "b" -> run(0.65, 0.65)), anchors)
      .exists(f => math.abs(f - 1.3) < 1e-9))
    // a gate whose PROFILE moved is a code change, not load — excluded:
    // with "b" 10x slow on a moved plan, the factor reads only "a"
    assert(suiteAmbientFactor(
      Seq("a" -> run(0.2, 0.2), "b" -> run(5.0, 5.0, jobs = 9)), anchors)
      .exists(f => math.abs(f - 1.0) < 1e-9))
    // failed gates (sentinel median) and unanchored gates excluded
    assert(suiteAmbientFactor(
      Seq("a" -> run(0.2, 0.2), "b" -> run(-1.0, -1.0),
        "new" -> run(9.0, 9.0)), anchors)
      .exists(f => math.abs(f - 1.0) < 1e-9))
    // no eligible gate: absent, never a fake 1.0
    assert(suiteAmbientFactor(Seq("new" -> run(9.0, 9.0)), anchors).isEmpty)
    assert(suiteAmbientFactor(Nil, anchors).isEmpty)
    // streamed gate: job/stage wobble does NOT exclude it (shuffle-only
    // signature), so an ambient-loaded streaming-heavy suite still reads
    val s = "events_sessionize_stream"
    assert(suiteAmbientFactor(
      Seq(s -> run(0.26, 0.2, jobs = 15, stages = 17)), Map(s -> anchor))
      .exists(f => math.abs(f - 1.3) < 1e-9))
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
    val anchors = Map("amb" -> midAnchor, "reg" -> midAnchor)
    val runs = Map("amb" -> run(2.2, 0.5), "reg" -> run(2.2, 2.1))
    val rerun = Map("amb" -> 0.6, "reg" -> 2.1) // bar = 1.9
    val out = adjudicate(Seq("amb", "reg"), runs, anchors, rerun,
      freshRerun = _ => Some(FreshRun(2.1, Some(0.5))),
      canaryAnchorSec = Some(0.5))
    assert(out.map(a => a.name -> a.reproduced).toMap ==
      Map("amb" -> false, "reg" -> true))
    assert(out.map(a => a.name -> a.verdict).toMap ==
      Map("amb" -> "cleared_in_session", "reg" -> "reproduced"))
    // the stdout key carries only reproductions
    assert(out.filter(_.reproduced).map(_.name) == Seq("reg"))
  }

  test("a re-run that FAILS counts as reproduced, never silently passes") {
    val out = adjudicate(Seq("q"), Map("q" -> run(2.2, 0.5)),
      Map("q" -> midAnchor), _ => -1.0)
    assert(out.head.reproduced && out.head.verdict == "died_in_session")
  }

  test("absolute slack floor: sub-second anchors are un-flaggable by fixed overhead") {
    // the r14 events_sessionize false flag replayed verbatim: anchor
    // 0.1279 s, driver median 1.157 s (suspect), in-session rerun
    // 0.427 s, forked fresh JVM 0.574 s on a machine running the whole
    // suite at 1.49x anchors. Under the pure relative bar (3x = 0.38 s)
    // both reruns "reproduced"; with the slack floor (bar = 0.784 s)
    // the in-session rerun alone clears it — fixed fresh-JVM overhead
    // on a 0.1 s query can no longer read as a 3-4x reproduction.
    val a = Anchor(0.1279, 0.256, 3, 3, 0.02)
    val out = adjudicate(Seq("q"), Map("q" -> run(1.157, 0.4)),
      Map("q" -> a), rerun = _ => 0.427,
      freshRerun = _ => fail("fork must not launch — rerun under the bar"))
    assert(!out.head.reproduced && out.head.verdict == "cleared_in_session")
    // and had the rerun stayed slow, the 0.574 s fresh run clears at
    // the fork stage (0.574 <= 0.784)
    val out2 = adjudicate(Seq("q"), Map("q" -> run(1.157, 0.4)),
      Map("q" -> a), rerun = _ => 0.9,
      freshRerun = _ => Some(FreshRun(0.574, Some(0.3))),
      canaryAnchorSec = Some(0.2039))
    assert(!out2.head.reproduced && out2.head.verdict == "fresh_cleared")
    // a REAL same-plan regression on the same gate still flags: 5x
    // anchor + slack everywhere, calm canary
    val out3 = adjudicate(Seq("q"), Map("q" -> run(1.157, 1.1)),
      Map("q" -> a), rerun = _ => 1.2,
      freshRerun = _ => Some(FreshRun(1.2, Some(0.25))),
      canaryAnchorSec = Some(0.2039))
    assert(out3.head.reproduced && out3.head.verdict == "reproduced")
  }

  test("ambient canary: an inflated canary reclassifies a fresh reproduction") {
    // suspect slow in-session AND fresh — but the canary gate timed in
    // the SAME forked JVM is itself over 1.5x its anchor + slack: the
    // machine is loaded, so the verdict is ambient, not reproduced
    val out = adjudicate(Seq("q"), Map("q" -> run(2.2, 2.1)),
      Map("q" -> midAnchor), rerun = _ => 2.1,
      freshRerun = _ => Some(FreshRun(2.1, Some(1.3))),
      canaryAnchorSec = Some(0.5)) // canary bar = 1.5*0.5 + 0.4 = 1.15
    assert(!out.head.reproduced && out.head.verdict == "ambient")
    assert(out.head.freshCanarySec.contains(1.3))
    // calm canary (under its bar): the reproduction stands
    val calm = adjudicate(Seq("q"), Map("q" -> run(2.2, 2.1)),
      Map("q" -> midAnchor), rerun = _ => 2.1,
      freshRerun = _ => Some(FreshRun(2.1, Some(0.6))),
      canaryAnchorSec = Some(0.5))
    assert(calm.head.reproduced && calm.head.verdict == "reproduced")
    // no canary in the fork (or no canary anchor): never classifies
    // ambient — absence of evidence must not launder a reproduction
    val none = adjudicate(Seq("q"), Map("q" -> run(2.2, 2.1)),
      Map("q" -> midAnchor), rerun = _ => 2.1,
      freshRerun = _ => Some(FreshRun(2.1, None)),
      canaryAnchorSec = Some(0.5))
    assert(none.head.reproduced)
    val noAnchor = adjudicate(Seq("q"), Map("q" -> run(2.2, 2.1)),
      Map("q" -> midAnchor), rerun = _ => 2.1,
      freshRerun = _ => Some(FreshRun(2.1, Some(9.9))),
      canaryAnchorSec = None)
    assert(noAnchor.head.reproduced)
  }

  test("fresh-JVM fork: a GC-degraded session cannot confirm its own flag") {
    // the r13 simjoin_prefix_collapsed case replayed: the in-session
    // rerun inherits the session's GC distress and reads slow (the old
    // single-rerun adjudication flagged on this alone), but the forked
    // fresh JVM runs warm at ~1.2x anchor -> the suspect self-clears,
    // with BOTH numbers on the forensics record
    val out = adjudicate(Seq("q"), Map("q" -> run(2.2, 2.1)),
      Map("q" -> midAnchor),
      rerun = _ => 2.2, freshRerun = _ => Some(FreshRun(0.6, Some(0.5))),
      canaryAnchorSec = Some(0.5))
    assert(!out.head.reproduced && out.head.verdict == "fresh_cleared")
    assert(out.head.rerunSec == 2.2 && out.head.freshJvmSec.contains(0.6))
  }

  test("fresh-JVM fork: a suspect that DIES fresh flags, even with a loaded canary") {
    // a fresh-JVM death is a correctness event — the ambient
    // classification must not launder it (match order: death first)
    val dead = adjudicate(Seq("q"), Map("q" -> run(2.2, 2.1)),
      Map("q" -> midAnchor), rerun = _ => 2.1,
      freshRerun = _ => Some(FreshRun(-1.0, Some(9.9))),
      canaryAnchorSec = Some(0.5))
    assert(dead.head.reproduced && dead.head.verdict == "died_fresh")
  }

  test("fresh-JVM fork: an unlaunchable fork lets the in-session verdict stand") {
    // None = the fork could not launch or printed no verdict line; the
    // adjudicator must stay loud rather than silently passing suspects
    val out = adjudicate(Seq("q"), Map("q" -> run(2.2, 2.1)),
      Map("q" -> midAnchor), rerun = _ => 2.1, freshRerun = _ => None)
    assert(out.head.reproduced && out.head.freshJvmSec.isEmpty)
    assert(out.head.verdict == "fork_unlaunchable")
  }

  test("fresh-JVM fork: skipped entirely when the in-session rerun clears") {
    var forked = 0
    val out = adjudicate(Seq("q"), Map("q" -> run(2.2, 0.5)),
      Map("q" -> midAnchor), rerun = _ => 0.6,
      freshRerun = _ => { forked += 1; Some(FreshRun(0.5, None)) })
    assert(!out.head.reproduced && forked == 0 && out.head.freshJvmSec.isEmpty)
  }

  test("fresh-JVM fork: an IN-SESSION death always flags, even if fresh is fast") {
    // a query that dies under adjudication is a correctness event, not
    // a timing event — a fast fresh run must not launder it
    val out = adjudicate(Seq("q"), Map("q" -> run(2.2, 2.1)),
      Map("q" -> midAnchor), rerun = _ => -1.0,
      freshRerun = _ => Some(FreshRun(0.5, Some(0.5))),
      canaryAnchorSec = Some(0.5))
    assert(out.head.reproduced && out.head.verdict == "died_in_session")
  }
}
