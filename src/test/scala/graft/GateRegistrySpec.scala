package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the three consumers of streamed-ness in sync with the ONE
  * registry (r14 ADVICE: the predicate was `contains("_stream")`
  * replicated in BenchBudget, PlanLintSpec and freeze_anchors.py — a
  * rename or a batch gate with `_stream` in its name away from
  * silently mis-classifying).
  */
class GateRegistrySpec extends AnyFunSuite {

  test("every registered streamed gate is a live query") {
    val unknown = GateRegistry.streamed -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"registry names gates that no longer exist (rename?): $unknown")
  }

  test("every *_stream query name is registered (naming-convention net)") {
    // the registry is the truth; this direction only catches the
    // common case — a NEW streamed gate following the naming
    // convention that was forgotten here. A streamed gate named
    // without `_stream` (or a batch gate named with it) is exactly
    // what the explicit registry exists to allow — reviewed by hand.
    val missing = SparkEntry.queries.keySet.filter(_.contains("_stream")) --
      GateRegistry.streamed
    assert(missing.isEmpty,
      s"gates named *_stream* but not in GateRegistry.streamed: $missing")
  }

  test("docs/STREAMED_GATES.json mirrors the registry for python consumers") {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("docs/STREAMED_GATES.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(raw)
    val fromJson = (0 until node.size()).map(node.get(_).asText()).toSet
    assert(fromJson == GateRegistry.streamed,
      "docs/STREAMED_GATES.json drifted from GateRegistry.streamed — " +
        s"json-only: ${fromJson -- GateRegistry.streamed}, " +
        s"scala-only: ${GateRegistry.streamed -- fromJson}")
  }

  test("profileChanged keys on the registry, not the name") {
    import BenchBudget._
    val a = Anchor(0.2, 0.4, jobs = 4, stages = 4, shuffleMb = 0.0)
    val wobble = QueryRun(0.3, 0.2, jobs = 15, stages = 17, shuffleMb = 0.0)
    // a REGISTERED streamed gate: job/stage wobble is load noise
    assert(!profileChanged("knn_serve_stream_rule", wobble, a))
    // an UNregistered gate whose name merely contains _stream keeps
    // the full batch signature — the exact trap the registry closes
    assert(profileChanged("batch_stream_export", wobble, a))
  }
}
