package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide physical-plan lint: every batch gate's plan is built at
  * sf0.001 and scanned for the operators that do not survive scale. A
  * future edit that silently degrades a join into a cartesian product
  * (the classic cause: an equi-join key typo turning the condition
  * into a filterable true-predicate) turns this red with the offending
  * gate named — the plan-shape analog of the schema canary.
  *
  * Streaming gates are excluded: invoking them RUNS a bounded
  * streaming job (their plan evidence is the stream==batch hash gate
  * instead). BroadcastNestedLoopJoin is allowed — the gates that plan
  * it bound the broadcast side by construction (documented per-op);
  * CartesianProduct (both sides shuffled, no key) never is.
  */
class PlanLintSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  test("no batch gate plans a CartesianProduct") {
    val sfDir = "/root/testdata/sf0.001"
    // contains, not endsWith: knn_serve_stream_rule / dedup_ingest_
    // stream_wb are streamed gates whose names end in _rule / _wb —
    // invoking them here would RUN their bounded streaming job and
    // lint the pinned LocalRelation result (vacuous), the same suffix
    // trap the r13 ADVICE caught in BenchBudget.profileChanged
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.contains("_stream"))
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }
}
