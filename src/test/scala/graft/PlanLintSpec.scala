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
    // keyed on the explicit registry, not a name substring (r14
    // ADVICE): invoking a streamed gate here would RUN its bounded
    // streaming job and lint the pinned LocalRelation result (vacuous);
    // GateRegistrySpec guarantees the registry tracks the gate map
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => GateRegistry.streamed(q._1))
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }
}
