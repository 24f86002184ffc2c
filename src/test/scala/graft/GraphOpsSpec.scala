package graft

import graft.pipeline.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** PageRank against plain-Scala recomputation of the same simplified
  * recurrence, plus the two structural invariants: a symmetric cycle
  * stays uniform at every iteration, and a sink keeps exactly its
  * teleport share.
  */
class GraphOpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def recompute(edges: Seq[(Long, Long)], iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v -> ((1 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    GraphOps.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Double)].collect().toMap

  test("3-cycle stays exactly uniform at every iteration") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    for (it <- Seq(1, 3)) {
      val r = run(cycle, it)
      assert(r.keySet == Set(1L, 2L, 3L))
      r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    }
  }

  test("star + sink matches the plain-Scala recurrence; sink semantics pinned") {
    // 1 and 2 both point at 3; 3 points nowhere (sink); 4 → 1 gives
    // node 1 an in-edge so ranks differentiate
    val edges = Seq((1L, 3L), (2L, 3L), (4L, 1L))
    val got = run(edges, 3)
    val want = recompute(edges, 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, v) => assert(math.abs(v - want(id)) < 1e-12, s"node $id") }
    // the hub out-ranks the spokes; 2 (no in-edges) holds only the
    // teleport share (1-0.85)/4 after any number of iterations
    assert(got(3L) > got(1L) && got(1L) > got(2L))
    assert(math.abs(got(2L) - (1 - 0.85) / 4) < 1e-12)
  }
}
