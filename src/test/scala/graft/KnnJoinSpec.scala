package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{BruteForceKnn, KnnJoin}

/** Set-to-set k-NN join: each graph row must equal the per-query brute
  * search (excluding self), and the per-query top-k must execute as
  * WindowGroupLimit — group limits before the shuffle, the property
  * that keeps the exchange at k·queries rows instead of the full pair
  * matrix.
  */
class KnnJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("graph rows equal per-query brute search excluding self") {
    val emb = Tables.embeddings(spark, sfDir).where(col("embedding").isNotNull)
    val graph = KnnJoin.exact(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", 3)
      .select(col("q_id"), col("rn"), col("neighbor_id"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(graph.keySet === Set(0L, 1L, 2L, 3L, 4L))
    for (qid <- 0L to 4L) {
      val qVec = emb.where(col("vec_id") === qid)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val brute = BruteForceKnn.search(
          emb.where(col("vec_id") =!= qid), col("embedding"), col("vec_id"), qVec, 3)
        .select(col("vec_id")).as[Long].collect().toSeq
      assert(graph(qid) === brute, s"neighbors of $qid diverge from brute")
    }
  }

  test("per-query top-k runs as WindowGroupLimit") {
    val plan = Queries.knnJoinGraph(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }
}
