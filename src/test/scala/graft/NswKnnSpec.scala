package graft

import graft.index.NswKnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NswKnnSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("NSW finds the member query itself at score 1 and only exact scores") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Queries.queryVec(spark, sfDir)
    val hits = NswKnn.search(emb, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect()
    assert(hits.head._1 == 0L && math.abs(hits.head._2 - 1.0) < 1e-9)
    val brute = graft.index.BruteForceKnn.scored(emb, col("embedding"), q)
      .select("vec_id", "score").as[(Long, Double)].collect().toMap
    hits.foreach { case (id, s) => assert(math.abs(brute(id) - s) < 1e-12) }
  }

  test("NSW recall@10 over member queries beats the LSH default on this corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val byId = all.map(_._2)
    val recalls = queries.map { case (qid, qv) =>
      val truth = OracleKnn.search(byId.map(_.map(_.toDouble)).toSeq, qv.map(_.toDouble), 10)
        .map(_._1.toLong).toSet
      val got = NswKnn.search(emb, "vec_id", "embedding", qv, 10)
        .select("vec_id").as[Long].collect().toSet
      truth.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    info(f"NSW avg recall@10 = $avg%.3f over ${queries.length} member queries")
    assert(avg >= 0.65, f"NSW recall too low: $avg%.3f")
  }

  test("deterministic across runs") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Queries.queryVec(spark, sfDir)
    def run() = NswKnn.search(emb, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(run() == run())
  }
}
