package graft

import graft.index.{AnnEval, RandomHyperplaneLsh}
import org.scalatest.funsuite.AnyFunSuite

class AnnEvalSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def queries = Tables.embeddings(spark, sfDir)
    .where($"vec_id" < 5).select($"vec_id", $"embedding")
    .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

  test("ground truth recall of itself is 1.0 and contains the member query at rank 1") {
    val emb = Tables.embeddings(spark, sfDir)
    val truth = AnnEval.groundTruth(emb, "vec_id", "embedding", queries, 10).cache()
    val report = AnnEval.recallReport(spark, truth, Seq("self" -> truth), 10)
      .as[(String, Int, Long, Double, Double)].head()
    assert(report._4 == 1.0 && report._5 == 1.0)
    // each member query's own vector is its top-1
    val self = truth.where($"qid" === $"id").count()
    assert(self == queries.length)
  }

  test("LSH and IVF recall are in [0,1], deterministic, and IVF with all-clusters probe is exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val truth = AnnEval.groundTruth(emb, "vec_id", "embedding", queries, 10).cache()
    val lsh = AnnEval.lshTopK(emb, "vec_id", "embedding", queries, 10,
      RandomHyperplaneLsh(8, 4, 42L), dim = 64)
    // nprobe >= number of clusters -> probes everything -> exact
    val ivfAll = AnnEval.ivfTopK(emb, "vec_id", "embedding", queries, 10,
      stride = 53L, nprobe = 100)
    val rep = AnnEval.recallReport(spark, truth, Seq("lsh" -> lsh, "ivf_all" -> ivfAll), 10)
      .as[(String, Int, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(rep("ivf_all")._4 == 1.0, s"ivf_all should be exact, got ${rep("ivf_all")}")
    assert(rep("lsh")._4 >= 0.0 && rep("lsh")._4 <= 1.0)
    val rep2 = AnnEval.recallReport(spark, truth, Seq("lsh" ->
      AnnEval.lshTopK(emb, "vec_id", "embedding", queries, 10,
        RandomHyperplaneLsh(8, 4, 42L), dim = 64)), 10)
      .as[(String, Int, Long, Double, Double)].head()
    assert(rep2._4 == rep("lsh")._4) // deterministic
  }

  test("single-pass evaluator reproduces the multi-pass recall numbers exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val k = 10
    val lshCfg = RandomHyperplaneLsh(8, 4, 42L)
    val truth = AnnEval.groundTruth(emb, "vec_id", "embedding", queries, k).cache()
    val lsh = AnnEval.lshTopK(emb, "vec_id", "embedding", queries, k, lshCfg, dim = 64)
    val lshMp = AnnEval.lshTopK(emb, "vec_id", "embedding", queries, k, lshCfg,
      dim = 64, maxHamming = 1)
    val ivf = AnnEval.ivfTopK(emb, "vec_id", "embedding", queries, k, stride = 53L, nprobe = 2)
    val expected = AnnEval.recallReport(spark, truth,
        Seq("lsh" -> lsh, "lsh_mp" -> lshMp, "ivf" -> ivf), k)
      .as[(String, Int, Long, Double, Double)].collect().sortBy(_._1)
    val got = AnnEval.recallSinglePass(emb, "vec_id", "embedding", queries, k,
        lshCfg, dim = 64, mpMaxHamming = 1, stride = 53L, nprobe = 2)
      .as[(String, Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
  }

  test("ann_recall_exact gate query: 4 replayable methods, multi-probe dominates exact-bucket") {
    val rows = Queries.annRecallExact(spark, sfDir)
      .as[(String, Int, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("ivf", "lsh", "lsh_mp", "sq"))
    assert(rows.forall(r => r._2 == 10 && r._3 == 20L))
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0 && r._5 <= r._4))
    val byM = rows.map(r => r._1 -> r._4).toMap
    // 1-bit multi-probe widens the exact-bucket candidate set, so its
    // recall can only be >= ; SQ8 ranks every row (no pruning) so it
    // should sit near the top of the table
    assert(byM("lsh_mp") >= byM("lsh"))
    assert(byM("sq") >= byM("lsh"))
  }
}
