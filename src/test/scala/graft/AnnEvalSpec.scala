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

  test("clustered-corpus operating point: IVF nprobe=4 recall@10 meets the decision table") {
    // the ann_ivf_rule_clustered gate's fixture + centroid rule + probe
    // width, recall-checked against exact ground truth on 20
    // hash-sampled member queries (decorrelated from the generator's
    // cluster = id % 25 arithmetic — an arithmetic stride would sample
    // one cluster's geometry). The decision table's published clustered
    // IVF point is recall 0.985 @ nprobe=4; assert the fixture meets
    // the >= 0.95 serving bar so a fixture/centroid-rule regression
    // (e.g. a stride that stops covering all clusters) fails loudly.
    val emb = spark.read.parquet(Queries.clusteredFixtureDir(spark)).cache()
    try {
      val n = emb.count()
      val qs = emb
        .where(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"vec_id"),
          org.apache.spark.sql.functions.lit((n / 25).max(1))) === 0)
        .select($"vec_id", $"embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1).take(20)
      assert(qs.length >= 10, s"query sample too small: ${qs.length}")
      val cents = Queries.clusteredCents(emb)
      // 61 is coprime with the generator's 25-cluster arithmetic: all
      // clusters must be covered (a stride regression to a shared
      // factor collapses coverage to a cluster subset, the r12 catch)
      assert(cents.length >= 60, s"centroid rule lost coverage: nlist=${cents.length}")
      val truth = AnnEval.groundTruth(emb, "vec_id", "embedding", qs, 10).cache()
      val ivf = AnnEval.ivfTopK(emb, "vec_id", "embedding", qs, 10, cents, nprobe = 4)
      // the continuous-ingest row's index on the same fixture: LSH
      // 8x12 + 1-bit multi-probe (the ann_lsh_rule_clustered gate)
      val lshMp = AnnEval.lshTopK(emb, "vec_id", "embedding", qs, 10,
        RandomHyperplaneLsh(8, 12, 42L), dim = 64, maxHamming = 1)
      val reps = AnnEval.recallReport(spark, truth,
          Seq("ivf_clustered" -> ivf, "lsh_mp_clustered" -> lshMp), 10)
        .as[(String, Int, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      val rep = reps("ivf_clustered")
      val repL = reps("lsh_mp_clustered")
      info(f"clustered IVF nlist=${cents.length} nprobe=4: avg_recall=${rep._4}%.4f min_recall=${rep._5}%.4f scan=${4.0 / cents.length}%.3f")
      info(f"clustered LSH 8x12 mp1: avg_recall=${repL._4}%.4f min_recall=${repL._5}%.4f")
      // measured 1.000/1.000 at 6.1% scan on this fixture (σ=0.1,
      // within-cluster cos ≈ 0.8); ≥0.95 is the serving bar — the
      // sweep grid showed 0.62 on the σ=0.25 barely-clustered shape,
      // so a fixture-geometry regression fails this loudly
      assert(rep._4 >= 0.95, s"avg recall ${rep._4} below the clustered serving bar")
      // measured 0.81 avg on THIS fixture (n=4000 is sparser per
      // bucket than the 50k sweep that published 0.91 — recall is a
      // corpus-density property, which is itself worth pinning); the
      // 0.75 bar is a geometry-regression canary: a plane-seed or
      // banding change craters this far below
      assert(repL._4 >= 0.75, s"LSH mp avg recall ${repL._4} below the fixture's measured point")
    } finally emb.unpersist()
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
