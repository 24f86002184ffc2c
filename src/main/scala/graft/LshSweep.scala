package graft

import graft.index.{AnnEval, RandomHyperplaneLsh}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/cost grid for the sign-bit LSH index: sweeps (numTables,
  * numPlanes) against exact ground truth on a member-query sample and
  * prints one line per config — avg/min recall@10 plus the candidate
  * fraction (mean share of the corpus each query's probe touches, the
  * probe's cost proxy: a config is only useful when it beats a full
  * scan, i.e. fraction << 1, at acceptable recall).
  *
  * Usage: runMain graft.LshSweep [sfDir]
  * Output feeds the tuned defaults documented in README (the
  * reference's own 8×12 default is recall-starved on random vectors —
  * 4096 buckets over a few thousand rows make most probes miss).
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    val k = 10
    val queries = emb.where(col("vec_id") % 25 === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
      .take(20)
    val truth = AnnEval.groundTruth(emb, "vec_id", "embedding", queries, k).cache()
    truth.count()

    println(f"${"T"}%3s ${"P"}%3s ${"mp"}%3s ${"avg_recall"}%10s ${"min_recall"}%10s ${"cand_frac"}%10s")
    val grid = (for (t <- Seq(4, 8, 16); p <- Seq(4, 6, 8, 10, 12)) yield (t, p, 0)) ++
      (for (p <- Seq(6, 8, 10, 12)) yield (8, p, 1)) // multi-probe: free recall, no storage
    for ((t, p, mp) <- grid) {
      val lsh = RandomHyperplaneLsh(t, p, 42L)
      val topk = AnnEval.lshTopK(emb, "vec_id", "embedding", queries, k, lsh, dim = 64,
        maxHamming = mp)
      val rep = AnnEval.recallReport(spark, truth, Seq("lsh" -> topk), k)
        .select("avg_recall", "min_recall").as[(Double, Double)].head()
      // candidate fraction: mean per-query share of corpus matched
      val matched = queries.map { case (_, qv) =>
        emb.where(lsh.candidateMatch(col("embedding"), lsh.queryBuckets(qv, 64), 64, mp))
          .count().toDouble / n
      }
      val frac = matched.sum / matched.length
      println(f"$t%3d $p%3d $mp%3d ${rep._1}%10.4f ${rep._2}%10.4f $frac%10.4f")
    }
    spark.stop()
  }
}
