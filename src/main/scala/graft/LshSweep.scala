package graft

import graft.index.{AnnEval, IvfKnn, RandomHyperplaneLsh}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall/cost grid for the ANN backends: sweeps LSH (numTables,
  * numPlanes, multi-probe) and IVF (nprobe) against exact ground truth
  * on a member-query sample and prints one line per config — avg/min
  * recall@10 plus the candidate fraction (mean share of the corpus each
  * query's probe touches, the probe's cost proxy: a config is only
  * useful when it beats a full scan, i.e. fraction << 1, at acceptable
  * recall).
  *
  * Usage: runMain graft.LshSweep [sfDir]
  *        runMain graft.LshSweep clustered [n] [clusters] [sigma]
  *
  * The second form evaluates on a deterministic mixture-of-Gaussians
  * corpus instead of the sfDir embeddings: real embedding spaces are
  * CLUSTERED (that is what an encoder is for), while the driver-
  * generated test vectors are isotropic random — LSH's worst case
  * (sign-bit planes split uniform mass evenly, so most probes miss) and
  * IVF's worst case (centroids carve noise). Operating-point advice for
  * production belongs on the clustered tier; the random tier is the
  * adversarial floor. Output feeds the two README tables.
  */
object LshSweep {

  private def splitmix(x0: Long): Long = graft.functions.TextFunctions.splitmix64(x0)

  private[graft] def gauss(seed: Long, i: Int): Double = {
    def unit(s: Long): Double =
      ((splitmix(s) >>> 11).toDouble / (1L << 53).toDouble).max(1e-12)
    math.sqrt(-2.0 * math.log(unit(seed * 0x100000001B3L + 2L * i))) *
      math.cos(2 * math.Pi * unit(seed * 0x100000001B3L + 2L * i + 1))
  }

  /** Deterministic mixture-of-Gaussians corpus: `clusters` unit-norm
    * centers (seeded per cluster id), each point = its cluster's center
    * + σ·N(0, I) noise (seeded per row id) — the shape real encoder
    * output has. No RNG object: splitmix64 streams keyed on ids, so any
    * partitioning of the range yields the identical corpus.
    */
  private[graft] def gaussianMixture(spark: SparkSession, n: Long, dim: Int,
                                     clusters: Int, sigma: Double): DataFrame = {
    val mkVec = udf { (id: Long) =>
      val c = id % clusters
      val center = Array.tabulate(dim)(i => gauss(0xC0FFEEL + c, i))
      val cn = math.sqrt(center.map(x => x * x).sum)
      Array.tabulate(dim)(i => (center(i) / cn + sigma * gauss(0xBEEFL + id, i)).toFloat)
    }
    spark.range(n).select(col("id").as("vec_id"), mkVec(col("id")).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val clustered = args.headOption.contains("clustered")
    val sfDir = if (!clustered && args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = (if (clustered) {
      val n = if (args.length > 1) args(1).toLong else 50000L
      val c = if (args.length > 2) args(2).toInt else 100
      val sigma = if (args.length > 3) args(3).toDouble else 0.25
      println(s"CLUSTERED corpus: n=$n clusters=$c sigma=$sigma dim=64")
      gaussianMixture(spark, n, 64, c, sigma)
      // the schema allows null embeddings (every ANN consumer filters
      // them — the O1 null-skip contract); a null here would NPE the
      // query sample and crash the IVF assign's non-nullable decode
    } else Tables.embeddings(spark, sfDir).where(col("embedding").isNotNull)).cache()
    val n = emb.count()
    val k = 10
    // HASH-sampled member queries, never an arithmetic stride: on the
    // clustered corpus cluster = vec_id % clusters, so any stride that
    // shares a factor with `clusters` samples a single cluster's
    // geometry (the r12 review catch: n=50000/clusters=100 made stride
    // 2000 pick 20 queries ALL from cluster 0, biasing every recall
    // number). xxhash64 decorrelates the sample from id arithmetic.
    val hashSampled = emb
      .where(pmod(xxhash64(col("vec_id")), lit((n / 25).max(1))) === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
      .take(20)
    // the hash sample has no floor: on a small or unlucky corpus it can
    // select ZERO members, and the sweep would then divide by zero and
    // print NaN recall rows as if they were measurements (r12 review
    // catch). Fall back to the 20 smallest ids by hash order — still
    // decorrelated from the cluster arithmetic above.
    val queries =
      if (hashSampled.nonEmpty) hashSampled
      else emb.select(col("vec_id"), col("embedding"))
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(20)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
    require(queries.nonEmpty, s"empty corpus at $sfDir — nothing to sweep")
    val truth = AnnEval.groundTruth(emb, "vec_id", "embedding", queries, k).cache()
    truth.count()

    println(f"${"method"}%7s ${"T"}%4s ${"P"}%4s ${"mp"}%3s ${"avg_recall"}%10s ${"min_recall"}%10s ${"cand_frac"}%10s")
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
      println(f"${"lsh"}%7s $t%4d $p%4d $mp%3d ${rep._1}%10.4f ${rep._2}%10.4f $frac%10.4f")
    }
    // IVF tier: stride sized so ~sqrt(n) rows become sampled centroids;
    // nprobe is the recall/cost dial
    val stride = math.max(n / math.max(math.sqrt(n.toDouble).toLong, 1L), 1L)
    val cents = IvfKnn.centroids(emb, col("vec_id"), col("embedding"), stride)
    val clusterSizes = IvfKnn.assign(emb, col("embedding"), cents)
      .groupBy("cluster_id").count()
      .as[(Long, Long)].collect().toMap
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val topk = AnnEval.ivfTopK(emb, "vec_id", "embedding", queries, k, cents, nprobe)
      val rep = AnnEval.recallReport(spark, truth, Seq("ivf" -> topk), k)
        .select("avg_recall", "min_recall").as[(Double, Double)].head()
      val fracs = queries.map { case (_, qv) =>
        IvfKnn.rankClusters(qv, cents).take(nprobe)
          .map { case (cid, _) => clusterSizes.getOrElse(cid, 0L) }.sum.toDouble / n
      }
      val frac = fracs.sum / fracs.length
      println(f"${"ivf"}%7s ${"-"}%4s ${"np=" + nprobe}%4s ${"-"}%3s ${rep._1}%10.4f ${rep._2}%10.4f $frac%10.4f")
    }
    spark.stop()
  }
}
