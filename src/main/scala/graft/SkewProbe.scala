package graft

import graft.pipeline.TrainingOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew probe for the cluster-blocked operator family
  * (`semDedup`, `clusterBalance`): a deliberately DEGENERATE
  * clustering — one cluster holds 50% of the corpus — which is the
  * worst case the `maxBlock` sub-blocking exists for. k-means never
  * promises balance, so this distribution is what a
  * near-duplicate-saturated crawl slice hands the operator at 100 TB.
  *
  * Measures, via a TaskEnd listener, the PER-TASK maximum
  * shuffle-read / input record counts — the number that decides
  * whether one straggler task owns the giant cluster's quadratic pair
  * expansion or the work spreads across the (cluster, block) keys:
  *   - 20k rows: unbounded (maxBlock = corpus size) vs bounded
  *     (maxBlock=256) side by side — the unbounded join funnels the
  *     whole giant cluster through single join keys while the bounded
  *     one levels per-task reads, at a size where the unbounded
  *     |cluster|²/2 expansion is still runnable;
  *   - 200k rows, bounded only: the unbounded variant would be a
  *     5·10⁹-dot single task (hours), which is precisely the point.
  * Results are recorded in docs/PIPELINE.md.
  *
  * Usage: runMain graft.SkewProbe [rows]
  */
object SkewProbe {
  private final class MaxTaskRows extends SparkListener {
    @volatile var maxShuffleRead = 0L
    @volatile var maxInput = 0L
    @volatile var maxMillis = 0L
    @volatile var tasks = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        maxShuffleRead = math.max(maxShuffleRead, m.shuffleReadMetrics.recordsRead)
        maxInput = math.max(maxInput, m.inputMetrics.recordsRead)
        tasks += 1
      }
      if (te.taskInfo != null)
        maxMillis = math.max(maxMillis, te.taskInfo.duration)
    }
    def reset(): Unit = { maxShuffleRead = 0L; maxInput = 0L; maxMillis = 0L; tasks = 0L }
  }

  private val dim = 32
  private val k = 64

  /** Well-separated synthetic centers: center c sits at magnitude
    * 8·(layer+1) on axis c % dim — inter-center distance dwarfs the
    * ±0.005 vector noise, so assignment is exactly the intended one. */
  private val centers: Array[Array[Double]] =
    Array.tabulate(k, dim)((c, j) => if (j == c % dim) 8.0 * (c / dim + 1) else 0.0)

  // the shared scrambler — a local copy could silently drift from the
  // operator's block/cluster assignment it must agree with
  private def smix(x0: Long): Long =
    graft.functions.TextFunctions.splitmix64(x0)

  /** 50% of ids to cluster 0, the rest uniform over clusters 1..63;
    * vector = center + deterministic per-coordinate noise so every
    * same-cluster pair clears a 0.9 cosine threshold. */
  private def skewedCorpus(spark: SparkSession, rows: Long): DataFrame = {
    val vecOf = udf { (id: Long) =>
      val c = if (id < rows / 2) 0 else 1 + (smix(id) % 63).toInt.abs
      Array.tabulate(dim) { j =>
        (centers(c)(j) + (smix(id * dim + j) % 1000L) / 100000.0).toFloat
      }
    }
    spark.range(rows).select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // AQE coalescing would merge the unbounded run's tiny partitions
      // into fewer tasks and muddy the per-task max; the skew numbers
      // must reflect the JOIN KEY distribution, not runtime repair
      .config("spark.sql.adaptive.enabled", "false")
      // the 100 TB regime: neither self-join side fits a broadcast, so
      // the candidate join MUST be measured as a shuffle join (at probe
      // sizes Spark would otherwise broadcast 2-3 MB and spread the
      // giant cluster's pairs over the probe side's file partitions,
      // hiding exactly the key skew this probe exists to expose)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MaxTaskRows
    spark.sparkContext.addSparkListener(listener)

    def probe(label: String)(f: => Long): Unit = {
      listener.reset()
      val t0 = System.nanoTime()
      val n = f
      // the listener bus is async (and private); a beat is enough for
      // the last TaskEnd events of a finished job to drain
      Thread.sleep(1000)
      println(f"SKEW $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        f"$n rows, maxTaskShuffleReadRows=${listener.maxShuffleRead}, " +
        f"maxTaskInputRows=${listener.maxInput}, " +
        f"maxTaskMillis=${listener.maxMillis}, tasks=${listener.tasks}")
    }

    // materialize the corpus so probes measure the operator, not the
    // generator UDF
    val smallPath = "target/skew-probe/small"
    val bigPath = "target/skew-probe/big"
    skewedCorpus(spark, 20000L).write.mode("overwrite").parquet(smallPath)
    skewedCorpus(spark, rows).write.mode("overwrite").parquet(bigPath)
    val small = spark.read.parquet(smallPath)
    val big = spark.read.parquet(bigPath)
    println(s"SKEW small rows=${small.count()} big rows=${big.count()} " +
      s"(50% in one cluster, k=$k, dim=$dim)")

    probe("semDedup 20k UNBOUNDED (maxBlock=corpus: giant cluster is one join key)") {
      TrainingOps.semDedup(small, "vec_id", "embedding", centers,
        tau = 0.9, maxBlock = Int.MaxValue).count()
    }
    probe("semDedup 20k bounded (maxBlock=256)") {
      TrainingOps.semDedup(small, "vec_id", "embedding", centers,
        tau = 0.9, maxBlock = 256).count()
    }
    probe(s"semDedup ${rows / 1000}k bounded (maxBlock=256)") {
      TrainingOps.semDedup(big, "vec_id", "embedding", centers,
        tau = 0.9, maxBlock = 256).count()
    }
    probe(s"clusterBalance ${rows / 1000}k (one-pass histogram)") {
      TrainingOps.clusterBalance(big, "vec_id", "embedding", centers).count()
    }
    spark.stop()
  }
}
