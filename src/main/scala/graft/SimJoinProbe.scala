package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for the prefix-filtered exact Jaccard join —
  * local optimization harness (same role as BenchOne, but splits the
  * operator into its phases so a regression is attributable).
  * Usage: runMain graft.SimJoinProbe [sfDir]
  */
object SimJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"SIMJOIN $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    val docs = Tables.documents(spark, sfDir)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val docsh = Dedup.shingleArrays(docs, "doc_id", "text", 3).cache()
      time("docsh materialize")(docsh.count())
      val cand = time("candidates")(Dedup.prefixCandidates(docsh, 0.5).cache())
      time("candidates count")(println("  n_cand=" + cand.count()))
      // mirrors prefixJaccardPairs' verify EXACTLY (sizes read in-row
      // off the fetched arrays, no separate sizes joins) — a probe
      // phase that is heavier than the operator's real stage would
      // misattribute regressions
      time("verify") {
        val n = cand
          .join(docsh.toDF("id_a", "shs_a"), "id_a")
          .join(docsh.toDF("id_b", "shs_b"), "id_b")
          .withColumn("n_inter", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
          .withColumn("jaccard",
            col("n_inter").cast("double") /
              (size(col("shs_a")) + size(col("shs_b")) - col("n_inter")).cast("double"))
          .where(col("jaccard") >= 0.5)
          .count()
        println("  n_pairs=" + n)
      }
      cand.unpersist(); docsh.unpersist()
    }
    spark.stop()
  }
}
