package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.pipeline.BpeTrainer]]: the claim under test
  * is the classic BPE decomposition — the ONLY corpus-sized work is
  * the word-count aggregate; the merge loop runs on the bounded
  * top-`maxVocabWords` frequency table and is therefore
  * corpus-independent. The probe measures train() on the sf0.1
  * documents corpus AND on a `copies`-fold blow-up of it, then checks
  * (a) the learned merge tables are IDENTICAL (scaling every word
  * frequency by the same factor preserves the (freq, pair) total
  * order), and (b) fit time is flat apart from the word-count
  * aggregate's corpus pass. tokenCounts (encode under the trained
  * table) is timed over the blown-up corpus as the row-local,
  * zero-shuffle map it claims to be. Results in README's scale
  * section.
  *
  * Usage: runMain graft.BpeScaleProbe [copies] [merges]
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(200)
    val merges = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-bpe-scale-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val small = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text")).persist()
    val nSmall = small.count()
    val big = (0 until copies).map(c =>
        small.withColumn("doc_id", col("doc_id") + lit(c.toLong * 10000000L)))
      .reduce(_ unionByName _)
      .repartition(64)
      .persist()
    val nBig = big.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val (mSmall, fitSmallSec) =
      timed(graft.pipeline.BpeTrainer.train(small, "text", merges))
    val (mBig, fitBigSec) =
      timed(graft.pipeline.BpeTrainer.train(big, "text", merges))
    // the merge RANKING must be corpus-size-invariant; the co-occurrence
    // frequencies scale by exactly `copies`
    val sameTable = mSmall.map(m => (m.rank, m.left, m.right)) ==
      mBig.map(m => (m.rank, m.left, m.right))
    val freqScaled = mSmall.zip(mBig).forall { case (a, b) => a.freq * copies == b.freq }
    val (tokSum, encodeSec) = timed(
      graft.pipeline.BpeTrainer.tokenCounts(big, "text", mBig)
        .agg(sum(col("bpe_tokens"))).head().getLong(0))
    println(f"""{"probe":"bpe_scale","docs_small":$nSmall,"docs_big":$nBig,""" +
      f""""merges":${mBig.size},"fit_small_sec":$fitSmallSec%.1f,""" +
      f""""fit_big_sec":$fitBigSec%.1f,"same_merge_table":$sameTable,""" +
      f""""freqs_scaled_exactly":$freqScaled,""" +
      f""""encode_big_sec":$encodeSec%.1f,"bpe_tokens_big":$tokSum}""")
    spark.stop()
  }
}
