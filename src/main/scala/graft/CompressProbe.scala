package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage probe: does similarity-ordered layout shrink the stored
  * corpus? Parquet compresses per column chunk, so placing near-
  * duplicate documents ADJACENTLY lets the codec exploit their shared
  * text — the "cluster then write" trick that turns the dedup tier's
  * similarity signals into storage savings even for rows a threshold
  * dedup keeps. Compares the same duplicate-heavy corpus written in
  * three orders: original ids, random (splitmix64) scatter, and
  * SimHash order (near-dups sort together because close sketches
  * share high bits). At 100 TB the delta is the point: the write is
  * the same one exchange either way — ordering is free at write time,
  * the bytes are not.
  */
object CompressProbe {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val idBase = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val corpus = base.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * idBase).as("doc_id"),
        col("text"), col("source"))
      .cache()
    println(s"COMPRESS corpus rows=${corpus.count()}")

    def sizeOf(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) { val cs = f.listFiles(); if (cs == null) 0L else cs.map(walk).sum }
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(path))
    }
    def write(label: String, df: org.apache.spark.sql.DataFrame): Long = {
      val path = s"target/compress-probe/$label"
      df.coalesce(8).write.mode("overwrite").parquet(path)
      val bytes = sizeOf(path)
      println(f"COMPRESS $label: ${bytes / 1e6}%.1f MB")
      bytes
    }
    // id order interleaves the copies at distance |base| — far apart
    val a = write("id-order", corpus.orderBy(col("doc_id")))
    // random scatter: the adversarial layout
    val b = write("random-order",
      corpus.orderBy(graft.expressions.SplitMix64(col("doc_id"))))
    // simhash order: exact copies and near-dups land adjacent
    val withSketch = graft.functions.TextFunctions
      .simhash64(corpus.select(col("doc_id"), col("text")), "doc_id", "text")
      .join(corpus, "doc_id")
    val c = write("simhash-order",
      withSketch.orderBy(col("simhash").asc_nulls_last, col("doc_id"))
        .select(col("doc_id"), col("text"), col("source")))
    println(f"COMPRESS simhash vs id: ${100.0 * (a - c) / a}%.1f%% smaller; " +
      f"vs random: ${100.0 * (b - c) / b}%.1f%% smaller")
    spark.stop()
  }
}
