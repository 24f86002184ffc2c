package graft

import graft.functions.TextFunctions
import graft.pipeline.TrainingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The COMPOSED ingestion pipeline (the `pipeline_survivors` shape) at
  * ~100× the gate corpus: every sf0.1 document appears in `copies`
  * copies with distinct ids (default 100 → ~500k docs), so the
  * composition faces a duplicate-heavy crawl slice an order of
  * magnitude past what the bench measures. Stages are timed
  * individually AND composed end-to-end — the composed number is the
  * evidence that chaining the stages adds no super-linear cost (the
  * plan stays one scan + one 16-byte-key shuffle + bounded joins).
  * Results are recorded in docs/PIPELINE.md.
  * Usage: runMain graft.PipelineProbe [copies]
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, "/root/testdata/sf0.1") // 5000 docs
    val idBase = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val big = base.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * idBase).as("doc_id"),
        col("text"), col("lang"), col("source"))
    val bigPath = "target/pipeline-probe/corpus"
    big.write.mode("overwrite").parquet(bigPath)
    val corpus = spark.read.parquet(bigPath)
    println(s"PIPE corpus rows=${corpus.count()}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PIPE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // ---- the stages, individually -------------------------------
    val nt = TextFunctions.tokenCount(col("text"))
    val atl = TextFunctions.avgTokenLength(col("text"))
    val sr = TextFunctions.stopwordRatio(col("text"))
    def quality(in: DataFrame): DataFrame = in
      .where(col("doc_id") % 50 =!= 0)
      .where(nt >= 30 && atl >= 4.0 && atl <= 5.0 && sr <= 0.10)
    def dedupFirst(in: DataFrame): DataFrame = {
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      in.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    }
    def contaminatedIds(in: DataFrame): DataFrame =
      TrainingOps.decontaminate(in, "doc_id", "text",
        isBenchmark = col("doc_id") % 50 === 0).select(col("doc_id"))

    time("stage quality gate") { quality(corpus).count() }
    time("stage exact-dedup keep-first (md5 window)") {
      dedupFirst(quality(corpus)).count()
    }
    time("stage decontaminate (gram join vs broadcast bench split)") {
      contaminatedIds(corpus).count()
    }
    time("stage stratified sample") {
      TrainingOps.stratifiedKept(corpus, "doc_id",
        when(col("lang") === "en", 25).otherwise(75))
        .where(col("kept")).count()
    }

    // the round-6 operators at the same ~500k scale: the bloom
    // screen's regime (training gram stream 100x the benchmark's) and
    // the tf-idf df join against a 100x-duplicated corpus
    time("stage decontaminate via bloom screen") {
      TrainingOps.decontaminateBloom(corpus, "doc_id", "text",
        isBenchmark = col("doc_id") % 50 === 0).count()
    }
    time("stage tf-idf top-3 terms (persistTf — the 500k regime)") {
      TrainingOps.tfIdfTopK(corpus, "doc_id", "text", persistTf = true).count()
    }

    // the round-7 operators at the same ~500k scale: the training-
    // order shuffle (one hash exchange + per-shard sort — 512 shards
    // keeps each window partition ~1k rows, the task-sized unit the
    // operator's scaladoc prescribes), and the two map-only passes
    // (logistic filter, PII scrub) whose cost should be scan-bound
    time("stage shuffle into 512 training shards (SplitMix64 order)") {
      // global max(pos) read via head() — the value is consumed, so
      // Catalyst cannot prune the row_number Window and its per-shard
      // sort the stage exists to measure (a grouped agg + count()
      // DOES prune them: count only needs group existence, max(pos)
      // is unreferenced, and the window feeding it folds away)
      TrainingOps.shuffleShard(corpus, "doc_id", numShards = 512)
        .agg(max(col("pos"))).head().getLong(0)
    }
    time("stage logistic quality filter") {
      TrainingOps.qualityLogit(corpus, "text").where(col("kept")).count()
    }
    time("stage PII scrub (3 ordered regex passes + match counts)") {
      // head().getLong forces the sums — a count() over a global agg
      // lets Catalyst prune the aggregate expressions entirely (the
      // regexes would never run and the stage would time the no-op)
      corpus.select(
          TextFunctions.piiRedact(col("text")).as("red"),
          TextFunctions.piiCount(col("text"), TextFunctions.EmailRx).cast("long").as("ne"))
        .agg(sum(length(col("red"))).as("l"), sum(col("ne")).as("e"))
        .head().getLong(0)
    }

    // ---- the composition, end-to-end ----------------------------
    time("COMPOSED survivors (quality -> dedup -> decontaminate -> sample -> agg)") {
      val clean = dedupFirst(quality(corpus))
        .join(contaminatedIds(corpus), Seq("doc_id"), "left_anti")
      TrainingOps.stratifiedKept(clean, "doc_id",
          when(col("lang") === "en", 25).otherwise(75))
        .where(col("kept"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(col("doc_id")).as("kept_id_sum"))
        .count()
    }
    spark.stop()
  }
}
