package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the r16 registration-level guaranteed-k ladder at 1M rows —
  * the three serving options a filtered top-k has over a registered
  * LSH layout, measured head to head per filter selectivity:
  *
  *  - '''static probe''' (`guaranteeK = false`): the plan the caller
  *    got before r16 — fastest, but under a selective filter it
  *    returns FEWER THAN k rows (the hash-green-but-vacuous failure
  *    the ladder exists to close); rows returned is the honest metric.
  *  - '''rule-served ladder''' (`guaranteeK = true`, plain filtered
  *    top-k): the in-plan escalation — candidates at Hamming ≤ 1 with
  *    a distance tag, one single-row level aggregate broadcast back,
  *    starved-only brute rung — ONE plan, no driver round-trips.
  *  - '''library ladder''' ([[graft.index.LshIndexStore
  *    .searchFilteredAdaptive]]): same decisions, but up to two
  *    driver-side COUNT jobs before the serving query — the cost the
  *    in-plan form eliminates.
  *
  * Rows-read per serve (recordsRead) shows the cost SHAPE: the probe
  * rungs read only the pruned ball directories ∩ filter; the brute
  * rung reads the filtered `table = 0` sub-layout — proportional to
  * the filtered subset, exactly what a correct answer requires.
  *
  * Usage: runMain graft.GkLadderProbe [rows]  (default 1,000,000)
  * Results recorded in README (guaranteed-k section).
  */
object GkLadderProbe {

  private final class RowsRead extends SparkListener {
    @volatile var n = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) n += m.inputMetrics.recordsRead
    }
    def reset(): Unit = n = 0L
  }

  private def smix(x: Long): Long = graft.functions.TextFunctions.splitmix64(x)

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new RowsRead
    spark.sparkContext.addSparkListener(listener)

    val dim = 64
    val vecOf = udf { (id: Long) =>
      Array.tabulate(dim)(j => ((smix(id * dim + j) % 2000L) / 1000.0).toFloat)
    }
    val lsh = graft.index.RandomHyperplaneLsh(8, 12, 42L)
    val path = "target/gk-ladder-probe/layout"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      graft.index.LshIndexStore(lsh, dim).write(
        spark.range(rows).select(col("id").as("vec_id"), vecOf(col("id")).as("embedding")),
        "embedding", path)
      println(f"GKPROBE layout build (one-time): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LshProbeRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LshProbeRewrite
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[graft.plans.LshProbeStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.LshProbeStrategy(spark)
    val base = spark.read.parquet(path)
    val q = Array.tabulate(dim)(j => ((smix(7L * dim + j) % 2000L) / 1000.0).toFloat)

    def timeIt[A](label: String)(f: => A): A = {
      listener.reset()
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // drain async listener bus before reading rowsRead
      println(f"GKPROBE $label: $sec%6.2f s rowsRead=${listener.n}")
      out
    }
    def ruleServe(): org.apache.spark.sql.DataFrame => Seq[(Long, String)] = df =>
      df.collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    def filteredTopk(filter: org.apache.spark.sql.Column) = base
      .where(filter)
      .withColumn("score", graft.expressions.CosineSimilarity(
        col("embedding"), typedlit(q.toSeq)))
      .withColumn("index_used", lit("auto"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(5)
      .select(col("vec_id"), round(col("score"), 4).as("score"), col("index_used"))

    val cases = Seq(
      ("broad  (vec_id % 2 = 0, 50%)", pmod(col("vec_id"), lit(2)) === 0),
      ("mid    (vec_id % 1009 = 0, ~0.1%)", pmod(col("vec_id"), lit(1009)) === 0),
      ("narrow (vec_id % 200003 = 0, ~5 rows)", pmod(col("vec_id"), lit(200003)) === 0))

    for ((name, filter) <- cases) {
      println(s"GKPROBE ==== filter $name ====")
      // Each timed serve builds a FRESH DataFrame: re-collecting one
      // Dataset object reuses its shuffle map outputs (stages skipped,
      // zero parquet reads — measured before this fix), which no real
      // per-query serve gets. Fresh plans also charge the ladder its
      // honest re-entrant optimization cost per query.
      // static probe: the pre-r16 plan — count what it actually returns
      graft.plans.LshProbeRewrite.register(path, lsh, dim) // guaranteeK = false
      require(filteredTopk(filter).queryExecution.optimizedPlan.toString
        .contains("LshProbeTopK"))
      timeIt("static probe (warmup)")(filteredTopk(filter).collect())
      val sRows = timeIt("static probe (warm)")(filteredTopk(filter).collect())
      println(s"GKPROBE   static returned ${sRows.length}/5 rows" +
        (if (sRows.length < 5) "  <- UNDER-FILLED (the failure the ladder closes)" else ""))

      graft.plans.LshProbeRewrite.register(path, lsh, dim, guaranteeK = true)
      require(filteredTopk(filter).queryExecution.optimizedPlan.toString
        .contains("gk_level"))
      timeIt("rule ladder (warmup)")(filteredTopk(filter).collect())
      val lRows = timeIt("rule ladder (warm)")(ruleServe()(filteredTopk(filter)))
      println(s"GKPROBE   ladder returned ${lRows.length}/5 rows at level " +
        lRows.headOption.map(_._2).getOrElse("-"))

      val store = graft.index.LshIndexStore(lsh, dim)
      def lib() = store.searchFilteredAdaptive(base, "embedding", "vec_id",
          filter, q, 5)
        .select(col("vec_id"), round(col("score"), 4).as("score"), col("index_used"))
      timeIt("library ladder (warmup)")(lib().collect())
      val libRows = timeIt("library ladder (warm)")(
        lib().collect().map(r => (r.getLong(0), r.getString(2))).toSeq)
      require(lRows == libRows,
        s"rule ladder diverged from library ladder: $lRows vs $libRows")
    }
    println("GKPROBE rule-served == library ladder on every case")
    spark.stop()
  }
}
