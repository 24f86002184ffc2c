package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the trained-in-engine Naive Bayes classifier
  * ([[graft.pipeline.NaiveBayes]]): blows the sf0.1 documents corpus
  * up `copies`-fold (200 → 1M docs) and measures the two phases
  * separately —
  *
  *  - TRAIN: the three corpus aggregations (priors, top-K vocabulary,
  *    token-class counts). The claim under test is that fit cost is
  *    one corpus pass and the collected build artifact stays
  *    ≤ vocabCap × classes rows no matter the corpus size.
  *  - SCORE: per-occurrence broadcast-model join → partial-agg'd
  *    (doc, label) sums → per-doc argmax window. The claim under test
  *    is that the only exchange is ≤ classes rows per doc (the
  *    per-occurrence formulation — NaiveBayes.score's Scaladoc), not
  *    distinct-(doc, token) pairs.
  *
  * Shuffle bytes per phase come from the Spark listener, same as
  * Bench. Results recorded in README's scale section.
  *
  * Usage: runMain graft.NbScaleProbe [copies]
  */
object NbScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-nb-scale-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"), col("lang"))
    val docs = (0 until copies).map(c =>
        docs0.withColumn("doc_id", col("doc_id") + lit(c.toLong * 10000000L)))
      .reduce(_ unionByName _)
      .repartition(64) // a realistic many-split input, not 200 unions deep
      .persist()
    val n = docs.count()

    @volatile var shuffle = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffle += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })

    // the listener bus is async: drain it around each measured window
    // or the fit phase's tail stages get credited to the score phase
    // (Bench.drainBus does the same around every benched query)
    def drainBus(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        val m = bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount <= 1).get
        if (m.getParameterCount == 0) m.invoke(bus)
        else m.invoke(bus, java.lang.Long.valueOf(10000L))
      } catch { case _: Throwable => Thread.sleep(200) }

    def timed[A](f: => A): (A, Double, Double) = {
      drainBus()
      val s0 = shuffle; val t0 = System.nanoTime()
      val a = f
      drainBus()
      ((a, (System.nanoTime() - t0) / 1e9, (shuffle - s0) / 1e6))
    }

    val (model, fitSec, fitShuffleMb) =
      timed(graft.pipeline.NaiveBayes.train(docs, "text", "lang"))
    val ((preds, dist), scoreSec, scoreShuffleMb) = timed {
      val p = graft.pipeline.NaiveBayes.score(docs, "doc_id", "text", model)
      val d = p.groupBy("pred_label").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      (d.values.sum, d)
    }
    val distJson = dist.toSeq.sortBy(_._1)
      .map { case (l, c) => s""""$l":$c""" }.mkString("{", ",", "}")
    println(f"""{"probe":"nb_scale","docs":$n,"fit_sec":$fitSec%.1f,""" +
      f""""fit_shuffle_mb":$fitShuffleMb%.1f,""" +
      f""""model_rows":${model.weights.size},"classes":${model.classes.size},""" +
      f""""score_sec":$scoreSec%.1f,"score_shuffle_mb":$scoreShuffleMb%.1f,""" +
      f""""pred_rows":$preds,"pred_dist":$distJson}""")
    spark.stop()
  }
}
