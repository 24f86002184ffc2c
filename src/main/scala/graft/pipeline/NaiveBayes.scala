package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multinomial Naive Bayes text classifier, trained IN-ENGINE — the
  * quality/language filtering stage of a crawl-curation pipeline (the
  * fasttext-classifier slot in pipelines like CCNet / RefinedWeb),
  * expressed so both phases are Spark-shaped:
  *
  *  - TRAIN is three aggregations (class priors, the top-`vocabCap`
  *    vocabulary, token-class counts); the per-class totals are the
  *    driver-side marginal of the collected token-class counts, not a
  *    fourth corpus scan. The fitted model is ≤ `vocabCap × classes`
  *    rows — a driver-side build artifact like the PQ codebook,
  *    broadcast back for scoring. At 100 TB the aggregations are the
  *    corpus pass; the model stays KBs.
  *  - SCORE is a per-(doc, token) count aggregate, one broadcast join
  *    against the model, a keyed sum, and a per-doc argmax window —
  *    no driver loop, no UDF in the hot path.
  *
  * EXACT REPLAY: log-likelihoods are frozen at fit time as
  * integer-scaled longs (`round(ln(θ)·1e6)`), so scoring is pure
  * integer arithmetic — `Σ count·ilp + iprior` — and a DuckDB oracle
  * replaying the same inlined constants reproduces every score (and
  * hence every argmax) bit-exactly, with no float-summation-order
  * hazard. Laplace (+1) smoothing; out-of-vocabulary tokens are
  * skipped (the top-K vocabulary IS the feature set); a vocab token
  * unseen in a class contributes the smoothed `ln(1/(total_c + V))`.
  * Ties in the argmax break toward the lexicographically smallest
  * label in both engines.
  */
object NaiveBayes {

  /** Integer scale for frozen log-likelihoods: 1e6 keeps six decimal
    * digits of ln(θ) — far finer than any decision boundary the
    * smoothed counts can produce — while the largest possible score
    * magnitude (|ilp| ≤ ~25e6 × token count) stays far inside Long.
    */
  private val Scale = 1e6

  /** One (token, label) likelihood row; dense over vocab × labels so
    * scoring never needs a separate per-class default lookup. */
  final case class TokenWeight(tok: String, label: String, ilp: Long)

  /** Per-class log-prior, integer-scaled. */
  final case class ClassWeight(label: String, iprior: Long)

  final case class Model(classes: Seq[ClassWeight], weights: Seq[TokenWeight]) {
    require(classes.nonEmpty, "NaiveBayes model with no classes")
  }

  /** Whitespace tokens, empty-string guarded (`"".split` yields one
    * empty token) — the same trim/`' +'` split contract every text
    * gate and its DuckDB oracle share. */
  private def toks(text: org.apache.spark.sql.Column) =
    filter(split(trim(text), " +"), t => t =!= "")

  /** Fit on `(textCol, labelCol)`; aggregation-only, deterministic.
    * `vocabCap` bounds the feature set (ties at the frequency cut
    * break toward the lexicographically smaller token, so the fitted
    * vocabulary is reproducible at any parallelism).
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            vocabCap: Int = 500): Model = {
    val t = docs.select(col(labelCol).as("label"),
      explode(toks(col(textCol))).as("tok"))
    val classDocs = docs.groupBy(col(labelCol).as("label")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocs = classDocs.values.sum
    val vocab = t.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok"))
      .limit(vocabCap)
      .select("tok").collect().map(_.getString(0)) // ≤ vocabCap rows
    val vocabSet = vocab.toSet
    val inVocab = t.where(col("tok").isInCollection(vocabSet))
    val tokLang = inVocab.groupBy("label", "tok").count()
      .collect() // ≤ vocabCap × classes rows — the build artifact
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // per-class in-vocab totals are the per-label marginal of the
    // already-collected counts — deriving them here spares a fourth
    // corpus scan (the r12 review catch: a whole extra tokenize pass
    // for numbers summable in driver memory)
    val totC = tokLang.toSeq.groupBy(_._1._1)
      .map { case (l, xs) => l -> xs.map(_._2).sum }
    val v = vocab.length
    val labels = classDocs.keys.toSeq.sorted
    val classes = labels.map { l =>
      ClassWeight(l, math.round(math.log(classDocs(l).toDouble / nDocs) * Scale))
    }
    val weights = for (l <- labels; tok <- vocab) yield {
      val cnt = tokLang.getOrElse((l, tok), 0L)
      val theta = (cnt + 1).toDouble / (totC.getOrElse(l, 0L) + v)
      TokenWeight(tok, l, math.round(math.log(theta) * Scale))
    }
    Model(classes, weights)
  }

  /** Score every document: `(idCol, pred_label, iscore)` where
    * `pred_label` is the argmax class (score desc, label asc) and
    * `iscore` its exact integer score. Documents whose tokens are all
    * out-of-vocabulary (or empty) fall back to the prior argmax via
    * the doc × classes spine.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val weightsDf = model.weights.toDF("tok", "label", "ilp")
    val classDf = model.classes.map(c => (c.label, c.iprior)).toDF("label", "iprior")
    // Per-OCCURRENCE join straight against the broadcast model, then
    // one partial-agg'd sum to (id, label): Σ over occurrences of ilp
    // equals Σ cnt·ilp over distinct (id, tok), so the pre-counting
    // (id, tok) aggregate the first formulation shuffled — ~distinct
    // tokens × docs rows, the dominant exchange at corpus scale — is
    // algebraically redundant. The join is row-local (broadcast hash),
    // and map-side combine collapses each partition's occurrences to
    // ≤ classes rows per doc before the only shuffle. Measured by
    // NbScaleProbe at 1M docs: the scoring exchange drops 1157 → 169
    // MB (6.8×) and wall time 44.7 → 15.5 s (2.9×) vs the pre-counted
    // formulation, predictions identical.
    val tokScores = docs
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
      .join(broadcast(weightsDf), "tok")
      .groupBy("id", "label").agg(sum(col("ilp")).as("ts"))
    val spine = docs.select(col(idCol).as("id")).crossJoin(broadcast(classDf))
    val scored = spine.join(tokScores, Seq("id", "label"), "left")
      .withColumn("iscore", coalesce(col("ts"), lit(0L)) + col("iprior"))
    val r = row_number().over(
      Window.partitionBy(col("id")).orderBy(col("iscore").desc, col("label")))
    scored.withColumn("r", r).where(col("r") === 1)
      .select(col("id").as(idCol), col("label").as("pred_label"), col("iscore"))
  }

  /** SQL-escaped `(tok, label, ilp)` / `(label, iprior)` VALUES lists
    * for the DuckDB oracle ([[graft.Queries.oracleSubstitutions]]'s
    * PQ-codebook pattern — the oracle replays the TRAINED constants,
    * it does not re-fit). */
  def modelValuesSql(model: Model): String =
    model.weights.map(w =>
      s"('${esc(w.tok)}', '${esc(w.label)}', ${w.ilp})").mkString(", ")

  def classValuesSql(model: Model): String =
    model.classes.map(c => s"('${esc(c.label)}', ${c.iprior})").mkString(", ")

  private def esc(s: String): String = s.replace("'", "''")
}

