package graft.search

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 full-text ranking over the documents corpus — the
  * lexical half of a retrieval engine next to the vector half
  * (brute/LSH/IVF/NSW). The reference has no text search at all
  * (queries are embedded and cosine-ranked, app/services/
  * search_service.py:110-116); BM25 is the standard thing a user
  * switching from it would ask for first.
  *
  * Shape (all relational, oracle-checkable in plain SQL):
  *  - postings are FILTERED TO THE QUERY TERMS before the tf
  *    aggregation — the per-query work scales with matching postings,
  *    not corpus size;
  *  - document lengths and corpus stats (N, avgdl) are query-independent
  *    (at rest they'd be a precomputed table, like the doc-length norms
  *    in any Lucene segment);
  *  - df/idf come from the filtered tf table (count of docs per query
  *    term), broadcast back — a query has a handful of terms;
  *  - final score = one groupBy(doc) sum + TakeOrderedAndProject.
  *
  * idf uses the BM25+-style `ln(1 + (N - df + .5)/(df + .5))` form
  * (always positive, Lucene's default since 6.0).
  */
object Bm25 {

  /** `rankRounded = Some(d)` orders by the score rounded to d decimals
    * (id tie-break) instead of the raw double — cross-engine float
    * summation-order jitter (~1 ulp) then cannot reorder oracle-checked
    * output. */
  def search(docs: DataFrame, idCol: String, textCol: String, query: Seq[String],
             k: Int, k1: Double = 1.2, b: Double = 0.75,
             rankRounded: Option[Int] = None): DataFrame = {
    val qterms = query.distinct
    val base = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
    val dl = base.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .where(col("term").isInCollection(qterms))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s", idf * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .orderBy(rankRounded.fold(col("score"))(d => round(col("score"), d)).desc,
        col("doc_id").asc)
      .limit(k)
  }
}
