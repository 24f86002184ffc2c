package graft.search

import graft.index.BruteForceKnn
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
  * of a lexical ranking ([[Bm25]]) and a vector ranking
  * ([[graft.index.BruteForceKnn]] cosine — swap in any ANN backend at
  * scale). RRF needs only the two rank lists, never comparable scores,
  * which is why it is the default fusion in production hybrid search:
  * `rrf(d) = Σ_lists 1 / (c + rank_list(d))`, missing ⇒ 0.
  *
  * Both candidate lists rank on the ROUNDED score with an id
  * tie-break, so float summation-order jitter cannot reorder them —
  * the fused score is then an exact function of integer ranks and the
  * whole operator is oracle-checkable in plain SQL.
  *
  * Scale shape: each list is its backend's top-n (both end in
  * TakeOrderedAndProject), the fusion is a full-outer join of two
  * ≤n-row lists — driver-trivial, executor-free of the corpus.
  */
object HybridSearch {

  def rrf(docs: DataFrame, emb: DataFrame,
          docIdCol: String, textCol: String, embIdCol: String, embCol: Column,
          queryTerms: Seq[String], queryVec: Array[Float],
          n: Int = 50, k: Int = 10, c: Int = 60): DataFrame = {
    val textRank = Window.orderBy(round(col("score"), 6).desc, col("doc_id").asc)
    val text = Bm25.search(docs, docIdCol, textCol, queryTerms, n, rankRounded = Some(6))
      .withColumn("text_rank", row_number().over(textRank).cast("long"))
      .select(col("doc_id"), col("text_rank"))
    // rank + cutoff BOTH on the rounded score (scored(), not search(),
    // whose top-k cuts on the raw double). The cutoff is
    // orderBy+limit — TakeOrderedAndProject over the corpus — and only
    // the surviving ≤n rows see the (single-partition) ranking window.
    val vecRank = Window.orderBy(round(col("score"), 6).desc, col(embIdCol).asc)
    val vec = BruteForceKnn.scored(emb, embCol, queryVec)
      .orderBy(round(col("score"), 6).desc, col(embIdCol).asc)
      .limit(n)
      .withColumn("vec_rank", row_number().over(vecRank).cast("long"))
      .select(col(embIdCol).cast("long").as("doc_id"), col("vec_rank"))
    text.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("text_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("vec_rank")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), round(col("rrf"), 6).as("rrf"),
        col("text_rank"), col("vec_rank"))
  }
}
