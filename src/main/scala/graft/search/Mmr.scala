package graft.search

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions
import graft.index.BruteForceKnn

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * — the diversification pass a RAG serving layer runs between
  * retrieval and the prompt: from a relevance-ranked candidate pool,
  * greedily pick items maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`, so near-duplicate
  * hits (which a deduplicated index can still serve: same fact,
  * different document) don't crowd out coverage.
  *
  * Scale shape: the DISTRIBUTED part is the retrieval — cosine scoring
  * + TakeOrderedAndProject(poolSize) over the full corpus, and the
  * pairwise similarities among the pool (a poolSize² self-join of a
  * frame that small is one broadcast stage). The greedy selection is
  * inherently sequential in k and runs on the driver over the
  * COLLECTED pool — bounded at poolSize rows + poolSize²/2 pair rows
  * (20 + 190 at the gate's defaults), the same serving-side contract
  * as [[SearchService]]'s rerank hook. At 100 TB only the corpus scan
  * grows; the driver share is fixed by (k, poolSize).
  *
  * Determinism contract (shared with the DuckDB oracle): relevance and
  * pairwise similarities are rounded to 4 dp BEFORE the greedy loop,
  * so both engines compare identical doubles; the penalty weight is
  * computed as `1.0 - λ` (not a pre-simplified literal — `1.0 - 0.7`
  * and `0.3` are DIFFERENT doubles, and the oracle spells the same
  * subtraction); ties break on the smaller id.
  */
object Mmr {

  /** Greedy MMR selection state, exposed for the spec. */
  private[search] def select(rel: Seq[(Long, Double)], sim: Map[(Long, Long), Double],
                             k: Int, lambda: Double): Seq[(Long, Double, Double)] = {
    val penaltyW = 1.0 - lambda
    def simOf(a: Long, b: Long): Double =
      sim.getOrElse(if (a < b) (a, b) else (b, a), 0.0)
    val remaining = collection.mutable.LinkedHashMap(rel: _*)
    val out = collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val selected = collection.mutable.ArrayBuffer.empty[Long]
    var exhausted = false
    while (out.length < k && remaining.nonEmpty && !exhausted) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.foreach { case (id, r) =>
        val pen = if (selected.isEmpty) 0.0
          else selected.iterator.map(s => simOf(id, s)).max
        val score = lambda * r - penaltyW * pen
        // NaN score (a NaN float in an embedding row survives the cosine)
        // never wins the argmax: every comparison against NaN is false,
        // so without the explicit skip bestId could stay -1 and the
        // remaining(bestId) lookup would crash the whole query.
        if (!score.isNaN &&
            (score > bestScore || (score == bestScore && id < bestId))) {
          bestScore = score; bestId = id
        }
      }
      if (bestId == -1L) exhausted = true // all remaining scores NaN
      else {
        out += ((bestId, remaining(bestId), bestScore))
        selected += bestId
        remaining.remove(bestId)
      }
    }
    out.toSeq
  }

  /** Diversified top-k: retrieve a poolSize shortlist by cosine against
    * `query` (ties by id, 4-dp rounding), then MMR-select k of them.
    * Output: (rank, vec_id, relevance, mmr_score).
    */
  def diversify(emb: DataFrame, idCol: String, embCol: String, query: Array[Float],
                k: Int = 5, poolSize: Int = 20, lambda: Double = 0.7): DataFrame = {
    require(poolSize <= 10000,
      s"poolSize=$poolSize: the greedy stage collects the pool to the driver; " +
        "keep it shortlist-sized (the corpus-scale work is the retrieval)")
    val spark = emb.sparkSession
    val cand = BruteForceKnn.search(emb, col(embCol), col(idCol), query, poolSize)
      .select(col(idCol).cast("long").as("id"), col(embCol).as("e"),
        round(col("score"), 4).as("rel"))
      .cache()
    val (rel, sim) =
      try {
        val rel = cand.select(col("id"), col("rel"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val a = cand.select(col("id").as("ida"), col("e").as("ea"))
        val b = cand.select(col("id").as("idb"), col("e").as("eb"))
        val sim = a.join(b, col("ida") < col("idb"))
          .select(col("ida"), col("idb"),
            round(VectorFunctions.cosine(col("ea"), col("eb")), 4).as("s"))
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        (rel, sim)
      } finally cand.unpersist() // a throwing collect must not leak the cached pool
    val picked = select(rel, sim, k, lambda)
    val rows = picked.zipWithIndex.map { case ((id, r, m), i) =>
      Row((i + 1).toLong, id, r, m)
    }
    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("relevance", DoubleType, nullable = false),
      StructField("mmr_score", DoubleType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .withColumn("mmr_score", round(col("mmr_score"), 4))
  }
}
