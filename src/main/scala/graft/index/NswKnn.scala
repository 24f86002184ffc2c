package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-sharded NSW (navigable-small-world) graph ANN — the
  * graph-index family (HNSW's single-layer core), Spark-shaped:
  *
  * Each partition builds an in-memory NSW graph over ITS vectors
  * (greedy insertion: beam-search the graph-so-far for each new node,
  * connect to the M best, prune neighbor lists to M) and answers the
  * query with a beam search — `mapPartitions`, zero shuffle. The global
  * answer is the rerank of the per-partition candidates (each true
  * top-k member lives in some partition and is found by that
  * partition's beam), i.e. FAISS-style sharded serving. Graph quality
  * controls per-shard recall; shard fan-out is the scale axis.
  *
  * Deterministic: insertion order is partition row order, ties break by
  * node index. Exact cosine is used for all edges and scores, so
  * returned scores are exact (approximation only affects WHICH
  * candidates surface).
  */
object NswKnn {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Beam search over the graph restricted to nodes < bound. Returns up
    * to `ef` (nodeIdx, score) pairs, best first.
    */
  private def beamSearch(vecs: Array[Array[Float]], adj: Array[scala.collection.mutable.ArrayBuffer[Int]],
                         bound: Int, query: Array[Float], ef: Int): Array[(Int, Double)] = {
    if (bound <= 0) return Array.empty
    val visited = new java.util.BitSet(bound)
    // candidates: max-heap by score; results: bounded min-heap
    val candOrd = Ordering.by[(Int, Double), (Double, Int)](t => (t._2, -t._1))
    val cands = scala.collection.mutable.PriorityQueue.empty[(Int, Double)](candOrd)
    val results = scala.collection.mutable.PriorityQueue.empty[(Int, Double)](candOrd.reverse)
    val entry = 0
    val es = cos(vecs(entry), query)
    visited.set(entry)
    cands.enqueue((entry, es))
    results.enqueue((entry, es))
    while (cands.nonEmpty) {
      val (c, cs) = cands.dequeue()
      val worst = if (results.size >= ef) results.head._2 else Double.NegativeInfinity
      if (cs < worst && results.size >= ef) { cands.clear() }
      else {
        adj(c).foreach { nb =>
          if (nb < bound && !visited.get(nb)) {
            visited.set(nb)
            val s = cos(vecs(nb), query)
            val w = if (results.size >= ef) results.head._2 else Double.NegativeInfinity
            if (s > w || results.size < ef) {
              cands.enqueue((nb, s))
              results.enqueue((nb, s))
              if (results.size > ef) results.dequeue()
            }
          }
        }
      }
    }
    results.dequeueAll.toArray.sortBy(t => (-t._2, t._1))
  }

  /** Build the partition graph and search it for one query. */
  private def searchPartition(nodes: Array[(Long, Array[Float])], query: Array[Float],
                              m: Int, efConstruction: Int, ef: Int): Iterator[(Long, Double)] = {
    if (nodes.isEmpty) return Iterator.empty
    val vecs = nodes.map(_._2)
    val adj = Array.fill(vecs.length)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var i = 1
    while (i < vecs.length) {
      val near = beamSearch(vecs, adj, i, vecs(i), efConstruction).take(m)
      near.foreach { case (j, s) =>
        adj(i) += j
        adj(j) += i
        if (adj(j).length > 2 * m) {
          // prune j's list back to its 2M best by similarity (keeps the
          // graph navigable without unbounded degree)
          val pruned = adj(j).map(x => (x, cos(vecs(j), vecs(x))))
            .sortBy(t => (-t._2, t._1)).take(2 * m).map(_._1)
          adj(j).clear(); adj(j) ++= pruned
        }
        ()
      }
      i += 1
    }
    beamSearch(vecs, adj, vecs.length, query, ef)
      .iterator.map { case (idx, s) => (nodes(idx)._1, s) }
  }

  /** ANN top-k: per-partition NSW beam search, global exact rerank. */
  def search(emb: DataFrame, idCol: String, embCol: String, query: Array[Float], k: Int,
             m: Int = 8, efConstruction: Int = 32, ef: Int = 48): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.where(col(embCol).isNotNull)
      .select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        searchPartition(it.toArray, query, m, efConstruction, ef)
      }
      .toDF(idCol, "score")
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
