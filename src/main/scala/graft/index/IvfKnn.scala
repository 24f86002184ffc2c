package graft.index

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into `nlist` clusters, then probe only the `nprobe` clusters
  * whose centroids are closest to the query.
  *
  * This is the scale path beyond the reference's brute/LSH pair
  * (BASELINE.json north-star: "MLlib for batch indexing"): at 100 TB the
  * assignment is a one-time batch job (written out partitioned by
  * `cluster_id`, so a probe reads nprobe/nlist of the files), and the
  * per-query work is nprobe partition scans + TakeOrderedAndProject.
  *
  * Centroid selection here is deterministic sampling (every `stride`-th
  * vector, k-means|| is available via MLlib when recall matters more
  * than determinism). Assignment = argmax cosine against the broadcast
  * centroid array — a single UDF pass, no shuffle.
  */
object IvfKnn {

  /** Deterministic sampled centroids: vectors whose HASHED id falls in
    * the stride class (`xxhash64(id) % stride == 0` — a raw id modulo
    * admits id spacings that select the whole corpus), hard-capped at
    * `maxCentroids` via orderBy+limit (TakeOrdered — deterministic) so
    * the driver collect is bounded no matter the stride/corpus combo.
    */
  def centroids(emb: DataFrame, idCol: Column, embCol: Column, stride: Long,
                maxCentroids: Int = 4096): Array[(Long, Array[Float])] =
    emb.where(pmod(xxhash64(idCol), lit(stride)) === 0 && embCol.isNotNull)
      .select(idCol.cast("long").as("id"), embCol)
      .orderBy(col("id"))
      .limit(maxCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  private def cosineRaw(a0: collection.Seq[Float], b: Array[Float]): Double =
    cosineArr(graft.functions.VectorFunctions.toArr(a0), b)

  private def cosineArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Clusters ranked by cosine(query, centroid) desc, id tie-break —
    * the probe-list choice shared by IVF, IVF-PQ and the stores. */
  def rankClusters(query: Array[Float], cents: Array[(Long, Array[Float])]): Array[(Long, Double)] =
    cents.map { case (cid, v) => (cid, cosineArr(query, v)) }
      .sortBy { case (cid, s) => (-s, cid) }

  /** Assign each row to its nearest centroid (by cosine). An empty
    * centroid set assigns null (no candidates), never crashes. */
  def assign(emb: DataFrame, embCol: Column, cents: Array[(Long, Array[Float])]): DataFrame = {
    if (cents.isEmpty)
      return emb.withColumn("cluster_id", lit(null).cast("long"))
    val centVecs = cents.map(_._2)
    val centIds = cents.map(_._1)
    val assignUdf = udf { (v0: collection.Seq[Float]) =>
      if (v0 == null) null.asInstanceOf[java.lang.Long]
      else {
        // materialize the row vector ONCE — converting per centroid
        // iteration multiplies the scan cost by the centroid count
        val v = graft.functions.VectorFunctions.toArr(v0)
        var best = 0; var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < centVecs.length) {
          val s = cosineArr(v, centVecs(c))
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        java.lang.Long.valueOf(centIds(best))
      }
    }
    emb.withColumn("cluster_id", assignUdf(embCol))
  }

  /** [[assign]] plus the assignment SCORE (the argmax cosine value) —
    * same UDF pass, one extra double per row. The score is the FREE
    * online drift signal IvfDriftProbe measured: it is already
    * computed by the assignment loop, needs no ground truth, and a
    * batch's MEAN of it drops sharply exactly when arrivals drift away
    * from every trained centroid (0.66 in-distribution vs 0.28 fully
    * drifted at the probe's operating point). Rows: (input columns,
    * cluster_id LONG nullable, assign_cos DOUBLE nullable — null
    * embedding assigns null/null like [[assign]]). */
  def assignScored(emb: DataFrame, embCol: Column,
                   cents: Array[(Long, Array[Float])]): DataFrame = {
    if (cents.isEmpty)
      return emb.withColumn("cluster_id", lit(null).cast("long"))
        .withColumn("assign_cos", lit(null).cast("double"))
    val centVecs = cents.map(_._2)
    val centIds = cents.map(_._1)
    val scoredUdf = udf { (v0: collection.Seq[Float]) =>
      if (v0 == null) null
      else {
        val v = graft.functions.VectorFunctions.toArr(v0)
        var best = 0; var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < centVecs.length) {
          val s = cosineArr(v, centVecs(c))
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        (centIds(best), bestScore)
      }
    }
    emb.withColumn("_assign", scoredUdf(embCol))
      .withColumn("cluster_id", col("_assign._1"))
      .withColumn("assign_cos", col("_assign._2"))
      .drop("_assign")
  }

  /** Probe the `nprobe` closest clusters, exact-rerank inside them. */
  def search(spark: SparkSession, emb: DataFrame, embCol: Column, idCol: Column,
             query: Array[Float], k: Int, stride: Long = 53L, nprobe: Int = 2): DataFrame = {
    val cents = centroids(emb, idCol, embCol, stride)
    val probeIds = rankClusters(query, cents).take(nprobe).map(_._1)
    val assigned = assign(emb.where(embCol.isNotNull), embCol, cents)
    BruteForceKnn.search(
      assigned.where(col("cluster_id").isin(probeIds.map(Long.box): _*)),
      embCol, idCol, query, k)
  }
}
