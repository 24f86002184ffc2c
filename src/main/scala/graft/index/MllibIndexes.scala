package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MLlib-powered batch index building — the "Spark could implement
  * batch embedding generation and index building" north star
  * (BASELINE.json). These are ALTERNATIVE backends, not the parity
  * implementations: MLlib's BRP-LSH hashes with floor(dot/bucketLength)
  * (Euclidean buckets), not the reference's sign-bit cosine buckets
  * (lsh.py:58-64), so [[RandomHyperplaneLsh]] remains the
  * semantics-faithful index and these serve recall/scale experiments.
  *
  * All three are batch jobs: fit once over the corpus, write the
  * transformed/bucketed table partitioned by bucket/cluster, serve
  * queries as pruned scans — the index build IS a Spark job, which is
  * exactly what survives 100 TB (the reference rebuilds its index
  * in-process per query, search_service.py:122).
  */
object MllibIndexes {

  /** K-means IVF: fit cluster centers, attach `cluster_id`. Output is
    * writable partitioned by cluster_id for probe-pruned ANN serving.
    */
  def kmeansIvf(emb: DataFrame, embCol: String, k: Int = 16, seed: Long = 42L,
                maxIter: Int = 5): DataFrame =
    kmeansIvfWithCenters(emb, embCol, k, seed, maxIter)._1

  /** [[kmeansIvf]] plus the fitted centroids — the probe-list choice
    * (which clusters a query visits) needs only these k driver-side
    * vectors, never a pass over the assigned corpus.
    */
  def kmeansIvfWithCenters(emb: DataFrame, embCol: String, k: Int = 16, seed: Long = 42L,
                           maxIter: Int = 5): (DataFrame, Array[Array[Double]]) = {
    val withVec = emb.where(col(embCol).isNotNull)
      .withColumn("features", array_to_vector(col(embCol)))
    // Seeded random init instead of k-means|| — the parallel init's extra
    // passes over the corpus buy little for an ANN coarse quantizer, and
    // at 100 TB each pass is a full scan.
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(withVec)
    (model.transform(withVec).drop("features"), model.clusterCenters.map(_.toArray))
  }

  /** MLlib BRP-LSH: Euclidean-distance bucketing over embeddings.
    * Returns the transformed DataFrame with `hashes` plus the fitted
    * model for approxNearestNeighbors / approxSimilarityJoin use.
    */
  def brpLsh(emb: DataFrame, embCol: String, numTables: Int = 8,
             bucketLength: Double = 1.0, seed: Long = 42L)
  : (DataFrame, org.apache.spark.ml.feature.BucketedRandomProjectionLSHModel) = {
    val withVec = emb.where(col(embCol).isNotNull)
      .withColumn("features", array_to_vector(col(embCol)))
    val model = new BucketedRandomProjectionLSH()
      .setNumHashTables(numTables).setBucketLength(bucketLength).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
      .fit(withVec)
    (model.transform(withVec), model)
  }

  /** MLlib MinHash-LSH over binary token-presence vectors — the
    * stock-Spark route to Jaccard similarity joins (alternative to the
    * hand-rolled [[graft.dedup.Dedup.minhashNearDups]]).
    * `vocabSize` is the hashing-trick dimensionality.
    */
  def minhashJaccardJoin(docs: DataFrame, idCol: String, textCol: String,
                         maxJaccardDistance: Double, vocabSize: Int = 1 << 18,
                         numTables: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toVec = udf { (text: String) =>
      val idx = text.trim.split(" +").filter(_.nonEmpty)
        .map(t => math.floorMod(t.hashCode, vocabSize)).distinct.sorted
      Vectors.sparse(vocabSize, idx, Array.fill(idx.length)(1.0))
    }
    // MinHashLSH requires at least one non-zero entry per vector; empty
    // documents are dropped before fitting.
    val nonEmpty = docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), toVec(col(textCol)).as("features"))
    val model = new MinHashLSH().setNumHashTables(numTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes").fit(nonEmpty)
    model.approxSimilarityJoin(nonEmpty, nonEmpty, maxJaccardDistance, "jaccard_dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        col("jaccard_dist"))
      .where(col("id_a") < col("id_b"))
  }
}
