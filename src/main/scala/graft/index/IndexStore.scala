package graft.index

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest index layout: the 100 TB serving path.
  *
  * The reference rebuilds its index in-process on every query
  * (search_service.py:122,125) and tracks staleness with
  * `library.version`. On Spark the index IS a table layout: write the
  * corpus once with its table-0 LSH bucket as a partition column
  * (`.../bucket=NNN/part-*.parquet`), then a probe for a query vector
  * is a scan whose `bucket = h(q)` predicate prunes to one directory —
  * Catalyst partition pruning does the candidate lookup, no driver-side
  * bucket map, no shuffle. Versioned paths (`.../v=<library.version>/`)
  * give the reference's staleness semantics: a mutation writes a new
  * version directory and readers pin the version they started with.
  *
  * Only table 0 can be the physical partition key; the other T-1 tables
  * ride along as an array column and are probed with the same OR filter
  * (they prune row groups via min/max stats rather than directories).
  */
final case class LshIndexStore(lsh: RandomHyperplaneLsh, dim: Int) {

  /** Write the corpus partitioned by the table-0 bucket. */
  def write(corpus: DataFrame, embCol: String, path: String): Unit =
    lsh.withBuckets(corpus.where(col(embCol).isNotNull),
        VectorFunctions.l2Normalize(col(embCol)), dim)
      .withColumn("bucket", col("buckets").getItem(0))
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(path)

  /** Probe: partition-pruned scan of the query's buckets, exact rerank. */
  def search(spark: SparkSession, path: String, embCol: String, idCol: String,
             query: Array[Float], k: Int): DataFrame = {
    val qNorm = {
      val n = math.sqrt(query.map(x => x.toDouble * x.toDouble).sum)
      if (n == 0.0) query else query.map(x => (x / n).toFloat)
    }
    val ps = lsh.planes(dim)
    val qBuckets = ps.map(tp => lsh.hash(qNorm.toSeq, tp))
    val probe = spark.read.parquet(path)
      .where(col("bucket") === qBuckets(0) ||
        qBuckets.zipWithIndex.drop(1)
          .map { case (qb, t) => col("buckets").getItem(t) === lit(qb) }
          .foldLeft(lit(false))(_ || _))
    BruteForceKnn.search(probe, col(embCol), col(idCol), query, k)
  }
}
