package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.index.RandomHyperplaneLsh

/** Incremental LSH maintenance invariant: bucketing an append-only
  * delta with the stored planes and unioning is bit-identical to
  * re-bucketing the full corpus — the property that makes
  * Queries.knnLshAppend answer knn_lsh's full-corpus oracle, and the
  * property a real ingest pipeline relies on to avoid O(corpus)
  * rebuilds per append.
  */
class IndexAppendSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val lsh = RandomHyperplaneLsh(8, 12, 42L)

  private def bucketed(df: org.apache.spark.sql.DataFrame) =
    lsh.withBuckets(df, VectorFunctions.l2Normalize(col("embedding")), 64)

  test("base ∪ delta bucketing equals one-pass full bucketing") {
    val emb = Tables.embeddings(spark, sfDir).where(col("embedding").isNotNull)
    val full = bucketed(emb)
      .select(col("vec_id"), col("buckets")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val incremental = bucketed(emb.where(col("vec_id") % 5 =!= 0))
      .unionByName(bucketed(emb.where(col("vec_id") % 5 === 0)))
      .select(col("vec_id"), col("buckets")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(incremental.size === full.size)
    assert(incremental === full)
  }

  test("query over the appended index equals the cached full index") {
    val appended = Queries.knnLshAppend(spark, sfDir).collect().toSeq
    val cached = Queries.knnLshCached(spark, sfDir).collect().toSeq
    assert(appended.nonEmpty)
    assert(appended === cached)
  }

  /** IVF's append analog: the codebook is FROZEN at build time and a
    * delta is assigned to the existing inverted lists — assignment is a
    * pure per-row argmax against the broadcast centroids, so
    * incremental assignment is bit-identical to a one-pass assignment
    * with the same codebook. (Unlike LSH, appending does NOT equal a
    * full rebuild: a rebuild would re-sample centroids from the grown
    * corpus. Codebook refresh is a periodic rebuild decision — the
    * classic IVF staleness trade — which is why the ingest path
    * freezes it.)
    */
  test("IVF delta assignment to a frozen codebook equals one-pass assignment") {
    import graft.index.IvfKnn
    val emb = Tables.embeddings(spark, sfDir).where(col("embedding").isNotNull)
    val base = emb.where(col("vec_id") % 5 =!= 0)
    val delta = emb.where(col("vec_id") % 5 === 0)
    val cents = IvfKnn.centroids(base, col("vec_id"), col("embedding"), 53L)
    assert(cents.nonEmpty)
    def asgn(df: org.apache.spark.sql.DataFrame) =
      IvfKnn.assign(df, col("embedding"), cents)
        .select(col("vec_id"), col("cluster_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val onePass = asgn(emb)
    val incremental = asgn(base) ++ asgn(delta)
    assert(incremental === onePass)
  }
}
