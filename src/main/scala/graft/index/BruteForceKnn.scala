package graft.index

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact cosine top-k (reference `BruteForceIndex`,
  * app/indexing/brute_force.py:19-47).
  *
  * Spark-first shape: score column + `ORDER BY score DESC LIMIT k`,
  * which Catalyst plans as `TakeOrderedAndProject` — per-partition
  * top-k heaps merged on the driver, NO full sort and NO shuffle of
  * anything but k rows per partition. That is the plan that survives a
  * 100 TB corpus: each executor scans its parquet split, scores, keeps
  * k, ships k.
  *
  * Semantics preserved from the reference:
  *  - rows with NULL embedding are skipped (search_service.py:43-46);
  *  - `k <= 0` → empty result (search_service.py:95-96);
  *  - dim-mismatch raises (brute_force.py:36-37) — checked on the
  *    driver against the first row's dim;
  *  - ties broken deterministically by the id column (the reference
  *    relies on Python sort stability; we pin with a secondary key).
  */
object BruteForceKnn {

  /** Add a cosine score column against a constant query vector. */
  def scored(chunks: DataFrame, embCol: Column, query: Array[Float]): DataFrame =
    chunks
      .where(embCol.isNotNull)
      .withColumn("score", VectorFunctions.cosine(embCol, typedlit(query.toSeq)))

  /** Exact top-k by cosine; deterministic tie-break on `idCol`. */
  def search(chunks: DataFrame, embCol: Column, idCol: Column,
             query: Array[Float], k: Int): DataFrame = {
    if (k <= 0) return scored(chunks, embCol, query).limit(0)
    scored(chunks, embCol, query)
      .orderBy(col("score").desc, idCol.asc)
      .limit(k)
  }

  /** Driver-side dim guard mirroring brute_force.py:36-37. */
  def requireDim(query: Array[Float], dim: Int): Unit =
    require(query.length == dim,
      s"Query dim ${query.length} != index dim $dim")
}
