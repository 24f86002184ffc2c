package graft.index

import java.util.concurrent.ConcurrentHashMap

import graft.functions.VectorFunctions
import graft.state.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Version-keyed LSH index cache — exploiting the staleness signal the
  * reference maintains but never uses: `library.version` is bumped on
  * every mutation (library_repo.py:74 etc.) yet the index is still
  * rebuilt from scratch on every query (search_service.py:122,125).
  *
  * Cache key = (libraryId, version, numTables, numPlanes, seed): a
  * mutation bumps the version, so stale entries simply stop being hit
  * and are evicted lazily. The cached value is the bucketed DataFrame,
  * Spark-cached so repeated probes at the same version skip both the
  * hash computation and the source scan. Identical semantics to
  * rebuild-per-query — the key IS the consistency proof.
  */
final class IndexCache(maxEntries: Int = 64) {

  final case class Key(libraryId: String, version: Int,
                       numTables: Int, numPlanes: Int, seed: Long)

  private val cache = new ConcurrentHashMap[Key, DataFrame]()

  def bucketed(engine: Engine, spark: org.apache.spark.sql.SparkSession,
               libraryId: String, lsh: RandomHyperplaneLsh, dim: Int): DataFrame = {
    val version = engine.getLibrary(libraryId).version
    val key = Key(libraryId, version, lsh.numTables, lsh.numPlanes, lsh.seed)
    cache.computeIfAbsent(key, { _ =>
      if (cache.size() >= maxEntries) evictStale(libraryId, version)
      val chunks = engine.chunksDF(spark)
        .where(col("library_id") === libraryId && col("embedding").isNotNull)
      lsh.withBuckets(chunks, VectorFunctions.l2Normalize(col("embedding")), dim).cache()
    })
  }

  /** Drop entries for this library at older versions (and unpersist). */
  private def evictStale(libraryId: String, currentVersion: Int): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.libraryId == libraryId && e.getKey.version < currentVersion) {
        e.getValue.unpersist(blocking = false)
        it.remove()
      }
    }
  }

  def size: Int = cache.size()

  def invalidate(libraryId: String): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.libraryId == libraryId) {
        e.getValue.unpersist(blocking = false)
        it.remove()
      }
    }
  }
}
