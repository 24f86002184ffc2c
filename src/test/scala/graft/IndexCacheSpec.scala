package graft

import graft.embed.HashingEmbedder
import graft.index.{IndexCache, RandomHyperplaneLsh}
import graft.state.Engine
import org.scalatest.funsuite.AnyFunSuite

class IndexCacheSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  private def seeded(): (Engine, String, String) = {
    val e = new Engine()
    val emb = HashingEmbedder(dim = 8)
    val lib = e.createLibrary("c").id
    val doc = e.addDocument(lib, "d").id
    Seq("a b", "c d").foreach(t => e.addChunk(lib, doc, t, Some(emb.embed(t))))
    (e, lib, doc)
  }

  test("same version hits the cache; mutation bumps version and misses") {
    val (e, lib, doc) = seeded()
    val cache = new IndexCache()
    val lsh = RandomHyperplaneLsh(2, 4, 42L)
    val df1 = cache.bucketed(e, spark, lib, lsh, 8)
    val df2 = cache.bucketed(e, spark, lib, lsh, 8)
    assert(df1 eq df2) // cache hit: same version, same params
    assert(cache.size == 1)
    e.addChunk(lib, doc, "e f", Some(HashingEmbedder(dim = 8).embed("e f")))
    val df3 = cache.bucketed(e, spark, lib, lsh, 8)
    assert(!(df3 eq df1)) // version bump -> rebuild
    assert(df3.count() == 3 && df1.count() == 2) // old snapshot stays consistent
  }

  test("maxEntries bounds the cache globally (LRU eviction across libraries)") {
    val e = new Engine()
    val emb = HashingEmbedder(dim = 8)
    val libs = (1 to 4).map { i =>
      val lib = e.createLibrary(s"lib$i").id
      val doc = e.addDocument(lib, "d").id
      e.addChunk(lib, doc, s"text $i", Some(emb.embed(s"text $i")))
      lib
    }
    val cache = new IndexCache(maxEntries = 2)
    val lsh = RandomHyperplaneLsh(2, 4, 42L)
    libs.foreach(lib => cache.bucketed(e, spark, lib, lsh, 8))
    assert(cache.size <= 2) // distinct libraries, no stale versions — still bounded
    // most-recently-used survives
    val last = cache.bucketed(e, spark, libs.last, lsh, 8)
    assert(last eq cache.bucketed(e, spark, libs.last, lsh, 8))
  }

  test("different LSH params are distinct entries; invalidate clears a library") {
    val (e, lib, _) = seeded()
    val cache = new IndexCache()
    cache.bucketed(e, spark, lib, RandomHyperplaneLsh(2, 4, 42L), 8)
    cache.bucketed(e, spark, lib, RandomHyperplaneLsh(4, 4, 42L), 8)
    assert(cache.size == 2)
    cache.invalidate(lib)
    assert(cache.size == 0)
  }
}
