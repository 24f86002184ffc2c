package graft

import graft.index.{BruteForceKnn, Hnsw, HnswIndexStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HnswSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)
  private def q = Queries.queryVec(spark, sfDir)

  test("levelOf: deterministic base-4 trailing zeros, node 0 at the top") {
    assert(Hnsw.levelOf(0) == Hnsw.MaxLevel)
    assert(Hnsw.levelOf(1) == 0 && Hnsw.levelOf(3) == 0)
    assert(Hnsw.levelOf(4) == 1 && Hnsw.levelOf(16) == 2 && Hnsw.levelOf(64) == 3)
    assert(Hnsw.levelOf(256) == 4 && Hnsw.levelOf(1024) == 4) // capped
  }

  test("hierarchical search: member query returns itself first, recall@10 vs brute") {
    val hits = Hnsw.search(emb, "vec_id", "embedding", q, 10)
      .select("vec_id", "score").as[(Long, Double)].collect()
    assert(hits.head._1 == 0L && math.abs(hits.head._2 - 1.0) < 1e-9)
    val brute = BruteForceKnn.search(emb, col("embedding"), col("vec_id"), q, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = hits.map(_._1).count(brute.contains) / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall") // sharded beams over random vectors
    // scores are exact where ids overlap
    val bruteScores = BruteForceKnn.scored(emb, col("embedding"), q)
      .select("vec_id", "score").as[(Long, Double)].collect().toMap
    hits.foreach { case (id, s) => assert(math.abs(bruteScores(id) - s) < 1e-12) }
  }

  test("search is deterministic across runs") {
    val a = Hnsw.search(emb, "vec_id", "embedding", q, 10).collect().toSeq
    val b = Hnsw.search(emb, "vec_id", "embedding", q, 10).collect().toSeq
    assert(a == b)
  }

  test("persisted graph store: build once, serve repeatedly, same answers as transient") {
    val path = "target/test-index/hnsw-store"
    TestSpark.rmTree(new java.io.File(path))
    val store = HnswIndexStore()
    store.write(emb, "vec_id", "embedding", path, numShards = 4)

    val served = store.search(spark, path, q, 10)
      .select("id", "score").as[(Long, Double)].collect()
    assert(served.head._1 == 0L && math.abs(served.head._2 - 1.0) < 1e-9)
    // stored-graph serving is deterministic and stable across reads
    val again = store.search(spark, path, q, 10)
      .select("id", "score").as[(Long, Double)].collect()
    assert(served.toSeq == again.toSeq)
    // graph rows persisted with jagged per-level adjacency
    val stored = spark.read.parquet(path)
    assert(stored.count() == emb.count())
    assert(stored.columns.contains("neighbors"))
    // the hierarchy is real: an upper layer (level 2 — shards of ~125
    // nodes have several level>=2 nodes) carries edges
    val upperLevelNodes = stored
      .where(size(element_at(col("neighbors"), 3)) > 0).count()
    assert(upperLevelNodes >= 2, s"level-2 edges on $upperLevelNodes nodes")
  }

  test("segment append: delta searchable without touching existing shards") {
    val path = "target/test-index/hnsw-append"
    TestSpark.rmTree(new java.io.File(path))
    val store = HnswIndexStore()
    // base store WITHOUT vec 0 — the delta will add the exact query vector
    store.write(emb.where(col("vec_id") =!= 0), "vec_id", "embedding", path, numShards = 4)
    val before = store.search(spark, path, q, 1)
      .select("id", "score").as[(Long, Double)].head()
    assert(before._1 != 0L)
    def shardFiles(s: Int) =
      new java.io.File(s"$path/shard=$s").listFiles().map(_.getName).toSet
    val baseFiles = (0 until 4).map(shardFiles)
    val delta = Seq((0L, q)).toDF("vec_id", "embedding")
    val stats = store.append(delta, "vec_id", "embedding", path)
    // new vector served immediately, via a NEW segment past the old max
    val after = store.search(spark, path, q, 1)
      .select("id", "score").as[(Long, Double)].head()
    assert(after._1 == 0L && math.abs(after._2 - 1.0) < 1e-9)
    assert((0 until 4).map(shardFiles) == baseFiles) // existing segments untouched
    val shards = spark.read.parquet(path).select("shard").distinct().as[Int].collect().sorted
    assert(shards.length == 5 && shards.last == 4)
    // the compaction advice rides the append (r16, the IVF AppendStats
    // precedent): QUIET at 5 segments under any sane threshold...
    assert(stats.segments == 5)
    assert(!stats.compactionAdvised(), "5 segments must not advise compaction")
    // ...LOUD once the accumulated count passes the threshold (the
    // probe's knee is the executor-slot count; a tiny threshold forces
    // the loud side without building 32+ real segments)
    assert(stats.compactionAdvised(maxSegments = 4))
    val stats2 = store.append(Seq((1000L, q)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path)
    assert(stats2.segments == 6 && stats2.compactionAdvised(maxSegments = 5))
    // and the RESPONSE — compact() rebuilds the store's own contents
    // into a FRESH generation (in-place refused: live readers hold the
    // old listing, and Spark refuses overwriting a path being read)
    intercept[IllegalArgumentException](store.compact(spark, path, path, 2))
    val path2 = s"$path-gen2"
    TestSpark.rmTree(new java.io.File(path2))
    val rowsBefore = spark.read.parquet(path).count()
    assert(store.compact(spark, path, path2, numShards = 2) == 2)
    assert(store.segmentCount(spark, path2) == 2,
      "compact must rebuild to exactly numShards segments")
    assert(spark.read.parquet(path2).count() == rowsBefore,
      "compaction must preserve every node row")
    val recompacted = store.search(spark, path2, q, 1)
      .select("id", "score").as[(Long, Double)].head()
    assert(recompacted._1 == 0L, "compaction lost the appended vector")
    // the swap's final step: the old generation retires through the
    // reader-drain catalog (no leases here -> deleted now)
    graft.index.IndexGenerations.clear()
    assert(graft.index.IndexGenerations.retire(path))
    assert(!new java.io.File(path).exists())
  }

  test("streaming segment ingest: micro-batches become searchable segments") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = "target/test-index/hnsw-stream"
    TestSpark.rmTree(new java.io.File(path))
    val store = HnswIndexStore()
    store.write(emb.where(col("vec_id") =!= 0), "vec_id", "embedding", path, numShards = 4)
    val src = MemoryStream[(Long, Array[Float])](spark)
    // the compaction advice rides every micro-batch (IVF onBatch
    // parity): capture what the ingest job would alarm on
    val batchStats = new java.util.concurrent.CopyOnWriteArrayList[
      graft.index.HnswIndexStore.HnswAppendStats]()
    val query = store.appendStream(src.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, onBatch = s => { batchStats.add(s): Unit })
    try {
      src.addData((0L, q))
      query.processAllAvailable()
    } finally query.stop()
    val top = store.search(spark, path, q, 1)
      .select("id", "score").as[(Long, Double)].head()
    assert(top._1 == 0L, s"streamed vector not served: $top")
    assert(batchStats.size() == 1, s"expected one batch's stats, got $batchStats")
    assert(batchStats.get(0).segments == 5) // 4 base shards + 1 streamed segment
    assert(!batchStats.get(0).compactionAdvised())
    assert(batchStats.get(0).compactionAdvised(maxSegments = 4))
  }

  test("batched multi-query serving: one scan answers every query, matching per-query search") {
    val path = "target/test-index/hnsw-store" // built by the previous test
    val store = HnswIndexStore()
    val emb2 = emb
    val queries = emb2.where(col("vec_id").isin(0L, 100L, 200L, 300L, 400L))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val many = store.searchMany(spark, path, queries, k = 5)
      .select("qid", "id", "score").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    queries.foreach { case (qid, qv) =>
      // every member query finds itself first at score 1
      val mine = many(qid).sortBy(t => (-t._3, t._2))
      assert(mine.head._2 == qid && math.abs(mine.head._3 - 1.0) < 1e-9)
      // and the batched answer equals the single-query path
      val single = store.search(spark, path, qv, 5)
        .select("id", "score").as[(Long, Double)].collect().toSeq
      assert(mine.map(t => (t._2, t._3)).toSeq == single)
    }
  }
}
