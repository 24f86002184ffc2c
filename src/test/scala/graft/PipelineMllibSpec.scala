package graft

import graft.embed.HashingEmbedder
import graft.functions.TextFunctions
import graft.index.MllibIndexes
import graft.search.QueryPipeline
import graft.state.Engine
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineMllibSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("pipeline: setup is idempotent and replaces missing library ids (query_workflow.py:122-131)") {
    val engine = new Engine()
    val p = new QueryPipeline(spark, engine, HashingEmbedder(dim = 16))
    val r1 = p.run("no-such-lib", queryText = Some("quick brown fox"))
    assert(r1.setup == "created" && r1.durableExecution && r1.embeddingGenerated)
    assert(r1.hits.nonEmpty && r1.validation == "passed")
    val lib = engine.listLibraries().head.id
    val r2 = p.run(lib, queryText = Some("lazy dog"))
    assert(r2.setup == "exists") // second run: no reseeding
    assert(engine.state.chunks.size == 2)
  }

  test("pipeline: validation rejections (O25)") {
    val p = new QueryPipeline(spark, new Engine(), HashingEmbedder(dim = 8))
    assert(p.validate(None, None, 5, "brute").isLeft)
    assert(p.validate(Some("x"), None, 0, "brute").isLeft)
    assert(p.validate(Some("x"), None, 5, "hnsw").isLeft)
    assert(p.validate(Some("x"), None, 5, "lsh").isRight)
    intercept[IllegalArgumentException](p.run("lib", None, None))
  }

  test("pipeline: embedding_generated false when embedding given") {
    val emb = HashingEmbedder(dim = 16)
    val p = new QueryPipeline(spark, new Engine(), emb)
    val r = p.run("x", queryEmbedding = Some(emb.embed("the quick brown fox")))
    assert(!r.embeddingGenerated)
  }

  test("kmeans IVF assigns every vector to one of k clusters") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val assigned = MllibIndexes.kmeansIvf(emb, "embedding", k = 4)
    assert(assigned.select(countDistinct(col("cluster_id"))).as[Long].head() <= 4)
    assert(assigned.count() == emb.count())
    assert(assigned.where(col("cluster_id").isNull).count() == 0)
  }

  test("BRP-LSH model buckets the corpus and answers neighbor queries") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (bucketed, model) = MllibIndexes.brpLsh(emb, "embedding", numTables = 4)
    assert(bucketed.columns.contains("hashes"))
    val q = Queries.queryVec(spark, "/root/testdata/sf0.001")
    val key = org.apache.spark.ml.linalg.Vectors.dense(q.map(_.toDouble))
    val nn = model.approxNearestNeighbors(bucketed, key, 3)
    assert(nn.count() == 3)
    // exact self-match comes back first at distance 0
    assert(nn.orderBy(col("distCol")).select("vec_id").as[Long].head() == 0L)
  }

  test("MLlib MinHash similarity join finds the planted near-dups") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different text with nothing shared here at all okay"))
      .toDF("doc_id", "text")
    val pairs = MllibIndexes.minhashJaccardJoin(docs, "doc_id", "text", maxJaccardDistance = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("bpe token count: punctuation and digit runs count separately") {
    val n = Seq("hello, world! x2 3.14")
      .toDF("text").select(TextFunctions.bpeTokenCount(col("text"))).as[Int].head()
    // hello , world ! x 2 3 . 14  -> 9
    assert(n == 9)
  }

  test("winnowing: shared substrings yield shared fingerprints, disjoint texts don't") {
    val fp = TextFunctions.winnowingFingerprints(5, 4)
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a different prefix but the quick brown fox jumps appears here"),
      (2L, "zzz yyy xxx www vvv uuu"))
      .toDF("id", "text").select(col("id"), fp(col("text")).as("fps"))
    val m = df.as[(Long, Array[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
    assert(m(0L).intersect(m(1L)).nonEmpty)  // share "the quick brown fox jumps"
    assert(m(0L).intersect(m(2L)).isEmpty)
    // deterministic
    val again = df.as[(Long, Array[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
    assert(again == m)
  }
}
