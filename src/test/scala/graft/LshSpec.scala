package graft

import graft.index.{BruteForceKnn, RandomHyperplaneLsh}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LshSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private def randVec(dim: Int): Array[Float] = Array.fill(dim)(rng.nextGaussian().toFloat)
  private def toDf(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")

  test("seeded plane generation is deterministic and unit-normalized (lsh.py:44-52)") {
    val a = RandomHyperplaneLsh(8, 12, 42L).planes(16)
    val b = RandomHyperplaneLsh(8, 12, 42L).planes(16)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
    for (t <- a; p <- t) {
      val norm = math.sqrt(p.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(norm - 1.0) < 1e-6)
    }
    val c = RandomHyperplaneLsh(8, 12, 43L).planes(16)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq != c.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("hash is scale-invariant for positive scaling (sign bits)") {
    val lsh = RandomHyperplaneLsh(2, 8, 42L)
    val ps = lsh.planes(8)
    val v = randVec(8)
    val scaled = v.map(_ * 3.7f)
    ps.foreach { tp => assert(lsh.hash(v.toSeq, tp) == lsh.hash(scaled.toSeq, tp)) }
  }

  test("LSH hits are a subset of brute hits over the whole corpus, with equal scores") {
    val rows = Seq.fill(300)(randVec(16))
    val df = toDf(rows)
    val query = rows(42) // member query guarantees >= 1 candidate (itself)
    val (hits, used) = RandomHyperplaneLsh(8, 6, 42L)
      .search(df, col("embedding"), col("vec_id"), query, 10)
    assert(used == "lsh")
    val lshScores = hits.select("vec_id", "score").as[(Long, Double)].collect().toMap
    assert(lshScores.nonEmpty)
    val bruteAll = BruteForceKnn.scored(df, col("embedding"), query)
      .select("vec_id", "score").as[(Long, Double)].collect().toMap
    lshScores.foreach { case (id, s) =>
      assert(math.abs(bruteAll(id) - s) < 1e-12, s"score mismatch for $id")
    }
    // the member itself is always in its own bucket -> top hit score 1.0
    assert(math.abs(lshScores.values.max - 1.0) < 1e-6)
  }

  test("search is deterministic across runs (same seed, same results)") {
    val rows = Seq.fill(100)(randVec(8))
    val df = toDf(rows)
    val q = rows(7)
    def run() = RandomHyperplaneLsh(4, 4, 42L)
      .search(df, col("embedding"), col("vec_id"), q, 5)
      ._1.select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(run() == run())
  }

  test("fallback to brute when zero candidates and corpus <= 10000 (search_service.py:127-131)") {
    // One indexed vector; query orthogonal-ish and far -> with many
    // planes the query bucket almost surely differs in every table.
    val rows = Seq(Array.fill(32)(1.0f))
    val df = toDf(rows)
    val query = Array.tabulate(32)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val lsh = RandomHyperplaneLsh(2, 24, 1L)
    val ps = lsh.planes(32)
    val qb = ps.map(tp => lsh.hash(query.toSeq, tp))
    val rb = ps.map(tp => lsh.hash(rows.head.toSeq, tp))
    assume(qb.zip(rb).forall { case (a, b) => a != b }, "seed must separate buckets")
    val (hits, used) = lsh.search(df, col("embedding"), col("vec_id"), query, 5)
    assert(used == "brute")
    assert(hits.count() == 1)
  }

  test("multi-probe returns a candidate superset of exact-bucket probing, scores still exact") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sfDir)
    val q = Queries.queryVec(spark, sfDir)
    val lsh = RandomHyperplaneLsh(8, 12, 42L)
    val (exactHits, used) = lsh.search(emb, col("embedding"), col("vec_id"), q, 50)
    val exact = exactHits.select("vec_id").as[Long].collect().toSet
    val multi = lsh.searchMultiProbe(emb, col("embedding"), col("vec_id"), q, 50)
      .select("vec_id", "score").as[(Long, Double)].collect()
    if (used == "lsh") assert(exact.subsetOf(multi.map(_._1).toSet))
    assert(multi.length >= exact.size)
    val brute = BruteForceKnn.scored(emb, col("embedding"), q)
      .select("vec_id", "score").as[(Long, Double)].collect().toMap
    multi.foreach { case (id, s) => assert(math.abs(brute(id) - s) < 1e-12) }
  }

  test("k <= 0 yields empty without fallback") {
    val df = toDf(Seq.fill(5)(randVec(4)))
    val (hits, used) = RandomHyperplaneLsh(2, 4, 42L)
      .search(df, col("embedding"), col("vec_id"), randVec(4), 0)
    assert(hits.count() == 0 && used == "lsh")
  }
}
