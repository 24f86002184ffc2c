package graft

import graft.functions.VectorFunctions
import graft.index.BruteForceKnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BruteForceKnnSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def toDf(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")

  private val rng = new scala.util.Random(7)
  private def randVec(dim: Int): Array[Float] = Array.fill(dim)(rng.nextGaussian().toFloat)

  test("top-k matches the pure oracle on random vectors") {
    val rows = Seq.fill(200)(randVec(16))
    val query = randVec(16)
    val expected = OracleKnn.search(rows.map(_.map(_.toDouble)), query.map(_.toDouble), 10)
    val got = BruteForceKnn.search(toDf(rows), col("embedding"), col("vec_id"), query, 10)
      .select("vec_id", "score").as[(Long, Double)].collect()
    assert(got.length == expected.length)
    expected.zip(got).foreach { case ((ei, es), (gi, gs)) =>
      assert(gi == ei.toLong, s"id order: expected $ei got $gi")
      assert(math.abs(gs - es) < 1e-9, s"score: expected $es got $gs")
    }
  }

  test("top-k is a prefix of the full score sort (property over k)") {
    val rows = Seq.fill(60)(randVec(8))
    val query = randVec(8)
    val full = BruteForceKnn.search(toDf(rows), col("embedding"), col("vec_id"), query, 60)
      .select("vec_id").as[Long].collect().toSeq
    for (k <- Seq(1, 5, 17, 59)) {
      val prefix = BruteForceKnn.search(toDf(rows), col("embedding"), col("vec_id"), query, k)
        .select("vec_id").as[Long].collect().toSeq
      assert(prefix == full.take(k), s"k=$k not a prefix")
    }
  }

  test("k <= 0 yields empty result (search_service.py:95-96)") {
    val df = toDf(Seq.fill(5)(randVec(4)))
    assert(BruteForceKnn.search(df, col("embedding"), col("vec_id"), randVec(4), 0).count() == 0)
    assert(BruteForceKnn.search(df, col("embedding"), col("vec_id"), randVec(4), -3).count() == 0)
  }

  test("k > n returns n rows (min(k, N), brute_force.py:45-47)") {
    val df = toDf(Seq.fill(7)(randVec(4)))
    assert(BruteForceKnn.search(df, col("embedding"), col("vec_id"), randVec(4), 100).count() == 7)
  }

  test("NULL embeddings are skipped (search_service.py:43-46)") {
    val df = Seq((0L, Some(randVec(4))), (1L, None), (2L, Some(randVec(4))))
      .toDF("vec_id", "embedding")
    assert(BruteForceKnn.search(df, col("embedding"), col("vec_id"), randVec(4), 10).count() == 2)
  }

  test("zero vector scores 0 against everything and is never NaN (brute_force.py:10-11)") {
    val rows = Seq(Array(0f, 0f, 0f), Array(1f, 2f, 3f))
    val scores = BruteForceKnn.scored(toDf(rows), col("embedding"), Array(0f, 0f, 0f))
      .select("score").as[Double].collect()
    assert(scores.forall(_ == 0.0))
    val scores2 = BruteForceKnn.scored(toDf(rows), col("embedding"), Array(1f, 0f, 0f))
      .orderBy("vec_id").select("score").as[Double].collect()
    assert(scores2(0) == 0.0) // zero row vs non-zero query
    assert(!scores2.exists(_.isNaN))
  }

  test("dim mismatch raises (brute_force.py:36-37)") {
    intercept[IllegalArgumentException] {
      BruteForceKnn.requireDim(Array(1f, 2f), 3)
    }
  }

  test("cosine HOF variant agrees with the UDF") {
    val df = toDf(Seq.fill(50)(randVec(12)))
    val q = randVec(12)
    val both = df.select(
      VectorFunctions.cosine(col("embedding"), typedlit(q.toSeq)).as("udf"),
      VectorFunctions.cosineHof(col("embedding"), typedlit(q.toSeq)).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (u, h) => assert(math.abs(u - h) < 1e-12) }
  }

  test("matches oracle on the sf0.001 embeddings table") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val query = emb.head._2
    val expected = OracleKnn.search(emb.map(_._2.map(_.toDouble)).toSeq, query.map(_.toDouble), 5)
    val got = BruteForceKnn.search(Tables.embeddings(spark, sfDir),
        col("embedding"), col("vec_id"), query, 5)
      .select("vec_id", "score").as[(Long, Double)].collect()
    expected.zip(got).foreach { case ((ei, es), (gi, gs)) =>
      assert(gi == ei.toLong && math.abs(gs - es) < 1e-9)
    }
  }
}
