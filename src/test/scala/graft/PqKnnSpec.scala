package graft

import graft.index.PqKnn
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class PqKnnSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)

  test("codes are m bytes and deterministic across runs") {
    val cb = PqKnn.train(emb, col("vec_id"), col("embedding"), dim = 64, m = 8, k = 16)
    val codes1 = PqKnn.encode(emb, col("vec_id"), col("embedding"), cb)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val codes2 = PqKnn.encode(emb, col("vec_id"), col("embedding"), cb)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(codes1.length == 500)
    assert(codes1.forall(_._2.length == 8))
    assert(codes1.map(_._2.toSeq).toSeq == codes2.map(_._2.toSeq).toSeq)
  }

  test("ADC score equals the sum of table lookups for the row's code") {
    val q = Queries.queryVec(spark, sfDir)
    val cb = PqKnn.train(emb, col("vec_id"), col("embedding"), dim = 64)
    val table = PqKnn.adcTable(q, cb)
    val codes = PqKnn.encode(emb, col("vec_id"), col("embedding"), cb)
    val got = PqKnn.searchEncoded(codes, q, cb, 5).as[(Long, Double)].collect()
    val codeMap = codes.as[(Long, Array[Byte])].collect().toMap
    got.foreach { case (id, s) =>
      val expected = codeMap(id).zipWithIndex.map { case (c, m) => table(m)(c & 0xFF) }.sum
      assert(math.abs(s - expected) < 1e-12)
    }
  }

  test("recall@10 vs exact brute force is at least 0.5 and self-hit is near the top") {
    val q = Queries.queryVec(spark, sfDir)
    val truth = graft.index.BruteForceKnn
      .search(emb, col("embedding"), col("vec_id"), q, 10)
      .select(col("vec_id")).as[Long].collect().toSet
    val pq = PqKnn.search(emb, col("vec_id"), col("embedding"), q, 10, dim = 64)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = truth.intersect(pq).size.toDouble / 10
    assert(recall >= 0.5, s"PQ recall@10 = $recall")
    // vec 0 IS the query; its reconstruction should rank in the top 10
    assert(pq.contains(0L), "query's own vector fell out of PQ top-10")
  }

  test("more centroids monotonically improve (or tie) quantization error") {
    val q = Queries.queryVec(spark, sfDir)
    def err(k: Int): Double = {
      val cb = PqKnn.train(emb, col("vec_id"), col("embedding"), dim = 64, k = k)
      // ADC self-score of the query vector: 1.0 exactly iff lossless
      val codes = PqKnn.encode(emb.where(col("vec_id") === 0),
        col("vec_id"), col("embedding"), cb)
      val s = PqKnn.searchEncoded(codes, q, cb, 1).as[(Long, Double)].head()._2
      math.abs(1.0 - s)
    }
    assert(err(32) <= err(4) + 1e-9)
  }
}
