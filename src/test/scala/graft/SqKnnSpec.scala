package graft

import graft.index.SqKnn
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class SqKnnSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)

  test("codes are dim bytes; scales come from one aggregation; deterministic") {
    val scales = SqKnn.trainScales(emb, col("embedding"), 64)
    assert(scales.length == 64 && scales.forall(s => s > 0.0 && s <= 1.0 / 127))
    val c1 = SqKnn.encode(emb, col("vec_id"), col("embedding"), scales)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val c2 = SqKnn.encode(emb, col("vec_id"), col("embedding"), scales)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(c1.length == 500 && c1.forall(_._2.length == 64))
    assert(c1.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq)
  }

  test("SQ8 is near-exact: recall@10 >= 0.9 vs brute force, self-score ~ 1") {
    val q = Queries.queryVec(spark, sfDir)
    val truth = graft.index.BruteForceKnn
      .search(emb, col("embedding"), col("vec_id"), q, 10)
      .select(col("vec_id")).as[Long].collect().toSet
    val got = SqKnn.search(emb, col("vec_id"), col("embedding"), q, 10, dim = 64)
      .as[(Long, Double)].collect()
    val recall = truth.intersect(got.map(_._1).toSet).size.toDouble / 10
    assert(recall >= 0.9, s"SQ8 recall@10 = $recall")
    val self = got.find(_._1 == 0L)
    assert(self.isDefined && math.abs(self.get._2 - 1.0) < 0.01,
      s"self-score drifted: $self")
  }

  test("quantized scores stay within the per-component error bound of exact cosine") {
    val q = Queries.queryVec(spark, sfDir)
    val exact = graft.index.BruteForceKnn.scored(emb, col("embedding"), q)
      .select(col("vec_id"), col("score")).as[(Long, Double)].collect().toMap
    val scales = SqKnn.trainScales(emb, col("embedding"), 64)
    val approx = SqKnn.searchEncoded(
        SqKnn.encode(emb, col("vec_id"), col("embedding"), scales), q, scales, 500)
      .as[(Long, Double)].collect()
    // |err| <= sum_d |q_d| * scale_d/2  (round-to-nearest halves the step)
    val qn = {
      val n = math.sqrt(q.map(x => x.toDouble * x).sum)
      q.map(x => x / n)
    }
    val bound = qn.indices.map(d => math.abs(qn(d)) * scales(d) / 2).sum + 1e-9
    approx.foreach { case (id, s) =>
      assert(math.abs(s - exact(id)) <= bound,
        s"vec $id: |$s - ${exact(id)}| > $bound")
    }
  }
}
