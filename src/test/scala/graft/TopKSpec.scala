package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("top-k aggregator matches the window-function formulation exactly") {
    val rng = new scala.util.Random(5)
    val df = Seq.fill(2000)((rng.nextInt(7), rng.nextLong().abs % 100000, rng.nextGaussian()))
      .toDF("grp", "id", "score")
      .dropDuplicates("grp", "id")
    val viaAgg = TopK.perGroup(df, Seq(col("grp")), col("id"), col("score"), 5)
      .orderBy("grp", "rn").as[(Int, Long, Long, Double)].collect().toSeq
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 5)
      .select(col("grp"), col("rn"), col("id"), col("score"))
      .orderBy("grp", "rn").as[(Int, Long, Long, Double)].collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k return all rows, ranked") {
    val df = Seq((1, 10L, 0.5), (1, 11L, 0.9)).toDF("grp", "id", "score")
    val out = TopK.perGroup(df, Seq(col("grp")), col("id"), col("score"), 5)
      .orderBy("rn").as[(Int, Long, Long, Double)].collect()
    assert(out.length == 2 && out.head._3 == 11L && out.head._2 == 1L)
  }

  test("ties break by ascending id") {
    val df = Seq((1, 30L, 1.0), (1, 10L, 1.0), (1, 20L, 1.0)).toDF("grp", "id", "score")
    val out = TopK.perGroup(df, Seq(col("grp")), col("id"), col("score"), 2)
      .orderBy("rn").select("id").as[Long].collect()
    assert(out.toSeq == Seq(10L, 20L))
  }
}
