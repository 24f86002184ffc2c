package graft

import graft.embed.HashingEmbedder
import graft.operators.Salting
import graft.state.Engine
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqlSaltingSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("engine tables queryable via plain Spark SQL, including cosine top-k") {
    val engine = new Engine()
    val emb = HashingEmbedder(dim = 8)
    val lib = engine.createLibrary("sql-lib").id
    val doc = engine.addDocument(lib, "doc").id
    Seq("alpha beta", "gamma delta", "alpha gamma").foreach { t =>
      engine.addChunk(lib, doc, t, Some(emb.embed(t)))
    }
    EngineSql.registerViews(spark, engine)
    val joined = spark.sql(
      """SELECT l.name, count(*) AS n_chunks
        |FROM chunks c JOIN documents d ON c.document_id = d.id
        |JOIN libraries l ON d.library_id = l.id
        |GROUP BY l.name""".stripMargin).as[(String, Long)].head()
    assert(joined == ("sql-lib", 3L))

    val q = emb.embed("alpha beta")
    spark.sql("SELECT * FROM chunks").createOrReplaceTempView("chunks")
    val top = spark.sql(
      s"""SELECT text, cosine_similarity(embedding, array(${q.map(v => s"CAST($v AS FLOAT)").mkString(",")})) AS score
         |FROM chunks ORDER BY score DESC LIMIT 1""".stripMargin)
      .as[(String, Double)].head()
    assert(top._1 == "alpha beta" && math.abs(top._2 - 1.0) < 1e-6)
  }

  test("salted aggregation equals direct aggregation (incl. skewed key)") {
    val df = (Seq.fill(5000)((7L, 1.5)) ++ (1 to 100).map(i => (i.toLong, i * 0.5)))
      .toDF("user_id", "value")
    val direct = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .orderBy("user_id").as[(Long, Long, Double)].collect()
    val salted = Salting.saltedCountSum(df, "user_id", "value")
      .orderBy("user_id").as[(Long, Long, Double)].collect()
    assert(direct.length == salted.length)
    direct.zip(salted).foreach { case ((k1, n1, s1), (k2, n2, s2)) =>
      assert(k1 == k2 && n1 == n2 && math.abs(s1 - s2) < 1e-6)
    }
  }
}
