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

  /** The JOIN half of the skew story (Salting covers aggregations):
    * AQE detects the hot key's oversized shuffle partition at runtime
    * and splits it across tasks — the plan itself carries the
    * `skew=true` marker. This is the mechanism the engine relies on at
    * 100 TB instead of hand-salting every join, so pin that it
    * actually engages on a skewed join, not just that the conf is set.
    */
  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 90% of the left side lands on key 7 — one shuffle partition
      // dwarfs the rest
      val left = spark.range(0, 50000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS frame: the skew decision is made (and marked) in
      // the adaptive plan of the executed query, and count() would run
      // a separate QueryExecution
      val n = joined.collect().length
      // key 7 matches 45,000 left rows; keys 0,10,...,90 match 10 more
      assert(n === 45010)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join to engage; final plan:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
