package graft

import graft.expressions.CosineSimilarity
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(3)
  private def randVec(dim: Int): Array[Float] = Array.fill(dim)(rng.nextGaussian().toFloat)

  test("native expression is bitwise-equal to the UDF (codegen path)") {
    val df = Seq.fill(500)((randVec(64), randVec(64))).toDF("a", "b")
    val diff = df.select(
        CosineSimilarity(col("a"), col("b")).as("expr"),
        VectorFunctions.cosineUdf(col("a"), col("b")).as("udf"))
      .where(col("expr") =!= col("udf")) // bitwise: any fp difference shows
      .count()
    assert(diff == 0)
  }

  test("interpreted (eval) path agrees with codegen and handles edge cases") {
    val cases = Seq(
      (Array(0f, 0f), Array(1f, 2f)),          // zero vector -> 0.0
      (Array(1f, 2f, 3f), Array(1f, 2f)),      // length mismatch -> common prefix dot, full norms
      (Array(1f, 0f), Array(1f, 0f)))          // identical -> 1.0
    val df = cases.toDF("a", "b")
    val rows = df.select(CosineSimilarity(col("a"), col("b"))).as[Double].collect()
    assert(rows(0) == 0.0)
    assert(math.abs(rows(2) - 1.0) < 1e-12)
    // interpreted path: eval the expression directly (no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def l(v: Array[Float]) = Literal.create(v, ArrayType(FloatType))
    val e = graft.expressions.CosineSimilarity(l(Array(1f, 0f)), l(Array(1f, 0f)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(graft.expressions.CosineSimilarity(l(Array(0f, 0f)), l(Array(1f, 2f)))
      .eval(null).asInstanceOf[Double] == 0.0)
    assert(!rows.exists(_.isNaN))
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]])).toDF("a", "b")
    val r = df.select(CosineSimilarity(col("a"), col("b")).as("c")).collect()
    assert(r.head.isNullAt(0))
  }

  test("null ELEMENTS contribute 0.0 — codegen and eval agree") {
    // ARRAY<FLOAT> with containsNull=true (the shape every parquet-read
    // embedding column has): a null element must act as 0.0, not read
    // undefined memory.
    val withNulls = Seq(
      (Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 2f, 3f)),
      (Seq[java.lang.Float](null, null), Seq[java.lang.Float](1f, 2f)))
      .toDF("a", "b")
    val got = withNulls.select(CosineSimilarity(col("a"), col("b")).as("c"))
      .as[Double].collect()
    // (1,0,3)·(1,2,3) / (|103| * |123|)
    val exp0 = (1.0 + 0.0 + 9.0) / (math.sqrt(10.0) * math.sqrt(14.0))
    assert(math.abs(got(0) - exp0) < 1e-12)
    assert(got(1) == 0.0) // all-null lhs == zero vector -> 0.0

    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Literal(new GenericArrayData(Array[Any](1f, null, 3f)), ArrayType(FloatType, containsNull = true))
    val b = Literal(new GenericArrayData(Array[Any](1f, 2f, 3f)), ArrayType(FloatType, containsNull = true))
    val evald = CosineSimilarity(a, b).eval(null).asInstanceOf[Double]
    assert(math.abs(evald - exp0) < 1e-12)
  }

  test("registered SQL function works") {
    CosineSimilarity.register(spark)
    Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT cosine_similarity(a, b) AS c FROM vecs").as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("type check rejects non-float arrays") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(CosineSimilarity(col("a"), col("b"))).collect()
    }
  }
}
