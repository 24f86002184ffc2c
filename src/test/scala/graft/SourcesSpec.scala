package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage beyond parquet: JSON-lines and CSV round-trips
  * with EXPLICIT schemas (schema inference is a second full pass over
  * the data — never acceptable at 100 TB; a production pipeline always
  * declares its schema).
  */
class SourcesSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val base = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeJson(): String = {
    val path = "target/test-sources/docs-json"
    base.write.mode("overwrite").json(path)
    path
  }

  test("JSON-lines round-trip preserves every row and column") {
    val path = writeJson()
    val back = spark.read.schema(schema).json(path)
    assert(back.schema == schema)
    assert(back.except(base).isEmpty && base.except(back).isEmpty)
    assert(back.count() == 500)
  }

  test("CSV round-trip (quoted, header) preserves every row and column") {
    val path = "target/test-sources/docs-csv"
    // documents text is space-separated ASCII words (FIXTURES.md), but
    // quote/escape anyway - the writer must be safe for arbitrary text
    base.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(path)
    val back = spark.read.schema(schema).option("header", "true").csv(path)
    assert(back.except(base).isEmpty && base.except(back).isEmpty)
  }

  test("ORC round-trip preserves rows, columns and pushes filters to the scan") {
    val path = "target/test-sources/docs-orc"
    base.write.mode("overwrite").orc(path)
    val back = spark.read.schema(schema).orc(path)
    assert(back.schema == schema)
    assert(back.except(base).isEmpty && base.except(back).isEmpty)
    // columnar sources must receive predicate pushdown, same as parquet
    val plan = back.where(col("doc_id") < 100).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,100)"),
      s"expected pushed filter in ORC scan plan:\n$plan")
  }

  test("a query runs identically over parquet, json and csv sources") {
    val jf = spark.read.schema(schema).json(writeJson())
    val expected = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang")).as[(String, Long)].collect().toSeq
    val got = jf.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang")).as[(String, Long)].collect().toSeq
    assert(got == expected)
  }
}
