package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** At-rest partitioned layout + partition pruning: the table-layout
  * half of the scale story (the bucketed-join half is
  * BucketedJoinSpec). A date-partitioned fact table must turn a month
  * predicate into PartitionFilters — a pruned directory listing — not
  * a data filter over every file.
  */
class PartitionPruningSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val path = "target/test-partitioned/orders_by_month"

  private def writeOnce(): Unit = synchronized {
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      Tables.orders(spark, "/root/testdata/sf0.001")
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .repartition(col("o_month"))
        .write.mode("overwrite").partitionBy("o_month").parquet(path)
    }
  }

  test("month predicate becomes a PartitionFilter and reads one directory") {
    writeOnce()
    val df = spark.read.parquet(path).where(col("o_month") === "1997-03")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_month"), s"no partition filter in plan:\n$plan")
    // pruned read: exactly the one month directory's rows, none filtered post-scan
    val expected = Tables.orders(spark, "/root/testdata/sf0.001")
      .where(date_format(col("o_orderdate"), "yyyy-MM") === "1997-03").count()
    assert(df.count() == expected && expected > 0)
    // the physical scan prunes to ONE partition directory's file
    // (inputFiles reflects the unpruned relation; the scan's numFiles
    // metric after execution reflects what was actually listed)
    val qe = df.queryExecution
    df.collect()
    val scan = qe.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numFiles").value == 1L,
      s"scan not pruned to one file: ${scan.metrics("numFiles").value}")
  }

  test("non-partition predicate still pushes down as a data filter") {
    writeOnce()
    val df = spark.read.parquet(path).where(col("o_totalprice") > 100000.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"no pushed filter in plan:\n$plan")
    // reads every partition directory (no pruning applicable)
    val qe = df.queryExecution
    df.collect()
    val scan = qe.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val months = spark.read.parquet(path)
      .select(col("o_month")).distinct().count()
    assert(scan.metrics("numFiles").value == months,
      s"expected $months files, got ${scan.metrics("numFiles").value}")
  }
}
