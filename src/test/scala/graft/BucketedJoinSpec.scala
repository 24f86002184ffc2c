package graft

import graft.operators.BucketedTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedJoinSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  test("bucketed tables join without any Exchange (co-located sort-merge join)") {
    val sfDir = "/root/testdata/sf0.001"
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      TestSpark.rmTree(new java.io.File(s"spark-warehouse/$t"))
    }
    BucketedTables.writeBucketed(
      Tables.orders(spark, sfDir), "b_orders", "o_orderkey", 8, sortBy = Some("o_orderkey"))
    BucketedTables.writeBucketed(
      Tables.lineitem(spark, sfDir), "b_lineitem", "l_orderkey", 8, sortBy = Some("l_orderkey"))

    // tiny test tables would be broadcast; force the merge-join path
    // that a 100 TB fact-fact join takes
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.colocatedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle in:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scan in:\n$plan")

      // results equal the plain (shuffled) join
      val plain = Tables.orders(spark, sfDir).join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() == plain.count())

      // bucket-key aggregation is also exchange-free
      val agg = spark.table("b_lineitem").groupBy(col("l_orderkey")).count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
