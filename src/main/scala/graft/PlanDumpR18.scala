package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` of named gates to one file each — the
  * r18 optimization round's before/after plan evidence
  * (`plans/r18/<gate>_<tag>.txt`). Streaming gates are excluded by the
  * caller: their gate functions EXECUTE the replay and return pinned
  * rows, so their Dataset explain is just a LocalTableScan envelope.
  *
  * Usage: runMain graft.PlanDumpR18 <outDir> <tag> <gate>[,<gate>...] [sfDir]
  */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val tag = args(1); val gates = args(2).split(",")
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    gates.foreach { g =>
      val df = Queries.all(g)(spark, sfDir)
      // queryExecution.explainString is exactly what explain("formatted") prints
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${g}_$tag.txt"),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLANDUMP wrote $outDir/${g}_$tag.txt")
    }
    spark.stop()
  }
}
