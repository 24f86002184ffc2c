package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Shared recursive temp-dir delete — the suite had grown six
    * private near-copies (each needing to remember the null-check on
    * listFiles for a dir deleted underneath it). */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) { val cs = f.listFiles(); if (cs != null) cs.foreach(rmTree) }
    f.delete()
  }
}
