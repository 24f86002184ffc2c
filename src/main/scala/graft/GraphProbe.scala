package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the graph tier: PageRank's per-iteration shuffle
  * at 1M nodes / 5M edges (the iterative-computation story isolated
  * from graph construction), and the LSH-blocked kNN-graph build that
  * feeds it at 200k corpus vectors (the construction story at 40× the
  * gate corpus). Prints GRAPH-prefixed lines for docs/PIPELINE.md.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"GRAPH $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // Deterministic synthetic graph: 5M edges over 1M nodes, endpoints
    // from splitmix64 of the edge id — no RNG state, reproducible.
    val nodes = 1000000L
    val edges = spark.range(5000000L)
      .select(pmod(graft.expressions.SplitMix64(col("id")), lit(nodes)).as("src"),
        pmod(graft.expressions.SplitMix64(col("id") + 7777777L), lit(nodes)).as("dst"))
      .where(col("src") =!= col("dst"))
    val edgePath = "target/graph-probe/edges"
    edges.write.mode("overwrite").parquet(edgePath)
    val e = spark.read.parquet(edgePath)
    println(s"GRAPH edges=${e.count()}")
    // JIT/page-cache warmup so the 3-vs-6 iteration pair measures the
    // per-iteration shuffle, not first-job compilation
    graft.pipeline.GraphOps.pageRank(e, "src", "dst", iters = 1).count()
    time("pagerank 3 iters, 1M nodes / 5M edges (warm)") {
      graft.pipeline.GraphOps.pageRank(e, "src", "dst", iters = 3).count()
    }
    time("pagerank 6 iters (2x depth; linear, one shuffle per iter)") {
      graft.pipeline.GraphOps.pageRank(e, "src", "dst", iters = 6).count()
    }

    // Construction at 40x the sf0.1 corpus (80k vectors with re-based
    // ids), 4k-query side, LSH-bucket blocking — the path the gate
    // proves correct at sf0.01 and knn_join_graph_lsh's Scaladoc
    // claims scales. Candidates come from the (table, bucket)
    // equi-join; no broadcast of the corpus anywhere.
    val embBase = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .where(col("embedding").isNotNull)
    val vecBase = embBase.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val copies = 40
    val bigPath = "target/graph-probe/emb"
    embBase.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * vecBase).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(bigPath)
    val corpus = spark.read.parquet(bigPath)
    println(s"GRAPH corpus vectors=${corpus.count()}")
    val queries = corpus.where(col("vec_id") < 4000)
    var graphEdges: org.apache.spark.sql.DataFrame = null
    time("kNN graph build: 4k queries vs 80k corpus, LSH-bucketed, k=3") {
      graphEdges = graft.index.KnnJoin.lshBucketed(
        queries, corpus, "vec_id", "embedding", k = 3)
        .select(col("q_id").as("src"), col("neighbor_id").as("dst"))
      graphEdges.write.mode("overwrite").parquet("target/graph-probe/knn-edges")
      spark.read.parquet("target/graph-probe/knn-edges").count()
    }
    time("pagerank 3 iters over the built kNN edges") {
      graft.pipeline.GraphOps.pageRank(
        spark.read.parquet("target/graph-probe/knn-edges"), "src", "dst", 3).count()
    }
    spark.stop()
  }
}
