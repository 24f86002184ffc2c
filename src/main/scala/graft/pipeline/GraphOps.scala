package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computations over edge lists — the curation-side
  * consumers of the kNN graph ([[graft.index.KnnJoin]]): centrality
  * scores for coreset selection ("keep the most representative
  * samples"), influence-weighted sampling, duplicate-cluster ranking.
  */
object GraphOps {

  /** Power-iteration PageRank over a directed (src, dst) edge list.
    *
    * Simplified (no dangling-mass redistribution — a sink keeps only
    * its teleport share; documented because the DuckDB oracle replays
    * the same recurrence): r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/outdeg(u).
    *
    * Scale shape: each iteration is ONE contribution shuffle (edges
    * joined to the nodes-sized rank table, grouped by dst with partial
    * aggregation) — the textbook distributed PageRank decomposition;
    * the rank and degree tables stay nodes-sized. Deterministic: pure
    * arithmetic, no RNG, no partition-order dependence. `iters` is
    * expected small (single digits); past ~10 the growing lineage
    * wants a checkpoint every few iterations — callers at that depth
    * should persist intermediate ranks.
    *
    * The node count (one scalar `count()`) is the only driver-side
    * value. Returns (id, rank) for every node appearing as src or dst.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct().cache()
    val n = nodes.count().toDouble
    val degEdges = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(edges.groupBy(col(srcCol).as("src"))
        .agg(count(lit(1)).cast("double").as("outd")), "src")
      .cache()
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iters) {
      val contrib = degEdges.join(ranks, col("src") === col("id"))
        .select(col("dst"), (col("r") / col("outd")).as("m"))
        .groupBy(col("dst")).agg(sum(col("m")).as("m"))
      ranks = nodes.join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
    }
    ranks.select(col("id"), col("r").as("rank"))
  }
}
