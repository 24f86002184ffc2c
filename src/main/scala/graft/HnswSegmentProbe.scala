package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices HNSW segment accumulation (r15 verdict, Next #4 — the HNSW
  * analog of IVF centroid drift): [[graft.index.HnswIndexStore]] takes
  * appends as SEGMENTS (each batch builds its own graph; existing
  * graphs are never touched), so a long-appended store fans every
  * query out over ever more shard graphs. Fixed corpus, varying
  * segment count, two measured quantities:
  *
  *  - '''recall@10''' vs exact brute force over hash-sampled member
  *    queries (arithmetic strides alias with generators — the r12
  *    sweep catch);
  *  - '''warm serve time''' for a 20-query batch via [[graft.index
  *    .HnswIndexStore.searchMany]] (per-task graph reconstruction +
  *    per-query beams — the cost that scales with segment count).
  *
  * Expected shape, then verified: recall holds or rises with segments
  * (more, smaller graphs = more independent beams = more candidates
  * reaching the global rank) while serve time grows ~linearly in the
  * segment count (every query beams through every graph) — so the
  * compaction trigger is a COST signal, not a quality alarm, and the
  * free observable is the segment count the append's own directory
  * listing already computes. The measured knee picks the default for
  * [[graft.index.HnswIndexStore.HnswAppendStats.compactionAdvised]].
  *
  * Usage: runMain graft.HnswSegmentProbe [rows] (default 100,000)
  * Results recorded in README's ANN decision-table notes.
  */
object HnswSegmentProbe {

  private def smix(x: Long): Long = graft.functions.TextFunctions.splitmix64(x)

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val vecOf = udf { (id: Long) =>
      Array.tabulate(dim)(j => ((smix(id * dim + j) % 2000L) / 1000.0).toFloat)
    }
    val corpus = spark.range(rows)
      .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      .cache()
    corpus.count()

    // hash-sampled member queries + exact ground truth (one batched
    // exact kNN join; self-match included on both sides consistently)
    val queries = corpus.where(pmod(hash(col("vec_id")), lit(4099)) === 0)
      .limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(queries.length >= 10, "sample produced too few queries")
    val qDf = queries.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val truth = graft.index.KnnJoin.exact(qDf, corpus, "vec_id", "embedding", 10)
      .select(col("q_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val store = graft.index.HnswIndexStore()
    for (segs <- Seq(1, 4, 16, 64)) {
      val path = s"target/hnsw-seg-probe/segs-$segs"
      val per = rows / segs
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        // ingest-ordered slices, the real append composition: base
        // write then segs-1 appends of one graph each
        store.write(corpus.where(col("vec_id") < per), "vec_id", "embedding",
          path, numShards = 1)
        var stats: graft.index.HnswIndexStore.HnswAppendStats = null
        (1 until segs).foreach { s =>
          stats = store.append(
            corpus.where(col("vec_id") >= s * per &&
              (col("vec_id") < (s + 1) * per || lit(s == segs - 1))),
            "vec_id", "embedding", path)
        }
        val buildSec = (System.nanoTime() - t0) / 1e9
        println(f"HNSWSEG segs=$segs%3d build=$buildSec%6.1f s " +
          s"appendStats=${Option(stats).map(_.segments).getOrElse(1)}")
      }
      def serve(): Map[Long, Seq[Long]] =
        store.searchMany(spark, path, queries, k = 10)
          .select(col("qid"), col("id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
      serve() // cold: page cache + JIT
      val t1 = System.nanoTime()
      val got = serve()
      val warmSec = (System.nanoTime() - t1) / 1e9
      val recall = queries.map { case (qid, _) =>
        got.getOrElse(qid, Nil).count(truth(qid)).toDouble / truth(qid).size
      }.sum / queries.length
      println(f"HNSWSEG segs=$segs%3d recall@10=$recall%.3f warm_serve_20q=$warmSec%6.2f s")
    }

    // ---- sweep B: the ACCUMULATION scenario (the lifecycle hazard the
    // trigger exists for) — a 100k base sharded for the machine (8
    // graphs), then S tiny 1k-row appended segments (a streaming
    // ingest's tail). Per-query cost = base beams + S extra graph
    // reconstructions/beams + S more task bins; recall truth is
    // recomputed per config because the corpus grows with the tail.
    val baseRows = rows
    for (tail <- Seq(0, 16, 64, 256)) {
      val total = baseRows + tail * 1000L
      val full = spark.range(total)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      val path = s"target/hnsw-seg-probe/tail-$tail"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        store.write(full.where(col("vec_id") < baseRows), "vec_id", "embedding",
          path, numShards = 8)
        (0 until tail).foreach { s =>
          store.append(
            full.where(col("vec_id") >= baseRows + s * 1000L &&
              col("vec_id") < baseRows + (s + 1) * 1000L),
            "vec_id", "embedding", path): Unit
        }
        println(f"HNSWSEG tail=$tail%3d build=${(System.nanoTime() - t0) / 1e9}%6.1f s " +
          s"segments=${store.segmentCount(spark, path)}")
      }
      val truthB = graft.index.KnnJoin.exact(qDf, full, "vec_id", "embedding", 10)
        .select(col("q_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      def serveB(): Map[Long, Seq[Long]] =
        store.searchMany(spark, path, queries, k = 10)
          .select(col("qid"), col("id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
      serveB()
      val t1 = System.nanoTime()
      val got = serveB()
      val warmSec = (System.nanoTime() - t1) / 1e9
      val recall = queries.map { case (qid, _) =>
        got.getOrElse(qid, Nil).count(truthB(qid)).toDouble / truthB(qid).size
      }.sum / queries.length
      println(f"HNSWSEG tail=$tail%3d segments=${8 + tail}%3d " +
        f"recall@10=$recall%.3f warm_serve_20q=$warmSec%6.2f s")
    }
    spark.stop()
  }
}
