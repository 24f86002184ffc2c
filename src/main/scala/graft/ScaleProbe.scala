package graft

import graft.expressions.CosineSimilarity
import graft.index.{LshIndexStore, RandomHyperplaneLsh}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: blow the embeddings corpus up ~1000× by unioning
  * shifted copies (distinct vec_ids, same vectors — the score
  * distribution is what matters for timing), then measure
  *  (a) exact brute top-5: full-scan + codegen'd cosine +
  *      TakeOrderedAndProject;
  *  (b) the at-rest LSH index probe: partition-pruned scan + rerank.
  * This is the evidence that the plans, not just the code, survive a
  * corpus 3 orders of magnitude past the test SF.
  * Usage: runMain graft.ScaleProbe [copies]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 1000
    val nParts = if (args.length > 1) args(1).toInt else 256
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.embeddings(spark, "/root/testdata/sf0.1") // 2000 x 64d
    val big = base.crossJoin(
        spark.range(copies).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * 2000L).as("vec_id"), col("embedding"))
    val bigPath = "target/scale-probe/corpus"
    big.write.mode("overwrite").parquet(bigPath)
    val corpus = spark.read.parquet(bigPath)
    val n = corpus.count()
    println(s"SCALE corpus rows=$n")

    val q = Queries.queryVec(spark, "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // (a) exact brute: scan all N, codegen cosine, per-partition heaps
    val bruteRows = time("brute top-5 full scan") {
      corpus
        .withColumn("score", CosineSimilarity(col("embedding"), typedlit(q.toSeq)))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5).collect()
    }
    println(s"SCALE brute head=${bruteRows.take(2).mkString(", ")}")

    // (b) at-rest LSH index: one-time build, then pruned probes
    val lsh = RandomHyperplaneLsh(8, 12, 42L)
    val store = LshIndexStore(lsh, 64, numPhysicalPartitions = nParts)
    val idxPath = s"target/scale-probe/lsh-index-p$nParts"
    if (!new java.io.File(s"$idxPath/table=7").isDirectory) {
      time("index build (one-time batch job)") {
        store.write(corpus, "embedding", idxPath)
      }
    } else println("SCALE index build: skipped (exists)")
    val probeRows = time("LSH probe top-5 (partition-pruned)") {
      store.search(spark, idxPath, "embedding", "vec_id", q, 5).collect()
    }
    println(s"SCALE probe head=${probeRows.take(2).mkString(", ")}")

    // (c) hierarchical NSW: one-time graph build, then stored-adjacency
    // serving (beam per shard, exact rerank)
    val hnswShards = math.max(32, (n / 10000L).toInt)
    val hnswStore = graft.index.HnswIndexStore()
    val hnswPath = "target/scale-probe/hnsw-index"
    if (!new java.io.File(s"$hnswPath/_SUCCESS").exists()) {
      time(s"HNSW graph build ($hnswShards shards, one-time batch job)") {
        hnswStore.write(corpus, "vec_id", "embedding", hnswPath, hnswShards)
      }
    } else println("SCALE HNSW build: skipped (exists)")
    val hnswRows = time("HNSW stored-graph top-5 (cold)") {
      hnswStore.search(spark, hnswPath, q, 5).collect()
    }
    time("HNSW stored-graph top-5 (warm page cache)") {
      hnswStore.search(spark, hnswPath, q, 5).collect()
    }
    println(s"SCALE hnsw head=${hnswRows.take(2).mkString(", ")}")

    // (d) product quantization: one-time train+encode (8-byte codes,
    // 32x smaller than the float corpus), then ADC serving that scans
    // codes only — never the vectors
    val pqStore = graft.index.PqIndexStore()
    val pqPath = "target/scale-probe/pq-index"
    if (!new java.io.File(s"$pqPath/codes/_SUCCESS").exists()) {
      time("PQ train+encode (one-time batch job)") {
        pqStore.write(corpus, col("vec_id"), col("embedding"), dim = 64, pqPath,
          knownCount = n)
      }
    } else println("SCALE PQ build: skipped (exists)")
    val pqRows = time("PQ ADC top-5 (cold, codes-only scan)") {
      pqStore.search(spark, pqPath, q, 5, dim = 64).collect()
    }
    time("PQ ADC top-5 (warm page cache)") {
      pqStore.search(spark, pqPath, q, 5, dim = 64).collect()
    }
    println(s"SCALE pq head=${pqRows.take(2).mkString(", ")}")

    // (e) IVF-PQ at rest: codes partitioned by coarse cluster; a query
    // scans nprobe partition directories of the compressed table
    val ivfpqStore = graft.index.IvfPqIndexStore(coarseStride = 4099L)
    val ivfpqPath = "target/scale-probe/ivfpq-index"
    if (!new java.io.File(s"$ivfpqPath/codes/_SUCCESS").exists()) {
      time("IVF-PQ build (assign + encode + partitioned write)") {
        ivfpqStore.write(corpus, col("vec_id"), col("embedding"), dim = 64, ivfpqPath,
          knownCount = n)
      }
    } else println("SCALE IVF-PQ build: skipped (exists)")
    val ivfpqRows = time("IVF-PQ pruned serve top-5 (nprobe=2)") {
      ivfpqStore.search(spark, ivfpqPath, q, 5, dim = 64, nprobe = 2).collect()
    }
    time("IVF-PQ pruned serve top-5 (warm)") {
      ivfpqStore.search(spark, ivfpqPath, q, 5, dim = 64, nprobe = 2).collect()
    }
    println(s"SCALE ivfpq head=${ivfpqRows.take(2).mkString(", ")}")

    // (f) SQ8 int8 quantization: near-exact ranking over a 4x-smaller
    // codes table — the middle of the float32/SQ8/PQ spectrum
    val sqPath = "target/scale-probe/sq-index"
    val sqScalesPath = new java.io.File(s"$sqPath/scales.txt")
    val cached: Option[Array[Double]] =
      if (!sqScalesPath.exists()) None
      else {
        // tolerate a truncated marker from a killed run: only a file
        // with exactly dim scales is a valid cache
        val ls = scala.io.Source.fromFile(sqScalesPath).getLines()
          .flatMap(l => scala.util.Try(l.toDouble).toOption).toArray
        if (ls.length == 64) Some(ls) else None
      }
    val sqScales: Array[Double] = cached.getOrElse {
      var s: Array[Double] = null
      time("SQ8 train+encode (one-time batch job)") {
        s = graft.index.SqKnn.trainScales(corpus, col("embedding"), 64)
        graft.index.SqKnn.encode(corpus, col("vec_id"), col("embedding"), s)
          .write.mode("overwrite").parquet(s"$sqPath/codes")
      }
      new java.io.File(sqPath).mkdirs()
      val tmp = new java.io.File(sqPath, "scales.txt.tmp")
      val w = new java.io.PrintWriter(tmp)
      s.foreach(w.println); w.close()
      tmp.renameTo(sqScalesPath) // atomic publish of the marker
      s
    }
    val sqRows = time("SQ8 serve top-5 (cold, codes-only scan)") {
      graft.index.SqKnn.searchEncoded(
        spark.read.parquet(s"$sqPath/codes"), q, sqScales, 5).collect()
    }
    time("SQ8 serve top-5 (warm page cache)") {
      graft.index.SqKnn.searchEncoded(
        spark.read.parquet(s"$sqPath/codes"), q, sqScales, 5).collect()
    }
    println(s"SCALE sq head=${sqRows.take(2).mkString(", ")}")
    def dirSize(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(p))
    }
    println(f"SCALE bytes corpus=${dirSize(bigPath) / 1e6}%.0f MB " +
      f"pq=${dirSize(pqPath) / 1e6}%.0f MB hnsw=${dirSize(hnswPath) / 1e6}%.0f MB")
    spark.stop()
  }
}
