package graft

import graft.functions.VectorFunctions
import graft.index.{LshIndexStore, RandomHyperplaneLsh}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the r14 verdict's batched-serving claim: a driver LOOP that
  * plans one top-k query per request (the knn_serve_stream_rule /
  * _ivf serving shape — correct at gate QPS) versus ONE
  * [[graft.index.KnnJoin.lshServeBatched]] plan answering the whole
  * request batch, both probing the SAME at-rest exact-bucket
  * [[LshIndexStore]] layout with the same candidate rule, self
  * exclusion and rerank. The probe verifies the two paths return
  * IDENTICAL (neighbor, 4dp-score) lists per request before timing —
  * the speedup is only meaningful if the semantics match.
  *
  * Why the loop loses at scale: each iteration pays driver-side
  * analysis/optimization/scheduling for a plan whose execution is
  * milliseconds — serving throughput is planner-bound, and the planner
  * is a single driver. The batched form amortizes ONE plan across the
  * batch; its per-request increment is a few broadcast-hash-join rows.
  * At 100 TB with 1000 executors the same shape holds: the layout scan
  * is pruned to the union of the batch's buckets and fans out across
  * the cluster, while the loop form would serialize on the driver no
  * matter how many executors are idle.
  *
  * Usage: runMain graft.BatchedServeProbe [sfDir] [requests]
  */
object BatchedServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nReq = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lsh = RandomHyperplaneLsh(8, 12, 42L)
    val dim = 64
    val path = s"target/probe-index/serve-batched-${math.abs(sfDir.hashCode)}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      LshIndexStore(lsh, dim).write(Tables.embeddings(spark, sfDir), "embedding", path)
    val layout = spark.read.parquet(path) // FileIndex listed ONCE (serving residency)
    val requests = Tables.embeddings(spark, sfDir)
      .where(col("embedding").isNotNull && col("vec_id") < nReq)
      .select(col("vec_id"), col("embedding"))
    val reqRows = requests.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    println(s"PROBE layout=$path requests=${reqRows.length}")

    // ---- driver loop: one planned probe per request ----------------
    def loopServe(): Map[Long, Seq[(Long, Double)]] = reqRows.map { case (qid, qv) =>
      val qn = VectorFunctions.l2NormalizeArr(qv)
      val qBuckets = lsh.planes(dim).map(tp => lsh.hash(qn.toSeq, tp))
      val pruneOr = qBuckets.zipWithIndex.map { case (qb, t) =>
        col("table") === t && col("bucket_part") === math.floorMod(qb, 256)
      }.reduce(_ || _)
      val exactOr = qBuckets.zipWithIndex.map { case (qb, t) =>
        col("table") === t && col("bucket") === qb
      }.reduce(_ || _)
      val hits = layout.where(pruneOr && exactOr && col("vec_id") =!= qid)
        .dropDuplicates("vec_id")
        .withColumn("score",
          graft.expressions.CosineSimilarity(col("embedding"), typedlit(qv.toSeq)))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5)
        .select(col("vec_id"), col("score"))
        .collect()
        .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4) / 1e4)).toSeq
      qid -> hits
    }.toMap

    // ---- batched: ONE plan for the whole request set ---------------
    def batchedServe(): Map[Long, Seq[(Long, Double)]] =
      graft.index.KnnJoin.lshServeBatched(requests, layout, lsh, dim, k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e4) / 1e4))
        .groupBy(_._1)
        .map { case (q, rows) => q -> rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq }

    // semantic equivalence FIRST (also the warm-up/JIT pass for both)
    val a = loopServe(); val b = batchedServe()
    val mismatch = reqRows.map(_._1).filter(q => a.getOrElse(q, Nil) != b.getOrElse(q, Nil))
    println(s"PROBE results_match=${mismatch.isEmpty}" +
      (if (mismatch.nonEmpty) s" mismatched_q_ids=${mismatch.take(5).mkString(",")}" else ""))

    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def report(policy: String, match_ : Boolean,
               loop: () => Unit, batched: () => Unit): Unit = {
      // 2 timed reps each, alternating so ambient drift hits both arms
      val loopSecs = Seq(time(loop), time(loop))
      val batchSecs = Seq(time(batched), time(batched))
      val loopMed = loopSecs.min; val batchMed = batchSecs.min
      println(f"""{"probe":"batched_serve","policy":"$policy","sf":"$sfDir","requests":${reqRows.length},"results_match":${match_},"loop_sec":$loopMed%.3f,"loop_rps":${reqRows.length / loopMed}%.1f,"batched_sec":$batchMed%.3f,"batched_rps":${reqRows.length / batchMed}%.1f,"speedup":${loopMed / batchMed}%.1f,"loop_runs":[${loopSecs.map(s => f"$s%.3f").mkString(",")}],"batched_runs":[${batchSecs.map(s => f"$s%.3f").mkString(",")}]}""")
    }
    report("lsh_exact", mismatch.isEmpty, () => loopServe(), () => batchedServe())

    // ---- the other two registered policies (r15): same A/B shape ----
    // 1-bit multi-probe: loop widens each table's bucket to the
    // Hamming-1 ball; batched explodes the ball on the request side
    def ball(b: Int): Seq[Int] = b +: (0 until lsh.numPlanes).map(p => b ^ (1 << p))
    def loopServeMp(): Map[Long, Seq[(Long, Double)]] = reqRows.map { case (qid, qv) =>
      val qn = VectorFunctions.l2NormalizeArr(qv)
      val qBuckets = lsh.planes(dim).map(tp => lsh.hash(qn.toSeq, tp))
      val pruneOr = qBuckets.zipWithIndex.map { case (qb, t) =>
        col("table") === t && col("bucket_part").isin(
          ball(qb).map(x => math.floorMod(x, 256)).distinct.map(Int.box): _*)
      }.reduce(_ || _)
      val exactOr = qBuckets.zipWithIndex.map { case (qb, t) =>
        col("table") === t && col("bucket").isin(ball(qb).distinct.map(Int.box): _*)
      }.reduce(_ || _)
      val hits = layout.where(pruneOr && exactOr && col("vec_id") =!= qid)
        .dropDuplicates("vec_id")
        .withColumn("score",
          graft.expressions.CosineSimilarity(col("embedding"), typedlit(qv.toSeq)))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5)
        .select(col("vec_id"), col("score"))
        .collect()
        .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4) / 1e4)).toSeq
      qid -> hits
    }.toMap
    def batchedServeMp(): Map[Long, Seq[(Long, Double)]] =
      graft.index.KnnJoin.lshServeBatched(requests, layout, lsh, dim, k = 5,
          maxHamming = 1)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e4) / 1e4))
        .groupBy(_._1)
        .map { case (q, rows) => q -> rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
    val am = loopServeMp(); val bm = batchedServeMp()
    val misMp = reqRows.map(_._1).filter(q => am.getOrElse(q, Nil) != bm.getOrElse(q, Nil))
    report("lsh_mp1", misMp.isEmpty, () => loopServeMp(), () => batchedServeMp())

    // IVF: loop probes each request's top-2 clusters via a driver-side
    // centroid rank; batched ranks centroids in the plan
    val ivfPath = s"target/probe-index/serve-batched-ivf-${math.abs(sfDir.hashCode)}"
    val cents = graft.index.IvfKnn.centroids(
      Tables.embeddings(spark, sfDir), col("vec_id"), col("embedding"), 53L)
    if (!new java.io.File(ivfPath, "_SUCCESS").exists())
      graft.index.IvfIndexStore(cents)
        .write(Tables.embeddings(spark, sfDir), "embedding", ivfPath)
    val ivfLayout = spark.read.parquet(ivfPath)
    def loopServeIvf(): Map[Long, Seq[(Long, Double)]] = reqRows.map { case (qid, qv) =>
      val probeIds = graft.index.IvfKnn.rankClusters(qv, cents).take(2).map(_._1)
      val hits = ivfLayout
        .where(col("cluster_id").isin(probeIds.map(Long.box): _*) &&
          col("vec_id") =!= qid)
        .withColumn("score",
          graft.expressions.CosineSimilarity(col("embedding"), typedlit(qv.toSeq)))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5)
        .select(col("vec_id"), col("score"))
        .collect()
        .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4) / 1e4)).toSeq
      qid -> hits
    }.toMap
    def batchedServeIvf(): Map[Long, Seq[(Long, Double)]] =
      graft.index.KnnJoin.ivfServeBatched(requests, ivfLayout, cents, nprobe = 2, k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e4) / 1e4))
        .groupBy(_._1)
        .map { case (q, rows) => q -> rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
    val ai = loopServeIvf(); val bi = batchedServeIvf()
    val misIvf = reqRows.map(_._1).filter(q => ai.getOrElse(q, Nil) != bi.getOrElse(q, Nil))
    report("ivf", misIvf.isEmpty, () => loopServeIvf(), () => batchedServeIvf())

    // ---- the guaranteed-k filtered ladder (r15): the loop arm pays up
    // to two driver COUNT jobs PLUS the ranked query per request (the
    // escalation decision is driver-side); the batched arm decides all
    // escalations in one plan. Loop filter carries the self-exclusion
    // so both arms serve identical semantics.
    val ladderStore = LshIndexStore(lsh, dim)
    val ladderFilter = pmod(col("vec_id"), lit(3)) === 0
    def loopServeLadder(): Map[Long, Seq[(Long, Double)]] = reqRows.map { case (qid, qv) =>
      val hits = ladderStore.searchFilteredAdaptive(layout, "embedding", "vec_id",
          ladderFilter && col("vec_id") =!= qid, qv, 5)
        .select(col("vec_id"), col("score"))
        .collect()
        .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4) / 1e4)).toSeq
      qid -> hits
    }.toMap
    def batchedServeLadder(): Map[Long, Seq[(Long, Double)]] =
      graft.index.KnnJoin.lshServeFilteredAdaptiveBatched(requests, layout, lsh, dim,
          k = 5, userFilter = ladderFilter)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e4) / 1e4))
        .groupBy(_._1)
        .map { case (q, rows) => q -> rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
    val al = loopServeLadder(); val bl = batchedServeLadder()
    val misLad = reqRows.map(_._1).filter(q => al.getOrElse(q, Nil) != bl.getOrElse(q, Nil))
    report("filtered_adaptive", misLad.isEmpty,
      () => loopServeLadder(), () => batchedServeLadder())

    // ---- split-PQ (r16): ADC scan + union ShortlistFetch ------------
    // The loop arm serves each request through the SAME staged code
    // path with a 1-request set — identical semantics by construction,
    // so the A/B isolates exactly what batching amortizes: one codes
    // scan + one union fetch + one plan for N requests, vs N of each.
    val pqStore = graft.index.PqIndexStore()
    val pqPath = s"target/probe-index/serve-batched-pq-${math.abs(sfDir.hashCode)}"
    if (!new java.io.File(s"$pqPath/floats/_SUCCESS").exists())
      pqStore.writeSplit(Tables.embeddings(spark, sfDir).where(col("embedding").isNotNull),
        col("vec_id"), col("embedding"), dim, pqPath)
    def pqRows(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.rint(r.getDouble(3) * 1e4) / 1e4))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
    def loopServePq(): Map[Long, Seq[(Long, Double)]] = reqRows.map { case (qid, _) =>
      qid -> pqRows(pqStore.serveBatchedSplit(spark, pqPath,
        requests.where(col("vec_id") === qid), "vec_id", "embedding",
        k = 5, dim = dim, candidates = 100)).getOrElse(qid, Nil)
    }.toMap
    def batchedServePq(): Map[Long, Seq[(Long, Double)]] =
      pqRows(pqStore.serveBatchedSplit(spark, pqPath, requests,
        "vec_id", "embedding", k = 5, dim = dim, candidates = 100,
        maxFetch = nReq * 100))
    val ap = loopServePq(); val bp = batchedServePq()
    val misPq = reqRows.map(_._1).filter(q => ap.getOrElse(q, Nil) != bp.getOrElse(q, Nil))
    report("pq_split", misPq.isEmpty,
      () => loopServePq(), () => batchedServePq())

    // ---- composed IVF-PQ (r17): coarse probe per request + staged ADC
    // over the probed clusters + union ShortlistFetch. The loop arm is
    // the same staged path with a 1-request set (semantics identical by
    // construction); the batched arm amortizes the centroid-rank join,
    // the codes scan and the union fetch across the batch.
    val ivfpqPath = s"target/probe-index/serve-batched-ivfpq-${math.abs(sfDir.hashCode)}"
    val pqCb = graft.index.PqKnn.train(
      Tables.embeddings(spark, sfDir).where(col("embedding").isNotNull),
      col("vec_id"), col("embedding"), dim)
    if (!new java.io.File(ivfpqPath, "_SUCCESS").exists()) {
      val emb = Tables.embeddings(spark, sfDir).where(col("embedding").isNotNull)
      val codes = graft.index.PqKnn.encode(emb, col("vec_id"), col("embedding"), pqCb)
        .withColumnRenamed("id", "vec_id")
      graft.index.IvfKnn.assign(emb, col("embedding"), cents)
        .select(col("vec_id"), col("embedding"), col("cluster_id"))
        .join(codes, "vec_id")
        .repartition(col("cluster_id"))
        .write.mode("overwrite").partitionBy("cluster_id").parquet(ivfpqPath)
    }
    val ivfpqLayout = spark.read.parquet(ivfpqPath)
    def loopServeIvfPq(): Map[Long, Seq[(Long, Double)]] = reqRows.map { case (qid, _) =>
      qid -> pqRows(graft.index.PqKnn.serveBatchedIvfPq(spark, ivfpqLayout, cents,
        nprobe = 2, pqCb, requests.where(col("vec_id") === qid),
        "vec_id", "embedding", k = 5, candidates = 300)).getOrElse(qid, Nil)
    }.toMap
    def batchedServeIvfPq(): Map[Long, Seq[(Long, Double)]] =
      pqRows(graft.index.PqKnn.serveBatchedIvfPq(spark, ivfpqLayout, cents,
        nprobe = 2, pqCb, requests, "vec_id", "embedding", k = 5,
        candidates = 300, maxFetch = nReq * 300))
    val aip = loopServeIvfPq(); val bip = batchedServeIvfPq()
    val misIvfPq = reqRows.map(_._1).filter(q => aip.getOrElse(q, Nil) != bip.getOrElse(q, Nil))
    report("ivfpq", misIvfPq.isEmpty,
      () => loopServeIvfPq(), () => batchedServeIvfPq())
    spark.stop()
  }
}
