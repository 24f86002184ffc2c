package graft

import graft.index.PqKnn
import org.apache.spark.sql.functions.{col, round}
import org.scalatest.funsuite.AnyFunSuite

class PqKnnSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)

  test("codes are m bytes and deterministic across runs") {
    val cb = PqKnn.train(emb, col("vec_id"), col("embedding"), dim = 64, m = 8, k = 16)
    val codes1 = PqKnn.encode(emb, col("vec_id"), col("embedding"), cb)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val codes2 = PqKnn.encode(emb, col("vec_id"), col("embedding"), cb)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(codes1.length == 500)
    assert(codes1.forall(_._2.length == 8))
    assert(codes1.map(_._2.toSeq).toSeq == codes2.map(_._2.toSeq).toSeq)
  }

  test("ADC score equals the sum of table lookups for the row's code") {
    val q = Queries.queryVec(spark, sfDir)
    val cb = PqKnn.train(emb, col("vec_id"), col("embedding"), dim = 64)
    val table = PqKnn.adcTable(q, cb)
    val codes = PqKnn.encode(emb, col("vec_id"), col("embedding"), cb)
    val got = PqKnn.searchEncoded(codes, q, cb, 5).as[(Long, Double)].collect()
    val codeMap = codes.as[(Long, Array[Byte])].collect().toMap
    got.foreach { case (id, s) =>
      val expected = codeMap(id).zipWithIndex.map { case (c, m) => table(m)(c & 0xFF) }.sum
      assert(math.abs(s - expected) < 1e-12)
    }
  }

  test("recall@10 vs exact brute force is at least 0.5 and self-hit is near the top") {
    val q = Queries.queryVec(spark, sfDir)
    val truth = graft.index.BruteForceKnn
      .search(emb, col("embedding"), col("vec_id"), q, 10)
      .select(col("vec_id")).as[Long].collect().toSet
    val pq = PqKnn.search(emb, col("vec_id"), col("embedding"), q, 10, dim = 64)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = truth.intersect(pq).size.toDouble / 10
    assert(recall >= 0.5, s"PQ recall@10 = $recall")
    // vec 0 IS the query; its reconstruction should rank in the top 10
    assert(pq.contains(0L), "query's own vector fell out of PQ top-10")
  }

  test("IVF-PQ returns k hits drawn from the probed clusters only") {
    val q = Queries.queryVec(spark, sfDir)
    val hits = PqKnn.searchIvfPq(emb, col("vec_id"), col("embedding"), q, 5, dim = 64)
      .as[(Long, Double)].collect()
    assert(hits.length == 5)
    val again = PqKnn.searchIvfPq(emb, col("vec_id"), col("embedding"), q, 5, dim = 64)
      .as[(Long, Double)].collect()
    assert(hits.toSeq == again.toSeq) // deterministic
    // every hit must be a member of the 2 probed coarse clusters
    val cents = graft.index.IvfKnn.centroids(emb, col("vec_id"), col("embedding"), 53L)
    val assigned = graft.index.IvfKnn.assign(emb, col("embedding"), cents)
      .select(col("vec_id"), col("cluster_id")).as[(Long, Long)].collect().toMap
    val clustersHit = hits.map(h => assigned(h._1)).toSet
    assert(clustersHit.size <= 2, s"hits spanned clusters $clustersHit")
  }

  test("recall report covers pq and sq when supplied; sq is near-exact") {
    val q = Queries.annRecall(spark, sfDir)
      .as[(String, Int, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(q.keySet == Set("lsh", "lsh_mp", "ivf", "pq", "sq"))
    assert(q("pq") > 0.0 && q("pq") <= 1.0)
    assert(q("sq") >= 0.9, s"SQ8 recall should be near-exact, got ${q("sq")}")
  }

  test("stored layout roundtrips: serve-from-disk equals transient search") {
    val q = Queries.queryVec(spark, sfDir)
    val store = graft.index.PqIndexStore()
    val path = "target/test-pq-store"
    val cb = store.write(emb, col("vec_id"), col("embedding"), dim = 64, path)
    val direct = PqKnn.searchEncoded(
        PqKnn.encode(emb, col("vec_id"), col("embedding"), cb), q, cb, 10)
      .as[(Long, Double)].collect().toSeq
    val stored = store.search(spark, path, q, 10, dim = 64)
      .as[(Long, Double)].collect().toSeq
    assert(stored == direct)
    val cb2 = store.loadCodebooks(spark, path, 64)
    assert(cb2.m == cb.m && cb2.k == cb.k)
    assert(cb2.cents.flatten.map(_.toSeq).toSeq == cb.cents.flatten.map(_.toSeq).toSeq)
  }

  test("writeSplit pins the store-owned float layout: disjoint per-file id ranges, sorted within") {
    // r16 (r15 verdict #3): the id-clustered float layout is what turns
    // the pushed shortlist IN into skipped row groups — PqServeProbe
    // measured 990k of 1M rows read without it. The STORE now writes
    // it; this spec pins the two physical properties skipping runs on:
    // (1) each float file covers a DISJOINT id range (repartitionByRange),
    // (2) ids are sorted inside each file (tight row-group min/max).
    val q = Queries.queryVec(spark, sfDir)
    val store = graft.index.PqIndexStore()
    val path = "target/test-pq-split-store"
    TestSpark.rmTree(new java.io.File(path))
    store.writeSplit(emb, col("vec_id"), col("embedding"), dim = 64, path,
      floatFiles = 4)
    val files = new java.io.File(s"$path/floats").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.length >= 2, "need multiple float files for a range-disjointness check")
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select(col("vec_id")).as[Long].collect()
      assert(ids.nonEmpty)
      assert(ids.sameElements(ids.sorted),
        s"ids not sorted within ${f.getName} — row-group min/max would overlap")
      (ids.head, ids.last)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"float files overlap in id range: hi=$hi lo2=$lo2")
      case _ =>
    }
    // and the store-owned serve (no caller-staged floats, no caller
    // conf) equals the full-float refined search
    val served = store.searchRefinedSplit(spark, path, "vec_id", "embedding",
        q, k = 5, dim = 64, candidates = 100)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
      .as[(Long, Double)].collect().toSeq
    val want = PqKnn.searchRefined(emb, col("vec_id"), col("embedding"), q,
        k = 5, dim = 64, candidates = 100)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
      .as[(Long, Double)].collect().toSeq
    assert(served == want, s"store-owned split serve diverges: $served vs $want")
    // the store raised the pushdown floor itself (requirement 2 of the
    // operating point — no caller-side conf tuning)
    assert(spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold").toInt >= 100)
  }

  test("appended delta rows are searchable with the stored codebooks") {
    val q = Queries.queryVec(spark, sfDir)
    val store = graft.index.PqIndexStore()
    val path = "target/test-pq-append"
    // build WITHOUT vec 0, then append it; it must surface at rank 1
    store.write(emb.where(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
      dim = 64, path)
    val before = store.search(spark, path, q, 1, dim = 64).as[(Long, Double)].head()
    assert(before._1 != 0L)
    store.append(emb.where(col("vec_id") === 0), col("vec_id"), col("embedding"),
      dim = 64, path)
    val after = store.search(spark, path, q, 1, dim = 64).as[(Long, Double)].head()
    assert(after._1 == 0L, s"appended query-member vector not found: $after")
  }

  test("streaming ingest encodes micro-batches into the stored layout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val q = Queries.queryVec(spark, sfDir)
    val store = graft.index.PqIndexStore()
    val path = "target/test-pq-stream"
    store.write(emb.where(col("vec_id") =!= 0), col("vec_id"), col("embedding"),
      dim = 64, path)
    val src = MemoryStream[(Long, Array[Float])](spark)
    val query = store.appendStream(src.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), dim = 64, path)
    try {
      src.addData((0L, q))
      query.processAllAvailable()
    } finally query.stop()
    val top = store.search(spark, path, q, 1, dim = 64).as[(Long, Double)].head()
    assert(top._1 == 0L, s"streamed vector not served: $top")
  }

  test("IVF-PQ store: partition-pruned serving matches the transient path") {
    val q = Queries.queryVec(spark, sfDir)
    val store = graft.index.IvfPqIndexStore()
    val path = "target/test-ivfpq-store"
    store.write(emb, col("vec_id"), col("embedding"), dim = 64, path)
    val stored = store.search(spark, path, q, 5, dim = 64, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    val transient = PqKnn.searchIvfPq(emb, col("vec_id"), col("embedding"), q, 5,
        dim = 64, stride = 53L, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(stored == transient)
    // the probe must scan only the nprobe partition directories
    val coarse = store.loadCoarse(spark, path)
    val probeIds = graft.index.IvfKnn.rankClusters(q, coarse).take(2).map(_._1)
    val probed = spark.read.parquet(s"$path/codes")
      .where(col("cluster_id").isin(probeIds.map(Long.box): _*))
    val qe = probed.queryExecution
    probed.collect()
    val scan = qe.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val totalFiles = new java.io.File(s"$path/codes").listFiles()
      .count(_.getName.startsWith("cluster_id="))
    assert(scan.metrics("numFiles").value <= 2 && totalFiles > 2,
      s"probe read ${scan.metrics("numFiles").value} files of $totalFiles partitions")
  }

  test("more centroids monotonically improve (or tie) quantization error") {
    val q = Queries.queryVec(spark, sfDir)
    def err(k: Int): Double = {
      val cb = PqKnn.train(emb, col("vec_id"), col("embedding"), dim = 64, k = k)
      // ADC self-score of the query vector: 1.0 exactly iff lossless
      val codes = PqKnn.encode(emb.where(col("vec_id") === 0),
        col("vec_id"), col("embedding"), cb)
      val s = PqKnn.searchEncoded(codes, q, cb, 1).as[(Long, Double)].head()._2
      math.abs(1.0 - s)
    }
    assert(err(32) <= err(4) + 1e-9)
  }
}
