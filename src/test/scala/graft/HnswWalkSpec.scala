package graft

import graft.index.{Hnsw, HnswIndexStore, HnswWalk}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HnswWalkSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("persisted walk matches an independent replay from the raw parquet") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val query = emb.where(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val dir = java.nio.file.Files.createTempDirectory("hnsw-walk-spec-").toFile
    try {
      val rows = HnswWalk.persistedWalk(spark, emb.where(col("vec_id") =!= 0),
        "vec_id", "embedding", query, dir.toString)

      // independent replay: read the store parquet WITHOUT reconstruct(),
      // build plain maps, re-make every argmax / move / descend decision
      val stored = spark.read.parquet(dir.toString)
        .select(col("node_idx"), col("id"), col("embedding"), col("neighbors"))
        .collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Float](2).toArray,
          r.getSeq[scala.collection.Seq[Int]](3).map(_.toArray).toArray)))
        .toMap
      val n = stored.size
      def idOf(i: Int) = stored(i)._1
      def score(i: Int) = cosine(stored(i)._2, query)
      def nbs(i: Int, l: Int): Array[Int] = {
        val lv = stored(i)._3; if (l < lv.length) lv(l) else Array.empty
      }
      val replay = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      var cur = 0; var curS = score(0); var step = 0L
      var l = Hnsw.MaxLevel
      replay += ((step, l.toLong, idOf(cur), curS))
      while (l >= 0) {
        var moved = true
        while (moved) {
          moved = false
          val cand = nbs(cur, l)
          if (cand.nonEmpty) {
            val (bi, bs) = cand.map(nb => (nb, score(nb)))
              .minBy { case (i, s) => (-s, i) }
            if (bs > curS || (bs == curS && bi < cur)) {
              cur = bi; curS = bs; step += 1; moved = true
              replay += ((step, l.toLong, idOf(cur), curS))
            }
          }
        }
        l -= 1
        if (l >= 0) { step += 1; replay += ((step, l.toLong, idOf(cur), curS)) }
      }
      assert(rows.map(r => (r.step, r.layer, r.node_id, r.score)) == replay.toSeq)
      assert(n > 100) // the walk ran over the real corpus, not a stub

      // every state's emitted neighbor list is exactly the stored one
      val byId = stored.values.map { case (id, _, lv) => id -> lv }.toMap
      rows.foreach { r =>
        val lv = byId(r.node_id)
        val want = if (r.layer < lv.length) lv(r.layer.toInt).map(idOf(_).toLong).toSeq else Seq.empty
        assert(r.nb_ids.toSeq == want, s"state ${r.step}")
      }
    } finally {
      TestSpark.rmTree(dir)
    }
  }

  test("walk shape: starts at top layer, layers never increase, scores never decrease") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val query = emb.where(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val dir = java.nio.file.Files.createTempDirectory("hnsw-walk-shape-").toFile
    try {
      val rows = HnswWalk.persistedWalk(spark, emb.where(col("vec_id") =!= 0),
        "vec_id", "embedding", query, dir.toString)
      assert(rows.head.step == 0 && rows.head.layer == Hnsw.MaxLevel)
      assert(rows.last.layer == 0)
      assert(rows.map(_.step) == rows.indices.map(_.toLong)) // contiguous
      rows.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.layer == a.layer || b.layer == a.layer - 1)
          assert(b.score >= a.score || b.layer < a.layer)
          if (b.layer == a.layer) assert(b.score > a.score ||
            (b.score == a.score && b.node_id < a.node_id))
        case _ =>
      }
      // the walk visits every layer exactly once on the way down
      assert(rows.map(_.layer).distinct == (Hnsw.MaxLevel to 0 by -1).map(_.toLong))
    } finally {
      TestSpark.rmTree(dir)
    }
  }

  test("gate query emits the rounded trace in step order") {
    val df = Queries.annHnswWalk(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("step", "layer", "node_id", "score"))
    val rows = df.as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.head._1 == 0L)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
  }
}
