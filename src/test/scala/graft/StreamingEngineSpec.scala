package graft

import graft.embed.HashingEmbedder
import graft.search.SearchService
import graft.session.{CommandRow, StreamingEngine}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingEngineSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("command stream drives engine CRUD; state queryable + searchable after drain") {
    val se = new StreamingEngine(spark, HashingEmbedder(dim = 16))
    val mem = MemoryStream[CommandRow](spark)
    val q = se.attach(mem.toDS())
    try {
      mem.addData(
        CommandRow(1, "add_library", libraryId = "lib1", name = "stream-lib"),
        CommandRow(2, "add_document", libraryId = "lib1", documentId = "doc1", title = "d"),
        CommandRow(3, "add_chunk", libraryId = "lib1", documentId = "doc1",
          chunkId = "c1", text = "eiffel tower paris", metaType = "landmark"),
        CommandRow(4, "add_chunk", libraryId = "lib1", documentId = "doc1",
          chunkId = "c2", text = "london big ben", metaType = "landmark"))
      q.processAllAvailable()
      assert(se.engine.getLibrary("lib1").version == 3) // doc + 2 chunks
      assert(se.engine.listChunks("lib1", "doc1").map(_.id) == Vector("c1", "c2"))

      // second batch: delete + an invalid command (must be skipped, not fatal)
      mem.addData(
        CommandRow(5, "delete_chunk", libraryId = "lib1", documentId = "doc1", chunkId = "c2"),
        CommandRow(6, "add_document", libraryId = "no-such-lib", documentId = "dx", title = "x"),
        CommandRow(7, "add_chunk", libraryId = "lib1", documentId = "doc1",
          chunkId = "c3", text = "statue of liberty new york", metaType = "landmark"))
      q.processAllAvailable()
      assert(se.engine.listChunks("lib1", "doc1").map(_.id) == Vector("c1", "c3"))
      assert(se.errors.exists(_.contains("no-such-lib")))
      assert(se.engine.getLibrary("lib1").version == 5)

      // the drained state serves searches like any engine
      val svc = new SearchService(spark, se.engine, Some(HashingEmbedder(dim = 16)))
      val res = svc.search("lib1", queryText = Some("eiffel tower paris"), k = 1)
      assert(res.hits.head.text == "eiffel tower paris")
      assert(res.libraryVersion == 5)
    } finally q.stop()
  }

  test("at-least-once replay is idempotent: re-delivered commands do not duplicate entities") {
    val se = new StreamingEngine(spark, HashingEmbedder(dim = 16))
    val mem = MemoryStream[CommandRow](spark)
    val q = se.attach(mem.toDS())
    try {
      val cmds = Seq(
        CommandRow(1, "add_library", libraryId = "lib1", name = "l"),
        CommandRow(2, "add_document", libraryId = "lib1", documentId = "doc1", title = "d"),
        CommandRow(3, "add_chunk", libraryId = "lib1", documentId = "doc1",
          chunkId = "c1", text = "hello world"))
      mem.addData(cmds: _*)
      q.processAllAvailable()
      val v1 = se.engine.getLibrary("lib1").version
      // simulate a replayed micro-batch (foreachBatch is at-least-once)
      mem.addData(cmds: _*)
      q.processAllAvailable()
      assert(se.engine.listLibraries().count(_.id == "lib1") == 1)
      assert(se.engine.listChunks("lib1", "doc1").map(_.id) == Vector("c1"))
      assert(se.engine.getLibrary("lib1").version == v1) // replay applied nothing
      assert(se.lastAppliedSeq == 3)
    } finally q.stop()
  }

  test("out-of-seq-order arrival across batches is applied, not mistaken for replay") {
    val se = new StreamingEngine(spark, HashingEmbedder(dim = 16))
    val mem = MemoryStream[CommandRow](spark)
    val q = se.attach(mem.toDS())
    try {
      // batch 1 delivers seqs {1, 3}; batch 2 delivers the straggler seq 2
      mem.addData(
        CommandRow(1, "add_library", libraryId = "lib1", name = "l"),
        CommandRow(3, "add_document", libraryId = "lib1", documentId = "doc-late", title = "d3"))
      q.processAllAvailable()
      mem.addData(
        CommandRow(2, "add_document", libraryId = "lib1", documentId = "doc-early", title = "d2"))
      q.processAllAvailable()
      assert(se.engine.listDocuments("lib1").map(_.id).toSet == Set("doc-late", "doc-early"))
      // but an exact replay of seq 2 is still skipped
      mem.addData(
        CommandRow(2, "add_document", libraryId = "lib1", documentId = "doc-early", title = "d2"))
      q.processAllAvailable()
      assert(se.engine.listDocuments("lib1").size == 2)
    } finally q.stop()
  }
}
