package graft.session

import graft.embed.Embedder
import graft.state.Engine
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Flat, encoder-friendly command record for the streaming control
  * plane. `seq` totally orders commands (mutations must replay in
  * order); unused fields stay null.
  */
final case class CommandRow(
    seq: Long,
    kind: String, // add_library | add_document | add_chunk | delete_library | delete_document | delete_chunk
    libraryId: String = null,
    documentId: String = null,
    chunkId: String = null,
    name: String = null,
    title: String = null,
    text: String = null,
    metaType: String = null)

/** Structured Streaming wrapper for engine CRUD (the full O27 shape):
  * an unbounded command stream drains through `foreachBatch`, each
  * micro-batch applied to the engine snapshot in `seq` order.
  *
  * Control-plane messages are tiny (ids + text), so collecting a
  * micro-batch to the driver is the right shape — the heavy work
  * (embedding) fans back out through the embedder, and the *data*
  * plane (search over chunks) stays distributed. Checkpointing the
  * stream + replaying commands in `seq` order gives the
  * durable-execution story Temporal provided in the reference, with
  * the engine's snapshot-swap making every batch atomic to readers.
  *
  * Errors are recorded and skipped (the session must survive bad
  * commands, interactive_workflow.py:373-377).
  */
final class StreamingEngine(spark: SparkSession, embedder: Embedder) {

  val engine = new Engine()
  @volatile private var errorLog: Vector[String] = Vector.empty
  def errors: Vector[String] = errorLog

  /** Highest command seq already applied. foreachBatch is at-least-once
    * (a failed/restarted micro-batch is replayed in full), so replayed
    * rows with seq <= lastApplied are filtered out rather than
    * re-applied — without this, non-idempotent adds would duplicate
    * entities on every replay. Deletes are naturally idempotent; adds
    * with explicit ids are additionally guarded by an existence check
    * so a replay that races the watermark is still a no-op.
    */
  @volatile private var lastApplied: Long = Long.MinValue
  def lastAppliedSeq: Long = lastApplied

  private def applyRow(c: CommandRow): Unit = c.kind match {
    case "add_library" =>
      val exists = Option(c.libraryId).exists(id => engine.listLibraries().exists(_.id == id))
      if (!exists) engine.createLibrary(c.name, id = Option(c.libraryId))
    case "add_document" =>
      val exists = Option(c.documentId).exists(id =>
        engine.listDocuments(c.libraryId).exists(_.id == id))
      if (!exists) engine.addDocument(c.libraryId, c.title, id = Option(c.documentId))
    case "add_chunk" =>
      val exists = Option(c.chunkId).exists(id =>
        engine.listChunks(c.libraryId, c.documentId).exists(_.id == id))
      if (!exists) engine.addChunk(c.libraryId, c.documentId, c.text,
        Some(embedder.embed(c.text)),
        Option(c.metaType).map(t => Map("type" -> t)).getOrElse(Map.empty),
        id = Option(c.chunkId))
    case "delete_library" => engine.deleteLibrary(c.libraryId)
    case "delete_document" => engine.deleteDocument(c.libraryId, c.documentId)
    case "delete_chunk" => engine.deleteChunk(c.libraryId, c.documentId, c.chunkId)
    case other => throw new IllegalArgumentException(s"unknown command kind: $other")
  }

  /** Start draining a streaming command source into the engine. */
  def attach(commands: Dataset[CommandRow],
             checkpointDir: Option[String] = None): StreamingQuery = {
    var w = commands.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.foreachBatch { (batch: Dataset[CommandRow], _: Long) =>
      batch.orderBy("seq").collect().foreach { c =>
        if (c.seq > lastApplied) {
          try applyRow(c)
          catch { case e: Throwable =>
            errorLog = errorLog :+ s"seq=${c.seq} ${c.kind}: ${e.getMessage}"
          }
          lastApplied = c.seq // failed commands are recorded, never retried (interactive_workflow.py:373-377)
        }
      }
    }.start()
  }
}
