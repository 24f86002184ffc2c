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

  /** Exact replay dedupe with BOUNDED state. foreachBatch is
    * at-least-once (a failed/restarted micro-batch is replayed in
    * full), so already-applied seqs must be skipped — but a plain
    * high-watermark would also discard genuinely-new commands that
    * arrive out of seq order ACROSS batches (multi-partition sources
    * have no cross-batch total order). So: keep the set of applied
    * seqs, pruned to the most recent `seqHorizon` entries; a command is
    * a replay iff its seq is below the retained floor or in the set.
    * Replays are batch retries of recent work, always inside the
    * horizon; the floor only ever discards seqs older than 100k
    * successors, which an ordered-log replay cannot produce.
    */
  private val seqHorizon = 100000
  private val applied = new java.util.TreeSet[java.lang.Long]()
  def lastAppliedSeq: Long =
    applied.synchronized { if (applied.isEmpty) Long.MinValue else applied.last() }
  private def markApplied(seq: Long): Unit = applied.synchronized {
    applied.add(seq)
    while (applied.size() > seqHorizon) applied.pollFirst()
  }
  private def isReplay(seq: Long): Boolean = applied.synchronized {
    if (applied.isEmpty) false
    else seq < applied.first() || applied.contains(seq)
  }

  private def applyRow(c: CommandRow): Unit = c.kind match {
    case "add_library" => engine.createLibrary(c.name, id = Option(c.libraryId))
    case "add_document" => engine.addDocument(c.libraryId, c.title, id = Option(c.documentId))
    case "add_chunk" =>
      engine.addChunk(c.libraryId, c.documentId, c.text,
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
        if (!isReplay(c.seq)) {
          try applyRow(c)
          catch { case e: Throwable =>
            errorLog = errorLog :+ s"seq=${c.seq} ${c.kind}: ${e.getMessage}"
          }
          markApplied(c.seq) // failed commands are recorded, never retried (interactive_workflow.py:373-377)
        }
      }
    }.start()
  }
}
