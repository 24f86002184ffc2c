package graft.session

import java.util.concurrent.atomic.AtomicReference

import graft.embed.Embedder
import graft.search.{SearchResult, SearchService}
import graft.state.Engine
import org.apache.spark.sql.SparkSession

/** Commands accepted by an interactive session — the signal surface of
  * the reference's InteractiveDBWorkflow
  * (app/temporal_workflows/interactive_workflow.py:153-377).
  */
sealed trait Command
final case class AddLibrary(name: String, description: Option[String] = None) extends Command
final case class AddDocument(libraryId: String, title: String) extends Command
final case class AddChunk(libraryId: String, documentId: String, text: String,
                          metadata: Map[String, String] = Map.empty) extends Command
final case class SetQueryParams(k: Int = 5, index: String = "brute",
                                filters: Map[String, String] = Map.empty) extends Command
final case class StartQuery(libraryId: String, queryText: String) extends Command
case object CancelQuery extends Command
case object Finish extends Command

/** Observable session state (interactive_workflow.py:19-35): created
  * ids, names by id, doc titles by library, chunk counts, the
  * metadata-value catalog (distinct stringified values per key, capped
  * at 20 — interactive_workflow.py:290-304), and an append-only
  * timeline that also records errors (the session survives them,
  * interactive_workflow.py:373-377).
  */
final case class SessionState(
    libraryIds: Vector[String] = Vector.empty,
    libraryNames: Map[String, String] = Map.empty,
    documentTitles: Map[String, Vector[String]] = Map.empty,
    chunkCounts: Map[String, Int] = Map.empty,
    metadataCatalog: Map[String, Vector[String]] = Map.empty,
    queryParams: SetQueryParams = SetQueryParams(),
    lastResult: Option[SearchResult] = None,
    timeline: Vector[String] = Vector.empty,
    finished: Boolean = false)

/** Single-slot command mailbox with last-writer-wins overwrite — the
  * reference's pending-action semantics (interactive_workflow.py:225-229):
  * if a new signal arrives before the previous one is drained, the
  * previous one is silently replaced.
  */
final class CommandSlot {
  private val slot = new AtomicReference[Option[Command]](None)
  def offer(c: Command): Unit = slot.set(Some(c))
  def drain(): Option[Command] = slot.getAndSet(None)
}

/** The interactive session state machine. Apply order, state fields and
  * error tolerance mirror the reference loop; the 3 s pacing sleep and
  * Temporal transport are infrastructure, not semantics, and are
  * omitted (callers can pace).
  *
  * Embedding on chunk add is unconditional (interactive_workflow.py:107-111)
  * and LSH parameters on queries are pinned to 8/12
  * (interactive_workflow.py:326-327).
  */
final class InteractiveSession(spark: SparkSession, embedder: Embedder) {

  val engine = new Engine()
  private val service = new SearchService(spark, engine, Some(embedder))
  private val stateRef = new AtomicReference[SessionState](SessionState())
  val mailbox = new CommandSlot()

  def status: SessionState = stateRef.get()
  def partialResults: Option[SearchResult] = stateRef.get().lastResult

  /** Drain and apply the pending command, if any. Returns whether a
    * command was processed. Errors are recorded to the timeline and the
    * session keeps running.
    */
  def step(): Boolean = mailbox.drain() match {
    case None => false
    case Some(cmd) =>
      val s = stateRef.get()
      val s2 =
        try applyCommand(s, cmd)
        catch { case e: Throwable =>
          s.copy(timeline = s.timeline :+ s"error: ${e.getMessage}")
        }
      stateRef.set(s2)
      true
  }

  /** Offer-and-drain convenience: apply one command synchronously
    * (what a paced driver loop does per 3 s tick in the reference). */
  def submit(c: Command): SessionState = { mailbox.offer(c); step(); status }

  private def applyCommand(s: SessionState, cmd: Command): SessionState = cmd match {
    case AddLibrary(name, desc) =>
      val lib = engine.createLibrary(name, desc)
      s.copy(
        libraryIds = s.libraryIds :+ lib.id,
        libraryNames = s.libraryNames + (lib.id -> name),
        timeline = s.timeline :+ s"add_library ${lib.id}")

    case AddDocument(libId, title) =>
      val doc = engine.addDocument(libId, title)
      s.copy(
        documentTitles = s.documentTitles.updated(libId,
          s.documentTitles.getOrElse(libId, Vector.empty) :+ title),
        timeline = s.timeline :+ s"add_document ${doc.id}")

    case AddChunk(libId, docId, text, metadata) =>
      // embeds unconditionally, like interactive_workflow.py:107-111
      val chunk = engine.addChunk(libId, docId, text, Some(embedder.embed(text)), metadata)
      val catalog = metadata.foldLeft(s.metadataCatalog) { case (cat, (key, value)) =>
        val vs = cat.getOrElse(key, Vector.empty)
        if (vs.contains(value) || vs.size >= 20) cat // cap at 20 samples
        else cat.updated(key, vs :+ value)
      }
      s.copy(
        chunkCounts = s.chunkCounts.updated(libId, s.chunkCounts.getOrElse(libId, 0) + 1),
        metadataCatalog = catalog,
        timeline = s.timeline :+ s"add_chunk ${chunk.id}")

    case p: SetQueryParams =>
      s.copy(queryParams = p, timeline = s.timeline :+ "set_query_params")

    case StartQuery(libId, queryText) =>
      val p = s.queryParams
      val res = service.search(libId, queryText = Some(queryText), k = p.k,
        index = p.index, lshTables = 8, lshPlanes = 12, filters = p.filters)
      // rerank hook is identity (query_workflow.py:248-259), then
      // re-trim to k (interactive_workflow.py:346-349)
      val trimmed = res.copy(hits = res.hits.take(p.k))
      s.copy(lastResult = Some(trimmed), timeline = s.timeline :+ s"query $libId")

    case CancelQuery =>
      s.copy(timeline = s.timeline :+ "cancel_query") // no-op like the stub (query_workflow.py:354-361)

    case Finish =>
      s.copy(finished = true, timeline = s.timeline :+ "finish")
  }
}
