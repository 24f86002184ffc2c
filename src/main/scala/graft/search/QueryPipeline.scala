package graft.search

import graft.embed.Embedder
import graft.state.Engine
import org.apache.spark.sql.SparkSession

/** Response of the staged pipeline: the search envelope plus the
  * execution metadata the reference's QueryWorkflow attaches
  * (query_workflow.py:331-340: {setup, validation, embedding_generated})
  * and the durable_execution flag the route adds (search.py:68-74).
  * Mirrors the reference quirk that the durable envelope carries `index`
  * but not `index_used` (search.py:69-71).
  */
final case class PipelineResult(hits: Seq[Hit], index: String, libraryVersion: Int,
                                setup: String, validation: String,
                                embeddingGenerated: Boolean,
                                durableExecution: Boolean)

/** The reference's 5-step durable query pipeline (O26,
  * app/temporal_workflows/query_workflow.py:266-340) re-expressed as a
  * synchronous staged execution: setup → validate → (embed iff
  * text-only) → search → rerank. Temporal's durability is
  * infrastructure, not query semantics — on Spark the analog is simply
  * that every stage is a deterministic function of engine state, so a
  * re-run after failure reproduces the same result (and streaming
  * checkpointing covers the long-lived-session case, see
  * [[graft.streaming.EventStreams]]).
  */
final class QueryPipeline(spark: SparkSession, engine: Engine, embedder: Embedder) {

  // visible to DurableQueryPipeline so the durable twin reuses this
  // service (and its IndexCache) instead of building a second pair
  // that would re-build LSH indexes for the same libraries
  private[search] val service = new SearchService(spark, engine, Some(embedder),
    indexCache = Some(new graft.index.IndexCache()))

  /** Idempotent demo seeding (O28, query_workflow.py:45-168): library
    * with chunks → no-op; library without chunks → add doc + 2 embedded
    * chunks; missing library → create it fresh. Returns the (possibly
    * new) library id — non-existent ids are replaced and echoed back so
    * the caller re-targets, like query_workflow.py:122-131.
    */
  def setupTestData(libraryId: String): (String, String) = {
    val existing = engine.listLibraries().find(_.id == libraryId)
    existing match {
      case Some(lib) if engine.state.chunks.exists(_.library_id == lib.id) =>
        (lib.id, "exists")
      case Some(lib) =>
        seedChunks(lib.id)
        (lib.id, "seeded")
      case None =>
        val lib = engine.createLibrary("Test Library")
        seedChunks(lib.id)
        (lib.id, "created")
    }
  }

  private def seedChunks(libId: String): Unit = {
    val doc = engine.addDocument(libId, "Test Document")
    Seq("the quick brown fox", "jumps over the lazy dog").foreach { t =>
      engine.addChunk(libId, doc.id, t, Some(embedder.embed(t)))
    }
  }

  /** Validation stage (O25): the same rejections the reference enforces
    * at route + service + activity layers (query_workflow.py:171-195).
    */
  def validate(queryText: Option[String], queryEmbedding: Option[Array[Float]],
               k: Int, index: String): Either[String, Unit] =
    if (queryText.isEmpty && queryEmbedding.isEmpty)
      Left("query_text or query_embedding required")
    else if (k <= 0) Left("k must be positive")
    else if (index != "brute" && index != "lsh") Left(s"unknown index: $index")
    else Right(())

  def run(libraryId: String,
          queryText: Option[String] = None,
          queryEmbedding: Option[Array[Float]] = None,
          k: Int = 5,
          index: String = "brute"): PipelineResult = {
    val (libId, setup) = setupTestData(libraryId)
    validate(queryText, queryEmbedding, k, index) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(()) =>
    }
    val (emb, embedded) = queryEmbedding match {
      case Some(v) => (v, false)
      case None => (embedder.embed(queryText.get), true) // embed stage runs only for text queries
    }
    val res = service.search(libId, queryEmbedding = Some(emb), k = k, index = index)
    // rerank stage is the identity hook (O15)
    PipelineResult(res.hits, res.index, res.libraryVersion,
      setup = setup, validation = "passed",
      embeddingGenerated = embedded, durableExecution = true)
  }
}
