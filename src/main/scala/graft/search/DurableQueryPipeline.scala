package graft.search

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.embed.Embedder
import graft.state.Engine
import org.apache.spark.sql.SparkSession

/** Mid-pipeline durability for [[QueryPipeline]] — the missing piece
  * of the reference's Temporal path (query_workflow.py:266-340):
  * Temporal journals every activity result, so a worker that dies
  * between activities REPLAYS completed ones from history instead of
  * re-executing them. This class is that event-history pattern without
  * the Temporal server: each stage's output is appended to a per-
  * workflow JSON journal (atomic tmp-file + move), and a new pipeline
  * instance pointed at the same journal resumes — completed stages
  * are deserialized, remaining stages execute.
  *
  * What this buys at scale: the expensive stages (embedding — a paid
  * network call via [[graft.embed.HttpEmbedder]] — and the search
  * itself) run AT MOST ONCE per workflow id even across driver
  * crashes, and the setup stage's engine mutations are not re-applied
  * on retry (Temporal's exactly-once-per-history guarantee, which
  * plain re-running the synchronous pipeline cannot give).
  *
  * The journal is driver-local by design — one small file per
  * workflow, the same durability domain as a Temporal history shard;
  * pointing `journalDir` at shared storage extends it across machines.
  */
final class DurableQueryPipeline(spark: SparkSession, engine: Engine,
                                 embedder: Embedder, journalDir: String,
                                 onStageCommitted: String => Unit = _ => ()) {

  private val mapper = new ObjectMapper
  private val delegate = new QueryPipeline(spark, engine, embedder)
  // the delegate's service (and IndexCache) IS this pipeline's service:
  // constructing a second one would double-build LSH indexes for the
  // same libraries when both pipelines run over one engine
  private def service: SearchService = delegate.service

  private def journalPath(workflowId: String): Path = {
    require(workflowId.matches("[A-Za-z0-9._-]+"), s"unsafe workflow id: $workflowId")
    Paths.get(journalDir, s"$workflowId.json")
  }

  private def readJournal(workflowId: String): ObjectNode = {
    val p = journalPath(workflowId)
    if (Files.exists(p))
      mapper.readTree(Files.readAllBytes(p)).asInstanceOf[ObjectNode]
    else mapper.createObjectNode()
  }

  /** Atomic append: write whole journal to a tmp file, move into
    * place. A crash mid-write leaves the previous journal intact —
    * the stage simply re-executes on resume (at-least-once per stage,
    * exactly-once once the move lands; same contract as Temporal's
    * history append).
    */
  private def commit(workflowId: String, journal: ObjectNode, stage: String,
                     value: ObjectNode): Unit = {
    journal.set[ObjectNode](stage, value)
    val p = journalPath(workflowId)
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, s".$workflowId", ".tmp")
    Files.write(tmp, mapper.writeValueAsBytes(journal))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    onStageCommitted(stage)
  }

  /** Run stage `name`: replay from the journal when present, else
    * execute `body` and journal its result before returning it.
    */
  private def stage[A](workflowId: String, journal: ObjectNode, name: String)(
      body: => A)(write: A => ObjectNode)(read: ObjectNode => A): A =
    Option(journal.get(name)) match {
      case Some(node) => read(node.asInstanceOf[ObjectNode])
      case None =>
        val a = body
        commit(workflowId, journal, name, write(a))
        a
    }

  private def floatsNode(v: Array[Float]): ObjectNode = {
    val n = mapper.createObjectNode()
    val arr = n.putArray("v")
    v.foreach(arr.add)
    n
  }
  private def floatsOf(n: ObjectNode): Array[Float] = {
    val arr = n.get("v")
    Array.tabulate(arr.size())(i => arr.get(i).floatValue())
  }

  def run(workflowId: String,
          libraryId: String,
          queryText: Option[String] = None,
          queryEmbedding: Option[Array[Float]] = None,
          k: Int = 5,
          index: String = "brute"): PipelineResult = {
    val journal = readJournal(workflowId)

    // stage 1: setup (idempotent in the reference, but journaling it
    // means a resume does not even re-run the idempotence check, and
    // a library CREATED by a crashed run keeps its id on resume).
    // The replayed libId is only meaningful if the engine still holds
    // that library: the journal file outlives the in-memory engine, so
    // a resume in a FRESH process (the real driver-crash case) would
    // otherwise replay an id the new engine has never seen and every
    // subsequent run would die in the search stage. Replay therefore
    // validates against the engine and falls back to re-executing the
    // idempotent setup (re-journaling the new id) when the state is
    // gone. The SEARCH stage's journaled hits reference engine state
    // too (library_id / chunk_id / libraryVersion of the dead
    // engine), so an invalidated setup also drops the journaled
    // search — it re-executes against the re-seeded library.
    // Validate and embed are pure VALUES and still replay: the paid
    // embed call is never re-bought.
    val (libId, setup) = {
      val replayed = Option(journal.get("setup")).map { n0 =>
        val n = n0.asInstanceOf[ObjectNode]
        (n.get("libId").asText(), n.get("tag").asText())
      }.filter { case (id, _) => engine.listLibraries().exists(_.id == id) }
      replayed.getOrElse {
        journal.remove("search") // stale: points at the dead engine's entities
        val a = delegate.setupTestData(libraryId)
        val n = mapper.createObjectNode()
        n.put("libId", a._1); n.put("tag", a._2)
        commit(workflowId, journal, "setup", n)
        a
      }
    }

    // stage 2: validate (cheap, but journaled so a query that was
    // valid when first accepted replays as valid — Temporal's
    // history-wins determinism)
    stage(workflowId, journal, "validate") {
      delegate.validate(queryText, queryEmbedding, k, index) match {
        case Left(err) => throw new IllegalArgumentException(err)
        case Right(()) => "passed"
      }
    } { s => val n = mapper.createObjectNode(); n.put("status", s); n } {
      _.get("status").asText()
    }

    // stage 3: embed — the paid stage; never re-bought on resume
    val (emb, embedded) = stage(workflowId, journal, "embed") {
      queryEmbedding match {
        case Some(v) => (v, false)
        case None => (embedder.embed(queryText.get), true)
      }
    } { case (v, flag) =>
      val n = floatsNode(v); n.put("generated", flag); n
    } { n => (floatsOf(n), n.get("generated").asBoolean()) }

    // stage 4: search
    val res = stage(workflowId, journal, "search") {
      service.search(libId, queryEmbedding = Some(emb), k = k, index = index)
    } { r =>
      val n = mapper.createObjectNode()
      n.put("index", r.index); n.put("libraryVersion", r.libraryVersion)
      val hits = n.putArray("hits")
      r.hits.foreach { h =>
        val hn = hits.addObject()
        hn.put("chunk_id", h.chunk_id); hn.put("document_id", h.document_id)
        hn.put("library_id", h.library_id); hn.put("text", h.text)
        hn.put("score", h.score)
        val mn = hn.putObject("metadata")
        h.metadata.foreach { case (k2, v2) => mn.put(k2, v2) }
      }
      n
    } { n =>
      val hits = n.get("hits")
      SearchResult(
        hits = (0 until hits.size()).map { i =>
          val h = hits.get(i)
          val mn = h.get("metadata")
          val meta = {
            val it = mn.fieldNames()
            val b = Map.newBuilder[String, String]
            while (it.hasNext) { val k2 = it.next(); b += (k2 -> mn.get(k2).asText()) }
            b.result()
          }
          Hit(h.get("chunk_id").asText(), h.get("document_id").asText(),
            h.get("library_id").asText(), h.get("text").asText(), meta,
            h.get("score").asDouble())
        },
        index = n.get("index").asText(),
        indexUsed = None,
        libraryVersion = n.get("libraryVersion").asInt())
    }

    // stage 5: rerank (identity hook, O15) — result assembly only
    PipelineResult(res.hits, res.index, res.libraryVersion,
      setup = setup, validation = "passed",
      embeddingGenerated = embedded, durableExecution = true)
  }
}
