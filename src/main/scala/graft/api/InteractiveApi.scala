package graft.api

import java.net.InetSocketAddress
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.embed.Embedder
import graft.session._
import org.apache.spark.sql.SparkSession

/** The reference's 10 /interactive routes (app/api/routers/interactive.py)
  * over [[InteractiveSession]]: start a long-lived session, drive it
  * with signals, poll status/results. Commands go through the
  * single-slot last-writer-wins mailbox and are drained synchronously
  * per request (the reference's 3 s pacing loop is Temporal
  * infrastructure; the coalescing semantics live in the mailbox).
  * cancel/finish on an already-finished session are idempotent success,
  * like interactive.py:194-223.
  */
final class InteractiveApi(spark: SparkSession, embedder: Embedder) {

  private val mapper = new ObjectMapper()
  private val sessions = new ConcurrentHashMap[String, InteractiveSession]()
  private var server: HttpServer = _

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/interactive", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def respond(ex: HttpExchange, status: Int, body: JsonNode): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def error(msg: String): ObjectNode = {
    val o = mapper.createObjectNode(); o.put("detail", msg); o
  }

  private def readBody(ex: HttpExchange): JsonNode = {
    val bytes = ex.getRequestBody.readAllBytes()
    if (bytes.isEmpty) mapper.createObjectNode() else mapper.readTree(bytes)
  }

  private def text(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText())

  private def statusJson(s: SessionState): ObjectNode = {
    val o = mapper.createObjectNode()
    val libs = o.putArray("library_ids")
    s.libraryIds.foreach(libs.add)
    val names = o.putObject("library_names")
    s.libraryNames.foreach { case (k, v) => names.put(k, v) }
    val counts = o.putObject("chunk_counts")
    s.chunkCounts.foreach { case (k, v) => counts.put(k, v) }
    val cat = o.putObject("metadata_catalog")
    s.metadataCatalog.foreach { case (k, vs) =>
      val a = cat.putArray(k); vs.foreach(a.add)
    }
    val tl = o.putArray("timeline")
    s.timeline.foreach(tl.add)
    o.put("finished", s.finished)
    o
  }

  private def resultsJson(s: InteractiveSession): ObjectNode = {
    val o = mapper.createObjectNode()
    s.partialResults match {
      case None => o.putNull("results")
      case Some(res) =>
        val r = o.putObject("results")
        val hits = r.putArray("hits")
        res.hits.foreach { h =>
          val ho = hits.addObject()
          ho.put("chunk_id", h.chunk_id).put("text", h.text).put("score", h.score)
          val hm = ho.putObject("metadata")
          h.metadata.foreach { case (k, v) => hm.put(k, v) }
        }
        r.put("index", res.index)
        res.indexUsed.foreach(r.put("index_used", _))
        r.put("library_version", res.libraryVersion)
    }
    o
  }

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val segs = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/").split("/").toList
    try {
      (method, segs) match {
        case ("POST", List("interactive", "start")) =>
          val id = s"interactive-session-${UUID.randomUUID()}"
          sessions.put(id, new InteractiveSession(spark, embedder))
          val o = mapper.createObjectNode()
          o.put("workflow_id", id).put("status", "started")
          respond(ex, 200, o)

        case (_, "interactive" :: id :: rest) =>
          val session = sessions.get(id)
          if (session == null) { respond(ex, 404, error("session not found")); return }
          (method, rest) match {
            case ("GET", List("status")) => respond(ex, 200, statusJson(session.status))
            case ("GET", List("results")) => respond(ex, 200, resultsJson(session))
            case ("POST", List("add_library")) =>
              val b = readBody(ex)
              text(b, "name") match {
                case None => respond(ex, 400, error("name is required"))
                case Some(name) =>
                  session.submit(AddLibrary(name, text(b, "description")))
                  respond(ex, 200, statusJson(session.status))
              }
            case ("POST", List("add_document")) =>
              val b = readBody(ex)
              (text(b, "library_id"), text(b, "title")) match {
                case (Some(lib), Some(title)) =>
                  session.submit(AddDocument(lib, title))
                  respond(ex, 200, statusJson(session.status))
                case _ => respond(ex, 400, error("library_id and title required"))
              }
            case ("POST", List("add_chunk")) =>
              val b = readBody(ex)
              (text(b, "library_id"), text(b, "document_id"), text(b, "text")) match {
                case (Some(lib), Some(doc), Some(t)) =>
                  val meta = Option(b.get("metadata")).filterNot(_.isNull).map { m =>
                    val it = m.fields()
                    val mm = scala.collection.mutable.Map.empty[String, String]
                    while (it.hasNext) { val e = it.next(); mm += e.getKey -> e.getValue.asText() }
                    mm.toMap
                  }.getOrElse(Map.empty[String, String])
                  session.submit(AddChunk(lib, doc, t, meta))
                  respond(ex, 200, statusJson(session.status))
                case _ => respond(ex, 400, error("library_id, document_id and text required"))
              }
            case ("POST", List("set_query_params")) =>
              val b = readBody(ex)
              val filters = Option(b.get("filters")).filterNot(_.isNull).map { f =>
                val it = f.fields()
                val m = scala.collection.mutable.Map.empty[String, String]
                while (it.hasNext) { val e = it.next(); m += e.getKey -> e.getValue.asText() }
                m.toMap
              }.getOrElse(Map.empty[String, String])
              session.submit(SetQueryParams(
                k = Option(b.get("k")).map(_.asInt()).getOrElse(5),
                index = text(b, "index").getOrElse("brute"),
                filters = filters))
              respond(ex, 200, statusJson(session.status))
            case ("POST", List("start_query")) =>
              val b = readBody(ex)
              (text(b, "library_id"), text(b, "query_text")) match {
                case (Some(lib), Some(q)) =>
                  session.submit(StartQuery(lib, q))
                  respond(ex, 200, resultsJson(session))
                case _ => respond(ex, 400, error("library_id and query_text required"))
              }
            case ("POST", List("cancel")) =>
              session.submit(CancelQuery) // idempotent, like interactive.py:194-204
              respond(ex, 200, mapper.createObjectNode().put("status", "cancelled"))
            case ("POST", List("finish")) =>
              session.submit(Finish) // idempotent success even when already finished
              respond(ex, 200, mapper.createObjectNode().put("status", "finished"))
            case _ => respond(ex, 404, error("no such route"))
          }
        case _ => respond(ex, 404, error("no such route"))
      }
    } catch {
      case e: Throwable => respond(ex, 500, error(e.toString))
    }
  }
}
