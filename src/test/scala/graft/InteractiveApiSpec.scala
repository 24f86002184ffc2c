package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import graft.api.InteractiveApi
import graft.embed.HashingEmbedder
import org.scalatest.funsuite.AnyFunSuite

class InteractiveApiSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private def req(method: String, url: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val r = method match {
      case "GET" => b.GET()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    client.send(r.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("interactive session over HTTP: start, signals, status, results, finish") {
    val api = new InteractiveApi(spark, HashingEmbedder(dim = 16))
    val port = api.start()
    val base = s"http://127.0.0.1:$port/interactive"
    try {
      val started = mapper.readTree(req("POST", s"$base/start").body())
      val sid = started.get("workflow_id").asText()
      assert(sid.startsWith("interactive-session-"))

      req("POST", s"$base/$sid/add_library", """{"name": "api-lib"}""")
      val lib = mapper.readTree(req("GET", s"$base/$sid/status").body())
        .get("library_ids").get(0).asText()
      req("POST", s"$base/$sid/add_document", s"""{"library_id": "$lib", "title": "d"}""")
      val status1 = mapper.readTree(req("GET", s"$base/$sid/status").body())
      assert(status1.get("library_names").get(lib).asText() == "api-lib")

      // need the document id: fetch via the session's engine state is not
      // exposed -> reference flow tracks titles; we add chunks via the
      // timeline-recorded doc id. Use the status timeline entry.
      val docId = status1.get("timeline").get(1).asText().stripPrefix("add_document ")
      req("POST", s"$base/$sid/add_chunk",
        s"""{"library_id": "$lib", "document_id": "$docId", "text": "eiffel tower paris", "metadata": {"type": "landmark"}}""")
      req("POST", s"$base/$sid/add_chunk",
        s"""{"library_id": "$lib", "document_id": "$docId", "text": "paris capital", "metadata": {"type": "city"}}""")
      val status2 = mapper.readTree(req("GET", s"$base/$sid/status").body())
      assert(status2.get("chunk_counts").get(lib).asInt() == 2)
      assert(status2.get("metadata_catalog").get("type").size() == 2)

      req("POST", s"$base/$sid/set_query_params", """{"k": 1, "index": "brute"}""")
      val res = mapper.readTree(req("POST", s"$base/$sid/start_query",
        s"""{"library_id": "$lib", "query_text": "eiffel tower paris"}""").body())
      assert(res.get("results").get("hits").size() == 1)
      assert(res.get("results").get("hits").get(0).get("text").asText() == "eiffel tower paris")

      // bad command -> recorded to timeline, session survives
      req("POST", s"$base/$sid/add_document", """{"library_id": "nope", "title": "x"}""")
      val status3 = mapper.readTree(req("GET", s"$base/$sid/status").body())
      assert(status3.get("timeline").toString.contains("error:"))

      assert(req("POST", s"$base/$sid/finish").statusCode() == 200)
      assert(req("POST", s"$base/$sid/finish").statusCode() == 200) // idempotent
      assert(req("GET", s"$base/nope/status").statusCode() == 404)
      assert(req("POST", s"$base/$sid/add_library", """{}""").statusCode() == 400)
    } finally api.stop()
  }
}
