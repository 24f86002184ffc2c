package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import graft.api.HttpApi
import graft.embed.HashingEmbedder
import graft.state.Engine
import org.scalatest.funsuite.AnyFunSuite

/** HTTP-level tests in the style of the reference's FastAPI TestClient
  * suite (tests/test_crud.py): real requests against the running
  * server, status codes + payload shapes asserted.
  */
class HttpApiSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private def withApi[A](f: (String) => A): A = {
    val api = new HttpApi(spark, new Engine(), HashingEmbedder(dim = 16))
    val port = api.start()
    try f(s"http://127.0.0.1:$port")
    finally api.stop()
  }

  private def req(method: String, url: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val r = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    client.send(r.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("full REST lifecycle: library -> document -> chunks -> search -> cascade delete") {
    withApi { base =>
      // create library (201), reference payload shape
      val lib = req("POST", s"$base/vector_db/libraries",
        """{"name": "Full Library", "description": "A complete library", "metadata": {"tags": "test,demo"}}""")
      assert(lib.statusCode() == 201)
      val libId = mapper.readTree(lib.body()).get("id").asText()
      assert(mapper.readTree(lib.body()).get("version").asInt() == 0)

      // document + chunks
      val doc = req("POST", s"$base/vector_db/libraries/$libId/documents",
        """{"title": "Test Document"}""")
      assert(doc.statusCode() == 201)
      val docId = mapper.readTree(doc.body()).get("id").asText()
      val c1 = req("POST", s"$base/vector_db/libraries/$libId/documents/$docId/chunks",
        """{"text": "eiffel tower in paris", "metadata": {"type": "landmark"}}""")
      assert(c1.statusCode() == 201)
      assert(req("POST", s"$base/vector_db/libraries/$libId/documents/$docId/chunks",
        """{"text": "paris capital of france", "embedding": [0.1, 0.2], "metadata": {"type": "city"}}""").statusCode() == 201)
      val list = req("GET", s"$base/vector_db/libraries/$libId/documents/$docId/chunks")
      assert(mapper.readTree(list.body()).size() == 2)

      // update chunk text (no embedding) -> server re-embeds
      val chunkId = mapper.readTree(c1.body()).get("id").asText()
      val up = req("PUT", s"$base/vector_db/libraries/$libId/documents/$docId/chunks/$chunkId",
        """{"text": "eiffel tower is in paris france"}""")
      assert(up.statusCode() == 200)
      assert(mapper.readTree(up.body()).get("embedding").size() == 16)

      // search with NULL-embedding-free corpus: given embedding chunk has dim 2,
      // search by text (dim 16) would dim-mismatch on brute over mixed dims ->
      // use a filter restricting to the landmark chunk
      val search = req("POST", s"$base/vector_db/libraries/$libId/search",
        """{"query_text": "eiffel tower paris", "k": 3, "filters": {"type": "landmark"}}""")
      assert(search.statusCode() == 200)
      val senv = mapper.readTree(search.body())
      assert(senv.get("hits").size() == 1)
      assert(senv.get("index").asText() == "brute" && senv.get("index_used").asText() == "brute")
      assert(!senv.get("durable_execution").asBoolean())
      assert(senv.get("library_version").asInt() == 4) // doc +1, 2 chunks +2, chunk update +1

      // cascade delete library, verify 404s
      assert(req("DELETE", s"$base/vector_db/libraries/$libId").statusCode() == 204)
      assert(req("GET", s"$base/vector_db/libraries/$libId").statusCode() == 404)
      assert(req("GET", s"$base/vector_db/libraries/$libId/documents").statusCode() == 404)
    }
  }

  test("validation and 404 mapping mirrors the routers") {
    withApi { base =>
      assert(req("POST", s"$base/vector_db/libraries", """{}""").statusCode() == 400)
      assert(req("GET", s"$base/vector_db/libraries/nope").statusCode() == 404)
      assert(req("DELETE", s"$base/vector_db/libraries/nope").statusCode() == 404)
      val lib = req("POST", s"$base/vector_db/libraries", """{"name": "x"}""")
      val libId = mapper.readTree(lib.body()).get("id").asText()
      assert(req("PUT", s"$base/vector_db/libraries/$libId", """{}""").statusCode() == 400)
      val doc = req("POST", s"$base/vector_db/libraries/$libId/documents", """{"title": "t"}""")
      val docId = mapper.readTree(doc.body()).get("id").asText()
      assert(req("PUT", s"$base/vector_db/libraries/$libId/documents/$docId", """{}""").statusCode() == 400)
      // search without query -> 400; search on missing lib -> 404
      assert(req("POST", s"$base/vector_db/libraries/$libId/search", """{"k": 3}""").statusCode() == 400)
      assert(req("POST", s"$base/vector_db/libraries/nope/search",
        """{"query_text": "x"}""").statusCode() == 404)
      // k <= 0 -> empty hits, envelope WITHOUT index_used (search_service.py:95-96)
      val c = req("POST", s"$base/vector_db/libraries/$libId/documents/$docId/chunks",
        """{"text": "abc"}""")
      assert(c.statusCode() == 201)
      val empty = req("POST", s"$base/vector_db/libraries/$libId/search",
        """{"query_text": "abc", "k": 0}""")
      val env = mapper.readTree(empty.body())
      assert(env.get("hits").size() == 0 && !env.has("index_used"))
    }
  }
}
