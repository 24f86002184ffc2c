package graft.embed

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.Row

/** Batched HTTP embedding provider — the network twin of the
  * reference's Cohere adapter
  * (app/adapters/embedding_providers/cohere_provider.py:12-29):
  * POST `{"texts": [...], "model": ..., "input_type":
  * "search_document"}` with a bearer key, read
  * `{"embeddings": [[...]]}` back, 10 s timeout, and a missing key is
  * an immediate error — the same key check the reference performs per
  * call (`if not self.api_key: raise ValueError`), here at
  * construction so a misconfigured engine fails before any request.
  *
  * What is deliberately DIFFERENT from the reference: the reference
  * embeds one text per request (`"texts": [text]`); at corpus scale
  * that is one HTTP round trip per row. This provider batches up to
  * `batchSize` texts per request (96 is the Cohere API's own batch
  * cap) and exposes [[embedColumn]], a `mapPartitions` path where each
  * PARTITION streams its rows through batched requests — the per-row
  * network UDF the Embedder trait's contract forbids never exists.
  * Executors each talk to the service directly through ONE pooled
  * HttpClient per JVM (a companion-object singleton keyed by timeout —
  * every task deserializes its own embedder copy, so an instance-held
  * client would be one fresh connection pool per task), so request
  * fan-out scales with the cluster, not the driver.
  *
  * Failure semantics match the reference's re-embed contract
  * (app/services/chunk_service.py:38-45): any failure — timeout,
  * non-2xx, malformed body — THROWS from [[embed]], and
  * [[graft.state.Engine.updateChunk]] catches and keeps the old
  * embedding. Nothing here retries silently; the caller owns the
  * tolerance policy.
  */
final class HttpEmbedder(endpoint: String, apiKey: String,
                         val dim: Int,
                         model: String = "embed-english-v3.0",
                         batchSize: Int = 96,
                         timeoutMillis: Long = 10000L) extends Embedder {
  require(apiKey != null && apiKey.nonEmpty,
    "embedding API key not configured (reference: 'COHERE_API_KEY not configured')")
  require(batchSize > 0, s"batchSize must be positive, got $batchSize")

  /** Requests issued against this endpoint SINCE THIS INSTANCE was
    * constructed — the observable the batching spec asserts on
    * (texts.length / batchSize requests, not one per text). The
    * underlying counter is JVM-wide per endpoint (task closures each
    * deserialize their own embedder copy, so an instance-held counter
    * on an executor would only ever see one task's worth); the
    * construction-time baseline restores per-instance semantics on
    * the driver and keeps counts from bleeding between instances that
    * happen to share an endpoint string (e.g. ephemeral-port reuse
    * across test servers).
    */
  private val requestsBaseline = HttpEmbedder.counterFor(endpoint).get()
  def requestsIssued: Long =
    HttpEmbedder.counterFor(endpoint).get() - requestsBaseline
  private def requestCounter = HttpEmbedder.counterFor(endpoint)

  // The HttpClient is a JVM-wide singleton keyed by timeout (see the
  // companion): an instance-held client would be rebuilt per TASK
  // (each task deserializes its own closure copy), opening thousands
  // of short-lived connection pools at exactly the fan-out
  // embedColumn exists for.
  private def client: HttpClient = HttpEmbedder.clientFor(timeoutMillis)
  private def mapper: ObjectMapper = HttpEmbedder.jsonMapper

  def embed(text: String): Array[Float] = embedBatch(Seq(text)).head

  /** One POST per `batchSize` texts; preserves input order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.grouped(batchSize).flatMap(postBatch).toSeq

  private def postBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val body = mapper.createObjectNode()
    val arr = body.putArray("texts")
    texts.foreach(arr.add)
    body.put("model", model)
    body.put("input_type", "search_document")
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMillis))
      .header("Authorization", s"Bearer $apiKey")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    requestCounter.incrementAndGet()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new RuntimeException(
        s"embedding service returned HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val root = mapper.readTree(resp.body())
    val embs = root.get("embeddings")
    if (embs == null || !embs.isArray || embs.size() != texts.size)
      throw new RuntimeException(
        s"embedding service returned ${if (embs == null) "no" else embs.size().toString} " +
          s"embeddings for ${texts.size} texts")
    (0 until embs.size()).map { i =>
      val e = embs.get(i)
      // the declared dim is a contract, not advice: a model mismatch
      // that returns the wrong width would otherwise surface far away
      // (ragged parquet arrays, a crashing cosine) instead of at the
      // first response
      if (e.size() != dim)
        throw new RuntimeException(
          s"embedding service returned ${e.size()}-dim vectors, expected $dim " +
            s"(model '$model' vs the corpus this embedder was configured for)")
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) { out(j) = e.get(j).floatValue(); j += 1 }
      out
    }
  }

  /** Distributed batch embedding: appends `outCol: array<float>` to
    * `df` by streaming each partition through batched POSTs. The
    * partition iterator is grouped into `batchSize` slices lazily, so
    * executor memory holds one batch of texts + embeddings at a time,
    * not the partition. Null texts pass through as null embeddings
    * without spending a request slot.
    */
  def embedColumn(df: DataFrame, textCol: Column, outCol: String): DataFrame = {
    val out = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol, ArrayType(FloatType), nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val self = this
    val n = batchSize
    df.withColumn("__graft_embed_text", textCol)
      .mapPartitions { rows =>
        rows.grouped(n).flatMap { batch =>
          val (withText, nullText) = batch.zipWithIndex
            .partition(_._1.getAs[String]("__graft_embed_text") != null)
          val embs: Map[Int, Array[Float]] =
            if (withText.isEmpty) Map.empty
            else withText.map(_._2).zip(
              self.embedBatch(withText.map(_._1.getAs[String]("__graft_embed_text")))).toMap
          (withText ++ nullText).sortBy(_._2).iterator.map { case (r, i) =>
            Row.fromSeq(r.toSeq.dropRight(1) :+ embs.get(i).orNull)
          }
        }
      }(enc)
  }
}

object HttpEmbedder {
  // JVM-wide client pool: one HttpClient per distinct timeout config,
  // shared by every embedder copy (driver instance, task closures) in
  // this JVM. The request counters ride the same lifetime, keyed by
  // endpoint, so requestsIssued observes every task in the JVM.
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[Long, HttpClient]
  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
  private val jsonMapper = new ObjectMapper // thread-safe once configured

  private def clientFor(timeoutMillis: Long): HttpClient =
    clients.computeIfAbsent(timeoutMillis, t =>
      HttpClient.newBuilder().connectTimeout(Duration.ofMillis(t)).build())
  private def counterFor(endpoint: String): java.util.concurrent.atomic.AtomicLong =
    counters.computeIfAbsent(endpoint, _ => new java.util.concurrent.atomic.AtomicLong)
}
