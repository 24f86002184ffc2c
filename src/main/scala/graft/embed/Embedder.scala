package graft.embed

/** Pluggable embedding provider (reference O14: the duck-typed
  * `embedder` accepted by SearchService, app/services/search_service.py:27,32;
  * Cohere impl at app/adapters/embedding_providers/cohere_provider.py:12-29).
  *
  * The batch path for a real provider is `mapPartitions` with batched
  * HTTP — never a per-row network UDF. [[HttpEmbedder]] is that
  * provider (tested against an in-process stub server — this container
  * has no egress); [[HashingEmbedder]] is the deterministic local
  * embedder the oracled gates use.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]

  /** Embed at an explicit dimensionality. The reference passes the
    * corpus dim through (`embed_text(text, dim=dim)`,
    * search_service.py:112); providers with a fixed output size (Cohere)
    * ignore it, so ignoring is the default. Resizable embedders override
    * so query vectors always match the corpus they search.
    */
  def embedAt(text: String, dim: Int): Array[Float] = embed(text)
}

/** Deterministic, seedable hash-based embedder: token hashing into a
  * fixed-dim bag-of-words projection, L2-normalized. Stable across JVMs
  * (xxhash-free; uses a splitmix64 of the token's UTF-8 bytes), so test
  * fixtures and oracle expectations are reproducible.
  */
final case class HashingEmbedder(dim: Int = 64, seed: Long = 42L) extends Embedder {

  override def embedAt(text: String, d: Int): Array[Float] =
    if (d == dim) embed(text) else copy(dim = d).embed(text)

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def tokenHash(tok: String): Long = {
    var h = seed
    tok.getBytes("UTF-8").foreach { b => h = splitmix64(h ^ (b & 0xFFL)) }
    h
  }

  def embed(text: String): Array[Float] = {
    val v = new Array[Double](dim)
    text.trim.split(" +").filter(_.nonEmpty).foreach { tok =>
      val h = tokenHash(tok)
      val idx = java.lang.Math.floorMod(h, dim.toLong).toInt
      val sign = if (((h >>> 32) & 1L) == 0L) 1.0 else -1.0
      v(idx) += sign
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) { out(i) = (if (n == 0.0) v(i) else v(i) / n).toFloat; i += 1 }
    out
  }
}

/** Always-failing embedder for exercising the failure-tolerant
  * re-embed path (chunk_service.py:38-45). */
object FailingEmbedder extends Embedder {
  def dim: Int = 0
  def embed(text: String): Array[Float] = throw new RuntimeException("embedder down")
}
