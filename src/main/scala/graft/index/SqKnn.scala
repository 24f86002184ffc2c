package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (SQ8) — the middle point of the
  * compression spectrum this engine serves: float32 (256 B/vector,
  * exact brute force) → SQ8 (64 B, near-exact) → PQ (8 B, approximate,
  * [[PqKnn]]). FAISS's `SQ8`: per-dimension symmetric scales, one byte
  * per component.
  *
  *  - TRAIN: per-dimension max |x| over the (normalized) corpus — one
  *    distributed aggregation, 64 doubles on the driver;
  *  - ENCODE: byte(d) = round(x_d / scale_d), clamped to ±127 — one
  *    UDF pass, 4× smaller than the float column;
  *  - SCORE: dot(query, reconstruction) = Σ q_d·code_d·scale_d; the
  *    scales fold into the query ONCE driver-side, so the scan does
  *    one byte·double multiply-add per dimension.
  *
  * Corpus vectors are L2-normalized before quantization and the query
  * before scoring, so the score approximates cosine with ≤ 1/254
  * per-component error — ranking is near-exact (asserted ≥ 0.9
  * recall@10 in SqKnnSpec).
  */
object SqKnn {

  private def normalize(v: Array[Float]): Array[Float] =
    graft.functions.VectorFunctions.l2NormalizeArr(v)

  /** Per-dimension scales: max |normalized component| / 127, from one
    * distributed aggregation (no collect of the corpus; the vector is
    * normalized ONCE per row in a projection, then 64 max(abs(...))
    * aggregates read components of that one column). A dimension that
    * is 0 everywhere gets scale 0 and decodes to exact 0. Requires
    * every embedding to have exactly `dim` components (ANSI
    * element_at). Fails with a clear error on an empty corpus.
    */
  def trainScales(emb: DataFrame, embCol: Column, dim: Int): Array[Double] = {
    val unit = emb.where(embCol.isNotNull)
      .select(graft.functions.VectorFunctions.l2Normalize(embCol).as("u"))
    val maxAbs = (1 to dim).map(d => max(abs(element_at(col("u"), d))).as(s"m$d"))
    val row = unit.agg(maxAbs.head, maxAbs.tail: _*).head()
    require(!row.isNullAt(0),
      "SqKnn.trainScales: no non-null embeddings to train on")
    Array.tabulate(dim)(d => row.getAs[Float](d).toDouble / 127.0)
  }

  /** Encode one raw vector (normalize, then per-dim round/clamp). */
  def encodeVecWithScales(v0: Array[Float], scales: Array[Double]): Array[Byte] = {
    val v = normalize(v0)
    Array.tabulate(v.length) { d =>
      if (d >= scales.length || scales(d) == 0.0) 0.toByte
      else {
        val q = math.rint(v(d) / scales(d))
        math.max(-127, math.min(127, q)).toByte
      }
    }
  }

  /** One UDF pass → (id, code BINARY[dim]). */
  def encode(emb: DataFrame, idCol: Column, embCol: Column, scales: Array[Double]): DataFrame = {
    val codeUdf = udf { (v0: collection.Seq[Float]) =>
      if (v0 == null) null
      else encodeVecWithScales(graft.functions.VectorFunctions.toArr(v0), scales)
    }
    emb.where(embCol.isNotNull)
      .select(idCol.cast("long").as("id"), codeUdf(embCol).as("code"))
  }

  /** Per-query SQ8 lookup table in [[graft.expressions.AdcScore]]'s
    * shape — lut(d)(b) = sbyte(b) · qn(d) · scale(d), 256 entries per
    * dimension — which makes SQ8 scoring EXPRESSIBLE AS PQ's ADC
    * expression with no new codegen: `AdcScore` indexes `lut(d)(code(d)
    * & 0xFF)`, and building the table over the two's-complement byte
    * value (128..255 ⇒ −128..−1) recovers the signed multiply
    * `code(d) * qScaled(d)` bit-for-bit ([[searchEncoded]]'s
    * accumulation, same order, same doubles — a LUT entry is the
    * IDENTICAL `Byte * Double` product, precomputed). 64 dims × 256
    * doubles = 128 KB riding the codegen references array once per
    * task. This is what lets [[graft.plans.LshProbeRewrite]] serve a
    * registered SQ8 table through the same staged scoring rewrite as
    * PQ — the scoring KIND machinery is shared; only the table builder
    * differs. */
  def adcTable(query: Array[Float], scales: Array[Double]): Array[Array[Double]] = {
    val qn = normalize(query)
    val n = math.min(qn.length, scales.length)
    Array.tabulate(n) { d =>
      val qScaled = qn(d).toDouble * scales(d)
      Array.tabulate(256)(b => b.toByte * qScaled)
    }
  }

  /** Top-k by quantized dot: scales fold into the (normalized) query
    * driver-side; the scan multiplies bytes by prescaled doubles. */
  def searchEncoded(codes: DataFrame, query: Array[Float], scales: Array[Double],
                    k: Int): DataFrame = {
    val qn = normalize(query)
    val qScaled =
      Array.tabulate(math.min(qn.length, scales.length))(d => qn(d).toDouble * scales(d))
    val scoreUdf = udf { (code: Array[Byte]) =>
      var acc = 0.0; var d = 0
      val n = math.min(code.length, qScaled.length)
      while (d < n) { acc += code(d) * qScaled(d); d += 1 }
      acc
    }
    codes.select(col("id"), scoreUdf(col("code")).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Transient end-to-end: train → encode → top-k. */
  def search(emb: DataFrame, idCol: Column, embCol: Column, query: Array[Float],
             k: Int, dim: Int): DataFrame = {
    val scales = trainScales(emb, embCol, dim)
    searchEncoded(encode(emb, idCol, embCol, scales), query, scales, k)
  }
}
