package graft

import graft.multimodal.{AudioClip, AudioCodec, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  private def clip(samples: Int*): AudioClip =
    AudioClip(8000, 1, 16, samples.toArray, "wav")

  test("WAV roundtrip: encode then decode preserves format fields and samples") {
    val c = clip(0, 257, -257, 12079, -12079, 32767, -32768)
    val decoded = AudioCodec.decode(AudioCodec.encodeWav(c)).get
    assert(decoded.sampleRate == 8000 && decoded.channels == 1 && decoded.bitsPerSample == 16)
    assert(decoded.format == "wav")
    assert(decoded.samples.sameElements(c.samples))
  }

  test("chunk walker skips junk LIST chunks, including odd lengths with a pad byte") {
    val c = clip(100, -100, 200)
    for (junk <- Seq("x", "xy", "xyz", "meta123")) { // odd and even lengths
      val decoded = AudioCodec.decode(AudioCodec.encodeWav(c, junk.getBytes("US-ASCII")))
      assert(decoded.isDefined, s"junk='$junk'")
      assert(decoded.get.samples.sameElements(c.samples), s"junk='$junk'")
    }
  }

  test("garbage, truncated, and null blobs decode to None, not exceptions") {
    assert(AudioCodec.decode(null).isEmpty)
    assert(AudioCodec.decode(Array.empty[Byte]).isEmpty)
    assert(AudioCodec.decode("not a riff header at all".getBytes).isEmpty)
    val good = AudioCodec.encodeWav(clip(1, 2, 3, 4))
    // truncate mid-data: declared chunk length escapes the buffer
    assert(AudioCodec.decode(good.take(good.length - 3)).isEmpty)
    // corrupt the RIFF size field to point past the end
    val oversize = good.clone(); oversize(4) = 0x7F.toByte; oversize(5) = 0x7F.toByte
    assert(AudioCodec.decode(oversize).isEmpty)
    // non-PCM format tag quarantines (fmt tag lives at offset 20)
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float
    assert(AudioCodec.decode(nonPcm).isEmpty)
  }

  test("8-bit WAV decodes unsigned-centered at 128") {
    // hand-build an 8-bit mono file: the encoder only emits 16-bit,
    // so this exercises the decoder's other leg independently
    val data = Array[Byte](0, 127.toByte, 128.toByte, 255.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    bos.write("RIFF".getBytes); w32(4 + 24 + 8 + data.length); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000); w32(8000); w16(1); w16(8)
    bos.write("data".getBytes); w32(data.length); bos.write(data)
    val decoded = AudioCodec.decode(bos.toByteArray).get
    assert(decoded.bitsPerSample == 8)
    assert(decoded.samples.toSeq == Seq(-128, -1, 0, 127))
  }

  test("audio features match a plain-Scala recomputation on real corpus text") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()

    val got = Multimodal.audioFeatures(spark,
        docs.withColumn("blob", Multimodal.syntheticWavUdf(col("text"))),
        "doc_id", "blob", winSize = 64)
      .collect()
      .map(w => (w.doc_id, w.window_idx) -> ((w.n_samples, w.rms, w.zero_crossings, w.peak)))
      .toMap

    var checked = 0
    for ((id, text) <- rows) {
      val b = text.getBytes("US-ASCII")
      val n = math.max(b.length, 1)
      val nsamp = 192 + n % 64
      val v = Array.tabulate(nsamp)(k => ((if (b.isEmpty) 0 else b(k % n) & 0xFF) - 79) * 257)
      for (start <- 0 until nsamp by 64) {
        val w = v.slice(start, math.min(start + 64, nsamp))
        val sumSq = w.map(x => x.toLong * x).sum
        val zc = w.sliding(2).count(p => p.length == 2 && p(0).toLong * p(1) < 0)
        val peak = w.map(x => math.abs(x).toLong).max
        val exp = (w.length.toLong, math.sqrt(sumSq.toDouble / w.length), zc.toLong, peak)
        assert(got((id, (start / 64).toLong)) == exp, s"doc $id window ${start / 64}")
        checked += 1
      }
    }
    assert(checked >= 40 * 3) // every doc contributes at least 3 full windows
    assert(got.size == checked) // and nothing beyond the recomputed windows
  }

  test("window boundaries: partial tail window, no boundary-straddling crossings") {
    import spark.implicits._
    // 5 samples, winSize=4: window 0 = [+,-,+,-] (3 crossings),
    // window 1 = [-] (0 crossings) — the (-,-) pair at the 4/5 boundary
    // straddles windows and must count in neither
    val wav = AudioCodec.encodeWav(clip(100, -100, 100, -100, -100))
    val df = Seq((1L, wav)).toDF("id", "blob")
    val ws = Multimodal.audioFeatures(spark, df, "id", "blob", winSize = 4)
      .collect().sortBy(_.window_idx)
    assert(ws.length == 2)
    assert(ws(0).n_samples == 4 && ws(0).zero_crossings == 3 && ws(0).peak == 100)
    assert(ws(1).n_samples == 1 && ws(1).zero_crossings == 0 && ws(1).peak == 100)
    assert(ws(1).rms == 100.0)
  }

  test("audioSegments: islands of supra-threshold windows, gaps split runs") {
    import spark.implicits._
    // rms pattern per window: [low, HIGH, HIGH, low, HIGH] →
    // two segments: [1,2] (len 2) and [4] (len 1); doc 2 all-low → none
    val feats = Seq(
      (1L, 0L, 10.0), (1L, 1L, 90.0), (1L, 2L, 95.0), (1L, 3L, 5.0), (1L, 4L, 80.0),
      (2L, 0L, 1.0), (2L, 1L, 2.0))
      .toDF("doc_id", "window_idx", "rms")
    val segs = Multimodal.audioSegments(feats, rmsThreshold = 50.0)
      .as[(Long, Long, Long)].collect().sortBy(s => (s._1, s._2)).toSeq
    assert(segs == Seq((1L, 1L, 2L), (1L, 4L, 1L)))
  }

  test("audio feature vectors flow into the cosine near-dup operator") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val blobs = docs.withColumn("blob", Multimodal.syntheticWavUdf(col("text")))
    val feats = Multimodal.audioFeatureVectors(spark, blobs, "doc_id", "blob")
    assert(feats.count() == 50)
    val pairs = graft.dedup.Dedup.embeddingNearDups(feats, "doc_id", "features", 0.999)
    assert(pairs.columns.toSeq == Seq("id_a", "id_b", "cos"))
    pairs.collect() // executes the full broadcast + mapPartitions path
  }

  test("audioPhashes: duplicate clips collide, hash matches a plain recomputation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
      (3L, "a completely different document body with other bytes entirely"))
      .toDF("doc_id", "text")
      .withColumn("blob", Multimodal.syntheticWavUdf(col("text")))
    val got = Multimodal.audioPhashes(spark, docs, "doc_id", "blob")
      .collect().map(r => r.doc_id -> r.phash).toMap
    assert(got(1L) === got(2L), "identical clips must hash identically")
    assert(got(1L) !== got(3L), "distinct clips should not collide here")
    val bytes = docs.where(col("doc_id") === 1).select(col("blob"))
      .head().getAs[Array[Byte]](0)
    val s = AudioCodec.decode(bytes).get.samples
    val expected = (0 until 64)
      .collect { case i if s(i + 1) > s(i) => 1L << i }.foldLeft(0L)(_ | _)
    assert(got(1L) === expected)
  }
}
