package graft

import graft.multimodal.{ImageCodec, Multimodal, RasterImage}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImageCodecSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  private def gradient(w: Int, h: Int): RasterImage =
    RasterImage(w, h, 1, 255, Array.tabulate(w * h)(i => (i % 256).toByte), "pgm")

  test("PGM roundtrip: encode then decode preserves header and pixels") {
    val img = gradient(17, 9)
    val decoded = ImageCodec.decode(ImageCodec.encodePgm(img)).get
    assert(decoded.width == 17 && decoded.height == 9 && decoded.channels == 1)
    assert(decoded.maxval == 255 && decoded.format == "pgm")
    assert(decoded.pixels.sameElements(img.pixels))
  }

  test("PGM parser handles comments and multi-whitespace headers") {
    val px = Array.tabulate(6)(i => (10 * i).toByte)
    val bytes = "P5\n# a comment\n3 2\n255\n".getBytes("US-ASCII") ++ px
    val img = ImageCodec.decode(bytes).get
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.sameElements(px))
  }

  test("PNG roundtrip through the JDK ImageIO path") {
    val img = gradient(8, 5)
    val png = ImageCodec.encodePng(img)
    assert(ImageCodec.sniff(png) == "png")
    val back = ImageCodec.decode(png).get
    assert(back.width == 8 && back.height == 5 && back.channels == 3)
    // gray source -> equal RGB channels carrying the original gray level
    (0 until 40).foreach { i =>
      val v = img.pixels(i) & 0xFF
      assert((back.pixels(i * 3) & 0xFF) == v)
      assert((back.pixels(i * 3 + 1) & 0xFF) == v)
      assert((back.pixels(i * 3 + 2) & 0xFF) == v)
    }
  }

  test("nearest-neighbor resize picks floor-mapped source pixels") {
    val img = gradient(16, 16)
    val half = ImageCodec.resizeNearest(img, 8, 8)
    assert(half.width == 8 && half.height == 8)
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        assert(half.pixels(y * 8 + x) == img.pixels(y * 2 * 16 + x * 2))
      }
    }
  }

  test("luma histogram is L1-normalized and lands in the right bins") {
    // half the pixels at 0 (bin 0), half at 255 (bin 7)
    val img = RasterImage(4, 2, 1, 255,
      Array[Byte](0, 0, 0, 0, -1, -1, -1, -1), "pgm")
    val hist = ImageCodec.lumaHistogram(img, 8)
    assert(math.abs(hist(0) - 0.5f) < 1e-6)
    assert(math.abs(hist(7) - 0.5f) < 1e-6)
    assert(math.abs(hist.sum - 1.0f) < 1e-6)
    assert(math.abs(ImageCodec.meanLuma(img) - 127.5) < 1e-9)
  }

  test("imagePhashes: duplicate images collide, hash matches a plain recomputation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
      (3L, "a completely different document body with other bytes entirely"))
      .toDF("doc_id", "text")
      .withColumn("blob", Multimodal.syntheticPgmUdf(col("text")))
    val got = Multimodal.imagePhashes(spark, docs, "doc_id", "blob")
      .collect().map(r => r.doc_id -> r.phash).toMap
    assert(got(1L) === got(2L), "identical images must hash identically")
    assert(got(1L) !== got(3L), "distinct images should not collide here")
    // plain recomputation of doc 1's hash straight from the blob
    val bytes = docs.where(col("doc_id") === 1).select(col("blob"))
      .head().getAs[Array[Byte]](0)
    val img = ImageCodec.toGray(ImageCodec.decode(bytes).get)
    val cells = for (y <- 0 until 8; x <- 0 until 8)
      yield img.pixels((y * img.height / 8) * img.width + (x * img.width / 8)) & 0xFF
    val mu = cells.map(_.toLong).sum / 64.0
    val expected = cells.zipWithIndex
      .collect { case (v, i) if v > mu => 1L << i }.foldLeft(0L)(_ | _)
    assert(got(1L) === expected)
  }

  test("garbage and truncated blobs decode to None, not exceptions") {
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode("nonsense".getBytes).isEmpty)
    assert(ImageCodec.decode("P5\n10 10\n255\nxx".getBytes).isEmpty) // truncated payload
    assert(ImageCodec.decode("P5\nab cd\n255\n".getBytes).isEmpty)   // non-numeric dims
    // dimensions whose product overflows Int must not bypass the bounds
    // check (w*h = 2.5e9 -> negative as Int) or build empty-pixel rasters
    assert(ImageCodec.decode("P5\n50000 50000\n255\nxxxx".getBytes).isEmpty)
    assert(ImageCodec.decode("P5\n65536 65536\n255\nxxxx".getBytes).isEmpty)
  }

  test("RGB PPM decodes and grayscales with BT.601 luma") {
    val px = Array[Byte](-1, 0, 0, 0, -1, 0) // red, green
    val bytes = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ px
    val img = ImageCodec.decode(bytes).get
    assert(img.channels == 3 && img.format == "ppm")
    val gray = ImageCodec.toGray(img)
    assert((gray.pixels(0) & 0xFF) == 299 * 255 / 1000)
    assert((gray.pixels(1) & 0xFF) == 587 * 255 / 1000)
  }

  test("feature vectors flow into the cosine near-dup operator") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val blobs = docs.withColumn("blob", Multimodal.syntheticPgmUdf(col("text")))
    val feats = Multimodal.featureVectors(spark, blobs, "doc_id", "blob")
    assert(feats.count() == 50)
    val pairs = graft.dedup.Dedup.embeddingNearDups(feats, "doc_id", "features", 0.999)
    // histograms of same-language synthetic text are near-identical for
    // some pairs; the operator must run end-to-end either way
    assert(pairs.columns.toSeq == Seq("id_a", "id_b", "cos"))
    pairs.collect() // executes the full broadcast + mapPartitions path
  }

  test("video frame-sample: container parse + per-frame decode match a plain recomputation") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog"
    val n = text.length                       // 43
    val frames = 4 + n % 5                    // 7
    val w = 8 + n % 8; val h = 8 + n % 4      // 11 x 11
    val df = Seq((7L, text)).toDF("doc_id", "t")
      .withColumn("blob", Multimodal.syntheticVideoUdf(col("t")))
    val got = Multimodal.sampleFrames(spark, df, "doc_id", "blob", stride = 2)
      .collect().sortBy(_.frame_idx)
    // stride 2 over 7 frames -> indices 0, 2, 4, 6
    assert(got.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L, 6L))
    assert(got.forall(f => f.width == w && f.height == h))
    val bytes = text.getBytes("US-ASCII")
    def checksum(k: Int): Long =
      (0 until w * h).map(i => (bytes((i + k) % n) & 0xFF).toLong).sum % 997L
    assert(got.map(f => f.frame_idx -> f.checksum).toMap ==
      Seq(0, 2, 4, 6).map(k => k.toLong -> checksum(k)).toMap)
    // malformed containers -> no frames (quarantine, not an exception):
    // garbage magic, a NEGATIVE declared frame length, and an
    // Int-overflowing one (the Long-bounds-math case)
    val bad = Seq((8L, Array[Byte](1, 2, 3))).toDF("doc_id", "blob")
    assert(Multimodal.sampleFrames(spark, bad, "doc_id", "blob", 2).count() == 0)
    assert(Multimodal.parseVideoFrames("GV01\n1\n-5\nAAAAAAAA".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseVideoFrames("GV01\n1\n2147483640\nxx".getBytes("US-ASCII")).isEmpty)
    // a NULL blob quarantines like any malformed container (and the
    // distributed path tolerates a null binary cell)
    assert(Multimodal.parseVideoFrames(null).isEmpty)
    val withNull = Seq((9L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "blob")
    assert(Multimodal.sampleFrames(spark, withNull, "doc_id", "blob", 2).count() == 0)
    // stride must be a real sampling rate, not a modulus accident
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(spark, df, "doc_id", "blob", stride = 0)
    }
  }

  test("indexVideoFrames returns the frame table without copying; sampling slices only kept frames") {
    val text = "stride three container with nine frames padding!!"  // len 50
    val blob = Multimodal.syntheticVideo(text)
    val idx = Multimodal.indexVideoFrames(blob)
    val parsed = Multimodal.parseVideoFrames(blob)
    assert(idx.size == parsed.size && idx.nonEmpty)
    // the index IS the parse, minus the copy: each (off, len) slice
    // reproduces the parsed frame bytes exactly
    idx.zip(parsed).foreach { case ((ki, off, len), (kp, frame)) =>
      assert(ki == kp)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(blob, off, off + len), frame))
    }
    // frame payloads are back-to-back in the container: each frame's
    // offset sits AFTER the previous frame's end (its own length line
    // in between), so slicing k % 3 == 0 provably never touches the
    // dropped frames' byte ranges
    idx.sliding(2).foreach {
      case Seq((_, o1, l1), (_, o2, _)) => assert(o2 > o1 + l1)
      case _ =>
    }
    val sampled = idx.filter(_._1 % 3 == 0).map(_._1)
    assert(sampled == idx.map(_._1).filter(_ % 3 == 0))
  }
}
