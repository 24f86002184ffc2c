package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media blob. */
case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long, format: String)

/** Multimodal-column plumbing: media (image/audio/video) is carried as
  * an opaque BINARY column + typed metadata struct; decode /
  * feature-extract runs as a partition-local batch function
  * (`mapPartitions` over `Dataset[(id, bytes)]` — the Scala analog of
  * `mapInPandas`: one JVM-side batch per partition, no per-row overhead,
  * no data leaves the executor).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic fake dimensions from
  * the byte payload. The Spark-side contract — binary column schema,
  * partition-preserving batch shape, typed output Encoder — is real and
  * is what a codec drop-in would inherit unchanged.
  */
object Multimodal {

  /** Deterministic fake decode — replace with a real codec. Reads only
    * cheap properties of the payload so behavior is reproducible and
    * oracle-checkable.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = 64L + (n % 57L) * 16L,
      height = 64L + (n % 37L) * 16L,
      format = (n % 3L) match {
        case 0L => "png"
        case 1L => "jpeg"
        case _ => "webp"
      })
  }

  /** Attach media metadata to a DataFrame holding (idCol LONG, binCol
    * BINARY). Executes as one partition-local pass.
    */
  def extractMeta(spark: SparkSession, df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Demo source: treat each document's UTF-8 bytes as an opaque blob —
    * exercises the binary-column path end-to-end on the test corpus.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] =
    extractMeta(spark, docs.withColumn("blob", encode(col("text"), "UTF-8")), "doc_id", "blob")

  // ---- real-codec path ([[ImageCodec]]) ----

  /** Header + payload metadata decoded by the REAL codec. */
  case class DecodedMeta(doc_id: Long, width: Long, height: Long,
                         maxval: Long, n_bytes: Long, format: String)

  /** Thumbnail roundtrip proof: decode → resize → re-encode, with a
    * pixel checksum so the oracle verifies actual pixel movement. */
  case class ThumbMeta(doc_id: Long, thumb_w: Long, thumb_h: Long,
                       n_thumb_bytes: Long, checksum: Long)

  /** The oracle-replayed pixel checksum: gray pixel sum mod 997 — one
    * definition for thumbnails and frame sampling. */
  private def pixelChecksum(img: RasterImage): Long = {
    val gray = ImageCodec.toGray(img)
    var acc = 0L
    var i = 0
    while (i < gray.pixels.length) { acc += gray.pixels(i) & 0xFF; i += 1 }
    acc % 997L
  }

  /** Deterministic synthetic PGM: a real P5 image whose dimensions
    * derive from the text length and whose pixels are the ASCII text
    * bytes cycled row-major — so every decoded property is
    * SQL-reproducible for the DuckDB oracle while the decode itself
    * exercises the real parser.
    */
  def syntheticPgm(text: String): Array[Byte] = {
    val bytes = text.getBytes("US-ASCII")
    val n = math.max(bytes.length, 1)
    val w = 16 + n % 16
    val h = 16 + n % 8
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(w * h)(i => if (bytes.isEmpty) 0.toByte else bytes(i % n))
    header ++ px
  }

  val syntheticPgmUdf = udf { (text: String) =>
    if (text == null) null else syntheticPgm(text)
  }

  /** Decode a binary column with the real codec; undecodable blobs are
    * dropped (quarantine path at scale). One partition-local pass. */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String, binCol: String): Dataset[DecodedMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map(img =>
          DecodedMeta(id, img.width, img.height, img.maxval, bytes.length.toLong, img.format))
      })
  }

  /** decode → nearest-neighbor resize → re-encode PGM, one pass. */
  def thumbnails(spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
                 tw: Int, th: Int): Dataset[ThumbMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map { img =>
          val thumb = ImageCodec.resizeNearest(img, tw, th)
          val encoded = ImageCodec.encodePgm(thumb)
          ThumbMeta(id, thumb.width, thumb.height, encoded.length.toLong,
            pixelChecksum(thumb))
        }
      })
  }

  /** Per-image 64-bit perceptual fingerprint. */
  case class PhashRow(doc_id: Long, phash: Long)

  /** The 64-bit aHash of one decoded raster — shared by the image and
    * video-keyframe fingerprint paths so the two cannot drift. */
  private def aHash64(img0: RasterImage): Long = {
    val img = ImageCodec.toGray(img0)
    val v = new Array[Int](64)
    var sum = 0L
    var i = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        v(i) = img.pixels((y * img.height / 8) * img.width +
          (x * img.width / 8)) & 0xFF
        sum += v(i); i += 1; x += 1
      }
      y += 1
    }
    val mu = sum / 64.0
    var h = 0L
    i = 0
    while (i < 64) { if (v(i) > mu) h |= (1L << i); i += 1 }
    h
  }

  /** aHash-style perceptual image fingerprint: decode with the real
    * codec, gray, nearest-neighbor-sample an 8×8 grid (the thumbnail
    * pass's sampling rule at 8×8), threshold each cell against the
    * grid MEAN — bit (y·8+x) set iff cell > mean ([[aHash64]]).
    * Identical images hash identically; small pixel perturbations
    * flip few bits, so Hamming distance is the near-dup metric
    * ([[graft.dedup.Dedup.hammingBandPairs]] generates candidates).
    * One partition-local pass; 8 bytes per image travel to the join.
    */
  def imagePhashes(spark: SparkSession, df: DataFrame, idCol: String,
                   binCol: String): Dataset[PhashRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map(img => PhashRow(id, aHash64(img)))
      })
  }

  /** Keyframe fingerprint for video near-dup: parse the container
    * ([[indexVideoFrames]] — only frame 0's bytes are ever copied),
    * decode the first frame with the real codec, aHash it — the
    * keyframe-hashing shape production video dedup uses (a re-encoded
    * or re-containered copy keeps its keyframe pixels). 8 bytes per
    * video reach the join regardless of clip length.
    */
  def videoPhashes(spark: SparkSession, df: DataFrame, idCol: String,
                   binCol: String): Dataset[PhashRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        indexVideoFrames(bytes).headOption.flatMap { case (_, off, len) =>
          ImageCodec.decode(java.util.Arrays.copyOfRange(bytes, off, off + len))
            .map(img => PhashRow(id, aHash64(img)))
        }
      })
  }

  /** Waveform sign-delta fingerprint: decode with the real RIFF
    * parser, then bit i = sample(i+1) > sample(i) over the first 65
    * samples — the zero-state cousin of spectral-band-delta audio
    * fingerprints (Haitsma–Kalker shape at waveform granularity).
    * Identical clips collide; small re-encodes flip few bits, so
    * Hamming is the near-dup metric and
    * [[graft.dedup.Dedup.hammingBandPairs]] is the join — the same
    * 8-bytes-per-clip property as the image path. Clips shorter than
    * 65 samples are dropped (the synthetic corpus's floor is 192).
    */
  def audioPhashes(spark: SparkSession, df: DataFrame, idCol: String,
                   binCol: String): Dataset[PhashRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).collect {
          case clip if clip.samples.length >= 65 =>
            var h = 0L
            var i = 0
            while (i < 64) {
              if (clip.samples(i + 1) > clip.samples(i)) h |= (1L << i)
              i += 1
            }
            PhashRow(id, h)
        }
      })
  }

  // ---- video path: container parse + frame sampling ----

  /** Per-sampled-frame metadata from the video frame-sample pass. */
  case class FrameMeta(doc_id: Long, frame_idx: Long, width: Long,
                       height: Long, checksum: Long)

  /** Deterministic synthetic "video": a `GV01` container — magic line,
    * frame-count line, then per frame a byte-length line followed by a
    * COMPLETE P5 PGM (4–8 frames, dims from the text length, frame k's
    * pixels = the ASCII text bytes cycled with offset k). Every
    * sampled frame's checksum is SQL-reproducible for the oracle while
    * the pass itself exercises real container + frame parsing.
    */
  def syntheticVideo(text: String): Array[Byte] = {
    val bytes = text.getBytes("US-ASCII")
    val n = math.max(bytes.length, 1)
    val frames = 4 + n % 5
    val w = 8 + n % 8
    val h = 8 + n % 4
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"GV01\n$frames\n".getBytes("US-ASCII"))
    var k = 0
    while (k < frames) {
      val px = Array.tabulate(w * h)(i =>
        if (bytes.isEmpty) 0.toByte else bytes((i + k) % n))
      // the real encoder, not a hand-built header — frame framing can
      // never drift from what ImageCodec.decode parses
      val frame = ImageCodec.encodePgm(RasterImage(w, h, 1, 255, px, "pgm"))
      bos.write(s"${frame.length}\n".getBytes("US-ASCII"))
      bos.write(frame, 0, frame.length)
      k += 1
    }
    bos.toByteArray
  }

  val syntheticVideoUdf = udf { (text: String) =>
    if (text == null) null else syntheticVideo(text)
  }

  /** Index a `GV01` container WITHOUT copying any frame bytes: the
    * frame table as (frame_idx, offset, len). This is the only pass
    * that walks the container, so skipped frames at sampling time cost
    * exactly the header scan — at a production stride (every 30th
    * frame) ~97% of the payload bytes are never touched beyond the
    * length lines. Malformed containers (and null blobs) yield an
    * empty table (quarantine path). */
  def indexVideoFrames(bytes: Array[Byte]): Seq[(Int, Int, Int)] = {
    if (bytes == null) return Seq.empty
    def line(off: Int): (String, Int) = {
      var i = off
      while (i < bytes.length && bytes(i) != '\n') i += 1
      (new String(bytes, off, i - off, "US-ASCII"), i + 1)
    }
    try {
      val (magic, o1) = line(0)
      if (magic != "GV01") return Seq.empty
      val (nfS, o2) = line(o1)
      val nf = nfS.toInt
      val out = Seq.newBuilder[(Int, Int, Int)]
      var off = o2
      var k = 0
      while (k < nf) {
        val (lenS, oh) = line(off)
        val len = lenS.toInt
        // Long bounds math (the decodePnm overflow-bypass lesson): a
        // negative or Int-overflowing declared length must quarantine,
        // not crash the task
        if (len < 0 || oh.toLong + len > bytes.length) return Seq.empty
        out += ((k, oh, len))
        off = oh + len
        k += 1
      }
      out.result()
    } catch { case _: NumberFormatException => Seq.empty }
  }

  /** Parse a `GV01` container into (frame_idx, frame_bytes) slices —
    * [[indexVideoFrames]] plus a copy per frame. Null/malformed
    * containers yield no frames (quarantine path). */
  def parseVideoFrames(bytes: Array[Byte]): Seq[(Int, Array[Byte])] =
    indexVideoFrames(bytes).map { case (k, off, len) =>
      (k, java.util.Arrays.copyOfRange(bytes, off, off + len))
    }

  /** Frame sampling over a video binary column: index the container
    * ([[indexVideoFrames]] — offsets only, no copies), slice and
    * decode every `stride`-th frame with the REAL image codec, emit
    * per-frame geometry + a pixel checksum (proof actual pixels moved
    * through the decode, not just headers). One partition-local pass —
    * the `mapInPandas` batch shape; frames that fail to decode are
    * dropped (quarantine path at scale). Skipped frames are never
    * copied: the stride filter runs on the (idx, offset, len) table
    * before any slice is materialized.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
                   binCol: String, stride: Int): Dataset[FrameMeta] = {
    require(stride >= 1, "stride must be >= 1")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        indexVideoFrames(bytes).iterator
          .filter { case (k, _, _) => k % stride == 0 }
          .flatMap { case (k, off, len) =>
            val frameBytes = java.util.Arrays.copyOfRange(bytes, off, off + len)
            ImageCodec.decode(frameBytes).map { img =>
              FrameMeta(id, k.toLong, img.width, img.height, pixelChecksum(img))
            }
          }
      })
  }

  // ---- audio path: RIFF/WAV parse + windowed signal features ----

  /** Per-window signal features from the audio feature pass. `rms` is
    * emitted unrounded — gate queries round via Spark's `round(_, 4)`
    * so the engine/oracle rounding pairing is the same proven one the
    * knn scores use. */
  case class AudioWindow(doc_id: Long, window_idx: Long, n_samples: Long,
                         rms: Double, zero_crossings: Long, peak: Long)

  /** Deterministic synthetic audio: a REAL RIFF/WAVE container (16-bit
    * mono PCM, 8 kHz) whose 192 + n%64 samples derive from the ASCII
    * text — sample k = (byte(k mod n) − 79) · 257, spanning negative
    * and positive so zero crossings are meaningful (bytes < 'O' dip
    * below zero, bytes above rise over it). A LIST junk chunk sits
    * between fmt and data — often odd-length, so the decoder's
    * chunk-skip AND word-alignment padding are exercised on every row.
    * Every decoded sample is SQL-reproducible for the DuckDB oracle
    * while the pass itself exercises the real chunk walker.
    */
  def syntheticWav(text: String): Array[Byte] = {
    val bytes = text.getBytes("US-ASCII")
    val n = math.max(bytes.length, 1)
    val nsamp = 192 + n % 64
    // EXPLICIT COUPLING: audioPhashes drops clips under 65 samples,
    // but the multimodal_audio_dedup DuckDB oracle fingerprints every
    // document unconditionally — alignment rests on this generator
    // floor. If the formula above ever drops below 65, fail HERE at
    // generation time, not as a silent oracle divergence.
    require(nsamp >= 65,
      s"synthetic WAV floor broken: $nsamp samples < the 65-sample fingerprint minimum")
    val samples = Array.tabulate(nsamp)(k =>
      ((if (bytes.isEmpty) 0 else bytes(k % n) & 0xFF) - 79) * 257)
    AudioCodec.encodeWav(
      AudioClip(8000, 1, 16, samples, "wav"),
      junk = s"meta$n".getBytes("US-ASCII"))
  }

  val syntheticWavUdf = udf { (text: String) =>
    if (text == null) null else syntheticWav(text)
  }

  /** Windowed audio features over a WAV binary column: decode with the
    * REAL RIFF parser, split the signal into `winSize`-sample windows,
    * and per window emit RMS, strict zero crossings (adjacent pairs
    * within the window whose product is negative — boundary-straddling
    * pairs belong to no window), and peak |amplitude|. One
    * partition-local pass, same `mapInPandas` batch shape as the image
    * and video tiers; undecodable blobs are dropped (quarantine path).
    * Integer accumulation (Long sum of squares) keeps the per-window
    * math exact until the single final division + sqrt, so the oracle
    * reproduces the double bit-for-bit.
    */
  def audioFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                    binCol: String, winSize: Int = 64): Dataset[AudioWindow] = {
    require(winSize >= 2, "winSize must be >= 2")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).toSeq.flatMap { clip =>
          val s = clip.samples
          (0 until s.length by winSize).map { start =>
            val end = math.min(start + winSize, s.length)
            var sumSq = 0L; var zc = 0L; var peak = 0L
            var k = start
            while (k < end) {
              val v = s(k)
              sumSq += v.toLong * v
              if (math.abs(v).toLong > peak) peak = math.abs(v).toLong
              if (k + 1 < end && v.toLong * s(k + 1) < 0) zc += 1
              k += 1
            }
            val cnt = end - start
            AudioWindow(id, (start / winSize).toLong, cnt.toLong,
              math.sqrt(sumSq.toDouble / cnt), zc, peak)
          }
        }
      })
  }

  /** Energy-based audio segmentation (VAD-style): maximal runs of
    * consecutive windows whose RMS clears `rmsThreshold` become
    * segments — the islands-and-gaps aggregation (window_idx minus its
    * per-clip rank is constant within a run) every speech pipeline
    * uses to cut clips into utterances before transcription. Pure
    * window+aggregate over the [[audioFeatures]] table: no second
    * decode pass, shuffles keyed by clip. The threshold compares the
    * UNROUNDED rms — integer samples make the double pipeline
    * bit-identical across engines (the multimodal_audio trust model),
    * so the cut is replayable in SQL.
    * Output: one row per segment (doc_id, seg_start, seg_len).
    */
  def audioSegments(features: DataFrame, rmsThreshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    features.where(col("rms") >= rmsThreshold)
      .withColumn("grp", col("window_idx") -
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("window_idx"))))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("window_idx")).as("seg_start"), count(lit(1)).as("seg_len"))
      .drop("grp")
  }

  /** Per-clip RMS-per-window feature vectors — audio "embeddings" that
    * plug into the cosine ANN / near-dup operators exactly like the
    * image `featureVectors`. Fixed dimensionality `dim` (windows past
    * the clip pad with 0), L2-normalization left to the consumer. */
  def audioFeatureVectors(spark: SparkSession, df: DataFrame, idCol: String,
                          binCol: String, winSize: Int = 64, dim: Int = 4): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).map { clip =>
          val s = clip.samples
          val feats = Array.tabulate(dim) { w =>
            val start = w * winSize
            val end = math.min(start + winSize, s.length)
            if (start >= end) 0f
            else {
              var sumSq = 0L
              var k = start
              while (k < end) { sumSq += s(k).toLong * s(k); k += 1 }
              math.sqrt(sumSq.toDouble / (end - start)).toFloat
            }
          }
          (id, feats)
        }
      })
      .toDF(idCol, "features")
  }

  /** Luma-histogram feature vectors — image "embeddings" that plug into
    * the cosine ANN / near-dup operators unchanged. */
  def featureVectors(spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
                     bins: Int = 8): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map(img => (id, ImageCodec.lumaHistogram(img, bins)))
      })
      .toDF(idCol, "features")
  }
}
