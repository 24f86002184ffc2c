package graft.multimodal

import java.io.ByteArrayInputStream

/** A decoded raster: `pixels` is row-major, `channels` interleaved
  * (1 = gray, 3 = RGB), one byte per sample (maxval <= 255). */
final case class RasterImage(width: Int, height: Int, channels: Int,
                             maxval: Int, pixels: Array[Byte], format: String)

/** Real, zero-dependency image codec for the multimodal column path:
  * a hand-rolled Netpbm (PGM "P5" / PPM "P6") parser + encoder, with
  * the JDK's ImageIO handling PNG/JPEG/BMP/GIF. Replaces the round-1
  * `decodeStub` as promised in the roadmap — decode, resize,
  * re-encode, and feature extraction all operate on actual pixel data,
  * executed partition-local via `mapPartitions` (no per-row overhead,
  * no data leaves the executor).
  */
object ImageCodec {

  /** Container sniffing by magic bytes. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes.length < 4) "unknown"
    else if (bytes(0) == 'P' && bytes(1) == '5') "pgm"
    else if (bytes(0) == 'P' && bytes(1) == '6') "ppm"
    else if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) "jpeg"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else "unknown"
  }

  /** Netpbm header tokenizer: whitespace-separated tokens, '#' comments
    * run to end-of-line. Returns (tokens, offsetOfPixelData). */
  private def pnmTokens(bytes: Array[Byte], nTokens: Int): Option[(Array[String], Int)] = {
    val toks = new scala.collection.mutable.ArrayBuffer[String](nTokens)
    var i = 0
    val sb = new StringBuilder
    while (toks.length < nTokens && i < bytes.length) {
      val c = (bytes(i) & 0xFF).toChar
      if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
      else if (c.isWhitespace) {
        if (sb.nonEmpty) { toks += sb.toString; sb.clear() }
        i += 1
      } else { sb.append(c); i += 1 }
    }
    // exactly one whitespace byte separates the header from pixel data
    if (toks.length == nTokens) Some((toks.toArray, i)) else None
  }

  private def decodePnm(bytes: Array[Byte]): Option[RasterImage] = {
    val channels = if (bytes(1) == '5') 1 else 3
    val fmt = if (channels == 1) "pgm" else "ppm"
    pnmTokens(bytes, 4).flatMap { case (toks, off) =>
      try {
        val w = toks(1).toInt; val h = toks(2).toInt; val maxval = toks(3).toInt
        // Long math: a malicious header like "50000 50000" overflows an
        // Int payload size and would bypass the bounds check below.
        val n = w.toLong * h.toLong * channels.toLong
        if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 ||
            n > Int.MaxValue || off.toLong + n > bytes.length) None
        else Some(RasterImage(w, h, channels, maxval,
          java.util.Arrays.copyOfRange(bytes, off, off + n.toInt), fmt))
      } catch { case _: NumberFormatException => None }
    }
  }

  private def decodeImageIo(bytes: Array[Byte], fmt: String): Option[RasterImage] = {
    Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val o = (y * w + x) * 3
          out(o) = ((rgb >> 16) & 0xFF).toByte
          out(o + 1) = ((rgb >> 8) & 0xFF).toByte
          out(o + 2) = (rgb & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      RasterImage(w, h, 3, 255, out, fmt)
    }
  }

  /** Decode any supported container; None for garbage (a bad blob must
    * not kill the batch job — callers drop or quarantine). */
  def decode(bytes: Array[Byte]): Option[RasterImage] =
    if (bytes == null || bytes.length < 4) None
    else sniff(bytes) match {
      case "pgm" | "ppm" => decodePnm(bytes)
      case "unknown" => None
      case fmt => try decodeImageIo(bytes, fmt) catch { case _: Exception => None }
    }

  def encodePgm(img: RasterImage): Array[Byte] = {
    val gray = toGray(img)
    val header = s"P5\n${gray.width} ${gray.height}\n${gray.maxval}\n".getBytes("US-ASCII")
    header ++ gray.pixels
  }

  def encodePng(img: RasterImage): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val o = (y * img.width + x) * img.channels
        val (r, g, b) =
          if (img.channels == 1) { val v = img.pixels(o) & 0xFF; (v, v, v) }
          else (img.pixels(o) & 0xFF, img.pixels(o + 1) & 0xFF, img.pixels(o + 2) & 0xFF)
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  /** Nearest-neighbor resample: dst(y,x) = src(y*H/th, x*W/tw), integer
    * floor — cheap, deterministic, and exactly reproducible in SQL for
    * the oracle. */
  def resizeNearest(img: RasterImage, tw: Int, th: Int): RasterImage = {
    val out = new Array[Byte](tw * th * img.channels)
    var y = 0
    while (y < th) {
      val sy = y * img.height / th
      var x = 0
      while (x < tw) {
        val sx = x * img.width / tw
        val so = (sy * img.width + sx) * img.channels
        val dol = (y * tw + x) * img.channels
        var c = 0
        while (c < img.channels) { out(dol + c) = img.pixels(so + c); c += 1 }
        x += 1
      }
      y += 1
    }
    img.copy(width = tw, height = th, pixels = out)
  }

  def toGray(img: RasterImage): RasterImage =
    if (img.channels == 1) img
    else {
      val out = new Array[Byte](img.width * img.height)
      var i = 0
      while (i < out.length) {
        val o = i * 3
        // integer BT.601 luma
        val l = (299 * (img.pixels(o) & 0xFF) + 587 * (img.pixels(o + 1) & 0xFF) +
          114 * (img.pixels(o + 2) & 0xFF)) / 1000
        out(i) = l.toByte
        i += 1
      }
      img.copy(channels = 1, pixels = out, format = "pgm")
    }

  /** L1-normalized luma histogram — a deterministic "image embedding"
    * that plugs straight into the cosine ANN / near-dup operators. */
  def lumaHistogram(img: RasterImage, bins: Int = 8): Array[Float] = {
    val gray = toGray(img)
    val counts = new Array[Long](bins)
    var i = 0
    while (i < gray.pixels.length) {
      counts(((gray.pixels(i) & 0xFF) * bins) / 256) += 1
      i += 1
    }
    val total = math.max(gray.pixels.length, 1).toFloat
    counts.map(_ / total)
  }

  def meanLuma(img: RasterImage): Double = {
    val gray = toGray(img)
    if (gray.pixels.isEmpty) 0.0
    else {
      var acc = 0L; var i = 0
      while (i < gray.pixels.length) { acc += gray.pixels(i) & 0xFF; i += 1 }
      acc.toDouble / gray.pixels.length
    }
  }
}
