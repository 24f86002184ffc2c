package graft.multimodal

/** A decoded PCM clip: `samples` is channel-interleaved, one Int per
  * sample (sign-extended from the container's 16-bit or 8-bit width). */
final case class AudioClip(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           samples: Array[Int], format: String)

/** Real, zero-dependency audio codec for the multimodal column path: a
  * hand-rolled RIFF/WAVE chunk walker + PCM decoder and encoder — the
  * audio sibling of [[ImageCodec]] (reference treats media as opaque
  * blobs; the decode tier is this engine's extension). The parser
  * walks the chunk list like a real reader must: unknown chunks are
  * skipped by declared length, odd-length chunks consume their RIFF
  * word-alignment pad byte, and any declared length that escapes the
  * buffer quarantines the blob (None) instead of crashing the task —
  * the same Long-bounds discipline as `decodePnm` / `indexVideoFrames`.
  */
object AudioCodec {

  /** Container sniffing by magic bytes. */
  def sniff(bytes: Array[Byte]): String =
    if (bytes != null && bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else "unknown"

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  /** Unsigned 32-bit read as Long — a 3 GiB declared chunk length must
    * not wrap negative and bypass the bounds checks. */
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) | ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  private def fourCC(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Decode a RIFF/WAVE blob to PCM. Accepts format tag 1 (integer
    * PCM) at 8 or 16 bits, any channel count; anything else — and any
    * malformed framing — yields None (quarantine path). */
  def decode(bytes: Array[Byte]): Option[AudioClip] = {
    if (bytes == null || sniff(bytes) != "wav") return None
    val riffEnd = 8L + u32le(bytes, 4)
    if (riffEnd > bytes.length) return None
    val end = riffEnd.toInt
    var off = 12
    var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= end) {
      val id = fourCC(bytes, off)
      val len = u32le(bytes, off + 4)
      if (off + 8L + len > end) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          fmtTag = u16le(bytes, off + 8)
          channels = u16le(bytes, off + 10)
          rate = u32le(bytes, off + 12).toInt
          bits = u16le(bytes, off + 22)
        case "data" =>
          dataOff = off + 8; dataLen = len.toInt
        case _ => // unknown chunk (LIST, fact, ...) — skip by length
      }
      // RIFF chunks are word-aligned: odd lengths carry a pad byte
      off += 8 + len.toInt + (len.toInt & 1)
    }
    if (fmtTag != 1 || channels < 1 || rate <= 0 || dataOff < 0) return None
    bits match {
      case 16 =>
        val n = dataLen / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = (u16le(bytes, dataOff + 2 * i) << 16) >> 16 // sign-extend
          i += 1
        }
        Some(AudioClip(rate, channels, 16, out, "wav"))
      case 8 => // 8-bit WAV is unsigned, centered at 128
        val out = new Array[Int](dataLen)
        var i = 0
        while (i < dataLen) { out(i) = (bytes(dataOff + i) & 0xFF) - 128; i += 1 }
        Some(AudioClip(rate, channels, 8, out, "wav"))
      case _ => None
    }
  }

  /** Encode 16-bit PCM to RIFF/WAVE. `junk` (when non-empty) is
    * written as a LIST chunk between fmt and data — same role as the
    * real encoder in `syntheticVideo`: container framing (including
    * the odd-length pad byte) comes from the encoder the decoder is
    * tested against, so the two can never drift. */
  def encodeWav(clip: AudioClip, junk: Array[Byte] = Array.empty): Array[Byte] = {
    require(clip.bitsPerSample == 16, "encoder emits 16-bit PCM")
    val dataLen = clip.samples.length * 2
    val junkChunk = if (junk.isEmpty) 0 else 8 + junk.length + (junk.length & 1)
    val riffLen = 4 + (8 + 16) + junkChunk + (8 + dataLen)
    val bos = new java.io.ByteArrayOutputStream(8 + riffLen)
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"), 0, 4)
    tag("RIFF"); w32(riffLen); tag("WAVE")
    tag("fmt "); w32(16)
    w16(1); w16(clip.channels); w32(clip.sampleRate)
    w32(clip.sampleRate * clip.channels * 2) // byte rate
    w16(clip.channels * 2); w16(16)          // block align, bits
    if (junk.nonEmpty) {
      tag("LIST"); w32(junk.length)
      bos.write(junk, 0, junk.length)
      if ((junk.length & 1) == 1) bos.write(0) // pad to word boundary
    }
    tag("data"); w32(dataLen)
    var i = 0
    while (i < clip.samples.length) { w16(clip.samples(i) & 0xFFFF); i += 1 }
    bos.toByteArray
  }
}
