package graft.multimodal

/** Real container-header decoding — pure byte inspection, no media
  * libraries. Pixel decode stays stubbed in this environment, but the
  * header fields a curation pipeline actually filters on (format, width,
  * height — "drop images under 64px", "keep aspect < 3") come from the
  * genuine container bytes:
  *
  *  - PNG: IHDR is mandatory-first, so width/height sit at fixed offsets
  *    16/20 (big-endian) after the 8-byte signature.
  *  - GIF: logical screen descriptor at offsets 6/8 (little-endian).
  *  - JPEG: walk the marker segments to the first SOFn (C0–CF minus the
  *    non-frame C4/C8/CC); height/width are big-endian at +5/+7 into it.
  *
  * All three parsers are total: any malformed/truncated input returns
  * None, never throws — at 100 TB the corrupt blobs ARE the interesting
  * rows and they must flow to quarantine, not kill the stage.
  */
object MediaHeader {

  final case class ImageHeader(format: String, width: Int, height: Int)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def parse(bytes: Array[Byte]): Option[ImageHeader] =
    parsePng(bytes).orElse(parseGif(bytes)).orElse(parseJpeg(bytes))

  // corrupt headers must flow to None, not to nonsense dimensions: be32 of
  // bytes >= 0x80000000 is a negative Int, and 0 is not a legal image size
  private def dims(format: String, w: Int, h: Int): Option[ImageHeader] =
    if (w > 0 && h > 0) Some(ImageHeader(format, w, h)) else None

  def parsePng(b: Array[Byte]): Option[ImageHeader] =
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
      new String(b, 12, 4, "US-ASCII") == "IHDR")
      dims("png", be32(b, 16), be32(b, 20))
    else None

  def parseGif(b: Array[Byte]): Option[ImageHeader] =
    if (b.length >= 10 && (new String(b, 0, 6, "US-ASCII") == "GIF87a" ||
      new String(b, 0, 6, "US-ASCII") == "GIF89a"))
      dims("gif", le16(b, 6), le16(b, 8))
    else None

  final case class AudioHeader(format: String, channels: Int,
      sampleRateHz: Int, bitsPerSample: Int, dataBytes: Long) {
    /** Seconds of audio, from the header alone. */
    def durationSec: Double = {
      val byteRate = sampleRateHz.toLong * channels * (bitsPerSample / 8)
      if (byteRate <= 0) 0.0 else dataBytes.toDouble / byteRate
    }
  }

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""

  /** WAV (RIFF) header: walk the chunk list for `fmt ` (channels, sample
    * rate, bit depth) and `data` (payload size → duration). Total on
    * malformed input. */
  def parseWav(b: Array[Byte]): Option[AudioHeader] =
    parseWavPcm(b).map(_.header)

  /** The header plus what SAMPLE decode needs: the fmt chunk's audio-format
    * tag (1 = integer PCM — decodable with no codec) and the data payload's
    * byte offset/length within the blob. */
  final case class WavPcm(header: AudioHeader, audioFormat: Int,
      dataOffset: Int, dataLen: Int)

  def parseWavPcm(b: Array[Byte]): Option[WavPcm] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, ch, rate, bits)
    var dataBytes = -1L
    var dataOffset = -1
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = tag(b, i)
      val size = le32(b, i + 4) // 0..2^32-1 as Long — never negative
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length)
        fmt = Some((le16(b, i + 8), le16(b, i + 10), le32(b, i + 12).toInt, le16(b, i + 22)))
      else if (id == "data") { dataBytes = size; dataOffset = i + 8 }
      // advance in LONG arithmetic: a crafted 32-bit size would overflow an
      // Int index negative and re-enter the loop out of bounds. Chunks are
      // word-aligned (odd sizes carry a pad byte); a size running past the
      // blob just ends the walk — truncated tails are normal in the wild
      // and the header chunks already seen remain valid.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    fmt.collect { case (af, ch, rate, bits) if dataBytes >= 0 =>
      // payload may be torn mid-chunk (truncated download): clamp the
      // decodable length to the bytes actually present
      val avail = math.max(0L, math.min(dataBytes, (b.length - dataOffset).toLong))
      WavPcm(AudioHeader("wav", ch, rate, bits, dataBytes), af, dataOffset, avail.toInt)
    }
  }

  final case class VideoHeader(format: String, timescale: Long,
      duration: Long) {
    def durationSec: Double =
      if (timescale <= 0) 0.0 else duration.toDouble / timescale
  }

  private def be32L(b: Array[Byte], i: Int): Long = be32(b, i) & 0xffffffffL

  /** MP4/ISO-BMFF: walk the top-level box list to `moov`, then its children
    * to `mvhd` (version 0: 32-bit timescale/duration at +12/+16 past the
    * box header; version 1: 64-bit at +20/+24). Total on malformed input;
    * box sizes advance in Long arithmetic so crafted sizes can't wrap the
    * index. */
  def parseMp4(b: Array[Byte]): Option[VideoHeader] = {
    // an MP4 opens with an ftyp (or styp) box in practice
    if (b.length < 12 || (tag(b, 4) != "ftyp" && tag(b, 4) != "styp")) return None
    def walk(from: Long, until: Long, want: String): Option[Long] = {
      var i = from
      while (i + 8 <= until) {
        val size = be32L(b, i.toInt)
        if (size < 8) return None // size64/size0 forms unsupported -> bail
        if (tag(b, i.toInt + 4) == want) return Some(i)
        i += size
      }
      None
    }
    val end = b.length.toLong
    for {
      moov <- walk(0L, end, "moov")
      moovEnd = math.min(end, moov + be32L(b, moov.toInt))
      mvhd <- walk(moov + 8, moovEnd, "mvhd")
      if mvhd + 32 <= end
      version = b(mvhd.toInt + 8) & 0xff
      header <- version match {
        case 0 =>
          Some(VideoHeader("mp4", be32L(b, mvhd.toInt + 20), be32L(b, mvhd.toInt + 24)))
        case 1 if mvhd + 44 <= end =>
          val ts = be32L(b, mvhd.toInt + 28)
          val dur = (be32L(b, mvhd.toInt + 32) << 32) | be32L(b, mvhd.toInt + 36)
          Some(VideoHeader("mp4", ts, dur))
        case _ => None
      }
      if header.timescale > 0
    } yield header
  }

  def parseJpeg(b: Array[Byte]): Option[ImageHeader] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynchronised marker stream
      val m = b(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI / scan start: no SOF seen
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (len < 7) return None
          return dims("jpeg", be16(b, i + 7), be16(b, i + 5))
        }
        i += 2 + len
      }
    }
    None
  }
}
