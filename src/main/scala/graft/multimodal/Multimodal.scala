package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): images/audio/video as
  * opaque `binary` columns with typed metadata, processed per-partition.
  *
  * Decode coverage: IMAGE pixel decode is REAL for the formats the JDK
  * itself reads ([[decodeImage]]/[[imageFeatures]] — PNG/JPEG/GIF/BMP via
  * javax.imageio: decode → 8×8 area resize → perceptual average-hash).
  * AUDIO sample decode is REAL for WAV integer PCM
  * ([[decodeWavSamples]]/[[audioFeatures]] — PCM needs no codec, only the
  * RIFF chunk walk [[MediaHeader.parseWavPcm]] already does: 8/16-bit
  * samples → RMS loudness, peak, silence ratio). Container HEADERS are
  * parsed for PNG/GIF/JPEG/WAV/MP4 ([[MediaHeader]]). Only COMPRESSED
  * audio (MP3/AAC) and video sample decode stay stubbed — those genuinely
  * need codecs the JDK/environment lacks; [[decodeStub]]'s fields below
  * `nBytes`/`headByte` are a deterministic fake for those. Everything
  * around the stub — schema, Dataset encoders, per-partition batch shape,
  * partition sizing — is the real production plumbing: swap `decodeStub`
  * for a JNI/javacv call and nothing else changes.
  *
  * Scale notes: media blobs make row sizes KB-MB, so balanced decode
  * parallelism comes from `repartition(n)` before [[decodeFeatures]] (or
  * `spark.sql.files.maxPartitionBytes` when reading real media parquet);
  * mapPartitions amortises any per-batch decoder init across the partition,
  * the same shape PySpark's mapInPandas gives Python decoders.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, head_cp: Int,
      width: Int, height: Int, frame_hashes: Seq[Long])

  /** Fixture adapter: treat each document's text bytes as a media blob. */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
      lit("txt").as("format")).as[MediaRow]
  }

  /** Decoder: REAL container-header decode ([[MediaHeader]] — PNG/GIF/JPEG
    * width/height from the genuine bytes), with the PIXEL decode stubbed
    * (no image libraries in this environment): for non-image blobs the
    * dimensions fall back to a deterministic fake derived from the bytes.
    * Replace the fallback with a libjpeg/ffmpeg binding in production —
    * the signature (bytes in, typed features out) is the contract. */
  private[multimodal] def decodeStub(m: MediaRow): MediaFeatures = {
    val n = m.media.length.toLong
    // first code point (not first byte) — decoded from a 4-byte prefix: a
    // UTF-8 code point is at most 4 bytes, so this is O(1), not O(blob)
    val head =
      if (m.media.isEmpty) 0
      else new String(m.media, 0, math.min(4, m.media.length), "UTF-8").codePointAt(0)
    // header probe is gated on the row's FORMAT metadata: a text document
    // whose content merely starts with "GIF89a" must not decode as an
    // image (and must keep matching the q45 oracle's stub formula)
    val probed = if (m.format == "txt") None else MediaHeader.parse(m.media)
    val (width, height) = probed match {
      case Some(h) => (h.width, h.height)        // real header fields
      case None => ((n % 640).toInt, head % 480) // stub for non-image bytes
    }
    MediaFeatures(m.doc_id, n, head, width, height, frameHashes(m.media, 4))
  }

  /** "Frame sampling": split the blob into `frames` equal chunks and hash
    * each — the per-frame feature extraction shape for video. */
  private[multimodal] def frameHashes(bytes: Array[Byte], frames: Int): Seq[Long] =
    if (bytes.isEmpty) Seq.empty
    else {
      val step = math.max(1, bytes.length / frames)
      (0 until frames).map { f =>
        val from = f * step
        val until = math.min(bytes.length, from + step)
        if (from >= bytes.length) 0L
        else java.util.Arrays.hashCode(java.util.Arrays.copyOfRange(bytes, from, until)).toLong
      }
    }

  /** Per-partition decode: the distributed feature-extraction pass. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (amortised across batch)
      rows.map(decodeStub)
    }
  }

  final case class ImageFeatures(
      doc_id: Long, width: Int, height: Int, mean_luma: Double, ahash: Long)

  /** REAL pixel decode for the image containers the JDK itself can read
    * (PNG/JPEG/GIF/BMP via `javax.imageio` — part of Java SE, no external
    * libraries): decode the pixels, area-resize to an 8×8 grayscale patch
    * (the resize step), and emit mean luminance plus the 64-bit
    * average-hash perceptual fingerprint (bit i set iff patch luma i is
    * above the patch mean) — the standard near-duplicate-image key, which
    * slots into [[graft.dedup.Dedup.duplicateClusters]] exactly like
    * SimHash does for text. Returns None for bytes no installed reader
    * accepts (WAV PCM audio has its own real decoder,
    * [[decodeWavSamples]]; compressed audio/video stay stub-only).
    * Headless-safe: BufferedImage drawing needs no display. */
  def decodeImage(m: MediaRow): Option[ImageFeatures] = {
    imageIoMemCache // in-memory stream cache (see the val's scaladoc)
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media)))
      catch { case _: Exception => None }
    img.map { bi =>
      val small = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(bi, 0, 0, 8, 8, null)
      } finally g.dispose()
      val lumas = for (y <- 0 until 8; x <- 0 until 8) yield {
        val rgb = small.getRGB(x, y)
        0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
      }
      val mean = lumas.sum / 64.0
      val ahash = lumas.zipWithIndex.foldLeft(0L) {
        case (acc, (l, i)) => if (l > mean) acc | (1L << i) else acc
      }
      ImageFeatures(m.doc_id, bi.getWidth, bi.getHeight, mean, ahash)
    }
  }

  /** Distributed image decode: one ImageIO pass per partition; undecodable
    * blobs drop out (flatMap), mirroring a production pipeline's
    * quarantine-on-decode-failure. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(rows => rows.flatMap(decodeImage))
  }

  final case class AudioFeatures(
      doc_id: Long, channels: Int, sample_rate: Int, n_frames: Long,
      rms: Double, peak: Double, silence_ratio: Double)

  /** REAL sample decode for WAV integer PCM — uncompressed PCM needs no
    * codec, just the RIFF layout [[MediaHeader.parseWavPcm]] parses: 16-bit
    * signed / 8-bit unsigned samples normalised to [-1, 1], folded in one
    * pass into the features an audio-curation pipeline filters on (RMS
    * loudness, peak amplitude, silence ratio at |x| < 0.01). A torn data
    * chunk decodes the bytes that are present (quarantining torn blobs is
    * the caller's policy call, the decoder stays total). Returns None for
    * compressed/float formats (format tag != 1) or exotic bit depths —
    * THOSE are the codec-requiring cases that stay with [[decodeStub]]. */
  def decodeWavSamples(m: MediaRow): Option[AudioFeatures] =
    MediaHeader.parseWavPcm(m.media).flatMap { w =>
      val bits = w.header.bitsPerSample
      if (w.audioFormat != 1 || (bits != 8 && bits != 16) || w.header.channels <= 0)
        None
      else {
        val bytesPer = bits / 8
        val nSamples = w.dataLen / bytesPer
        var i = 0
        var sumSq = 0.0
        var peak = 0.0
        var quiet = 0L
        while (i < nSamples) {
          val off = w.dataOffset + i * bytesPer
          val x =
            if (bits == 16)
              (((m.media(off) & 0xff) | ((m.media(off + 1) & 0xff) << 8)).toShort) / 32768.0
            else ((m.media(off) & 0xff) - 128) / 128.0
          val ax = math.abs(x)
          sumSq += x * x
          if (ax > peak) peak = ax
          if (ax < 0.01) quiet += 1
          i += 1
        }
        Some(AudioFeatures(m.doc_id, w.header.channels, w.header.sampleRateHz,
          (nSamples / w.header.channels).toLong,
          if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples),
          peak,
          if (nSamples == 0) 1.0 else quiet.toDouble / nSamples))
      }
    }

  /** REAL raw-sample decode for 16-bit PCM WAV — the integer samples
    * themselves (the [[decodeWavSamples]] feature fold normalises to
    * doubles; fingerprinting needs the exact ints). None for anything
    * but 16-bit integer PCM. */
  def decodeWavRawSamples16(m: MediaRow): Option[Array[Int]] =
    MediaHeader.parseWavPcm(m.media).flatMap { w =>
      if (w.audioFormat != 1 || w.header.bitsPerSample != 16) None
      else {
        val n = w.dataLen / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val off = w.dataOffset + i * 2
          out(i) =
            ((m.media(off) & 0xff) | ((m.media(off + 1) & 0xff) << 8)).toShort.toInt
          i += 1
        }
        Some(out)
      }
    }

  /** 56-bit audio fingerprint in EXACT integer arithmetic: frame the
    * samples into 57 frames of 2, energy(f) = Σ s² (≤ 2·32768² per frame
    * — exact in Long), bit i set iff energy(i+1) > energy(i). The audio
    * sibling of the image dHash ([[decodeDhash56]]): sign-of-delta over
    * a coarse envelope survives amplitude-preserving re-encodes, and the
    * integer comparisons make it oracle-recomputable. Inputs shorter
    * than 114 samples hash their available full frames. */
  def energyDeltaHash56(samples: Array[Int]): Long = {
    val nFrames = math.min(57, samples.length / 2)
    var sig = 0L
    var prev = 0L
    var f = 0
    while (f < nFrames) {
      val a = samples(2 * f).toLong
      val b = samples(2 * f + 1).toLong
      val e = a * a + b * b
      if (f > 0 && e > prev) sig |= 1L << (f - 1)
      prev = e
      f += 1
    }
    sig
  }

  /** Distributed audio decode: same flatMap-quarantine shape as
    * [[imageFeatures]] — undecodable blobs drop out. */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(rows => rows.flatMap(decodeWavSamples))
  }

  /** Minimal RIFF/WAVE writer for 16-bit integer PCM (values are truncated
    * to Short) — the encode half of the round trip [[decodeWavSamples]]
    * closes; the q89 gate verifies encode → decode → features against an
    * oracle that never sees the WAV bytes. */
  def encodeWavPcm16(samples: Seq[Int], channels: Int, rateHz: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rateHz)
      .putInt(rateHz * channels * 2).putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(x => out.putShort(x.toShort))
    out.array()
  }

  /** Grayscale PNG from integer pixel values (row-major, v ∈ 0..255,
    * r=g=b=v) — REAL ImageIO encoding, losslessly round-trippable. The
    * encode half of the trip [[decodeDhash56]] closes; the q133 gate
    * verifies encode → decode → hash against an oracle that recomputes
    * the hash from the pixel formula and never sees the PNG bytes. */
  /** ImageIO's default stream cache is a TEMP FILE per read/write — at
    * corpus scale that is one file-create+delete per image under every
    * executor thread, a kernel-contended super-linear tax the x30 trend
    * caught on q133 (ratio 41 at factor 30 with the disk cache; the
    * in-memory cache restores the linear codec pass). Process-wide, set
    * once: the blobs here are KB-sized, exactly what the memory cache is
    * for. */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  def encodeGrayPng(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    imageIoMemCache
    require(pixels.length == w * h, s"expected ${w * h} pixels")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < pixels.length) {
      val v = pixels(i) & 0xff
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real-decode difference hash over a (w≤9)×(h≤7) grayscale image: bit
    * y*8+x set iff pixel(x+1, y) > pixel(x, y) — the standard dHash
    * perceptual key, here in PURE INTEGER comparisons (the red channel of
    * the lossless decode), so a DuckDB oracle can recompute it from the
    * pixel formula with zero FP-portability hazard (the aHash in
    * [[decodeImage]] needs float luma + a mean, which is spec-gated
    * instead). ≤ 56 bits keeps the packed signature sign-safe in BIGINT
    * on both engines (the q96 60-bit discipline). None for undecodable
    * bytes (quarantine-on-decode-failure). */
  def decodeDhash56(m: MediaRow): Option[Long] = {
    imageIoMemCache
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media)))
      catch { case _: Exception => None }
    img.filter(bi => bi.getWidth <= 9 && bi.getHeight <= 7).map { bi =>
      var sig = 0L
      var y = 0
      while (y < bi.getHeight) {
        var x = 0
        while (x < bi.getWidth - 1) {
          val a = (bi.getRGB(x, y) >> 16) & 0xff
          val b = (bi.getRGB(x + 1, y) >> 16) & 0xff
          if (b > a) sig |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      sig
    }
  }

  /** End-to-end fixture pipeline: documents → media → features DataFrame
    * (frame_hashes dropped for the oracle-checked projection). */
  def features(spark: SparkSession, docs: DataFrame, partitions: Int = 0): DataFrame = {
    val media = asMedia(docs)
    val sized = if (partitions > 0) media.repartition(partitions) else media
    decodeFeatures(sized).toDF()
  }
}
