package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("media schema: binary column with typed metadata") {
    val media = Multimodal.asMedia(docs)
    val f = media.schema("media")
    assert(f.dataType == org.apache.spark.sql.types.BinaryType)
    assert(media.head().media.nonEmpty)
  }

  test("decode features: deterministic, n_bytes matches utf-8 length") {
    val feats = Multimodal.features(spark, docs, partitions = 8)
    val joined = feats.join(docs, "doc_id")
      .select(col("n_bytes"), length(encode(col("text"), "UTF-8")).cast("long").as("expected"))
    assert(joined.filter(col("n_bytes") =!= col("expected")).count() == 0)
    // deterministic across reruns and partitionings
    val a = feats.orderBy("doc_id").collect().toSeq
    val b = Multimodal.features(spark, docs, partitions = 3).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("frame sampling covers the blob in order") {
    val hashes = Multimodal.frameHashes("abcdefgh".getBytes, 4)
    assert(hashes.length == 4)
    assert(hashes.distinct.length == 4) // distinct chunks -> distinct hashes
    assert(Multimodal.frameHashes(Array.emptyByteArray, 4).isEmpty)
  }

  // hand-built REAL container bytes (format-spec layouts, no libraries)
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(24)
    out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    out.array()
  }
  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
    out.array()
  }
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 18 + 4 + 9)
    out.put(Array(0xff, 0xd8).map(_.toByte))                    // SOI
    out.put(Array(0xff, 0xe0).map(_.toByte)).putShort(18)       // APP0, len 18
    out.put(new Array[Byte](16))                                // APP0 body
    out.put(Array(0xff, 0xc0).map(_.toByte)).putShort(9.toShort) // SOF0, len 9
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)   // prec, H, W
    out.array()
  }

  test("real container headers parsed from genuine bytes; corrupt blobs -> None") {
    assert(MediaHeader.parse(pngBytes(640, 480)) ==
      Some(MediaHeader.ImageHeader("png", 640, 480)))
    assert(MediaHeader.parse(gifBytes(320, 200)) ==
      Some(MediaHeader.ImageHeader("gif", 320, 200)))
    assert(MediaHeader.parse(jpegBytes(1920, 1080)) ==
      Some(MediaHeader.ImageHeader("jpeg", 1920, 1080)))
    // total on garbage: truncated, desynchronised, empty
    assert(MediaHeader.parse(Array.emptyByteArray).isEmpty)
    assert(MediaHeader.parse(pngBytes(640, 480).take(10)).isEmpty)
    assert(MediaHeader.parse("plain text document".getBytes).isEmpty)
    assert(MediaHeader.parse(Array(0xff, 0xd8, 0x00, 0x00).map(_.toByte)).isEmpty)
    // corrupt dimensions (zero / sign-bit) -> None, never negative sizes
    assert(MediaHeader.parse(pngBytes(0, 480)).isEmpty)
    assert(MediaHeader.parse(pngBytes(-1, 480)).isEmpty) // 0xFFFFFFFF width
  }

  test("WAV header: fmt/data chunks parsed, duration derived, garbage -> None") {
    def wavBytes(ch: Int, rate: Int, bits: Int, dataLen: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(ch.toShort).putInt(rate)
        .putInt(rate * ch * bits / 8).putShort((ch * bits / 8).toShort)
        .putShort(bits.toShort)
      out.put("data".getBytes).putInt(dataLen).put(new Array[Byte](dataLen))
      out.array()
    }
    val h = MediaHeader.parseWav(wavBytes(2, 44100, 16, 44100 * 4)).get
    assert(h.channels == 2 && h.sampleRateHz == 44100 && h.bitsPerSample == 16)
    assert(math.abs(h.durationSec - 1.0) < 1e-9) // 1 second of stereo 16-bit
    assert(MediaHeader.parseWav("RIFFxxxx".getBytes).isEmpty)
    assert(MediaHeader.parseWav(wavBytes(2, 44100, 16, 100).take(20)).isEmpty)
    assert(MediaHeader.parseWav("not audio at all".getBytes).isEmpty)
    // crafted near-overflow chunk size must not wrap the index negative
    val crafted = java.nio.ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(12).put("WAVE".getBytes)
      .put("JUNK".getBytes).putInt(0x7FFFFFEF).array()
    assert(MediaHeader.parseWav(crafted).isEmpty) // total, no exception
    // a truncated data chunk still yields the header fields already seen
    val torn = wavBytes(1, 8000, 8, 1000).take(44 + 10)
    assert(MediaHeader.parseWav(torn).exists(_.sampleRateHz == 8000))
  }

  test("REAL WAV PCM sample decode: rms/peak/silence from hand-built samples") {
    def wav16(ch: Int, rate: Int, samples: Seq[Int], fmtTag: Int = 1): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16)
        .putShort(fmtTag.toShort).putShort(ch.toShort).putInt(rate)
        .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
      out.put("data".getBytes).putInt(dataLen)
      samples.foreach(s => out.putShort(s.toShort))
      out.array()
    }
    def row(b: Array[Byte]) = Multimodal.MediaRow(1L, b, "wav")

    // 16-bit mono: 0, +0.5, -0.5, ~+1.0 — every expected value exact in doubles
    val f = Multimodal.decodeWavSamples(
      row(wav16(1, 8000, Seq(0, 16384, -16384, 32767)))).get
    assert(f.channels == 1 && f.sample_rate == 8000 && f.n_frames == 4)
    val xs = Seq(0.0, 0.5, -0.5, 32767 / 32768.0)
    assert(math.abs(f.rms - math.sqrt(xs.map(x => x * x).sum / 4)) < 1e-12)
    assert(f.peak == 32767 / 32768.0)
    assert(f.silence_ratio == 0.25) // only the 0 sample is under 0.01

    // 8-bit unsigned: 128 -> 0.0, 255 -> max positive, 0 -> -1.0
    def wav8(samples: Seq[Int]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(44 + samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + samples.length).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      out.put("data".getBytes).putInt(samples.length)
      samples.foreach(s => out.put(s.toByte))
      out.array()
    }
    val f8 = Multimodal.decodeWavSamples(row(wav8(Seq(128, 255, 0, 128)))).get
    assert(f8.peak == 1.0)                 // the 0 byte is -1.0 exactly
    assert(f8.silence_ratio == 0.5)        // the two 128 bytes are 0.0
    assert(f8.n_frames == 4)

    // stereo: frames = samples / channels
    val st = Multimodal.decodeWavSamples(row(wav16(2, 44100, Seq(0, 0, 100, -100)))).get
    assert(st.channels == 2 && st.n_frames == 2)

    // torn data chunk decodes the present bytes only (total, no throw)
    val torn = wav16(1, 8000, Seq(0, 16384, -16384, 32767)).dropRight(4)
    val ft = Multimodal.decodeWavSamples(row(torn)).get
    assert(ft.n_frames == 2 && ft.peak == 0.5)

    // float WAV (format 3) and compressed tags need a codec -> None
    assert(Multimodal.decodeWavSamples(row(wav16(1, 8000, Seq(0), fmtTag = 3))).isEmpty)
    assert(Multimodal.decodeWavSamples(row(wav16(1, 8000, Seq(0), fmtTag = 85))).isEmpty)
    assert(Multimodal.decodeWavSamples(row("not a wav".getBytes)).isEmpty)

    // distributed shape: undecodable blobs drop out, decodable survive
    import spark.implicits._
    val ds = Seq(
      Multimodal.MediaRow(1L, wav16(1, 8000, Seq(0, 16384)), "wav"),
      Multimodal.MediaRow(2L, "garbage".getBytes, "wav"),
      Multimodal.MediaRow(3L, wav8(Seq(128, 0)), "wav")).toDS()
    val out = Multimodal.audioFeatures(ds).collect().map(_.doc_id).sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("MP4 header: moov/mvhd walked for timescale+duration, garbage -> None") {
    def mp4Bytes(timescale: Int, duration: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(16 + 40) // big-endian default
      out.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      out.putInt(40).put("moov".getBytes)
      out.putInt(32).put("mvhd".getBytes).putInt(0) // version 0 + flags
      out.putInt(0).putInt(0)                       // creation, modification
      out.putInt(timescale).putInt(duration).putInt(0)
      out.array()
    }
    val h = MediaHeader.parseMp4(mp4Bytes(600, 3000)).get
    assert(h.timescale == 600 && h.duration == 3000)
    assert(math.abs(h.durationSec - 5.0) < 1e-9)
    assert(MediaHeader.parseMp4("not a video".getBytes).isEmpty)
    assert(MediaHeader.parseMp4(mp4Bytes(600, 3000).take(20)).isEmpty)
    assert(MediaHeader.parseMp4(mp4Bytes(0, 3000)).isEmpty) // zero timescale
    // crafted box size below the 8-byte header floor must bail, not loop
    val bad = mp4Bytes(600, 3000)
    bad(16) = 0; bad(17) = 0; bad(18) = 0; bad(19) = 1 // moov "size" = 1
    assert(MediaHeader.parseMp4(bad).isEmpty)
  }

  test("decode pipeline uses real header dimensions for image blobs") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, pngBytes(640, 480), "png"),
      Multimodal.MediaRow(2L, "just text".getBytes("UTF-8"), "txt")
    ).toDS()
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).width == 640 && feats(1L).height == 480) // from the header
    assert(feats(2L).width == "just text".getBytes.length % 640) // stub fallback
  }

  test("REAL pixel decode: dims, resize-stable perceptual hash, lossy JPEG, corrupt bytes") {
    import spark.implicits._
    // real encoded images, not crafted headers: BufferedImage → ImageIO
    def imageBytes(w: Int, h: Int, fmt: String)(f: (Int, Int) => Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, fmt, bos)
      bos.toByteArray
    }
    def gradient(w: Int)(x: Int, y: Int): Int = { val v = (x * 255) / w; (v << 16) | (v << 8) | v }
    def checker(x: Int, y: Int): Int = if (((x / 8) + (y / 8)) % 2 == 0) 0xffffff else 0
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

    val media = Seq(
      Multimodal.MediaRow(1L, imageBytes(64, 64, "png")(gradient(64)), "png"),
      Multimodal.MediaRow(2L, imageBytes(128, 128, "png")(gradient(128)), "png"),
      Multimodal.MediaRow(3L, imageBytes(64, 64, "png")(checker), "png"),
      Multimodal.MediaRow(4L, imageBytes(64, 48, "jpg")(gradient(64)), "jpg"),
      Multimodal.MediaRow(5L, Array[Byte](1, 2, 3, 4), "png") // undecodable
    ).toDS()
    val feats = Multimodal.imageFeatures(media).collect().map(f => f.doc_id -> f).toMap

    assert(feats(1L).width == 64 && feats(1L).height == 64)   // real decode
    assert(feats(4L).width == 64 && feats(4L).height == 48)   // lossy JPEG decodes too
    assert(!feats.contains(5L))                               // corrupt blob quarantined
    // perceptual hash is resize-stable: same gradient at 2x resolution
    assert(hamming(feats(1L).ahash, feats(2L).ahash) <= 8,
      s"resize moved ahash ${hamming(feats(1L).ahash, feats(2L).ahash)} bits")
    // and pattern-sensitive: gradient vs checkerboard far apart
    assert(hamming(feats(1L).ahash, feats(3L).ahash) >= 16)
    // jpeg of the same gradient lands near the png of it
    assert(hamming(feats(1L).ahash, feats(4L).ahash) <= 12)
  }

  test("format gate: text content that LOOKS like a GIF header stays on the stub path") {
    import spark.implicits._
    val trap = "GIF89a document about image formats"
    val feats = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(9L, trap.getBytes("UTF-8"), "txt")).toDS()).head()
    // the q45 oracle's stub formula, NOT le16 bytes from the fake header
    assert(feats.width == trap.getBytes.length % 640)
    assert(feats.height == 'G'.toInt % 480)
  }

  test("gray PNG round trip is lossless; dHash56 flips <= 1 bit on a one-pixel bump") {
    val rnd = new scala.util.Random(3)
    val px = Array.fill(9 * 7)(rnd.nextInt(256))
    val bytes = Multimodal.encodeGrayPng(px, 9, 7)
    // decode back through ImageIO and compare every red channel
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 9 && img.getHeight == 7)
    for (y <- 0 until 7; x <- 0 until 9)
      assert(((img.getRGB(x, y) >> 16) & 0xff) == px(y * 9 + x), s"($x,$y)")
    val sig = Multimodal.decodeDhash56(
      Multimodal.MediaRow(1L, bytes, "png")).get
    // reference dhash from the raw pixels
    var expect = 0L
    for (y <- 0 until 7; x <- 0 until 8)
      if (px(y * 9 + x + 1) > px(y * 9 + x)) expect |= 1L << (y * 8 + x)
    assert(sig == expect)
    assert((sig >>> 56) == 0L, "sign-safe: top 8 bits clear")
    // bump pixel (0,0): only bit (0,0) may change
    val px2 = px.clone(); px2(0) = (px2(0) + 128) % 256
    val sig2 = Multimodal.decodeDhash56(
      Multimodal.MediaRow(2L, Multimodal.encodeGrayPng(px2, 9, 7), "png")).get
    assert(java.lang.Long.bitCount(sig ^ sig2) <= 1)
    // undecodable bytes quarantine
    assert(Multimodal.decodeDhash56(
      Multimodal.MediaRow(3L, Array[Byte](1, 2, 3), "png")).isEmpty)
    // oversize images are rejected (the 56-bit packing bound)
    val big = Multimodal.encodeGrayPng(Array.fill(10 * 7)(0), 10, 7)
    assert(Multimodal.decodeDhash56(Multimodal.MediaRow(4L, big, "png")).isEmpty)
  }

  test("WAV raw-sample round trip is exact; energy delta-hash flips <= 1 bit on a one-sample bump") {
    val rnd = new scala.util.Random(17)
    val samples = Array.fill(114)(rnd.nextInt(65536) - 32768)
    val wav = Multimodal.encodeWavPcm16(samples.toSeq, 1, 8000)
    val back = Multimodal.decodeWavRawSamples16(
      Multimodal.MediaRow(1L, wav, "wav")).get
    assert(back.toSeq == samples.toSeq, "lossless 16-bit PCM round trip")
    val sig = Multimodal.energyDeltaHash56(back)
    // reference: exact integer frame energies
    val es = (0 until 57).map(f =>
      samples(2 * f).toLong * samples(2 * f) +
        samples(2 * f + 1).toLong * samples(2 * f + 1))
    var expect = 0L
    for (f <- 1 until 57) if (es(f) > es(f - 1)) expect |= 1L << (f - 1)
    assert(sig == expect)
    assert((sig >>> 56) == 0L, "sign-safe")
    // bump sample 0: only frame 0's energy moves -> only bit 0 can flip
    val s2 = samples.clone(); s2(0) = ((s2(0) + 30000 + 32768) % 65536) - 32768
    val sig2 = Multimodal.energyDeltaHash56(s2)
    assert(java.lang.Long.bitCount(sig ^ sig2) <= 1)
    // 8-bit / non-PCM inputs quarantine
    assert(Multimodal.decodeWavRawSamples16(
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3, 4), "wav")).isEmpty)
  }
}
