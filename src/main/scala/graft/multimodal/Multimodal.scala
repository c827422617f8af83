package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): images/audio/video as
  * opaque `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * environment): [[MediaFeatures]] fields below `nBytes`/`headByte` are a
  * deterministic fake derived from the bytes. Everything around the stub —
  * schema, Dataset encoders, per-partition batch shape, partition sizing —
  * is the real production plumbing: swap `decodeStub` for a JNI/javacv call
  * and nothing else changes.
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

  /** End-to-end fixture pipeline: documents → media → features DataFrame
    * (frame_hashes dropped for the oracle-checked projection). */
  def features(spark: SparkSession, docs: DataFrame, partitions: Int = 0): DataFrame = {
    val media = asMedia(docs)
    val sized = if (partitions > 0) media.repartition(partitions) else media
    decodeFeatures(sized).toDF()
  }
}
