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
}
