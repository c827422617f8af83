package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MediaFeatureStoreSpec extends SparkSpec {
  import spark.implicits._

  private def feats(rows: (Long, Long)*) = rows.toDF("doc_id", "sig")

  test("append/read: shards union; replayed shard id is a guarded no-op") {
    val dir = tmpDir("mfs_basic")
    assert(MediaFeatureStore.append(spark, dir, feats(1L -> 10L, 2L -> 20L),
      "dhash56", "s0"))
    assert(MediaFeatureStore.append(spark, dir, feats(3L -> 30L),
      "dhash56", "s1"))
    // replay with DIFFERENT rows must not fold (the shard's commit wins)
    assert(!MediaFeatureStore.append(spark, dir, feats(9L -> 99L),
      "dhash56", "s1"))
    val got = MediaFeatureStore.read(spark, dir, "dhash56")
      .as[(Long, Long)].collect().toSet
    assert(got == Set(1L -> 10L, 2L -> 20L, 3L -> 30L))
    assert(MediaFeatureStore.processedShards(spark, dir) == Set("s0", "s1"))
  }

  test("kind isolation: two feature families in one store never mix") {
    val dir = tmpDir("mfs_kinds")
    MediaFeatureStore.append(spark, dir, feats(1L -> 10L), "dhash56", "img_s0")
    MediaFeatureStore.append(spark, dir, feats(1L -> 77L), "audio_fp", "aud_s0")
    assert(MediaFeatureStore.read(spark, dir, "dhash56")
      .as[(Long, Long)].collect().toSet == Set(1L -> 10L))
    assert(MediaFeatureStore.read(spark, dir, "audio_fp")
      .as[(Long, Long)].collect().toSet == Set(1L -> 77L))
  }

  test("compact: file count drops, reads identical, old-shard replay still guarded") {
    val dir = tmpDir("mfs_compact")
    (0 until 4).foreach(i => MediaFeatureStore.append(spark, dir,
      feats(i.toLong -> (i * 100L)), "dhash56", s"s$i"))
    def files() = {
      val f = new java.io.File(s"$dir/features")
      def walk(x: java.io.File): Seq[java.io.File] =
        if (x.isDirectory) x.listFiles().toSeq.flatMap(walk) else Seq(x)
      walk(f).count(_.getName.endsWith(".parquet"))
    }
    val before = MediaFeatureStore.read(spark, dir, "dhash56")
      .as[(Long, Long)].collect().toSet
    val nBefore = files()
    assert(MediaFeatureStore.compact(spark, dir))
    assert(files() < nBefore)
    assert(MediaFeatureStore.read(spark, dir, "dhash56")
      .as[(Long, Long)].collect().toSet == before)
    // a long-gone shard's replay still short-circuits after compaction
    assert(!MediaFeatureStore.append(spark, dir, feats(0L -> 999L),
      "dhash56", "s0"))
  }

  test("torn append (features written, meta not) stays invisible, heals on replay") {
    val dir = tmpDir("mfs_torn")
    MediaFeatureStore.append(spark, dir, feats(1L -> 10L), "dhash56", "s0")
    // simulate the torn write: the shard subtree lands without its meta
    feats(2L -> 20L).withColumn("kind", lit("dhash56"))
      .select(col("doc_id"), col("kind"), col("sig"))
      .withColumn("shard", lit("s1"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(s"$dir/features")
    assert(MediaFeatureStore.read(spark, dir, "dhash56")
      .as[(Long, Long)].collect().toSet == Set(1L -> 10L), "orphan visible")
    // the replayed append overwrites the orphan and commits it
    assert(MediaFeatureStore.append(spark, dir, feats(2L -> 20L), "dhash56", "s1"))
    assert(MediaFeatureStore.read(spark, dir, "dhash56")
      .as[(Long, Long)].collect().toSet == Set(1L -> 10L, 2L -> 20L))
  }
}
