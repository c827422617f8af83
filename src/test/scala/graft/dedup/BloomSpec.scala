package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the distributed Bloom filter (exact-value parity with
  * DuckDB is q124's gate; these pin the membership semantics). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(keys: Seq[String]) =
    keys.toDF("s").select(Dedup.portableHash(col("s")).as("h"))

  test("no false negatives: every inserted key bloom-hits, at any width") {
    val keys = hashed((0 until 500).map(i => s"inserted-key-$i"))
    for (log2m <- Seq(6, 12, Bloom.Log2M)) {
      val bm = Bloom.bitmap(keys, "h", log2m)
      val misses = Bloom.probe(keys, "h", bm, log2m)
        .filter(!col("bloom_hit")).count()
      assert(misses == 0L, s"false negative at log2m=$log2m")
    }
  }

  test("planted false positives at small width are visible, bounded, deterministic") {
    val inserted = hashed((0 until 40).map(i => s"member-$i"))
    val outside = hashed((0 until 2000).map(i => s"non-member-$i"))
    // 256-bit filter, 40 keys, k=2: fill ~27%, FPR ~7% — false positives
    // MUST occur over 2000 probes, and must stay far from saturation
    val bm = Bloom.bitmap(inserted, "h", log2m = 8)
    def fp() = Bloom.probe(outside, "h", bm, log2m = 8)
      .filter(col("bloom_hit")).count()
    val n = fp()
    assert(n > 0L, "a 256-bit filter over 40 keys must show false positives")
    assert(n < 1000L, s"FP count $n implausibly near saturation")
    assert(fp() == n, "bloom verdicts must be deterministic across runs")
  }

  test("bitmap is bounded by the word count and uses only 32 low bits") {
    val keys = hashed((0 until 5000).map(i => s"k$i"))
    val bm = Bloom.bitmap(keys, "h", log2m = 10).cache()
    assert(bm.count() <= (1L << 10) / 32)
    val outOfRange = bm.filter(col("bits") <= 0L || col("bits") >= (1L << 32)).count()
    assert(outOfRange == 0L, "every word must stay a positive 32-bit value")
    bm.unpersist()
  }

  test("empty filter rejects everything; probe output keeps input columns") {
    val bm = Bloom.bitmap(hashed(Nil), "h")
    val probed = Bloom.probe(
      hashed(Seq("a", "b")).withColumn("tag", lit(7)), "h", bm)
    assert(probed.filter(col("bloom_hit")).count() == 0L)
    assert(probed.columns.toSet == Set("h", "tag", "bloom_hit"))
  }
}
