package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct SeenStore coverage for the crash windows the pipeline specs
  * exercise only indirectly — in particular the write-path half of the
  * torn-compact recovery (AtomicStore.heal scaladoc). */
class SeenStoreSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("update over a TORN compact heals first — pre-compact hashes survive") {
    val store = tmpDir("seen_torn_compact")
    SeenStore.update(spark, store, docs.filter(col("doc_id") < 4), "text", "s0")
    assert(SeenStore.compact(spark, store))
    // crash between the compact swap's delete and rename: the completed
    // new tree sits at hashes_tmp, the tree itself is gone
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$store/hashes"),
      new org.apache.hadoop.fs.Path(s"$store/hashes_tmp")))
    // the next shard's dynamic-overwrite update must adopt the tmp BEFORE
    // (re-)creating the tree, or all pre-compact hashes are orphaned
    SeenStore.update(spark, store, docs.filter(col("doc_id") === 9), "text", "s1")
    assert(SeenStore.read(spark, store).get.count() == 5)
    assert(SeenStore.processedShards(spark, store) == Set("s0", "s1"))
    // the healed store still rejects a replay of pre-compact history
    val replayOld = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(700000L))
    assert(SeenStore.filter(spark, store, replayOld, "text").count() == 0)
  }
}
