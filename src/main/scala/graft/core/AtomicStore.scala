package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe replace of a persisted parquet "store" directory — the
  * discipline behind the engine's incremental stores (seen-hash dedup,
  * per-partition fingerprints): write the new contents to `<path>_tmp`,
  * delete the old store, rename tmp into place. A crash between the
  * delete and the rename leaves a COMPLETED tmp and no store, which
  * [[read]] adopts; a crash mid-write leaves a partial tmp WITHOUT the
  * `_SUCCESS` marker, which [[read]] deletes so the caller rebuilds
  * (adopting it would poison every later read). All filesystem ops go
  * through the path's Hadoop FileSystem so object-store paths behave like
  * local ones; the write itself is distributed (no driver materialise —
  * stores like the seen-hash set scale with the corpus, not the
  * partition count).
  *
  * NOT a concurrency mechanism: one writer at a time per store path
  * (pipelines run shards sequentially; the streaming variant serialises
  * through foreachBatch). See
  * [[graft.streaming.StreamingReconcile.mergeFingerprintBatch]] for the
  * replay-guarded (batch-id-carrying) flavour of the same discipline.
  */
object AtomicStore {

  private def fsFor(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recover-and-read: Some(store) if present (after adopting a completed
    * tmp when the store itself is missing), None if the store does not
    * exist yet. */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val store = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "_tmp")
    val fs = fsFor(spark, store)
    if (!fs.exists(store) && fs.exists(tmp)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) fs.rename(tmp, store)
      else fs.delete(tmp, true)
    }
    if (fs.exists(store)) Some(spark.read.parquet(path)) else None
  }

  /** Atomically replace the store with `df`. `df` may lazily read the
    * current store (incremental merge shapes do): the tmp write
    * materialises it BEFORE the old store is deleted. */
  def replace(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val store = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "_tmp")
    val fs = fsFor(spark, store)
    df.write.mode("overwrite").parquet(tmp.toString)
    // the recovery protocol keys on _SUCCESS, but the committer only
    // writes one when marksuccessfuljobs is on (object-store tunings turn
    // it off) — guarantee the marker ourselves, or a crash between the
    // delete and the rename would make read() discard a COMPLETE tmp and
    // silently erase the whole accumulated store
    val marker = new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, true).close()
    fs.delete(store, true)
    fs.rename(tmp, store)
  }
}
