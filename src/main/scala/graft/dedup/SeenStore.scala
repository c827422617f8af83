package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted seen-hash store behind incremental exact dedup (the q88
  * primitive, production-shaped): 8 bytes per distinct document ever
  * accepted, anti-joined against each incoming shard so re-ingest cost is
  * O(shard + store), never O(corpus). Storage goes through
  * [[graft.core.AtomicStore]] (crash-safe tmp/rename replace).
  *
  * Protocol per shard: `filter(shard, dropSeen against read(path))` →
  * commit the survivors downstream → [[update]] with the survivors. The
  * update runs AFTER the downstream commit so a crash in between re-drops
  * nothing (the shard replays, already-seen rows fall out, the store
  * converges) — the at-least-once ordering the streaming fingerprint
  * store implements with batch ids. */
object SeenStore {

  /** The store's hash relation, or None before the first [[update]]. */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    graft.core.AtomicStore.read(spark, path)

  /** Drop rows of `incoming` whose content hash is already in the store;
    * identity when the store does not exist yet. */
  def filter(spark: SparkSession, path: String, incoming: DataFrame,
      contentCol: String): DataFrame =
    read(spark, path) match {
      case Some(seen) => Dedup.dropSeen(incoming, contentCol, seen)
      case None => incoming
    }

  /** Fold a committed shard's survivors into the store (union + distinct —
    * idempotent, so replaying the same survivors is harmless). */
  def update(spark: SparkSession, path: String, survivors: DataFrame,
      contentCol: String): Unit = {
    val merged = read(spark, path) match {
      case Some(seen) => Dedup.updateSeen(seen, survivors, contentCol)
      case None => Dedup.seenHashes(survivors, contentCol)
    }
    graft.core.AtomicStore.replace(spark, path, merged)
  }
}
