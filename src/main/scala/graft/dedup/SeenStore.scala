package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted seen-hash store behind incremental exact dedup (the q88
  * primitive, production-shaped): 8 bytes per distinct document ever
  * accepted, anti-joined against each incoming shard so re-ingest cost is
  * O(shard + store), never O(corpus). Storage goes through
  * [[graft.core.AtomicStore]] (crash-safe tmp/rename replace).
  *
  * Like [[graft.fp.FingerprintStore]], the store carries the set of
  * PROCESSED SHARD IDS in the same relation as the hashes (kind rows), so
  * the guard commits atomically with the data. This is what makes shard
  * replay safe end-to-end: a replayed shard whose id is already recorded
  * must be SKIPPED ENTIRELY by the caller ([[processedShards]]) — its
  * hashes are all in the store, so re-filtering would emit an empty
  * relation and clobber the shard's committed output.
  *
  * Protocol per shard: if `shardId ∈ processedShards` → done (output is
  * already committed). Else `filter` the shard against [[read]], commit
  * the survivors downstream, then [[update]] with the survivors + shard
  * id. A crash before [[update]] replays with the store unchanged, so the
  * re-run recomputes the identical output; after [[update]], the replay
  * short-circuits at the guard.
  *
  * Scale note: [[update]] rewrites the store (union + distinct — an
  * O(store) shuffle of 8-byte keys per shard). At 10B documents that is
  * an ~80 GB key shuffle per ingest — acceptable next to the shard scan
  * itself, but a pipeline at that scale should hash-bucket the store
  * directory and rewrite only the buckets the shard's hashes land in
  * (same keys, 1/N of the rewrite); the anti-join read side is already
  * O(shard + store) either way. */
object SeenStore {

  private val Kind = "__kind"
  private val ShardId = "__shard_id"

  private def raw(spark: SparkSession, path: String): Option[DataFrame] =
    graft.core.AtomicStore.read(spark, path)

  /** The store's hash relation (content_hash), or None before the first
    * [[update]]. A pre-guard store (bare hash column) reads as all-hash. */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    raw(spark, path).map { df =>
      if (df.columns.contains(Kind))
        df.filter(col(Kind) === "hash").select("content_hash")
      else df
    }

  /** Shard ids whose survivors are already folded in. */
  def processedShards(spark: SparkSession, path: String): Set[String] =
    raw(spark, path) match {
      case Some(df) if df.columns.contains(Kind) =>
        df.filter(col(Kind) === "shard").select(ShardId)
          .collect().map(_.getString(0)).toSet
      case _ => Set.empty
    }

  /** Drop rows of `incoming` whose content hash is already in the store;
    * identity when the store does not exist yet. */
  def filter(spark: SparkSession, path: String, incoming: DataFrame,
      contentCol: String): DataFrame =
    read(spark, path) match {
      case Some(seen) => Dedup.dropSeen(incoming, contentCol, seen)
      case None => incoming
    }

  /** Fold a committed shard's survivors into the store and record the
    * shard id (one atomic replace). Idempotent per shard id. */
  def update(spark: SparkSession, path: String, survivors: DataFrame,
      contentCol: String, shardId: String): Unit = {
    val shardIds = processedShards(spark, path) + shardId
    val hashes = (read(spark, path) match {
      case Some(seen) => Dedup.updateSeen(seen, survivors, contentCol)
      case None => Dedup.seenHashes(survivors, contentCol)
    }).withColumn(Kind, lit("hash")).withColumn(ShardId, lit(null).cast("string"))
    val shardRows = spark.createDataFrame(
        spark.sparkContext.parallelize(
          shardIds.toSeq.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(ShardId,
            org.apache.spark.sql.types.StringType))))
      .select(lit(null).cast("long").as("content_hash"),
        lit("shard").as(Kind), col(ShardId))
    graft.core.AtomicStore.replace(spark, path, hashes.unionByName(shardRows))
  }
}
