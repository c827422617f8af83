package graft.fp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replay-guarded persisted per-partition fingerprint store — the batch
  * (CLI/shard) counterpart of the streaming store in
  * [[graft.streaming.StreamingReconcile.mergeFingerprintBatch]].
  *
  * The streaming store's replay guard is a max batch id, which works
  * because micro-batch ids are monotone. Shards are NOT ordered (a
  * backfill can legally arrive after newer shards), so the guard here is
  * the SET of folded shard ids, kept IN the same parquet relation as the
  * fingerprints (a side file could commit separately from the data and
  * desynchronise — the round-2 lesson that moved the streaming marker
  * into the store). One relation, two row kinds:
  *
  *   kind='fp'    → (partition key, rows, fp), the store proper
  *   kind='shard' → (shard_id), one row per folded shard
  *
  * [[fold]] is therefore idempotent per shard id: a replayed shard is a
  * no-op instead of a silent double-fold (XOR would cancel its rows and
  * double its counts). The whole relation is replaced atomically via
  * [[graft.core.AtomicStore]], so the guard commits iff the fold does.
  * Store size: partitions + shards rows — driver-trivial, executor-cheap.
  */
object FingerprintStore {

  private val Kind = "__kind"
  private val ShardId = "__shard_id"

  /** The fingerprint relation (partition cols + rows + fp), or None. A
    * pre-guard store (no kind column) reads as all-fp, zero shards. */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    graft.core.AtomicStore.read(spark, path).map { df =>
      if (df.columns.contains(Kind)) df.filter(col(Kind) === "fp").drop(Kind, ShardId)
      else df
    }

  /** Shard ids already folded into the store. */
  def foldedShards(spark: SparkSession, path: String): Set[String] =
    graft.core.AtomicStore.read(spark, path) match {
      case Some(df) if df.columns.contains(Kind) =>
        df.filter(col(Kind) === "shard").select(ShardId)
          .collect().map(_.getString(0)).toSet
      case _ => Set.empty
    }

  /** Fold `batch`'s per-partition fingerprints into the store unless
    * `shardId` was already folded. Returns true when the fold ran.
    *
    * @param partCols (alias, expression) partition key, as
    *                 [[Fingerprint.byPartition]] takes it
    * @param cols     content columns to fingerprint */
  def fold(spark: SparkSession, path: String, shardId: String,
      batch: DataFrame, partCols: Seq[(String, org.apache.spark.sql.Column)],
      cols: Seq[org.apache.spark.sql.Column]): Boolean =
    graft.core.WriterLease.withLease(spark, path) {
    // ONE store read serves the guard, the shard set, and the fp relation
    // (each AtomicStore.read is a recovery check + listing; and reading
    // the guard twice would be a TOCTOU seam if the single-writer
    // discipline were ever violated)
    val stored = graft.core.AtomicStore.read(spark, path)
    val hasKind = stored.exists(_.columns.contains(Kind))
    val prevShards: Set[String] = stored match {
      case Some(df) if hasKind =>
        df.filter(col(Kind) === "shard").select(ShardId)
          .collect().map(_.getString(0)).toSet
      case _ => Set.empty
    }
    if (prevShards.contains(shardId)) return false
    val keyNames = partCols.map(_._1)
    val delta = Fingerprint.byPartition(batch, partCols, cols)
    val merged = stored match {
      case Some(df) =>
        val fp = if (hasKind) df.filter(col(Kind) === "fp").drop(Kind, ShardId) else df
        Fingerprint.mergeDelta(fp, delta, keyNames)
      case None => delta
    }
    val shardIds = prevShards + shardId
    val fpRows = merged.withColumn(Kind, lit("fp")).withColumn(ShardId, lit(null).cast("string"))
    val shardRows = spark.createDataFrame(
        spark.sparkContext.parallelize(shardIds.toSeq.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(ShardId, org.apache.spark.sql.types.StringType))))
      .withColumn(Kind, lit("shard"))
    // align schemas: shard rows carry nulls for the fp columns
    val aligned = fpRows.columns.foldLeft(shardRows) {
      case (df, c) if !df.columns.contains(c) => df.withColumn(c, lit(null).cast(
        fpRows.schema(c).dataType))
      case (df, _) => df
    }.select(fpRows.columns.map(col): _*)
    graft.core.AtomicStore.replace(spark, path, fpRows.unionByName(aligned))
    true
    }
}
