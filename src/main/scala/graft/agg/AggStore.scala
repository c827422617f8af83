package graft.agg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted incremental-rollup store: the Spark-native analogue of a
  * ClickHouse AggregatingMergeTree fed by a materialized view (the
  * canonical production pattern around tables the reference copies —
  * ClickHouse docs, SummingMergeTree/AggregatingMergeTree). Each ingested
  * shard folds down to PARTIAL AGGREGATE STATES (one row per distinct
  * group key in the shard); a read MERGES states across shards. Neither
  * path ever rescans previously-ingested raw data:
  *
  *  - [[append]] is O(shard): one map-side-combined groupBy over the new
  *    shard only, written as its own `states/shard=<id>/` parquet subtree
  *    via dynamic partition overwrite (replay-idempotent).
  *  - [[merged]] is O(store states) = O(shards × keys-per-shard), never
  *    O(raw rows). At 100 TB of events rolled up to (type, day) the raw
  *    corpus is ~10^11 rows but the store is ~10^4 state rows per shard —
  *    the merge is a dimension-sized job.
  *  - [[compact]] folds every subtree into one `shard=__compacted` tree.
  *    All states here are ASSOCIATIVE AND COMMUTATIVE merges (count/sum
  *    over integers, min/max), so compaction is bit-identical to the
  *    multi-shard merge — spec'd in AggStoreSpec.
  *
  * The states kept per group: row count, sum in integer MICRO-UNITS
  * (`floor(value·1e6)` as BIGINT — exact and order-independent, where a
  * double sum would drift with merge order and break bit-parity between
  * the incremental and the from-raw answer; floor, not round, because
  * round-half rules differ across engines and the oracle recomputes
  * this — the curation family's established discipline), min and max of
  * the raw double. avg is derived at read time (`sum_micros / 1e6 / n`), the
  * standard mergeable-state decomposition.
  *
  * Layout + crash-safety protocol are [[graft.dedup.SeenStore]]'s,
  * verbatim: states subtree first (idempotent dynamic overwrite), tiny
  * [[graft.core.AtomicStore]] meta relation last — a crash before the
  * meta commit leaves an orphan subtree that reads never surface; the
  * replayed shard overwrites it. Meta additionally carries the store's
  * key schema (as DataType JSON) so readers are footer-job-free without
  * the caller restating the grouping columns' types. Single-writer per
  * store path.
  */
object AggStore {

  private val CompactedShard = "__compacted"

  private def metaPath(path: String) = s"$path/meta"
  private def statesPath(path: String) = s"$path/states"

  private val MetaSchema = StructType(Seq(
    StructField("shard_id", StringType),
    StructField("key_schema_json", StringType)))

  /** Measure-state columns appended after the group keys. */
  private val StateFields = Seq(
    StructField("n", LongType),
    StructField("sum_micros", LongType),
    StructField("min_v", DoubleType),
    StructField("max_v", DoubleType))

  /** Exact integer micro-units of a double measure — the mergeable sum
    * state (order-independent where double addition is not). DuckDB
    * mirror: `CAST(floor(value * 1e6) AS BIGINT)`. */
  def micros(c: Column): Column = floor(c * lit(1e6)).cast(LongType)

  private case class Meta(shardIds: Set[String], keySchema: Option[StructType])

  private def readMeta(spark: SparkSession, path: String): Meta =
    graft.core.AtomicStore.read(spark, metaPath(path), MetaSchema) match {
      case Some(df) =>
        val rows = df.collect() // one row per ingested shard — tiny by design
        val schema = rows.headOption.map(r =>
          DataType.fromJson(r.getString(1)).asInstanceOf[StructType])
        Meta(rows.map(_.getString(0)).toSet, schema)
      case None => Meta(Set.empty, None)
    }

  private def writeMeta(spark: SparkSession, path: String, ids: Set[String],
      keySchema: StructType): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    val json = keySchema.json
    val rel = spark.createDataFrame(
      ids.toSeq.sorted.map(id => Row(id, json)).asJava, MetaSchema)
    graft.core.AtomicStore.replace(spark, metaPath(path), rel)
  }

  private def statesSchema(keySchema: StructType): StructType =
    StructType(keySchema.fields.toSeq ++ StateFields :+
      StructField("shard", StringType))

  /** Shard ids whose states are committed (the caller's replay guard —
    * same protocol as SeenStore.processedShards). */
  def processedShards(spark: SparkSession, path: String): Set[String] =
    readMeta(spark, path).shardIds - CompactedShard

  /** Fold one shard's raw rows into partial states and commit them as the
    * shard's own subtree — O(shard), nothing else rewritten. Idempotent
    * per shard id. `keys` are the rollup's grouping columns (kept under
    * their input names); `valueCol` the double measure. */
  def append(spark: SparkSession, path: String, shard: DataFrame,
      keys: Seq[String], valueCol: String, shardId: String): Unit = {
    require(shardId != CompactedShard, s"shard id $CompactedShard is reserved")
    require(keys.nonEmpty, "rollup needs at least one grouping column")
    val meta = readMeta(spark, path)
    if (meta.shardIds.contains(shardId)) return
    val keySchema = StructType(keys.map(k => shard.schema(k)))
    meta.keySchema.foreach { existing =>
      require(existing == keySchema,
        s"key schema mismatch: store has $existing, shard brings $keySchema")
    }
    // partial states: Catalyst's partial/final HashAggregate already
    // map-side-combines this, so the shuffle carries states, not rows
    // the measure is DOUBLE in the state schema regardless of its input
    // type (a long column like n_chars casts exactly up to 2^53; the sum
    // state is exact through the micro-unit long either way) — without
    // the cast, a long-typed measure writes INT64 min_v/max_v that the
    // schema'd read rejects
    val measure = col(valueCol).cast(DoubleType)
    val partial = shard.groupBy(keys.map(col): _*).agg(
        count(lit(1)).as("n"),
        coalesce(sum(micros(measure)), lit(0L)).as("sum_micros"),
        min(measure).as("min_v"),
        max(measure).as("max_v"))
      .withColumn("shard", lit(shardId))
    // adopt a torn compact before (re-)creating the tree (AtomicStore.heal)
    graft.core.AtomicStore.heal(spark, statesPath(path))
    partial.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(statesPath(path))
    writeMeta(spark, path, meta.shardIds + shardId, keySchema)
  }

  /** All committed partial states (orphans of torn appends filtered out),
    * or None before the first append. */
  def states(spark: SparkSession, path: String): Option[DataFrame] = {
    val meta = readMeta(spark, path)
    meta.keySchema.map { ks =>
      graft.core.AtomicStore.readRequired(spark, statesPath(path), statesSchema(ks))
        .filter(col("shard").isin(meta.shardIds.toSeq: _*))
        .drop("shard")
    }
  }

  /** Merge the mergeable states across shards: one row per group key with
    * exact n / sum_micros / min_v / max_v and the derived avg_v. This is
    * the read users run instead of re-aggregating the raw corpus. */
  def merged(spark: SparkSession, path: String): DataFrame = {
    val st = states(spark, path).getOrElse(throw new IllegalStateException(
      s"no aggregate store at $path — append a shard first"))
    val keys = st.columns.filterNot(StateFields.map(_.name).contains)
    st.groupBy(keys.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum_micros")).as("sum_micros"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
      .withColumn("avg_v", col("sum_micros") / lit(1e6) / col("n"))
  }

  /** Small-file / state maintenance: pre-merge every recorded subtree into
    * one `shard=__compacted` tree. Because the states are associative
    * merges, [[merged]] reads identically before and after; historical
    * shard ids stay in meta so long-gone shards still short-circuit at
    * [[processedShards]]. No-op before the first append. */
  def compact(spark: SparkSession, path: String, nFiles: Int = 1): Boolean = {
    val meta = readMeta(spark, path)
    if (meta.shardIds.isEmpty) return false
    val ks = meta.keySchema.get
    if (!meta.shardIds.contains(CompactedShard))
      writeMeta(spark, path, meta.shardIds + CompactedShard, ks)
    val keys = ks.fieldNames.toSeq
    val live = graft.core.AtomicStore
      .readRequired(spark, statesPath(path), statesSchema(ks))
      .filter(col("shard").isin(meta.shardIds.toSeq: _*))
      .groupBy(keys.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum_micros")).as("sum_micros"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
      .withColumn("shard", lit(CompactedShard))
    graft.core.AtomicStore.replaceVia(spark, statesPath(path)) { tmp =>
      live.coalesce(nFiles)
        .write.mode("overwrite").partitionBy("shard").parquet(tmp)
    }
    true
  }
}
