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
    StructField("state_schema_json", StringType)))

  /** Measure-state columns appended after the group keys. The optional
    * fifth state, `n_distinct_sk` (a Datasketches HLL binary via
    * `hll_sketch_agg` — the ClickHouse `uniqState` analogue, merge
    * contract proven by q75), is present only when the store was built
    * with a `distinctCol`. */
  private val StateFields = Seq(
    StructField("n", LongType),
    StructField("sum_micros", LongType),
    StructField("min_v", DoubleType),
    StructField("max_v", DoubleType))
  private val SketchField = StructField("n_distinct_sk", BinaryType)
  private val StateNames = (StateFields :+ SketchField).map(_.name).toSet

  /** Exact integer micro-units of a double measure — the mergeable sum
    * state (order-independent where double addition is not). DuckDB
    * mirror: `CAST(floor(value * 1e6) AS BIGINT)`. */
  def micros(c: Column): Column = floor(c * lit(1e6)).cast(LongType)

  private case class Meta(shardIds: Set[String], stateSchema: Option[StructType]) {
    /** Whether this store carries the distinct-sketch state. */
    def hasSketch: Boolean =
      stateSchema.exists(_.fieldNames.contains(SketchField.name))
    def keyNames: Seq[String] =
      stateSchema.get.fieldNames.toSeq.filterNot(StateNames)
  }

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
      stateSchema: StructType): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    val json = stateSchema.json
    val rel = spark.createDataFrame(
      ids.toSeq.sorted.map(id => Row(id, json)).asJava, MetaSchema)
    graft.core.AtomicStore.replace(spark, metaPath(path), rel)
  }

  private def onDiskSchema(stateSchema: StructType): StructType =
    StructType(stateSchema.fields.toSeq :+ StructField("shard", StringType))

  /** The associative state merge (one row per group key): counts and
    * micro-sums add, min/max fold, sketches union. Shared by [[merged]]
    * and [[compact]] so compaction is reader-invisible by construction. */
  private def mergeStates(st: DataFrame, keys: Seq[String],
      hasSketch: Boolean): DataFrame = {
    val base = Seq(
      sum(col("n")).as("n"),
      sum(col("sum_micros")).as("sum_micros"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))
    val aggs = if (hasSketch)
      base :+ hll_union_agg(col(SketchField.name)).as(SketchField.name)
    else base
    st.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Shard ids whose states are committed (the caller's replay guard —
    * same protocol as SeenStore.processedShards). */
  def processedShards(spark: SparkSession, path: String): Set[String] =
    readMeta(spark, path).shardIds - CompactedShard

  /** Fold one shard's raw rows into partial states and commit them as the
    * shard's own subtree — O(shard), nothing else rewritten. Idempotent
    * per shard id. `keys` are the rollup's grouping columns (kept under
    * their input names); `valueCol` the double measure. */
  def append(spark: SparkSession, path: String, shard: DataFrame,
      keys: Seq[String], valueCol: String, shardId: String,
      distinctCol: String = null): Unit = {
    require(shardId != CompactedShard, s"shard id $CompactedShard is reserved")
    require(keys.nonEmpty, "rollup needs at least one grouping column")
    val meta = readMeta(spark, path)
    if (meta.shardIds.contains(shardId)) return
    // partial states: Catalyst's partial/final HashAggregate already
    // map-side-combines this, so the shuffle carries states, not rows
    // the measure is DOUBLE in the state schema regardless of its input
    // type (a long column like n_chars casts exactly up to 2^53; the sum
    // state is exact through the micro-unit long either way) — without
    // the cast, a long-typed measure writes INT64 min_v/max_v that the
    // schema'd read rejects
    val measure = col(valueCol).cast(DoubleType)
    val baseAggs = Seq(
      count(lit(1)).as("n"),
      coalesce(sum(micros(measure)), lit(0L)).as("sum_micros"),
      min(measure).as("min_v"),
      max(measure).as("max_v"))
    val aggs = if (distinctCol != null)
      // the uniqState analogue: a mergeable Datasketches HLL of the
      // distinct column, unioned (never re-counted) at read/compact time
      baseAggs :+ hll_sketch_agg(col(distinctCol)).as(SketchField.name)
    else baseAggs
    val partial = shard.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stateSchema = partial.schema
    meta.stateSchema.foreach { existing =>
      require(existing == stateSchema,
        s"state schema mismatch: store has $existing, shard brings " +
          s"$stateSchema (keys, measure type, and distinctCol must not drift)")
    }
    // adopt a torn compact before (re-)creating the tree (AtomicStore.heal)
    graft.core.AtomicStore.heal(spark, statesPath(path))
    partial.withColumn("shard", lit(shardId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(statesPath(path))
    writeMeta(spark, path, meta.shardIds + shardId, stateSchema)
  }

  /** All committed partial states (orphans of torn appends filtered out),
    * or None before the first append. */
  def states(spark: SparkSession, path: String): Option[DataFrame] =
    states(spark, path, readMeta(spark, path))

  /** [[states]] with the meta already read — merged/compact read meta once
    * and thread it here, so a store read costs ONE meta collect job. */
  private def states(spark: SparkSession, path: String, meta: Meta): Option[DataFrame] =
    meta.stateSchema.map { ss =>
      graft.core.AtomicStore.readRequired(spark, statesPath(path), onDiskSchema(ss))
        .filter(col("shard").isin(meta.shardIds.toSeq: _*))
        .drop("shard")
    }

  /** Merge the mergeable states across shards: one row per group key with
    * exact n / sum_micros / min_v / max_v, the derived avg_v, and — when
    * the store carries the distinct sketch — `n_distinct_est`, the
    * HLL-union estimate of distinct `distinctCol` values per group (the
    * `uniqMerge` read; ≈0 error at small cardinalities, ~2% at large —
    * the q75-proven contract). This is the read users run instead of
    * re-aggregating the raw corpus. */
  def merged(spark: SparkSession, path: String): DataFrame = {
    val meta = readMeta(spark, path)
    require(meta.stateSchema.nonEmpty,
      s"no aggregate store at $path — append a shard first")
    val st = states(spark, path, meta).get
    val out = mergeStates(st, meta.keyNames, meta.hasSketch)
      .withColumn("avg_v", col("sum_micros") / lit(1e6) / col("n"))
    if (meta.hasSketch)
      out.withColumn("n_distinct_est",
          hll_sketch_estimate(col(SketchField.name)))
        .drop(SketchField.name)
    else out
  }

  /** Small-file / state maintenance: pre-merge every recorded subtree into
    * one `shard=__compacted` tree. Because the states are associative
    * merges, [[merged]] reads identically before and after; historical
    * shard ids stay in meta so long-gone shards still short-circuit at
    * [[processedShards]]. No-op before the first append. */
  def compact(spark: SparkSession, path: String, nFiles: Int = 1): Boolean = {
    val meta = readMeta(spark, path)
    if (meta.shardIds.isEmpty) return false
    val ss = meta.stateSchema.get
    if (!meta.shardIds.contains(CompactedShard))
      writeMeta(spark, path, meta.shardIds + CompactedShard, ss)
    val live = mergeStates(states(spark, path, meta).get,
        meta.keyNames, meta.hasSketch)
      .withColumn("shard", lit(CompactedShard))
    graft.core.AtomicStore.replaceVia(spark, statesPath(path)) { tmp =>
      live.coalesce(nFiles)
        .write.mode("overwrite").partitionBy("shard").parquet(tmp)
    }
    true
  }
}
