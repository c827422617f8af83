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
    StructField("state_schema_json", StringType),
    StructField("key_names", StringType)))
  /** key_names separator (column names can legally contain commas). */
  private val KeySep = ""

  /** Per-measure states carry the measure name as a prefix:
    * `<m>_sum_u` (micro-unit BIGINT sum), `<m>_min`, `<m>_max`. The
    * single-measure [[append]] keeps its original unprefixed names
    * (`sum_micros`/`min_v`/`max_v`). `n` is shared across measures; the
    * optional `n_distinct_sk` (a Datasketches HLL binary via
    * `hll_sketch_agg` — the ClickHouse `uniqState` analogue, merge
    * contract proven by q75) is present only when the store was built
    * with a `distinctCol`. Merge semantics at read/compact are derived
    * from these names — see [[mergeExpr]]. */
  private val SketchField = StructField("n_distinct_sk", BinaryType)

  /** Optional quantile-sketch state (the ClickHouse quantileState /
    * quantileMerge pair): a serialized Greenwald-Khanna summary of the
    * `quantileCol` values per group — Spark's own `percentile_approx`
    * engine, exposed as a mergeable state by
    * [[graft.functions.expressions.QuantileSketchAggregate]]. Present
    * only when the store was built with a `quantileCol`; merged reads
    * finish it to `q_p50`/`q_p90`/`q_p99` estimates, each honouring the
    * eps rank-error bound whatever the shard/merge order was. */
  private val QSketchField = StructField("q_sketch", BinaryType)
  private val QProbes = Seq(0.5, 0.9, 0.99)
  private val QProbeNames = Seq("q_p50", "q_p90", "q_p99")

  /** Optional capped exact-distinct state (ClickHouse `uniqUpTo(N)` —
    * [[graft.functions.expressions.UniqUpToAggregate]]): exact distinct
    * count while ≤ N, the sentinel N+1 beyond, state size O(N) per
    * group. The cap is part of the state's identity (states of
    * different caps do not merge), so it rides in the COLUMN NAME —
    * `uniq_upto_<N>_sk` — keeping meta self-describing and the
    * name-driven [[mergeExpr]] parameter-free. */
  private val UniqUpToPattern = "uniq_upto_([0-9]+)_sk".r
  private def uniqUpToName(n: Int) = s"uniq_upto_${n}_sk"

  /** The associative merge for one state column, by naming convention.
    * `_argmax` states are struct<ord, arg> maxima (the ClickHouse
    * argMaxState: "value at the greatest ordinal"); struct comparison is
    * lexicographic, so equal ordinals tie-break on the arg — the merge
    * stays deterministic for any input. */
  private def mergeExpr(name: String): Column = name match {
    case "n" => sum(col("n")).as("n")
    case SketchField.name => hll_union_agg(col(name)).as(name)
    case QSketchField.name =>
      graft.functions.expressions.QuantileSketchAggregate
        .mergeSketches(col(name)).as(name)
    case nm if nm == "sum_micros" || nm.endsWith("_sum_u") => sum(col(nm)).as(nm)
    case nm if nm == "min_v" || nm.endsWith("_min") => min(col(nm)).as(nm)
    case nm if nm == "max_v" || nm.endsWith("_max") => max(col(nm)).as(nm)
    case nm if nm.endsWith("_argmax") => max(col(nm)).as(nm)
    // sumMapState: key-wise map sum is associative on micro-unit longs,
    // so the SAME aggregate folds raw entries and merges shard states
    case nm if nm.endsWith("_summap") =>
      graft.functions.expressions.MapSumAggregate.sumMap(col(nm)).as(nm)
    case nm @ UniqUpToPattern(n) =>
      graft.functions.expressions.UniqUpToAggregate
        .mergeStates(col(nm), n.toInt).as(nm)
    case nm => throw new IllegalStateException(
      s"state column $nm has no merge rule — store meta is corrupt")
  }

  /** Exact integer micro-units of a double measure — the mergeable sum
    * state (order-independent where double addition is not). DuckDB
    * mirror: `CAST(floor(value * 1e6) AS BIGINT)`. */
  def micros(c: Column): Column = floor(c * lit(1e6)).cast(LongType)

  private case class Meta(shardIds: Set[String], stateSchema: Option[StructType],
      keyNames: Seq[String]) {
    /** Whether this store carries the distinct-sketch state. */
    def hasSketch: Boolean =
      stateSchema.exists(_.fieldNames.contains(SketchField.name))
    /** Whether this store carries the quantile-sketch state. */
    def hasQuantile: Boolean =
      stateSchema.exists(_.fieldNames.contains(QSketchField.name))
    def stateNames: Seq[String] =
      stateSchema.get.fieldNames.toSeq.filterNot(keyNames.contains)
  }

  /** State names a LEGACY (pre-key_names meta) store could carry — used
    * only to recover such a store's key columns by exclusion. */
  private val LegacyStateNames = Set("n", "sum_micros", "min_v", "max_v",
    SketchField.name)

  private def readMeta(spark: SparkSession, path: String): Meta =
    graft.core.AtomicStore.read(spark, metaPath(path), MetaSchema) match {
      case Some(df) =>
        val rows = df.collect() // one row per ingested shard — tiny by design
        val schema = rows.headOption.map(r =>
          DataType.fromJson(r.getString(1)).asInstanceOf[StructType])
        val keys = rows.headOption.toSeq.flatMap { r =>
          // a store written before meta carried key_names reads null here
          // — those stores were single-measure by construction, so their
          // keys recover exactly by excluding the fixed legacy state set
          // (bricking existing durable rollup stores is not acceptable)
          if (r.isNullAt(2))
            schema.get.fieldNames.toSeq.filterNot(LegacyStateNames)
          else r.getString(2).split(KeySep).toSeq.filter(_.nonEmpty)
        }
        Meta(rows.map(_.getString(0)).toSet, schema, keys)
      case None => Meta(Set.empty, None, Seq.empty)
    }

  private def writeMeta(spark: SparkSession, path: String, ids: Set[String],
      stateSchema: StructType, keyNames: Seq[String]): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    val json = stateSchema.json
    val keys = keyNames.mkString(KeySep)
    val rel = spark.createDataFrame(
      ids.toSeq.sorted.map(id => Row(id, json, keys)).asJava, MetaSchema)
    graft.core.AtomicStore.replace(spark, metaPath(path), rel)
  }

  private def onDiskSchema(stateSchema: StructType): StructType =
    StructType(stateSchema.fields.toSeq :+ StructField("shard", StringType))

  /** The associative state merge (one row per group key): counts and
    * micro-sums add, min/max fold, sketches union — per state column via
    * [[mergeExpr]]. Shared by [[merged]] and [[compact]] so compaction is
    * reader-invisible by construction. */
  private def mergeStates(st: DataFrame, meta: Meta): DataFrame =
    mergeStatesAt(st, meta, meta.keyNames)

  /** [[mergeStates]] grouped by a key SUBSET — every state here is an
    * associative, commutative merge, so states built at (a, b) re-merge
    * losslessly to (a): counts/sums add, min/max/argmax fold, HLL and GK
    * sketches union, maps key-wise-sum. That closure is what makes the
    * store a CASCADE of materialized views for free (ClickHouse stacks a
    * second MV per granularity; here a coarser read is one states-sized
    * groupBy over the same store). */
  private def mergeStatesAt(st: DataFrame, meta: Meta, keys: Seq[String]): DataFrame = {
    val aggs = meta.stateNames.map(mergeExpr)
    st.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Shard ids whose states are committed (the caller's replay guard —
    * same protocol as SeenStore.processedShards). */
  def processedShards(spark: SparkSession, path: String): Set[String] =
    readMeta(spark, path).shardIds - CompactedShard

  /** Fold one shard's raw rows into partial states and commit them as the
    * shard's own subtree — O(shard), nothing else rewritten. Idempotent
    * per shard id. `keys` are the rollup's grouping columns (kept under
    * their input names); `valueCol` the double measure (original
    * single-measure form — states named `sum_micros`/`min_v`/`max_v`). */
  def append(spark: SparkSession, path: String, shard: DataFrame,
      keys: Seq[String], valueCol: String, shardId: String,
      distinctCol: String = null, quantileCol: String = null,
      sumMap: Seq[(String, Column, Column)] = Nil,
      uniqUpTo: (String, Int) = null): Unit =
    appendStates(spark, path, shard, keys, shardId, distinctCol,
      Seq(("sum_micros", "min_v", "max_v", col(valueCol))),
      quantileCol = quantileCol, sumMap = sumMap, uniqUpTo = uniqUpTo)

  /** Multi-measure [[append]]: each `(name, expr)` measure contributes
    * `<name>_sum_u` / `<name>_min` / `<name>_max` states (one shared `n`).
    * Measures are EXPRESSIONS, so derived quantities — the TPC-H Q1
    * `extendedprice·(1−discount)` class — fold into states directly;
    * a product of columns is not derivable from the factors' independent
    * states, it must be a measure of its own. */
  def appendMeasures(spark: SparkSession, path: String, shard: DataFrame,
      keys: Seq[String], measures: Seq[(String, Column)], shardId: String,
      distinctCol: String = null,
      argMax: Seq[(String, Column, Column)] = Nil,
      quantileCol: String = null,
      sumMap: Seq[(String, Column, Column)] = Nil,
      uniqUpTo: (String, Int) = null): Unit = {
    require(measures.nonEmpty, "rollup needs at least one measure")
    appendStates(spark, path, shard, keys, shardId, distinctCol,
      measures.map { case (nm, c) => (s"${nm}_sum_u", s"${nm}_min", s"${nm}_max", c) },
      argMax, quantileCol, sumMap, uniqUpTo)
  }

  /** One shard's (or live tail's) partial states — the fold both
    * [[appendStates]] persists and [[mergedWithTail]] computes on the fly. */
  private def partialStates(shard: DataFrame, keys: Seq[String],
      distinctCol: String,
      measures: Seq[(String, String, String, Column)],
      argMax: Seq[(String, Column, Column)] = Nil,
      quantileCol: String = null,
      sumMap: Seq[(String, Column, Column)] = Nil,
      uniqUpTo: (String, Int) = null): DataFrame = {
    require(keys.nonEmpty, "rollup needs at least one grouping column")
    val reserved = measures.flatMap { case (a, b, c, _) => Seq(a, b, c) } ++
      argMax.map { case (nm, _, _) => s"${nm}_argmax" } ++
      sumMap.map { case (nm, _, _) => s"${nm}_summap" } ++
      Option(uniqUpTo).map(u => uniqUpToName(u._2)).toSeq ++
      Seq("n", SketchField.name, QSketchField.name)
    require(keys.intersect(reserved).isEmpty,
      s"grouping columns collide with state names: ${keys.intersect(reserved)}")
    // partial states: Catalyst's partial/final HashAggregate already
    // map-side-combines this, so the shuffle carries states, not rows.
    // Measures are DOUBLE in the state schema regardless of input type
    // (a long column like n_chars casts exactly up to 2^53; the sum
    // state is exact through the micro-unit long either way) — without
    // the cast, a long-typed measure writes INT64 min/max that the
    // schema'd read rejects
    val measureAggs = measures.flatMap { case (sumN, minN, maxN, c) =>
      val m = c.cast(DoubleType)
      Seq(coalesce(sum(micros(m)), lit(0L)).as(sumN), min(m).as(minN), max(m).as(maxN))
    }
    // argMaxState: the (ordinal, value) pair at the group's greatest
    // ordinal — "latest value per key" once the ordinal is an event time.
    // Struct max is the mergeable form; arg rides inside the struct.
    val argMaxAggs = argMax.map { case (nm, ord, arg) =>
      max(struct(ord.as("ord"), arg.as("arg"))).as(s"${nm}_argmax")
    }
    // sumMapState: per-row single-entry maps key-wise-summed — the same
    // aggregate later merges the shard states (see mergeExpr). Values in
    // exact micro-units, per the store's sum discipline. A null map key
    // would throw Spark's map contract AT EXECUTION — in the pipeline
    // path that is after the shard output committed, so every replay
    // re-crashes (a permanent ingest wedge). Guarded here instead: a
    // null-key row contributes NO map entry (MapSumAggregate.update
    // already skips null input maps), matching how ClickHouse sumMap
    // simply never sees a NULL key from a Nullable column's GROUP BY arm.
    val sumMapAggs = sumMap.map { case (nm, k, v) =>
      graft.functions.expressions.MapSumAggregate.sumMap(
        when(k.isNotNull,
          map(k.cast(StringType), micros(v.cast(DoubleType))))).as(s"${nm}_summap")
    }
    val baseAggs = count(lit(1)).as("n") +: (measureAggs ++ argMaxAggs ++ sumMapAggs)
    val withDistinct = if (distinctCol != null)
      // the uniqState analogue: a mergeable Datasketches HLL of the
      // distinct column, unioned (never re-counted) at read/compact time
      baseAggs :+ hll_sketch_agg(col(distinctCol)).as(SketchField.name)
    else baseAggs
    val withQuantile = if (quantileCol != null)
      // the quantileState analogue: a mergeable GK summary of the
      // quantile column, merged (never re-folded) at read/compact time
      withDistinct :+ graft.functions.expressions.QuantileSketchAggregate
        .sketch(col(quantileCol).cast(DoubleType)).as(QSketchField.name)
    else withDistinct
    val aggs = if (uniqUpTo != null)
      // the uniqUpToState analogue: exact capped distinct set, unioned
      // (cap preserved) at read/compact time
      withQuantile :+ graft.functions.expressions.UniqUpToAggregate
        .state(col(uniqUpTo._1), uniqUpTo._2).as(uniqUpToName(uniqUpTo._2))
    else withQuantile
    shard.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def appendStates(spark: SparkSession, path: String, shard: DataFrame,
      keys: Seq[String], shardId: String, distinctCol: String,
      measures: Seq[(String, String, String, Column)],
      argMax: Seq[(String, Column, Column)] = Nil,
      quantileCol: String = null,
      sumMap: Seq[(String, Column, Column)] = Nil,
      uniqUpTo: (String, Int) = null): Unit =
    graft.core.WriterLease.withLease(spark, path) {
    require(shardId != CompactedShard, s"shard id $CompactedShard is reserved")
    val meta = readMeta(spark, path)
    if (meta.shardIds.contains(shardId)) return
    val partial = partialStates(shard, keys, distinctCol, measures, argMax,
      quantileCol, sumMap, uniqUpTo)
    val stateSchema = partial.schema
    meta.stateSchema.foreach { existing =>
      require(existing == stateSchema && meta.keyNames == keys,
        s"state schema mismatch: store has $existing (keys ${meta.keyNames}), " +
          s"shard brings $stateSchema (keys $keys) — keys, measures, and " +
          "distinctCol must not drift)")
    }
    // adopt a torn compact before (re-)creating the tree (AtomicStore.heal)
    graft.core.AtomicStore.heal(spark, statesPath(path))
    partial.withColumn("shard", lit(shardId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(statesPath(path))
    writeMeta(spark, path, meta.shardIds + shardId, stateSchema, keys)
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
    finishMerged(mergeStates(states(spark, path, meta).get, meta), meta)
  }

  /** COARSENED read: [[merged]] at a strict subset of the store's keys —
    * a (type, day) store answers (type) questions from the same states,
    * the cascaded-materialized-view read (see [[mergeStatesAt]]). Still
    * O(states), and exact for every exact state; sketch states keep
    * their usual bounds through the extra union level. */
  def mergedAt(spark: SparkSession, path: String, coarseKeys: Seq[String]): DataFrame = {
    val meta = readMeta(spark, path)
    require(meta.stateSchema.nonEmpty,
      s"no aggregate store at $path — append a shard first")
    require(coarseKeys.nonEmpty && coarseKeys.forall(meta.keyNames.contains),
      s"coarse keys $coarseKeys must be a non-empty subset of the " +
        s"store's keys ${meta.keyNames}")
    finishMerged(
      mergeStatesAt(states(spark, path, meta).get, meta, coarseKeys), meta)
  }

  /** [[mergedAt]] generalised to DERIVED grouping expressions over the
    * store's key columns (`month(event_day)`, `bucket(id)`, …): every
    * state is an associative, commutative merge, so states regroup
    * losslessly under ANY function of the keys — the read-time RE-GRAIN
    * behind time-rollup dashboards, where ClickHouse stacks a second
    * coarser MV. Still O(states). Each `(name, expr)` grouping expression
    * may reference ONLY key columns (referencing a state column would
    * group by a value the merge is about to fold — rejected loudly);
    * names must not collide with state names. */
  def mergedBy(spark: SparkSession, path: String,
      groups: Seq[(String, Column)]): DataFrame = {
    val meta = readMeta(spark, path)
    require(meta.stateSchema.nonEmpty,
      s"no aggregate store at $path — append a shard first")
    require(groups.nonEmpty, "mergedBy needs at least one grouping expression")
    require(groups.map(_._1).intersect(meta.stateNames).isEmpty,
      s"grouping names ${groups.map(_._1)} collide with state names")
    val st = states(spark, path, meta).get
    // resolve the expressions against the states relation and verify they
    // reference key columns only
    val proj = st.select(groups.map { case (n, c) => c.as(n) }: _*)
    // ROOT Project only: the plan below it is the store read itself,
    // whose internal projections legitimately reference state columns
    proj.queryExecution.analyzed match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.foreach { e =>
          val refs = e.references.map(_.name).toSet
          require(refs.subsetOf(meta.keyNames.toSet),
            s"mergedBy expression '${e.sql}' references non-key columns " +
              s"${refs -- meta.keyNames.toSet} — grouping expressions may " +
              s"use only the store keys ${meta.keyNames}")
        }
      case _ => ()
    }
    val aggs = meta.stateNames.map(mergeExpr)
    finishMerged(
      st.groupBy(groups.map { case (n, c) => c.as(n) }: _*)
        .agg(aggs.head, aggs.tail: _*), meta)
  }

  /** Derived read-time columns over merged states: per-measure avg
    * (`avg_v` for the single-measure form, `<m>_avg` for named measures —
    * the standard sum/count decomposition) and the sketch estimate. */
  private def finishMerged(mergedStates: DataFrame, meta: Meta): DataFrame = {
    val avgs: Seq[(String, Column)] = meta.stateNames.collect {
      case "sum_micros" => "avg_v" -> (col("sum_micros") / lit(1e6) / col("n"))
      case nm if nm.endsWith("_sum_u") =>
        (nm.stripSuffix("_sum_u") + "_avg") -> (col(nm) / lit(1e6) / col("n"))
    }
    val out = avgs.foldLeft(mergedStates) {
      case (df, (nm, c)) => df.withColumn(nm, c)
    }
    val withDistinct = if (meta.hasSketch)
      out.withColumn("n_distinct_est",
          hll_sketch_estimate(col(SketchField.name)))
        .drop(SketchField.name)
    else out
    val withQuantile = if (meta.hasQuantile) {
      // finish the merged GK sketch to the standard dashboard probes;
      // other probabilities read via states() + QuantileSketchAggregate.
      // The estimate array materialises ONCE per group row: the finisher
      // is CodegenFallback, so embedding it per probe column would
      // re-deserialize the sketch 3x (no subexpression elimination there)
      val est = graft.functions.expressions.QuantileSketchAggregate
        .estimate(col(QSketchField.name), QProbes)
      QProbeNames.zipWithIndex.foldLeft(
          withDistinct.withColumn("__q_est", est)) {
        case (df, (nm, i)) => df.withColumn(nm, element_at(col("__q_est"), i + 1))
      }.drop(QSketchField.name, "__q_est")
    } else withDistinct
    // finish a capped exact-distinct state to its count (exact ≤ N,
    // sentinel N+1 beyond — the uniqUpTo answer)
    meta.stateNames.collectFirst { case nm @ UniqUpToPattern(_) => nm } match {
      case Some(nm) => withQuantile.withColumn("n_distinct_upto",
          graft.functions.expressions.UniqUpToAggregate.count(col(nm)))
        .drop(nm)
      case None => withQuantile
    }
  }

  /** REALTIME (lambda) read: the persisted states merged together with
    * the on-the-fly partial states of an UN-INGESTED tail — the answer a
    * realtime materialized view serves between ingests. The tail pays one
    * map-side-combined groupBy over ITS rows only; history stays states.
    * The caller restates the same keys/measures the store was built with
    * (measures are expressions, not recoverable from meta) — a mismatch
    * fails loudly against the recorded state schema. Exactness carries
    * over: states are associative, so merged(history) ⊎ partial(tail) ≡
    * from-raw over history ∪ tail, which is what the q162 oracle checks. */
  def mergedWithTail(spark: SparkSession, path: String, tail: DataFrame,
      keys: Seq[String], valueCol: String, distinctCol: String = null,
      quantileCol: String = null,
      uniqUpTo: (String, Int) = null,
      sumMap: Seq[(String, Column, Column)] = Nil): DataFrame =
    mergedWithTailStates(spark, path, tail, keys, distinctCol,
      Seq(("sum_micros", "min_v", "max_v", col(valueCol))),
      quantileCol = quantileCol, uniqUpTo = uniqUpTo, sumMap = sumMap)

  /** Multi-measure [[mergedWithTail]] (the [[appendMeasures]] naming). */
  def mergedWithTailMeasures(spark: SparkSession, path: String, tail: DataFrame,
      keys: Seq[String], measures: Seq[(String, Column)],
      distinctCol: String = null,
      argMax: Seq[(String, Column, Column)] = Nil,
      quantileCol: String = null,
      sumMap: Seq[(String, Column, Column)] = Nil,
      uniqUpTo: (String, Int) = null): DataFrame =
    mergedWithTailStates(spark, path, tail, keys, distinctCol,
      measures.map { case (nm, c) => (s"${nm}_sum_u", s"${nm}_min", s"${nm}_max", c) },
      argMax, quantileCol, sumMap, uniqUpTo)

  private def mergedWithTailStates(spark: SparkSession, path: String,
      tail: DataFrame, keys: Seq[String], distinctCol: String,
      measures: Seq[(String, String, String, Column)],
      argMax: Seq[(String, Column, Column)] = Nil,
      quantileCol: String = null,
      sumMap: Seq[(String, Column, Column)] = Nil,
      uniqUpTo: (String, Int) = null): DataFrame = {
    val meta = readMeta(spark, path)
    require(meta.stateSchema.nonEmpty,
      s"no aggregate store at $path — append a shard first")
    val tailStates = partialStates(tail, keys, distinctCol, measures, argMax,
      quantileCol, sumMap, uniqUpTo)
    require(tailStates.schema == meta.stateSchema.get && keys == meta.keyNames,
      s"tail states ${tailStates.schema} (keys $keys) do not match the " +
        s"store's ${meta.stateSchema.get} (keys ${meta.keyNames})")
    finishMerged(mergeStates(
      states(spark, path, meta).get.unionByName(tailStates), meta), meta)
  }

  /** Small-file / state maintenance: pre-merge every recorded subtree into
    * one `shard=__compacted` tree. Because the states are associative
    * merges, [[merged]] reads identically before and after; historical
    * shard ids stay in meta so long-gone shards still short-circuit at
    * [[processedShards]]. No-op before the first append. */
  def compact(spark: SparkSession, path: String, nFiles: Int = 1): Boolean =
    graft.core.WriterLease.withLease(spark, path) {
      val meta = readMeta(spark, path)
      if (meta.shardIds.isEmpty) false
      else {
        swapCompacted(spark, path, meta,
          mergeStates(states(spark, path, meta).get, meta), nFiles)
        true
      }
    }

  /** Shared tail of compact/expire/retire: record the compacted shard id
    * in meta (reads must accept the new subtree the moment it lands),
    * then atomically swap the merged states in as `shard=__compacted`. */
  private def swapCompacted(spark: SparkSession, path: String, meta: Meta,
      mergedStates: DataFrame, nFiles: Int): Unit = {
    if (!meta.shardIds.contains(CompactedShard))
      writeMeta(spark, path, meta.shardIds + CompactedShard,
        meta.stateSchema.get, meta.keyNames)
    graft.core.AtomicStore.replaceVia(spark, statesPath(path)) { tmp =>
      mergedStates.withColumn("shard", lit(CompactedShard)).coalesce(nFiles)
        .write.mode("overwrite").partitionBy("shard").parquet(tmp)
    }
  }

  /** SCHEMA EVOLUTION (round-10 verdict #5): re-shape a store with
    * history onto a new MEASURE LIST without a manual rebuild — the
    * ClickHouse `ALTER TABLE … ADD COLUMN … MATERIALIZE` analogue for
    * the AggregatingMergeTree states this store holds. Three cases per
    * target measure (appendMeasures naming):
    *
    *  - SHARED (already in the store): its states carry over through one
    *    associative merge — bit-identical to a fresh rebuild by the same
    *    closure compact() relies on (spec'd in AggStoreMigrateSpec);
    *  - NEW with `raw` provided: backfilled by one groupBy over `raw`
    *    (which must be the store's full ingested corpus — enforced by an
    *    exact per-key row-count parity check against the store's own `n`,
    *    so a stale/partial raw fails loudly instead of writing wrong
    *    states);
    *  - NEW without `raw`: explicit NULL-state semantics — the measure's
    *    states start NULL and accumulate from FUTURE appends only (sum /
    *    min / max all skip nulls, so the merge algebra is unaffected);
    *    the right choice when raw history is already retired.
    *
    * Measures absent from the target list are DROPPED. Non-measure states
    * (the distinct/quantile/sumMap/uniqUpTo sketches and argmax) pass
    * through untouched, in the positions a rebuild would give them.
    *
    * Crash-safe ordering: compacted-id into meta first (reads accept the
    * new subtree), then the atomic states swap (still readable under the
    * OLD schema — schema'd parquet reads select by name), then the meta
    * schema flip as the commit point. A crash anywhere leaves a store
    * that reads consistently and a migrate that re-runs to completion. */
  def migrate(spark: SparkSession, path: String,
      targetMeasures: Seq[(String, Column)], raw: DataFrame = null,
      nFiles: Int = 1): Boolean = graft.core.WriterLease.withLease(spark, path) {
    val meta = readMeta(spark, path)
    if (meta.shardIds.isEmpty) return false
    require(targetMeasures.nonEmpty, "migrate needs at least one target measure")
    val oldNames = meta.stateNames
    require(!oldNames.contains("sum_micros"),
      "migrate supports appendMeasures-named stores (single-measure legacy " +
        "stores carry unprefixed states — rebuild those)")
    val existing = oldNames.collect {
      case nm if nm.endsWith("_sum_u") => nm.stripSuffix("_sum_u")
    }.toSet
    val newMeasures = targetMeasures.filterNot { case (n, _) => existing(n) }
    val merged0 = mergeStates(states(spark, path, meta).get, meta)

    // backfill (or null-fill) the new measures' states per key. The
    // null-state encoding is EXACTLY what partialStates produces for a
    // group whose measure values are all null — sum_u 0, min/max NULL —
    // so every downstream consumer (merge algebra, the RollupRewrite
    // null-parity read) treats pre-migration history uniformly
    val withNew: DataFrame =
      if (newMeasures.isEmpty) merged0
      else if (raw == null) {
        newMeasures.foldLeft(merged0) { case (df, (nm, _)) =>
          df.withColumn(s"${nm}_sum_u", lit(0L))
            .withColumn(s"${nm}_min", lit(null).cast(DoubleType))
            .withColumn(s"${nm}_max", lit(null).cast(DoubleType))
        }
      } else {
        val backfill = partialStates(raw, meta.keyNames, null,
          newMeasures.map { case (nm, c) =>
            (s"${nm}_sum_u", s"${nm}_min", s"${nm}_max", c) })
          .withColumnRenamed("n", "__raw_n")
        val joined = merged0.join(backfill, meta.keyNames, "full_outer")
        // parity gate: raw must be EXACTLY the ingested corpus — any key
        // present on one side only, or any per-key count drift, aborts
        val bad = joined.filter(col("n").isNull || col("__raw_n").isNull ||
          col("n") =!= col("__raw_n")).count()
        require(bad == 0L,
          s"migrate backfill rejected: raw disagrees with the store's row " +
            s"counts on $bad group key(s) — raw must be the store's full " +
            "ingested corpus")
        joined.drop("__raw_n")
      }

    // assemble in REBUILD order: keys, n, target measures (target order),
    // then the non-measure states in their original relative order
    val measureStates = targetMeasures.flatMap { case (nm, _) =>
      Seq(s"${nm}_sum_u", s"${nm}_min", s"${nm}_max") }
    val passThrough = oldNames.filterNot(nm => nm == "n" ||
      existing.exists(m => nm == s"${m}_sum_u" || nm == s"${m}_min" || nm == s"${m}_max"))
    val outCols = meta.keyNames ++ Seq("n") ++ measureStates ++ passThrough
    val assembled = withNew.select(outCols.map(col): _*)
    // the recorded schema must be BIT-IDENTICAL to what partialStates
    // would produce for the target config (future appends require exact
    // StructType equality, nullability included): reuse old fields where
    // they exist, canonical measure-state fields for the new ones
    val old = meta.stateSchema.get
    val newSchema = StructType(outCols.map { nm =>
      old.find(_.name == nm).getOrElse {
        if (nm.endsWith("_sum_u")) StructField(nm, LongType, nullable = false)
        else StructField(nm, DoubleType, nullable = true)
      }
    })

    // 1. compacted id visible under the OLD schema
    if (!meta.shardIds.contains(CompactedShard))
      writeMeta(spark, path, meta.shardIds + CompactedShard,
        meta.stateSchema.get, meta.keyNames)
    // 2. atomic states swap (old-schema reads still resolve by name)
    graft.core.AtomicStore.replaceVia(spark, statesPath(path)) { tmp =>
      assembled.withColumn("shard", lit(CompactedShard)).coalesce(nFiles)
        .write.mode("overwrite").partitionBy("shard").parquet(tmp)
    }
    // 3. COMMIT: the meta schema flip
    writeMeta(spark, path, meta.shardIds + CompactedShard, newSchema,
      meta.keyNames)
    // a live MV registration describes the PRE-migration measure list —
    // drop it rather than let the rewrite serve a reshaped store
    // (re-register against the new defining query explicitly)
    graft.plans.MaterializedRollups.invalidateStore(path)
    true
  }

  /** Plain TTL delete (ClickHouse `TTL expr` without GROUP BY): DROP
    * states whose `expired` predicate holds — [[retire]]'s simpler
    * sibling for history that should vanish rather than coarsen. Same
    * compact mechanics (atomic swap, replay history kept). Three-valued
    * logic hazard handled: a NULL predicate (e.g. a null key under `<`)
    * counts as NOT expired — only rows the condition actually matches
    * are removed, the CH TTL semantics. */
  def expire(spark: SparkSession, path: String, expired: Column,
      nFiles: Int = 1): Boolean =
    graft.core.WriterLease.withLease(spark, path) {
      val meta = readMeta(spark, path)
      if (meta.shardIds.isEmpty) false
      else {
        val live = states(spark, path, meta).get
          .filter(!coalesce(expired, lit(false)))
        swapCompacted(spark, path, meta, mergeStates(live, meta), nFiles)
        // deleted history ≠ the registered defining query any more — a
        // live MV registration must not keep rewriting raw aggregates
        graft.plans.MaterializedRollups.invalidateStore(path)
        true
      }
    }

  /** State-granularity retirement — the ClickHouse `TTL expr GROUP BY
    * keys SET …` merge behaviour: states matching `expired` have key
    * columns REWRITTEN onto coarser values of the same column (e.g.
    * `event_day → trunc(event_day, "month")`) and re-merge under the
    * rewritten keys; live states — including rows where `expired`
    * evaluates to NULL (a null key never "matches" the TTL condition) —
    * pass through untouched. A [[compact]] variant: ONE pass rewrites
    * keys conditionally and one associative merge folds everything,
    * atomically swapped into the compacted subtree, so it is crash-safe
    * the same way and READER-INVISIBLE in shape — the key SCHEMA is
    * unchanged (the rewrite must keep each key's data type; use `trunc`,
    * not `date_trunc`, on dates), [[merged]] simply serves mixed
    * granularity, exactly like a CH part whose expired rows were
    * re-aggregated during a TTL merge. Every state type coarsens
    * losslessly by the [[mergeStatesAt]] closure; sketches keep their
    * usual bounds through the extra union. Old-enough history thereby
    * ages from O(days × keys) state rows to O(months × keys) without a
    * raw-data rescan, which is how the store's footprint stays bounded
    * over years of ingest. Idempotent: retired states no longer match a
    * sane time-based `expired` predicate (their key IS the coarse
    * value), and re-rewriting a coarse value is a fixpoint anyway.
    *
    * @param expired    predicate over the store's KEY columns
    * @param keyRewrite coarsening expression per key column (a key not
    *                   in the map passes through)
    */
  def retire(spark: SparkSession, path: String, expired: Column,
      keyRewrite: Map[String, Column], nFiles: Int = 1): Boolean =
    graft.core.WriterLease.withLease(spark, path) {
    val meta = readMeta(spark, path)
    if (meta.shardIds.isEmpty) return false
    require(keyRewrite.nonEmpty && keyRewrite.keys.forall(meta.keyNames.contains),
      s"keyRewrite columns ${keyRewrite.keys} must be store keys ${meta.keyNames}")
    // single pass: rewrite keys where the predicate HOLDS (NULL = live,
    // so a null key group is never silently dropped by 3-valued filters)
    val hit = coalesce(expired, lit(false))
    val rewritten = meta.keyNames.foldLeft(states(spark, path, meta).get) {
      case (df, k) => keyRewrite.get(k)
        .map(c => df.withColumn(k, when(hit, c).otherwise(col(k))))
        .getOrElse(df)
    }
    val merged = mergeStates(rewritten, meta)
    // names + types only: aggregate output nullability legitimately
    // differs from the recorded schema (parquet reads coerce it back)
    require(merged.schema.map(f => (f.name, f.dataType)) ==
        meta.stateSchema.get.map(f => (f.name, f.dataType)),
      s"keyRewrite changed the state schema to ${merged.schema} — rewrites " +
        s"must preserve each key's data type (store has ${meta.stateSchema.get})")
    swapCompacted(spark, path, meta, merged, nFiles)
    // coarsened history no longer answers the ORIGINAL-grain defining
    // query — drop any live MV registration instead of serving it wrong
    graft.plans.MaterializedRollups.invalidateStore(path)
    true
  }
}
