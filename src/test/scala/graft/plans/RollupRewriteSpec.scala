package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.agg.AggStore
import graft.core.Tables

/** RollupRewrite contract: an aggregate over a registered raw table plans
  * through the store's merged states (raw scan GONE from the plan) and
  * stays bit-identical to the from-raw answer; every mismatch — unknown
  * aggregate shape, foreign measure, non-key filter, missing/drifted
  * store — falls back to the raw plan, never to an error. */
class RollupRewriteSpec extends SparkSpec {

  private def events = Tables.load(spark, sf001, "events")

  private val keyExprs = Seq(
    "event_type" -> col("event_type"),
    "event_day" -> to_date(col("ts")))
  private val measureExprs = Seq("value" -> col("value"))

  private def buildStore(store: String): Unit =
    (0L to 2L).foreach { i =>
      AggStore.appendMeasures(spark, store,
        events.filter(pmod(col("event_id"), lit(3L)) === i)
          .select(col("event_type"), to_date(col("ts")).as("event_day"),
            col("value")),
        keys = Seq("event_type", "event_day"),
        measures = Seq("value" -> col("value")),
        shardId = s"b_$i")
    }

  private def rawAgg: DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("event_day"))
      .agg(count(lit(1)).as("n"),
        sum(AggStore.micros(col("value"))).as("sum_micros"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))

  private def scansRaw(df: DataFrame): Boolean =
    MaterializedRollups.scanPaths(df).exists(_.contains("events.parquet"))

  private def asSet(df: DataFrame) = df.collect().map(_.toSeq).toSet

  private def withStore(f: String => Unit): Unit = {
    val store = tmpDir("rollup_rw")
    try { buildStore(store); f(store) }
    finally MaterializedRollups.clear()
  }

  test("full-key aggregate plans through the store and matches from-raw") {
    val expected = asSet(rawAgg) // registry empty: the plain plan
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      val df = rawAgg
      assert(!scansRaw(df), "raw fixture still scanned after rewrite")
      assert(MaterializedRollups.scanPaths(df).exists(_.contains(store)),
        "store states not scanned")
      assert(asSet(df) == expected)
    }
  }

  test("key-subset aggregate rewrites through mergedAt (cascaded MV read)") {
    val coarse = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(AggStore.micros(col("value"))).as("sum_micros"))
    val expected = asSet(coarse)
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      val df = events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(AggStore.micros(col("value"))).as("sum_micros"))
      assert(!scansRaw(df))
      assert(asSet(df) == expected)
    }
  }

  test("derived grouping over a key rewrites through mergedBy (read-time re-grain)") {
    val regrain = events.groupBy(col("event_type"),
        trunc(to_date(col("ts")), "month").as("event_month"))
      .agg(count(lit(1)).as("n"),
        sum(AggStore.micros(col("value"))).as("sum_micros"),
        min(col("value")).as("min_v"))
    val expected = asSet(regrain)
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      val df = events.groupBy(col("event_type"),
          trunc(to_date(col("ts")), "month").as("event_month"))
        .agg(count(lit(1)).as("n"),
          sum(AggStore.micros(col("value"))).as("sum_micros"),
          min(col("value")).as("min_v"))
      assert(!scansRaw(df), "month-of-day grouping should regroup the daily states")
      assert(asSet(df) == expected)
      // a derived grouping over NON-key data must fall back
      val foreign = events.groupBy((col("user_id") % 10).as("b"))
        .agg(count(lit(1)).as("n"))
      assert(scansRaw(foreign))
    }
  }

  test("extra filter on a grouping key applies post-merge") {
    val expected = asSet(rawAgg.filter(col("event_type") === "click"))
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      val df = events.filter(col("event_type") === "click")
        .groupBy(col("event_type"), to_date(col("ts")).as("event_day"))
        .agg(count(lit(1)).as("n"),
          sum(AggStore.micros(col("value"))).as("sum_micros"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      assert(!scansRaw(df), "key-only filter should not block the rewrite")
      assert(asSet(df) == expected)
    }
  }

  test("non-key filter falls back to the raw plan (still correct)") {
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      val df = events.filter(col("user_id") > 10)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      assert(scansRaw(df), "a filter the store did not bake in must disable the rewrite")
      assert(df.count() > 0)
    }
  }

  test("foreign measure / unsupported aggregate falls back") {
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      // sum over a column the store never folded
      val foreign = events.groupBy(col("event_type"))
        .agg(sum(AggStore.micros(col("user_id"))).as("s"))
      assert(scansRaw(foreign))
      // avg is not state-derivable bit-exactly → no rewrite
      val avgQ = events.groupBy(col("event_type")).agg(avg(col("value")).as("a"))
      assert(scansRaw(avgQ))
      // distinct aggregates are not in the state algebra → no rewrite
      val dist = events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("d"))
      assert(scansRaw(dist))
    }
  }

  test("registered filter must be present in the query (narrower store never answers wider query)") {
    val store = tmpDir("rollup_rw_filter")
    val cutoff = lit("2024-01-10").cast("date")
    try {
      val filtered = events.filter(to_date(col("ts")) < cutoff)
      (0L to 1L).foreach { i =>
        AggStore.appendMeasures(spark, store,
          filtered.filter(pmod(col("event_id"), lit(2L)) === i)
            .select(col("event_type"), col("value")),
          keys = Seq("event_type"),
          measures = Seq("value" -> col("value")), shardId = s"b_$i")
      }
      MaterializedRollups.register(events, store,
        keys = Seq("event_type" -> col("event_type")),
        measures = measureExprs,
        filter = Some(to_date(col("ts")) < cutoff))
      // query WITH the defining filter → rewrite, matches from-raw
      val expected = asSet(filtered.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")))
      val hit = events.filter(to_date(col("ts")) < cutoff)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(!scansRaw(hit))
      assert(asSet(hit) == expected)
      // query WITHOUT it → must NOT read the narrower store
      val miss = events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(scansRaw(miss))
    } finally MaterializedRollups.clear()
  }

  test("store drift falls back to raw: missing path and missing measure") {
    withStore { store =>
      // registration points at a path with no store at all
      MaterializedRollups.register(events, tmpDir("rollup_rw_gone"),
        keyExprs, measureExprs)
      val df = rawAgg
      assert(scansRaw(df), "a missing store must fall back, not fail")
      assert(df.count() > 0)
      MaterializedRollups.clear()
      // registration promises a measure the store does not carry
      MaterializedRollups.register(events, store,
        keyExprs, Seq("other" -> col("value")))
      val df2 = events.groupBy(col("event_type"))
        .agg(sum(AggStore.micros(col("value"))).as("s"))
      assert(scansRaw(df2), "a drifted store (state column missing) must fall back")
      assert(df2.count() > 0)
    }
  }

  test("sum null parity: an all-null group reads NULL through the store") {
    val rawDir = tmpDir("rollup_rw_nulls") + "/t.parquet"
    import spark.implicits._
    Seq(("a", Some(1.0)), ("a", Some(2.0)), ("b", None), ("b", None))
      .toDF("k", "v").write.parquet(rawDir)
    val raw = spark.read.parquet(rawDir)
    val store = tmpDir("rollup_rw_nullstore")
    try {
      AggStore.appendMeasures(spark, store, raw, keys = Seq("k"),
        measures = Seq("v" -> col("v")), shardId = "s0")
      val expected = asSet(raw.groupBy(col("k"))
        .agg(sum(AggStore.micros(col("v"))).as("s"), min(col("v")).as("mn")))
      MaterializedRollups.register(raw, store,
        keys = Seq("k" -> col("k")), measures = Seq("v" -> col("v")))
      val df = raw.groupBy(col("k"))
        .agg(sum(AggStore.micros(col("v"))).as("s"), min(col("v")).as("mn"))
      assert(!MaterializedRollups.scanPaths(df).exists(_.contains("t.parquet")))
      assert(asSet(df) == expected, "all-null group must read NULL, not 0")
    } finally MaterializedRollups.clear()
  }

  test("store maintenance that changes state meaning invalidates the registration") {
    val expected = asSet(rawAgg)
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      assert(!scansRaw(rawAgg))
      // TTL retirement coarsens old days onto months: the store no longer
      // answers the full-grain defining query — the rewrite must NOT keep
      // serving it (silently wrong history); raw plan returns, answer exact
      AggStore.retire(spark, store,
        expired = col("event_day") < lit("2100-01-01").cast("date"),
        keyRewrite = Map("event_day" -> trunc(col("event_day"), "month")))
      val df = rawAgg
      assert(scansRaw(df), "a retired store must not keep answering the original grain")
      assert(asSet(df) == expected)
    }
    // migrate reshapes measures: same invalidation contract
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      assert(!scansRaw(rawAgg))
      AggStore.migrate(spark, store,
        Seq("value" -> col("value"), "extra" -> (col("value") + 1)), raw = null)
      assert(scansRaw(rawAgg), "a migrated store must require re-registration")
    }
  }

  test("unregister restores the raw plan") {
    withStore { store =>
      MaterializedRollups.register(events, store, keyExprs, measureExprs)
      assert(!scansRaw(rawAgg))
      MaterializedRollups.unregister(events)
      assert(scansRaw(rawAgg))
    }
  }
}
