package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.AggStore
import graft.core.{Fs, Tables}
import graft.operators.Sample
import graft.sources.ZOrder

/** Round-9 production-layout family: the incremental rollup store
  * (ClickHouse AggregatingMergeTree analogue), deterministic hash
  * sampling (ClickHouse `SAMPLE` clause analogue), and an end-to-end
  * gate for the existing Z-order clustered writer. Each query is a full
  * round trip —
  * build the persisted artifact, read through it — gated by a DuckDB
  * oracle that recomputes the answer FROM RAW, so the incremental /
  * sampled / re-laid-out path must be bit-identical to the direct one. */
object RollupQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The q157 sampling parameters, shared by the Spark side and the
    * oracle text so the interval literals cannot drift apart. */
  private val SampleFraction = 0.1
  private val (sampleLo, sampleHi) = Sample.portableBounds(SampleFraction, 0.0)

  /** events projected to the rollup's columns (shard split key kept). */
  private def rollupInput(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      col("event_id"), col("event_type"),
      to_date(col("ts")).as("event_day"), col("value"))

  val all: Map[String, Q] = Map(
    // Incremental rollup: three derived ingest shards (event_id mod 3 —
    // standing in for three daily batches) append their PARTIAL STATES to
    // the persisted store; the emission is the merged read. The oracle
    // re-aggregates the raw events table, so state decomposition + merge
    // must reproduce the from-raw GROUP BY exactly — which the integer
    // micro-unit sum state guarantees where a double sum would drift with
    // merge order. Store I/O is scratch (built and deleted inside the
    // query); a production rollup passes a durable path.
    "q156_agg_rollup" -> ((s, dir) => {
      val ev = rollupInput(s, dir)
      val store = Fs.scratchDir("graft_agg_rollup")
      try {
        (0L to 2L).foreach { i =>
          AggStore.append(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i),
            keys = Seq("event_type", "event_day"), valueCol = "value",
            shardId = s"batch_$i")
        }
        AggStore.merged(s, store.toString)
          .select("event_type", "event_day", "n", "sum_micros", "min_v", "max_v")
          .orderBy("event_type", "event_day")
          // materialise before the finally deletes the files the plan reads
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // Deterministic hash sample (SAMPLE 0.1 semantics): both orders and
    // customer sampled BY THE SAME KEY (custkey), then joined — the
    // sample-consistency property (join of samples ≡ sample of the join)
    // is what the oracle verifies, since it filters the JOINED relation
    // once. The predicate is map-only (no RNG, no shuffle); customer is a
    // dimension so the join broadcasts.
    "q157_hash_sample" -> ((s, dir) => {
      val so = Sample.portable(Tables.load(s, dir, "orders"), "o_custkey", SampleFraction)
      val sc = Sample.portable(Tables.load(s, dir, "customer"), "c_custkey", SampleFraction)
      so.join(sc, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // argMax state (ClickHouse argMaxState/argMaxMerge): "latest value
    // per key" folded incrementally — the state is the struct<ord, arg>
    // maximum, so shards merge by struct max and the read never replays
    // event history to find the newest row. Ordinal = (event time,
    // event id): the unique id breaks timestamp ties deterministically,
    // which is what lets the DuckDB oracle (an explicit ORDER BY ts
    // DESC, event_id DESC window) match bit-for-bit.
    "q163_rollup_argmax" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "event_type", "ts", "value")
      val store = Fs.scratchDir("graft_rollup_argmax")
      try {
        val ord = struct(unix_micros(col("ts")).as("t"), col("event_id").as("id"))
        (0L to 2L).foreach { i =>
          AggStore.appendMeasures(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i),
            keys = Seq("event_type"),
            measures = Seq("value" -> col("value")),
            shardId = s"batch_$i",
            argMax = Seq(("latest", ord, col("value"))))
        }
        AggStore.merged(s, store.toString)
          .select(col("event_type"), col("n"),
            col("latest_argmax").getField("arg").as("latest_value"))
          .orderBy("event_type")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // REALTIME (lambda) rollup read: two of the three event batches are
    // folded into the persisted store; the third arrives as an
    // UN-INGESTED live tail, and the read merges stored states with the
    // tail's on-the-fly partial states. Same oracle as q156: history ⊎
    // tail must equal the from-raw GROUP BY over everything — the answer
    // a realtime materialized view serves between ingests, priced at one
    // groupBy over the tail only.
    "q162_rollup_realtime" -> ((s, dir) => {
      val ev = rollupInput(s, dir)
      val store = Fs.scratchDir("graft_rollup_rt")
      try {
        (0L to 1L).foreach { i =>
          AggStore.append(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i),
            keys = Seq("event_type", "event_day"), valueCol = "value",
            shardId = s"batch_$i")
        }
        AggStore.mergedWithTail(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === 2L),
            keys = Seq("event_type", "event_day"), valueCol = "value")
          .select("event_type", "event_day", "n", "sum_micros", "min_v", "max_v")
          .orderBy("event_type", "event_day")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // TPC-H Q1 answered FROM THE ROLLUP STORE (multi-measure states):
    // three lineitem ingest shards each fold five measures — including
    // the derived disc_price = extendedprice·(1−discount) and charge =
    // disc_price·(1+tax), which are NOT derivable from the factors'
    // independent states and so must be measures of their own — and the
    // report reads merged states only. The oracle recomputes Q1 from raw
    // lineitem in DuckDB; exact integer micro-unit sums make the
    // incremental answer bit-identical to the from-raw one. This is the
    // materialized-view pattern every ClickHouse deployment runs in
    // front of its fact tables, on the canonical analytics query.
    "q161_rollup_tpch_q1" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 23:59:59").cast("timestamp"))
      val store = Fs.scratchDir("graft_rollup_q1")
      try {
        val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        (0L to 2L).foreach { i =>
          AggStore.appendMeasures(s, store.toString,
            li.filter(pmod(col("l_orderkey"), lit(3L)) === i),
            keys = Seq("l_returnflag", "l_linestatus"),
            measures = Seq(
              "qty" -> col("l_quantity"),
              "price" -> col("l_extendedprice"),
              "disc_price" -> discPrice,
              "charge" -> (discPrice * (lit(1.0) + col("l_tax"))),
              "disc" -> col("l_discount")),
            shardId = s"batch_$i")
        }
        AggStore.merged(s, store.toString)
          .select(col("l_returnflag"), col("l_linestatus"),
            col("qty_sum_u"), col("price_sum_u"), col("disc_price_sum_u"),
            col("charge_sum_u"), col("disc_sum_u"), col("n").as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // Rollup with the DISTINCT-SKETCH state (the uniqState/uniqMerge half
    // of the AggregatingMergeTree story): three shards each fold an HLL
    // sketch of user_id per event_type; the merged read UNIONS sketches —
    // it never re-counts raw history. q75's discipline for the gate: the
    // emission pairs the oracle-computable exact distinct with a 5%
    // accuracy boolean on the merged estimate (the exact pass exists only
    // for the gate; production reads stop at the estimate).
    "q160_rollup_distinct" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "event_type", "user_id", "value")
      val store = Fs.scratchDir("graft_rollup_distinct")
      try {
        (0L to 2L).foreach { i =>
          AggStore.append(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i),
            keys = Seq("event_type"), valueCol = "value",
            shardId = s"batch_$i", distinctCol = "user_id")
        }
        val m = AggStore.merged(s, store.toString)
          .select(col("event_type"), col("n"), col("n_distinct_est"))
        val exact = ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"))
        m.join(exact, Seq("event_type"))
          .select(col("event_type"), col("n"), col("n_users"),
            (abs(col("n_distinct_est") - col("n_users")) <=
              col("n_users") * 0.05).as("est_ok"))
          .orderBy("event_type")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // TTL GROUP BY analogue (ClickHouse `TTL date GROUP BY keys SET …`,
    // the merge behaviour that re-AGGREGATES expired rows instead of
    // deleting them): a (type, day) store retires days before the
    // cutoff onto their month start — expired daily states re-merge
    // under the coarser key, recent days stay daily, and the read
    // serves the mixed granularity with no API change. The oracle
    // recomputes the same CASE-rewritten GROUP BY from raw, so the
    // retire must be a lossless re-merge bit-for-bit (the exact-state
    // algebra; sketch variants are spec'd). This is how the store's
    // footprint stays bounded over years of ingest: old history ages
    // from day-grain to month-grain state rows without a raw rescan.
    "q170_rollup_ttl" -> ((s, dir) => {
      val ev = rollupInput(s, dir)
      val store = Fs.scratchDir("graft_rollup_ttl")
      val cutoff = lit("2024-01-15").cast("date")
      try {
        (0L to 2L).foreach { i =>
          AggStore.append(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i),
            keys = Seq("event_type", "event_day"), valueCol = "value",
            shardId = s"batch_$i")
        }
        AggStore.retire(s, store.toString,
          expired = col("event_day") < cutoff,
          keyRewrite = Map("event_day" -> trunc(col("event_day"), "month")))
        AggStore.merged(s, store.toString)
          .select("event_type", "event_day", "n", "sum_micros", "min_v", "max_v")
          .orderBy("event_type", "event_day")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // Capped exact-distinct state (ClickHouse uniqUpTo(N) — the EXACT
    // complement to q160's HLL state: dashboards asking "distinct
    // buyers, exact while small, '>N' beyond" get a hard answer the
    // 2%-error sketch cannot give, at an O(N)-per-group price the
    // unbounded exact set cannot give). Two stores over the same three
    // shards gate both branches EXACTLY — N=1000 exercises the exact
    // branch (count ≤ N ⇒ bit-equal to countDistinct), N=3 the
    // saturation branch (sentinel N+1 ⇒ LEAST(countDistinct, 4)); both
    // are plain DuckDB arithmetic, so unlike the sketch gates there is
    // no tolerance anywhere.
    "q169_rollup_uniq_upto" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "event_type", "user_id", "value")
      val big = Fs.scratchDir("graft_uniq_upto_big")
      val small = Fs.scratchDir("graft_uniq_upto_small")
      try {
        (0L to 2L).foreach { i =>
          val shard = ev.filter(pmod(col("event_id"), lit(3L)) === i)
          AggStore.append(s, big.toString, shard, Seq("event_type"),
            "value", s"b_$i", uniqUpTo = ("user_id", 1000))
          AggStore.append(s, small.toString, shard, Seq("event_type"),
            "value", s"s_$i", uniqUpTo = ("user_id", 3))
        }
        val exact = AggStore.merged(s, big.toString)
          .select(col("event_type"), col("n"),
            col("n_distinct_upto").as("n_users_upto_1000"))
        val capped = AggStore.merged(s, small.toString)
          .select(col("event_type"),
            col("n_distinct_upto").as("n_users_upto_3"))
        exact.join(capped, Seq("event_type"))
          .orderBy("event_type")
          .localCheckpoint(true)
      } finally { Fs.deleteRecursively(big); Fs.deleteRecursively(small) }
    }),

    // COARSENED rollup read (the cascaded-materialized-view shape: where
    // ClickHouse stacks a second MV per granularity, the state algebra
    // answers the coarser question from the SAME store): a (type, day)
    // store with uniq + quantile states, read at (type). Exact states
    // re-merge losslessly — the oracle checks them bit-for-bit against a
    // from-raw GROUP BY type — and the sketch states keep their usual
    // contracts through the extra union level (HLL 5%, GK rank window),
    // emitted as est_ok booleans beside the oracle-computable exacts.
    "q168_rollup_coarsen" -> ((s, dir) => {
      val evd = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("user_id"),
          to_date(col("ts")).as("event_day"), col("value"))
      val store = Fs.scratchDir("graft_rollup_coarsen")
      try {
        (0L to 2L).foreach { i =>
          AggStore.append(s, store.toString,
            evd.filter(pmod(col("event_id"), lit(3L)) === i),
            keys = Seq("event_type", "event_day"), valueCol = "value",
            shardId = s"batch_$i", distinctCol = "user_id",
            quantileCol = "value")
        }
        val m = AggStore.mergedAt(s, store.toString, Seq("event_type"))
          .select("event_type", "n", "sum_micros", "min_v", "max_v",
            "n_distinct_est", "q_p50")
        val eps = graft.functions.expressions.QuantileSketchAggregate.DefaultEps
        val n = count(lit(1))
        val qOk = {
          val le = sum(when(col("value") <= col("q_p50"), 1L).otherwise(0L))
          val lt = sum(when(col("value") < col("q_p50"), 1L).otherwise(0L))
          val slack = lit(eps) * n + lit(2.0)
          val target = ceil(lit(0.5) * n)
          (lt + lit(1) <= target + slack) && (le >= target - slack)
        }
        evd.join(m, Seq("event_type"))
          .groupBy("event_type")
          .agg(n.as("n"),
            max(col("sum_micros")).as("sum_micros"),
            max(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"),
            countDistinct(col("user_id")).as("n_users"),
            (abs(max(col("n_distinct_est")) - countDistinct(col("user_id"))) <=
              countDistinct(col("user_id")) * 0.05).as("dist_ok"),
            qOk.as("q50_ok"))
          .orderBy("event_type")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // Rollup with the MAP state (ClickHouse sumMap / sumMapState — the
    // map-typed AggregatingMergeTree column): each shard folds value
    // micro-units into a per-day map keyed by event_type; the merged
    // read key-wise-sums the shard maps — associative long addition, so
    // the incremental answer is bit-identical to the from-raw GROUP BY
    // whatever order shards arrive. The emission EXPLODES the merged
    // maps to rows, which is exactly how a DuckDB oracle can check a
    // map state without map-ordering hazards (the aggregate key-sorts,
    // but rows are the portable comparison surface).
    "q167_rollup_summap" -> ((s, dir) => {
      val ev = rollupInput(s, dir)
      val store = Fs.scratchDir("graft_rollup_summap")
      try {
        (0L to 2L).foreach { i =>
          AggStore.appendMeasures(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i),
            keys = Seq("event_day"),
            measures = Seq("value" -> col("value")),
            shardId = s"batch_$i",
            sumMap = Seq(("by_type", col("event_type"), col("value"))))
        }
        AggStore.merged(s, store.toString)
          .select(col("event_day"),
            explode(col("by_type_summap")).as(Seq("event_type", "type_sum_u")))
          .orderBy("event_day", "event_type")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // Rollup with the QUANTILE-SKETCH state (the quantileState /
    // quantileMerge half of the AggregatingMergeTree story, next to
    // q160's uniqState): three shards each fold a Greenwald-Khanna
    // summary of value per event_type; the merged read MERGES summaries —
    // it never re-folds raw history — and finishes them to p50/p90/p99
    // estimates. Gate discipline: the GK contract is a RANK bound (the
    // estimate's true rank within eps·n of p·n, preserved by the merge
    // lemma), so the emission computes each estimate's exact rank
    // envelope against the raw table in integer arithmetic and emits the
    // boolean; the oracle-computable exact median rides along for bite.
    // The raw pass exists only for the gate; production reads stop at
    // the estimates.
    "q164_rollup_quantile" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "event_type", "value")
      val store = Fs.scratchDir("graft_rollup_quantile")
      try {
        (0L to 2L).foreach { i =>
          AggStore.append(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i),
            keys = Seq("event_type"), valueCol = "value",
            shardId = s"batch_$i", quantileCol = "value")
        }
        val m = AggStore.merged(s, store.toString)
          .select("event_type", "q_p50", "q_p90", "q_p99")
        val eps = graft.functions.expressions.QuantileSketchAggregate.DefaultEps
        // est's possible ranks are (count(< est), count(<= est)]; the GK
        // window around ceil(p·n) is eps·n wide, +2 covers the ceil/floor
        // convention edges at tiny n. est_ok ⇔ the intervals intersect.
        def ok(p: Double, est: Column, n: Column): Column = {
          val le = sum(when(col("value") <= est, 1L).otherwise(0L))
          val lt = sum(when(col("value") < est, 1L).otherwise(0L))
          val slack = lit(eps) * n + lit(2.0)
          val target = ceil(lit(p) * n)
          (lt + lit(1) <= target + slack) && (le >= target - slack)
        }
        val n = count(lit(1))
        ev.join(m, Seq("event_type"))
          .groupBy("event_type")
          .agg(n.as("n"),
            round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
            ok(0.5, col("q_p50"), n).as("est_ok_50"),
            ok(0.9, col("q_p90"), n).as("est_ok_90"),
            ok(0.99, col("q_p99"), n).as("est_ok_99"))
          .orderBy("event_type")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(store)
    }),

    // The q156 rollup as a LIVE STREAM (the AggregatingMergeTree
    // ingestion loop): an availableNow events stream folds per-batch
    // partial states into the persisted store; the emission is the
    // merged store. Same oracle as q156 — the merge is associative, so
    // micro-batching must be invisible in the result.
    "q159_streaming_rollup" -> ((s, dir) =>
      graft.streaming.StreamingReconcile.rollupStream(s, dir)),

    // MATERIALIZED-VIEW AUTO-REWRITE (the ClickHouse MV-read behaviour,
    // round-10 #1): the q156 store is built and REGISTERED as the
    // materialized view of the raw events table; the emission then runs
    // the RAW-TABLE aggregate — groupBy over Tables.load(events), no
    // mention of the store — and the RollupRewrite optimizer rule answers
    // it from merged states. Structural claim oracle-gated the q147 way:
    // `raw_scan_elided` is computed from the emission's own optimized
    // plan (store states scanned, raw fixture NOT), and the DuckDB oracle
    // recomputes the aggregate from raw — so the rewrite must be both
    // plan-real and bit-identical. At 100 TB this is the read that turns
    // a corpus scan+shuffle into a dimension-sized states merge with NO
    // query change.
    "q171_rollup_rewrite" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val store = Fs.scratchDir("graft_rollup_rewrite")
      try {
        (0L to 2L).foreach { i =>
          AggStore.appendMeasures(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i)
              .select(col("event_type"), to_date(col("ts")).as("event_day"),
                col("value")),
            keys = Seq("event_type", "event_day"),
            measures = Seq("value" -> col("value")),
            shardId = s"batch_$i")
        }
        graft.plans.MaterializedRollups.register(ev, store.toString,
          keys = Seq("event_type" -> col("event_type"),
            "event_day" -> to_date(col("ts"))),
          measures = Seq("value" -> col("value")))
        try {
          val raw = ev.groupBy(col("event_type"),
              to_date(col("ts")).as("event_day"))
            .agg(count(lit(1)).as("n"),
              sum(AggStore.micros(col("value"))).as("sum_micros"),
              min(col("value")).as("min_v"), max(col("value")).as("max_v"))
            .orderBy("event_type", "event_day")
          val paths = graft.plans.MaterializedRollups.scanPaths(raw)
          val elided = !paths.exists(_.contains("events.parquet")) &&
            paths.exists(_.contains(store.toString))
          require(elided, s"rollup rewrite did not fire — plan scans $paths")
          raw.withColumn("raw_scan_elided", lit(elided))
            .localCheckpoint(true)
        } finally graft.plans.MaterializedRollups.unregister(ev)
      } finally Fs.deleteRecursively(store)
    }),

    // The COARSENED auto-rewrite (q171's subset-key arm as its own gate):
    // the same (type, day) store answers a groupBy(type)-ONLY raw-table
    // aggregate through AggStore.mergedAt — the cascaded-MV read routed
    // by the optimizer rule, exact because every state re-merges
    // associatively at the coarser key. Same plan-assert discipline; the
    // oracle recomputes GROUP BY event_type from raw.
    "q173_rollup_rewrite_coarse" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val store = Fs.scratchDir("graft_rollup_rewrite_coarse")
      try {
        (0L to 2L).foreach { i =>
          AggStore.appendMeasures(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i)
              .select(col("event_type"), to_date(col("ts")).as("event_day"),
                col("value")),
            keys = Seq("event_type", "event_day"),
            measures = Seq("value" -> col("value")),
            shardId = s"batch_$i")
        }
        graft.plans.MaterializedRollups.register(ev, store.toString,
          keys = Seq("event_type" -> col("event_type"),
            "event_day" -> to_date(col("ts"))),
          measures = Seq("value" -> col("value")))
        try {
          val raw = ev.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(AggStore.micros(col("value"))).as("sum_micros"),
              min(col("value")).as("min_v"), max(col("value")).as("max_v"))
            .orderBy("event_type")
          val paths = graft.plans.MaterializedRollups.scanPaths(raw)
          val elided = !paths.exists(_.contains("events.parquet")) &&
            paths.exists(_.contains(store.toString))
          require(elided, s"coarsened rollup rewrite did not fire — plan scans $paths")
          raw.withColumn("raw_scan_elided", lit(elided))
            .localCheckpoint(true)
        } finally graft.plans.MaterializedRollups.unregister(ev)
      } finally Fs.deleteRecursively(store)
    }),

    // DERIVED-KEY re-grain through the auto-rewrite (the third rewrite
    // arm, round-10 extension): a raw-table aggregate grouped by
    // MONTH-OF-DAY — a FUNCTION of the store key, not the key itself —
    // routes through AggStore.mergedBy, which regroups the daily states
    // under the derived expression (associative merges regroup
    // losslessly under any function of the keys). This is the dashboard
    // time-rollup ClickHouse answers with a SECOND coarser MV; here it
    // is the same store, one states-sized groupBy. Plan-asserted +
    // from-raw oracle like q171/q173.
    "q174_rollup_rewrite_regrain" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val store = Fs.scratchDir("graft_rollup_rewrite_regrain")
      try {
        (0L to 2L).foreach { i =>
          AggStore.appendMeasures(s, store.toString,
            ev.filter(pmod(col("event_id"), lit(3L)) === i)
              .select(col("event_type"), to_date(col("ts")).as("event_day"),
                col("value")),
            keys = Seq("event_type", "event_day"),
            measures = Seq("value" -> col("value")),
            shardId = s"batch_$i")
        }
        graft.plans.MaterializedRollups.register(ev, store.toString,
          keys = Seq("event_type" -> col("event_type"),
            "event_day" -> to_date(col("ts"))),
          measures = Seq("value" -> col("value")))
        try {
          val raw = ev.groupBy(col("event_type"),
              trunc(to_date(col("ts")), "month").as("event_month"))
            .agg(count(lit(1)).as("n"),
              sum(AggStore.micros(col("value"))).as("sum_micros"),
              min(col("value")).as("min_v"), max(col("value")).as("max_v"))
            .orderBy("event_type", "event_month")
          val paths = graft.plans.MaterializedRollups.scanPaths(raw)
          val elided = !paths.exists(_.contains("events.parquet")) &&
            paths.exists(_.contains(store.toString))
          require(elided, s"regrain rollup rewrite did not fire — plan scans $paths")
          raw.withColumn("raw_scan_elided", lit(elided))
            .localCheckpoint(true)
        } finally graft.plans.MaterializedRollups.unregister(ev)
      } finally Fs.deleteRecursively(store)
    }),

    // TPC-H Q1 THROUGH THE AUTO-REWRITE (the filter-subsumption arm as a
    // catalog gate, on the canonical analytics query): the q161 store —
    // five measures incl. the derived disc_price/charge expressions —
    // is registered WITH its shipdate defining filter; the emission runs
    // the RAW Q1 shape over Tables.load(lineitem) with the same filter,
    // and the rule must recognise the filter as baked into the states
    // (a query WITHOUT it is spec-guaranteed to fall back) and answer
    // every sum from merged micro-unit states bit-exactly. This is the
    // full ClickHouse deployment pattern end to end: MV in front of the
    // fact table, reports unchanged, corpus scan gone.
    "q175_rollup_rewrite_q1" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val cutoff = lit("1998-09-02 23:59:59").cast("timestamp")
      val store = Fs.scratchDir("graft_rollup_rewrite_q1")
      val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val measures = Seq(
        "qty" -> col("l_quantity"),
        "price" -> col("l_extendedprice"),
        "disc_price" -> discPrice,
        "charge" -> (discPrice * (lit(1.0) + col("l_tax"))),
        "disc" -> col("l_discount"))
      try {
        (0L to 2L).foreach { i =>
          AggStore.appendMeasures(s, store.toString,
            li.filter(col("l_shipdate") <= cutoff)
              .filter(pmod(col("l_orderkey"), lit(3L)) === i),
            keys = Seq("l_returnflag", "l_linestatus"),
            measures = measures, shardId = s"batch_$i")
        }
        graft.plans.MaterializedRollups.register(li, store.toString,
          keys = Seq("l_returnflag" -> col("l_returnflag"),
            "l_linestatus" -> col("l_linestatus")),
          measures = measures,
          filter = Some(col("l_shipdate") <= cutoff))
        try {
          val raw = li.filter(col("l_shipdate") <= cutoff)
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(
              sum(AggStore.micros(col("l_quantity"))).as("qty_sum_u"),
              sum(AggStore.micros(col("l_extendedprice"))).as("price_sum_u"),
              sum(AggStore.micros(discPrice)).as("disc_price_sum_u"),
              sum(AggStore.micros(discPrice * (lit(1.0) + col("l_tax"))))
                .as("charge_sum_u"),
              sum(AggStore.micros(col("l_discount"))).as("disc_sum_u"),
              count(lit(1)).as("count_order"))
            .orderBy("l_returnflag", "l_linestatus")
          val paths = graft.plans.MaterializedRollups.scanPaths(raw)
          val elided = !paths.exists(_.contains("lineitem.parquet")) &&
            paths.exists(_.contains(store.toString))
          require(elided, s"Q1 rollup rewrite did not fire — plan scans $paths")
          raw.withColumn("raw_scan_elided", lit(elided))
            .localCheckpoint(true)
        } finally graft.plans.MaterializedRollups.unregister(li)
      } finally Fs.deleteRecursively(store)
    }),

    // Z-order layout round trip: rewrite events through
    // ZOrder.writeClustered on (user_id, day-offset of ts), then run a
    // 2-d box query over the re-laid-out files. q76 gates the curve
    // ARITHMETIC bit-for-bit; this gates the WRITER path end to end — the
    // curve is layout-only, so the oracle runs the same box on the RAW
    // fixture and any row lost or duplicated by the rewrite is a hash
    // mismatch. (The skipping win itself is measured in
    // sources/ZOrderSpec, where the layout contrast is observable.) The
    // ts dimension enters as seconds-from-corpus-min: scale16 maps
    // [0, max] onto the 16-bit grid, and raw epoch seconds would collapse
    // the month's span into one cell at the top of the domain.
    "q158_zorder_box" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val out = Fs.scratchDir("graft_zorder_box")
      try {
        // production stats lookup: two longs off one tiny agg job
        val r = ev.agg(min(unix_seconds(col("ts"))), max(unix_seconds(col("ts"))),
          max(col("user_id"))).head()
        val (t0, t1, maxUser) = (r.getLong(0), r.getLong(1), r.getLong(2))
        ZOrder.writeClustered(ev, col("user_id"),
          unix_seconds(col("ts")) - lit(t0), maxA = maxUser, maxB = t1 - t0,
          path = s"$out/events_z", numFiles = 8)
        s.read.parquet(s"$out/events_z")
          .filter(col("user_id").between(10L, 49L) &&
            col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
            col("ts") <= lit("2024-01-14 23:59:59").cast("timestamp"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(AggStore.micros(col("value"))).as("sum_micros"),
            min(col("value")).as("min_v"), max(col("value")).as("max_v"))
          .orderBy("event_type")
          .localCheckpoint(true)
      } finally Fs.deleteRecursively(out)
    })
  )

  val oracles: Map[String, String] = Map(
    "q156_agg_rollup" ->
      ("SELECT event_type, CAST(ts AS DATE) AS event_day, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v " +
        "FROM events GROUP BY 1, 2 ORDER BY event_type, event_day"),
    "q163_rollup_argmax" ->
      ("WITH r AS (SELECT event_type, value, row_number() OVER " +
        "(PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn FROM events), " +
        "t AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type) " +
        "SELECT t.event_type, t.n, r.value AS latest_value " +
        "FROM t JOIN r ON r.event_type = t.event_type AND r.rn = 1 " +
        "ORDER BY t.event_type"),
    "q162_rollup_realtime" ->
      ("SELECT event_type, CAST(ts AS DATE) AS event_day, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v " +
        "FROM events GROUP BY 1, 2 ORDER BY event_type, event_day"),
    "q161_rollup_tpch_q1" -> {
      def sumU(e: String, as: String) =
        s"CAST(sum(CAST(floor(($e) * 1e6) AS BIGINT)) AS BIGINT) AS $as"
      "SELECT l_returnflag, l_linestatus, " +
        sumU("l_quantity", "qty_sum_u") + ", " +
        sumU("l_extendedprice", "price_sum_u") + ", " +
        sumU("l_extendedprice * (1.0 - l_discount)", "disc_price_sum_u") + ", " +
        sumU("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", "charge_sum_u") + ", " +
        sumU("l_discount", "disc_sum_u") + ", " +
        "count(*) AS count_order FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    },
    "q160_rollup_distinct" ->
      ("SELECT event_type, count(*) AS n, " +
        "count(DISTINCT user_id) AS n_users, TRUE AS est_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q170_rollup_ttl" ->
      ("WITH r AS (SELECT event_type, " +
        "CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15' " +
        "THEN date_trunc('month', CAST(ts AS DATE)) " +
        "ELSE CAST(ts AS DATE) END AS event_day, value FROM events) " +
        "SELECT event_type, event_day, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v " +
        "FROM r GROUP BY 1, 2 ORDER BY event_type, event_day"),
    "q169_rollup_uniq_upto" ->
      ("SELECT event_type, count(*) AS n, " +
        "LEAST(count(DISTINCT user_id), 1001) AS n_users_upto_1000, " +
        "LEAST(count(DISTINCT user_id), 4) AS n_users_upto_3 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q168_rollup_coarsen" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v, " +
        "count(DISTINCT user_id) AS n_users, " +
        "TRUE AS dist_ok, TRUE AS q50_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q167_rollup_summap" ->
      ("SELECT CAST(ts AS DATE) AS event_day, event_type, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS type_sum_u " +
        "FROM events GROUP BY 1, 2 ORDER BY event_day, event_type"),
    "q164_rollup_quantile" ->
      ("SELECT event_type, count(*) AS n, " +
        "round(quantile_cont(value, 0.5), 6) AS p50_exact, " +
        "TRUE AS est_ok_50, TRUE AS est_ok_90, TRUE AS est_ok_99 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q159_streaming_rollup" ->
      ("SELECT event_type, CAST(ts AS DATE) AS event_day, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v " +
        "FROM events GROUP BY 1, 2 ORDER BY event_type, event_day"),
    "q171_rollup_rewrite" ->
      ("SELECT event_type, CAST(ts AS DATE) AS event_day, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v, TRUE AS raw_scan_elided " +
        "FROM events GROUP BY 1, 2 ORDER BY event_type, event_day"),
    "q173_rollup_rewrite_coarse" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v, TRUE AS raw_scan_elided " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q174_rollup_rewrite_regrain" ->
      ("SELECT event_type, CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS event_month, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v, TRUE AS raw_scan_elided " +
        "FROM events GROUP BY 1, 2 ORDER BY event_type, event_month"),
    "q175_rollup_rewrite_q1" -> {
      def sumU(e: String, as: String) =
        s"CAST(sum(CAST(floor(($e) * 1e6) AS BIGINT)) AS BIGINT) AS $as"
      "SELECT l_returnflag, l_linestatus, " +
        sumU("l_quantity", "qty_sum_u") + ", " +
        sumU("l_extendedprice", "price_sum_u") + ", " +
        sumU("l_extendedprice * (1.0 - l_discount)", "disc_price_sum_u") + ", " +
        sumU("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", "charge_sum_u") + ", " +
        sumU("l_discount", "disc_sum_u") + ", " +
        "count(*) AS count_order, TRUE AS raw_scan_elided FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    },
    "q157_hash_sample" ->
      ("SELECT o_orderkey, o_custkey, c_name, o_totalprice " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        s"WHERE ${PortableSql.hex15("md5(CAST(o_custkey AS VARCHAR))")} >= $sampleLo " +
        s"AND ${PortableSql.hex15("md5(CAST(o_custkey AS VARCHAR))")} < $sampleHi " +
        "ORDER BY o_orderkey"),
    "q158_zorder_box" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros, " +
        "min(value) AS min_v, max(value) AS max_v " +
        "FROM events WHERE user_id BETWEEN 10 AND 49 " +
        "AND ts >= TIMESTAMP '2024-01-08 00:00:00' " +
        "AND ts <= TIMESTAMP '2024-01-14 23:59:59' " +
        "GROUP BY event_type ORDER BY event_type")
  )
}
