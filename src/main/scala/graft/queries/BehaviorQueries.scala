package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Behavior

/** Behavioral-analytics family (q142–q144): the ClickHouse
  * windowFunnel / retention / sequenceCount surface over the events log.
  * Every oracle is a full DuckDB recomputation — the funnel's
  * exists-a-chain formulation as nested self-joins, the pair count as a
  * literal ordered self-join count — so the greedy one-pass Spark folds
  * are verified against the definitionally-quadratic spellings.
  */
object BehaviorQueries {

  private val FunnelWindowMs = 21600000L // 6 h: fixture yields levels 1, 2 and 3
  private val HourMs = 3600000L
  private val MaxOffset = 48

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private val funnelStep =
    when(col("event_type") === "view", 1)
      .when(col("event_type") === "click", 2)
      .when(col("event_type") === "purchase", 3)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // windowFunnel(6h)(ts, view, click, purchase): deepest strictly-ordered
    // chain within a window anchored at the chain's first event. The Spark
    // side is the greedy latest-start fold (Behavior scaladoc has the
    // exchange argument); the oracle enumerates chains with self-joins.
    "q142_window_funnel" -> ((s, dir) =>
      Behavior.funnelLevels(events(s, dir), "user_id", "ts",
        funnelStep, nSteps = 3, windowMs = FunnelWindowMs)),

    // hourly cohort retention: users cohorted by the hour bucket of their
    // first signup; per offset 0..48, distinct users active in
    // cohort_bucket + offset. Pure integer epoch-hour arithmetic.
    "q143_cohort_retention" -> ((s, dir) =>
      Behavior.cohortRetention(events(s, dir), "user_id", "ts",
        col("event_type") === "signup", bucketMs = HourMs,
        maxOffset = MaxOffset)),

    // sequenceMatch('(?1).*(?2)') + sequenceCount over (view, purchase):
    // per user, the number of strictly-ordered (view, purchase) pairs and
    // whether any exists — one linear fold vs the oracle's join count.
    "q144_sequence_pairs" -> ((s, dir) =>
      Behavior.sequencePairs(events(s, dir), "user_id", "ts",
        col("event_type") === "view", col("event_type") === "purchase")),

    // q142 as a LIVE STREAM: per-user funnel accumulators fold forward
    // batch-over-batch through the persisted state store (left-fold
    // seeding makes the split provably equal to one pass —
    // StreamingReconcile.mergeFunnelBatch scaladoc), over two
    // time-ordered micro-batches with users spanning the boundary. The
    // emission must equal the batch operator, so the SAME chain-
    // enumeration oracle certifies the incremental path externally.
    "q145_streaming_funnel" -> ((s, dir) =>
      graft.streaming.StreamingReconcile.funnelStream(s, dir,
        funnelStep, nSteps = 3, windowMs = FunnelWindowMs)),

    // windowFunnel in STRICT_ORDER mode: any tracked event that is not a
    // chain's next step kills the chain, so valid chains are exactly
    // CONSECUTIVE runs of the per-user step sequence — the fold keeps at
    // most one live chain plus the max level ever reached. The oracle
    // spells "no intervening tracked event" as NOT EXISTS with the
    // fold's exact tie order ((t, -step)), so ties cannot diverge.
    "q146_funnel_strict_order" -> ((s, dir) =>
      Behavior.funnelLevelsStrictOrder(events(s, dir), "user_id", "ts",
        funnelStep, nSteps = 3, windowMs = FunnelWindowMs)),

    // windowFunnel in STRICT_DEDUP mode: a repeat of an ALREADY-MATCHED
    // condition between consecutive chain steps interrupts the chain
    // (an event of step <= k inside the (k, k+1) gap); chains at lower
    // levels survive, so the multi-chain greedy persists — with the
    // max-level slot, since deeper chains can die after being counted.
    // Completes the ClickHouse mode family: default (q142),
    // strict_order (q146), strict_dedup (here).
    "q150_funnel_strict_dedup" -> ((s, dir) =>
      Behavior.funnelLevelsStrictDedup(events(s, dir), "user_id", "ts",
        funnelStep, nSteps = 3, windowMs = FunnelWindowMs)),

    // the literal ClickHouse retention() combinator: per user,
    // r1 = cond1 ever held; rN = r1 AND condN — then the report row of
    // Σr1..ΣrN. Two fully map-side-combined aggregates (bool_or per
    // user, sums over users), no sequence state at all.
    "q149_retention_flags" -> ((s, dir) => {
      val e = events(s, dir)
      val flags = e.groupBy("user_id").agg(
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("c1"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c2"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("c3"))
      flags.agg(
        sum(col("c1")).as("r1"),
        sum(col("c1") * col("c2")).as("r2"),
        sum(col("c1") * col("c3")).as("r3"),
        count(lit(1)).as("n_users"))
    })
  )

  val oracles: Map[String, String] = Map(

    // the streamed funnel must land exactly where the batch fold does —
    // one oracle text, two access paths (the q91/q95/q97 discipline)
    "q145_streaming_funnel" -> FunnelOracle,

    "q142_window_funnel" -> FunnelOracle,

    "q149_retention_flags" ->
      ("WITH f AS (SELECT user_id, " +
        "max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c1, " +
        "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2, " +
        "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3 " +
        "FROM events GROUP BY user_id) " +
        "SELECT CAST(sum(c1) AS BIGINT) AS r1, CAST(sum(c1 * c2) AS BIGINT) AS r2, " +
        "CAST(sum(c1 * c3) AS BIGINT) AS r3, count(*) AS n_users FROM f"),

    "q150_funnel_strict_dedup" -> {
      // gap (k, k+1) may not contain a repeat of a matched condition:
      // x.s <= k, in the fold's (t, -step) processing order
      def repeatIn(a: String, b: String, maxS: Int) =
        s"EXISTS (SELECT 1 FROM e x WHERE x.user_id = $a.user_id AND x.s <= $maxS " +
          s"AND (x.t > $a.t OR (x.t = $a.t AND x.s < $a.s)) " +
          s"AND (x.t < $b.t OR (x.t = $b.t AND x.s > $b.s)))"
      "WITH e AS (SELECT user_id, epoch_ms(ts) AS t, " +
        "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 END AS s " +
        "FROM events WHERE event_type IN ('view','click','purchase')), " +
        "u AS (SELECT DISTINCT user_id FROM e), " +
        "l1 AS (SELECT DISTINCT user_id FROM e WHERE s = 1), " +
        "l2 AS (SELECT DISTINCT a.user_id FROM e a JOIN e b ON b.user_id = a.user_id " +
        s"AND a.s = 1 AND b.s = 2 AND b.t > a.t AND b.t <= a.t + $FunnelWindowMs AND NOT ${repeatIn("a", "b", 1)}), " +
        "l3 AS (SELECT DISTINCT a.user_id FROM e a JOIN e b ON b.user_id = a.user_id " +
        s"AND a.s = 1 AND b.s = 2 AND b.t > a.t AND b.t <= a.t + $FunnelWindowMs AND NOT ${repeatIn("a", "b", 1)} " +
        "JOIN e c ON c.user_id = a.user_id AND c.s = 3 AND c.t > b.t " +
        s"AND c.t <= a.t + $FunnelWindowMs AND NOT ${repeatIn("b", "c", 2)}) " +
        "SELECT user_id, CASE WHEN user_id IN (SELECT user_id FROM l3) THEN 3 " +
        "WHEN user_id IN (SELECT user_id FROM l2) THEN 2 " +
        "WHEN user_id IN (SELECT user_id FROM l1) THEN 1 ELSE 0 END AS funnel_level " +
        "FROM u ORDER BY user_id"
    },

    "q146_funnel_strict_order" -> {
      // "x intervenes between a and b" in the fold's exact processing
      // order: after a and before b under the (t, -step) sort — step
      // DESC breaks timestamp ties, so a same-instant deeper event
      // precedes a shallower one on both sides
      def interv(a: String, b: String) =
        s"EXISTS (SELECT 1 FROM e x WHERE x.user_id = $a.user_id " +
          s"AND (x.t > $a.t OR (x.t = $a.t AND x.s < $a.s)) " +
          s"AND (x.t < $b.t OR (x.t = $b.t AND x.s > $b.s)))"
      "WITH e AS (SELECT user_id, epoch_ms(ts) AS t, " +
        "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 END AS s " +
        "FROM events WHERE event_type IN ('view','click','purchase')), " +
        "u AS (SELECT DISTINCT user_id FROM e), " +
        "l1 AS (SELECT DISTINCT user_id FROM e WHERE s = 1), " +
        "l2 AS (SELECT DISTINCT a.user_id FROM e a JOIN e b ON b.user_id = a.user_id " +
        s"AND a.s = 1 AND b.s = 2 AND b.t > a.t AND b.t <= a.t + $FunnelWindowMs AND NOT ${interv("a", "b")}), " +
        "l3 AS (SELECT DISTINCT a.user_id FROM e a JOIN e b ON b.user_id = a.user_id " +
        s"AND a.s = 1 AND b.s = 2 AND b.t > a.t AND b.t <= a.t + $FunnelWindowMs AND NOT ${interv("a", "b")} " +
        "JOIN e c ON c.user_id = a.user_id AND c.s = 3 AND c.t > b.t " +
        s"AND c.t <= a.t + $FunnelWindowMs AND NOT ${interv("b", "c")}) " +
        "SELECT user_id, CASE WHEN user_id IN (SELECT user_id FROM l3) THEN 3 " +
        "WHEN user_id IN (SELECT user_id FROM l2) THEN 2 " +
        "WHEN user_id IN (SELECT user_id FROM l1) THEN 1 ELSE 0 END AS funnel_level " +
        "FROM u ORDER BY user_id"
    },

    "q143_cohort_retention" ->
      (s"WITH c AS (SELECT user_id, min(epoch_ms(ts)) // $HourMs AS cohort_bucket " +
        "FROM events WHERE event_type = 'signup' GROUP BY user_id), " +
        s"a AS (SELECT DISTINCT user_id, epoch_ms(ts) // $HourMs AS bucket FROM events) " +
        "SELECT cohort_bucket, bucket - cohort_bucket AS bucket_offset, count(*) AS n_users " +
        "FROM c JOIN a USING (user_id) " +
        s"WHERE bucket - cohort_bucket BETWEEN 0 AND $MaxOffset " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    "q144_sequence_pairs" ->
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_type FROM events " +
        "WHERE event_type IN ('view','purchase')), " +
        "u AS (SELECT DISTINCT user_id FROM e), " +
        "p AS (SELECT a.user_id, count(*) AS c FROM e a JOIN e b " +
        "ON b.user_id = a.user_id AND a.event_type = 'view' AND b.event_type = 'purchase' AND a.t < b.t " +
        "GROUP BY a.user_id) " +
        "SELECT u.user_id, CAST(coalesce(p.c, 0) AS BIGINT) AS n_pairs, " +
        "coalesce(p.c, 0) > 0 AS matched " +
        "FROM u LEFT JOIN p USING (user_id) ORDER BY u.user_id")
  )

  private lazy val FunnelOracle: String =
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS t, " +
        "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 END AS s " +
        "FROM events WHERE event_type IN ('view','click','purchase')), " +
        "u AS (SELECT DISTINCT user_id FROM e), " +
        "l1 AS (SELECT DISTINCT user_id FROM e WHERE s = 1), " +
        s"l2 AS (SELECT DISTINCT a.user_id FROM e a JOIN e b ON b.user_id = a.user_id AND a.s = 1 AND b.s = 2 AND b.t > a.t AND b.t <= a.t + $FunnelWindowMs), " +
        s"l3 AS (SELECT DISTINCT a.user_id FROM e a JOIN e b ON b.user_id = a.user_id AND a.s = 1 AND b.s = 2 AND b.t > a.t AND b.t <= a.t + $FunnelWindowMs " +
        s"JOIN e c ON c.user_id = a.user_id AND c.s = 3 AND c.t > b.t AND c.t <= a.t + $FunnelWindowMs) " +
        "SELECT user_id, CASE WHEN user_id IN (SELECT user_id FROM l3) THEN 3 " +
        "WHEN user_id IN (SELECT user_id FROM l2) THEN 2 " +
        "WHEN user_id IN (SELECT user_id FROM l1) THEN 1 ELSE 0 END AS funnel_level " +
        "FROM u ORDER BY user_id")
}
