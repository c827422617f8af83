package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral (event-sequence) analytics — the ClickHouse `windowFunnel`,
  * `retention`, and `sequenceCount` surface re-expressed Spark-first. The
  * reference copies tables out of a ClickHouse warehouse
  * (`/root/reference/database/database.go`), and these are the queries such
  * a warehouse exists to answer, so the engine carries them natively.
  *
  * Scale shape shared by all three: events are FILTERED to the relevant
  * condition rows first (funnel steps / A-B markers / cohort events), then
  * grouped by the entity (user). Per-entity state is bounded by the
  * entity's own activity — the q46-sessionize class — and the funnel fold
  * additionally offers an ENFORCED `maxUserEvents` skip-and-flag guard
  * (pre-counted BEFORE any per-user array materialises, so a bot user with
  * 10M events costs one counter row, not a 100 MB aggregation buffer).
  * No windows, no self-joins: the per-user sequence logic is a single
  * `aggregate` HOF fold over a sorted event array, so the only shuffles are
  * hash-partitions on `user_id`.
  */
object Behavior {

  private val None_ = Long.MinValue

  /** The funnel fold's per-user accumulator: `acc(k)` = latest chain-start
    * among chains reaching level k+1, `Long.MinValue` = unreached. Exposed
    * (with [[funnelAcc]]/[[funnelLevel]]) for the STREAMING form: a left
    * fold seeded with the previous batches' accumulator over the new
    * events IS the whole-history fold — split the per-user event sequence
    * at any time point and the seeded second half computes bit-identically
    * to one pass (see StreamingReconcile.mergeFunnelBatch). */
  private[graft] def funnelInit(nSteps: Int): Column =
    array_repeat(lit(None_), nSteps)

  /** One funnel fold step sequence over a sorted `(t, ns = -step)` event
    * array, from an arbitrary initial accumulator. */
  private[graft] def funnelAcc(evs: Column, init: Column,
      windowMs: Long): Column =
    aggregate(
      evs, init,
      (acc, e) => {
        val s = -e.getField("ns") // sort key stored step-negated
        val t = e.getField("t")
        // CaseWhen evaluates lazily, so element_at never sees index 0
        val cand = when(s === 1, t).otherwise(
          when(element_at(acc, s - 1) >= t - lit(windowMs),
            element_at(acc, s - 1)).otherwise(lit(None_)))
        transform(acc, (v, i) =>
          when(i === s - 1, greatest(v, cand)).otherwise(v))
      })

  /** Levels fill as a prefix (acc(k) is only ever set from acc(k-1)), so
    * the level is the count of non-sentinel slots. */
  private[graft] def funnelLevel(acc: Column): Column =
    size(filter(acc, v => v =!= lit(None_)))

  /** The `strict_order` fold (ClickHouse windowFunnel mode): any tracked
    * event that is not a chain's NEXT step KILLS that chain — a step-s
    * event extends level s-1 to s (or starts a chain, s = 1) and every
    * other live chain dies, so after each event at most ONE chain
    * survives. The event universe is the PROJECTED step events (`stepOf`
    * non-null); untracked rows are not interventions — they were never
    * part of the relation handed to the funnel. Because a killed chain's
    * best level must still count (the mode reports the deepest level any
    * chain EVER reached), the accumulator carries one extra slot:
    * `acc(nSteps)` = max level reached so far. */
  private[graft] def funnelAccStrictOrder(evs: Column, init: Column,
      windowMs: Long, nSteps: Int): Column =
    aggregate(
      evs, init,
      (acc, e) => {
        val s = -e.getField("ns")
        val t = e.getField("t")
        val cand = when(s === 1, t).otherwise(
          when(element_at(acc, s - 1) >= t - lit(windowMs),
            element_at(acc, s - 1)).otherwise(lit(None_)))
        transform(acc, (v, i) =>
          when(i === nSteps,
            greatest(v, when(cand =!= lit(None_), s.cast("long"))
              .otherwise(lit(0L))))
            .otherwise(when(i === s - 1, cand).otherwise(lit(None_))))
      })

  private[graft] def strictOrderInit(nSteps: Int): Column =
    concat(array_repeat(lit(None_), nSteps), array(lit(0L)))

  /** The `strict_dedup` fold (ClickHouse windowFunnel mode): a step-s
    * event kills every chain whose matched set already CONTAINS s (all
    * chains at level >= s — level s-1's old occupant included, since a
    * level-s chain holds step s) while chains at level < s-1 are
    * untouched (their sets lack s) and level s-1 both survives and
    * spawns the extension. Kills depend only on s, so all chains at a
    * level share fate and the max-start greedy stays optimal. Same
    * max-level extra slot as [[funnelAccStrictOrder]] — killed chains'
    * best level must still count. */
  private[graft] def funnelAccStrictDedup(evs: Column, init: Column,
      windowMs: Long, nSteps: Int): Column =
    aggregate(
      evs, init,
      (acc, e) => {
        val s = -e.getField("ns")
        val t = e.getField("t")
        val cand = when(s === 1, t).otherwise(
          when(element_at(acc, s - 1) >= t - lit(windowMs),
            element_at(acc, s - 1)).otherwise(lit(None_)))
        transform(acc, (v, i) =>
          when(i === nSteps,
            greatest(v, when(cand =!= lit(None_), s.cast("long"))
              .otherwise(lit(0L))))
            .otherwise(when(i < s - 1, v)
              .otherwise(when(i === s - 1, cand).otherwise(lit(None_)))))
      })

  /** windowFunnel in `strict_dedup` mode: same chains as [[funnelLevels]]
    * PLUS a repeat of an already-matched condition between consecutive
    * chain steps interrupts the chain (an event of step <= k between the
    * k-th and (k+1)-th chain members). */
  def funnelLevelsStrictDedup(events: DataFrame, userCol: String,
      tsCol: String, stepOf: Column, nSteps: Int,
      windowMs: Long): DataFrame = {
    require(nSteps >= 1 && nSteps <= 32, s"nSteps out of range: $nSteps")
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    funnelGrouped(funnelStepped(events, userCol, tsCol, stepOf, nSteps))
      .select(col("user_id"),
        element_at(
          funnelAccStrictDedup(col("evs"), strictOrderInit(nSteps),
            windowMs, nSteps),
          nSteps + 1).cast("int").as("funnel_level"))
      .orderBy("user_id")
  }

  /** windowFunnel in `strict_order` mode: same chain definition as
    * [[funnelLevels]] PLUS no tracked event may intervene between
    * consecutive chain steps. Same greedy argument (at most one live
    * chain makes it trivial); ties stay strict via the (t, -step) sort. */
  def funnelLevelsStrictOrder(events: DataFrame, userCol: String,
      tsCol: String, stepOf: Column, nSteps: Int,
      windowMs: Long): DataFrame = {
    require(nSteps >= 1 && nSteps <= 32, s"nSteps out of range: $nSteps")
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    funnelGrouped(funnelStepped(events, userCol, tsCol, stepOf, nSteps))
      .select(col("user_id"),
        element_at(
          funnelAccStrictOrder(col("evs"), strictOrderInit(nSteps),
            windowMs, nSteps),
          nSteps + 1).cast("int").as("funnel_level"))
      .orderBy("user_id")
  }

  /** (user_id, t, step) projection of the funnel-relevant events. */
  private[graft] def funnelStepped(events: DataFrame, userCol: String,
      tsCol: String, stepOf: Column, nSteps: Int): DataFrame =
    events
      .select(col(userCol).as("user_id"),
        unix_millis(col(tsCol)).as("t"),
        stepOf.cast("int").as("step"))
      .filter(col("t").isNotNull && col("step").isNotNull &&
        col("step").between(1, nSteps))

  /** Per-user sorted `(t, ns)` event arrays; the `(t, -step)` sort key is
    * what makes timestamp ties strict (deeper step folds first). */
  private[graft] def funnelGrouped(stepped: DataFrame): DataFrame =
    stepped.groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("t"), (-col("step")).as("ns")))).as("evs"))

  /** ClickHouse `windowFunnel(window)(ts, cond1, …, condN)`: per user, the
    * deepest funnel level reachable by a chain of events e1 < e2 < … < eL
    * (timestamps STRICTLY increasing) with `stepOf(ei) = i` and
    * `ts(eL) <= ts(e1) + windowMs` — the window is anchored at the chain's
    * FIRST event.
    *
    * Algorithm (the standard greedy, one pass in ts order): `acc(k)` holds
    * the LATEST chain-start timestamp among chains reaching level k+1 seen
    * so far. A step-s event at time t extends `acc(s-2)` iff that start is
    * within the window (`>= t - windowMs`); a step-1 event starts a new
    * chain at t. Keeping the MAX start per level is optimal by exchange:
    * a later start satisfies every window test an earlier one does. Strict
    * ordering on timestamp ties is enforced structurally — the sort key is
    * `(t, -step)`, so at equal t the DEEPER step folds first and cannot see
    * a same-instant shallower event.
    *
    * Level = number of non-sentinel slots (levels fill as a prefix, since
    * `acc(k)` is only ever set from `acc(k-1)`).
    *
    * `stepOf` maps a row to its 1-based step number (null = not a funnel
    * event; such rows are dropped before the group-by). With
    * `maxUserEvents > 0`, users holding more step events than the cap are
    * emitted with `funnel_level = -1` (flagged, never silently truncated)
    * and their events never reach `collect_list`.
    */
  def funnelLevels(events: DataFrame, userCol: String, tsCol: String,
                   stepOf: Column, nSteps: Int, windowMs: Long,
                   maxUserEvents: Int = 0): DataFrame = {
    require(nSteps >= 1 && nSteps <= 32, s"nSteps out of range: $nSteps")
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    val stepped = funnelStepped(events, userCol, tsCol, stepOf, nSteps)

    def levelOf(grouped: DataFrame): DataFrame =
      grouped.select(col("user_id"),
        funnelLevel(funnelAcc(col("evs"), funnelInit(nSteps), windowMs))
          .as("funnel_level"))

    val out =
      if (maxUserEvents <= 0) levelOf(funnelGrouped(stepped))
      else {
        // Guard pre-counts per user so the fat user's events are dropped
        // BEFORE any array aggregation — the cost of a bot is one long.
        val counts = stepped.groupBy("user_id").agg(count(lit(1)).as("n_ev"))
        val flagged = counts.filter(col("n_ev") > maxUserEvents)
          .select(col("user_id"), lit(-1).as("funnel_level"))
        val ok = counts.filter(col("n_ev") <= maxUserEvents).select("user_id")
        levelOf(funnelGrouped(stepped.join(ok, "user_id"))).unionByName(flagged)
      }
    out.orderBy("user_id")
  }

  /** Cohort retention (the report ClickHouse's `retention` combinator
    * feeds): users are cohorted by the time bucket of their FIRST
    * `cohortCond` event; for each offset `0..maxOffset`, counts how many
    * of the cohort were active (ANY event) in `cohort_bucket + offset`.
    * Buckets are integer epoch-millisecond divisions (`t div bucketMs`) —
    * no calendar/timezone arithmetic, so the emission is engine-portable.
    *
    * Plan: one per-user min-aggregate (cohort assignment), one distinct
    * over (user, bucket) activity pairs, an equi-join on user_id (both
    * sides corpus-derived, so the broadcast-demotion rule keeps it a
    * shuffle join), and a final small aggregate — every shuffle key is the
    * user or the (cohort, offset) pair, nothing entity-unbounded.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      cohortCond: Column, bucketMs: Long,
                      maxOffset: Int): DataFrame = {
    require(bucketMs > 0 && maxOffset >= 0)
    val base = events.select(col(userCol).as("user_id"),
      unix_millis(col(tsCol)).as("t"), cohortCond.as("is_cohort"))
    val cohorts = base.filter(col("is_cohort"))
      .groupBy("user_id").agg(min("t").as("t0"))
      .select(col("user_id"), expr(s"t0 div ${bucketMs}L").as("cohort_bucket"))
    val active = base
      .select(col("user_id"), expr(s"t div ${bucketMs}L").as("bucket"))
      .distinct()
    cohorts.join(active, "user_id")
      .select(col("cohort_bucket"),
        (col("bucket") - col("cohort_bucket")).as("bucket_offset"))
      .filter(col("bucket_offset").between(0, maxOffset))
      .groupBy("cohort_bucket", "bucket_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_bucket", "bucket_offset")
  }

  /** ClickHouse `sequenceMatch('(?1).*(?2)')` + `sequenceCount`: per user,
    * `n_pairs` = number of (a, b) event pairs with `condA(a)`, `condB(b)`,
    * and `ts(a) < ts(b)` STRICTLY; `matched` = any such pair exists. One
    * fold over the sorted marker array keeps a running A-count and adds it
    * on every B — O(events) per user, never the quadratic pair set. Ties
    * are strict by construction: the sort key is (t, marker) with B's
    * marker 0 < A's 1, so a same-instant A is not yet counted when its B
    * folds. A row matching BOTH conditions contributes as both (it enters
    * the union twice), matching the self-join oracle formulation.
    */
  def sequencePairs(events: DataFrame, userCol: String, tsCol: String,
                    condA: Column, condB: Column): DataFrame = {
    val base = events.select(col(userCol).as("user_id"),
      unix_millis(col(tsCol)).as("t"), condA.as("a"), condB.as("b"))
    val marked = base.filter(col("a"))
      .select(col("user_id"), col("t"), lit(1).as("m"))
      .unionAll(base.filter(col("b"))
        .select(col("user_id"), col("t"), lit(0).as("m")))
    val folded = aggregate(
      col("evs"), array(lit(0L), lit(0L)),
      (acc, e) => when(e.getField("m") === 1,
        array(element_at(acc, 1) + 1L, element_at(acc, 2)))
        .otherwise(array(element_at(acc, 1),
          element_at(acc, 2) + element_at(acc, 1))))
    marked.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("t"), col("m")))).as("evs"))
      .select(col("user_id"),
        element_at(folded, 2).as("n_pairs"),
        (element_at(folded, 2) > 0).as("matched"))
      .orderBy("user_id")
  }
}
