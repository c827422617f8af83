package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.AsOfExpressions

/** As-of join — for each left row, the most recent right row at or before
  * its timestamp, matched within partition keys. An operator vanilla Spark
  * lacks; per the preference order we COMPOSE built-ins rather than write a
  * SparkPlan: the union-window formulation needs exactly ONE shuffle (the
  * window partitioning) and no join at all, which beats any join-based
  * physical operator at scale:
  *
  *   1. tag right rows 0 / left rows 1 and union them
  *   2. window per key, ordered by (ts, tag): running `last(payload,
  *      ignoreNulls=true)` carries each right payload forward to every
  *      later left row (tag ordering makes equal-ts matches inclusive,
  *      mirroring ASOF's `l.ts >= r.ts`)
  *   3. keep the left rows
  *
  * 100 TB notes: state per window partition is one payload struct — the
  * sort is the only cost; skewed keys (one user with billions of events)
  * shard by time-bucketing the key. Tolerance (max staleness) composes as a
  * post-filter on `leftTs - matchedTs`.
  */
object AsOfJoin {

  /** @param left      left relation
    * @param right     right relation
    * @param keys      equi-match columns present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (renamed as given)
    * @param tolerance max staleness in seconds (None = unbounded)
    */
  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    // right side: ts aligned into the left ts column, payload wrapped in a
    // struct so one last() carries everything (including the match ts)
    val rStruct = struct((payload.map(col) :+ col(rightTs).as("__match_ts")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as(leftTs), rStruct.as("__p"), lit(0).as("__tag")): _*)
    val l = left.select(
      leftCols.map(col) ++ Seq(lit(null).cast(r.schema("__p").dataType).as("__p"), lit(1).as("__tag")): _*)
    // union by name with missing left-only columns nulled on the right side
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(leftTs).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val withinTol: Column = tolerance match {
      case Some(secs) =>
        col("__m").isNotNull &&
          unix_timestamp(col(leftTs)) - unix_timestamp(col("__m.__match_ts")) <= secs
      case None => col("__m").isNotNull
    }
    val guarded = when(withinTol, col("__m"))
    matched.select(
      leftCols.map(col) ++
        payload.map(p => guarded.getField(p).as(p)) :+
        guarded.getField("__match_ts").as("match_ts"): _*)
  }

  /** Zero-left-shuffle as-of for DIMENSION-sized right sides (exchange
    * rates, config history, slowly-changing reference tables): the right
    * side collapses to one sorted array per key and broadcasts, each left
    * row binary-searches its match — a map-only pass over the left table,
    * where [[backward]] pays a full window shuffle of left ∪ right. Use
    * [[backward]] when the right side is fact-sized.
    *
    * The per-row pick is the native O(log history)
    * [[graft.functions.expressions.AsOfExpressions.SortedAsOfPick]] — the
    * obvious `filter(arr, e -> e.ts <= lt)` + `element_at(..., size(...))`
    * composition is a measured scale trap (x10 corpus: 55x runtime for 10x
    * data): the higher-order filter materialises a fresh candidate array
    * per LEFT row and re-evaluates per field reference, so per-row cost
    * grows linearly with each key's history length.
    *
    * Same semantics as [[backward]] (at-or-before inclusive, tolerance as
    * max staleness, null when nothing qualifies), with a DETERMINISTIC
    * equal-ts tiebreak (max payload struct) where backward's depends on
    * input order. Right-side rows per key must fit one array (~the same
    * bound a broadcast hash join already imposes on the build side). */
  def broadcastBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val rStruct = struct(col(rightTs).as("__ts") +: payload.map(col): _*)
    val arr = right.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(rStruct)).as("__arr"))
    val lt = col(leftTs)
    val pick = AsOfExpressions.sortedAsOfPick(col("__arr"), lt)
    // the last element at-or-before lt is the LEAST stale candidate: if it
    // violates the tolerance, every earlier one does too — so tolerance is
    // a post-check on the picked element, not a search predicate
    val hit = tolerance match {
      case Some(secs) => when(
        unix_timestamp(lt) - unix_timestamp(pick.getField("__ts")) <= secs, pick)
      case None => pick
    }
    left.join(broadcast(arr), keys, "left")
      .select(left.columns.toSeq.map(col) ++
        payload.map(p => hit.getField(p).as(p)) :+
        hit.getField("__ts").as("match_ts"): _*)
  }
}
