package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.AsOfExpressions

/** Time-series gap fill with interpolation — the ClickHouse
  * `ORDER BY … WITH FILL STEP <interval> INTERPOLATE (…)` analogue
  * (reference deployments run it over the copied tables for dashboard
  * series; q81 covers the zero-fill half, this operator the carry/
  * interpolate half).
  *
  * Input is a SERIES — one row per (key, ts) observation, i.e. the output
  * of an aggregation, never the raw fact table. Each key's grid runs from
  * its first to its last observation in `step` increments (CH WITH FILL's
  * default FROM/TO), and every grid row carries
  *
  *  - `fill_v`   — last observation at or before the slot (LOCF, the CH
  *                 `INTERPOLATE (v)` carry form; same type as `valueCol`),
  *  - `interp_v` — linear interpolation between the neighbouring
  *                 observations (double),
  *  - `is_gap`   — whether the slot was generated rather than observed.
  *
  * Spark-first shape, and why it is join- and window-free: the series
  * collapses to ONE sorted observation array per key (the
  * [[AsOfJoin.broadcastBackward]] representation), the grid explodes out
  * of `sequence(lo, hi, step)` NEXT TO that array, and each slot picks its
  * neighbours with the O(log n) native binary search
  * [[AsOfExpressions.SortedAsOfPick]] — the forward pick reuses the same
  * expression over the ts-NEGATED sort, so "first at or after" is "last
  * at or before" on the mirrored axis. One shuffle total (the groupBy),
  * no window partition to skew, no join to plan. 100 TB shape: cost is
  * O(series + grid·log(points-per-key)); the per-key observation array is
  * bounded by the key's TIME RANGE over the step (the q81 spine bound),
  * never by the fact-table row count — aggregating facts into the series
  * is the caller's (cheap, map-side-combined) first stage.
  */
object GapFill {

  /** PRECONDITION — observations must be STEP-ALIGNED: the output contains
    * only the grid slots `lo + k·step`, so an observation off the grid
    * (02:30 under a 1-hour step) influences its neighbours' fill/interp
    * values but is NOT emitted as a row of its own (ClickHouse WITH FILL
    * would keep it alongside the fill rows). Series produced by a
    * time-bucketing aggregation (`date_trunc`/`window` at the same step —
    * the intended input, and what q165 feeds) are aligned by construction;
    * align any other series first, e.g. by truncating `tsCol` to the step.
    *
    * @param series   one row per (keys, tsCol) observation
    * @param keys     series identity columns
    * @param tsCol    TimestampType observation column
    * @param valueCol numeric measure to fill
    * @param step     grid step, e.g. `expr("INTERVAL 1 HOUR")`
    */
  def fillInterpolate(series: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, step: Column): DataFrame = {
    val ts = col(tsCol)
    // micros domain: SortedAsOfPick needs one primitive orderable axis,
    // and the interpolation fraction needs numeric ts arithmetic anyway
    val fwd = struct(unix_micros(ts).as("t"), col(valueCol).as("v"))
    val bwd = struct((-unix_micros(ts)).as("t"), col(valueCol).as("v"))
    val perKey = series.groupBy(keys.map(col): _*).agg(
      sort_array(collect_list(fwd)).as("__obs"),
      sort_array(collect_list(bwd)).as("__sbo"),
      min(ts).as("__lo"), max(ts).as("__hi"))
    val grid = perKey.select(keys.map(col) ++ Seq(col("__obs"), col("__sbo"),
      explode(sequence(col("__lo"), col("__hi"), step)).as(tsCol)): _*)

    val t = unix_micros(col(tsCol))
    val prev = AsOfExpressions.sortedAsOfPick(col("__obs"), t)
    val next = AsOfExpressions.sortedAsOfPick(col("__sbo"), -t)
    val (pt, pv) = (prev.getField("t"), prev.getField("v"))
    val (nt, nv) = ((-next.getField("t")), next.getField("v"))
    // grid ⊆ [lo, hi] ⇒ prev and next always exist; pt == nt only on an
    // observed slot, where the fraction's 0/0 must yield the observation
    val frac = (t - pt).cast("double") / (nt - pt).cast("double")
    val interp = when(t === pt, pv.cast("double"))
      .otherwise(pv.cast("double") + (nv - pv).cast("double") * frac)
    grid.select(keys.map(col) ++ Seq(col(tsCol),
      pv.as("fill_v"), interp.as("interp_v"), (t =!= pt).as("is_gap")): _*)
  }
}
