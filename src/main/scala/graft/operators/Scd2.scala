package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build — collapse an event
  * log into per-entity validity intervals: one row per maximal run of an
  * unchanged tracked attribute, with [valid_from, valid_to) half-open
  * bounds and the current interval open (valid_to NULL). The
  * dimension-history form every warehouse derives from a change log (the
  * reference engine's events tables stop at the log itself; this is the
  * temporal closure over one).
  *
  * Scale shape: the classic gaps-and-islands formulation — one lag + one
  * running sum, BOTH windows partitioned by the entity (per-user history,
  * bounded by the entity's own activity — the CatalogPlanSpec whitelist
  * class), then a (user, version) aggregate, then a lead over the
  * INTERVAL rows (≤ one row per run, already collapsed). Nothing global:
  * entity count scales out, per-entity history is the only per-task
  * bound, the same contract as sessionization (q46).
  *
  * Determinism: runs are delimited by (ts, tieBreak) total order —
  * tieBreak must be a unique key (event_id) so equal timestamps order
  * identically on both engines.
  */
object Scd2 {

  /** @param events   (entity, ts, attr, tieBreak) change log
    * @return one row per run: entity, version (1-based change ordinal),
    *         attr, valid_from, valid_to (NULL while current), n_events */
  def history(events: DataFrame, entity: String, ts: String, attr: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(ts, tieBreak)
    val flagged = events.withColumn("chg",
      when(lag(col(attr), 1).over(w) === col(attr), 0).otherwise(1))
    val versioned = flagged.withColumn("version",
      sum("chg").over(w)) // running change count = run id, 1-based
    val runs = versioned.groupBy(col(entity), col("version"), col(attr))
      .agg(min(col(ts)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wv = Window.partitionBy(entity).orderBy("version")
    runs.withColumn("valid_to", lead("valid_from", 1).over(wv))
      .select(col(entity), col("version"), col(attr),
        col("valid_from"), col("valid_to"), col("n_events"))
  }
}
