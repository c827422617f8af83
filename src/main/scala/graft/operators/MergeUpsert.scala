package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level MERGE: apply a change relation (op ∈ {U, D, I} + full
  * payload) onto a base relation by key, in ONE full-outer join — the
  * dimension-maintenance primitive beside the engine's partition-replace
  * path (`graft.recon.Reconciler` moves whole partitions; this moves
  * rows).
  *
  * Semantics (deterministic, one change row per key — enforced):
  *  - base ⋉ no change   → pass through
  *  - U (update)          → change payload replaces base payload
  *  - D (delete)          → row dropped
  *  - I (insert)          → change row appended (key absent from base)
  *  - U/D on a missing key, I on a present key → rejected up front
  *    (`requireConsistent`), because silently reinterpreting them is how
  *    upsert pipelines corrupt dimensions
  *
  * Scale shape: one shuffle per side on the merge key. The change set is
  * delta-sized by definition, so Spark MAY broadcast it (the base side —
  * corpus-scale — is protected by DemoteCorpusBroadcast only when both
  * sides are corpus-tagged; a base⋈delta join broadcasting the DELTA is
  * exactly right).
  */
object MergeUpsert {

  /** @param base    current relation: `key` + payload columns
    * @param changes `key`, `op` ('U'/'D'/'I'), and the SAME payload
    *                columns (ignored for D)
    * @return merged relation with base's column order */
  def apply(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    requireConsistent(base, changes, key)
    val joined = base.as("b").join(changes.as("c"),
      col(s"b.$key") === col(s"c.$key"), "full_outer")
    val merged = joined
      // D rows (and only D rows) drop; unmatched base passes; U takes the
      // change payload; I exists only on the change side
      .filter(col("c.op").isNull || col("c.op") =!= "D")
      .select(
        coalesce(col(s"b.$key"), col(s"c.$key")).as(key) +:
          payload.map(p =>
            when(col("c.op") === "U" || col("c.op") === "I", col(s"c.$p"))
              .otherwise(col(s"b.$p")).as(p)): _*)
    merged
  }

  /** Reject malformed change sets: duplicate keys, U/D on absent keys,
    * I on present keys. One aggregate + one join — delta-sized work. */
  private def requireConsistent(base: DataFrame, changes: DataFrame,
      key: String): Unit = {
    val dup = changes.groupBy(key).count().filter(col("count") > 1).limit(1)
    require(dup.isEmpty, s"MERGE changes carry duplicate keys on '$key'")
    // left join on the key: base keys are unique by dimension contract,
    // so a match duplicates nothing
    val bad = changes
      .join(base.select(col(key), lit(1).as("present")), Seq(key), "left")
      .filter(
        (col("op").isin("U", "D") && col("present").isNull) ||
          (col("op") === "I" && col("present").isNotNull))
      .limit(1)
    require(bad.isEmpty, "MERGE changes reference keys inconsistently " +
      "(U/D on absent key, or I on present key)")
  }
}
