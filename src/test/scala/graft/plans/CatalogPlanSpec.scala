package graft.plans

import graft.SparkSpec

/** Catalog-WIDE physical-plan lint (round-7 task #1, second half): every
  * SparkEntry query's plan at sf0.001 is swept for the three 100 TB
  * scale-killers —
  *
  *  - `CartesianProduct`: never legitimate in this engine;
  *  - `BroadcastNestedLoopJoin`: legitimate ONLY with a bounded build
  *    side (1-row stats relations, the broadcast centroid array, a
  *    ≤8-row query set) or in a gate-only all-pairs ORACLE EMISSION —
  *    whitelisted per query with the bound stated;
  *  - `Window`: legitimate ONLY for per-entity windows whose partition is
  *    bounded by the entity (per-customer order history, per-user
  *    session, per-(source, shard) pack prefix) — whitelisted per query.
  *
  * Per-query PlanSpec tests assert what a plan MUST contain; this sweep
  * asserts what NO plan may contain, so the next query added to the
  * catalog is linted by default instead of by authorial discipline.
  *
  * Queries whose emission is localCheckpoint-materialised (streams, index
  * round trips) expose only the checkpoint scan here; their inner plans
  * are guarded by their own specs (PlanSpec, RetrievalSpec, …).
  */
class CatalogPlanSpec extends SparkSpec {

  /** BNLJ whitelist — every entry's build side is bounded by construction:
    *  - knn queries (q34/q35/q36/q54/q66/q74/q83/q101/q102/q104/q105):
    *    the broadcast side is the ≤8-row query set (non-equi
    *    `neighbor_id =!= query_id` join), the 1-row centroid array
    *    (assignProbes), or the Q-row ADC LUT;
    *  - q63: 1-row pooled-centroid relation;
    *  - q66: additionally the all-pairs EXACT check is the gate's oracle
    *    emission (`b.vec_id < a.vec_id` inequality join) — gate-only,
    *    documented in the query;
    *  - q27/q75/q84: 1-row sketch/stats branches crossJoined for free;
    *  - q77: scalar subquery → 1-row broadcast;
    *  - q81: the hour spine is bounded by the time RANGE (one row per
    *    hour), never by the event count;
    *  - q91/q109: 1-row corpus-stats cross joins;
    *  - q119: 1-row model-totals cross join (the DSIR bucket models
    *    themselves are 256-row broadcast HASH joins, not BNLJ).
    */
  private val bnljOk: Set[String] = Set(
    "q27_approx_sketches", "q34_knn_bruteforce", "q35_knn_lsh",
    "q36_embedding_neardup", "q54_knn_ivf", "q63_embed_pool",
    "q66_semantic_dedup", "q74_quantized_knn", "q75_hll_union",
    "q77_scalar_subquery", "q81_gap_fill", "q83_ivf_index", "q84_drift_report",
    "q91_bm25", "q101_ivf_append", "q102_pq_knn",
    "q104_ivfpq_knn", "q105_pq_index", "q109_dedup_report",
    "q113_ivf_rebalance", "q119_dsir_weights",
    // ≤8-row broadcast query side (the q34 bound) on both the exact
    // filtered scan and the per-label index probes
    "q129_filtered_knn",
    // the dense leg IS q34's bounded-broadcast kNN (3-row query side);
    // the sparse leg and the fusion are equi-join/aggregate only
    "q151_hybrid_rrf",
    // same class at batch scale: the dense leg broadcasts the FIXED
    // 500-row vector query set (~128 KB — bounded by the literal filter,
    // never by the corpus); the 1000-query sparse leg is the batched
    // equi-join path (checkpointed) and the fusion is aggregate-only
    "q155_hybrid_batch",
    // 1-row total-mass cross join over the per-source aggregate
    "q122_token_budget",
    // two 1-row cross joins (source count; capped-prefix stats) over the
    // |sources|-row aggregate
    "q123_unimax_alloc",
    // 1-row node-count relation broadcast onto every rank row, once per
    // power iteration (the data-card crossJoin pattern)
    "q130_covisit_pagerank",
    // 1-row total-token-count cross join over the bounded candidate
    // counts (the threshold comparison)
    "q134_heavy_hitters",
    // four 1-row census aggregates cross-joined (the data-card pattern)
    "q137_triangle_census")

  /** Window whitelist — per-entity partitions, bounded by the entity:
    * q18/q47 per-customer order history, q29 per-user as-of matching
    * ([[graft.operators.AsOfJoin]] windows on the join keys), q46
    * per-user event history, q58 per-(source, shard-prefix) running sum
    * (two-level offsets; the per-shard base window runs over the
    * ~|corpus|/shardSize aggregate rows, not the corpus). */
  private val windowOk: Set[String] = Set(
    "q18_window", "q29_asof_join", "q46_sessionize", "q47_window_frames",
    "q58_seq_packing",
    // rank/prefix window over the |sources|-row aggregate (the UniMax
    // water-filling order) — bounded by the source vocabulary, never the
    // corpus
    "q123_unimax_alloc",
    // cumulative window over (source, token-count) COUNT rows — bounded
    // by the value domain (distinct token counts ≤ max doc length),
    // never the corpus
    "q127_length_quantiles",
    // per-user activity-cap row_number — bounded by the cap itself (the
    // co-visitation projection guard; LinkGraph scaladoc)
    "q130_covisit_pagerank",
    // per-user lag/run-sum/lead — the q46 per-entity history contract
    "q135_scd2_history",
    // the same per-user activity-cap row_number as q130 (shared
    // co-visitation projection)
    "q136_label_propagation", "q137_triangle_census",
    // per-user event-time lag — the q46 per-entity class
    "q140_ingestion_gaps")

  test("catalog sweep: no CartesianProduct / unwhitelisted BNLJ / unwhitelisted Window") {
    val windowOp = "Window(GroupLimit)? \\[".r
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p =
        try fn(spark, sf001).queryExecution.executedPlan.toString
        catch {
          case e: Throwable =>
            failures += s"$name: planning failed: ${e.getMessage}"
            ""
        }
      if (p.contains("CartesianProduct"))
        failures += s"$name: CartesianProduct"
      if (p.contains("BroadcastNestedLoopJoin") && !bnljOk(name))
        failures += s"$name: unwhitelisted BroadcastNestedLoopJoin"
      if (windowOp.findFirstIn(p).isDefined && !windowOk(name))
        failures += s"$name: unwhitelisted Window"
    }
    assert(failures.isEmpty, "scale-killer operators in catalog plans:\n" +
      failures.mkString("\n"))
  }
}
