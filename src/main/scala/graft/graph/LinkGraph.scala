package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item co-visitation graph + fixed-iteration PageRank in EXACT integer
  * micro-unit arithmetic.
  *
  * The web-graph quality-propagation family every large pretraining
  * pipeline runs somewhere (host-level spam rank, co-citation quality,
  * boilerplate-hub detection): project a bipartite (user, item)
  * interaction log onto an item↔item co-visitation graph, then power-
  * iterate PageRank over it. The reference engine's scope stops at
  * log-table aggregation (events-style tables,
  * /root/reference/database/database.go's generic SELECT path); the graph
  * closure over such a log is the capability gap this module fills.
  *
  * Scale design (the 100 TB story):
  *  - **Bipartite projection is the quadratic trap.** Co-visitation pairs
  *    are per-user |items|² — one bot user with 10⁶ items is a 10¹²-row
  *    explosion. The projection therefore runs over an ACTIVITY-CAPPED
  *    incidence list: `row_number() over (partition by user order by
  *    item) <= cap` keeps each user's pair fan-out ≤ cap² (a per-entity
  *    window, bounded by the cap itself — the CatalogPlanSpec whitelist
  *    class). The cap is the industry-standard co-occurrence guard, and
  *    it is NOT silent: [[covisitEdges]] also returns the dropped-row
  *    count per the no-silent-caps rule (q111 discipline) via
  *    [[covisitCapStats]].
  *  - **Edges shuffle on their keys, never broadcast.** Both sides of
  *    the projection self-join are the corpus-scale incidence relation —
  *    [[graft.plans.DemoteCorpusBroadcast]] strips broadcast eligibility
  *    structurally, so the join is a sort-merge on user_id whatever the
  *    size estimates claim.
  *  - **Rank iteration is K joins, K aggregations — nothing driver-side.**
  *    Each iteration shuffles the edge relation once (join on src) and
  *    the rank relation once (groupBy dst); K is a fixed small constant.
  *    The edge relation is materialised ONCE (localCheckpoint DISK_ONLY —
  *    its row count scales with the corpus, the q128 lesson) and reused
  *    by all K plan consumers.
  *  - **Exact integer arithmetic end-to-end.** Ranks live in micro-units
  *    of 1e-12 (SCALE = 10¹²), edge shares in units of 1e-6
  *    (SHARE_SCALE = 10⁶): contrib = Σ (r·share) div 10⁶ keeps every
  *    intermediate ≤ 10¹⁸ < Long.Max, and long sums are order-independent
  *    — the emission hash-matches a DuckDB oracle running the identical
  *    formula, with no FP summation-order hazard. (Raw r·w would overflow
  *    at web scale: w ≤ |users| can reach 10⁹, and 10¹²·10⁹ ≫ 2⁶³.)
  */
object LinkGraph {

  /** Rank fixed-point: ranks are integers in units of SCALE⁻¹. */
  val Scale: Long = 1000000000000L // 1e12

  /** Edge-share fixed-point: share(i→j) = (w_ij · ShareScale) div s_i. */
  val ShareScale: Long = 1000000L // 1e6

  /** Distinct (user_id, item) incidence from an interaction log, capped at
    * `cap` items per user (deterministic: the `cap` smallest item ids). */
  def cappedIncidence(interactions: DataFrame, cap: Int): DataFrame = {
    val rn = row_number().over(
      Window.partitionBy("user_id").orderBy("item"))
    interactions.select("user_id", "item").distinct()
      .withColumn("rn", rn).filter(col("rn") <= cap).drop("rn")
  }

  /** Symmetric weighted co-visitation edges: w(src,dst) = number of users
    * whose capped incidence lists contain both items; edges below `minW`
    * are pruned (the noise floor that keeps the graph sparse at scale).
    * Both (i,j) and (j,i) are emitted — the walk below is over the
    * symmetric graph, so every node with an edge has out-degree > 0 and
    * there is no dangling-mass term to redistribute. */
  def covisitEdges(interactions: DataFrame, cap: Int = 64,
      minW: Int = 2): DataFrame = {
    val inc = cappedIncidence(interactions, cap)
    inc.as("a").join(inc.as("b"), Seq("user_id"))
      .filter(col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("src"), col("b.item").as("dst"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minW)
  }

  /** No-silent-caps counters for [[cappedIncidence]]: one row —
    * n_users_capped (users whose incidence list was truncated) and
    * n_rows_dropped (incidence rows the cap removed). */
  def covisitCapStats(interactions: DataFrame, cap: Int): DataFrame =
    interactions.select("user_id", "item").distinct()
      .groupBy("user_id").agg(count(lit(1)).as("n_items"))
      .agg(
        sum(when(col("n_items") > cap, 1L).otherwise(0L))
          .as("n_users_capped"),
        coalesce(sum(when(col("n_items") > cap, col("n_items") - cap)
          .otherwise(0L)), lit(0L)).as("n_rows_dropped"))

  /** Fixed-iteration PageRank over weighted directed `edges(src, dst, w)`
    * in exact micro-unit integer arithmetic (see object scaladoc):
    *
    *   share_ij = (w_ij · 10⁶) div s_i          (s_i = Σ_j w_ij)
    *   r⁰_i     = SCALE div N
    *   rᵏ_j     = (15·SCALE) div (100·N)
    *              + (85 · Σ_i (rᵏ⁻¹_i · share_ij) div 10⁶) div 100
    *
    * i.e. damping 0.85 as the exact rational 85/100, every division a
    * floor (all operands non-negative, so Spark's `div` and DuckDB's `//`
    * agree). Emits (item, n_out, strength, rank_micro) per graph node.
    *
    * `checkpointShares = false` keeps the plan lazy for plan-shape tests;
    * production (and the catalog query) materialises the share relation
    * once — DISK_ONLY, because its row count scales with the corpus. */
  def pagerankMicro(edges: DataFrame, iters: Int = 4,
      checkpointShares: Boolean = true): DataFrame = {
    // Materialise the loop-invariant relations ONCE (the
    // hoist-the-loop-rescan rule): the edge relation feeds strength,
    // shares, AND would otherwise re-run the upstream co-visitation
    // self-join for every iteration's consumer. Edge/share rows scale
    // with the corpus → DISK_ONLY; strength is node-sized → default
    // level (the q128 distinction).
    val e =
      if (checkpointShares) edges.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else edges
    val strengthPlan = e.groupBy("src")
      .agg(sum("w").as("s"), count(lit(1)).as("n_out"))
    val strength =
      if (checkpointShares) strengthPlan.localCheckpoint(true)
      else strengthPlan
    val sharesPlan = e.join(strength, "src")
      .select(col("src"), col("dst"),
        expr(s"(w * ${ShareScale}L) div s").as("share"))
    val shares =
      if (checkpointShares)
        sharesPlan.localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else sharesPlan
    // node list + 1-row count, broadcast onto every node row (bounded
    // 1-row build side — the data-card crossJoin pattern)
    val nodes = strength.select(col("src").as("item"),
      col("n_out"), col("s").as("strength"))
    val nRel = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.select("item").crossJoin(broadcast(nRel))
      .select(col("item"), expr(s"${Scale}L div n").as("r"))
    for (_ <- 1 to iters) {
      val contrib = shares
        .join(ranks.withColumnRenamed("item", "src"), "src")
        .select(col("dst"),
          expr(s"(r * share) div ${ShareScale}L").as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      ranks = nodes.select("item").crossJoin(broadcast(nRel))
        .join(contrib.withColumnRenamed("dst", "item"), Seq("item"), "left")
        .select(col("item"),
          (expr(s"(15L * ${Scale}L) div (100L * n)") +
            expr("(85L * coalesce(contrib, 0L)) div 100L")).as("r"))
    }
    nodes.join(ranks, "item")
      .select(col("item"), col("n_out"), col("strength"),
        col("r").as("rank_micro"))
  }

  /** Synchronous label propagation over weighted directed `edges(src,
    * dst, w)` — the communities counterpart to [[pagerankMicro]] (item
    * clusters over the same co-visitation graph). `iters` fixed rounds;
    * each node adopts the label with the greatest total incident weight
    * among its in-neighbors' current labels, ties to the SMALLEST label.
    *
    * Determinism is the design constraint (the gate hash-compares): the
    * argmax is expressed as max-weight + min-label-at-max — two plain
    * aggregates and an equi-join, no struct-ordering or arg_max whose
    * tie behavior an engine could choose differently. Labels and weights
    * are integers throughout. Nodes keep their own label when no
    * neighbor row exists (cannot happen on a symmetric co-vis graph, but
    * the left join keeps the operator total).
    *
    * Scale: per iteration one edges⋈labels shuffle + two bounded
    * aggregates over (dst, label) rows — ≤ |edges| rows, demoted from
    * broadcast by [[graft.plans.DemoteCorpusBroadcast]] like every
    * corpus join here. K is a small constant. */
  def labelPropagation(edges: DataFrame, iters: Int = 3,
      checkpoint: Boolean = true): DataFrame = {
    // every iteration re-consumes the edge relation — materialise it once
    // (DISK_ONLY: edge rows scale with the corpus) or the upstream
    // projection re-runs per iteration
    val e =
      if (checkpoint) edges.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else edges
    val nodes = e.select(col("src").as("item")).distinct()
    var labels = nodes.withColumn("label", col("item"))
    for (_ <- 1 to iters) {
      val mass = e
        .join(labels.withColumnRenamed("item", "src"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(sum("w").as("lw"))
      val best = mass.groupBy("dst").agg(max("lw").as("mw"))
      val next = mass.join(best, "dst")
        .filter(col("lw") === col("mw"))
        .groupBy("dst").agg(min("label").as("label"))
        .withColumnRenamed("dst", "item")
      labels = nodes.join(next, Seq("item"), "left")
        .select(col("item"),
          coalesce(col("label"), col("item")).as("label"))
    }
    labels
  }

  /** Exact triangle census of the UNDIRECTED graph underlying symmetric
    * `edges(src, dst, w)` — the standard ordered-orientation scheme:
    * orient each undirected edge from its lower-(degree, id) endpoint to
    * the higher, making a DAG whose wedge count is Σ C(outdeg⁺, 2) —
    * the arboricity-bounded minimum — then close wedges with one
    * equi-join against the oriented edge set. Emits one row:
    * n_nodes, n_edges (undirected), n_wedges, n_triangles, and the
    * global clustering coefficient in micro-units (exact integer:
    * 3·triangles·10⁶ div wedges). */
  def triangleStats(edges: DataFrame,
      checkpoint: Boolean = true): DataFrame = {
    val und = edges.filter(col("src") < col("dst")).select("src", "dst")
    val deg = und.select(col("src").as("v"))
      .unionByName(und.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient low (d, v) -> high (d, v)
    val dirPlan = und
      .join(deg.select(col("v").as("src"), col("d").as("da")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("db")), "dst")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("src") < col("dst")),
          struct(col("src").as("u"), col("dst").as("x")))
          .otherwise(struct(col("dst").as("u"), col("src").as("x")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.x").as("x"))
    // three plan consumers (both wedge legs + the closing edge set) —
    // materialise once (DISK_ONLY: edge-sized, corpus-scaled)
    val dirE =
      if (checkpoint) dirPlan.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else dirPlan
    val wedges = dirE.as("a")
      .join(dirE.as("b"), col("a.u") === col("b.u") && col("a.x") < col("b.x"))
      .select(col("a.x").as("p"), col("b.x").as("q"))
    val closed = wedges.join(
      dirE.select(
        least(col("u"), col("x")).as("lo"),
        greatest(col("u"), col("x")).as("hi"))
        .withColumnRenamed("lo", "p").withColumnRenamed("hi", "q")
        .select(col("p"), col("q")),
      Seq("p", "q"), "left_semi")
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    val nWedges = wedges.agg(count(lit(1)).as("n_wedges"))
    val nTris = closed.agg(count(lit(1)).as("n_triangles"))
    nNodes.crossJoin(nEdges).crossJoin(nWedges).crossJoin(nTris)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("CASE WHEN n_wedges = 0 THEN 0L " +
          "ELSE (3L * n_triangles * 1000000L) div n_wedges END")
          .as("clustering_u"))
  }
}
