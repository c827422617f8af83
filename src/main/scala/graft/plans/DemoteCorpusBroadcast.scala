package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan, NO_BROADCAST_HASH}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Registry of CORPUS-SCALE relations — the paths whose row count tracks
  * the corpus, not a dimension: the big fixture tables
  * ([[graft.core.Tables.load]] registers them) and every persisted store's
  * data tree (seen/near-dup signatures, IVF assigned, PQ codes, BM25
  * postings — registered by their readers). [[DemoteCorpusBroadcast]]
  * consults this set to strip broadcast eligibility from corpus↔corpus
  * joins.
  *
  * Why a PATH registry and not statistics: the hazard this closes is
  * precisely that compile-time statistics LIE about corpus relations — a
  * pruned 1-column scan of 10⁹ docs estimates under the 10 MB broadcast
  * threshold (column pruning scales the size estimate by selected/total
  * width), the static planner builds a corpus-wide broadcast hash table,
  * and the driver dies. The x30 scale trend hit exactly that in the
  * duplicate-span join-backs (round 6). Cardinality is a property of the
  * SOURCE, known at registration time; no estimate is consulted.
  *
  * The set is process-global (like the Tables relation cache): corpus-ness
  * of a path does not vary per session, and the optimizer rule must see
  * registrations made by whichever entry point loaded the table.
  */
object CorpusScale {

  private val paths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def normalize(p: String): String = {
    // strip the filesystem scheme so "file:/x/y" and "/x/y" compare equal
    val u = new org.apache.hadoop.fs.Path(p).toUri.getPath
    if (u.length > 1 && u.endsWith("/")) u.dropRight(1) else u
  }

  /** Mark a path (a table file/dir or a store's data tree) corpus-scale. */
  def register(path: String): Unit = paths.add(normalize(path))

  /** True when `leafPath` is a registered path or lives under one (store
    * scans read partition subtrees of the registered root). */
  private[plans] def matches(leafPath: String): Boolean = {
    val n = normalize(leafPath)
    val it = paths.iterator()
    while (it.hasNext) {
      val r = it.next()
      if (n == r || n.startsWith(r + "/")) return true
    }
    false
  }

  def isEmpty: Boolean = paths.isEmpty

  /** Test aid: forget all registrations. */
  private[graft] def clear(): Unit = paths.clear()
}

/** Optimizer rule: corpus↔corpus equi-joins must never broadcast-hash —
  * by CONSTRUCTION, not by per-site hint convention.
  *
  * The round-6 x30 trend caught the failure class this rule closes
  * structurally: a corpus-cardinality relation whose compile-time size
  * estimate comes in under `autoBroadcastJoinThreshold` (pruned 1-column
  * scans are the canonical case) gets planned as the BUILD side of a
  * BroadcastHashJoin, and the driver/executors materialise a hash table
  * of the corpus. Round 6 held it off with `hint("merge")` at five call
  * sites — a convention the next corpus↔corpus join silently misses.
  * This rule finds every equi-join whose BOTH sides contain a
  * [[CorpusScale]]-registered scan and fills the empty strategy-hint
  * slots with [[NO_BROADCAST_HASH]] (the hint AQE's own
  * DynamicJoinSelection uses to demote), so:
  *
  *  - the static planner never builds a corpus-wide broadcast, whatever
  *    the estimates say;
  *  - AQE's runtime SMJ→BHJ conversion is blocked too (the hint rides the
  *    logical join through re-planning);
  *  - an EXPLICIT strategy hint still wins: `broadcast(df)` on a bounded
  *    corpus-derived aggregate (the duplicateClusters repLabel pattern)
  *    keeps its BROADCAST hint — only empty slots are filled.
  *
  * Scope guards:
  *  - equi-joins only: a no-condition 1-row×1-row crossJoin (the data-card
  *    stats pattern) or a range join must keep its broadcast-nested-loop
  *    plan — forcing those to CartesianProduct would be strictly worse
  *    (range joins have their own rewrite, [[RangeJoinRewrite]]);
  *  - BOTH sides must be corpus-derived: corpus ⋈ dimension still
  *    broadcasts the dimension.
  *
  * Installed by [[graft.core.GraftSession.tune]] (every engine entry
  * point: Verify, Bench, CLIs, tests) and by [[GraftExtensions]] for
  * `withExtensions` users. Catalog-wide enforcement is plan-tested by
  * CatalogPlanSpec's sweep.
  */
object DemoteCorpusBroadcast extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (CorpusScale.isEmpty) return plan
    plan.transformUp {
      case j @ Join(left, right, _, Some(cond), hint)
          if hasEquiConjunct(cond, left, right) &&
            containsCorpus(left) && containsCorpus(right) =>
        val demoted = JoinHint(demote(hint.leftHint), demote(hint.rightHint))
        if (demoted == hint) j else j.copy(hint = demoted)
    }
  }

  /** Fill an EMPTY strategy slot with NO_BROADCAST_HASH; never override an
    * explicit strategy (broadcast() is a caller-asserted bound). */
  private def demote(h: Option[HintInfo]): Option[HintInfo] = h match {
    case None => Some(HintInfo(strategy = Some(NO_BROADCAST_HASH)))
    case Some(hi) if hi.strategy.isEmpty =>
      Some(hi.copy(strategy = Some(NO_BROADCAST_HASH)))
    case keep => keep
  }

  private def hasEquiConjunct(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    def fromOnly(e: Expression, side: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (fromOnly(a, left) && fromOnly(b, right)) ||
          (fromOnly(a, right) && fromOnly(b, left))
      case EqualNullSafe(a, b) =>
        (fromOnly(a, left) && fromOnly(b, right)) ||
          (fromOnly(a, right) && fromOnly(b, left))
      case _ => false
    }
  }

  /** A side is corpus-derived when any of its leaf scans reads a
    * registered path. Derivations that RE-MATERIALISE (localCheckpoint →
    * LogicalRDD) fall outside — by design: a checkpointed relation carries
    * honest runtime statistics (or the conservative default), so the
    * estimate-lies-about-the-source hazard is gone. */
  private def containsCorpus(plan: LogicalPlan): Boolean =
    plan.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(p => CorpusScale.matches(p.toString))
        case _ => false
      }
      case _ => false
    }
}
