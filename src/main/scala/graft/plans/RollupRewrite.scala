package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, ExprId, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, when}
import org.apache.spark.sql.types.DoubleType

/** Registry of [[graft.agg.AggStore]] rollup stores as MATERIALIZED VIEWS
  * over their raw tables — the half of the ClickHouse AggregatingMergeTree
  * pattern the store alone does not give: in ClickHouse, a query over the
  * MV's target table reads merged states automatically; with only
  * `AggStore.merged` the caller must NAME the store. [[RollupRewrite]]
  * closes that gap: a registered store makes the engine answer the RAW
  * TABLE's aggregate from states, with no query change.
  *
  * A registration records the store's DEFINING QUERY — raw path, filter,
  * key expressions, measure expressions — with every expression resolved
  * down to the base relation's attributes and normalised by column NAME
  * (attribute ids vary per scan instance; names are the stable identity of
  * a path-scanned column). The rewrite matches by the same normalisation,
  * so any scan of the same file path with the same expressions subsumes.
  *
  * Scoped and reversible: `register` is explicit, `unregister` removes it,
  * and every mismatch — unknown aggregate shape, measure not in the store,
  * filter the store did not bake in, store files gone or drifted — falls
  * back to the raw plan untouched (spec'd in RollupRewriteSpec).
  */
object MaterializedRollups {

  /** One registered store: defining exprs are NORMALISED (see
    * [[RollupRewrite.normalize]]) and resolved to base-relation columns.
    * @param microSums  per measure: the normalised micro-unit sum input
    *                   (`cast(floor(m · 1e6) as bigint)`) — what a raw
    *                   query's `sum(...)` child must equal
    * @param plains     per measure: the normalised plain (double) measure —
    *                   what a raw `min(...)`/`max(...)` child must equal */
  private[plans] case class Reg(rawPath: String, storePath: String,
      keys: Seq[(String, Expression)],
      microSums: Seq[(String, Expression)],
      plains: Seq[(String, Expression)],
      filters: Seq[Expression])

  private val regs = new ConcurrentHashMap[String, Reg]()

  private def normPath(p: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri.getPath
    if (u.length > 1 && u.endsWith("/")) u.dropRight(1) else u
  }

  /** Register `storePath` (built via `AggStore.appendMeasures` with these
    * `keys`/`measures` over `raw`, optionally pre-filtered by `filter`) as
    * the materialized view of `raw`'s single file-scan path. The defining
    * expressions run through the session's own analyzer+optimizer so the
    * recorded normal forms match what an optimized user plan carries. */
  def register(raw: DataFrame, storePath: String,
      keys: Seq[(String, Column)], measures: Seq[(String, Column)],
      filter: Option[Column] = None): Unit = {
    import org.apache.spark.sql.GraftColumnBridge.column
    require(keys.nonEmpty && measures.nonEmpty,
      "a rollup registration needs at least one key and one measure")
    // one projection carrying every defining expression, optimized as one
    // plan: keys, plain (double-cast) measures, and micro-unit sum inputs —
    // the exact forms AggStore.partialStates folds
    val cols: Seq[Column] =
      keys.map { case (n, c) => c.as(s"__k_$n") } ++
        measures.flatMap { case (n, c) =>
          Seq(c.cast(DoubleType).as(s"__p_$n"),
            graft.agg.AggStore.micros(c.cast(DoubleType)).as(s"__u_$n"))
        }
    val base = filter.map(raw.filter).getOrElse(raw)
    val plan = base.select(cols: _*).queryExecution.optimizedPlan
    RollupRewrite.collectBase(plan) match {
      case Some((rel, subst, fs)) =>
        val path = RollupRewrite.singleScanPath(rel).getOrElse(
          throw new IllegalArgumentException(
            "rollup registration needs a single file-scan root path"))
        // the optimized projection's output order follows `cols`
        val byName = plan.output.map(_.name).zip(
          plan.output.map(a => RollupRewrite.normalize(
            RollupRewrite.applySubst(a, subst)))).toMap
        regs.put(normPath(path), Reg(normPath(path), storePath,
          keys.map { case (n, _) => n -> byName(s"__k_$n") },
          measures.map { case (n, _) => n -> byName(s"__u_$n") },
          measures.map { case (n, _) => n -> byName(s"__p_$n") },
          fs.map(RollupRewrite.normalize)))
      case None => throw new IllegalArgumentException(
        "rollup registration must be a Project/Filter chain over one file scan")
    }
  }

  def unregister(raw: DataFrame): Unit =
    RollupRewrite.collectBase(raw.queryExecution.optimizedPlan)
      .flatMap { case (rel, _, _) => RollupRewrite.singleScanPath(rel) }
      .foreach(p => regs.remove(normPath(p)))

  /** Drop every registration backed by `storePath` — called by the store
    * MAINTENANCE ops that change what the states MEAN (retire/expire
    * coarsen or delete history; migrate re-shapes measures): after such
    * an op the store no longer answers the ORIGINAL defining query, and
    * a live registration would make the rewrite serve coarsened/reshaped
    * history for a full-grain raw query — silently wrong. The operator
    * re-registers explicitly if the post-maintenance store still answers
    * a (different) defining query. */
  def invalidateStore(storePath: String): Unit = {
    val n = normPath(storePath)
    regs.entrySet().removeIf(e => normPath(e.getValue.storePath) == n)
  }

  /** Test/emergency escape hatch: forget every registration. */
  def clear(): Unit = regs.clear()

  /** All file-scan root paths under a DataFrame's OPTIMIZED plan — the
    * q171-class plan assert ("the raw fixture is not scanned") reads this. */
  def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }

  private[plans] def isEmpty: Boolean = regs.isEmpty

  private[plans] def lookup(path: String): Option[Reg] =
    Option(regs.get(normPath(path)))
}

/** Optimizer rule: an `Aggregate` over a registered raw table whose keys,
  * measures, and filters are SUBSUMED by a registered rollup store is
  * answered from the store's merged states — the raw scan disappears from
  * the plan (the ClickHouse MV-read behaviour; at 100 TB this turns a
  * corpus-wide scan+shuffle into a dimension-sized states merge).
  *
  * Matching is conservative — any of these falls back to the raw plan:
  *  - a node other than Project/Filter between the Aggregate and the scan;
  *  - a grouping expression that is neither one of the store's key exprs
  *    (a strict SUBSET of keys rewrites through `mergedAt` — the
  *    cascaded-MV read; states re-merge losslessly) nor a DERIVED
  *    expression over keys (`month(event_day)` on a daily store rewrites
  *    through `mergedBy` — the read-time re-grain);
  *  - an aggregate other than `count(1)` / `sum(micro-units(m))` /
  *    `min(m)` / `max(m)` over registered measure expressions — these are
  *    the forms the states reproduce BIT-EXACTLY (integer micro-sums;
  *    null parity via the measure's min state: raw `sum` is NULL iff the
  *    group saw only nulls iff merged `min` is NULL);
  *  - a query filter the registration did not bake in, unless it
  *    references only grouping keys (then it applies post-merge);
  *  - store drift: required key/state columns missing from the store read
  *    (e.g. the store was rebuilt with different measures).
  */
object RollupRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MaterializedRollups.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch { case _: Throwable => agg } // any failure → raw plan
    }
  }

  /** The one file-scan root path of a LogicalRelation, if it has exactly one. */
  private[plans] def singleScanPath(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
        Some(fs.location.rootPaths.head.toString)
      case _ => None
    }

  /** Walk a Project/Filter chain down to a LogicalRelation, building the
    * substitution that rewrites chain-level attributes into base-relation
    * expressions, and collecting filter conjuncts (already substituted). */
  private[plans] def collectBase(p: LogicalPlan)
      : Option[(LogicalRelation, Map[ExprId, Expression], Seq[Expression])] = p match {
    case rel: LogicalRelation =>
      Some((rel, rel.output.map(a => a.exprId -> (a: Expression)).toMap, Nil))
    case Project(list, child) =>
      collectBase(child).map { case (rel, sub, fs) =>
        val next: Map[ExprId, Expression] = list.map {
          case a @ Alias(e, _) => a.exprId -> applySubst(e, sub)
          case a: AttributeReference => a.exprId -> applySubst(a, sub)
          case other => other.exprId -> applySubst(other, sub)
        }.toMap
        (rel, next, fs)
      }
    case Filter(cond, child) =>
      collectBase(child).map { case (rel, sub, fs) =>
        (rel, sub, fs ++ splitConjunctivePredicates(applySubst(cond, sub)))
      }
    case _ => None
  }

  private[plans] def applySubst(e: Expression, sub: Map[ExprId, Expression]): Expression =
    e.transform { case a: AttributeReference if sub.contains(a.exprId) => sub(a.exprId) }

  /** Name-stable normal form: attribute ids vary per scan instance, so map
    * each base attribute onto an id derived from its lower-cased NAME (the
    * canonicalizer erases names but keeps ids — encoding the name INTO the
    * id is what makes two scans of the same file comparable), then
    * canonicalize for literal/commutativity/cast noise. */
  private[plans] def normalize(e: Expression): Expression =
    e.transform {
      case a: AttributeReference =>
        val n = a.name.toLowerCase(java.util.Locale.ROOT)
        AttributeReference(n, a.dataType)(
          exprId = ExprId(n.hashCode.toLong & 0x7fffffffL))
    }.canonicalized

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (rel, subst, qFilters) = collectBase(agg.child) match {
      case Some(t) => t
      case None => return None
    }
    val reg = singleScanPath(rel).flatMap(MaterializedRollups.lookup) match {
      case Some(r) => r
      case None => return None
    }
    def resolveNorm(e: Expression): Expression = normalize(applySubst(e, subst))

    // 1. groupings ↦ store keys: a grouping is either a key itself
    //    (subset ⇒ mergedAt) or a DERIVED expression over keys — e.g.
    //    `month(event_day)` over a daily store — which regroups the
    //    states losslessly through mergedBy (the read-time re-grain;
    //    every state merge is associative+commutative, so any function
    //    of the keys is a valid coarser grouping)
    final case class GSpec(name: String, norm: Expression, c: Column,
      derived: Boolean)
    val keyByNorm = reg.keys.map { case (n, x) => x -> n }.toMap
    val specs: Seq[GSpec] = agg.groupingExpressions.zipWithIndex.map {
      case (g, i) =>
        val norm = resolveNorm(g)
        keyByNorm.get(norm) match {
          case Some(k) => GSpec(k, norm, col(k), derived = false)
          case None =>
            val replaced = replaceKeySubtrees(norm, reg.keys)
            // residual base attribute: the grouping needs non-key data;
            // no key occurrence at all: nothing to regroup by — fall back
            if (replaced.exists(_.isInstanceOf[AttributeReference])) return None
            if (replaced == norm) return None
            GSpec(s"__g$i", norm,
              org.apache.spark.sql.GraftColumnBridge.column(replaced),
              derived = true)
        }
    }
    if (specs.map(_.norm).distinct.size != specs.size || specs.isEmpty) return None
    val hasDerived = specs.exists(_.derived)
    val plainKeys = specs.filterNot(_.derived).map(_.name)

    // 2. filters: registered ones are baked into the states; extras must
    //    reference grouping expressions only (then they apply post-merge)
    val regFilterSet = reg.filters.toSet
    val extras = qFilters.map(f => normalize(applySubst(f, subst)))
      .filterNot(regFilterSet.contains)
    val baked = qFilters.map(f => normalize(applySubst(f, subst))).toSet
    if (!reg.filters.forall(baked.contains)) return None // store is NARROWER than the query
    val groupNorms = specs.map(s => s.name -> s.norm)
    val extraCols: Seq[Column] = extras.map { f =>
      val replaced = replaceKeySubtrees(f, groupNorms)
      // any residual base attribute means the filter needs non-key data
      if (replaced.exists(_.isInstanceOf[AttributeReference])) return None
      org.apache.spark.sql.GraftColumnBridge.column(replaced)
    }

    // 3. outputs ↦ store columns (None = not rewritable)
    val microByNorm = reg.microSums.map { case (n, x) => x -> n }.toMap
    val plainByNorm = reg.plains.map { case (n, x) => x -> n }.toMap
    val picks: Seq[(String, Column)] = agg.aggregateExpressions.map { ne =>
      val (inner, outName) = ne match {
        case Alias(e, n) => (e, n)
        case a: AttributeReference => (a, a.name)
        case _ => return None
      }
      inner match {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Count(Seq(Literal(_, _))) => outName -> col("n")
            case s: Sum => microByNorm.get(resolveNorm(s.child)) match {
              // null parity: raw sum is NULL iff all inputs null iff the
              // measure's merged min state is NULL (min skips nulls)
              case Some(m) => outName ->
                when(col(s"${m}_min").isNotNull, col(s"${m}_sum_u"))
              case None => return None
            }
            case mn: Min => plainByNorm.get(resolveNorm(mn.child)) match {
              case Some(m) => outName -> col(s"${m}_min")
              case None => return None
            }
            case mx: Max => plainByNorm.get(resolveNorm(mx.child)) match {
              case Some(m) => outName -> col(s"${m}_max")
              case None => return None
            }
            case _ => return None
          }
        case e => specs.find(_.norm == resolveNorm(e)) match {
          case Some(s) => outName -> col(s.name)
          case None => return None
        }
      }
    }

    // 4. build the substitute from the store read; ANY failure (missing
    //    store, drifted schema) aborts the rewrite via the caller's catch
    val spark = SparkSession.active
    val storeDf =
      if (hasDerived)
        graft.agg.AggStore.mergedBy(spark, reg.storePath,
          specs.map(s => s.name -> s.c))
      else if (plainKeys.size == reg.keys.size)
        graft.agg.AggStore.merged(spark, reg.storePath)
      else graft.agg.AggStore.mergedAt(spark, reg.storePath, plainKeys)
    // drift guard: every referenced store column must exist
    val have = storeDf.columns.toSet
    val needed = picks.flatMap { case (_, c) =>
      org.apache.spark.sql.GraftColumnBridge.expression(c).collect {
        case u: UnresolvedAttribute => u.name
      }
    } ++ specs.map(_.name)
    if (!needed.forall(have.contains)) return None
    val substituted = extraCols.foldLeft(storeDf)((df, c) => df.filter(c))
      .select(picks.map { case (n, c) => c.as(n) }: _*)
    val newPlan = substituted.queryExecution.optimizedPlan
    if (newPlan.output.size != agg.output.size) return None
    // exact type parity or no rewrite (nullability may differ: states are
    // merge outputs)
    if (newPlan.output.zip(agg.output).exists { case (a, b) => a.dataType != b.dataType })
      return None
    val restoreIds: Seq[NamedExpression] = newPlan.output.zip(agg.output).map {
      case (na, orig) => Alias(na, orig.name)(exprId = orig.exprId)
    }
    Some(Project(restoreIds, newPlan))
  }

  /** Replace every subtree matching a grouping key's normal form with an
    * unresolved attribute of the key's store-column name (top-down, so the
    * largest match wins); used to re-express an extra filter over the
    * store read's output. */
  private def replaceKeySubtrees(e: Expression,
      keys: Seq[(String, Expression)]): Expression =
    keys.collectFirst { case (n, kx) if e.canonicalized == kx => n } match {
      case Some(n) => UnresolvedAttribute(n)
      case None => e.mapChildren(c => replaceKeySubtrees(c, keys))
    }
}
