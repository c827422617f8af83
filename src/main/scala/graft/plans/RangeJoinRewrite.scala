package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: plan point-in-interval joins as bucketed equi-joins.
  *
  * Spark plans `points JOIN intervals ON pt BETWEEN lo AND hi` as a
  * broadcast-nested-loop join — O(|points|·|intervals|) comparisons, the
  * classic 100 TB scale-killer. [[graft.operators.RangeJoin]] offers the
  * standard fix (quantise into width-W buckets, replicate each interval
  * into the buckets it spans, equi-join on bucket, refine exactly) as an
  * explicit operator; this rule applies THE SAME rewrite automatically to
  * any eligible logical join, so plain SQL `BETWEEN` joins get the
  * scale-safe plan without the query author knowing the trick.
  *
  * Eligibility (all must hold):
  *  - inner join whose condition has a `pt >= lo`-and-`pt <= hi` conjunct
  *    pair (strict `<`/`>` also accepted — bucketing a strict bound is
  *    still a superset; the original predicate refines exactly), where the
  *    SAME numeric point expression comes from one side and both bound
  *    expressions come from the other;
  *  - no equi-join conjunct between the sides (if one exists Spark already
  *    hash-partitions on it, and the rewrite's own output would re-match);
  *  - `spark.graft.rangeJoin.binSize` set > 0. The bin width is a
  *    per-workload choice (≥ the typical interval span, so the explode
  *    fan-out is ~2 buckets/interval) that statistics-free compile-time
  *    rewriting cannot infer — same contract as the explicit operator.
  *
  * The pair (point row, interval row) meets in exactly ONE bucket — the
  * point's own `floor(pt/W)` — so the rewrite never duplicates output
  * rows. Null points/bounds bucket to null (equi-join drops them) and the
  * original condition evaluates to null on them too: same no-match result.
  * Inverted intervals (lo > hi) produce a descending `sequence()` whose
  * buckets the refine predicate rejects — wasted replication, no wrong
  * rows (same as handing them to the explicit operator).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  private def binSize: Long =
    try conf.getConfString(BinSizeKey, "0").toLong catch { case _: NumberFormatException => 0L }

  /** floor(e / w) as LONG — exact for |e| < 2^53, the epoch-seconds range. */
  private def bucketOf(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  /** One comparison conjunct, normalised to (point, bound, isLower). */
  private case class Bound(pt: Expression, bound: Expression, lower: Boolean)

  private def asBound(e: Expression): Seq[Bound] = e match {
    case GreaterThanOrEqual(a, b) => Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
    case GreaterThan(a, b)        => Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
    case LessThanOrEqual(a, b)    => Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
    case LessThan(a, b)           => Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binSize
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        def fromOnly(e: Expression, side: LogicalPlan) =
          e.references.nonEmpty && e.references.subsetOf(side.outputSet)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (fromOnly(a, left) && fromOnly(b, right)) || (fromOnly(a, right) && fromOnly(b, left))
          case EqualNullSafe(a, b) =>
            (fromOnly(a, left) && fromOnly(b, right)) || (fromOnly(a, right) && fromOnly(b, left))
          case _ => false
        }
        if (hasEqui) j
        else {
          val bounds = conjuncts.flatMap(asBound)
          // a (pt, lo, hi) triple with pt wholly from one side, bounds from the other
          val hit = bounds.iterator
            .filter(b => b.lower && b.pt.dataType.isInstanceOf[NumericType])
            .flatMap { lo =>
              bounds.find(h => !h.lower && h.pt.semanticEquals(lo.pt)).flatMap { hi =>
                if (fromOnly(lo.pt, left) && fromOnly(lo.bound, right) && fromOnly(hi.bound, right))
                  Some((lo.pt, lo.bound, hi.bound, true))
                else if (fromOnly(lo.pt, right) && fromOnly(lo.bound, left) && fromOnly(hi.bound, left))
                  Some((lo.pt, lo.bound, hi.bound, false))
                else None
              }
            }.nextOption()
          hit match {
            case None => j
            case Some((pt, lo, hi, pointsOnLeft)) =>
              val ptSide = if (pointsOnLeft) left else right
              val ivSide = if (pointsOnLeft) right else left
              // point side: project an extra bucket column
              val ptBucket = Alias(bucketOf(pt, w), "__graft_rj_ptb")()
              val newPtSide = Project(ptSide.output :+ ptBucket, ptSide)
              // interval side: explode the covered bucket range
              val ivBucket = AttributeReference("__graft_rj_ivb", LongType, nullable = false)()
              // TimeZoneAwareExpression: an explicit zone keeps it resolved
              // inside the optimizer (integral sequences never consult it)
              val seq = Sequence(bucketOf(lo, w), bucketOf(hi, w), None,
                Some(conf.sessionLocalTimeZone))
              val newIvSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
                outer = false, qualifier = None, generatorOutput = Seq(ivBucket), child = ivSide)
              val (newLeft, newRight) =
                if (pointsOnLeft) (newPtSide, newIvSide) else (newIvSide, newPtSide)
              // equi-join on the bucket; the FULL original condition refines
              val newCond = And(EqualTo(ptBucket.toAttribute, ivBucket), cond)
              Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
          }
        }
    }
  }
}
