package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: the automatic form of `ops.RangeJoin`.
  *
  * An inner join whose only cross-side condition is a point-in-interval
  * predicate — `p >= s AND p < e`, no equi-conjunct — can only be
  * planned as a broadcast-nested-loop (or cartesian) join by stock
  * Spark: O(|points|·|intervals|) comparisons. This rule detects that
  * shape in ANY query (including plain `spark.sql` text, where the
  * DataFrame-level `RangeJoin.pointInInterval` helper is out of reach)
  * and rewrites it into the banding plan: the interval side explodes
  * onto fixed-width bands, the point side computes its single band, and
  * the join becomes a distributed equi-join on the band id with the
  * exact predicate re-checked. Same rewrite Databricks ships as its
  * range-join optimization, expressed as a ~100-line public-API rule.
  *
  * Scope and guards (each keeps the rewrite semantics-preserving):
  *  - inner joins only; the condition's conjuncts must include `p >= s`
  *    and `p < e` (either operand order) over LongType expressions,
  *    with `p` computed from one side and `s`, `e` from the other;
  *  - no cross-side equality conjunct may exist (Catalyst would already
  *    plan an equi-join — and the guard makes the rule idempotent,
  *    since the rewritten join contains exactly such a conjunct);
  *  - intervals with `e <= s` are filtered before exploding: they match
  *    nothing, and `sequence(a, b)` with `b < a` counts DOWN;
  *  - every original conjunct is kept in the new join condition, so
  *    extra non-equi predicates simply ride along.
  *
  * Band ids use `(a - pmod(a, w)) div w` — exact floor division in
  * integer arithmetic, negative-safe. Enabled by setting
  * `spark.graft.rangeJoin.bandWidth` (domain units; pick ~ the typical
  * interval length — replication is len/w + 1 bands per interval).
  * Unset or non-positive disables the rule.
  *
  * Registered config-time via `graft.functions.GraftExtensions`
  * (`injectOptimizerRule`) or at runtime through
  * `spark.experimental.extraOptimizations`.
  */
case class RangeJoinBandingRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.bandWidth"

  private def bandWidth: Option[Long] =
    session.conf.getOption(ConfKey).flatMap(v => scala.util.Try(v.toLong).toOption)
      .filter(_ > 0)

  private def floorDiv(a: Expression, w: Long): Expression =
    IntegralDivide(Subtract(a, Pmod(a, Literal(w))), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = bandWidth match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) if j.resolved =>
        rewrite(j, l, r, cond, hint, w).getOrElse(j)
    }
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // a cross-side equality means Catalyst already has an equi-join
    // (and marks our own output, keeping the rule idempotent)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a, l, r); sb <- sideOf(b, l, r)) yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None

    // find p >= s (lower bound) and p < e (upper bound) on the same p
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(p, s) if p.dataType == LongType => (p, s)
      case LessThanOrEqual(s, p) if p.dataType == LongType => (p, s)
    }
    val upper = conjuncts.collectFirst {
      case LessThan(p, e) if p.dataType == LongType => (p, e)
      case GreaterThan(e, p) if p.dataType == LongType => (p, e)
    }
    (lower, upper) match {
      case (Some((p, s)), Some((p2, e))) if p.semanticEquals(p2) =>
        for {
          pSide <- sideOf(p, l, r)
          sSide <- sideOf(s, l, r)
          eSide <- sideOf(e, l, r)
          if sSide == eSide && sSide != pSide
        } yield {
          val (points, intervals) = if (pSide) (l, r) else (r, l)
          val pBand = Alias(floorDiv(p, w), "__band_p")()
          val newPoints = Project(points.output :+ pBand, points)
          val bandAttr = AttributeReference("__band_i", LongType)()
          // Sequence is TimeZoneAwareExpression: without an explicit zone
          // a rule-built instance stays unresolved (ResolveTimeZone ran
          // long before the optimizer)
          val seq = Sequence(floorDiv(s, w),
            floorDiv(Subtract(e, Literal(1L)), w), Some(Literal(1L)),
            Some(session.sessionState.conf.sessionLocalTimeZone))
          val newIntervals = Generate(Explode(seq), Nil, outer = false, None,
            Seq(bandAttr), Filter(GreaterThan(e, s), intervals))
          val newCond = And(EqualTo(pBand.toAttribute, bandAttr), cond)
          val (nl, nr) = if (pSide) (newPoints, newIntervals) else (newIntervals, newPoints)
          Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
      case _ => None
    }
  }
}
