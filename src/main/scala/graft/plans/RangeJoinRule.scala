package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

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
  * range-join optimization, expressed as a ~150-line public-API rule.
  *
  * Scope and guards (each keeps the rewrite semantics-preserving):
  *  - inner joins only; the condition's conjuncts must include `p >= s`
  *    and `p < e` (either operand order) over LongType expressions,
  *    with `p` computed from one side and `s`, `e` from the other.
  *    ALL lower/upper conjunct pairs are searched for a consistent
  *    (p, s, e) binding — an unrelated inequality conjunct written
  *    before the range predicates (e.g. `pid > 10`) cannot shadow the
  *    real pair;
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
  * HAZARD: bandWidth is session-wide, and replication is data-dependent.
  * An interval with a sentinel/open end (e.g. epoch seconds of
  * 9999-12-31) explodes `sequence()` into billions of band rows — a
  * query that previously ran (slowly) as a nested-loop join would now
  * OOM. Guard: set `spark.graft.rangeJoin.maxBandsPerInterval`; with a
  * cap, intervals wider than cap bands emit ONE sentinel row (key
  * `(big=true, band=0)`) instead of their band list, and the point side
  * probes both its own band `(false, own)` and the sentinel `(true, 0)`
  * so those intervals are still matched exactly. The sentinel bucket is
  * a mini nested-loop inside the equi-join — all points meet all
  * oversized intervals in one reducer, which AQE's skew split can
  * further divide — so correctness never depends on the cap, only the
  * cost of the few open-ended rows does. The cap doubles the probe-side
  * rows (each point emits two keys), so set it only when open-ended
  * intervals are actually present.
  *
  * Registered config-time via `graft.functions.GraftExtensions`
  * (`injectOptimizerRule`) or at runtime through
  * `spark.experimental.extraOptimizations`.
  */
case class RangeJoinBandingRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.bandWidth"
  private val CapKey = "spark.graft.rangeJoin.maxBandsPerInterval"

  private def longConf(key: String): Option[Long] =
    session.conf.getOption(key).flatMap(v => scala.util.Try(v.toLong).toOption)
      .filter(_ > 0)

  private def floorDiv(a: Expression, w: Long): Expression =
    IntegralDivide(Subtract(a, Pmod(a, Literal(w))), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = longConf(ConfKey) match {
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

    // collect ALL lower (p >= s) and upper (p < e) candidates, then
    // search for a consistent binding: same p, s/e both on the side
    // opposite p. collectFirst would let an unrelated long inequality
    // conjunct shadow the real pair and silently skip the rewrite.
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, s) if p.dataType == LongType => (p, s)
      case LessThanOrEqual(s, p) if p.dataType == LongType => (p, s)
    }
    val uppers = conjuncts.collect {
      case LessThan(p, e) if p.dataType == LongType => (p, e)
      case GreaterThan(e, p) if p.dataType == LongType => (p, e)
    }
    val bound = (for {
      (p, s) <- lowers.iterator
      (p2, e) <- uppers.iterator
      if p.semanticEquals(p2)
      pSide <- sideOf(p, l, r).iterator
      sSide <- sideOf(s, l, r).iterator
      eSide <- sideOf(e, l, r).iterator
      if sSide == eSide && sSide != pSide
    } yield (p, s, e, pSide)).nextOption()

    bound.map { case (p, s, e, pSide) =>
      val (points, intervals) = if (pSide) (l, r) else (r, l)
      val live = Filter(GreaterThan(e, s), intervals)
      // Sequence is TimeZoneAwareExpression: without an explicit zone
      // a rule-built instance stays unresolved (ResolveTimeZone ran
      // long before the optimizer)
      val seq = Sequence(floorDiv(s, w),
        floorDiv(Subtract(e, Literal(1L)), w), Some(Literal(1L)),
        Some(session.sessionState.conf.sessionLocalTimeZone))
      val bandAttr = AttributeReference("__band_i", LongType)()

      val (newPoints, newIntervals, equiCond) = longConf(CapKey) match {
        case None =>
          val pBand = Alias(floorDiv(p, w), "__band_p")()
          val np = Project(points.output :+ pBand, points)
          val ni = Generate(Explode(seq), Nil, outer = false, None,
            Seq(bandAttr), live)
          (np, ni, EqualTo(pBand.toAttribute, bandAttr): Expression)
        case Some(cap) =>
          // intervals wider than `cap` bands collapse to one sentinel
          // row; every point probes (own band, sentinel) so oversized
          // intervals still match exactly without exploding
          val nBands = Add(Subtract(floorDiv(Subtract(e, Literal(1L)), w),
            floorDiv(s, w)), Literal(1L))
          val big = GreaterThan(nBands, Literal(cap))
          val bigAlias = Alias(big, "__band_big")()
          val bands = If(big, CreateArray(Seq(Literal(0L))), seq)
          val ni = Generate(Explode(bands), Nil, outer = false, None,
            Seq(bandAttr), Project(intervals.output :+ bigAlias, live))
          val probeType = StructType(Seq(
            StructField("f", BooleanType, nullable = false),
            StructField("b", LongType, nullable = true)))
          val probes = CreateArray(Seq(
            CreateNamedStruct(Seq(Literal("f"), Literal(false),
              Literal("b"), floorDiv(p, w))),
            CreateNamedStruct(Seq(Literal("f"), Literal(true),
              Literal("b"), Literal(0L)))))
          val probeAttr = AttributeReference("__band_probe", probeType)()
          val gen = Generate(Explode(probes), Nil, outer = false, None,
            Seq(probeAttr), points)
          val pf = Alias(GetStructField(probeAttr, 0, Some("f")), "__band_pf")()
          val pb = Alias(GetStructField(probeAttr, 1, Some("b")), "__band_p")()
          val np = Project(points.output :+ pf :+ pb, gen)
          val equi = And(EqualTo(pf.toAttribute, bigAlias.toAttribute),
            EqualTo(pb.toAttribute, bandAttr))
          (np, ni, equi: Expression)
      }
      val newCond = And(equiCond, cond)
      val (nl, nr) = if (pSide) (newPoints, newIntervals) else (newIntervals, newPoints)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    }
  }
}
