package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Optimizer rule: a pure RANGE-condition join — `a.x BETWEEN b.lo AND
  * b.hi` with no equi-conjunct tying the two sides — is executed by
  * Spark as a BroadcastNestedLoopJoin (O(|A|·|B|) comparisons). When
  * `spark.graft.rangeJoin.binWidth` is set to W > 0, this rule rewrites
  * the join into the BINNED form every range-join implementation
  * (Databricks' range-join hint, GeoSpark's partition join) uses and
  * which this repo's q37/q58/geo02 plans hand-roll: the point side gains
  * bin = x div W, the interval side EXPLODES into its covering bins
  * (with a ±1 margin so truncating division stays sound on negatives),
  * and the join becomes a hash equi-join on the bin with the ORIGINAL
  * predicate kept as residual — exact same rows (each pair meets on the
  * point's single bin, so no duplicates), O(|A| + |B|·spans/W) work.
  *
  * Scope is deliberately narrow: INNER joins whose condition conjuncts
  * are exactly one lower and one upper bound on the SAME LongType point
  * expression from one side against bounds from the other (any extra
  * conjuncts stay residual but must not be cross-side equalities — if a
  * hash key already exists, Spark's equi-join machinery is the right
  * tool and the plan is left alone). Off by default: W is workload
  * knowledge (a bin should span a typical interval), exactly like the
  * bucketed-join DDL it parallels.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] {

  private def binWidth: Long =
    try SQLConf.get.getConfString("spark.graft.rangeJoin.binWidth", "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** (point, bound, pointOnLeftPlan) for x ≥ b / x > b shapes, where x
    * comes wholly from one join side and b wholly from the other. */
  private def lowerBound(e: Expression, l: LogicalPlan, r: LogicalPlan):
      Option[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(x, b) => oriented(x, b, l, r)
    case GreaterThan(x, b) => oriented(x, b, l, r)
    case LessThanOrEqual(b, x) => oriented(x, b, l, r)
    case LessThan(b, x) => oriented(x, b, l, r)
    case _ => None
  }

  private def upperBound(e: Expression, l: LogicalPlan, r: LogicalPlan):
      Option[(Expression, Expression, Boolean)] = e match {
    case LessThanOrEqual(x, b) => oriented(x, b, l, r)
    case LessThan(x, b) => oriented(x, b, l, r)
    case GreaterThanOrEqual(b, x) => oriented(x, b, l, r)
    case GreaterThan(b, x) => oriented(x, b, l, r)
    case _ => None
  }

  private def oriented(x: Expression, b: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Boolean)] = {
    if (x.dataType != LongType || b.dataType != LongType) None
    else if (x.references.nonEmpty && x.references.subsetOf(l.outputSet) &&
      b.references.subsetOf(r.outputSet)) Some((x, b, true))
    else if (x.references.nonEmpty && x.references.subsetOf(r.outputSet) &&
      b.references.subsetOf(l.outputSet)) Some((x, b, false))
    else None
  }

  private def isCrossSideEquality(e: Expression, l: LogicalPlan,
      r: LogicalPlan): Boolean = e match {
    case EqualTo(a, b) =>
      (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
        (a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conj = splitConjuncts(cond)
        val lows = conj.flatMap(c => lowerBound(c, left, right).map(c -> _))
        val highs = conj.flatMap(c => upperBound(c, left, right).map(c -> _))
        val hasEqui = conj.exists(c => isCrossSideEquality(c, left, right))
        // One lower + one upper on the SAME point expression, no equi
        // key. Try EVERY lower-bound conjunct, not just the first: with
        // mirrored bounds (both sides bounded) the first lower-shaped
        // conjunct can belong to the interval side's point expression,
        // and pairing only it would silently miss the rewrite and leave
        // the nested-loop join in place. Also require all three
        // expressions deterministic — the generator duplicates lo/hi
        // (and bins x) while the original predicate stays as residual,
        // and a non-deterministic expression could evaluate differently
        // in the two places, dropping or duplicating rows.
        val pair = lows.view.flatMap { case (_, (x1, lo, s1)) =>
          highs.collectFirst { case (_, (x2, hi, s2))
              if s2 == s1 && x2.semanticEquals(x1) &&
                x1.deterministic && lo.deterministic && hi.deterministic =>
            (x1, lo, hi, s1)
          }
        }.headOption
        pair match {
          case Some((x, lo, hi, pointOnLeft)) if !hasEqui =>
            val wLit = Literal(w)
            val (pointPlan, boundPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            val binP = Alias(IntegralDivide(x, wLit), "__bin_p")()
            val pointProj = Project(pointPlan.output :+ binP, pointPlan)
            // covering bins with ±1 margin: IntegralDivide truncates
            // toward zero while coverage needs floor — the margin keeps
            // the rewrite sound for negative domains (extra candidates
            // die in the residual predicate)
            val seq0 = Sequence(
              org.apache.spark.sql.catalyst.expressions.Subtract(
                IntegralDivide(lo, wLit), Literal(1L)),
              org.apache.spark.sql.catalyst.expressions.Add(
                IntegralDivide(hi, wLit), Literal(1L)),
              Some(Literal(1L)),
              // Sequence is TimeZoneAware — an optimizer-inserted node
              // must arrive with its zone already bound or the plan
              // re-enters the unresolved state
              Some(SQLConf.get.sessionLocalTimeZone))
            // Two per-row safety guards the original plan didn't need:
            // an INVERTED interval (hi < lo) would make Sequence count
            // DOWN and crash where the join just matched nothing — the
            // If(null) makes Explode drop the row; an interval spanning
            // more than 1e5 bins would materialize a huge array (or hit
            // Sequence's 2^31 cap) — that's a mis-set W, so it fails
            // LOUDLY with the knob to turn instead of OOMing.
            val span = IntegralDivide(
              org.apache.spark.sql.catalyst.expressions.Subtract(hi, lo), wLit)
            val seq = org.apache.spark.sql.catalyst.expressions.If(
              LessThanOrEqual(lo, hi),
              org.apache.spark.sql.catalyst.expressions.If(
                LessThanOrEqual(span, Literal(100000L)),
                seq0,
                new org.apache.spark.sql.catalyst.expressions.RaiseError(
                  Literal("USER_RAISED_EXCEPTION"),
                  org.apache.spark.sql.catalyst.expressions.CreateMap(Seq(
                    Literal("errorMessage"),
                    Literal("rangeJoin: interval spans > 1e5 bins — raise " +
                      "spark.graft.rangeJoin.binWidth"))),
                  seq0.dataType)),
              Literal(null, seq0.dataType))
            val binB = AttributeReference("__bin_b", LongType, nullable = false)()
            val boundGen = Generate(Explode(seq), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(binB), child = boundPlan)
            val binJoinCond = And(
              EqualTo(binP.toAttribute, binB), cond)
            val joined =
              if (pointOnLeft) Join(pointProj, boundGen, Inner, Some(binJoinCond), hint)
              else Join(boundGen, pointProj, Inner, Some(binJoinCond), hint)
            Project(j.output, joined)
          case _ => j
        }
    }
  }
}
