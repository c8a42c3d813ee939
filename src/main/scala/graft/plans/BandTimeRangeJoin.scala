package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a naive bounded time-range join into the
  * bucket-banded equi-join, automatically.
  *
  * Users write the natural thing —
  * {{{ l.join(r, r("ts") > l("ts") && r("ts") <= l("ts") + INTERVAL) }}}
  * — and without help Catalyst plans a BroadcastNestedLoopJoin (no
  * equi keys): every left row scans every right row, quadratic at any
  * scale.  This rule detects the bounded-range shape and injects the
  * banding [[graft.transform.Temporal.rangeJoinBanded]] applies by
  * hand: timestamps bucket to `gap`-wide bands with exact integer
  * `div` (truncated division keeps the two-band adjacency guarantee
  * for every sign: `div` is monotone and `(x+g) div g = x div g + 1`),
  * the left side explodes onto `(band, band + 1)`, the right projects
  * its own band, and the original predicate is conjoined with a band
  * EQUALITY — which `ExtractEquiJoinKeys` then picks up, so the
  * planner emits a shuffled hash/sort-merge join that AQE can size and
  * skew-split.  Output rows are identical: banding only restricts
  * which pairs are ENUMERATED, and every in-range pair shares a band
  * key by construction.
  *
  * Fires only on Inner joins whose condition has NO usable equi
  * conjunct (if one exists the planner already hash-joins on it) and
  * contains both bounds on one (left ts, right ts) pair:
  * `rTs > lTs` (or >=) and `rTs <= lTs + INTERVAL` (or <), with a
  * positive day-time interval literal.  The rewrite marks itself via
  * the injected equality, so the fixed-point optimizer batch is
  * idempotent.  Disabled with `spark.graft.autoBandRangeJoin=false`.
  */
object BandTimeRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(child, dt, _, _) if child.dataType == dt => stripCast(child)
    case Cast(child, TimestampType, _, _)
      if child.dataType == TimestampType => stripCast(child)
    case other => other
  }

  /** (leftTs, rightTs, strict) for a lower-bound conjunct `rTs > lTs`. */
  private def asLower(e: Expression, left: LogicalPlan,
                      right: LogicalPlan): Option[(Expression, Expression, Boolean)] = {
    def orient(a: Expression, b: Expression, strict: Boolean) = {
      // a must be the RIGHT-side timestamp, b the LEFT-side one
      if (a.dataType == TimestampType && b.dataType == TimestampType &&
        canEvaluate(a, right) && canEvaluate(b, left))
        Some((b, a, strict))
      else None
    }
    e match {
      case GreaterThan(a, b) => orient(stripCast(a), stripCast(b), true)
      case GreaterThanOrEqual(a, b) => orient(stripCast(a), stripCast(b), false)
      case LessThan(b, a) => orient(stripCast(a), stripCast(b), true)
      case LessThanOrEqual(b, a) => orient(stripCast(a), stripCast(b), false)
      case _ => None
    }
  }

  /** (leftTs, rightTs, gapMicros) for an upper bound
    * `rTs <= lTs + INTERVAL gap` (strict `<` also qualifies). */
  private def asUpper(e: Expression, left: LogicalPlan,
                      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def fromAdd(rTs: Expression, add: Expression): Option[(Expression, Expression, Long)] =
      stripCast(add) match {
        case TimestampAddInterval(base, Literal(micros: Long, _: DayTimeIntervalType), _)
          if micros > 0 && canEvaluate(base, left) &&
            canEvaluate(rTs, right) && rTs.dataType == TimestampType =>
          Some((stripCast(base), rTs, micros))
        case _ => None
      }
    e match {
      case LessThanOrEqual(a, b) => fromAdd(stripCast(a), b)
      case LessThan(a, b) => fromAdd(stripCast(a), b)
      case GreaterThanOrEqual(b, a) => fromAdd(stripCast(a), b)
      case GreaterThan(b, a) => fromAdd(stripCast(a), b)
      case _ => None
    }
  }

  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(a, right) && canEvaluate(b, left))
      case EqualNullSafe(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(a, right) && canEvaluate(b, left))
      case _ => false
    }

  private def band(ts: Expression, gap: Long): Expression =
    IntegralDivide(UnixMicros(ts), Literal(gap))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.autoBandRangeJoin", "true")
      .toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
        if left.resolved && right.resolved => {
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiKey(conjuncts, left, right)) j
        else {
          val lowers = conjuncts.flatMap(asLower(_, left, right))
          val uppers = conjuncts.flatMap(asUpper(_, left, right))
          val matched = for {
            (lTs, rTs, _) <- lowers
            (uL, uR, gap) <- uppers
            if uL.semanticEquals(lTs) && uR.semanticEquals(rTs)
          } yield (lTs, rTs, gap)
          matched.headOption match {
            case None => j
            case Some((lTs, rTs, gap)) =>
              val lBand = band(lTs, gap)
              val genOut = AttributeReference("__band_l", LongType)()
              val newLeft = Generate(
                Explode(CreateArray(Seq(lBand, Add(lBand, Literal(1L))))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(genOut), left)
              val rBand = Alias(band(rTs, gap), "__band_r")()
              val newRight = Project(right.output :+ rBand, right)
              val newCond = And(cond, EqualTo(genOut, rBand.toAttribute))
              Project(j.output,
                Join(newLeft, newRight, Inner, Some(newCond), hint))
          }
        }
      }
    }
  }
}
