package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType,
  TimestampType}

/** Optimizer rule: rewrite an inner point-in-interval (range) join
  *
  * {{{  ... JOIN ... ON  <rest> AND  x >= y - w  AND  x <= y  }}}
  *
  * (x from one side, y from the other, w a positive long literal) into a
  * '''banded equi-join''': band width = w, the x side emits its own band
  * and the next (`Generate(Explode(...))` — one scan, 2x rows), the y
  * side computes one band, and the join gains `band_x = band_y` with the
  * original range predicates kept as residuals.
  *
  * Why: without an equality conjunct Spark plans a range join as
  * BroadcastNestedLoopJoin — O(|L|*|R|) and lethal at 100 TB. With the
  * band key the join is an ordinary shuffled hash/sort-merge join whose
  * per-key work is bounded by the window density. x ∈ [y-w, y] implies
  * floor-div bands satisfy band(x) <= band(y) <= band(x)+1, and a pair
  * can match through exactly ONE of the two emitted copies, so the
  * rewrite is lossless and never duplicates.
  *
  * Scope guards: inner joins; x and y are LongType OR TimestampType
  * expressions each referencing exactly one side; w > 0 foldable (for
  * timestamps, `y - INTERVAL ...` reaches the optimizer as
  * `TimestampAddInterval(y, negative day-time literal)` — matched
  * directly, with the band keys computed over an implicit
  * `unix_micros` wrap and the width in microseconds). Fires once —
  * rewritten joins carry `__graft_band` attributes that make them
  * ineligible (idempotent under the optimizer's fixpoint).
  *
  * The reference's point-in-interval predicate is SURVEY §2.3 J2
  * (`blackmagic/blueprints/tile.py:77-85`) — constant-folded there; this
  * rule is the general table-vs-table form (j5_range_join exercises it
  * end-to-end against the DuckDB oracle).
  */
object BandedRangeJoin extends Rule[LogicalPlan] {

  private val BandCol = "__graft_band"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && eligible(cond) && !hasCrossEquiKey(cond, left, right) =>
      rewrite(left, right, cond, hint).getOrElse(j)
  }

  /** Skip joins we already banded (fixpoint guard). */
  private def eligible(cond: Expression): Boolean =
    !cond.references.exists(_.name.startsWith(BandCol))

  /** A join whose condition already carries a cross-side equality
    * conjunct plans as a hash/sort-merge join — it was never at BNLJ
    * risk, and banding it would only double one side through the
    * Generate for zero benefit. The rewrite is reserved for joins the
    * planner would otherwise nest-loop. */
  private def hasCrossEquiKey(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a, b) => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _ => false
    }

  private def crossSide(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    (sideOf(a, left, right), sideOf(b, left, right)) match {
      case (Some(sa), Some(sb)) => sa != sb
      case _ => false
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** `x >= y - w` in its four spellings -> (x, y, w). */
  private def lowerBound(
      e: Expression): Option[(Expression, Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(x, Subtract(y, w, _)) if w.foldable =>
        Some((x, y, w))
      case GreaterThan(x, Subtract(y, w, _)) if w.foldable => Some((x, y, w))
      case LessThanOrEqual(Subtract(y, w, _), x) if w.foldable =>
        Some((x, y, w))
      case LessThan(Subtract(y, w, _), x) if w.foldable => Some((x, y, w))
      case _ => None
    }

  /** Timestamp form of the lower bound: `x >= y - INTERVAL w` arrives
    * optimized as `x >= TimestampAddInterval(y, negative literal)` (the
    * analyzer rewrites datetime subtraction to interval addition) ->
    * (x, y, width in micros). */
  private def tsLowerBound(
      e: Expression): Option[(Expression, Expression, Long)] = {
    def widthOf(ta: TimestampAddInterval): Option[(Expression, Long)] = {
      val w = ta.children(1)
      if (w.foldable && w.dataType.isInstanceOf[DayTimeIntervalType])
        Option(w.eval()).collect {
          case micros: Long if micros < 0 => (ta.children(0), -micros)
        }
      else None
    }
    e match {
      case GreaterThanOrEqual(x, ta: TimestampAddInterval) =>
        widthOf(ta).map { case (y, wv) => (x, y, wv) }
      case GreaterThan(x, ta: TimestampAddInterval) =>
        widthOf(ta).map { case (y, wv) => (x, y, wv) }
      case LessThanOrEqual(ta: TimestampAddInterval, x) =>
        widthOf(ta).map { case (y, wv) => (x, y, wv) }
      case LessThan(ta: TimestampAddInterval, x) =>
        widthOf(ta).map { case (y, wv) => (x, y, wv) }
      case _ => None
    }
  }

  /** `x <= y` / `x < y` in both spellings -> (x, y). */
  private def upperBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThan(x, y) => Some((x, y))
      case LessThanOrEqual(x, y) => Some((x, y))
      case GreaterThan(y, x) => Some((x, y))
      case GreaterThanOrEqual(y, x) => Some((x, y))
      case _ => None
    }

  /** true = references only `left`, false = only `right`. */
  private def sideOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** Exact floor division for longs of any sign, overflow-safe: the
    * `(e - pmod(e, w)) / w` spelling wraps for e within w of
    * Long.MinValue (silently mis-banding the row and LOSING matches
    * in non-ANSI mode). `e div w` truncates toward zero and cannot
    * overflow for w > 0; subtracting 1 when the remainder is negative
    * yields true floor semantics at every representable long. */
  private def floorDiv(e: Expression, w: Expression): Expression = {
    val q = IntegralDivide(e, w)
    If(LessThan(Remainder(e, w), Literal(0L)),
      Subtract(q, Literal(1L)), q)
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    // long form: operands are already LongType band keys
    val longMatch = for {
      lc <- cs.iterator
      (x, y, w) <- lowerBound(lc).iterator
      uc <- cs.iterator if uc ne lc
      (x2, y2) <- upperBound(uc).iterator
      if x2.semanticEquals(x) && y2.semanticEquals(y)
      if x.dataType == LongType && y.dataType == LongType &&
        w.dataType == LongType
      wv <- Option(w.eval()).collect { case l: Long if l > 0 => l }.iterator
      xIsLeft <- sideOf(x, left, right).iterator
      yIsLeft <- sideOf(y, left, right).iterator
      if xIsLeft != yIsLeft
    } yield (x, y, wv, xIsLeft)
    // timestamp form: band keys are the implicit unix_micros wrap,
    // width already in micros from the interval literal
    val tsMatch = for {
      lc <- cs.iterator
      (x, y, wv) <- tsLowerBound(lc).iterator if wv > 0
      uc <- cs.iterator if uc ne lc
      (x2, y2) <- upperBound(uc).iterator
      if x2.semanticEquals(x) && y2.semanticEquals(y)
      if x.dataType == TimestampType && y.dataType == TimestampType
      xIsLeft <- sideOf(x, left, right).iterator
      yIsLeft <- sideOf(y, left, right).iterator
      if xIsLeft != yIsLeft
    } yield (UnixMicros(x), UnixMicros(y), wv, xIsLeft)

    (longMatch ++ tsMatch).nextOption().map { case (x, y, wv, xIsLeft) =>
      val w = Literal(wv, LongType)
      val xSide = if (xIsLeft) left else right
      val ySide = if (xIsLeft) right else left
      // y side: one band column
      val yAlias = Alias(floorDiv(y, w), BandCol + "_y")()
      val yProj = Project(ySide.output :+ yAlias, ySide)
      // x side: emit band and band+1 through ONE Generate (single scan)
      val bandX = AttributeReference(BandCol + "_x", LongType)()
      val xGen = Generate(
        Explode(CreateArray(Seq(
          floorDiv(x, w), Add(floorDiv(x, w), Literal(1L, LongType))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bandX), child = xSide)
      val newCond = And(cond, EqualTo(bandX, yAlias.toAttribute))
      val (newLeft, newRight) = if (xIsLeft) (xGen, yProj) else (yProj, xGen)
      // project the band columns away: output attrs = the original join's
      Project(left.output ++ right.output,
        Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
