package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: `Filter(rn ≤ k, Window(row_number() AS rn ...))`
  * — the engine's (and every Spark user's) standard per-key top-k
  * spelling — becomes the [[TopKPerKey]] operator, upgrading the
  * sort-based `WindowGroupLimit` plan Spark 3.5+ produces (two full
  * partition sorts around the exchange) to the heap-based
  * partial/final pair (no sort anywhere, same shuffled-volume bound).
  *
  * Fires only on the exact safe shape: a Window whose ONLY window
  * expression is a `row_number()` with non-empty partition and order
  * specs, filtered by a conjunct that upper-bounds the rank with an
  * integer literal ≥ 1. Residual conjuncts (including rank equality
  * like `rn = 1`, which contributes the k = 1 bound AND stays as a
  * filter) survive above a Project that restores the original
  * integer-typed `rn` attribute (same exprId), so downstream
  * references resolve unchanged. Spark's own `WindowGroupLimit` node,
  * if `InferWindowGroupLimit` already inserted one below the Window,
  * is dropped — the partial heap subsumes it.
  *
  * Row-for-row equivalence needs the ordering to be TOTAL (ties
  * decided by the sort key, not by sort stability) — the engine-wide
  * convention (rounded score, id tiebreak), and the condition under
  * which the DuckDB oracles hash-match at all. For a NON-total
  * ordering the heap still returns valid `row_number` results, but
  * may pick different tie rows than the sort-based plan; sessions
  * that need bit-stable tie selection across engine versions without
  * a total order can switch the rewrite off with
  * `spark.graft.topk.rewrite = false` (on by default).
  */
object RankToTopK extends Rule[LogicalPlan] {

  /** Session kill-switch for the automatic rewrite (the explicit
    * [[graft.ops.TopK.perKey]] builder is unaffected). */
  val RewriteConf = "spark.graft.topk.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(RewriteConf, "true") != "true") plan
    else plan.transformUp {
      case f @ Filter(cond, Window(
          Seq(a @ Alias(WindowExpression(RowNumber(), _), _)),
          part, ord, wchild, _))
          if part.nonEmpty && ord.nonEmpty =>
        val rn = a.toAttribute
        val conj = splitConj(cond)
        val bounds = conj.flatMap(boundOf(_, rn))
        if (bounds.isEmpty || bounds.min < 1) f
        else {
          val k = bounds.min
          // pure upper bounds are subsumed by k; everything else stays
          val rest = conj.filterNot(isPureUpperBound(_, rn))
          // strip a WindowGroupLimit below the Window ONLY when it is
          // provably the one InferWindowGroupLimit derived from this
          // same filter (row_number over the same partition/order,
          // limit >= k) — any other group limit changes which rows
          // reach the window, so the plan is left alone rather than
          // silently widened
          val childOpt: Option[LogicalPlan] = wchild match {
            case WindowGroupLimit(p2, o2, RowNumber(), lim, c)
                if lim >= k &&
                  p2.length == part.length &&
                  p2.zip(part).forall(t => t._1.semanticEquals(t._2)) &&
                  o2.length == ord.length &&
                  o2.zip(ord).forall(t => t._1.semanticEquals(t._2)) =>
              Some(c)
            case _: WindowGroupLimit => None // foreign limit: leave be
            case c => Some(c)
          }
          childOpt.fold(f: LogicalPlan) { child =>
            // normalize float/double grouping keys (0.0 == -0.0,
            // canonical NaN): the NormalizeFloatingNumbers batch runs
            // AFTER this rule and only matches Window/Aggregate/Join —
            // once the Window is gone it would never see these keys,
            // and the heap's byte-equality grouping would split 0.0
            // and -0.0 into two groups where the Window had one
            val npart = part.map(org.apache.spark.sql.graftbridge
              .ColumnBridge.normalizeFloats)
            val topk = TopKPerKey(npart, ord, k, child)
            val restored = Project(child.output :+
              Alias(Cast(topk.rnAttr, IntegerType), a.name)(
                exprId = a.exprId), topk)
            if (rest.isEmpty) restored
            else Filter(rest.reduce(And), restored)
          }
        }
    }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** The k this conjunct implies for the rank, if any. */
  private def boundOf(e: Expression, rn: Attribute): Option[Int] =
    e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) => Some(k)
      // k - 1 with a floor at Int.MinValue: `rn < Int.MinValue` must
      // NOT wrap to Int.MaxValue (which would pass the >= 1 guard and
      // rewrite an always-false filter into a return-everything top-k);
      // the un-wrapped value stays < 1, so the rule backs off and the
      // original filter runs
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) =>
        Some(if (k == Int.MinValue) k else k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rn) =>
        Some(if (k == Int.MinValue) k else k - 1)
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) => Some(k)
      case EqualTo(Literal(k: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rn) => Some(k)
      case _ => None
    }

  /** Conjuncts fully captured by the k bound (safe to drop); equality
    * forms are NOT pure bounds — they re-apply as residual filters. */
  private def isPureUpperBound(e: Expression, rn: Attribute): Boolean =
    e match {
      case LessThanOrEqual(a: Attribute, Literal(_: Int, IntegerType)) =>
        a.semanticEquals(rn)
      case LessThan(a: Attribute, Literal(_: Int, IntegerType)) =>
        a.semanticEquals(rn)
      case GreaterThanOrEqual(Literal(_: Int, IntegerType), a: Attribute) =>
        a.semanticEquals(rn)
      case GreaterThan(Literal(_: Int, IntegerType), a: Attribute) =>
        a.semanticEquals(rn)
      case _ => false
    }
}
