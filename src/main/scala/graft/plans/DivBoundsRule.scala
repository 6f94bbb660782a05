package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Infers raw-column bounds from comparisons over integer division, so
  * unit-conversion projections don't defeat parquet pushdown.
  *
  * The dp view derives epoch-ms time as `ts_ns div 1_000_000`; a query's
  * `ts BETWEEN a AND b` then reaches the scan as
  * `(ts_ns div 1000000) >= a AND ...` — an arithmetic predicate parquet
  * can't push, which at 100 TB forfeits ALL row-group/partition pruning
  * on time. This rule conjoins the implied raw bounds
  * (`ts_ns >= a*k`, `ts_ns <= (b+1)*k - 1`), which are plain
  * attribute-vs-literal comparisons and flow into `PushedFilters`.
  *
  * Soundness (Long `div` truncates toward zero; guards keep us where
  * truncation == floor):
  *   - `(a div k) >= c` with `k > 0, c > 0`  ⟹  `a >= c*k`
  *   - `(a div k) <= c` with `k > 0, c >= 0` ⟹  `a <= (c+1)*k - 1`
  *   - `=`, `<`, `>` reduce to the above.
  * The original predicate always remains — the added conjunct is an
  * implied bound, never a replacement, so rewrites can't change results.
  */
object DivBoundsRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val inferred = conjuncts.flatMap(infer)
        .filterNot(n => conjuncts.exists(_.semanticEquals(n)))
      if (inferred.isEmpty) f
      else Filter((conjuncts ++ inferred).reduce(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private object DivAttrLit {
    /** Matches `(attr div k) <op> c` or `c <op> (attr div k)` (flipped),
      * yielding (attr, k, c, opOnDivLeft).
      */
    def unapply(e: Expression): Option[(Expression, Long, Long, String)] = e match {
      case GreaterThanOrEqual(Div(a, k), Lit(c)) => Some((a, k, c, "gte"))
      case GreaterThan(Div(a, k), Lit(c)) => Some((a, k, c, "gt"))
      case LessThanOrEqual(Div(a, k), Lit(c)) => Some((a, k, c, "lte"))
      case LessThan(Div(a, k), Lit(c)) => Some((a, k, c, "lt"))
      case EqualTo(Div(a, k), Lit(c)) => Some((a, k, c, "eq"))
      case GreaterThanOrEqual(Lit(c), Div(a, k)) => Some((a, k, c, "lte"))
      case GreaterThan(Lit(c), Div(a, k)) => Some((a, k, c, "lt"))
      case LessThanOrEqual(Lit(c), Div(a, k)) => Some((a, k, c, "gte"))
      case LessThan(Lit(c), Div(a, k)) => Some((a, k, c, "gt"))
      case EqualTo(Lit(c), Div(a, k)) => Some((a, k, c, "eq"))
      case _ => None
    }
  }

  private object Div {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case IntegralDivide(a, Literal(k: Long, LongType), _)
          if a.deterministic && a.dataType == LongType => Some((a, k))
      case _ => None
    }
  }

  private object Lit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(c: Long, LongType) => Some(c)
      case Literal(c: Int, _) => Some(c.toLong)
      case _ => None
    }
  }

  private def mulOk(c: Long, k: Long): Boolean =
    c <= Long.MaxValue / k // both positive by the guards below

  private def lower(a: Expression, k: Long, c: Long): Option[Expression] =
    if (c > 0 && mulOk(c, k)) Some(GreaterThanOrEqual(a, Literal(c * k)))
    else None

  private def upper(a: Expression, k: Long, c: Long): Option[Expression] =
    if (c >= 0 && mulOk(c + 1, k)) Some(LessThanOrEqual(a, Literal((c + 1) * k - 1)))
    else None

  private def infer(e: Expression): Seq[Expression] = e match {
    case DivAttrLit(a, k, c, op) if k > 0 =>
      op match {
        case "gte" => lower(a, k, c).toSeq
        case "gt" => lower(a, k, c + 1).toSeq
        case "lte" => upper(a, k, c).toSeq
        case "lt" => upper(a, k, c - 1).toSeq
        case "eq" => lower(a, k, c).toSeq ++ upper(a, k, c).toSeq
      }
    case _ => Nil
  }
}

/** Install graft's optimizer rules on a session (idempotent). Called by
  * [[graft.model.DpView]]; also usable standalone for any session that
  * queries dp frames.
  */
object GraftOptimizations {
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(DivBoundsRule))
      spark.experimental.extraOptimizations = cur :+ DivBoundsRule
  }
}
