package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** (base expression, divisor k, bound c, op, bound-literal builder). */
  private type Match = (Expression, Long, Long, String, Long => Literal)

  private object DivAttrLit {
    /** Matches `chain(base) <op> c` or `c <op> chain(base)` (flipped),
      * where chain is a floor-division shape from [[Div]].
      */
    def unapply(e: Expression): Option[Match] = e match {
      case GreaterThanOrEqual(Div(a, k, m), Lit(c)) => Some((a, k, c, "gte", m))
      case GreaterThan(Div(a, k, m), Lit(c)) => Some((a, k, c, "gt", m))
      case LessThanOrEqual(Div(a, k, m), Lit(c)) => Some((a, k, c, "lte", m))
      case LessThan(Div(a, k, m), Lit(c)) => Some((a, k, c, "lt", m))
      case EqualTo(Div(a, k, m), Lit(c)) => Some((a, k, c, "eq", m))
      case GreaterThanOrEqual(Lit(c), Div(a, k, m)) => Some((a, k, c, "lte", m))
      case GreaterThan(Lit(c), Div(a, k, m)) => Some((a, k, c, "lt", m))
      case LessThanOrEqual(Lit(c), Div(a, k, m)) => Some((a, k, c, "gte", m))
      case LessThan(Lit(c), Div(a, k, m)) => Some((a, k, c, "gt", m))
      case EqualTo(Lit(c), Div(a, k, m)) => Some((a, k, c, "eq", m))
      case _ => None
    }
  }

  /** The two floor-division shapes the dp views produce over the scan
    * column:
    *   - `a div k` on Longs (truncating; the guards below restrict to the
    *     region where truncation == floor) — legacy integer event times
    *     and the ms→s response-edge division;
    *   - `unix_millis(cast(ntz as timestamp))` with a UTC session zone —
    *     the driver's parquet TIMESTAMP event times. `unix_millis` is
    *     floorDiv(micros, 1000), and the UTC cast is the identity on the
    *     underlying micros, so an epoch-ms bound maps 1:1 to a raw
    *     TIMESTAMP_NTZ literal bound parquet can prune row groups with.
    */
  private object Div {
    def unapply(e: Expression): Option[(Expression, Long, Long => Literal)] = e match {
      case IntegralDivide(a, Literal(k: Long, LongType), _)
          if a.deterministic && a.dataType == LongType =>
        Some((a, k, v => Literal(v)))
      case UnixMillis(c @ Cast(a, TimestampType, _, _))
          if a.deterministic && a.dataType == TimestampNTZType &&
            isUtc(c.timeZoneId) =>
        Some((a, 1000L, v => Literal(v, TimestampNTZType)))
      case _ => None
    }
  }

  private def isUtc(zone: Option[String]): Boolean =
    zone.exists { z =>
      try java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
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

  private def lower(a: Expression, k: Long, c: Long,
      mkLit: Long => Literal): Option[Expression] =
    if (c > 0 && mulOk(c, k)) Some(GreaterThanOrEqual(a, mkLit(c * k)))
    else None

  private def upper(a: Expression, k: Long, c: Long,
      mkLit: Long => Literal): Option[Expression] =
    if (c >= 0 && mulOk(c + 1, k)) Some(LessThanOrEqual(a, mkLit((c + 1) * k - 1)))
    else None

  private def infer(e: Expression): Seq[Expression] = e match {
    case DivAttrLit(a, k, c, op, m) if k > 0 =>
      op match {
        case "gte" => lower(a, k, c, m).toSeq
        case "gt" => lower(a, k, c + 1, m).toSeq
        case "lte" => upper(a, k, c, m).toSeq
        case "lt" => upper(a, k, c - 1, m).toSeq
        case "eq" => lower(a, k, c, m).toSeq ++ upper(a, k, c, m).toSeq
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
