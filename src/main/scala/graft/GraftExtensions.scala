package graft

import graft.functions.{DotProduct, GraftFunctions}
import graft.plans.DivBoundsRule
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Standard `spark.sql.extensions` entry point: makes graft's Catalyst
  * pieces available to ANY session — including plain `spark.sql` users
  * who never touch the Scala API — via
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Injected:
  *   - the [[graft.plans.DivBoundsRule]] optimizer rule (pushes ts-bound
  *     predicates through unit-conversion division down to parquet scans);
  *   - `graft_dot(a, b)` — the codegen'd [[DotProduct]];
  *   - `graft_md5h60(s)` — the oracle-shared 60-bit md5 hash;
  *   - `graft_percentile(v, p)` — the exact OpenTSDB R-6 percentile
  *     aggregate (p is the raw pNNN number, a foldable literal).
  *
  * Everything here is also reachable without extensions
  * ([[graft.plans.GraftOptimizations.install]] and
  * [[graft.functions.GraftFunctions]]); this class is the
  * zero-code-change config-only route.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** The quantile argument must be a foldable numeric literal — the R-6
    * interpolation expression tree is built around its value.
    */
  private def quantileOf(e: Expression): Double = e match {
    case Literal(v, DoubleType) => v.asInstanceOf[Double]
    case Literal(v, IntegerType) => v.asInstanceOf[Int].toDouble
    case Literal(v, LongType) => v.asInstanceOf[Long].toDouble
    case other => throw new IllegalArgumentException(
      s"graft_percentile quantile must be a numeric literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DivBoundsRule)

    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two ARRAY<DOUBLE>"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_md5h60"),
      info("graft_md5h60", "graft_md5h60(s) - 60-bit md5-derived BIGINT hash"),
      (children: Seq[Expression]) => GraftSqlBridge.catalystExpression(
        GraftFunctions.md5Hash60(GraftSqlBridge.column(children.head)))))

    ext.injectFunction((
      FunctionIdentifier("graft_percentile"),
      info("graft_percentile",
        "graft_percentile(v, p) - exact OpenTSDB pNNN percentile aggregate"),
      (children: Seq[Expression]) => GraftSqlBridge.catalystExpression(
        GraftFunctions.exactPercentile(
          GraftSqlBridge.column(children.head), quantileOf(children(1))))))
  }
}
