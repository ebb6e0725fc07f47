package graft.compile

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{JmesPathEval, JmesPathEvalDouble, JmesPathFiltered, JmesTruthy}
import graft.jmespath.{JmesSyntaxError, Parser}

/** Optimizer rule (SURVEY §4.2): rewrites the interpreted JMESPath
  * expressions into their native lowered forms when the compiled AST falls
  * inside [[Lowering]]'s exact subset — users write the simple
  * `jmespath`/`jmesTruthy`/`jmespathDouble`/`jmesFiltered` API and still get
  * native `json_path_raw`/`json_path_value`/`json_projection_*` plans.
  *
  * Registered by [[graft.GraftExtensions]] (spark.sql.extensions) or
  * appended to `spark.experimental.extraOptimizations`. All four contexts
  * lower: truthiness, numeric value, serialized VALUE output (JmesPathEval —
  * strings unquoted, containers canonical compact JSON), and the combined
  * filter+project form the CLI `-filter` path uses (JmesPathFiltered,
  * FramedSink.lineCol) — the reference's flagship per-record hot path
  * (main.go:88-101) runs fully native when the expression is lowerable.
  */
object LowerJmesPathRule extends Rule[LogicalPlan] {
  /** Session-conf opt-out (default on). The gate's `*_interp` control
    * queries set this false so the interpreted execution path keeps real
    * coverage and the lowered-vs-interpreted bench A/B stays meaningful. */
  val LowerConfKey = "spark.graft.jmes.lower"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(LowerConfKey, "true").toBoolean) plan
    else plan.transformAllExpressions {
      case t @ JmesTruthy(child, exprStr) =>
        tryLower(exprStr)(ast => Lowering.truthyNullSafe(child, ast)).getOrElse(t)
      case d @ JmesPathEvalDouble(child, exprStr) =>
        tryLower(exprStr)(ast => Lowering.numNullSafe(child, ast)).getOrElse(d)
      case v @ JmesPathEval(child, exprStr) =>
        tryLower(exprStr)(ast => Lowering.valueNullSafe(child, ast)).getOrElse(v)
      case f @ JmesPathFiltered(child, exprStr) =>
        tryLower(exprStr)(ast => Lowering.filteredNullSafe(child, ast)).getOrElse(f)
    }

  private def tryLower(exprStr: String)(
      f: graft.jmespath.Ast => Option[
        org.apache.spark.sql.catalyst.expressions.Expression]) =
    try f(Parser.parse(exprStr))
    catch { case _: JmesSyntaxError => None } // analysis reports the error
}
