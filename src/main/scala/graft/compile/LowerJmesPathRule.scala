package graft.compile

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{JmesPathEvalDouble, JmesTruthy}
import graft.jmespath.{JmesSyntaxError, Parser}

/** Optimizer rule (SURVEY §4.2): rewrites the interpreted JMESPath
  * expressions into their native lowered forms when the compiled AST falls
  * inside [[Lowering]]'s exact subset — users write the simple
  * `jmesTruthy`/`jmespathDouble` API and still get
  * `Filter(coalesce(try_cast(json_path_raw(...)) ...))` plans.
  *
  * Registered by [[graft.GraftExtensions]] (spark.sql.extensions) or
  * appended to `spark.experimental.extraOptimizations`. JmesPathEval
  * (string-result) is NOT rewritten: its output convention (unquoted scalar
  * strings, compact-JSON containers) has no loss-free native equivalent yet.
  */
object LowerJmesPathRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case t @ JmesTruthy(child, exprStr) =>
        tryLower(exprStr)(ast => Lowering.truthyNullSafe(child, ast)).getOrElse(t)
      case d @ JmesPathEvalDouble(child, exprStr) =>
        tryLower(exprStr)(ast => Lowering.numNullSafe(child, ast)).getOrElse(d)
    }

  private def tryLower(exprStr: String)(
      f: graft.jmespath.Ast => Option[
        org.apache.spark.sql.catalyst.expressions.Expression]) =
    try f(Parser.parse(exprStr))
    catch { case _: JmesSyntaxError => None } // analysis reports the error
}
