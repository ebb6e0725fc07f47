package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CosineSim, JmesPathEval, JmesPathEvalDouble, JmesTruthy, MinHashSig, SimHash}

/** SQL-surface registration of the engine's expressions, usable two ways:
  *
  *  - config: `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - imperative: `GraftExtensions.register(spark)` on a live session
  *
  * Functions: `jmespath(doc, 'expr')`, `jmespath_double(doc, 'expr')`,
  * `jmes_truthy(doc, 'expr')`, `cosine_sim(a, b)`, `simhash64(tokens)`,
  * `minhash_sig(tokens, k)`. The JMESPath expression and `k` arguments must
  * be foldable (literals) — they are compiled at plan time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // Lowering + fusion run ONCE, after the operator-optimization fixpoint
    // (the "Pre CBO Rules" batch). Inside the fixpoint batch,
    // PushPredicateThroughNonJoin re-inlines the hoisted fused-scan alias
    // into the Filter each iteration and FuseProjectScans re-hoists it under
    // a fresh ExprId — the batch ping-pongs to its 100-iteration cap and
    // ships a double-parse plan (round-7 verdict #1). At preCBO, predicate
    // pushdown has settled, so the hoisted one-scan-below-Filter shape is
    // final.
    ext.injectPreCBORule(_ => graft.compile.LowerJmesPathRule)
    ext.injectPreCBORule(_ => graft.compile.FuseProjectScans)
  }
}

object GraftExtensions {
  private def litString(e: Expression, fn: String): String = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: the expression argument must be a literal")
    e.eval(null) match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: the expression argument must be a STRING literal, got $other")
    }
  }
  private def litInt(e: Expression, fn: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: the argument must be a literal")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: expected an INT literal, got $other")
    }
  }
  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(s"$fn expects $n arguments, got ${args.length}")

  type FnEntry = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  val all: Seq[FnEntry] = Seq(
    (FunctionIdentifier("jmespath"),
      new ExpressionInfo(classOf[JmesPathEval].getName, "jmespath"),
      (args: Seq[Expression]) => {
        arity("jmespath", 2, args)
        JmesPathEval(args.head, litString(args(1), "jmespath"))
      }),
    (FunctionIdentifier("jmespath_double"),
      new ExpressionInfo(classOf[JmesPathEvalDouble].getName, "jmespath_double"),
      (args: Seq[Expression]) => {
        arity("jmespath_double", 2, args)
        JmesPathEvalDouble(args.head, litString(args(1), "jmespath_double"))
      }),
    (FunctionIdentifier("jmes_truthy"),
      new ExpressionInfo(classOf[JmesTruthy].getName, "jmes_truthy"),
      (args: Seq[Expression]) => {
        arity("jmes_truthy", 2, args)
        JmesTruthy(args.head, litString(args(1), "jmes_truthy"))
      }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        arity("cosine_sim", 2, args)
        CosineSim(args.head, args(1))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash64"),
      (args: Seq[Expression]) => {
        arity("simhash64", 1, args)
        SimHash(args.head)
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        arity("minhash_sig", 2, args)
        MinHashSig(args.head, litInt(args(1), "minhash_sig"))
      }),
  )

  /** Imperative registration on a live session: temp functions plus the
    * lowering/fusion optimizer rules (the post-creation twin of the
    * `spark.sql.extensions` injection).
    *
    * Placement caveat: a live session's optimizer is frozen, so the rules
    * land in the trailing "User Provided Optimizers" batch here instead of
    * the preCBO batch the conf-based injection uses. Both run after
    * predicate pushdown has settled and both converge (nothing re-runs
    * pushdown after either), but plan-shape GATES must use the conf path —
    * build test sessions like [[graft.ProdSession]]
    * (`Builder.withExtensions(new GraftExtensions()(_))`) rather than this
    * method. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark, all)
    spark.experimental.extraOptimizations =
      (spark.experimental.extraOptimizations :+
        graft.compile.LowerJmesPathRule :+ graft.compile.FuseProjectScans).distinct
  }
}
