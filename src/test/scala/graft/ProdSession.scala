package graft

import org.apache.spark.sql.SparkSession

/** The production-config test session (round-7 verdict missing #1).
  *
  * Bench/Verify/production sessions install the engine via
  * `spark.sql.extensions=graft.GraftExtensions`, which injects
  * [[graft.compile.LowerJmesPathRule]] + [[graft.compile.FuseProjectScans]]
  * into the optimizer's Pre CBO batch. The previous plan gates instead used
  * `spark.experimental.extraOptimizations` — a different batch where the
  * round-7 pushdown ping-pong could not reproduce, so a green suite shipped
  * a broken production plan.
  *
  * Under `sbt test` all suites share one JVM and `spark.sql.extensions` is
  * static conf read from the FIRST SparkContext, so the conf string cannot
  * be relied on here. `Builder.withExtensions` runs the IDENTICAL injection
  * code (`new GraftExtensions()(extensions)`) on a freshly created
  * SparkSession, producing the same optimizer batches production runs —
  * that is what these gates must test. AQE is off so `executedPlan` is the
  * concrete static tree (production keeps AQE on; AQE re-plans start from
  * exactly this plan). */
object ProdSession {
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
  }
}
