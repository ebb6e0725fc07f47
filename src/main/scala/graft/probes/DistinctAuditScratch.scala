package graft.probes

import graft.{GraftExtensions, SessionTuning, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Scratch: show each grouping-only aggregate in a gate's physical plan
  * and what shape sits below it (detector debugging for PlanAuditSpec
  * invariant 3). Delete-safe diagnostic. */
object DistinctAuditScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SessionTuning(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false"))
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @annotation.tailrec
    def firstShapeBelow(p: SparkPlan): SparkPlan = p match {
      case _: aggregate.BaseAggregateExec => p
      case u: UnaryExecNode => firstShapeBelow(u.child)
      case x => x
    }
    def explodedSide(p: SparkPlan): Boolean = p match {
      case _: aggregate.BaseAggregateExec => false
      case _: GenerateExec => true
      case r: ReusedExchangeExec => explodedSide(r.child)
      case x => x.children.exists(explodedSide)
    }
    for (name <- args.toSeq) {
      val p = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      println(s"===== $name")
      p.foreach {
        case a: aggregate.BaseAggregateExec =>
          val below = firstShapeBelow(a.child)
          val sides = below match {
            case j: joins.BaseJoinExec =>
              s" exploded(l=${explodedSide(j.left)}, r=${explodedSide(j.right)})"
            case _ => ""
          }
          println(s"  agg(exprs=${a.aggregateExpressions.size}) -> " +
            below.getClass.getSimpleName + sides)
        case _ =>
      }
    }
    spark.stop()
  }
}
