package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Filter

/** Scratch: verify optimizer convergence + fused-plan shape under the
  * production `spark.sql.extensions` config. Prints per-query
  * filterFusedEvals / totalFusedEvals and whether re-running the optimizer
  * on the optimized plan is a fixpoint. */
object ConvergeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("jmes_pipeline", "stream_filter_format", "jmes_multicol", "jmes_field", "jmes_wide")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val opt = df.queryExecution.optimizedPlan
      val planMs = (System.nanoTime() - t0) / 1e6
      val total = graft.compile.FusedPlanStats.totalFused(opt)
      val inFilter = graft.compile.FusedPlanStats.filterFused(opt)
      val reOpt = spark.sessionState.optimizer.execute(opt)
      val stable = reOpt.canonicalized == opt.canonicalized
      val physFused = "json_fused".r.findAllIn(
        df.queryExecution.executedPlan.toString).size
      println(f"PROBE $n%-22s planMs=$planMs%8.1f totalFused=$total filterFused=$inFilter physFused=$physFused fixpoint=$stable rows=${df.count()}")
      if (!stable) {
        println(s"--- re-optimized diverges for $n ---\n${opt.treeString.take(3000)}\n>>> became:\n${reOpt.treeString.take(3000)}")
      }
    }
    spark.stop()
  }
}
