package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scratch: dump the optimized LOGICAL plan of selected queries. */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.optimizedPlan.treeString.take(4000))
    }
    spark.stop()
  }
}
