package graft.probes

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Counts corpus scans / reused exchanges in the bm25 & rrf plans. */
object Bm25PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("bm25_topk", "retrieval_rrf")) {
      val ps = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val scans = "FileScan".r.findAllIn(ps).size
      println(s"[p] $name scans=$scans")
    }
    spark.stop()
  }
}
