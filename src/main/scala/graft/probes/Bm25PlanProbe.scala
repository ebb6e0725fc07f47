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
    for (name <- Seq("bm25_topk", "retrieval_rrf", "retrieval_rbo")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val ps = df.queryExecution.executedPlan.toString
      println(s"[p] $name")
      ps.linesIterator.filter(l => l.contains("Filter") || l.contains("FileScan") || l.contains("shingle_array") || l.contains("simhash")).take(12).foreach(l => println("[l] " + l.take(600)))
    }
    spark.stop()
  }
}
