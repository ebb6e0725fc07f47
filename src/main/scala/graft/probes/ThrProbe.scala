package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** ObjectHashAggregate fallback-threshold A/B per gate query (r15): which
  * queries prefer the hash path (k-bounded top-k buffers) vs the sort path
  * (growable collect_set/list buffers over many groups)? min-of-3 per cell. */
object ThrProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.compile.LowerJmesPathRule.LowerConfKey, "true")

    def force(df: DataFrame): Unit = {
      val cols = df.columns.map(col)
      df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head()
    }
    def minOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    val names = if (args.nonEmpty) args.toSeq
      else Seq("quality_ensemble", "source_overlap")
    names.foreach(n => force(SparkEntry.queries(n)(spark, dir))) // warm
    for (n <- names; thr <- Seq("65536", "128")) {
      spark.conf.set(graft.SessionTuning.ObjectHashFallbackKey, thr)
      val t = minOf(3)(force(SparkEntry.queries(n)(spark, dir)))
      println(f"[probe] $n%-22s thr=$thr%-6s $t%.3f s")
    }
    spark.stop()
  }
}
