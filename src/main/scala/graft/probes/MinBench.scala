package graft.probes

import graft.{GraftExtensions, SparkEntry}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side min-of-N timer for named SparkEntry queries in ONE JVM:
  * under bursty host contention the per-query MINIMUM is the honest
  * reading where medians stay inflated (the CoocProbe discipline, made
  * generic). Not part of the driver contract — the real gate is Bench.
  *
  * Usage: runMain graft.probes.MinBench q1 q2 ...  (default reps 7,
  * override with SPARK_GRAFT_MINBENCH_REPS). Prints one line per query
  * plus an interleaved sentinel minimum for window-quality context. */
object MinBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_MINBENCH_REPS", "7").toInt
    val spark = graft.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit = {
      val cols = df.columns.map(col)
      df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head()
    }
    def lowerFor(n: String): Unit =
      spark.conf.set(graft.compile.LowerJmesPathRule.LowerConfKey,
        (!SparkEntry.interpretedQueries(n)).toString)
    def timeOnce(n: String): Double = {
      lowerFor(n)
      spark.sparkContext.setJobDescription(s"minbench:$n")
      val t0 = System.nanoTime()
      force(SparkEntry.queries(n)(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    val names = args.toSeq.filter(SparkEntry.queries.contains)
    // warm every query once (JIT + file listing), then interleave reps
    names.foreach { n => try timeOnce(n) catch { case _: Throwable => } }
    val sentinel = "cli_format_data"
    (1 to 3).foreach(_ => timeOnce(sentinel))
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    var sMin = Double.MaxValue
    for (_ <- 1 to reps) {
      sMin = math.min(sMin, timeOnce(sentinel))
      names.foreach { n =>
        val t = try timeOnce(n) catch { case _: Throwable => -1.0 }
        if (t >= 0) mins(n) = math.min(mins.getOrElse(n, Double.MaxValue), t)
      }
    }
    println(f"[minbench] sentinel-min $sMin%.3f reps $reps")
    names.foreach(n => println(f"[minbench] $n%-28s ${mins.getOrElse(n, -1.0)}%.3f"))
    spark.stop()
  }
}
