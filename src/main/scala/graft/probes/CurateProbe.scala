package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off end-to-end timing for the curate_full gate query at sf0.1. */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(): Unit = {
      val df = SparkEntry.queries("curate_full")(spark, sfDir)
      df.select(xxhash64(df.columns.map(col): _*).as("h")).agg(expr("bit_xor(h)")).head()
    }
    force() // warm-up
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); force(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[curateprobe] curate_full median=${times.sorted.apply(1)}%.2f s (all: ${times.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
