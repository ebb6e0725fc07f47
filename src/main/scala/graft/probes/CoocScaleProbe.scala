package graft.probes

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Substantiates the r16 COVERAGE claim that item_cooc's 30x super-linear
  * reading is the FIXED-parallelism sort/spill regime, not operator
  * growth: the same 30x corpus re-run with shuffle partitions scaled to
  * the data (Tuning.suggestShufflePartitions) should restore ~linear
  * wall time. Usage: runMain graft.probes.CoocScaleProbe [rep] */
object CoocScaleProbe {
  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 30
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = spark.range(rep).select(col("id").as("r"))
    val li1 = SparkEntry.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i")).cache()
    val liN = li1.crossJoin(broadcast(reps))
      .select((col("b") + col("r") * 100000000L).as("b"),
        (col("i") + col("r") * 10000000L).as("i")).cache()
    li1.count(); liN.count()
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      val h = xxhash64(df.columns.map(c => col(c).cast("string")): _*)
      df.select(h.as("__h")).agg(count(lit(1)).as("n"), expr("bit_xor(__h)"))
        .head().getLong(0)
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[cooc] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
    }
    force(graft.ext.Assoc.itemCooc(li1, col("b"), col("i"))) // warm
    time("1x @32 partitions") { force(graft.ext.Assoc.itemCooc(li1, col("b"), col("i"))) }
    time(s"${rep}x @32 partitions") { force(graft.ext.Assoc.itemCooc(liN, col("b"), col("i"))) }
    for (parts <- Seq(128, 256)) {
      time(s"${rep}x @$parts partitions") {
        force(graft.ext.ConfScope(
          graft.ext.Assoc.itemCooc(liN, col("b"), col("i")),
          "spark.sql.shuffle.partitions" -> parts.toString))
      }
    }
    spark.stop()
  }
}
