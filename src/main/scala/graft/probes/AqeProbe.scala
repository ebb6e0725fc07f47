package graft.probes

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: floor-ledger gate queries with and without AQE (ConfScope-scoped) —
  * for bounded-exchange plans the adaptive per-stage materialization only
  * multiplies job rounds (the ann_lsh/quality_ensemble finding). */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("mrl_recall", "asof_join", "rollup_agg", "retrieval_rrf",
      "bm25_topk", "source_overlap", "item_cooc")
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      val h = xxhash64(df.columns.map(c => col(c).cast("string")): _*)
      df.select(h.as("__h")).agg(count(lit(1)), expr("bit_xor(__h)")).head()
    }
    for (n <- names) {
      def base() = SparkEntry.queries(n)(spark, dir)
      def off() = graft.ext.ConfScope(base(), "spark.sql.adaptive.enabled" -> "false")
      force(base()); force(off()) // warm
      def t(mk: () => org.apache.spark.sql.DataFrame): Double =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime(); force(mk()); (System.nanoTime() - t0) / 1e9
        }.min
      println(f"[aqe] $n%-16s on=${t(() => base())}%.3f off=${t(() => off())}%.3f")
    }
    spark.stop()
  }
}
