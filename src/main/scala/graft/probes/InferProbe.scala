package graft.probes

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: the dedup/simhash gate queries with and without the two
  * redundant-inference optimizer rules (InferFiltersFromGenerate /
  * InferFiltersFromConstraints) whose inferred filters inline heavy
  * natives below their defining Project (the r16 trap). */
object InferProbe {
  private val Excluded =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate," +
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints"

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("leakage_split", "dedup_incremental", "dedup_jaccard_pairs")
    def force(name: String): Long = {
      val df = SparkEntry.queries(name)(spark, dir)
      val h = xxhash64(df.columns.map(c => col(c).cast("string")): _*)
      df.select(h.as("__h")).agg(count(lit(1)), expr("bit_xor(__h)")).head().getLong(0)
    }
    def run(label: String): Unit = names.foreach { n =>
      force(n) // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); force(n); (System.nanoTime() - t0) / 1e9 }
      println(f"[$label] $n%-22s min=${ts.min}%.3f median=${ts.sorted.apply(reps / 2)}%.3f")
    }
    run("baseline")
    spark.conf.set("spark.sql.optimizer.excludedRules", Excluded)
    run("excluded")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      Excluded + ",org.apache.spark.sql.catalyst.optimizer.PushDownPredicates")
    run("nopush")
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    spark.stop()
  }
}
