package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: where does the replicated-corpus Jaccard time go? Prints the
  * SHIPPED pre-flight estimate ([[graft.ext.Dedup.jaccardPreflight]]:
  * corpus shape + candidate volume, the quantity the equi-join must
  * enumerate) at 1× and REP×, for both the diversity-preserving and the
  * shingle-space-collapsing replica constructions — one counting
  * convention with the estimator users run. */
object JacScaleDiag {
  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs1 = SparkEntry.table(spark, sfDir, "documents").select("doc_id", "text")
    val reps = spark.range(rep).select(col("id").as("r"))
    val linear = docs1.crossJoin(broadcast(reps))
      .select((col("doc_id") + col("r") * 1000000L).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1_r"), col("r")))
          .as("text"))
    val skew = docs1.crossJoin(broadcast(reps))
      .select((col("doc_id") + col("r") * 1000000L).as("doc_id"),
        regexp_replace(col("text"), lit(" "), concat(lit(" r"), col("r"), lit(" ")))
          .as("text"))
    for ((tag, df) <- Seq("1x" -> docs1, s"linear_${rep}x" -> linear,
                          s"skew_${rep}x" -> skew)) {
      val row = graft.ext.Dedup.jaccardPreflight(df).head()
      println(s"[diag $tag] " + row.schema.fieldNames.zip(row.toSeq)
        .map { case (n, v) => s"$n=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
