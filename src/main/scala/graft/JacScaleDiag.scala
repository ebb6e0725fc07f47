package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: where does the replicated-corpus Jaccard time go? Prints the
  * shingle document-frequency distribution and the PPJoin candidate volume
  * (Σ_h prefixCnt(h)²) at 1× and REP× — the quantity the equi-join must
  * enumerate before the length/positional filters. */
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
    val docsN = docs1.crossJoin(broadcast(reps))
      .select((col("doc_id") + col("r") * 1000000L).as("doc_id"),
        regexp_replace(col("text"), lit(" "), concat(lit(" r"), col("r"), lit(" ")))
          .as("text"))
    for ((tag, df) <- Seq("1x" -> docs1, s"${rep}x" -> docsN)) {
      val d = df.select(col("doc_id"),
        graft.ext.Dedup.shingles(col("text"), 3).as("sh"))
      val inv = d.select(col("doc_id"), size(col("sh")).as("n"),
          explode(col("sh")).as("s"))
        .withColumn("h", xxhash64(col("s")))
      val dfreq = inv.groupBy("h").agg(count(lit(1)).as("df"))
      val stats = dfreq.agg(count(lit(1)).as("shingles"), max(col("df")).as("maxDf"),
        expr("approx_percentile(df, array(0.5, 0.99, 0.999))").as("p")).head()
      println(s"[diag $tag] distinct shingles=${stats.getLong(0)} maxDf=${stats.getLong(1)} p50/p99/p999=${stats.getSeq[Double](2)}")
      // prefix rows (the actual join input) and candidate volume
      import org.apache.spark.sql.expressions.Window
      val pos = row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"), col("s")))
      val prefix = inv.join(dfreq, "h")
        .select(col("doc_id"), col("n"), col("h"), pos.as("pos"))
        .where(col("pos") <= (col("n") - ceil(lit(0.5) * col("n") - 1e-9) + 1).cast("int"))
      val vol = prefix.groupBy("h").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("vol"), max(col("c")).as("maxPrefixCnt"),
          count(lit(1)).as("distinctPrefixShingles")).head()
      println(s"[diag $tag] prefixRows=${prefix.count()} candidateVolume=${vol.getLong(0)} maxPrefixCnt=${vol.getLong(1)} distinctPrefixShingles=${vol.getLong(2)}")
    }
    spark.stop()
  }
}
