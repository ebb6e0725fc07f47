package graft.probes

import graft.SparkEntry

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch row-count shape probe for the PPJoin pipeline at the bench SF
  * (not part of the driver contract). */
object JacShape {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = SparkEntry.table(spark, sfDir, "documents")
    val d = docs.repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), graft.ext.Dedup.shingles(col("text"), 3).as("sh"))
    val inv = d.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      .withColumn("h", xxhash64(col("s")))
    println(s"[shape] docs          = ${docs.count()}")
    println(s"[shape] inv rows      = ${inv.count()}")
    println(s"[shape] distinct h    = ${inv.select("h").distinct().count()}")
    val dfreq = inv.groupBy("h").agg(count(lit(1)).as("df"))
    println(s"[shape] max df        = ${dfreq.agg(max("df")).head().getLong(0)}")
    val pos = row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        .orderBy(col("df"), col("h"), col("s")))
    val prefix = inv.join(dfreq, "h")
      .select(col("doc_id"), col("n"), col("h"), pos.as("pos"))
      .where(col("pos") <= (col("n") - ceil(lit(0.5) * col("n") - 1e-9) + 1).cast("int"))
    println(s"[shape] prefix rows   = ${prefix.count()}")
    val candRaw = prefix.as("x").join(prefix.as("y"),
      col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
    println(s"[shape] cand raw      = ${candRaw.count()}")
    println(s"[shape] cand distinct = ${candRaw.select(col("x.doc_id"), col("y.doc_id")).distinct().count()}")
    spark.stop()
  }
}
