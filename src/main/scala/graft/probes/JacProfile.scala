package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for dedup_jaccard_pairs stage decomposition
  * (not part of the driver contract; see Bench for the real gate). */
object JacProfile {
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jac] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val docs = SparkEntry.table(spark, sfDir, "documents")
    // warm-up: full query once
    time("full (warm-up)") {
      ext.Dedup.jaccardPairs(docs).agg(count(lit(1))).head()
    }
    for (_ <- 1 to 2) {
      time("full") {
        ext.Dedup.jaccardPairs(docs).agg(count(lit(1))).head()
      }
      // decomposition mirrors the hash-keyed internals of Dedup.jaccardPairs
      val d = docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), ext.Dedup.shingles(col("text"), 3).as("sh"))
      time("shingles only") { d.agg(count(lit(1)), sum(size(col("sh")))).head() }
      val inv = d.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
        .withColumn("h", xxhash64(col("s")))
      time("explode only") { inv.agg(count(lit(1))).head() }
      val dfreq = inv.groupBy("h").agg(count(lit(1)).as("df"))
      time("dfreq agg") { dfreq.agg(count(lit(1))).head() }
      val pos = row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("h"), col("s")))
      val prefix = inv.join(dfreq, "h")
        .select(col("doc_id"), col("n"), col("h"), pos.as("pos"))
        .where(col("pos") <= (col("n") - ceil(lit(0.5) * col("n") - 1e-9) + 1).cast("int"))
      time("prefix (idx+join+window)") { prefix.agg(count(lit(1))).head() }
      val cand = prefix.as("x").join(prefix.as("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct()
      time("prefix + cand join") { cand.agg(count(lit(1))).head() }
      val verified = cand
        .join(d.as("da"), col("id_a") === col("da.doc_id"))
        .join(d.as("db"), col("id_b") === col("db.doc_id"))
        .select(size(array_intersect(col("da.sh"), col("db.sh"))).as("inter"))
      time("cand + verify joins") { verified.agg(count(lit(1))).head() }
      // B variant: prefix via hash-agg collect_list + array_sort + slice
      // (no window sort; only prefix rows leave the aggregation)
      val prefixB = inv.join(dfreq, "h")
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("df"), col("h"), col("s")))).as("ord"))
        .select(col("doc_id"), size(col("ord")).as("n"),
          posexplode(slice(col("ord"), lit(1),
            (size(col("ord")) - ceil(lit(0.5) * size(col("ord")) - 1e-9) + 1).cast("int")))
            .as(Seq("p0", "e")))
        .select(col("doc_id"), col("n"), col("e.h").as("h"), (col("p0") + 1).as("pos"))
      time("prefixB (agg+sort+slice)") { prefixB.agg(count(lit(1))).head() }
      val candB = prefixB.as("x").join(prefixB.as("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct()
      time("prefixB + cand join") { candB.agg(count(lit(1))).head() }
    }
    spark.stop()
  }
}
