package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing probe for batched BPE training (round-9 verdict #2):
  * the synthetic corpus has only 31 distinct words, so BPE saturates at
  * ~90 merges — enrich the vocabulary with per-replica word suffixes
  * (the ScaleProbe linear-control construction) to exercise a realistic
  * merge count, then time trainBpe to the requested vocabulary size. */
object VocabProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 512
    val bs = if (args.length > 1) args(1).toInt else 128
    val rep = if (args.length > 2) args(2).toInt else 50
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs1 = SparkEntry.table(spark, sfDir, "documents").select("doc_id", "text")
    val reps = spark.range(rep).select(col("id").as("r"))
    val docsN = docs1.crossJoin(broadcast(reps))
      .select((col("doc_id") + col("r") * 1000000L).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1_r"), col("r")))
          .as("text"))
    val t0 = System.nanoTime()
    val m = graft.ext.Vocab.trainBpe(docsN, nMerges = n, batchSize = bs)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[vocabprobe] merges=${m.size} batchSize=$bs rep=$rep sec=$sec%.1f")
    // encode A/B: the Zipf word memo vs the per-token merge loop (cold
    // caches both sides — the corpus is materialized, the first timed
    // pass is uncached, then a FRESH cache pays its own misses)
    val corpus = docsN.cache(); corpus.count()
    def timeEnc(label: String, cached: Boolean): Unit = {
      val t = System.nanoTime()
      val cnt = graft.ext.Vocab.encode(corpus, m, cached = cached)
        .select(org.apache.spark.sql.functions.sum(size(col("bpe_tokens"))))
        .head().getLong(0)
      println(f"[vocabprobe] encode($label) sec=${(System.nanoTime() - t) / 1e9}%.1f tokens=$cnt")
    }
    timeEnc("uncached", cached = false)
    timeEnc("cached", cached = true)
    spark.stop()
  }
}
