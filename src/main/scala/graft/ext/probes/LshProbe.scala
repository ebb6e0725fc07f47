package graft.ext.probes

import graft.{SparkEntry, SessionTuning}
import graft.ext.Similarity
import graft.functions.{topk, vectors}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the r16 annLsh dedup rewrite: times the production
  * first-shared-table-predicate form against an inline replica of the r15
  * distinct() form on the same session and corpus, and prints both plans'
  * shuffle counts. Diagnostic main, not part of the library surface
  * (package graft.ext.probes so the replica can reuse the private[ext]
  * hyperplane/quantization helpers verbatim).
  * Usage: runMain graft.ext.probes.LshProbe [sfDir] [reps]
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = SparkEntry.table(spark, sfDir, "embeddings")
    val queries = emb.where(col("vec_id") < 10)

    // inline replica of the r15 distinct() form (Similarity.scala@r15)
    def lshDistinct(): DataFrame = {
      val planes = Similarity.hyperplanes(64, 4, 8, 42L)
      def lshBucket(e: Column, hs: Seq[Seq[Float]]): Column =
        hs.zipWithIndex.map { case (h, j) =>
          when(Similarity.quantSim(vectors.cosineSim(e, typedLit(h))) >= 0,
            lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
      def buckets(df: DataFrame, idAs: String, embAs: String): DataFrame =
        df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
          posexplode(array(planes.map(tp => lshBucket(col("embedding"), tp)): _*))
            .as(Seq("t", "bucket")))
      val data = buckets(emb, "vec_id", "embedding")
      val q = broadcast(buckets(queries, "query_id", "qe"))
      val sims = data.join(q, Seq("t", "bucket"))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          vectors.cosineSim(col("qe"), col("embedding")).as("sim"))
        .distinct()
      sims.groupBy("query_id")
        .agg(topk.topK(5)(col("vec_id"), col("sim")).as("nb"))
        .select(col("query_id"), posexplode(col("nb")).as(Seq("pos", "s")))
        .select(col("query_id"), col("s.id").as("neighbor_id"),
          (col("pos") + 1).as("rank"), col("s.score").as("sim"))
    }
    def lshPred(): DataFrame =
      Similarity.annLsh(emb, queries, k = 5, tables = 4, bits = 8,
        seed = 42L, dim = Some(64))

    def time(label: String, mk: () => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-10s min=${times.min}%.3f median=${times.sorted.apply(reps / 2)}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    def shuffles(df: DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }.size
    println(s"shuffles: distinct=${shuffles(lshDistinct())} pred=${shuffles(lshPred())}")
    // warm both
    lshDistinct().collect(); lshPred().collect()
    time("distinct", () => lshDistinct())
    time("pred", () => lshPred())
    def lshNoAqe(): org.apache.spark.sql.DataFrame =
      graft.ext.ConfScope(lshPred(), "spark.sql.adaptive.enabled" -> "false")
    lshNoAqe().collect()
    time("pred_noaqe", () => lshNoAqe())
    spark.stop()
  }
}

