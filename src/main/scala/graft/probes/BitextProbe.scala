package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.functions.{topk, vectors}

/** Stage-by-stage timing of the bitext_mine pipeline (VERDICT r14 #1:
  * the 8.4× local constant) — which leg pays: the cross-join + cosine,
  * the explode + top-k aggregation, or the checkpoint + mutual join? */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = SparkEntry.table(spark, dir, "embeddings")
    val src = emb.where(col("vec_id") % 2 === 0)
    val tgt = emb.where(col("vec_id") % 2 === 1)
    val k = 4

    val q = broadcast(src.select(col("vec_id").as("sid"), col("embedding").as("se")))
    def sims: DataFrame = tgt.select(col("vec_id").as("tid"), col("embedding").as("te"))
      .crossJoin(q)
      .select(col("sid"), col("tid"),
        vectors.cosineSim(col("se"), col("te")).as("sim"))

    // warm-up everything once
    time("warmup full")(graft.ext.Similarity.queries("bitext_mine")(spark, dir).count())

    (1 to 3).foreach { _ =>
      time("sims count only")(sims.select(sum(col("sim"))).head())
      time("fwd-only topk agg")(
        sims.groupBy("sid").agg(topk.topK(k)(col("tid"), col("sim")).as("nb")).count())
      val tk = sims
        .select(explode(array(
          struct(lit(0).as("side"), col("sid").as("key"), col("tid").as("other")),
          struct(lit(1).as("side"), col("tid").as("key"), col("sid").as("other"))))
          .as("x"), col("sim"))
        .groupBy(col("x.side").as("side"), col("x.key").as("key"))
        .agg(topk.topK(k)(col("x.other"), col("sim")).as("nb"))
      // count() PRUNES the top-k column — collect() is the honest cost.
      // Fresh DataFrame per action: a shared queryExecution would reuse
      // the computed shuffle stage and under-report.
      def freshTk = sims
        .select(explode(array(
          struct(lit(0).as("side"), col("sid").as("key"), col("tid").as("other")),
          struct(lit(1).as("side"), col("tid").as("key"), col("sid").as("other"))))
          .as("x"), col("sim"))
        .groupBy(col("x.side").as("side"), col("x.key").as("key"))
        .agg(topk.topK(k)(col("x.other"), col("sim")).as("nb"))
      time("dual agg collect (honest)")(freshTk.collect().length)
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      time("dual agg collect thr=4M")(freshTk.collect().length)
      time("localCheckpoint thr=4M")(freshTk.localCheckpoint().count())
      time("full bitext thr=4M")(
        graft.ext.Similarity.queries("bitext_mine")(spark, dir).count())
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      time("full bitext thr=128")(
        graft.ext.Similarity.queries("bitext_mine")(spark, dir).count())
    }
    spark.stop()
  }
}
