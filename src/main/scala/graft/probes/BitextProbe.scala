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
      val srcRows = time("src collect")(
        src.select(col("vec_id"), col("embedding")).orderBy("vec_id").collect())
      val sids = srcRows.map(_.getLong(0))
      val mat = srcRows.map(_.getSeq[Float](1).toArray)
      def perTgt = tgt.select(col("vec_id").as("tid"),
        graft.functions.matrix.cosineSimsAll(col("embedding"), mat).as("cosv"))
      time("cosv scan only")(perTgt.select(sum(size(col("cosv")))).head())
      time("bwd per-row topk")(perTgt.select(col("tid"),
        graft.functions.matrix.argTopKLit(col("cosv"), sids, k).as("nb")).count())
      time("fwd global multitopk")(perTgt.agg(
        graft.functions.topk.multiTopK(k, sids.length)(col("tid"), col("cosv")).as("legs")).count())
      time("full fused bitext_mine")(
        graft.ext.Similarity.queries("bitext_mine")(spark, dir).count())
      // split the full call: construction (src collect + fwd agg, 2 jobs)
      // vs the final backward+join job — locates the unaccounted tail
      val dfc = time("construct (collect+fwd)")(
        graft.ext.Similarity.bitextMine(src, tgt, k, 1.0))
      time("final bwd+join job")(dfc.count())
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"time=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%.3f s name=${si.name.take(60)}")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      time("final again (same DF)")(dfc.count())
      org.apache.spark.sql.graft.bridge.waitListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      // decompose the final job: backward scan + project, then + join
      def bwdProj = perTgt
        .select(col("tid"),
          graft.functions.matrix.argTopKLit(col("cosv"), sids, k).as("nb"))
        .select(col("tid").as("tgt_id"),
          get(col("nb"), lit(0)).getField("id").as("src_id"),
          when(size(col("nb")) > 0,
            aggregate(col("nb"), lit(0.0),
              (acc, s) => acc + s.getField("score")) / size(col("nb")))
            .as("avg_tgt"))
      time("bwd+project only")(bwdProj.count())
      import spark.implicits._
      val fwdLocal = sids.indices.map(i =>
        (sids(i), sids(i) + 1, 0.5, 0.5)).toDF("f_src", "f_tgt", "sim", "avg_src")
      time("bwd+project+join")(bwdProj
        .join(broadcast(fwdLocal),
          col("src_id") === col("f_src") && col("tgt_id") === col("f_tgt"))
        .count())
    }
    spark.stop()
  }
}
