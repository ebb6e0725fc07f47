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
    }
    spark.stop()
  }
}
