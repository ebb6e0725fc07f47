package graft.probes

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Counts duplicated heavy-expression evaluations in the fused bitext
  * miner's FINAL plan (diagnostic for the r16 floor work). */
object BitextPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = SparkEntry.table(spark, dir, "embeddings")
    val df = graft.ext.Similarity.bitextMine(
      emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 === 1), 4, 1.0)
    // replica of the final stage, as BitextProbe times it
    import spark.implicits._
    val srcRows = emb.where(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
      .where(col("vec_id").isNotNull && col("embedding").isNotNull)
      .orderBy("vec_id").collect()
    val sids = srcRows.map(_.getLong(0))
    val mat = srcRows.map(_.getSeq[Float](1).toArray)
    val tgt = emb.where(col("vec_id") % 2 === 1)
    val perTgt = tgt.select(col("vec_id").as("tid"),
      graft.functions.matrix.cosineSimsAll(col("embedding"), mat).as("cosv"))
    val bwdProj = perTgt
      .select(col("tid"),
        graft.functions.matrix.argTopKLit(col("cosv"), sids, 4).as("nb"))
      .select(col("tid").as("tgt_id"),
        get(col("nb"), lit(0)).getField("id").as("src_id"),
        when(size(col("nb")) > 0,
          aggregate(col("nb"), lit(0.0),
            (acc, s) => acc + s.getField("score")) / size(col("nb")))
          .as("avg_tgt"))
    val fwdLocal = sids.indices.map(i =>
      (sids(i), sids(i) + 1, 0.5, 0.5)).toDF("f_src", "f_tgt", "sim", "avg_src")
    val rep = bwdProj.join(broadcast(fwdLocal),
      col("src_id") === col("f_src") && col("tgt_id") === col("f_tgt"))
    val pr = rep.queryExecution.executedPlan.toString
    def cntR(m: String) = m.r.findAllIn(pr).size
    println(s"[replica] cosine_sims_all=${cntR("cosine_sims_all")} arg_top_k_lit=${cntR("arg_top_k_lit")} srcRows=${srcRows.length} fwdLocal=${fwdLocal.count()} bwdProj=${bwdProj.count()} rep=${rep.count()}")
    println(pr.linesIterator.map(_.take(150)).mkString("\n").take(2500))
    val p = df.queryExecution.executedPlan.toString
    def cnt(m: String) = m.r.findAllIn(p).size
    println(s"[plan] cosine_sims_all=${cnt("cosine_sims_all")} arg_top_k_lit=${cnt("arg_top_k_lit")} aggregate_hof=${cnt("aggregate\\(")}")
    println(p.linesIterator.map(_.take(160)).mkString("\n").take(4000))
    spark.stop()
  }
}
