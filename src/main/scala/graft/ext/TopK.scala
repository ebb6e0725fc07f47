package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Generic distributed top-k per group — the primitive behind the ANN,
  * retrieval, and sampling operators, exposed directly ("top 3 pages per
  * domain", "5 most expensive orders per region", …).
  *
  * Two correct strategies at scale, both offered:
  *
  *  - [[groupTopK]] (partial aggregation): every input partition reduces
  *    to ≤ k rows per group BEFORE the shuffle through [[TopKAgg]] —
  *    the right shape for FEW groups × huge rows-per-group, where a
  *    window would funnel each group through one task after exchanging
  *    the full table.
  *  - [[groupTopKWindow]] (`row_number` + Spark 4's rank-limit pushdown,
  *    the [[Retrieval.bm25]] shape): a `WindowGroupLimit` below the
  *    exchange bounds each task's output to k per group — the right
  *    shape when groups are MANY (group cardinality ~ rows), where an
  *    ObjectHashAggregate buffer per group would dominate memory.
  *
  * Identical results by construction (ties: score desc, id asc — pinned
  * by spec and by the shared driver gate). */
object TopK {
  private type Q = (SparkSession, String) => DataFrame

  def groupTopK(df: DataFrame, groupCols: Seq[String], id: Column, score: Column,
                k: Int): DataFrame = {
    val agg = graft.functions.topk.topK(k)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(id.cast("long"), score.cast("double")).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__s")): _*)
      .select(groupCols.map(col) ++ Seq(col("__s.id").as("id"),
        (col("__pos") + 1).cast("long").as("rank"),
        col("__s.score").as("score")): _*)
  }

  def groupTopKWindow(df: DataFrame, groupCols: Seq[String], id: Column, score: Column,
                      k: Int): DataFrame = {
    val base = df.select(groupCols.map(col) ++ Seq(id.cast("long").as("id"),
      score.cast("double").as("score")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("score").desc, col("id").asc)
    base
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(groupCols.map(col) ++ Seq(col("id"), col("rank"), col("score")): _*)
  }

  val queries: Map[String, Q] = Map(
    // 3 highest-value events per type; integer-cents score so the driver
    // compare is float-free
    "group_topk" -> ((s, dir) =>
      groupTopK(
        SparkEntry.table(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents")),
        Seq("event_type"), col("event_id"), col("cents"), k = 3)
        .select(col("event_type"), col("id").as("event_id"), col("rank"),
          col("score").cast("long").as("cents"))),
  )

  val oracleSql: Map[String, String] = Map(
    "group_topk" ->
      """WITH s AS (
        |  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id) AS rank
        |  FROM events)
        |SELECT event_type, event_id, CAST(rank AS BIGINT) AS rank, cents
        |FROM s WHERE rank <= 3""".stripMargin,
  )
}
