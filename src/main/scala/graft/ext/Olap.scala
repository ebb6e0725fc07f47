package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Multi-level aggregation operators — ROLLUP / CUBE / GROUPING SETS. One
  * pass over the fact table produces every subtotal level; the alternative
  * (a UNION ALL of per-level aggregations) re-scans the input once per
  * level, which at 100 TB is the difference between one scan and four.
  *
  * Spark plans these as a single `Expand` (each row replicated once per
  * grouping set, with non-grouped keys nulled) feeding ONE hash aggregate —
  * partial aggregation still applies, so the exchange carries one row per
  * (grouping set × key) per partition, not the fact rows. Grouped keys that
  * are nulled-out by Expand are disambiguated with `grouping()`, and the
  * gate queries coalesce them to an 'ALL' sentinel so the cross-engine
  * compare never depends on NULL-sort order. */
object Olap {
  private type Q = (SparkSession, String) => DataFrame

  /** 'ALL' sentinel for a grouping-set-nulled key (`grouping()` is only
    * legal inside the aggregate clause, so the flags are aggregated and the
    * sentinel applied in the follow-up projection). */
  private def lvl(c: String): org.apache.spark.sql.Column =
    when(col(s"__g_$c") === 1, lit("ALL")).otherwise(col(c)).as(c)

  val queries: Map[String, Q] = Map(
    // hierarchy subtotals: (flag, status), (flag), () — one scan, one agg.
    // Money sums in exact integer cents; quantities are integer-valued
    // doubles (≤2^53: double addition is exact in any order).
    "rollup_agg" -> ((s, dir) =>
      SparkEntry.table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).as("__g_l_returnflag"),
          grouping(col("l_linestatus")).as("__g_l_linestatus"),
          count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_cents"))
        .select(lvl("l_returnflag"), lvl("l_linestatus"),
          col("n"), col("sum_qty"), col("sum_cents"))),
    // full cross-classification: all four subtotal levels in one pass
    "cube_agg" -> ((s, dir) =>
      SparkEntry.table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).as("__g_o_orderstatus"),
          grouping(col("o_orderpriority")).as("__g_o_orderpriority"),
          count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
        .select(lvl("o_orderstatus"), lvl("o_orderpriority"),
          col("n"), col("sum_cents"))),
    // explicit GROUPING SETS: per-type totals and per-day totals in one
    // scan (the disjoint-dimensions case where rollup/cube over-produce)
    "grouping_sets_agg" -> ((s, dir) => {
      SparkEntry.table(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).cast("string").as("day"),
          col("value"))
        .createOrReplaceTempView("__gs_events")
      s.sql(
        """SELECT CASE WHEN grouping(event_type) = 1 THEN 'ALL' ELSE event_type END AS event_type,
          |       CASE WHEN grouping(day) = 1 THEN 'ALL' ELSE day END AS day,
          |       count(*) AS n,
          |       sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents
          |FROM __gs_events
          |GROUP BY GROUPING SETS ((event_type), (day))""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "rollup_agg" ->
      """SELECT
        |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS l_returnflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS l_linestatus,
        |  count(*) AS n, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "cube_agg" ->
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "grouping_sets_agg" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, value FROM events)
        |SELECT
        |  CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS event_type,
        |  CASE WHEN GROUPING(day) = 1 THEN 'ALL' ELSE day END AS day,
        |  count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM e GROUP BY GROUPING SETS ((event_type), (day))""".stripMargin,
  )
}
