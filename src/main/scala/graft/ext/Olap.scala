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

  /** A rollup measure: `base` aggregates the fact table at the finest
    * grouping; `merge` re-aggregates the already-aggregated alias at
    * coarser levels (must be associative over `base`'s outputs). */
  final case class Measure(alias: String, base: org.apache.spark.sql.Column,
                           merge: String => org.apache.spark.sql.Column)
  object Measure {
    /** sum measures merge by summing the partial sums (NULL over zero
      * rows — native rollup's SUM semantics on an empty table). */
    def summed(alias: String, base: org.apache.spark.sql.Column): Measure =
      Measure(alias, base, a => sum(col(a)).as(a))
    /** COUNT-like measures also merge by summing, but coalesce to 0: the
      * native `.rollup` this operator is a drop-in for emits a grand-total
      * row with count 0 on an EMPTY fact table, and a bare sum() over the
      * empty base table would surface that count as NULL (ADVICE r13 #4). */
    def counted(alias: String, base: org.apache.spark.sql.Column): Measure =
      Measure(alias, base, a => coalesce(sum(col(a)), lit(0L)).as(a))
  }

  /** TWO-PHASE ROLLUP for low-cardinality hierarchies: aggregate the fact
    * table ONCE at the finest grouping, then re-aggregate the (tiny)
    * group table per level and union — emitting the same key columns and
    * `__g_<key>` grouping flags as the native `.rollup` + `grouping()`
    * shape, so consumers are drop-in.
    *
    * Why not Spark's native rollup: its `Expand` replicates EVERY fact
    * row once per grouping set BEFORE partial aggregation — (levels+1)×
    * the map-side stream. When the hierarchy is bounded (flags, statuses,
    * categories — |groups| ≪ rows), that replication dominates the whole
    * query; here the fact table is streamed once, and the per-level
    * re-aggregations run over |groups| rows (measured on the 600k-row
    * gate: 0.49 → 0.30 s; at 100 TB the saved 2× scan-stream replication
    * is the difference that matters). The native one-pass Expand remains
    * the right shape when group cardinality approaches row count — both
    * are available; this one is the default for the gate's hierarchy.
    * Every merge must be associative over the base outputs (counts and
    * sums are; exact quantity doubles stay ≤2^53-integer-exact under
    * re-summation). */
  def twoPhaseRollup(df: DataFrame, keys: Seq[String],
                     measures: Seq[Measure]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "need keys and measures")
    val baseAggs = measures.map(m => m.base.as(m.alias))
    val base = df.groupBy(keys.map(col): _*).agg(baseAggs.head, baseAggs.tail: _*)
    val keyType = base.schema.fields.map(f => f.name -> f.dataType).toMap
    def level(keptCount: Int): DataFrame = {
      val kept = keys.take(keptCount)
      val src =
        if (keptCount == keys.length) base // finest level IS the base table
        else {
          val merges = measures.map(m => m.merge(m.alias))
          // grand total as a GROUPED agg on a constant, not a global agg:
          // native .rollup computes it as a grouping-id group, so an EMPTY
          // fact table yields NO rows at every level — a global agg would
          // fabricate a grand-total row with NULL merges (ADVICE r13 #4)
          if (kept.isEmpty)
            base.groupBy(lit(1).as("__all")).agg(merges.head, merges.tail: _*)
          else base.groupBy(kept.map(col): _*).agg(merges.head, merges.tail: _*)
        }
      src.select(keys.map(k =>
          if (kept.contains(k)) col(k)
          else lit(null).cast(keyType(k)).as(k)) ++
        keys.map(k => lit(if (kept.contains(k)) 0 else 1).as(s"__g_$k")) ++
        measures.map(m => col(m.alias)): _*)
    }
    (keys.length to 0 by -1).map(level).reduce(_ unionByName _)
  }

  val queries: Map[String, Q] = Map(
    // hierarchy subtotals: (flag, status), (flag), () — the two-phase
    // shape: ONE un-replicated fact scan + re-aggregation of the tiny
    // group table (see [[twoPhaseRollup]]). Money sums in exact integer
    // cents; quantities are integer-valued doubles (≤2^53: double
    // addition is exact in any order, including re-summation).
    "rollup_agg" -> ((s, dir) =>
      twoPhaseRollup(SparkEntry.table(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        Seq(Measure.counted("n", count(lit(1))),
          Measure.summed("sum_qty", sum(col("l_quantity"))),
          Measure.summed("sum_cents",
            sum(round(col("l_extendedprice") * 100).cast("long")))))
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
