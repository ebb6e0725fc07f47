package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Behavioral analytics over the event stream — the two bread-and-butter
  * product queries every warehouse runs daily, expressed with the same
  * exactness discipline as the rest of the engine:
  *
  *  - [[funnel]]: ORDERED-subsequence conversion counts ("of everyone who
  *    viewed, who then clicked, who then purchased — in that order") via a
  *    per-user fold over the time-ordered event sequence;
  *  - [[retention]]: cohort × offset activity grid ("of users first seen
  *    in week w, how many were active in week w+k").
  *
  * Scale shape: both are one co-partitioning shuffle on the user key plus
  * a tiny final aggregate — the per-user state is a single integer
  * (funnel: matched-prefix length) or a first-seen bucket (retention);
  * nothing is ever row-multiplied. */
object Behavior {
  private type Q = (SparkSession, String) => DataFrame

  /** Users reaching each funnel step: `steps` must be matched as an
    * ordered (not necessarily contiguous) subsequence of the user's
    * time-ordered events. Returns one row per step with the surviving
    * user count — the classic conversion table. */
  def funnel(events: DataFrame, steps: Seq[String], userCol: String = "user_id",
             tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // deterministic per-user order: (ts, type) structs sorted in the agg
    val matched = events
      .select(col(userCol).as("u"), col(tsCol).as("t"), col(typeCol).as("e"))
      .groupBy("u")
      .agg(array_sort(collect_list(struct(col("t"), col("e")))).as("seq"))
      .select(col("u"),
        aggregate(col("seq"), lit(0),
          (acc, x) => when(acc < steps.size &&
              x.getField("e") === element_at(typedLit(steps), acc + 1), acc + 1)
            .otherwise(acc)).as("depth"))
    val counts = matched.groupBy("depth").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // survivors at step k = users with depth >= k (cumulative from the top)
    steps.indices.map { i =>
      val k = i + 1
      (k.toLong, steps(i), counts.filter(_._1 >= k).values.sum)
    }.toDF("step", "event_type", "n_users")
  }

  /** Cohort retention grid: users bucketed by FIRST-activity period,
    * counted distinct in each later period they return. `grainSeconds`
    * sets the period (default weekly). */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts",
                grainSeconds: Long = 7L * 24 * 3600): DataFrame = {
    val g = grainSeconds * 1000000L
    val act = events.select(col(userCol).as("u"),
        floor(unix_micros(col(tsCol)) / g).as("p")).distinct()
    val first = act.groupBy("u").agg(min(col("p")).as("cohort"))
    act.join(first, "u")
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  val queries: Map[String, Q] = Map(
    "funnel" -> ((s, dir) =>
      funnel(SparkEntry.table(s, dir, "events"), Seq("view", "click", "purchase"))),
    "retention" -> ((s, dir) =>
      retention(SparkEntry.table(s, dir, "events"), grainSeconds = 24 * 3600)),
  )

  val oracleSql: Map[String, String] = Map(
    // the same subsequence fold over the same (ts, type)-ordered list
    "funnel" ->
      """WITH seqs AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_type) AS es
        |  FROM events GROUP BY user_id),
        |st(step, name) AS (VALUES (1, 'view'), (2, 'click'), (3, 'purchase')),
        |depth AS (
        |  -- the fold accumulator rides as a VARCHAR digit (DuckDB
        |  -- list_reduce folds homogeneously-typed lists)
        |  SELECT user_id, CAST(list_reduce(list_prepend('0', es), (acc, x) ->
        |    CASE WHEN acc = '0' AND x = 'view' THEN '1'
        |         WHEN acc = '1' AND x = 'click' THEN '2'
        |         WHEN acc = '2' AND x = 'purchase' THEN '3'
        |         ELSE acc END) AS INT) AS d
        |  FROM seqs)
        |SELECT CAST(st.step AS BIGINT) AS step, st.name AS event_type,
        |  (SELECT count(*) FROM depth WHERE d >= st.step) AS n_users
        |FROM st""".stripMargin,
    "retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS p FROM events),
        |f AS (SELECT u, min(p) AS cohort FROM act GROUP BY u)
        |SELECT f.cohort, act.p - f.cohort AS "offset",
        |  count(DISTINCT act.u) AS n_users
        |FROM act JOIN f ON act.u = f.u
        |GROUP BY 1, 2""".stripMargin,
  )
}
