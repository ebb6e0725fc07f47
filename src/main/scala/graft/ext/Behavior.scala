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

  /** First-order Markov transition counts: how often `to_type` directly
    * follows `from_type` in a user's time-ordered stream — the behavioral
    * transition matrix (next-event prediction baselines, journey maps).
    * One user-key window (`lead`), one tiny aggregate; exact integers. */
  def transitions(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(typeCol))
    events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Days whose per-type event volume sits more than `thresh` sample
    * standard deviations from that type's daily mean — the volume-anomaly
    * report of stream monitoring. The variance comes from the integer
    * moments (`n·Σx² − (Σx)²`), so the z-comparison is a DETERMINISTIC
    * chain: exact integer moments → one IEEE division/sqrt each —
    * bit-identical across engines, no running-mean accumulation order to
    * diverge. */
  def volumeAnomalies(events: DataFrame, thresh: Double = 2.0,
                      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    // a day with >3·10^9 events of one type overflows x² in int64 — the
    // moments accumulate in decimal(38,0) (the DuckDB oracle's HUGEINT)
    // and convert to double once, in the same places as before
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = events
      .groupBy(col(typeCol).as("t"),
        floor(unix_micros(col(tsCol)) / 86400000000L).as("day"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.groupBy("t").agg(
      count(lit(1)).as("nd"), sum(col("x")).as("sx"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
    daily.join(stats, "t")
      .where(col("nd") > 1)
      .withColumn("__var",
        (col("nd").cast(dec) * col("sxx") -
          col("sx").cast(dec) * col("sx").cast(dec)).cast("double") /
          (col("nd") * (col("nd") - 1)).cast("double"))
      .where(col("__var") > 0)
      .withColumn("z",
        (col("x").cast(dec) * col("nd").cast(dec) - col("sx").cast(dec))
          .cast("double") /
          (col("nd").cast("double") * sqrt(col("__var"))))
      .where(abs(col("z")) > thresh)
      .select(col("t").as("event_type"), col("day"), col("x").as("n_events"), col("z"))
  }

  /** PageRank over a weighted edge list (Page et al. 1999) — graph
    * centrality for the journey graphs this module builds ([[transitions]]
    * edges: which states dominate user flows) and for any (src, dst,
    * weight) relation (document link graphs, citation graphs). Classic
    * power iteration with damping `d` and uniform dangling-mass
    * redistribution.
    *
    * Scale shape: per iteration ONE join of the normalized edge list with
    * the current rank vector and one dst-keyed aggregation — the edge
    * list shuffles once up front (normalization) and is localCheckpointed
    * so iterations re-read a materialized table; rank state is a
    * DataFrame, never driver-resident. Driver state per iteration is ONE
    * scalar (the dangling mass — the [[graft.ext.Similarity]]
    * `trainCentroids` bounded-collect posture). Spec-gated, not
    * driver-gated: per-node contribution sums are float additions in
    * aggregation order, the established posture for keeping
    * order-dependent float sums out of the driver hash compare. */
  def pagerank(edges: DataFrame, d: Double = 0.85, iters: Int = 10): DataFrame = {
    require(iters >= 1 && d > 0 && d < 1, "need iters >= 1 and 0 < d < 1")
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val out = edges.groupBy("src").agg(sum(col("weight")).as("__wout"))
    val norm = edges.join(out, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("__wout")).as("__p"))
      .localCheckpoint()
    // the sink flag rides the node table so each iteration needs neither a
    // sinks join nor a separate dangling-mass DRIVER job: the dangling
    // scalar is a 1-row aggregate of the previous (checkpointed) ranks,
    // broadcast-crossed into the update — the whole iteration is ONE
    // materialized query (was 3 job rounds per iteration: collect + join
    // + checkpoint)
    val flagged = nodes
      .join(out.select(col("src").as("id"), lit(false).as("__sink")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("__sink"), lit(true)).as("__sink"))
      .localCheckpoint()
    var ranks = flagged.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val dangling = ranks.where(col("__sink"))
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dang"))
      val contrib = norm
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("__p") * col("rank")).as("__c"))
      ranks = flagged.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("__sink"),
          (lit((1 - d) / n) +
            lit(d) * (coalesce(col("__c"), lit(0.0)) +
              col("__dang") / lit(n))).as("rank"))
        .localCheckpoint()
    }
    ranks.select("id", "rank")
  }

  /** Next-event-prediction training examples — the supervised dataset
    * behind behavioral sequence models (session recommenders, churn
    * predictors, the "behavioral LM" leg of a training-data pipeline):
    * for every event with at least `k` predecessors in its user's stream,
    * emit the previous `k` event types as the context and the event's own
    * type as the label.
    *
    * One co-partitioning shuffle on the user key; the context is a
    * ROWS-frame window collect (`k preceding .. 1 preceding`) over the
    * (ts, event_id) total order — event_id makes the order unambiguous,
    * so the emitted context string is deterministic on any partitioning.
    * Per-row state is k event-type strings, independent of corpus size.
    * The context is emitted " "-joined (a training-ready string, and a
    * scalar for the cross-engine compare). */
  def nextEventExamples(events: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, "need at least one context event")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-k, -1)
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__ctx", collect_list(col("event_type")).over(w))
      .where(size(col("__ctx")) === k)
      .select(col("user_id"), col("event_id"),
        array_join(col("__ctx"), " ").as("context"),
        col("event_type").as("label"))
  }

  /** Kaplan–Meier life table for time-to-conversion (Kaplan & Meier 1958):
    * for each user with a `startType` event, the duration from their FIRST
    * start to their first subsequent `endType` event (event observed) or
    * to their last recorded event (right-censored), bucketed at
    * `grainSeconds`. Emits one row per distinct duration bucket with the
    * at-risk / event / censor counts — the exact integer table the KM
    * survival curve (and any time-to-event model calibration) is computed
    * from; emitting counts rather than the product-limit estimate keeps
    * the gate float-free.
    *
    * Scale shape: ONE user-key shuffle reused by both window passes
    * (start resolution + duration), then a duration-bucket aggregate. The
    * final at-risk cumulation is a window over DISTINCT duration buckets —
    * bounded by the calendar span divided by the grain (hours over a
    * dataset's lifetime: thousands of rows), NOT by corpus size, which is
    * what makes the unpartitioned window safe here. */
  def survivalTable(events: DataFrame, startType: String, endType: String,
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type",
                    grainSeconds: Long = 3600L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
    val per = events.select(col(userCol).as("u"),
        unix_micros(col(tsCol)).as("t"), col(typeCol).as("e"))
      .withColumn("t0", min(when(col("e") === startType, col("t"))).over(w))
      .withColumn("tend", max(col("t")).over(w))
      .where(col("t0").isNotNull)
      .withColumn("tp",
        min(when(col("e") === endType && col("t") >= col("t0"), col("t"))).over(w))
      .groupBy("u")
      .agg(min(col("t0")).as("t0"), min(col("tend")).as("tend"),
        min(col("tp")).as("tp"))
      .select(col("u"),
        when(col("tp").isNotNull, (col("tp") - col("t0")))
          .otherwise(col("tend") - col("t0")).as("dur_us"),
        col("tp").isNotNull.as("observed"))
    val buckets = per
      .groupBy((col("dur_us") / (grainSeconds * 1000000L)).cast("long").as("t"))
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("n_event"),
        sum(when(col("observed"), 0L).otherwise(1L)).as("n_censor"))
    // at-risk(t) = subjects whose duration bucket >= t: total minus the
    // exclusive running count — a window over distinct buckets only
    val wc = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val total = per.count()
    buckets.withColumn("n_risk",
        lit(total) - coalesce(sum(col("n_event") + col("n_censor")).over(wc), lit(0L)))
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censor"))
  }

  val queries: Map[String, Q] = Map(
    // hourly time-to-purchase table for the view->purchase journey
    "survival_table" -> ((s, dir) =>
      survivalTable(SparkEntry.table(s, dir, "events"), "view", "purchase")),
    "transitions" -> ((s, dir) =>
      transitions(SparkEntry.table(s, dir, "events"))),
    "next_event_examples" -> ((s, dir) =>
      nextEventExamples(SparkEntry.table(s, dir, "events"))),
    "volume_anomaly" -> ((s, dir) =>
      volumeAnomalies(SparkEntry.table(s, dir, "events"))),
    "funnel" -> ((s, dir) =>
      funnel(SparkEntry.table(s, dir, "events"), Seq("view", "click", "purchase"))),
    "retention" -> ((s, dir) =>
      retention(SparkEntry.table(s, dir, "events"), grainSeconds = 24 * 3600)),
  )

  val oracleSql: Map[String, String] = Map(
    // same per-user first-start / first-subsequent-end / last-event rule,
    // same hourly floor bucketing, same exclusive running at-risk count
    "survival_table" ->
      """WITH per AS (
        |  SELECT user_id AS u,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
        |    max(epoch_us(ts)) AS tend
        |  FROM events GROUP BY user_id),
        |p2 AS (
        |  SELECT per.u, per.t0, per.tend,
        |    min(CASE WHEN e.event_type = 'purchase'
        |             AND epoch_us(e.ts) >= per.t0 THEN epoch_us(e.ts) END) AS tp
        |  FROM per JOIN events e ON e.user_id = per.u
        |  WHERE per.t0 IS NOT NULL
        |  GROUP BY per.u, per.t0, per.tend),
        |d AS (
        |  SELECT u,
        |    CASE WHEN tp IS NOT NULL THEN (tp - t0) ELSE (tend - t0) END
        |      // 3600000000 AS t,
        |    tp IS NOT NULL AS observed
        |  FROM p2),
        |b AS (
        |  SELECT t,
        |    sum(CASE WHEN observed THEN 1 ELSE 0 END) AS n_event,
        |    sum(CASE WHEN observed THEN 0 ELSE 1 END) AS n_censor
        |  FROM d GROUP BY t)
        |SELECT t,
        |  CAST((SELECT count(*) FROM d)
        |    - COALESCE(sum(n_event + n_censor) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk,
        |  CAST(n_event AS BIGINT) AS n_event,
        |  CAST(n_censor AS BIGINT) AS n_censor
        |FROM b""".stripMargin,
    "transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS nxt
        |  FROM events)
        |SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
        |FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2""".stripMargin,
    // identical deterministic chain: integer moments -> one division and
    // one sqrt each, identical IEEE ops in identical order
    "volume_anomaly" ->
      """WITH d AS (
        |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT t, count(*) AS nd, sum(x) AS sx, sum(x * x) AS sxx
        |      FROM d GROUP BY t)
        |SELECT d.t AS event_type, d.day, d.x AS n_events,
        |  CAST(d.x * s.nd - s.sx AS DOUBLE) /
        |    (CAST(s.nd AS DOUBLE) * sqrt(CAST(s.nd * s.sxx - s.sx * s.sx AS DOUBLE) /
        |      CAST(s.nd * (s.nd - 1) AS DOUBLE))) AS z
        |FROM d JOIN s ON d.t = s.t
        |WHERE s.nd > 1
        |  AND CAST(s.nd * s.sxx - s.sx * s.sx AS DOUBLE) / CAST(s.nd * (s.nd - 1) AS DOUBLE) > 0
        |  AND abs(CAST(d.x * s.nd - s.sx AS DOUBLE) /
        |    (CAST(s.nd AS DOUBLE) * sqrt(CAST(s.nd * s.sxx - s.sx * s.sx AS DOUBLE) /
        |      CAST(s.nd * (s.nd - 1) AS DOUBLE)))) > 2.0""".stripMargin,
    // same ROWS frame over the same (ts, event_id) total order
    "next_event_examples" ->
      """WITH c AS (
        |  SELECT user_id, event_id, event_type,
        |    list(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ctx
        |  FROM events)
        |SELECT user_id, event_id, array_to_string(ctx, ' ') AS context,
        |  event_type AS label
        |FROM c WHERE len(ctx) = 3""".stripMargin,
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
