package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Time-series similarity search over behavioral streams: for each query
  * entity, the top-k entities with the most similar ACTIVITY SERIES
  * (per-bucket event counts) by squared euclidean distance — "which users
  * behave like this user", the entity-matching query of the
  * streaming-similarity literature (EDBT'19/ICDE'21 family), on the same
  * engine as everything else.
  *
  * Scale shape — the series are never densified: with
  * `d(u,v)² = Σc_u² + Σc_v² − 2·Σ_b c_u(b)·c_v(b)`, per-entity norms are
  * one partial-agg pass, and the cross term only needs buckets BOTH series
  * touch — the (tiny) query-side bucket vectors broadcast against one
  * narrow scan of the candidate bucket counts, missing buckets contribute
  * exactly nothing, and the top-k reduces through [[TopKAgg]]. A dense
  * formulation would materialize |entities| × |buckets| cells, almost all
  * zero.
  *
  * Counts are integers, so every distance is an EXACT integer — no float
  * comparisons anywhere near the ranking. */
object TimeSeries {
  private type Q = (SparkSession, String) => DataFrame

  /** Per-(entity, bucket) activity counts at `grainSeconds`. */
  def series(events: DataFrame, entity: String, tsCol: String,
             grainSeconds: Long = 3600L): DataFrame =
    events.select(col(entity).as("ent"),
        floor(unix_micros(col(tsCol)) / (grainSeconds * 1000000L)).as("bucket"))
      .groupBy("ent", "bucket").agg(count(lit(1)).as("c"))

  /** Top-`k` nearest entities per query entity by squared euclidean
    * distance between activity series. `queries` = entity ids (small). */
  def tsTopK(events: DataFrame, entity: String, tsCol: String,
             queryIds: Seq[Long], k: Int = 5,
             grainSeconds: Long = 3600L): DataFrame = {
    val s = series(events, entity, tsCol, grainSeconds)
    // hot-bucket counts square: int64 gives out near c ≈ 3·10^9 per
    // (entity, bucket) and sooner for the summed norms — decimal(38,0)
    // moments, double once at the ranking score (the module discipline)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val norms = s.groupBy("ent")
      .agg(sum(col("c").cast(dec) * col("c").cast(dec)).as("n2"))
    val q = s.where(col("ent").isInCollection(queryIds))
      .select(col("ent").as("q_ent"), col("bucket"), col("c").as("qc"))
    val qn = norms.where(col("ent").isInCollection(queryIds))
      .select(col("ent").as("q_ent"), col("n2").as("qn2"))
    // cross terms on shared buckets only; candidates missing every query
    // bucket still rank (distance = qn2 + n2), via the right-outer norm join
    val cross = s.join(broadcast(q), Seq("bucket"))
      .where(col("ent") =!= col("q_ent"))
      .groupBy(col("q_ent"), col("ent"))
      .agg(sum(col("c").cast(dec) * col("qc").cast(dec)).as("dot"))
    val scored = norms.crossJoin(broadcast(qn))
      .where(col("ent") =!= col("q_ent"))
      .join(cross, Seq("q_ent", "ent"), "left")
      .select(col("q_ent"), col("ent"),
        (col("qn2") + col("n2") -
          lit(2).cast(dec) * coalesce(col("dot"), lit(0).cast(dec))).as("d2"))
    val topk = graft.functions.topk.topK(k)
    scored.groupBy("q_ent")
      .agg(topk(col("ent"), -col("d2").cast("double")).as("nb"))
      .select(col("q_ent"), posexplode(col("nb")).as(Seq("pos", "s")))
      .select(col("q_ent"), col("s.id").as("ent"),
        (col("pos") + 1).cast("long").as("rank"),
        (-col("s.score")).cast("long").as("d2"))
  }

  /** Per-entity ROLLING features over the ordered event stream — the
    * standard feature-engineering pass before behavioral model training:
    * rolling count/sum over the last `n` events (current row inclusive)
    * and the inter-arrival gap. One key-partitioned window (parallel
    * across entities; a bounded ROWS frame, so each task streams its
    * partition once — O(rows), no per-row rescan). Deterministic order:
    * (ts, id) — `idCol` breaks timestamp ties identically on every
    * engine. Integer cents and µs throughout. */
  def rollingFeatures(events: DataFrame, entity: String, tsCol: String,
                      idCol: String, valueCents: Column, n: Int = 5): DataFrame = {
    require(n >= 1, "need a positive frame")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entity).orderBy(col("ts_us").asc, col(idCol).asc)
    val wN = w.rowsBetween(-(n - 1), org.apache.spark.sql.expressions.Window.currentRow)
    events.select(col(entity), col(idCol),
        unix_micros(col(tsCol)).as("ts_us"), valueCents.as("cents"))
      .withColumn("roll_n", count(lit(1)).over(wN))
      .withColumn("roll_cents", sum(col("cents")).over(wN))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
  }

  /** Trailing-window spike detection — the per-entity anomaly flag an ops
    * pipeline runs over every metric stream: a row is a spike when its
    * value sits more than `t` sample standard deviations from the mean of
    * the PRECEDING `n` observations (current row excluded — the row under
    * test must not contaminate its own baseline).
    *
    * The z² test is evaluated as a PURE INTEGER cross-multiplied
    * inequality — with S = Σx, Q = Σx² over the m-row history,
    * z² > t²  ⇔  (m·x − S)² > t² · (m·Q − S²) — so the flag is exact and
    * bit-identical on every engine: no float division, no sqrt, no
    * epsilon. A constant history (variance 0) flags ANY deviation, which
    * is the right alarm semantics. One key-partitioned window with a
    * bounded ROWS frame: parallel across entities, each task streams its
    * partition once. Rows with under `minHistory` observations emit
    * unflagged (no baseline, no alarm). */
  def rollingSpike(events: DataFrame, entity: String, tsCol: String,
                   idCol: String, valueCents: Column, n: Int = 20,
                   t: Int = 3, minHistory: Int = 8): DataFrame = {
    require(n >= minHistory && minHistory >= 2 && t >= 1, "bad spike params")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entity).orderBy(col("ts_us").asc, col(idCol).asc)
      .rowsBetween(-n, -1)
    events.select(col(entity), col(idCol),
        unix_micros(col(tsCol)).as("ts_us"), valueCents.as("cents"))
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("s", coalesce(sum(col("cents")).over(w), lit(0L)))
      .withColumn("q", coalesce(sum(col("cents") * col("cents")).over(w), lit(0L)))
      .withColumn("z2_num",
        (col("m") * col("cents") - col("s")) * (col("m") * col("cents") - col("s")))
      .withColumn("z2_den", col("m") * col("q") - col("s") * col("s"))
      .withColumn("is_spike",
        col("m") >= minHistory && col("z2_num") > lit(t.toLong * t) * col("z2_den"))
      .drop("s", "q")
  }

  /** CUSUM drift alarms per entity (Page 1954, the classic sequential
    * changepoint test): the one-sided CUSUM statistic
    * `s_t = max(0, s_{t−1} + (x_t − slack))` flags a sustained upward
    * level shift — small persistent excesses accumulate where a
    * threshold-per-event monitor ([[rollingSpike]]) only sees isolated
    * spikes. The two are the complementary halves of a drift/anomaly
    * panel.
    *
    * Scale shape: the recursion has the CLOSED FORM
    * `s_t = P_t − min(0, min_{j≤t} P_j)` over the prefix sums `P` of
    * `(x − slack)` — so the whole statistic is two running-frame window
    * passes per entity (sum, then min), never a per-entity array fold:
    * one entity-keyed exchange, streaming O(n) frames, unbounded history
    * without unbounded memory. All integer cents — exact.
    *
    * Emits only alarm rows (`cusum > h`), with `is_start` marking episode
    * onsets (previous statistic at or below the threshold). */
  def cusum(events: DataFrame, entity: String, tsCol: String, idCol: String,
            valueCents: Column, slackCents: Long, h: Long): DataFrame = {
    require(h > 0, "threshold must be positive")
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(entity).orderBy(col("__t").asc, col(idCol).asc)
    val run = order.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events.select(col(entity), col(idCol),
        unix_micros(col(tsCol)).as("__t"),
        (valueCents - slackCents).as("__d"))
      .withColumn("__p", sum(col("__d")).over(run))
      .withColumn("cusum",
        col("__p") - least(lit(0L), min(col("__p")).over(run)))
      .withColumn("is_start",
        coalesce(lag(col("cusum"), 1).over(order), lit(0L)) <= h)
      .where(col("cusum") > h)
      .select(col(entity), col(idCol), col("cusum"), col("is_start"))
  }

  /** Closed-form OLS trend per group — `value ~ day` fit from the normal
    * equations, the "is this metric drifting and how fast" companion to
    * [[cusum]]'s alarm (CUSUM says THAT a shift happened; the slope says
    * how steep it is). `slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)` and
    * `intercept = (Σy − slope·Σx) / n`: the five sufficient sums
    * accumulate EXACTLY in decimal(38,0) (integer days × integer cents —
    * a double accumulation would be summation-order nondeterministic,
    * and at 10^12 rows n·Σxy overflows a long), then one correctly-
    * rounded division each — bit-identical across engines.
    *
    * ONE partial-agged pass; the exchange carries five decimals per
    * group, never rows. Groups whose x never varies emit a NULL slope
    * (zero denominator), not a garbage fit. */
  def olsTrend(df: DataFrame, group: Column, tsCol: Column,
               valueCents: Column): DataFrame = {
    val day = floor(unix_micros(tsCol) / lit(86400000000L))
    val a = df.select(group.as("grp"),
        day.cast("decimal(38,0)").as("__x"),
        valueCents.cast("decimal(38,0)").as("__y"))
      .groupBy("grp").agg(
        count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    a.withColumn("slope_cents_per_day",
        when(den === 0, lit(null).cast("double"))
          .otherwise((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") / den.cast("double")))
      .select(col("grp"), col("__n").cast("long").as("n"),
        col("slope_cents_per_day"),
        ((col("__sy").cast("double") -
          col("slope_cents_per_day") * col("__sx").cast("double")) /
          col("__n").cast("double")).as("intercept_cents"))
  }

  val queries: Map[String, Q] = Map(
    // sustained overspend alarms: slack 60.00 over the ~49.6 mean value,
    // alarm at 500.00 accumulated excess
    "cusum_flags" -> ((s, dir) =>
      cusum(SparkEntry.table(s, dir, "events"), "user_id", "ts", "event_id",
        round(col("value") * 100).cast("long"), slackCents = 6000L, h = 50000L)),
    // the 3 lowest-id users as queries, hourly activity series
    "ts_topk" -> ((s, dir) =>
      tsTopK(SparkEntry.table(s, dir, "events"), "user_id", "ts",
        queryIds = Seq(0L, 1L, 2L), k = 5)),
    // per-event-type spend trend in cents/day over the corpus window
    "ols_trend" -> ((s, dir) =>
      olsTrend(SparkEntry.table(s, dir, "events"), col("event_type"),
        col("ts"), round(col("value") * 100).cast("long"))),
    // 3-sigma spikes vs the user's own last-20-event baseline
    "rolling_spike" -> ((s, dir) =>
      rollingSpike(SparkEntry.table(s, dir, "events"), "user_id", "ts",
        "event_id", round(col("value") * 100).cast("long"))),
    // last-5-events rolling features per user
    "rolling_features" -> ((s, dir) =>
      rollingFeatures(SparkEntry.table(s, dir, "events"), "user_id", "ts",
        "event_id", round(col("value") * 100).cast("long"), n = 5)),
  )

  val oracleSql: Map[String, String] = Map(
    // same closed form: prefix sums then running min, integer cents
    "cusum_flags" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(round(value * 100) AS BIGINT) - 6000 AS d FROM events),
        |p AS (SELECT user_id, event_id, t,
        |    CAST(sum(d) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pf
        |  FROM e),
        |s AS (SELECT user_id, event_id, t,
        |    pf - least(CAST(0 AS BIGINT),
        |      CAST(min(pf) OVER (PARTITION BY user_id ORDER BY t, event_id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT)) AS cusum
        |  FROM p),
        |f AS (SELECT user_id, event_id, cusum,
        |    COALESCE(lag(cusum) OVER (PARTITION BY user_id ORDER BY t, event_id),
        |      0) <= 50000 AS is_start
        |  FROM s)
        |SELECT user_id, event_id, cusum, is_start FROM f
        |WHERE cusum > 50000""".stripMargin,
    // same HUGEINT sufficient sums, same rational slope, same operation
    // order for the intercept
    "ols_trend" ->
      """WITH e AS (SELECT event_type AS grp,
        |    CAST(CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |      AS BIGINT) AS HUGEINT) AS x,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS y
        |  FROM events),
        |a AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM e GROUP BY 1),
        |s AS (SELECT grp, n, sx, sy,
        |    CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |         ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
        |              CAST(n * sxx - sx * sx AS DOUBLE) END AS slope_cents_per_day
        |  FROM a)
        |SELECT grp, CAST(n AS BIGINT) AS n, slope_cents_per_day,
        |  (CAST(sy AS DOUBLE) - slope_cents_per_day * CAST(sx AS DOUBLE)) /
        |    CAST(n AS DOUBLE) AS intercept_cents
        |FROM s""".stripMargin,
    "rolling_spike" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  CAST(count(*) OVER w AS BIGINT) AS m,
        |  CAST((count(*) OVER w * CAST(round(value * 100) AS BIGINT)
        |        - COALESCE(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0))
        |     * (count(*) OVER w * CAST(round(value * 100) AS BIGINT)
        |        - COALESCE(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0))
        |    AS BIGINT) AS z2_num,
        |  CAST(count(*) OVER w
        |      * COALESCE(sum(CAST(round(value * 100) AS BIGINT)
        |                   * CAST(round(value * 100) AS BIGINT)) OVER w, 0)
        |    - COALESCE(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0)
        |      * COALESCE(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0)
        |    AS BIGINT) AS z2_den,
        |  count(*) OVER w >= 8 AND
        |    (count(*) OVER w * CAST(round(value * 100) AS BIGINT)
        |      - COALESCE(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0))
        |    * (count(*) OVER w * CAST(round(value * 100) AS BIGINT)
        |      - COALESCE(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0))
        |    > 9 * (count(*) OVER w
        |        * COALESCE(sum(CAST(round(value * 100) AS BIGINT)
        |                     * CAST(round(value * 100) AS BIGINT)) OVER w, 0)
        |      - COALESCE(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0)
        |        * COALESCE(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0))
        |    AS is_spike
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)""".stripMargin,
    "rolling_features" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  CAST(count(*) OVER w AS BIGINT) AS roll_n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS roll_cents,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "ts_topk" ->
      """WITH s AS (
        |  SELECT user_id AS ent, epoch_us(ts) // 3600000000 AS bucket, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT ent, sum(c * c) AS n2 FROM s GROUP BY ent),
        |q AS (SELECT ent AS q_ent, bucket, c AS qc FROM s WHERE ent IN (0, 1, 2)),
        |qn AS (SELECT ent AS q_ent, n2 AS qn2 FROM n WHERE ent IN (0, 1, 2)),
        |x AS (
        |  SELECT q.q_ent, s.ent, sum(s.c * q.qc) AS dot
        |  FROM s JOIN q ON s.bucket = q.bucket AND s.ent <> q.q_ent
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT qn.q_ent, n.ent,
        |    qn.qn2 + n.n2 - 2 * COALESCE(x.dot, 0) AS d2
        |  FROM n CROSS JOIN qn
        |  LEFT JOIN x ON x.q_ent = qn.q_ent AND x.ent = n.ent
        |  WHERE n.ent <> qn.q_ent),
        |r AS (SELECT q_ent, ent, d2,
        |        row_number() OVER (PARTITION BY q_ent ORDER BY d2, ent) AS rank
        |      FROM sc)
        |SELECT q_ent, ent, CAST(rank AS BIGINT) AS rank, CAST(d2 AS BIGINT) AS d2 FROM r WHERE rank <= 5""".stripMargin,
  )
}
