package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Temporal join operators Spark has no native form for: the event-time
  * AS-OF join ("attach the most recent prior observation") and the
  * point-in-interval join ("which window does this event fall in") — the two
  * enrichment joins every telemetry/feature pipeline runs, and the two that
  * naive SQL plans catastrophically (an inequality theta-join falls off the
  * hash-join path onto a nested-loop scan).
  *
  * Scale design (100 TB):
  *  - [[asofJoin]] never performs a join at all: both sides are tagged and
  *    union'd, ONE shuffle co-partitions them by key, and a running
  *    `last(..., ignoreNulls)` over the (ts, side)-ordered window carries
  *    the latest right-side payload forward into each left row. Cost is one
  *    exchange plus an O(n) running frame per key — no per-row probe, no
  *    range scan, no driver state. The classic sort-merge formulation of
  *    as-of, expressed declaratively so Catalyst plans the sort.
  *  - [[intervalJoin]] assumes the interval side is the small one (incident
  *    windows, deploy windows, campaign spans — thousands against billions
  *    of points). Each interval is exploded to the fixed-grain buckets it
  *    covers and BROADCAST; each point computes its own bucket narrowly at
  *    scan time; an equi hash join on (key, bucket) finds candidates and the
  *    exact range predicate filters them. The point side never shuffles —
  *    at 100 TB the plan is scan → broadcast-hash-join → partial agg.
  */
object Joins {
  private type Q = (SparkSession, String) => DataFrame

  /** Event-time AS-OF join: for each `left` row, the `payload` columns of
    * the `right` row with the greatest `tsCol` ≤ the left row's `tsCol`,
    * matched on `keys` (null payload when no prior right row exists; a right
    * row at exactly the left row's timestamp matches).
    *
    * `right` must be unique per (keys, tsCol) — pre-aggregate duplicates
    * (e.g. `arg_max` by a tie-break id) or the carried payload at a tied
    * timestamp is order-dependent. Payload columns are emitted with
    * `prefix` prepended; all `left` columns pass through. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String],
               prefix: String = "r_"): DataFrame = {
    val rv = struct(payload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), rv.as("__rv"), lit(0).as("__side")): _*)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
      .withColumn("__side", lit(1))
    // side 0 (right) sorts before side 1 (left) at a tied timestamp, so an
    // exactly-simultaneous observation is visible to the left row. Left rows
    // tied with each other see the identical right prefix, so their order is
    // immaterial. The trailing __rv orders RIGHT rows tied on (ts) so the
    // max payload deterministically wins even when the uniqueness
    // precondition is violated (and matches asofJoinSalted's cross-bucket
    // max(struct(ts, rv)) carry rule). rowsBetween(unboundedPreceding,
    // current) plans as the incremental running frame — O(n) per key, not
    // O(n²).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__m.$p").as(s"$prefix$p")): _*)
  }

  /** [[asofJoin]] for SKEWED keys. The plain form's one window runs each
    * key in ONE task — a pathologically hot key (a mega-user, a default
    * key) serializes its whole timeline through a single straggler. This
    * variant salts BY TIME RANGE, the only salt an as-of can use (a random
    * salt would sever the running frame's order): rows land in fixed
    * `grainSeconds` buckets, the running window partitions by (keys,
    * bucket) — a hot key's timeline now spreads over its buckets — and a
    * SECOND, tiny window over the per-(key, bucket) summaries (one row per
    * bucket with right data: its latest payload) computes each bucket's
    * carry-in, the latest right payload from any earlier bucket. A row
    * unmatched within its own bucket takes the carry. Exact same output
    * as [[asofJoin]] (spec-pinned): within-bucket rows see the bucket
    * prefix; the carry is precisely the pre-bucket prefix.
    *
    * Cost: one (keys, bucket) co-partitioning of the data (same volume as
    * the unsalted exchange, finer keys), plus a summary-sized exchange and
    * a (keys, bucket)-keyed join of the carry table — rows per key per
    * window task drop from |timeline| to |bucket|. Pick `grainSeconds` so
    * the hottest key's per-bucket row count is comfortable ([[
    * graft.ext.Freq.skewReport]] measures exactly this; [[asofJoinAuto]]
    * wires the two together). For a TIMESTAMP `tsCol` the grain is in
    * seconds; for a numeric one it is in the column's own unit.
    *
    * As with [[asofJoin]], `right` should be unique per (keys, tsCol);
    * when it is not, BOTH regimes resolve a tied timestamp to the
    * maximum payload struct (the within-bucket window and the
    * cross-bucket carry share the tiebreak), so salted output still
    * equals plain output. */
  def asofJoinSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
                     tsCol: String, payload: Seq[String], prefix: String = "r_",
                     grainSeconds: Long = 86400L): DataFrame = {
    require(grainSeconds > 0, "grain must be positive")
    val rv = struct(payload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), rv.as("__rv"), lit(0).as("__side")): _*)
    val bucketOf: Column => Column = r.schema("__ts").dataType match {
      case _: org.apache.spark.sql.types.TimestampType =>
        c => floor(unix_micros(c) / (grainSeconds * 1000000L))
      case _ => c => floor(c.cast("long") / grainSeconds)
    }
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__b", bucketOf(col("__ts")))
    // same (ts, side, payload) tiebreak as the plain form, so the
    // within-bucket pick agrees with the carry's max(struct(ts, rv)) rule
    // on tied right timestamps — the two regimes cannot diverge
    val wB = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Per-bucket statistics as WINDOWS over the same (keys, bucket)
    // partitioning instead of separate aggregation branches (r19, guide
    // §2.4): the previous shape re-derived `u` for an allB distinct and
    // `r` for an rSum aggregate — two more full exchanges and two more
    // source scans; every per-bucket fact is computable inside the one
    // exchange the running window already pays. `__brv` (the bucket's
    // latest right payload, max over the same (ts, rv) struct order) and
    // `__rn` share wB's sort, so the stage stays one exchange + one sort.
    val wBAll = Window.partitionBy((keys :+ "__b").map(col): _*)
    val within = u
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(wB))
      .withColumn("__brv", max(when(col("__side") === 0,
        struct(col("__ts"), col("__rv")))).over(wBAll))
      .withColumn("__rn", row_number().over(
        Window.partitionBy((keys :+ "__b").map(col): _*)
          .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)))
    // one row per (key, bucket) — exactly the buckets present in u (the
    // old allB set), each holding the bucket's latest right payload (the
    // old rSum value; NULL when the bucket has no right rows, exactly as
    // the old left join produced); bucket order == time order, so the
    // latest payload across all earlier buckets is the last non-null
    // summary before this bucket
    val summaries = within.where(col("__rn") === 1)
      .select(keys.map(col) ++
        Seq(col("__b"), col("__brv.__rv").as("__brv")): _*)
    val wK = Window.partitionBy(keys.map(col): _*).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = summaries
      .withColumn("__carry", last(col("__brv"), ignoreNulls = true).over(wK))
      .select(keys.map(col) ++ Seq(col("__b"), col("__carry")): _*)
    within.join(carry, keys :+ "__b", "left")
      .where(col("__side") === 1)
      .withColumn("__m2", coalesce(col("__m"), col("__carry")))
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__m2.$p").as(s"$prefix$p")): _*)
  }

  /** [[asofJoin]] with the regime picked by MEASUREMENT: a [[
    * graft.ext.Freq.skewReport]] preflight on the left keys reads the
    * hottest key's row count; above `hotRowThreshold` the salted form
    * runs, otherwise the plain one (same output either way — the
    * threshold is purely a physical decision, the [[
    * graft.ext.Dedup.dedupAuto]] posture). */
  def asofJoinAuto(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, payload: Seq[String], prefix: String = "r_",
                   hotRowThreshold: Long = 2000000L,
                   grainSeconds: Long = 86400L): DataFrame = {
    // null-preserving key render: concat_ws silently DROPS a NULL part,
    // which would merge ("a", NULL) with ("a") shapes and overstate the
    // hot key (a physical decision only, but no reason to measure wrong)
    val hot = Freq.skewReport(
        left.select(concat_ws("|", keys.map(k =>
          coalesce(col(k).cast("string"), lit("\u0000<null>"))): _*).as("k")),
        col("k"), topK = 1)
      .select("n").collect().headOption.map(_.getLong(0)).getOrElse(0L)
    if (hot > hotRowThreshold)
      asofJoinSalted(left, right, keys, tsCol, payload, prefix, grainSeconds)
    else asofJoin(left, right, keys, tsCol, payload, prefix)
  }

  /** Point-in-interval join: all (point, interval) matches where the point's
    * `tsCol` ∈ [`startCol`, `endCol`) and `keys` match, via fixed-grain
    * bucketing of the (small, broadcast) interval side. `grainSeconds`
    * trades broadcast size (each interval replicates to
    * span/grain buckets) against candidate precision; set it near the
    * typical interval length. All interval columns pass through, points
    * contribute `pointCols`. */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   tsCol: String, startCol: String, endCol: String,
                   pointCols: Seq[String], grainSeconds: Long = 3600L): DataFrame = {
    val grainUs = grainSeconds * 1000000L
    def bucketOf(c: Column): Column = floor(unix_micros(c) / grainUs)
    // end is exclusive: an interval ending exactly on a grain boundary must
    // not claim the bucket that starts there
    val iv = intervals.withColumn("__b",
        explode(sequence(bucketOf(col(startCol)),
          floor((unix_micros(col(endCol)) - 1) / grainUs))))
    points
      .withColumn("__b", bucketOf(col(tsCol)))
      .join(broadcast(iv), keys :+ "__b")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .select((intervals.columns.toSeq ++ pointCols).distinct.map(col): _*)
  }

  /** Interval-OVERLAP join: all (a, b) pairs on matching `keys` whose
    * half-open spans `[aStart, aEnd) × [bStart, bEnd)` intersect — the
    * third member of the temporal-join family ([[asofJoin]]: latest-prior
    * point; [[intervalJoin]]: point-in-span; this: span-against-span, the
    * shape of incident-vs-deploy correlation, session-overlap analysis,
    * availability-window intersection).
    *
    * Same bucketing strategy as [[intervalJoin]], applied to BOTH sides:
    * the (small) `b` side explodes to its fixed-grain buckets and
    * BROADCASTS; each `a` row explodes to its own buckets narrowly at scan
    * time, the equi hash join on (keys, bucket) produces candidates, and
    * the exact predicate `aStart < bEnd AND bStart < aEnd` filters.
    * A pair sharing several buckets appears once per shared bucket — the
    * dedup keys on the FIRST shared bucket (`greatest(aBucket₀,
    * bBucket₀)`) instead of a `distinct` over the pair set, a pure filter
    * with no extra exchange. The `a` side never shuffles. */
  def overlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
                  aStart: String, aEnd: String, bStart: String, bEnd: String,
                  grainSeconds: Long = 3600L): DataFrame = {
    val grainUs = grainSeconds * 1000000L
    def bucketOf(c: Column): Column = floor(unix_micros(c) / grainUs)
    def lastBucket(endC: String): Column =
      floor((unix_micros(col(endC)) - 1) / grainUs)
    val bi = b.withColumn("__bb0", bucketOf(col(bStart)))
      .withColumn("__b", explode(sequence(col("__bb0"), lastBucket(bEnd))))
    val ai = a.withColumn("__ab0", bucketOf(col(aStart)))
      .withColumn("__b", explode(sequence(col("__ab0"), lastBucket(aEnd))))
    ai.join(broadcast(bi), keys :+ "__b")
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      // keep only the FIRST bucket the two spans share: both spans cover
      // it, so it is max of their first buckets — every other shared
      // bucket drops without a distinct
      .where(col("__b") === greatest(col("__ab0"), col("__bb0")))
      .select((a.columns.toSeq ++ b.columns.toSeq).distinct.map(col): _*)
  }

  /** Driver-gate anchor set for [[intervalJoin]]: high-value error events
    * open a 1-hour incident window on their user. */
  private def incidentWindows(events: DataFrame): DataFrame =
    events.where(col("event_type") === "error" && col("value") > 100)
      .select(col("event_id").as("anchor_id"), col("user_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))

  /** Salted equi-join for skewed keys — the manual form of what AQE's
    * skew-join split does at runtime, for when the skew is KNOWN up front
    * (a null-ish default key, a mega-user, the empty-string document):
    * every left row gets a deterministic salt in [0, nSalts), the right
    * side is replicated nSalts× with every salt value, and the join runs
    * on (keys..., salt) — a hot key's rows spread over nSalts tasks
    * instead of funneling into one straggler.
    *
    * Semantics are EXACTLY the plain inner equi-join (each left row meets
    * each right match exactly once — on its own salt). Cost: the right
    * side shuffles nSalts× its size, so salt only the join where the
    * right side is small-ish and the left is skewed — the dimension-
    * enrichment shape. The salt is [[Hygiene.hashU64]] of the whole left
    * row's key columns plus a row-distinguishing column, deterministic
    * across runs. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 distinctLeft: Column, nSalts: Int = 8): DataFrame = {
    require(keys.nonEmpty && nSalts >= 1, "need keys and nSalts >= 1")
    val salt = pmod(Hygiene.hashU64(concat(
      (keys.map(k => col(k).cast("string")) :+ distinctLeft.cast("string"))
        .reduce((a, b) => concat(a, lit("|"), b)))), lit(nSalts.toLong))
    val l = left.withColumn("__salt", salt)
    val r = right.crossJoin(
      broadcast(left.sparkSession.range(nSalts).select(col("id").as("__salt"))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Any-touch attribution: every (view → click) pair of the same user
    * with the click inside `[view_ts, view_ts + window)` — the
    * click/conversion attribution join of event analytics, and the batch
    * twin of [[attributionStream]]'s native stream-stream join.
    *
    * Bucketed equi-join with NEITHER side broadcast (both sides are
    * event-scale): bucket grain = the window, so each view span covers at
    * most TWO buckets while each click lives in exactly ONE — the pair
    * can only meet in the click's bucket, so no dedup step exists at all
    * (the [[overlapJoin]] first-shared-bucket trick degenerates to
    * nothing). One co-partitioning shuffle per side on (user, bucket),
    * then the exact range predicate. Integer-µs lag output. */
  def attribution(events: DataFrame, fromType: String, toType: String,
                  windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val wUs = windowSeconds * 1000000L
    val views = events.where(col("event_type") === fromType)
      .select(col("user_id"), col("event_id").as("view_event_id"),
        unix_micros(col("ts")).as("__vts"))
      .withColumn("__b", explode(array_distinct(array(
        floor(col("__vts") / wUs), floor((col("__vts") + wUs - 1) / wUs)))))
    val clicks = events.where(col("event_type") === toType)
      .select(col("user_id"), col("event_id").as("click_event_id"),
        unix_micros(col("ts")).as("__cts"))
      .withColumn("__b", floor(col("__cts") / wUs))
    clicks.join(views, Seq("user_id", "__b"))
      .where(col("__cts") >= col("__vts") && col("__cts") < col("__vts") + wUs)
      .select(col("user_id"), col("click_event_id"), col("view_event_id"),
        (col("__cts") - col("__vts")).as("lag_us"))
  }

  /** The STREAMING form: Spark's native stream-stream inner join with
    * event-time range condition and watermarks on both sides — state for
    * a view is dropped once the watermark passes `view_ts + window`, so
    * state is bounded by the window, not the stream length. Results equal
    * [[attribution]] on the same data (spec-pinned via MemoryStream
    * replay). */
  def attributionStream(events: DataFrame, fromType: String, toType: String,
                        windowSeconds: Long): DataFrame = {
    val views = events.where(col("event_type") === fromType)
      .select(col("user_id").as("v_user"), col("event_id").as("view_event_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", s"$windowSeconds seconds")
    val clicks = events.where(col("event_type") === toType)
      .select(col("user_id").as("c_user"), col("event_id").as("click_event_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", s"$windowSeconds seconds")
    views.join(clicks, expr(
      s"""v_user = c_user AND c_ts >= v_ts
         |AND c_ts < v_ts + interval $windowSeconds seconds""".stripMargin))
      .select(col("v_user").as("user_id"), col("click_event_id"),
        col("view_event_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
  }

  val queries: Map[String, Q] = Map(
    // 1-day any-touch view→click attribution over the event stream
    "attribution" -> ((s, dir) =>
      attribution(SparkEntry.table(s, dir, "events"), "view", "click", 86400L)),
    // incident windows × purchase-activity windows: which purchases were
    // in flight during an incident, and for how long (exact µs overlap)
    "overlap_join" -> ((s, dir) => {
      val events = SparkEntry.table(s, dir, "events")
      val incidents = events.where(col("event_type") === "error" && col("value") > 100)
        .select(col("event_id").as("anchor_id"), col("user_id"),
          col("ts").as("a_start"), (col("ts") + expr("INTERVAL 1 HOUR")).as("a_end"))
      val purchases = events.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("b_start"), (col("ts") + expr("INTERVAL 30 MINUTE")).as("b_end"))
      overlapJoin(incidents, purchases, Seq("user_id"),
        "a_start", "a_end", "b_start", "b_end")
        .select(col("anchor_id"), col("p_id"),
          (unix_micros(least(col("a_end"), col("b_end"))) -
            unix_micros(greatest(col("a_start"), col("b_start")))).as("overlap_us"))
    }),
    // every click annotated with the user's most recent prior purchase
    "asof_join" -> ((s, dir) => {
      val events = SparkEntry.table(s, dir, "events")
      // unique right side per (user_id, ts): keep the max-event_id purchase
      val purchases = events.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(struct(col("event_id"), col("value"))).as("s"))
        .select(col("user_id"), col("ts"),
          col("s.event_id").as("purchase_id"), col("s.value").as("purchase_value"))
        .withColumn("purchase_ts", col("ts"))
      val clicks = events.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      // no-prior-purchase is a NULL payload; the timestamp goes out as
      // epoch-µs with a -1 sentinel — a NULLABLE TIMESTAMP column trips
      // cross-engine comparators on NaT representation (µs-vs-ns pandas
      // units), where a BIGINT column is representation-free
      asofJoin(clicks, purchases, Seq("user_id"), "ts",
        Seq("purchase_id", "purchase_ts", "purchase_value"), prefix = "")
        .withColumn("purchase_us",
          coalesce(unix_micros(col("purchase_ts")), lit(-1L)))
        .drop("purchase_ts")
    }),
    // the salted regime over the same inputs (6h grain → ~120 buckets over
    // the 30-day gate span), against the identical DuckDB ASOF oracle
    "asof_join_salted" -> ((s, dir) => {
      val events = SparkEntry.table(s, dir, "events")
      val purchases = events.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(struct(col("event_id"), col("value"))).as("s"))
        .select(col("user_id"), col("ts"),
          col("s.event_id").as("purchase_id"), col("s.value").as("purchase_value"))
        .withColumn("purchase_ts", col("ts"))
      val clicks = events.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      asofJoinSalted(clicks, purchases, Seq("user_id"), "ts",
        Seq("purchase_id", "purchase_ts", "purchase_value"), prefix = "",
        grainSeconds = 6 * 3600L)
        .withColumn("purchase_us",
          coalesce(unix_micros(col("purchase_ts")), lit(-1L)))
        .drop("purchase_ts")
    }),
    // per incident window: traffic volume and exact integer-cents value sum
    // (a double SUM is summation-order nondeterministic; cents are exact)
    "interval_join" -> ((s, dir) => {
      val events = SparkEntry.table(s, dir, "events")
      intervalJoin(events, incidentWindows(events), Seq("user_id"),
        "ts", "w_start", "w_end", Seq("value"))
        .groupBy(col("anchor_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the plain theta-join the bucketed equi-join provably equals
    "attribution" ->
      """SELECT v.user_id, c.event_id AS click_event_id,
        |  v.event_id AS view_event_id,
        |  epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
        |FROM events v JOIN events c ON c.user_id = v.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |  AND epoch_us(c.ts) >= epoch_us(v.ts)
        |  AND epoch_us(c.ts) < epoch_us(v.ts) + 86400000000""".stripMargin,
    // inequality theta-join mirror of the bucketed overlap join
    "overlap_join" ->
      """WITH a AS (
        |  SELECT event_id AS anchor_id, user_id, ts AS a_start,
        |         ts + INTERVAL 1 HOUR AS a_end
        |  FROM events WHERE event_type = 'error' AND value > 100),
        |b AS (
        |  SELECT event_id AS p_id, user_id, ts AS b_start,
        |         ts + INTERVAL 30 MINUTE AS b_end
        |  FROM events WHERE event_type = 'purchase')
        |SELECT a.anchor_id, b.p_id,
        |  epoch_us(least(a.a_end, b.b_end)) - epoch_us(greatest(a.a_start, b.b_start))
        |    AS overlap_us
        |FROM a JOIN b ON a.user_id = b.user_id
        |  AND a.a_start < b.b_end AND b.b_start < a.a_end""".stripMargin,
    // DuckDB's native ASOF JOIN — a genuinely independent implementation of
    // the same semantics (greatest right ts ≤ left ts, per key)
    "asof_join" ->
      """WITH pr AS (
        |  SELECT user_id, ts, ts AS purchase_ts,
        |         arg_max(event_id, event_id) AS purchase_id,
        |         arg_max(value, event_id) AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts),
        |cl AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT cl.event_id, cl.user_id, cl.ts,
        |       pr.purchase_id, pr.purchase_value,
        |       coalesce(epoch_us(pr.purchase_ts), -1) AS purchase_us
        |FROM cl ASOF LEFT JOIN pr ON cl.user_id = pr.user_id AND cl.ts >= pr.ts""".stripMargin,
    // identical semantics, identical oracle: the salted form must be
    // indistinguishable from the plain one to any reader
    "asof_join_salted" ->
      """WITH pr AS (
        |  SELECT user_id, ts, ts AS purchase_ts,
        |         arg_max(event_id, event_id) AS purchase_id,
        |         arg_max(value, event_id) AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts),
        |cl AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT cl.event_id, cl.user_id, cl.ts,
        |       pr.purchase_id, pr.purchase_value,
        |       coalesce(epoch_us(pr.purchase_ts), -1) AS purchase_us
        |FROM cl ASOF LEFT JOIN pr ON cl.user_id = pr.user_id AND cl.ts >= pr.ts""".stripMargin,
    "interval_join" ->
      """WITH a AS (
        |  SELECT event_id AS anchor_id, user_id, ts
        |  FROM events WHERE event_type = 'error' AND value > 100)
        |SELECT a.anchor_id, count(*) AS n_events,
        |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM a JOIN events e
        |  ON e.user_id = a.user_id AND e.ts >= a.ts AND e.ts < a.ts + INTERVAL 1 HOUR
        |GROUP BY a.anchor_id""".stripMargin,
  )
}
