package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Bradley–Terry preference ranking (Bradley & Terry 1952; MM fit per
  * Hunter 2004) — the strength model behind RLHF preference-data curation:
  * given pairwise outcomes ("response A beat response B"), recover a
  * per-item strength so mixes can be rebalanced, weak sources pruned, and
  * annotator batches audited against the fitted order.
  *
  * Scale design (100 TB of comparisons):
  *  - the corpus collapses in ONE partial-agged pass to the K×K pair-count
  *    sufficient statistic (n_ij, wins_ij) — K is the item catalog
  *    (models, sources, prompt templates: 10s–1000s), so the statistic is
  *    kilobytes no matter how many comparisons feed it;
  *  - the MM fixed-point iterates driver-side over that statistic (the
  *    [[Similarity.trainCentroids]] bounded-collect posture) — iteration
  *    work is O(K²·iters), zero cluster round-trips;
  *  - iteration arithmetic is FIXED-POINT integer (scale 10⁶, BigInt —
  *    n_ij·S² overflows a long past ~10¹² comparisons), every step a
  *    floor division — so the fitted scores are EXACTLY reproducible,
  *    engine-independent, and DuckDB-mirrorable by unrolling the same
  *    iterations as integer CTEs (floats would diverge in the last ulp
  *    across summation orders; the driver gate hash-matches because no
  *    float ever enters the recursion).
  *
  * MM update per Hunter 2004 eq. (2), in fixed point with scores s ≈ S·w:
  * `den_i = Σ_j (n_ij·S²) div (s_i + s_j)`; `raw_i = (W_i·S²) div den_i`;
  * then normalize to mean S: `s_i = max(1, (raw_i·K·S) div Σ raw)` — the
  * max(1) clamp keeps items that never win (W_i = 0) from zeroing a later
  * denominator; convergence for such degenerate graphs is the usual BT
  * connectivity caveat (Hunter §1), the clamp just keeps the recursion
  * total. */
object Prefs {
  private type Q = (SparkSession, String) => DataFrame

  /** Scale of the fixed-point representation (10⁶ — six decimal digits of
    * strength resolution, plenty for ranking and far below BigInt
    * overflow at any comparison volume). */
  val FixedScale: Long = 1000000L

  /** Pairwise preference outcomes from an interaction log: within each
    * `user`'s (ts, id)-ordered stream, every consecutive pair of DISTINCT
    * items becomes one comparison, won by the higher `score` (ties to the
    * earlier item — `>=`). Emitted with the unordered pair canonicalized
    * (`item_a` < `item_b`) plus the winner, ready for [[btPairs]].
    * One user-keyed exchange; the lead() frame is O(1) per row. */
  def preferencePairs(events: DataFrame, user: Column, ts: Column,
                      id: Column, item: Column, score: Column): DataFrame = {
    val w = Window.partitionBy("__u").orderBy(col("__t").asc, col("__id").asc)
    events
      .select(user.as("__u"), unix_micros(ts).as("__t"), id.as("__id"),
        item.as("__a"), score.as("__va"))
      .withColumn("__b", lead(col("__a"), 1).over(w))
      .withColumn("__vb", lead(col("__va"), 1).over(w))
      .where(col("__b").isNotNull && col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("item_a"),
        greatest(col("__a"), col("__b")).as("item_b"),
        when(col("__va") >= col("__vb"), col("__a")).otherwise(col("__b"))
          .as("winner"))
  }

  /** The Bradley–Terry sufficient statistic: per unordered item pair, the
    * comparison count and each side's wins. THIS is what crosses the wire
    * — K² rows, however many comparisons produced them. */
  def btPairs(prefs: DataFrame): DataFrame =
    prefs.groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n"),
        sum((col("winner") === col("item_a")).cast("long")).as("wins_a"))
      .withColumn("wins_b", col("n") - col("wins_a"))

  /** Fitted BT strengths after `iters` fixed-point MM rounds over the
    * [[btPairs]] statistic. Output per item: games, wins, the integer
    * fixed-point score (scale [[FixedScale]], mean ≈ S by construction)
    * and its decimal rendering. Deterministic to the last bit — see the
    * object doc. */
  def btScores(spark: SparkSession, pairs: DataFrame,
               iters: Int = 12): DataFrame = {
    require(iters >= 1, "at least one MM round")
    val S = BigInt(FixedScale)
    val stat = pairs.select("item_a", "item_b", "n", "wins_a", "wins_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        BigInt(r.getLong(2)), BigInt(r.getLong(3)), BigInt(r.getLong(4))))
    val items = stat.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val games = items.map(i => i -> stat.collect {
      case (a, b, n, _, _) if a == i || b == i => n }.sum).toMap
    val wins = items.map(i => i -> stat.collect {
      case (a, _, _, wa, _) if a == i => wa
      case (_, b, _, _, wb) if b == i => wb }.sum).toMap
    val k = BigInt(items.length)
    var s: Map[String, BigInt] = items.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val den = items.map { i =>
        i -> stat.collect {
          case (a, b, n, _, _) if a == i => (n * S * S) / (s(i) + s(b))
          case (a, b, n, _, _) if b == i => (n * S * S) / (s(i) + s(a))
        }.sum
      }.toMap
      val raw = items.map(i => i -> (wins(i) * S * S) / den(i)).toMap
      val sr = raw.values.sum
      s = items.map(i => i -> ((raw(i) * k * S) / sr).max(BigInt(1))).toMap
    }
    import scala.jdk.CollectionConverters._
    val rows = items.map(i => org.apache.spark.sql.Row(
      i, games(i).toLong, wins(i).toLong, s(i).toLong,
      s(i).toLong.toDouble / FixedScale.toDouble))
    spark.createDataFrame(rows.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_games",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_wins",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("score_scaled",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** Per-pair win rates with the Wilson score interval at z = 2 (the
    * Agresti–Coull choice — z² = 4 keeps every constant a small exact
    * double, so both engines compute bit-identical bounds from the same
    * +, −, ×, ÷, √, all IEEE correctly-rounded). The interval is the
    * honest version of the rate: at n = 3 comparisons a 3-0 sweep still
    * has wilson_lo ≈ 0.44 — the curation signal for "not enough
    * comparisons yet", which the raw rate hides. Pure narrow arithmetic
    * over the [[btPairs]] statistic — no exchange at all. */
  def winRates(pairs: DataFrame): DataFrame = {
    val n = col("n").cast("double")
    val p = col("wins_a").cast("double") / n
    val z2 = lit(4.0); val z = lit(2.0)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val margin = (z * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))) /
      denom
    pairs.select(col("item_a"), col("item_b"), col("n"), col("wins_a"),
      p.as("rate_a"), (center - margin).as("wilson_lo_a"),
      (center + margin).as("wilson_hi_a"))
  }

  /** MAINTAINED Bradley–Terry statistic over continuous comparison ingest:
    * (n, wins_a) per pair is ADDITIVE over batches, so state is exactly
    * the [[btPairs]] table and merge = union + re-sum — the
    * [[Assoc.absorbCoocBatch]] posture (committed `_SUCCESS`-gated
    * snapshots, replays recompute against the pre-batch snapshot). Each
    * absorption returns the full statistic so far, EQUAL to the one-shot
    * [[btPairs]] of the union (driver-gated vs the same oracle); feed it
    * to [[btScores]] for fresh strengths whenever wanted.
    *
    * Precondition: comparisons arrive whole (each batch carries complete
    * preference rows, e.g. a day of annotations) — the pair construction
    * upstream ([[preferencePairs]]) must run per batch on complete user
    * windows or on an explicitly windowed log. */
  def absorbPrefsBatch(spark: SparkSession, stateDir: String, batchId: Long,
                       prefs: DataFrame): DataFrame = {
    val (latest, lastId) = BatchState.load(spark, stateDir)
    val replay = lastId.exists(_ >= batchId)
    val base = if (replay) BatchState.load(spark, stateDir, Some(batchId))._1
               else latest
    val comp = prefs.groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n"),
        sum((col("winner") === col("item_a")).cast("long")).as("wins_a"))
    val merged = base.map(b => b.select("item_a", "item_b", "n", "wins_a")
        .unionByName(comp)).getOrElse(comp)
      .groupBy("item_a", "item_b")
      .agg(sum(col("n")).as("n"), sum(col("wins_a")).as("wins_a"))
      .localCheckpoint(true)
    if (!replay) BatchState.save(merged, stateDir, batchId)
    merged.withColumn("wins_b", col("n") - col("wins_a"))
  }

  /** Continuous statistic maintenance over a streaming preference source
    * — the [[Assoc.coocStream]] shape: each micro-batch of (item_a,
    * item_b, winner) rows absorbs into the committed pair-count state,
    * exactly-once across stop/restart (PrefsMetricsSpec drives it through
    * the real shard source with a mid-corpus kill). */
  def prefsStream(rows: DataFrame, stateDir: String)
                 (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(absorbPrefsBatch(batch.sparkSession, stateDir, id, batch))
    }

  // ---- driver gate ----------------------------------------------------

  private val GateIters = 12

  private def gatePrefs(s: SparkSession, dir: String): DataFrame =
    preferencePairs(SparkEntry.table(s, dir, "events"), col("user_id"),
      col("ts"), col("event_id"), col("event_type"), col("value"))

  val queries: Map[String, Q] = Map(
    // the sufficient statistic itself: per event-type pair, comparisons
    // and wins from each user's consecutive-event stream
    "bt_pairs" -> ((s, dir) => btPairs(gatePrefs(s, dir))),
    // 12 unrolled integer MM rounds — the oracle replays the identical
    // fixed-point recursion as CTEs, so the scores hash-match exactly
    "bt_scores" -> ((s, dir) =>
      btScores(s, btPairs(gatePrefs(s, dir)), iters = GateIters)),
    // z=2 Wilson bounds over the same statistic
    "win_rates" -> ((s, dir) => winRates(btPairs(gatePrefs(s, dir)))),
    // the maintained statistic after two user-atomic absorptions must
    // equal the one-shot bt_pairs — same oracle
    "bt_maintained" -> ((s, dir) => {
      val ev = SparkEntry.table(s, dir, "events")
      def half(m: Int) = preferencePairs(ev.where(col("user_id") % 2 === m),
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      val root = TmpIo.freshDir("btstate")
      try {
        absorbPrefsBatch(s, root.toString, 0L, half(0))
        absorbPrefsBatch(s, root.toString, 1L, half(1)).localCheckpoint(true)
      } finally TmpIo.deleteRecursively(root)
    }),
  )

  /** The pair construction + statistic, shared by both oracles. */
  private val PairSql: String =
    """seq AS (SELECT user_id,
      |    event_type AS a, lead(event_type) OVER w AS b,
      |    value AS va, lead(value) OVER w AS vb
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |pr AS (SELECT least(a, b) AS item_a, greatest(a, b) AS item_b,
      |    CASE WHEN va >= vb THEN a ELSE b END AS winner
      |  FROM seq WHERE b IS NOT NULL AND a <> b),
      |pc AS MATERIALIZED (SELECT item_a, item_b, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN winner = item_a THEN 1 ELSE 0 END) AS BIGINT)
      |      AS wins_a
      |  FROM pr GROUP BY 1, 2)""".stripMargin

  /** The bt_scores oracle: the same fixed-point MM recursion unrolled as
    * `GateIters` HUGEINT CTE rounds (floor division everywhere — DuckDB's
    * `//` on non-negative HUGEINTs is the same floor division BigInt
    * performs driver-side). */
  private lazy val BtScoresOracle: String = {
    val S = FixedScale
    val iterCtes = (1 to GateIters).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (SELECT d.i, sum((d.n * $S * $S) // (si.s + sj.s)) AS den
         |  FROM dir d JOIN s$p si ON si.i = d.i JOIN s$p sj ON sj.i = d.j
         |  GROUP BY 1),
         |r$t AS MATERIALIZED (SELECT w.i, (w.w * $S * $S) // d$t.den AS raw
         |  FROM wins w JOIN d$t ON d$t.i = w.i),
         |t$t AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS k, sum(raw) AS sr
         |  FROM r$t),
         |s$t AS MATERIALIZED (SELECT i, greatest((raw * k * $S) // sr, 1) AS s
         |  FROM r$t, t$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH $PairSql,
       |dir AS MATERIALIZED (SELECT item_a AS i, item_b AS j, CAST(n AS HUGEINT) AS n FROM pc
       |        UNION ALL
       |        SELECT item_b, item_a, CAST(n AS HUGEINT) FROM pc),
       |wins AS MATERIALIZED (SELECT i, CAST(sum(w) AS HUGEINT) AS w,
       |    CAST(sum(n) AS HUGEINT) AS g
       |  FROM (SELECT item_a AS i, wins_a AS w, n FROM pc
       |        UNION ALL
       |        SELECT item_b, n - wins_a, n FROM pc)
       |  GROUP BY 1),
       |s0 AS MATERIALIZED (SELECT i, CAST($S AS HUGEINT) AS s FROM wins),
       |$iterCtes
       |SELECT w.i AS item, CAST(w.g AS BIGINT) AS n_games,
       |  CAST(w.w AS BIGINT) AS n_wins,
       |  CAST(f.s AS BIGINT) AS score_scaled,
       |  CAST(CAST(f.s AS BIGINT) AS DOUBLE) / ${S.toDouble} AS score
       |FROM wins w JOIN s$GateIters f ON f.i = w.i""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "bt_pairs" ->
      s"""WITH $PairSql
         |SELECT item_a, item_b, n, wins_a, n - wins_a AS wins_b
         |FROM pc""".stripMargin,
    "bt_scores" -> BtScoresOracle,
    "bt_maintained" ->
      s"""WITH $PairSql
         |SELECT item_a, item_b, n, wins_a, n - wins_a AS wins_b
         |FROM pc""".stripMargin,
    // identical operation structure: z=2, every constant exact
    "win_rates" ->
      s"""WITH $PairSql
         |SELECT item_a, item_b, n, wins_a,
         |  CAST(wins_a AS DOUBLE) / CAST(n AS DOUBLE) AS rate_a,
         |  (CAST(wins_a AS DOUBLE) / CAST(n AS DOUBLE)
         |     + 4.0 / (2.0 * CAST(n AS DOUBLE))) / (1.0 + 4.0 / CAST(n AS DOUBLE))
         |  - (2.0 * sqrt(CAST(wins_a AS DOUBLE) / CAST(n AS DOUBLE)
         |        * (1.0 - CAST(wins_a AS DOUBLE) / CAST(n AS DOUBLE))
         |        / CAST(n AS DOUBLE)
         |      + 4.0 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |    / (1.0 + 4.0 / CAST(n AS DOUBLE)) AS wilson_lo_a,
         |  (CAST(wins_a AS DOUBLE) / CAST(n AS DOUBLE)
         |     + 4.0 / (2.0 * CAST(n AS DOUBLE))) / (1.0 + 4.0 / CAST(n AS DOUBLE))
         |  + (2.0 * sqrt(CAST(wins_a AS DOUBLE) / CAST(n AS DOUBLE)
         |        * (1.0 - CAST(wins_a AS DOUBLE) / CAST(n AS DOUBLE))
         |        / CAST(n AS DOUBLE)
         |      + 4.0 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |    / (1.0 + 4.0 / CAST(n AS DOUBLE)) AS wilson_hi_a
         |FROM pc""".stripMargin,
  )
}
