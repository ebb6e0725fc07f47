package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Mergeable Misra–Gries frequency sketch (Agarwal et al., "Mergeable
  * Summaries", PODS 2012): a bounded map of at most `2m` counters whose
  * prune step subtracts the (m+1)-th largest count from every counter and
  * drops the non-positives. Over any input split the total subtracted mass
  * is ≤ n/(m+1), so every item with true frequency > n/(m+1) SURVIVES with
  * a positive counter — the unconditional superset guarantee
  * [[Freq.heavyHitters]] builds on. Registered as a UDAF it partial-
  * aggregates: each input partition ships ≤ 2m (term, count) entries,
  * never its raw term stream.
  */
object MgSketch {
  /** The shared prune step — also the driver-side merge primitive of the
    * streaming state in [[Freq.absorbHhBatch]]. */
  private[ext] def prune(buf: Map[String, Long], m: Int): Map[String, Long] =
    if (buf.size <= m) buf
    else {
      // subtract the (m+1)-th largest count: at most m counters stay positive
      val delta = buf.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
      buf.collect { case (t, c) if c > delta => (t, c - delta) }
    }

  /** Counter-summing merge of two summaries, pruned back to ≤ m. */
  private[ext] def mergeMaps(a: Map[String, Long], b: Map[String, Long],
                             m: Int): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    prune(small.foldLeft(large) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }, m)
  }
}

class MgSketch(m: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(m > 0)
  override def zero: Map[String, Long] = Map.empty

  private def prune(buf: Map[String, Long]): Map[String, Long] =
    MgSketch.prune(buf, m)

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] = {
    val grown = buf.updated(term, buf.getOrElse(term, 0L) + 1L)
    // amortize the O(s log s) prune: let the map grow to 2m between prunes
    if (grown.size >= 2 * m) prune(grown) else grown
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    MgSketch.mergeMaps(a, b, m)

  override def finish(buf: Map[String, Long]): Map[String, Long] = prune(buf)
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}

/** Exact heavy hitters without a corpus-wide groupBy — the two-pass
  * sketch-then-recount classic:
  *
  *   1. ONE narrow pass folds every partition into a [[MgSketch]] (≤ 2m
  *      counters per partition cross the wire) plus the exact item total.
  *      The sketch's survivor set is a GUARANTEED superset of every item
  *      with true frequency > n/(m+1).
  *   2. The bounded candidate set (≤ 2m strings, the same driver-state
  *      acceptance as IVF centroids) comes back as a scan-time `isin`
  *      filter; only candidate occurrences reach the exact recount
  *      aggregation, and the final cut keeps items with `cnt · m > n` —
  *      strictly above the guarantee threshold, so the output equals the
  *      full-groupBy answer EXACTLY, by construction, on any input.
  *
  * At 100 TB the difference is shuffling ≤ 2m rows per partition twice
  * versus hash-exchanging every distinct term's partial count — on a
  * heavy-tailed term domain (the regime where you'd ask for heavy hitters)
  * that's the whole distinct-term table. The integer comparison
  * `cnt * m > n` keeps the threshold float-free on both engines.
  */
object Freq {
  private type Q = (SparkSession, String) => DataFrame

  /** Heavy hitters of `terms` (one string column named `term`).
    *
    * `audit = true` (driver-gate mode): all terms with count > n/m
    * EXACTLY, via MG candidates + bounded recount — the second corpus
    * pass exists to turn the sketch's superset into the exact answer the
    * oracle can verify.
    *
    * `audit = false` (production mode): the ONE-pass sketch shape a
    * 100 TB deployment runs — every candidate whose upper bound
    * `cnt_min + n/(m+1)` clears n/m, as `(term, cnt_min, cnt_max)`. A
    * guaranteed superset of the true heavy set with per-term count
    * bounds; the exact recount is exactly the pass the sketch exists to
    * avoid (the [[slidingDistinct]] audit-vs-production split). Plan
    * shape pinned in PlanSpec: one aggregation job, no recount scan. */
  def heavyHitters(terms: DataFrame, m: Int,
                   audit: Boolean = true): DataFrame = {
    import terms.sparkSession.implicits._
    val mg = udaf(new MgSketch(m), org.apache.spark.sql.Encoders.STRING)
    val sketchRow = terms
      .agg(mg(col("term")).as("sketch"), count(lit(1)).as("n"))
      .head()
    val sketch = sketchRow.getMap[String, Long](0)
    val n = sketchRow.getLong(1)
    if (audit) {
      terms
        .where(col("term").isInCollection(sketch.keys.toSeq))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * m > n)
    } else {
      val err = n / (m + 1)
      sketch.toSeq.map { case (t, c) => (t, c, c + err) }
        .toDF("term", "cnt_min", "cnt_max")
        .where(col("cnt_max") * m > n)
    }
  }

  /** Bounded-oracle audit of the production MG sketch (r17, VERDICT r16
    * item 5 — turns the board's one `no_oracle` gate into an oracle-gated
    * one): runs the SAME one-pass production sketch as
    * `heavyHitters(audit = false)`, then recounts exactly and emits the
    * DETERMINISTIC true heavy set `(term, true_cnt)` with two
    * engine-asserted MG-guarantee booleans —
    *
    *  - `captured`: the true heavy term appeared among the sketch
    *    candidates (MG recall guarantee — candidates are a superset of
    *    every term with count > n/m);
    *  - `within_bounds`: `cnt_min ≤ true_cnt ≤ cnt_min + n/(m+1)` (the
    *    MG undercount bound).
    *
    * Raw `cnt_min` values are merge-order-dependent, so they can never
    * hash-match a cross-engine oracle; the booleans are guaranteed TRUE
    * by the MG theorem, so a DuckDB oracle computes the exact heavy set
    * and pins literal TRUEs — any sketch defect flips a boolean or drops
    * a row and fails the gate (the approx_distinct/sliding_distinct
    * audit-gate pattern). The exact recount exists only for the
    * assertion; the pure production shape stays `audit = false`,
    * plan-pinned in PlanSpec. */
  def heavyHittersBounded(terms: DataFrame, m: Int): DataFrame = {
    import terms.sparkSession.implicits._
    val mg = udaf(new MgSketch(m), org.apache.spark.sql.Encoders.STRING)
    val sketchRow = terms
      .agg(mg(col("term")).as("sketch"), count(lit(1)).as("n"))
      .head()
    val sketch = sketchRow.getMap[String, Long](0)
    val n = sketchRow.getLong(1)
    val err = n / (m + 1)
    val skDf = broadcast(sketch.toSeq.toDF("term", "cnt_min"))
    terms.groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .where(col("true_cnt") * m > n)
      .join(skDf, Seq("term"), "left")
      .select(col("term"), col("true_cnt"),
        col("cnt_min").isNotNull.as("captured"),
        coalesce(col("cnt_min") <= col("true_cnt") &&
          col("true_cnt") <= col("cnt_min") + err, lit(false)).as("within_bounds"))
  }

  /** Word 3-grams of the documents corpus, one row per occurrence. The
    * sliding window is a narrow transform over the materialized token
    * array (the [[Hygiene]] HOF posture — never re-split inside a lambda). */
  private[graft] def trigrams(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    // spread first (r17): a one-file corpus otherwise runs the whole
    // gram explosion + sketch partial-aggregation single-task
    Dedup.spread(docs)
      .select(w.as("w"))
      .select(explode(when(size(col("w")) >= 3,
        transform(sequence(lit(1), size(col("w")) - 2), i =>
          concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1),
            element_at(col("w"), i + 2))))
        .otherwise(array().cast("array<string>"))).as("term"))
  }

  // ── streaming heavy hitters: persisted MG state over continuous ingest ──
  //
  // State layout under `stateDir`: one parquet snapshot per absorbed batch
  // at `batch=<id>/` with rows (term, cnt, n_total) — a NULL-term sentinel
  // row always carries n_total so an all-pruned (empty) sketch still
  // round-trips. The loader picks the highest batch id with a _SUCCESS
  // marker, so a crash mid-write is invisible; a Structured Streaming
  // RETRY of an already-absorbed batch id is detected and skipped
  // (absorption is idempotent — the dedupStream crash-safety discipline).
  // Unlike the batch [[heavyHitters]], the stream cannot recount exactly:
  // emitted rows carry the MG bounds [cnt_min, cnt_max] (true frequency is
  // within them by the n/(m+1) error bound) and include every term whose
  // cnt_max clears the n/m threshold — a GUARANTEED superset of the true
  // heavy set at every point in the stream.

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (sketch, exact running total, highest absorbed batch id). */
  def loadHhState(spark: SparkSession, stateDir: String): (Map[String, Long], Long, Option[Long]) = {
    val f = fs(spark, stateDir)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    if (!f.exists(root)) return (Map.empty, 0L, None)
    val done = f.listStatus(root).map(_.getPath).filter(p =>
      p.getName.startsWith("batch=") &&
        f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
    if (done.isEmpty) return (Map.empty, 0L, None)
    val latest = done.maxBy(_.getName.stripPrefix("batch=").toLong)
    val rows = spark.read.parquet(latest.toString).collect()
    val n = rows.head.getLong(2)
    val sketch = rows.filter(!_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1)).toMap
    (sketch, n, Some(latest.getName.stripPrefix("batch=").toLong))
  }

  private def saveHhState(spark: SparkSession, stateDir: String, batchId: Long,
                          sketch: Map[String, Long], n: Long): Unit = {
    import spark.implicits._
    val rows = (None: Option[String], 0L, n) +:
      sketch.toSeq.map { case (t, c) => (Some(t), c, n) }
    rows.toDF("term", "cnt", "n_total").coalesce(1)
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    // retire superseded snapshots (keep only the one just written)
    val f = fs(spark, stateDir)
    f.listStatus(new org.apache.hadoop.fs.Path(stateDir)).map(_.getPath)
      .filter(p => p.getName.startsWith("batch=") &&
        p.getName.stripPrefix("batch=").toLong != batchId)
      .foreach(p => f.delete(p, true))
  }

  /** Absorb one micro-batch of `terms` into the persisted sketch and return
    * the current candidate table `(term, cnt_min, cnt_max)` — every term
    * whose upper bound clears n/m (superset of the true heavy set). */
  def absorbHhBatch(spark: SparkSession, stateDir: String, batchId: Long,
                    terms: DataFrame, m: Int): DataFrame = {
    import spark.implicits._
    // load state FIRST: a replayed batch must not pay the sketch
    // aggregation job only to discard its result
    val (sketch0, n0, lastId) = loadHhState(spark, stateDir)
    val (sketch, n) =
      if (lastId.exists(_ >= batchId)) (sketch0, n0) // replayed batch: no-op
      else {
        val mg = udaf(new MgSketch(m), org.apache.spark.sql.Encoders.STRING)
        val row = terms.agg(mg(col("term")).as("s"), count(lit(1)).as("n")).head()
        val merged = MgSketch.mergeMaps(sketch0,
          row.getMap[String, Long](0).toMap, m)
        val total = n0 + row.getLong(1)
        saveHhState(spark, stateDir, batchId, merged, total)
        (merged, total)
      }
    val err = if (m + 1 > 0) n / (m + 1) else 0L
    sketch.toSeq.map { case (t, c) => (t, c, c + err) }
      .toDF("term", "cnt_min", "cnt_max")
      .where(col("cnt_max") * m > n)
  }

  /** Continuous heavy-hitter tracking over a streaming `terms` source (one
    * string column `term`): foreachBatch → absorb into the persisted MG
    * state → hand the current candidate table to `sink`. */
  def heavyHittersStream(terms: DataFrame, stateDir: String, m: Int)
                        (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    terms.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(absorbHhBatch(batch.sparkSession, stateDir, id, batch, m))
    }

  /** Count-Min sketch counters (Cormode & Muthukrishnan 2005) — the THIRD
    * sketch of the frequency family (HLL: distinct counts, MG: heavy-hitter
    * identification, CMS: point-frequency ESTIMATES for any later probe):
    * `depth × width` integer counters, term t increments counter
    * `(r, hash_r(t) mod width)` in every row r. Mergeable by plain counter
    * addition, fixed memory regardless of the distinct-term count.
    *
    * One partial-aggregated groupBy over (row, bucket) — ≤ depth·width
    * groups ship per partition, never the distinct-term table. Hashes are
    * the engine's [[Hygiene.hashU64]] (row-salted sha256), so the counter
    * table — and therefore every estimate — is bit-reproducible
    * cross-engine: the DRIVER gate compares estimates exactly, while the
    * probabilistic `est ≤ true + εn` envelope is spec territory. */
  def cmsCounters(terms: DataFrame, depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")
    terms
      .select(col("term"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), pmod(Hygiene.hashU64(
        concat(col("r").cast("string"), lit(":"), col("term"))), lit(width.toLong))
        .as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` against [[cmsCounters]]: the classic
    * min-over-rows lookup, returned next to the exact count so the
    * overcount is inspectable (`est ≥ true` unconditionally; collisions
    * only ever ADD). The probe set is tiny and broadcasts; the exact
    * column costs one `isin`-pruned aggregation over the stream. */
  def cmsEstimates(terms: DataFrame, probes: Seq[String],
                   depth: Int = 4, width: Int = 512): DataFrame = {
    require(probes.nonEmpty, "need at least one probe term")
    val spark = terms.sparkSession
    import spark.implicits._
    val counters = cmsCounters(terms, depth, width)
    val probeBuckets = probes.toDF("term")
      .select(col("term"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("term"), col("r"), pmod(Hygiene.hashU64(
        concat(col("r").cast("string"), lit(":"), col("term"))), lit(width.toLong))
        .as("bucket"))
    val est = broadcast(probeBuckets)
      .join(counters, Seq("r", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("term").agg(min(col("cnt")).as("est"))
    val exact = terms.where(col("term").isin(probes: _*))
      .groupBy("term").agg(count(lit(1)).as("true_cnt"))
    est.join(exact, Seq("term"), "left").na.fill(0L, Seq("true_cnt"))
      .select(col("term"), col("est"), col("true_cnt"),
        (col("est") - col("true_cnt")).as("overcount"))
  }

  /** Approximate distinct cardinality per group via Spark's native
    * HyperLogLog++ (`approx_count_distinct`, relative error `rsd`) — the
    * sketch every corpus dashboard uses where an exact distinct would
    * shuffle the full key domain ("distinct users per event type over
    * 100 TB" in one partial-agged pass of fixed-size sketch buffers).
    * `audit = true` ALSO computes the exact count and a within-5%% flag —
    * the mode the driver gate runs (the oracle asserts the flag, so an
    * HLL regression past the band turns the row red); production at
    * scale runs `audit = false`, where the plan contains no exact
    * count-distinct expansion at all. */
  def approxDistinct(df: DataFrame, group: Column, key: Column,
                     rsd: Double = 0.01, audit: Boolean = false): DataFrame = {
    val base = df.groupBy(group.as("grp"))
    if (!audit) base.agg(approx_count_distinct(key, rsd).as("approx_nd"))
    else base.agg(approx_count_distinct(key, rsd).as("approx_nd"),
        countDistinct(key).as("exact_nd"))
      .select(col("grp"), col("exact_nd"),
        (abs(col("approx_nd") - col("exact_nd")).cast("double") <=
          col("exact_nd").cast("double") * 0.05).as("within_5pct"))
  }

  /** Approximate quantiles per group via Spark's native Greenwald–Khanna
    * sketch (`percentile_approx`, rank error ≤ 1/`accuracy`) — the
    * distribution summary every corpus dashboard needs where an exact
    * quantile would globally sort the value domain. The sketch is a
    * MERGEABLE fixed-size buffer: partial-agged per partition, merged on
    * the reduce side, so "p50/p90/p99 of document length over 100 TB" is
    * one pass of bounded executor state — the [[approxDistinct]] posture
    * for ranks instead of cardinality.
    *
    * `audit = true` (the driver-gate mode) ALSO makes one exact pass that
    * brackets each returned value's true rank interval `[rank_lt+1,
    * rank_le]` and flags whether it intersects the promised band
    * `[(p−ε)·n, (p+ε)·n]` with ε = 10/accuracy (10× guarantee headroom —
    * a sketch regression turns the row red, tie-heavy distributions
    * don't). The interval test, not a point test: with heavy ties
    * `rank_le` alone can exceed the band for a CORRECT answer. Production
    * runs `audit = false`, whose plan contains no exact pass at all. */
  def approxQuantiles(df: DataFrame, group: Column, value: Column,
                      probs: Seq[Double], accuracy: Int = 1000,
                      audit: Boolean = false): DataFrame = {
    val probsLit = array(probs.map(lit): _*)
    val approx = df.groupBy(group.as("grp"))
      .agg(percentile_approx(value, probsLit, lit(accuracy)).as("__qs"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("n"), posexplode(col("__qs")).as(Seq("__i", "__q")))
      .select(col("grp"), col("n"), element_at(probsLit, col("__i") + 1).as("p"),
        col("__q").as("approx_q"))
    if (!audit) approx
    else {
      val eps = 10.0 / accuracy
      val ranks = df.select(group.as("grp"), value.as("__v"))
        .join(approx, Seq("grp"))
        .groupBy(col("grp"), col("p"), col("n"))
        .agg(sum((col("__v") <= col("approx_q")).cast("long")).as("__le"),
          sum((col("__v") < col("approx_q")).cast("long")).as("__lt"))
      ranks.select(col("grp"), col("p"), col("n"),
        (col("__le").cast("double") >= (col("p") - eps) * col("n").cast("double") &&
          (col("__lt") + 1).cast("double") <= (col("p") + eps) * col("n").cast("double"))
          .as("within_band"))
    }
  }

  /** MAINTAINED per-group distinct-cardinality sketches over continuous
    * ingest — "distinct users per event type, ever" without ever
    * re-scanning history: state is one Apache DataSketches HLL sketch per
    * group (Spark 4's native `hll_sketch_agg` binary, a few KB each),
    * absorption unions the incoming batch's sketches into the stored ones
    * (`hll_union_agg`). Union carries the HLL accuracy guarantee but is
    * NOT bit-equal to a one-shot sketch of the union (the merged sketch
    * can sit in a different internal mode) — both land within the same
    * error band of truth, which is the contract the gate audits. The
    * [[graft.ext.Assoc.absorbCoocBatch]]
    * snapshot posture: `_SUCCESS`-gated commits, replays recompute
    * against the pre-batch snapshot — exactly-once state.
    *
    * This is the sketch-as-state pattern every 100 TB dashboard needs:
    * the alternative — a maintained exact distinct — would keep the full
    * key domain in state. Returns the maintained sketch table; call
    * [[hllEstimates]] for numbers. */
  def absorbHllBatch(spark: SparkSession, stateDir: String, batchId: Long,
                     rows: DataFrame, group: Column, key: Column): DataFrame = {
    val (latest, lastId) = BatchState.load(spark, stateDir)
    val replay = lastId.exists(_ >= batchId)
    val base = if (replay) BatchState.load(spark, stateDir, Some(batchId))._1
               else latest
    val comp = rows.groupBy(group.as("grp")).agg(hll_sketch_agg(key).as("sk"))
    val merged = base.map(_.unionByName(comp)).getOrElse(comp)
      .groupBy("grp").agg(hll_union_agg(col("sk")).as("sk"))
      .localCheckpoint(true)
    if (!replay) BatchState.save(merged, stateDir, batchId)
    merged
  }

  /** Trailing-window distinct cardinality per group per day — "distinct
    * users in the trailing `windowDays` days, for every day" — via DAILY
    * HLL sketches re-unioned over a range frame. The exact version of
    * this dashboard staple is quadratic state at 100 TB (every day
    * re-counts up to W days of raw keys); here the corpus collapses ONCE
    * to |groups|·|days| fixed-size sketches, and the window pass unions
    * W sketch buffers per output row — no raw key is ever touched twice.
    *
    * `audit = true` (driver-gate mode) joins the exact trailing distinct
    * (affordable at test scale, the thing this operator exists to avoid
    * at production scale) and asserts the HLL 5% band — the
    * [[approxDistinct]] contract. */
  def slidingDistinct(df: DataFrame, group: Column, tsCol: Column,
                      key: Column, windowDays: Int = 7,
                      audit: Boolean = false): DataFrame = {
    require(windowDays >= 1, "window must be at least one day")
    val day = floor(unix_micros(tsCol) / lit(86400000000L))
    // spread first (r17): the daily-sketch map side over a one-file event
    // log otherwise runs single-task
    val base = Dedup.spread(df).select(group.as("grp"), day.as("day"), key.as("__k"))
    val daily = base.groupBy("grp", "day").agg(hll_sketch_agg(col("__k")).as("sk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("day").asc)
      .rangeBetween(-(windowDays - 1L), 0L)
    val est = daily
      .withColumn("__u", hll_union_agg(col("sk")).over(w))
      .select(col("grp"), col("day"),
        hll_sketch_estimate(col("__u")).as("approx_nd"))
    if (!audit) est
    else {
      val days = daily.select(col("grp").as("__g"), col("day").as("__d"))
      // NOT pre-distinct'd (r19 paired A/B: base.distinct() before this
      // join measured 1.25 → 1.32 s): the gate's events rarely repeat a
      // (grp, day, key) triple, so the extra exchange round outweighs the
      // explosion rows it would save; re-measure on repeat-heavy logs.
      val exact = base.join(broadcast(days),
          col("grp") === col("__g") &&
            col("day") >= col("__d") - (windowDays - 1) &&
            col("day") <= col("__d"))
        .groupBy(col("grp"), col("__d").as("day"))
        .agg(countDistinct(col("__k")).as("exact_nd"))
      est.join(exact, Seq("grp", "day"))
        .select(col("grp"), col("day"), col("exact_nd"),
          (abs(col("approx_nd") - col("exact_nd")).cast("double") <=
            col("exact_nd").cast("double") * 0.05).as("within_5pct"))
    }
  }

  /** Cardinality estimates from a maintained sketch table; `audit`
    * (driver-gate mode) joins an exact distinct of the full corpus and
    * asserts the 5% band, the [[approxDistinct]] contract. */
  def hllEstimates(state: DataFrame, exact: Option[DataFrame] = None): DataFrame = {
    val est = state.select(col("grp"),
      hll_sketch_estimate(col("sk")).as("approx_nd"))
    exact match {
      case None => est
      case Some(ex) => est.join(ex, Seq("grp"))
        .select(col("grp"), col("exact_nd"),
          (abs(col("approx_nd") - col("exact_nd")).cast("double") <=
            col("exact_nd").cast("double") * 0.05).as("within_5pct"))
    }
  }

  /** Join-skew diagnosis: the `topK` hottest values of a key column with
    * their absolute counts, corpus share, and cumulative share — the
    * table that decides whether a join needs [[graft.ext.Joins
    * .saltedJoin]] (or AQE skew splitting), and with how many salts. One
    * partial-agged groupBy, then a PER-PARTITION top-k prefilter (each key
    * appears on exactly one partition after the groupBy, so the global
    * top-k is a subset of the per-partition top-ks); only the ≤
    * nPartitions·topK survivors reach the final rank + cumulative window
    * — the single-task stage is bounded by topK, never the key domain.
    * Counts integer, each share one division. */
  def skewReport(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    val total = df.count()
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("n"), asc("key"))
    val cands = counts.withColumn("pid", spark_partition_id())
      .withColumn("prank", row_number().over(wp)).where(col("prank") <= topK)
      .drop("pid", "prank")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("n"), asc("key"))
    val cw = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cands.withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
      .withColumn("cum_n", sum(col("n")).over(cw))
      .select(col("rank").cast("long").as("rank"), col("key"), col("n"),
        (col("n").cast("double") / lit(total.toDouble)).as("share"),
        (col("cum_n").cast("double") / lit(total.toDouble)).as("cum_share"))
  }

  /** Fixed probe terms for the driver gate: two corpus trigrams that exist
    * at every scale factor plus one absent phrase (est may still be > 0 —
    * pure collision mass — and true_cnt is 0). */
  val GateCmsProbes: Seq[String] = Seq("table table table", "fast scan query",
    "no such trigram")

  val queries: Map[String, Q] = Map(
    // distinct users per event type: the oracle asserts the HLL lands
    // within the 5%% band of the exact count
    "approx_distinct" -> ((s, dir) =>
      approxDistinct(SparkEntry.table(s, dir, "events"), col("event_type"),
        col("user_id"), audit = true)),
    "skew_report" -> ((s, dir) =>
      skewReport(SparkEntry.table(s, dir, "events"), col("user_id"))),
    // two event-id-parity absorptions, then estimates vs the exact
    // distinct of the union — the oracle asserts the 5% band
    "hll_maintained" -> ((s, dir) => {
      val ev = SparkEntry.table(s, dir, "events")
      val root = TmpIo.freshDir("hllstate")
      val state = try {
        absorbHllBatch(s, root.toString, 0L,
          ev.where(col("event_id") % 2 === 0), col("event_type"),
          col("user_id"))
        absorbHllBatch(s, root.toString, 1L,
          ev.where(col("event_id") % 2 === 1), col("event_type"),
          col("user_id")).localCheckpoint(true)
      } finally TmpIo.deleteRecursively(root)
      hllEstimates(state, Some(ev.groupBy(col("event_type").as("grp"))
        .agg(countDistinct(col("user_id")).as("exact_nd"))))
    }),
    // trailing-7-day distinct users per event type per day; the oracle
    // asserts the 5% band against the exact trailing distinct
    "sliding_distinct" -> ((s, dir) =>
      slidingDistinct(SparkEntry.table(s, dir, "events"), col("event_type"),
        col("ts"), col("user_id"), windowDays = 7, audit = true)),
    // p50/p90/p99 of event value per type: the oracle asserts each GK
    // answer's true rank interval intersects the promised band
    "approx_quantiles" -> ((s, dir) =>
      approxQuantiles(SparkEntry.table(s, dir, "events"), col("event_type"),
        col("value"), Seq(0.5, 0.9, 0.99), audit = true)),
    "cms_estimate" -> ((s, dir) =>
      cmsEstimates(trigrams(SparkEntry.table(s, dir, "documents")), GateCmsProbes)),
    // m = 4096 over the ~16k-distinct trigram domain: the sketch MUST prune
    // (so the gate exercises the guarantee, not just the plumbing), and the
    // sf0.01 corpus has a handful of grams above n/4096
    "heavy_hitters" -> ((s, dir) =>
      heavyHitters(trigrams(SparkEntry.table(s, dir, "documents")), m = 4096)
        .select(col("term"), col("cnt"))),
    // the production sketch + the bounded-oracle audit (r17, VERDICT r16
    // item 5): the gate emits the deterministic exact heavy set with the
    // MG recall/bound guarantees asserted as booleans, so a DuckDB oracle
    // pins it exactly (raw cnt_min is merge-order-dependent and can
    // never hash-match). The bench therefore times sketch + recount —
    // deliberate audit work, like sliding_distinct's gate (the pure
    // one-pass shape stays heavyHitters(audit = false), PlanSpec-pinned)
    "heavy_hitters_prod" -> ((s, dir) =>
      heavyHittersBounded(trigrams(SparkEntry.table(s, dir, "documents")),
        m = 4096)),
  )

  val oracleSql: Map[String, String] = Map(
    "approx_distinct" ->
      """SELECT event_type AS grp, count(DISTINCT user_id) AS exact_nd,
        |  CAST(TRUE AS BOOLEAN) AS within_5pct
        |FROM events GROUP BY 1""".stripMargin,
    "hll_maintained" ->
      """SELECT event_type AS grp, count(DISTINCT user_id) AS exact_nd,
        |  CAST(TRUE AS BOOLEAN) AS within_5pct
        |FROM events GROUP BY 1""".stripMargin,
    "sliding_distinct" ->
      """WITH e AS (SELECT event_type AS grp,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT)
        |      AS d,
        |    user_id AS k FROM events),
        |days AS (SELECT DISTINCT grp, d FROM e)
        |SELECT days.grp AS grp, days.d AS day,
        |  count(DISTINCT e.k) AS exact_nd,
        |  CAST(TRUE AS BOOLEAN) AS within_5pct
        |FROM days JOIN e ON e.grp = days.grp AND e.d BETWEEN days.d - 6 AND days.d
        |GROUP BY 1, 2""".stripMargin,
    "approx_quantiles" ->
      """SELECT event_type AS grp, count(*) AS n, p.p AS p,
        |  CAST(TRUE AS BOOLEAN) AS within_band
        |FROM events, (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
        |              (CAST(0.99 AS DOUBLE))) AS p(p)
        |GROUP BY 1, 3""".stripMargin,
    "skew_report" ->
      """WITH t AS (SELECT count(*) AS total FROM events),
        |c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT key, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank,
        |  CAST(sum(n) OVER (ORDER BY n DESC, key
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        |  FROM c)
        |SELECT rank, key, n,
        |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
        |  CAST(cum_n AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
        |FROM r, t WHERE rank <= 10""".stripMargin,
    // same row-salted sha hash, same counter table, same min-over-rows
    "cms_estimate" ->
      """WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT w[g.i] || ' ' || w[g.i+1] || ' ' || w[g.i+2] AS term
        |      FROM d, LATERAL unnest(range(1, greatest(len(w) - 1, 1))) AS g(i)),
        |e AS (SELECT term, r.r AS r,
        |        CAST(('0x' || substring(sha256(CAST(r.r AS VARCHAR) || ':' || term), 1, 8))
        |          AS BIGINT) % 512 AS bucket
        |      FROM g, LATERAL unnest(range(0, 4)) AS r(r)),
        |c AS (SELECT r, bucket, count(*) AS cnt FROM e GROUP BY 1, 2),
        |p(term) AS (VALUES ('table table table'), ('fast scan query'),
        |                   ('no such trigram')),
        |pb AS (SELECT term, r.r AS r,
        |        CAST(('0x' || substring(sha256(CAST(r.r AS VARCHAR) || ':' || term), 1, 8))
        |          AS BIGINT) % 512 AS bucket
        |      FROM p, LATERAL unnest(range(0, 4)) AS r(r)),
        |est AS (SELECT pb.term, min(COALESCE(c.cnt, 0)) AS est
        |        FROM pb LEFT JOIN c ON c.r = pb.r AND c.bucket = pb.bucket
        |        GROUP BY pb.term),
        |ex AS (SELECT term, count(*) AS true_cnt FROM g
        |       WHERE term IN ('table table table', 'fast scan query', 'no such trigram')
        |       GROUP BY term)
        |SELECT est.term, est.est, CAST(COALESCE(ex.true_cnt, 0) AS BIGINT) AS true_cnt,
        |  est.est - CAST(COALESCE(ex.true_cnt, 0) AS BIGINT) AS overcount
        |FROM est LEFT JOIN ex USING (term)""".stripMargin,
    // the oracle is the full groupBy the two-pass form provably equals
    "heavy_hitters" ->
      """WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT w[g.i] || ' ' || w[g.i+1] || ' ' || w[g.i+2] AS term
        |      FROM d, LATERAL unnest(range(1, greatest(len(w) - 1, 1))) AS g(i)),
        |c AS (SELECT term, count(*) AS cnt FROM g GROUP BY term),
        |n AS (SELECT count(*) AS total FROM g)
        |SELECT term, cnt FROM c, n WHERE cnt * 4096 > total""".stripMargin,
    // the exact heavy set with the two MG-guarantee booleans pinned to
    // TRUE (the theorem guarantees both; the engine ASSERTS them per
    // term — see heavyHittersBounded)
    "heavy_hitters_prod" ->
      """WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT w[g.i] || ' ' || w[g.i+1] || ' ' || w[g.i+2] AS term
        |      FROM d, LATERAL unnest(range(1, greatest(len(w) - 1, 1))) AS g(i)),
        |c AS (SELECT term, count(*) AS true_cnt FROM g GROUP BY term),
        |n AS (SELECT count(*) AS total FROM g)
        |SELECT term, true_cnt,
        |  CAST(TRUE AS BOOLEAN) AS captured,
        |  CAST(TRUE AS BOOLEAN) AS within_bounds
        |FROM c, n WHERE true_cnt * 4096 > total""".stripMargin,
  )
}
