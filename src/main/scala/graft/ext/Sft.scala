package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Instruction-tuning (SFT) data preparation: render multi-turn
  * conversations into a single training string per conversation with a
  * chat template, and emit the LOSS-MASK character spans covering the
  * assistant turns — the two artifacts a supervised fine-tuning dataloader
  * consumes (loss is computed on assistant tokens only; user/system turns
  * are context).
  *
  * The whole operator is ONE co-partitioning shuffle on the conversation
  * key: turn offsets come from a running-sum window (the
  * [[Hygiene.packSequences]] shape), and the final per-conversation
  * concatenation orders by the offset INSIDE `array_sort` — deterministic
  * by construction, never relying on `collect_list`'s physical row order.
  * Conversations are bounded (a context window's worth of turns), so the
  * per-group state is bounded regardless of corpus size.
  */
object Sft {
  private type Q = (SparkSession, String) => DataFrame

  /** Per-turn rendering: `<|role|>content<|end|>`. Roles derive from the
    * event taxonomy (demand events are the "user" side, outcome events the
    * "assistant" side); a real deployment maps its own role column. */
  private def roleCol: Column =
    when(col("event_type").isin("purchase", "error"), lit("assistant"))
      .otherwise(lit("user"))

  private def turns(events: DataFrame, convCol: String): DataFrame = {
    val piece = concat(lit("<|"), col("role"), lit("|>"), col("content"), lit("<|end|>"))
    val w = Window.partitionBy("conv_id").orderBy(col("ts"), col("ord"))
    events
      .select(col(convCol).as("conv_id"), col("ts"), col("ord"),
        col("role"), col("content"))
      .withColumn("piece", piece)
      .withColumn("len", length(col("piece")).cast("long"))
      .withColumn("off",
        coalesce(sum(col("len")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("long"))
  }

  /** One row per conversation: the rendered training string plus turn and
    * loss accounting. `text` concatenates pieces by ascending offset via
    * `array_sort` over (off, piece) structs — offsets are unique within a
    * conversation, so the result is deterministic on any physical order. */
  def renderConversations(events: DataFrame, convCol: String): DataFrame =
    turns(events, convCol)
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        array_join(transform(array_sort(collect_list(struct(col("off"), col("piece")))),
          x => x.getField("piece")), "").as("text"),
        sum(when(col("role") === "assistant", col("len")).otherwise(0L)).as("loss_chars"))

  /** One row per ASSISTANT turn: 0-based character span [span_start,
    * span_end) of the turn's rendered piece inside the conversation's
    * `text` — the loss mask the dataloader applies. */
  def lossSpans(events: DataFrame, convCol: String): DataFrame =
    turns(events, convCol)
      .where(col("role") === "assistant")
      .select(col("conv_id"), col("turn_idx"),
        col("off").as("span_start"), (col("off") + col("len")).as("span_end"))

  /** Fill-in-the-middle transformation (Bavarian et al. 2022 — the
    * pretraining objective of every code model): split each document's
    * token sequence at two deterministic cut points and emit the PSM
    * (prefix, suffix, middle) reordering with sentinel markers, so the
    * model learns to infill. Cut points derive from [[Hygiene.hashU64]]
    * of the doc id (reproducible across runs/engines — the corpus can be
    * re-materialized identically for a resumed training run); the
    * transform itself is a narrow scan-time projection.
    *
    * Emits (doc_id, n_tokens, cut1, cut2, text_fim) with
    * `text_fim = <PRE> prefix <SUF> suffix <MID> middle`. */
  def fimTransform(docs: DataFrame): DataFrame = {
    val n = size(col("__w"))
    // cut1 uniform in [0, n], cut2 uniform in [cut1, n] — integer exact
    val c1 = pmod(Hygiene.hashU64(concat(col("doc_id").cast("string"), lit(":fim1"))),
      (n + 1).cast("long"))
    val c2 = c1 + pmod(Hygiene.hashU64(concat(col("doc_id").cast("string"), lit(":fim2"))),
      (n.cast("long") - c1 + 1L))
    docs
      .select(col("doc_id"), split(col("text"), " ").as("__w"))
      .select(col("doc_id"), col("__w"), n.cast("long").as("n_tokens"),
        c1.as("cut1"), c2.as("cut2"))
      .select(col("doc_id"), col("n_tokens"), col("cut1"), col("cut2"),
        concat(lit("<PRE>"),
          concat_ws(" ", slice(col("__w"), lit(1), col("cut1").cast("int"))),
          lit("<SUF>"),
          concat_ws(" ", slice(col("__w"), (col("cut2") + 1).cast("int"),
            (col("n_tokens") - col("cut2")).cast("int"))),
          lit("<MID>"),
          concat_ws(" ", slice(col("__w"), (col("cut1") + 1).cast("int"),
            (col("cut2") - col("cut1")).cast("int")))).as("text_fim"))
  }

  /** Integer threshold for the span-start Bernoulli decision: the
    * comparison `hashU64 < SpanStartThresh` fires at rate
    * `SpanStartRate` — computed ONCE and interpolated into both dialects
    * so the decision boundary is a pure integer compare (the
    * [[Hygiene.weightedSample]] posture). */
  val SpanStartRate = 0.05
  val SpanMeanLen = 3
  val SpanStartThresh: Long = (SpanStartRate * 4294967296.0).toLong

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): deterministic
    * denoising-objective data prep — mask random token spans, emit one row
    * per masked span `(doc_id, span_idx, span_start, span_end,
    * span_text)`; the dataloader renders inputs (spans → sentinels) and
    * targets (sentinel + span text) from this table. Span starts fire at
    * [[SpanStartRate]] per token from a position-salted hash; lengths are
    * uniform `1..2·mean−1`; an overlapping next start TRUNCATES the
    * current span (so spans never overlap and every start yields a span —
    * closed-form from the hash stream, no sequential state). Fully
    * deterministic from (doc_id, position): the same corpus re-corrupts
    * identically on any engine, run, or partitioning — resumable
    * pretraining needs exactly this property. Narrow scan-time HOFs
    * throughout. */
  def spanCorruption(docs: DataFrame): DataFrame = {
    val n = size(col("__w"))
    def posHash(salt: String, p: Column): Column =
      Hygiene.hashU64(concat(col("doc_id").cast("string"), lit(salt), p.cast("string")))
    val starts = filter(sequence(lit(0), n - 1), i =>
      posHash(":ss:", i) < lit(SpanStartThresh))
    val spans = transform(col("__s"), (s, j) => {
      val nxt = coalesce(try_element_at(col("__s"), j + 2), size(col("__w")))
      val len = lit(1L) + pmod(posHash(":sl:", s), lit(2L * SpanMeanLen - 1))
      struct(j.cast("long").as("span_idx"), s.cast("long").as("span_start"),
        least(s + len, nxt.cast("long"), size(col("__w")).cast("long")).as("span_end"))
    })
    docs
      .select(col("doc_id"), split(col("text"), " ").as("__w"))
      .select(col("doc_id"), col("__w"), starts.as("__s"))
      .select(col("doc_id"), col("__w"), explode(spans).as("sp"))
      .select(col("doc_id"), col("sp.span_idx"), col("sp.span_start"), col("sp.span_end"),
        concat_ws(" ", slice(col("__w"), (col("sp.span_start") + 1).cast("int"),
          (col("sp.span_end") - col("sp.span_start")).cast("int"))).as("span_text"))
  }

  /** Preference-pair mining for DPO/RLHF reward training: per group (a
    * prompt id in a real deployment; any stratum key works), pair the
    * highest-scored response as `chosen` against the lowest as `rejected`,
    * keep the pair only when the score margin clears `minMargin` —
    * low-margin pairs are label noise the DPO loss amplifies.
    *
    * ONE partial-aggregated groupBy: chosen is `max(struct(score, -id))`
    * and rejected `min(struct(score, id))` — both associative, so each
    * map task ships exactly two structs per group regardless of group
    * size, and the tie-breaks (chosen→lowest id, rejected→lowest id) are
    * total orders, deterministic on any partitioning. Scores are integer
    * (token counts, preference votes, rank points) so the margin compare
    * has no float boundary. */
  def preferencePairs(df: DataFrame, groupCols: Seq[String], id: Column,
                      score: Column, minMargin: Long = 1L): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    df.select(groupCols.map(col) ++ Seq(id.as("__id"), score.cast("long").as("__score")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(struct(col("__score").as("s"), (-col("__id")).as("ni"))).as("__c"),
        min(struct(col("__score").as("s"), col("__id").as("i"))).as("__r"))
      .select(groupCols.map(col) ++ Seq(
        (-col("__c.ni")).as("chosen_id"),
        col("__r.i").as("rejected_id"),
        (col("__c.s") - col("__r.s")).as("margin")): _*)
      .where(col("margin") >= minMargin)
  }

  private def eventTurns(s: SparkSession, dir: String): DataFrame =
    SparkEntry.table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id").as("ord"),
        roleCol.as("role"), col("props").as("content"))

  /** Thread linearization: resolve every message of a parent-pointer forest
    * (threaded chat/forum data) to its root, depth, and full root→message
    * path — the flattening that turns raw threads into the linear
    * conversations [[render]] consumes (each leaf-path is one training
    * conversation).
    *
    * POINTER DOUBLING, not parent-at-a-time walking: each round joins the
    * state with itself (`jump ← jump(jump)`, concatenating the covered
    * path segments), so a depth-d thread resolves in ⌈log₂ d⌉ rounds of
    * one hash join each — at 100 TB a deep thread costs 5–6 shuffles where
    * the naive walk costs d and a `collect`-based walk doesn't distribute
    * at all. Per-round state is one row per message whose path array is
    * bounded by thread depth (conversations are context-window-bounded);
    * `localCheckpoint` truncates the per-round lineage ([[Graph]] /
    * [[Vocab.trainBpe]] posture). A dangling parent pointer terminates its
    * chain as a root (malformed data degrades, not crashes); a CYCLE
    * never converges and fails loudly at `maxRounds`. */
  def threadPaths(msgs: DataFrame, id: Column, parent: Column,
                  maxRounds: Int = 20): DataFrame = {
    var st = msgs.select(id.cast("long").as("id"),
        parent.cast("long").as("jump"),
        array(id.cast("long")).as("seg"))
      .localCheckpoint(true)
    var round = 0
    var open = st.where(col("jump").isNotNull).limit(1).count() > 0
    while (open && round < maxRounds) {
      val link = st.select(col("id").as("jump"), col("jump").as("jump2"),
        col("seg").as("seg2"))
      // seg2 null ⇔ no ancestor row matched (jump already null, or a
      // dangling pointer): the chain is complete as known
      st = st.join(link, Seq("jump"), "left")
        .select(col("id"),
          when(col("seg2").isNull, lit(null).cast("long"))
            .otherwise(col("jump2")).as("jump"),
          when(col("seg2").isNull, col("seg"))
            .otherwise(concat(col("seg"), col("seg2"))).as("seg"))
        .localCheckpoint(true)
      round += 1
      open = st.where(col("jump").isNotNull).limit(1).count() > 0
    }
    require(!open,
      s"threadPaths: unresolved chains after $maxRounds doubling rounds " +
        s"(depth > 2^$maxRounds or a parent-pointer cycle)")
    st.select(col("id").as("msg_id"),
      element_at(col("seg"), -1).as("root_id"),
      (size(col("seg")) - 1).cast("long").as("depth"),
      array_join(reverse(col("seg")).cast("array<string>"), ">").as("path"))
  }

  val queries: Map[String, Q] = Map(
    // parent-pointer threads over the event log (roots at multiples of 23
    // → chains up to depth 22, five doubling rounds)
    "thread_flatten" -> ((s, dir) => {
      val ev = SparkEntry.table(s, dir, "events")
      threadPaths(ev.select(col("event_id"),
          when(col("event_id") % 23 === 0, lit(null).cast("long"))
            .otherwise(col("event_id") - 1).as("parent")),
        col("event_id"), col("parent"))
    }),
    "sft_format" -> ((s, dir) => renderConversations(eventTurns(s, dir), "user_id")),
    "sft_spans" -> ((s, dir) => lossSpans(eventTurns(s, dir), "user_id")),
    "fim_transform" -> ((s, dir) => fimTransform(SparkEntry.table(s, dir, "documents"))),
    "span_corruption" -> ((s, dir) => spanCorruption(SparkEntry.table(s, dir, "documents"))),
    // (lang, source) strata as the prompt proxy; token count as the
    // integer reward — the gate exercises the argmax/argmin pairing and
    // the margin gate, both integer-exact
    "dpo_pairs" -> ((s, dir) =>
      preferencePairs(SparkEntry.table(s, dir, "documents"),
        Seq("lang", "source"), col("doc_id"),
        size(split(col("text"), " ")), minMargin = 5L)),
  )

  // single-line on purpose: this fragment is interpolated into oracle
  // strings that call .stripMargin, which would eat the first `|` of a
  // line-leading `||` (turning string concat into a binder error)
  private val turnsSql =
    "SELECT user_id AS conv_id, ts, event_id AS ord, " +
      "CASE WHEN event_type IN ('purchase', 'error') THEN 'assistant' ELSE 'user' END AS role, " +
      "'<|' || CASE WHEN event_type IN ('purchase', 'error') THEN 'assistant' ELSE 'user' END " +
      "|| '|>' || props || '<|end|>' AS piece FROM events"

  val oracleSql: Map[String, String] = Map(
    // parent-at-a-time recursive walk; the engine's pointer doubling is an
    // internal optimization the paths are invariant to
    "thread_flatten" ->
      """WITH RECURSIVE m AS (
        |  SELECT event_id AS id,
        |    CASE WHEN event_id % 23 = 0 THEN NULL ELSE event_id - 1 END AS parent
        |  FROM events),
        |up AS (
        |  SELECT id AS msg_id, parent AS nxt, [id] AS seg FROM m
        |  UNION ALL
        |  SELECT up.msg_id, m.parent, list_append(up.seg, m.id)
        |  FROM up JOIN m ON m.id = up.nxt)
        |SELECT msg_id, seg[len(seg)] AS root_id,
        |  CAST(len(seg) - 1 AS BIGINT) AS depth,
        |  array_to_string(list_reverse(seg), '>') AS path
        |FROM up
        |WHERE nxt IS NULL
        |   OR NOT EXISTS (SELECT 1 FROM m WHERE m.id = up.nxt)""".stripMargin,
    "sft_format" ->
      s"""WITH t AS ($turnsSql)
         |SELECT conv_id, count(*) AS n_turns,
         |  string_agg(piece, '' ORDER BY ts, ord) AS text,
         |  CAST(sum(CASE WHEN role = 'assistant' THEN length(piece) ELSE 0 END) AS BIGINT)
         |    AS loss_chars
         |FROM t GROUP BY conv_id""".stripMargin,
    "sft_spans" ->
      s"""WITH t AS ($turnsSql),
         |o AS (SELECT conv_id, role,
         |  CAST(row_number() OVER (PARTITION BY conv_id ORDER BY ts, ord) - 1 AS BIGINT)
         |    AS turn_idx,
         |  CAST(coalesce(sum(length(piece)) OVER (PARTITION BY conv_id ORDER BY ts, ord
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS span_start,
         |  CAST(length(piece) AS BIGINT) AS len
         |  FROM t)
         |SELECT conv_id, turn_idx, span_start, span_start + len AS span_end
         |FROM o WHERE role = 'assistant'""".stripMargin,
    // hashes are non-negative (32-bit), so plain % mirrors Spark's pmod;
    // array_to_string of an EMPTY list is NULL in DuckDB (Spark concat_ws
    // gives '') — each segment coalesces to ''
    "fim_transform" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
        |  CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':fim1'), 1, 8)) AS BIGINT)
        |    % (CAST(len(w) AS BIGINT) + 1) AS c1
        |  FROM d),
        |c2t AS (SELECT doc_id, w, n, c1,
        |  c1 + CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':fim2'), 1, 8)) AS BIGINT)
        |    % (n - c1 + 1) AS c2
        |  FROM c)
        |SELECT doc_id, n AS n_tokens, c1 AS cut1, c2 AS cut2,
        |  '<PRE>' || coalesce(array_to_string(list_slice(w, 1, CAST(c1 AS INT)), ' '), '') ||
        |  '<SUF>' || coalesce(array_to_string(list_slice(w, CAST(c2 + 1 AS INT), CAST(n AS INT)), ' '), '') ||
        |  '<MID>' || coalesce(array_to_string(list_slice(w, CAST(c1 + 1 AS INT), CAST(c2 AS INT)), ' '), '')
        |    AS text_fim
        |FROM c2t""".stripMargin,
    // the window formulation the struct-extrema aggregation provably
    // equals: chosen = (score DESC, id ASC) rank 1, rejected =
    // (score ASC, id ASC) rank 1, integer margin gate
    "dpo_pairs" ->
      """WITH t AS (SELECT lang, source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS score FROM documents),
        |w AS (SELECT *,
        |  row_number() OVER (PARTITION BY lang, source ORDER BY score DESC, doc_id) AS r1,
        |  row_number() OVER (PARTITION BY lang, source ORDER BY score ASC, doc_id) AS r2
        |  FROM t),
        |c AS (SELECT lang, source, doc_id AS chosen_id, score AS cs FROM w WHERE r1 = 1),
        |r AS (SELECT lang, source, doc_id AS rejected_id, score AS rs FROM w WHERE r2 = 1)
        |SELECT c.lang, c.source, chosen_id, rejected_id, cs - rs AS margin
        |FROM c JOIN r USING (lang, source)
        |WHERE cs - rs >= 5""".stripMargin,

    // position-salted start decisions, truncate-at-next-start span ends —
    // the exact closed-form the engine computes; same integer threshold
    "span_corruption" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, w,
        |  list_filter(range(0, len(w)), i ->
        |    CAST(('0x' || substring(sha256(
        |      CAST(doc_id AS VARCHAR) || ':ss:' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)
        |      < $SpanStartThresh) AS st
        |  FROM d),
        |sp AS (SELECT doc_id, w, t.u AS u
        |  FROM s, LATERAL UNNEST(list_transform(range(1, len(st) + 1), j -> struct_pack(
        |    span_idx := CAST(j - 1 AS BIGINT),
        |    span_start := CAST(st[j] AS BIGINT),
        |    span_end := CAST(least(
        |      st[j] + 1 + CAST(('0x' || substring(sha256(
        |        CAST(doc_id AS VARCHAR) || ':sl:' || CAST(st[j] AS VARCHAR)), 1, 8)) AS BIGINT)
        |        % ${2 * SpanMeanLen - 1},
        |      coalesce(st[j + 1], len(w)), len(w)) AS BIGINT)))) AS t(u))
        |SELECT doc_id, u.span_idx AS span_idx, u.span_start AS span_start,
        |  u.span_end AS span_end,
        |  coalesce(array_to_string(
        |    list_slice(w, CAST(u.span_start + 1 AS INT), CAST(u.span_end AS INT)), ' '), '')
        |    AS span_text
        |FROM sp""".stripMargin,
  )
}
