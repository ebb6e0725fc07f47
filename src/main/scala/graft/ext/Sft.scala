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

  private def eventTurns(s: SparkSession, dir: String): DataFrame =
    SparkEntry.table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id").as("ord"),
        roleCol.as("role"), col("props").as("content"))

  val queries: Map[String, Q] = Map(
    "sft_format" -> ((s, dir) => renderConversations(eventTurns(s, dir), "user_id")),
    "sft_spans" -> ((s, dir) => lossSpans(eventTurns(s, dir), "user_id")),
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
  )
}
