package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Sft]]: the loss spans must index exactly the assistant pieces inside
  * the rendered conversation string (the contract a dataloader depends on),
  * the concatenation must be deterministic under any physical row order,
  * and the whole operator must cost ONE co-partitioning shuffle. */
class SftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.ProdSession.spark
  import spark.implicits._

  // (conv, ts, ord, role, content) — conv 1 interleaves roles, conv 2 is
  // user-only (no spans), conv 3 is a single assistant turn
  private lazy val turns = Seq(
    (1L, 10L, 1L, "user", "hi"),
    (1L, 20L, 2L, "assistant", "hello!"),
    (1L, 30L, 3L, "user", "bye"),
    (1L, 40L, 4L, "assistant", "later"),
    (2L, 10L, 5L, "user", "solo"),
    (3L, 10L, 6L, "assistant", "only me"),
  ).toDF("conv_id", "ts", "ord", "role", "content")

  test("spans slice exactly the assistant pieces out of the rendered text") {
    val text = Sft.renderConversations(turns, "conv_id")
      .select("conv_id", "text").as[(Long, String)].collect().toMap
    val spans = Sft.lossSpans(turns, "conv_id")
      .select("conv_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect()
    assert(text(1L) ==
      "<|user|>hi<|end|><|assistant|>hello!<|end|>" +
        "<|user|>bye<|end|><|assistant|>later<|end|>")
    assert(text(2L) == "<|user|>solo<|end|>")
    val sliced = spans.map { case (c, s, e) =>
      text(c).substring(s.toInt, e.toInt)
    }.sorted.toSeq
    assert(sliced == Seq("<|assistant|>hello!<|end|>", "<|assistant|>later<|end|>",
      "<|assistant|>only me<|end|>").sorted)
    assert(!spans.exists(_._1 == 2L), "user-only conversation must have no span")
  }

  test("loss_chars reconciles with the spans; n_turns counts every turn") {
    val fmt = Sft.renderConversations(turns, "conv_id")
      .select("conv_id", "n_turns", "loss_chars").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val spanMass = Sft.lossSpans(turns, "conv_id")
      .groupBy("conv_id").agg(sum(col("span_end") - col("span_start")).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(fmt(1L) == ((4L, spanMass(1L))))
    assert(fmt(2L) == ((1L, 0L)))
    assert(fmt(3L) == ((1L, spanMass(3L))))
  }

  test("rendering is invariant to the input's physical order") {
    val reversed = turns.orderBy(col("ts").desc, col("ord").desc).repartition(5)
    val a = Sft.renderConversations(turns, "conv_id")
      .orderBy("conv_id").collect().toSeq
    val b = Sft.renderConversations(reversed, "conv_id")
      .orderBy("conv_id").collect().toSeq
    assert(a == b, "array_sort concatenation must not depend on row order")
  }

  test("one co-partitioning shuffle: window and groupBy share the exchange") {
    val p: SparkPlan = Sft.renderConversations(turns, "conv_id")
      .queryExecution.executedPlan
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 1,
      s"expected one conv_id exchange shared by window + agg, got ${shuffles.size}:\n$p")
  }
}
