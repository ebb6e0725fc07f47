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
  test("fimTransform: PSM segments losslessly reassemble the document") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h"), (2L, "solo"), (3L, "x y")).toDF("doc_id", "text")
    val rows = Sft.fimTransform(docs).collect()
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, n, c1, c2, fim) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(0 <= c1 && c1 <= c2 && c2 <= n)
      val iSuf = fim.indexOf("<SUF>"); val iMid = fim.indexOf("<MID>")
      val pre = fim.substring("<PRE>".length, iSuf)
      val suf = fim.substring(iSuf + "<SUF>".length, iMid)
      val mid = fim.substring(iMid + "<MID>".length)
      val tokens = Seq(pre, mid, suf).map(_.split(" ", -1).filter(_.nonEmpty).toSeq)
      assert(tokens.flatten.sorted == orig(id).split(" ").toSeq.sorted,
        s"doc $id loses tokens")
      assert((pre + " " + mid + " " + suf).trim.replaceAll(" +", " ").split(" ").length
        >= orig(id).split(" ").length - 1)
    }
  }

  test("spanCorruption: disjoint ordered in-bounds spans, exact slice text, deterministic") {
    import spark.implicits._
    val words = (0 until 400).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, words), (8L, "tiny doc")).toDF("doc_id", "text")
    val got = Sft.spanCorruption(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = got.groupBy(_._1)
    byDoc.get(7L).foreach { sp =>
      val sorted = sp.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length.toLong).toSeq,
        "dense span_idx by start order")
      sorted.foreach { case (_, _, s, e, t) =>
        assert(0 <= s && s < e && e <= 400)
        assert(t == (s until e).map(i => s"t$i").mkString(" "), "span_text must slice the doc")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, _, e1, _), (_, _, s2, _, _)) => assert(e1 <= s2, "spans overlap")
        case _ =>
      }
      // ~5% start rate * mean len 3 => ~15% tokens masked; loose envelope
      val masked = sorted.map(x => x._4 - x._3).sum
      assert(masked > 10 && masked < 200, s"implausible corruption mass $masked/400")
    }
    // deterministic under repartitioning
    val again = Sft.spanCorruption(docs.repartition(9)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(again.sortBy(x => (x._1, x._2)).toSeq == got.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("preferencePairs: argmax/argmin with total-order tiebreaks, margin gate") {
    // group g1: clear winner/loser; g2: score tie at the top (lower id
    // wins chosen) AND at the bottom (lower id is rejected); g3: all
    // equal — margin 0, gated out at minMargin=1
    val scored = Seq(
      ("g1", 1L, 10L), ("g1", 2L, 1L), ("g1", 3L, 7L),
      ("g2", 4L, 9L), ("g2", 5L, 9L), ("g2", 6L, 2L), ("g2", 7L, 2L),
      ("g3", 8L, 5L), ("g3", 9L, 5L),
    ).toDF("grp", "id", "sc")
    val got = Sft.preferencePairs(scored, Seq("grp"), col("id"), col("sc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("g1", 1L, 2L, 9L), ("g2", 4L, 6L, 7L)))
    // minMargin raises the bar
    val strict = Sft.preferencePairs(scored, Seq("grp"), col("id"), col("sc"),
      minMargin = 8L).collect()
    assert(strict.map(_.getString(0)).toSeq == Seq("g1"))
    // deterministic under physical reshuffle (the aggregation is a pair of
    // struct extrema — associative and order-free)
    val again = Sft.preferencePairs(scored.repartition(7), Seq("grp"), col("id"), col("sc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }
  test("threadPaths == JVM reference walk on a random forest; edge cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random forest over 200 nodes: node i's parent is a random j < i (or
    // a root with p=0.15) — guarantees acyclic, varied depths
    val parents: Map[Long, Option[Long]] = (0L until 200L).map { i =>
      i -> (if (i == 0 || rnd.nextDouble() < 0.15) None
            else Some(rnd.nextInt(i.toInt).toLong))
    }.toMap
    val df = parents.toSeq.map { case (i, p) => (i, p) }.toDF("id", "parent")
    val got = Sft.threadPaths(df, col("id"), col("parent"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    parents.keys.foreach { i =>
      var chain = List(i)
      while (parents(chain.head).isDefined) chain ::= parents(chain.head).get
      val want = (chain.head, (chain.size - 1).toLong, chain.mkString(">"))
      assert(got(i) == want, s"node $i")
    }
    assert(parents.keys.map(i => got(i)._2).max >= 4,
      "fixture must exercise multiple doubling rounds")
    // dangling parent terminates the chain as a root, not a crash
    val dang = Seq((1L, Option(99L)), (2L, Option(1L))).toDF("id", "parent")
    val gd = Sft.threadPaths(dang, col("id"), col("parent"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gd == Map(1L -> ((1L, 0L)), 2L -> ((1L, 1L))))
    // a cycle fails loudly instead of spinning
    val cyc = Seq((1L, Option(2L)), (2L, Option(1L))).toDF("id", "parent")
    val ex = intercept[IllegalArgumentException] {
      Sft.threadPaths(cyc, col("id"), col("parent"), maxRounds = 4)
    }
    assert(ex.getMessage.contains("cycle"))
  }
}
