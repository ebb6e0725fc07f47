package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.ProdSession
import graft.functions.topk

/** Differential pin: the native [[graft.functions.NativeTopK]] /
  * [[graft.functions.NativeMultiTopK]] `TypedImperativeAggregate`s (primitive
  * binary buffers — the r15 replacement for the typed-encoder UDAF hot path)
  * must equal the retained [[TopKAgg]] / [[MultiTopKAgg]] Aggregators EXACTLY
  * across ties, duplicates, ±0.0, extremes, NaN and the `minScoreExclusive`
  * bound — plus the documented strengthening: NULL ids/scores are skipped,
  * not fatal. */
class NativeTopKSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark
  import spark.implicits._

  private def asPairs(r: Row, i: Int): Seq[(Long, Double)] =
    r.getSeq[Row](i).map(x => (x.getLong(0), x.getDouble(1))).toSeq

  // the awkward corpus: dense score ties (id tiebreak), exact duplicate
  // (id, score) pairs, +0.0 vs -0.0, ±Infinity, NaN, extreme magnitudes
  private def corpus = (0 until 600).map { i =>
    val id = (i % 250).toLong // duplicate ids with different scores
    val s = (i % 23) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => 0.0
      case 4 => -0.0
      case 5 => 1e300
      case 6 => -1e300
      case 7 => Double.MinPositiveValue
      case n => ((i * 31) % 11).toDouble - 5.0 // heavy ties
    }
    (i % 7, id, s)
  }

  test("NativeTopK == TopKAgg across ties/dups/±0.0/±Inf/NaN, k sweep") {
    val df = corpus.toDF("q", "id", "s")
    for (k <- Seq(1, 3, 5, 50)) {
      val old = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
      val exp = df.groupBy("q").agg(old(col("id"), col("s")).as("nb"))
        .collect().map(r => r.getInt(0) -> asPairs(r, 1)).toMap
      val got = df.groupBy("q").agg(topk.topK(k)(col("id"), col("s")).as("nb"))
        .collect().map(r => r.getInt(0) -> asPairs(r, 1)).toMap
      assert(got.keySet == exp.keySet)
      for (q <- exp.keys)
        assert(got(q) == exp(q), s"k=$k q=$q: native=${got(q)} udaf=${exp(q)}")
    }
  }

  test("NativeTopK honors minScoreExclusive exactly (the Retrieval topPos bound)") {
    val df = corpus.toDF("q", "id", "s")
    for (bound <- Seq(0.0, -2.5, 3.0)) {
      val old = udaf(new TopKAgg(4, minScoreExclusive = bound),
        ExpressionEncoder[Scored]())
      val exp = df.groupBy("q").agg(old(col("id"), col("s")).as("nb"))
        .collect().map(r => r.getInt(0) -> asPairs(r, 1)).toMap
      val got = df.groupBy("q")
        .agg(topk.topK(4, minScoreExclusive = bound)(col("id"), col("s")).as("nb"))
        .collect().map(r => r.getInt(0) -> asPairs(r, 1)).toMap
      for (q <- exp.keys)
        assert(got(q) == exp(q), s"bound=$bound q=$q: ${got(q)} vs ${exp(q)}")
    }
  }

  test("NativeTopK: empty groups yield empty arrays; NULL id/score rows are skipped") {
    val df = Seq[(Int, Option[Long], Option[Double])](
      (0, Some(1L), None), (0, None, Some(2.0)), // nulls only → empty top-k
      (1, Some(7L), Some(1.5)), (1, None, Some(9.9)), (1, Some(8L), None)
    ).toDF("q", "id", "s")
    val got = df.groupBy("q").agg(topk.topK(3)(col("id"), col("s")).as("nb"))
      .collect().map(r => r.getInt(0) -> asPairs(r, 1)).toMap
    assert(got(0) == Seq.empty, s"null-only group must be empty, got ${got(0)}")
    assert(got(1) == Seq((7L, 1.5)), s"nulls must be skipped, got ${got(1)}")
  }

  test("NativeTopK survives serialize/deserialize round-trip (forced final-merge path)") {
    // many input partitions force partial buffers through serialize → merge
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(corpus.map(Row.fromTuple), 16),
      corpus.toDF("q", "id", "s").schema)
    val old = udaf(new TopKAgg(5), ExpressionEncoder[Scored]())
    val exp = df.groupBy("q").agg(old(col("id"), col("s")).as("nb"))
      .collect().map(r => r.getInt(0) -> asPairs(r, 1)).toMap
    val got = df.groupBy("q").agg(topk.topK(5)(col("id"), col("s")).as("nb"))
      .collect().map(r => r.getInt(0) -> asPairs(r, 1)).toMap
    for (q <- exp.keys) assert(got(q) == exp(q))
  }

  test("NativeMultiTopK == MultiTopKAgg per leg (ties, NaN lane, serde)") {
    val rows = (0 until 400).map { i =>
      val id = i.toLong
      val s0 = (i % 13).toDouble
      val s1 = ((i * 7) % 19).toDouble / 3.0
      val s2 = if (i % 17 == 0) Double.NaN else -((i % 5).toDouble)
      (i % 4, id, Seq(s0, s1, s2))
    }
    val df = rows.toDF("q", "id", "scores").repartition(8)
    val k = 5
    val old = udaf(new MultiTopKAgg(k, 3), ExpressionEncoder[MultiScored]())
    val exp = df.groupBy("q").agg(old(col("id"), col("scores")).as("nb"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[scala.collection.Seq[Row]](1).map(_.map(x =>
          (x.getLong(0), x.getDouble(1))).toSeq).toSeq).toMap
    val got = df.groupBy("q")
      .agg(topk.multiTopK(k, 3)(col("id"), col("scores")).as("nb"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[scala.collection.Seq[Row]](1).map(_.map(x =>
          (x.getLong(0), x.getDouble(1))).toSeq).toSeq).toMap
    for (q <- exp.keys)
      assert(got(q) == exp(q), s"q=$q: native=${got(q)} udaf=${exp(q)}")
  }

  test("NativeTopK is partitioning-invariant under extreme skew (r15 verdict item 7)") {
    // the serde/merge path is already spec'd in isolation; this sweeps the
    // REAL partial→final topology: all rows in one partition (merge of one
    // full buffer with empties), spread thin (many near-empty partials),
    // and hash-skewed (each group's rows co-located → single-buffer merge)
    // must all be byte-identical to the single-partition truth, at k values
    // that straddle the buffer-merge boundaries (k=1, k≈group size, k≫n)
    val df = corpus.toDF("q", "id", "s")
    for (k <- Seq(1, 85, 1000)) { // ~86 rows per q group; 1000 ≫ group
      def run(part: org.apache.spark.sql.DataFrame): Map[Int, Seq[(Long, Double)]] =
        part.groupBy("q").agg(topk.topK(k)(col("id"), col("s")).as("nb"))
          .collect().map(r => r.getInt(0) -> asPairs(r, 1)).toMap
      val truth = run(df.coalesce(1))
      assert(run(df.repartition(32)) == truth, s"k=$k: 32-way spread diverged")
      assert(run(df.repartition(64, col("q"))) == truth,
        s"k=$k: key-skewed partitioning diverged")
      assert(run(df.repartition(3, col("id"))) == truth,
        s"k=$k: cross-cutting skew diverged")
    }
  }

  test("NativeTopK runs partial-then-final ObjectHashAggregate (≤k rows shuffle)") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = corpus.toDF("q", "id", "s").repartition(4)
      val p = df.groupBy("q").agg(topk.topK(5)(col("id"), col("s")).as("nb"))
        .queryExecution.executedPlan
      val objAggs = p.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      }
      assert(objAggs.size == 2, s"expected partial+final ObjectHashAggregate:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
