package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 metric operators: Bradley–Terry fixed-point MM ([[Prefs]]),
  * corpus BLEU and Cohen's κ ([[Quality]]), GK-sketch quantile audit
  * ([[Freq.approxQuantiles]]), closed-form OLS trend
  * ([[TimeSeries.olsTrend]]), Gini concentration
  * ([[Hygiene.giniConcentration]]). Each pinned against hand values or a
  * plain-Scala reference implementation, plus the invariances the fixed
  * driver gates can't see (partitioning, convergence, branch coverage). */
class PrefsMetricsSpec extends AnyFunSuite {
  lazy val spark = graft.ProdSession.spark
  import spark.implicits._

  // ---- Bradley–Terry ---------------------------------------------------

  // A dominates B dominates C: 9-1, 8-2, 9-1
  private def pairDf = Seq(
    ("A", "B", 10L, 9L, 1L),
    ("B", "C", 10L, 8L, 2L),
    ("A", "C", 10L, 9L, 1L)
  ).toDF("item_a", "item_b", "n", "wins_a", "wins_b")

  test("btScores recovers the dominance order and sums games/wins") {
    val out = Prefs.btScores(spark, pairDf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4)))
      .toMap
    assert(out("A")._1 == 20 && out("B")._1 == 20 && out("C")._1 == 20)
    assert(out("A")._2 == 18 && out("B")._2 == 9 && out("C")._2 == 3)
    assert(out("A")._3 > out("B")._3 && out("B")._3 > out("C")._3,
      s"fitted order broken: $out")
  }

  test("btScores fixed point ≈ textbook float MM (plain-Scala differential)") {
    // float reference: Hunter 2004 eq. (2) with mean-1 normalization
    val items = Seq("A", "B", "C")
    val n = Map(("A", "B") -> 10.0, ("B", "C") -> 10.0, ("A", "C") -> 10.0)
    val w = Map("A" -> 18.0, "B" -> 9.0, "C" -> 3.0)
    def nOf(i: String, j: String) = n.getOrElse((i, j), n.getOrElse((j, i), 0.0))
    var s = items.map(_ -> 1.0).toMap
    for (_ <- 1 to 50) {
      val raw = items.map { i =>
        i -> w(i) / items.filter(_ != i)
          .map(j => nOf(i, j) / (s(i) + s(j))).sum
      }.toMap
      val mean = raw.values.sum / items.size
      s = raw.map { case (i, v) => i -> v / mean }
    }
    val fitted = Prefs.btScores(spark, pairDf, iters = 30).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    for (i <- items)
      assert(math.abs(fitted(i) - s(i)) < 0.001,
        s"$i: fixed-point ${fitted(i)} vs float ${s(i)}")
  }

  test("btScores is invariant to pair-statistic partitioning and row order") {
    val a = Prefs.btScores(spark, pairDf).collect().toSeq
    val b = Prefs.btScores(spark, pairDf.repartition(7).sortWithinPartitions(
      desc("item_b"))).collect().toSeq
    assert(a.toSet == b.toSet)
  }

  test("preferencePairs canonicalizes pairs and applies the >= tie rule") {
    val ev = Seq(
      // user 1: b(5.0) -> a(5.0) tie -> earlier (b) wins; a -> c, c wins
      (1L, 1L, "b", 5.0), (1L, 2L, "a", 5.0), (1L, 3L, "c", 9.0),
      // user 2: consecutive duplicates are not comparisons
      (2L, 1L, "a", 1.0), (2L, 2L, "a", 2.0), (2L, 3L, "b", 1.0)
    ).toDF("user_id", "event_id", "item", "v")
      .withColumn("ts", timestamp_micros(col("event_id") * 1000000L))
    val got = Prefs.preferencePairs(ev, col("user_id"), col("ts"),
      col("event_id"), col("item"), col("v")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("a", "b", "b"), ("a", "c", "c"), ("a", "b", "a")))
  }

  test("winRates: hand Wilson bound at z=2, bounds bracket the rate") {
    val df = Seq(("A", "B", 3L, 3L, 0L)).toDF("item_a", "item_b", "n",
      "wins_a", "wins_b")
    val r = Prefs.winRates(df).head()
    // p=1, n=3: center=(1+2/3)/(1+4/3)=5/7, margin=(2*sqrt(1/9))/(7/3)=2/7
    assert(r.getAs[Double]("rate_a") == 1.0)
    assert(math.abs(r.getAs[Double]("wilson_lo_a") - 3.0 / 7.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("wilson_hi_a") - 1.0) < 1e-12)
    assert(r.getAs[Double]("wilson_lo_a") < r.getAs[Double]("rate_a") + 1e-15)
  }

  test("absorbPrefsBatch: two absorptions equal one-shot, replay is idempotent") {
    val prefs = Seq(("A", "B", "A"), ("A", "B", "B"), ("A", "C", "A"),
      ("B", "C", "B")).toDF("item_a", "item_b", "winner")
    val oneShot = Prefs.btPairs(prefs).collect().toSet
    val root = java.nio.file.Files.createTempDirectory("btspec")
    try {
      Prefs.absorbPrefsBatch(spark, root.toString, 0L,
        prefs.where(col("item_b") === "B"))
      val after = Prefs.absorbPrefsBatch(spark, root.toString, 1L,
        prefs.where(col("item_b") =!= "B"))
      assert(after.collect().toSet == oneShot)
      // replaying batch 1 recomputes against the pre-batch snapshot
      val replayed = Prefs.absorbPrefsBatch(spark, root.toString, 1L,
        prefs.where(col("item_b") =!= "B"))
      assert(replayed.collect().toSet == oneShot)
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("streaming BT statistic over the shard source: stop/restart == one-shot") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.ShardStream
    val base = java.nio.file.Files.createTempDirectory("btstream").toString
    // 300 deterministic comparisons over 4 items
    val items = Array("A", "B", "C", "D")
    val prefRows = (0 until 300).map { i =>
      val a = items(i % 4); val b = items((i / 4 + 1 + i % 3) % 4)
      if (a == b) null else {
        val (lo, hi) = if (a < b) (a, b) else (b, a)
        (i.toLong, lo, hi, if (i % 5 < 3) lo else hi)
      }
    }.filter(_ != null)
    val oneShot = Prefs.btPairs(
      prefRows.map { case (_, a, b, w) => (a, b, w) }
        .toDF("item_a", "item_b", "winner")).collect().toSet
    val streamDir = s"$base/stream"
    ShardStream.writeShardDir(streamDir, prefRows.map { case (id, a, b, w) =>
      ("s0", f"$id%012d", id.toString, s"$a,$b,$w", 1700000000000L + id) })
    def run(stateDir: String, ckpt: String, trigger: Trigger): Set[Any] = {
      var last = Set.empty[Any]
      val src = spark.readStream.format("kinesiscat")
        .option("path", streamDir)
        .option("startingPosition", ShardStream.TrimHorizon)
        .option("batchSize", "64").load()
        .select(split(col("data").cast("string"), ",").as("f"))
        .select(col("f")(0).as("item_a"), col("f")(1).as("item_b"),
          col("f")(2).as("winner"))
      val q = Prefs.prefsStream(src, stateDir) { stat =>
        last = stat.collect().toSet
      }.option("checkpointLocation", ckpt).trigger(trigger).start()
      q.awaitTermination()
      last
    }
    val unbroken = run(s"$base/stA", s"$base/ckptA", Trigger.AvailableNow())
    assert(unbroken == oneShot, "uninterrupted stream must match one-shot")
    run(s"$base/stB", s"$base/ckptB", Trigger.Once()) // killed mid-corpus
    val resumed = run(s"$base/stB", s"$base/ckptB", Trigger.AvailableNow())
    assert(resumed == oneShot, "resumed stream must match one-shot")
  }

  // ---- Brier decomposition / A/B z ---------------------------------------

  test("brier: perfectly calibrated bins have zero reliability") {
    // bin 1 (p_hat=0.15): 20 rows, 3 positive -> o_bar = 0.15 exactly
    val rows = Seq.tabulate(20)(i => (1L, i < 3)) ++
      Seq.tabulate(20)(i => (7L, i < 15)) // bin 7: p_hat=.75, o_bar=.75
    val out = Quality.brierDecomposition(rows.toDF("b", "o"), col("b"), 10,
      col("o")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("rel_term") == 0.0)
    assert(out(7L).getAs[Double]("rel_term") == 0.0)
    assert(out(1L).getAs[Double]("p_hat") == 0.15)
    // overall o_bar = 18/40; uncertainty = .45*.55 exactly in rationals
    assert(out(1L).getAs[Double]("uncertainty") == (18.0 * 22.0) / 1600.0)
    assert(out(7L).getAs[Double]("res_term") > 0.0)
  }

  test("abZTest: identical arms give z = 0, known imbalance is positive") {
    val same = Seq.tabulate(100)(i => (i % 2 == 0, i % 4 < 2))
    val z0 = Quality.abZTest(same.toDF("t", "s"), col("t"), col("s")).head()
    assert(z0.getAs[Double]("z") == 0.0)
    assert(z0.getAs[Long]("n1") == 50 && z0.getAs[Long]("n0") == 50)
    val skew = Seq.fill(50)((true, true)) ++ Seq.fill(50)((false, false))
    val z1 = Quality.abZTest(skew.toDF("t", "s"), col("t"), col("s"))
      .head().getAs[Double]("z")
    assert(z1 == 10.0, s"p1=1, p0=0, pooled .5 -> z = 1/sqrt(.25*.04) = 10, got $z1")
  }

  test("isotonicCalibration: minimax equals hand PAVA, pools the violation") {
    // rates .2, .6, .4, .9 -> PAVA pools bins 1-2 to .5
    val rows = Seq.tabulate(10)(i => (0L, i < 2)) ++
      Seq.tabulate(10)(i => (1L, i < 6)) ++
      Seq.tabulate(10)(i => (2L, i < 4)) ++
      Seq.tabulate(10)(i => (3L, i < 9))
    val out = Quality.isotonicCalibration(rows.toDF("b", "o"), col("b"),
      col("o")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Double]("iso_rate") == 0.2)
    assert(out(1L).getAs[Double]("iso_rate") == 0.5)
    assert(out(2L).getAs[Double]("iso_rate") == 0.5)
    assert(out(3L).getAs[Double]("iso_rate") == 0.9)
    // the fit is monotone and preserves the pooled mass
    val iso = (0L to 3L).map(out(_).getAs[Double]("iso_rate"))
    assert(iso == iso.sorted)
    assert(iso.map(_ * 10).sum == 21.0)
  }

  test("conformalThreshold: exact rank rule, NULL when coverage unattainable") {
    val big = (1 to 10).map(v => ("a", v.toLong)) ++
      (1 to 3).map(v => ("tiny", v.toLong))
    val out = Quality.conformalThreshold(big.toDF("g", "cents"), col("g"),
      col("cents")).collect().map(r => r.getString(0) -> r).toMap
    // n=10: rank = ceil(0.9*11) = 10 -> the 10th smallest = 10
    assert(out("a").getAs[Long]("rank") == 10)
    assert(out("a").getAs[Long]("threshold_cents") == 10L)
    // n=3: rank = ceil(0.9*4) = 4 > n -> cannot certify
    assert(out("tiny").getAs[Long]("rank") == 4)
    assert(out("tiny").isNullAt(out("tiny").fieldIndex("threshold_cents")))
    // coverage: at least 90% of calibration scores sit at or under the cut
    val cov = big.count { case (g, v) => g == "a" && v <= 10 } / 10.0
    assert(cov >= 0.9)
  }

  test("spearmanCorr: hand values, monotone = 1, ties use average ranks") {
    def rho(pairs: Seq[(Long, Long)]): Double =
      Quality.spearmanCorr(pairs.toDF("x", "y"), col("x"), col("y"))
        .head().getAs[Double]("spearman")
    assert(rho(Seq((1L, 5L), (2L, 7L), (3L, 9L))) == 1.0)
    assert(rho(Seq((1L, 9L), (2L, 7L), (3L, 5L))) == -1.0)
    // x=[1,2,3,4], y=[1,3,2,4]: d2=2 -> 1 - 12/60 = 0.8
    assert(rho(Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L))) == 0.8)
    // ties: x=[1,2,2,3] vs y=[1,5,5,9] is still a perfect monotone match
    assert(rho(Seq((1L, 1L), (2L, 5L), (2L, 5L), (3L, 9L))) == 1.0)
  }

  test("contingencyCells: independent table is all-zero, 2x2 hand value") {
    val indep = (for (a <- Seq("p", "q"); b <- Seq("u", "v"); _ <- 1 to 10)
      yield (a, b)).toDF("a", "b")
    val z = Quality.contingencyCells(indep, col("a"), col("b")).collect()
    assert(z.forall(_.getAs[Double]("chisq_term") == 0.0))
    assert(z.forall(_.getAs[Double]("expected") == 10.0))
    // [[30,10],[10,30]]: every cell term is exactly 5 (chi2 = 20)
    val skew = (Seq.fill(30)(("a", "u")) ++ Seq.fill(10)(("a", "v")) ++
      Seq.fill(10)(("b", "u")) ++ Seq.fill(30)(("b", "v"))).toDF("a", "b")
    val cells = Quality.contingencyCells(skew, col("a"), col("b")).collect()
    assert(cells.length == 4)
    assert(cells.forall(_.getAs[Double]("chisq_term") == 5.0))
  }

  test("knnLabelMetrics: hand values on a planted neighborhood") {
    // query 0 (label 1) with axis-aligned unit vectors: neighbors ranked
    // by cosine are exactly vecs 1, 2, 3 (same axis scaled), labels
    // 1, 1, 2 -> p@1 = 1, first relevant rank 1 -> mrr = 1
    def v(axis: Int, scale: Float) =
      Array.tabulate(4)(i => if (i == axis) scale else 0.0f).toSeq
    val emb = Seq(
      (0L, v(0, 1.0f), 1), (1L, v(0, 2.0f), 1), (2L, v(0, 3.0f), 1),
      (3L, v(0, 4.0f), 2), (4L, v(1, 1.0f), 9), (5L, v(2, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val m = Similarity.knnLabelMetrics(emb,
      emb.where(col("vec_id") === 0), k = 5).head()
    assert(m.getAs[Long]("n_queries") == 1)
    assert(m.getAs[Double]("p_at_1") == 1.0)
    assert(m.getAs[Double]("mrr") == 1.0)
    // 5 ranked candidates, 2 of them share label 1 -> p@5 = 2/5
    assert(m.getAs[Double]("p_at_5") == 0.4)
    // a query whose label appears nowhere contributes rr = 0
    val lone = Similarity.knnLabelMetrics(
      emb.withColumn("label", when(col("vec_id") === 0, 77).otherwise(col("label"))),
      emb.where(col("vec_id") === 0).withColumn("label", lit(77)), k = 5)
      .head()
    assert(lone.getAs[Double]("mrr") == 0.0)
  }

  test("windowDiff: zero on identical segmentation, near-miss beats far-miss") {
    def wd(r: Seq[Boolean], h: Seq[Boolean]): Double =
      Quality.windowDiff(Seq((1L, r, h)).toDF("id", "rb", "hb"),
        col("id"), col("rb"), col("hb"), k = 2)
        .head().getAs[Double]("window_diff")
    val ref = Seq(true, false, false, false, false)
    assert(wd(ref, ref) == 0.0)
    // boundary off by ONE slot perturbs fewer windows than one far away
    val near = wd(ref, Seq(false, true, false, false, false))
    val far = wd(ref, Seq(false, false, false, false, true))
    assert(near == 0.25 && far == 0.5 && near < far)
    // a doc too short for ANY full window surfaces with n_windows = 0 and
    // an undefined (NULL) score — it must not silently vanish
    val short = Quality.windowDiff(
      Seq((1L, Seq(true), Seq(false))).toDF("id", "rb", "hb"),
      col("id"), col("rb"), col("hb"), k = 2).collect()
    assert(short.length == 1)
    assert(short.head.getAs[Long]("n_windows") == 0L)
    assert(short.head.isNullAt(short.head.fieldIndex("window_diff")))
  }

  test("robustScale: hand quartiles, zero-IQR group yields NULL") {
    val rows = (1 to 8).map(v => ("g", v.toLong, v.toLong)) ++
      (1 to 4).map(i => ("flat", 100L + i, 7L))
    val out = Quality.robustScale(rows.toDF("grp", "id", "cents"),
      col("grp"), col("cents"), col("id")).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("id")) -> r).toMap
    // group g: q1=2, median=4, q3=6 -> iqr 4; v=8 scales to 1.0
    val g8 = out(("g", 8L))
    assert(g8.getAs[Long]("median_cents") == 4L)
    assert(g8.getAs[Long]("iqr_cents") == 4L)
    assert(g8.getAs[Double]("robust_score") == 1.0)
    assert(out(("g", 4L)).getAs[Double]("robust_score") == 0.0)
    val f = out(("flat", 101L))
    assert(f.isNullAt(f.fieldIndex("robust_score")))
  }

  // ---- maintained HLL ----------------------------------------------------

  test("absorbHllBatch: maintained sketch equals one-shot union, 5% band holds") {
    val ev = (1 to 5000).map(i => (s"t${i % 3}", (i * 7919) % 1200)).toDF("et", "uid")
    val root = java.nio.file.Files.createTempDirectory("hllspec")
    try {
      Freq.absorbHllBatch(spark, root.toString, 0L,
        ev.where(col("uid") % 2 === 0), col("et"), col("uid"))
      val state = Freq.absorbHllBatch(spark, root.toString, 1L,
        ev.where(col("uid") % 2 === 1), col("et"), col("uid"))
      val oneShot = ev.groupBy(col("et").as("grp"))
        .agg(hll_sketch_agg(col("uid")).as("sk"))
      // union-of-halves and one-shot sketches may sit in different
      // internal modes (sparse vs dense), so estimates agree to sketch
      // accuracy, not bit-for-bit: hold BOTH to the true 400/group
      val m = Freq.hllEstimates(state).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val o = Freq.hllEstimates(oneShot).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((g, est) <- m ++ o)
        assert(math.abs(est - 400L) <= 20L, s"$g estimate $est vs true 400")
      val audited = Freq.hllEstimates(state,
        Some(ev.groupBy(col("et").as("grp"))
          .agg(countDistinct(col("uid")).as("exact_nd")))).collect()
      assert(audited.forall(_.getAs[Boolean]("within_5pct")))
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  // ---- source novelty / overlap ------------------------------------------

  test("sourceNovelty and sourceOverlap: hand values on a 3-source corpus") {
    // s1: grams {a b c, b c d}; s2: {a b c}; s3: {x y z}
    val docs = Seq((1L, "a b c d", "s1"), (2L, "a b c", "s2"),
      (3L, "x y z", "s3")).toDF("doc_id", "text", "source")
    val nov = Hygiene.sourceNovelty(docs, col("source")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(nov("s1") == ((2L, 1L)), s"s1 has {abc, bcd}, only bcd exclusive: $nov")
    assert(nov("s2") == ((1L, 0L)))
    assert(nov("s3") == ((1L, 1L)))
    val ov = Hygiene.sourceOverlap(docs, col("source")).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_inter"), r.getAs[Double]("jaccard"))).toMap
    // self-join emits only intersecting pairs: (s1,s2) share abc, J=1/2
    assert(ov(("s1", "s2")) == ((1L, 0.5)), s"overlap: $ov")
    assert(!ov.contains(("s1", "s3")) && !ov.contains(("s2", "s3")))
  }

  // ---- sliding distinct ----------------------------------------------------

  test("slidingDistinct: range frame respects calendar gaps, not row counts") {
    val us = 86400000000L
    // group g: days 1, 2, 10 — day 10's trailing week must NOT reach day 2
    val ev = Seq((1L, 100), (1L, 101), (2L, 102), (10L, 103), (10L, 100))
      .map { case (d, u) => ("g", d * us, u) }.toDF("grp", "t", "uid")
      .withColumn("ts", timestamp_micros(col("t")))
    val out = Freq.slidingDistinct(ev, col("grp"), col("ts"), col("uid"),
      windowDays = 7, audit = true).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(out(1L).getAs[Long]("exact_nd") == 2)
    assert(out(2L).getAs[Long]("exact_nd") == 3)
    assert(out(10L).getAs[Long]("exact_nd") == 2,
      "day 10 must see only day 10 (days 1-2 are out of range)")
    assert(out.values.forall(_.getAs[Boolean]("within_5pct")))
  }

  // ---- BLEU ------------------------------------------------------------

  private def bleuOf(pairs: Seq[(String, String)]): Map[String, Any] = {
    val df = pairs.toDF("cand", "ref")
    val row = Quality.bleuCorpus(df, col("cand"), col("ref")).head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("bleu: identical corpus scores exactly 1.0") {
    val m = bleuOf(Seq(("the cat sat on the mat", "the cat sat on the mat")))
    assert(m("p1") == 1.0 && m("p4") == 1.0 && m("bp") == 1.0 && m("bleu") == 1.0)
  }

  test("bleu: clipping caps repeated candidate grams at the reference count") {
    // the classic degenerate candidate: p1 must be 2/7 (ref has two 'the'),
    // not 7/7
    val m = bleuOf(Seq(("the the the the the the the",
      "the cat is on the mat")))
    assert(m("p1") == 2.0 / 7.0, s"clipped unigram precision: ${m("p1")}")
    assert(m("p2") == 0.0)
  }

  test("bleu: brevity penalty fires only when the candidate corpus is shorter") {
    val short = bleuOf(Seq(("the cat", "the cat sat on the mat")))
    assert(short("bp").asInstanceOf[Double] == math.exp(1.0 - 6.0 / 2.0))
    val long = bleuOf(Seq(("the cat sat on the mat", "the cat")))
    assert(long("bp") == 1.0)
  }

  test("bleu: corpus pooling sums counts, not per-sentence scores") {
    // pair 1: 3/3 unigrams; pair 2: 0/3 — pooled p1 = 3/6, not mean(1, 0)
    val m = bleuOf(Seq(("a b c", "a b c"), ("x y z", "p q r")))
    assert(m("p1") == 0.5)
  }

  // ---- Cohen's kappa ---------------------------------------------------

  test("kappa: perfect agreement is 1, known 2x2 table matches hand value") {
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(Quality.cohenKappa(perfect, col("a"), col("b"))
      .head().getAs[Double]("kappa") == 1.0)
    // the standard worked example: po=.7, pe=.5 -> kappa=.4 exactly
    val rows = Seq.fill(35)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
      Seq.fill(15)(("n", "y")) ++ Seq.fill(35)(("n", "n"))
    val m = Quality.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(m.getAs[Double]("po") == 0.7)
    assert(m.getAs[Double]("pe") == 0.5)
    assert(m.getAs[Double]("kappa") == 0.4 / 1.0)
  }

  test("kappa: disjoint label vocabularies give pe = 0 and kappa = po") {
    val df = Seq(("x", "u"), ("y", "v")).toDF("a", "b")
    val m = Quality.cohenKappa(df, col("a"), col("b")).head()
    assert(m.getAs[Double]("pe") == 0.0 && m.getAs[Double]("kappa") == 0.0)
  }

  // ---- approx quantiles ------------------------------------------------

  test("approxQuantiles: audit band holds on uniform data, n is exact") {
    val df = (1 to 10000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
    val out = Freq.approxQuantiles(df, col("g"), col("v"),
      Seq(0.5, 0.9, 0.99), audit = true).collect()
    assert(out.length == 12)
    assert(out.forall(_.getAs[Boolean]("within_band")), "GK band broken")
    assert(out.forall(_.getAs[Long]("n") == 2500L))
  }

  test("approxQuantiles: production mode returns near-exact values, no audit pass") {
    val df = (1 to 10000).map(i => (1, i.toDouble)).toDF("g", "v")
    val out = Freq.approxQuantiles(df, col("g"), col("v"), Seq(0.5))
    assert(!out.queryExecution.executedPlan.toString.contains("Join"),
      "audit=false must not join the corpus back")
    val q = out.head().getAs[Double]("approx_q")
    assert(math.abs(q - 5000.0) < 100.0, s"p50 of 1..10000 was $q")
  }

  // ---- OLS trend -------------------------------------------------------

  test("olsTrend: exact line is recovered exactly; constant x yields NULL") {
    val us = 86400000000L
    val line = (0 to 9).map(d => ("up", d.toLong * us, 700L + 3L * d))
    val flat = (0 to 9).map(_ => ("flat", 5L * us, 100L))
    val df = (line ++ flat).toDF("g", "t_us", "cents")
      .withColumn("ts", timestamp_micros(col("t_us")))
    val out = TimeSeries.olsTrend(df, col("g"), col("ts"), col("cents"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("up").getAs[Double]("slope_cents_per_day") == 3.0)
    assert(out("up").getAs[Double]("intercept_cents") == 700.0)
    assert(out("flat").isNullAt(out("flat").fieldIndex("slope_cents_per_day")))
  }

  // ---- Gini ------------------------------------------------------------

  test("gini: uniform counts give 0, full concentration approaches 1 - 1/k") {
    val even = (1 to 100).map(i => s"s${i % 4}").toDF("src")
    val g0 = Hygiene.giniConcentration(even, col("src")).head()
    assert(g0.getAs[Double]("gini") == 0.0)
    assert(g0.getAs[Long]("n_groups") == 4 && g0.getAs[Long]("total") == 100)
    // 97 docs in one source, 1 in each of 3 others: hand value
    // G = (2*Σi·x − 5*Σx) / (4*Σx) with sorted x = [1,1,1,97]
    val skew = (Seq.fill(97)("big") ++ Seq("a", "b", "c")).toDF("src")
    val g1 = Hygiene.giniConcentration(skew, col("src")).head()
    val six = 1 * 1 + 2 * 1 + 3 * 1 + 4 * 97
    val expected = (2.0 * six - 5 * 100) / (4.0 * 100)
    assert(g1.getAs[Double]("gini") == expected)
  }
}
