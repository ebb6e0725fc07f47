package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** The quality classifier's three contracts: (1) the char-polynomial word
  * hash matches the independently-computed fold (the value the DuckDB
  * oracle reproduces — cross-engine parity hinges on this number); (2)
  * distributed full-batch GD training equals a plain in-JVM reference
  * implementation to float-accumulation tolerance; (3) the learned model
  * actually separates a separable corpus, and the heuristic bootstrap
  * (LM-score labels) generalizes on the real table. */
class QualitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // independent reimplementation of the featurize fold (ASCII corpus: a
  // Scala Char's UTF-16 unit == the codepoint both engines hash)
  private def refHash(wd: String, dim: Int): Int = {
    var acc = 7L
    wd.foreach(c => acc = (acc * 31 + c.toInt) % Quality.HashMod)
    (acc % dim).toInt
  }
  private def refFeats(text: String, dim: Int): Array[Int] =
    text.split(" ").filter(_.nonEmpty).map(refHash(_, dim)).distinct.sorted

  private def refTrain(rows: Seq[(String, Double)], dim: Int, iters: Int,
                       lr: Double, momentum: Double = 0.9,
                       l2: Double = 0.0): Array[Double] = {
    val feats = rows.map { case (t, y) => (refFeats(t, dim), y) }
    val n = feats.size.toDouble
    val w = Array.fill(dim + 1)(0.0)
    val v = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      val g = Array.fill(dim + 1)(0.0)
      for ((f, y) <- feats) {
        val z = w(dim) + f.map(w(_)).sum
        val r = 1.0 / (1.0 + math.exp(-z)) - y
        f.foreach(i => g(i) += r)
        g(dim) += r
      }
      for (i <- 0 to dim) {
        // ridge excludes the intercept (index dim)
        val reg = if (i == dim) 0.0 else l2 * w(i)
        v(i) = momentum * v(i) + g(i) / n + reg
        w(i) -= lr * v(i)
      }
    }
    w
  }

  // the synthetic separable corpus: positives draw from one vocabulary,
  // negatives from a disjoint one (deterministic LCG, no Random)
  private def synthetic(nPerClass: Int): Seq[(Long, String, Int)] = {
    def words(seed: Int, prefix: String) =
      (0 until 12).map(j => s"$prefix${(seed * 7919 + j * 104729) % 20}")
    (0 until nPerClass).flatMap { i =>
      Seq((i.toLong, words(i, "good").mkString(" "), 1),
        ((i + nPerClass).toLong, words(i, "bad").mkString(" "), 0))
    }
  }

  test("featurize: char-polynomial fold matches the independent value") {
    import spark.implicits._
    // 'hat': ((7*31+104)*31+97)*31+116 mod 1000003 = 311604 — the exact
    // value the DuckDB oracle's list_reduce computes
    val big = Quality.HashMod.toInt // dim > any raw hash ⇒ raw fold observable
    val got = Seq("hat x hat  y").toDF("text")
      .select(Quality.featurize(col("text"), big)).head().getSeq[Int](0)
    assert(got == got.sorted, "features must be sorted")
    assert(got.contains(311604), s"'hat' fold: $got")
    assert(got.size == 3, "distinct drops the repeated word, filter drops ''")
    // parity with the reference across the real corpus at gate dim
    val docs = SparkEntry.table(spark, dir, "documents").limit(50)
    val rows = docs.select(col("doc_id"), col("text"),
      Quality.featurize(col("text"), Quality.GateDim).as("f")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](2) == refFeats(r.getString(1), Quality.GateDim).toSeq,
        s"featurize mismatch on doc ${r.getLong(0)}")
    }
  }

  test("train: distributed GD equals the in-JVM reference to float tolerance") {
    import spark.implicits._
    val data = synthetic(40)
    val df = data.toDF("doc_id", "text", "y")
    val dim = 64; val iters = 15; val lr = 1.0
    val w = Quality.train(df, col("text"), col("y"), dim, iters, lr)
    val ref = refTrain(data.map(r => (r._2, r._3.toDouble)), dim, iters, lr)
    val maxDiff = w.zip(ref).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff < 1e-6,
      s"distributed vs reference weight divergence: $maxDiff")
  }

  test("train with l2: equals the reference; intercept is NOT regularized") {
    import spark.implicits._
    // UNBALANCED corpus (3:1 positives) so the intercept grows large —
    // the regularized-vs-unregularized intercept distinction is then
    // far above float tolerance
    val data = synthetic(40).filter(r => r._3 == 1 || r._1 % 4 == 0)
    val df = data.toDF("doc_id", "text", "y")
    val dim = 64; val iters = 15; val lr = 1.0; val l2 = 0.05
    val w = Quality.train(df, col("text"), col("y"), dim, iters, lr, l2 = l2)
    val ref = refTrain(data.map(r => (r._2, r._3.toDouble)), dim, iters, lr,
      l2 = l2)
    val maxDiff = w.zip(ref).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff < 1e-6,
      s"distributed vs reference ridge weight divergence: $maxDiff")
    // an implementation that shrinks the intercept too would diverge from
    // the reference's intercept by far more than float tolerance
    val wrongIntercept = {
      val feats = data.map(r => (refFeats(r._2, dim), r._3.toDouble))
      val n = feats.size.toDouble
      val wv = Array.fill(dim + 1)(0.0); val vv = Array.fill(dim + 1)(0.0)
      for (_ <- 0 until iters) {
        val g = Array.fill(dim + 1)(0.0)
        for ((f, y) <- feats) {
          val z = wv(dim) + f.map(wv(_)).sum
          val r = 1.0 / (1.0 + math.exp(-z)) - y
          f.foreach(i => g(i) += r); g(dim) += r
        }
        for (i <- 0 to dim) { // the BUGGY variant: l2 on every index
          vv(i) = 0.9 * vv(i) + g(i) / n + l2 * wv(i)
          wv(i) -= lr * vv(i)
        }
      }
      wv.last
    }
    assert(math.abs(w.last - wrongIntercept) > 1e-4,
      "the fixture must distinguish an intercept-regularizing variant")
  }

  test("aucByGroup: NULL slice spanning partitions gets true offsets") {
    import spark.implicits._
    // one NULL slice with many distinct scores: the range partitioner
    // spreads its (sig=NULL, v) rows over several partitions, so a
    // dropped NULL in the offset lookup would zero every later
    // partition's cumulative count and corrupt the AUC
    val n = 5000
    val rows = (0 until n).map { i =>
      (i.toDouble, i % 3 == 0, null: String)
    } ++ Seq((1.0, true, "x"), (2.0, false, "x"))
    val df = rows.toDF("s", "y", "g")
    val got = Quality.aucByGroup(df, col("g"), col("s"), col("y"))
      .collect().map(r => Option(r.getString(0)) -> r).toMap
    val whole = Quality.aucExact(df.where(col("g").isNull),
      col("s"), col("y")).head()
    val nullRow = got(None)
    assert(java.lang.Double.doubleToLongBits(nullRow.getDouble(1)) ==
      java.lang.Double.doubleToLongBits(whole.getDouble(0)),
      "NULL slice must reproduce its standalone exact AUC bit-for-bit")
    assert(nullRow.getLong(2) == whole.getLong(1) &&
      nullRow.getLong(3) == whole.getLong(2))
  }

  test("chrF: identical pair scores 1.0; hand value; zero-order conventions") {
    import spark.implicits._
    def cf(c: String, r: String): (Double, Double, Double) = {
      val row = Quality.chrF(Seq((1L, c, r)).toDF("id", "c", "r"),
        col("id"), col("c"), col("r")).head()
      (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    }
    assert(cf("abcdef", "abcdef") == ((1.0, 1.0, 1.0)))
    assert(cf("ab", "xy") == ((0.0, 0.0, 0.0)))
    // hand value: cand "abc" vs ref "abd" — unigrams m=2/3, bigrams
    // m=1/2 ("ab"), n>=3 m=0 (ct3=1, rt3=1), orders 4..6 empty on both
    val (p, r, f) = cf("abc", "abd")
    val pExp = (2.0 / 3.0 + 1.0 / 2.0 + 0.0 + 0.0 + 0.0 + 0.0) / 6.0
    assert(p == pExp && r == pExp)
    assert(f == 5.0 * pExp * pExp / (4.0 * pExp + pExp))
    // multiset (not set) counting: repeated grams cap at the other side
    val (p2, _, _) = cf("aaa", "aa") // unigrams: m = 2, ct = 3
    assert(math.abs(p2 - (2.0 / 3.0 + 1.0 / 2.0) / 6.0) < 1e-15)
    // whitespace convention: the default strips it (sacrebleu-comparable),
    // so "abc def" ≡ "abcdef"; includeWhitespace = true restores raw grams
    assert(cf("abc def", "abcdef") == ((1.0, 1.0, 1.0)))
    assert(cf("ab\tcd\nef", "abcdef") == ((1.0, 1.0, 1.0)))
    val rawRow = Quality.chrF(Seq((1L, "abc def", "abcdef")).toDF("id", "c", "r"),
      col("id"), col("c"), col("r"), includeWhitespace = true).head()
    assert(rawRow.getDouble(3) < 1.0,
      "raw-string mode must see the space as a gram difference")
  }

  test("rougeL: classic LCS values incl. repeats; order sensitivity; JVM differential") {
    import spark.implicits._
    def rl(c: Seq[String], r: Seq[String]): (Long, Double, Double, Double) = {
      val row = Quality.rougeL(Seq((1L, c, r)).toDF("id", "c", "r"),
        col("id"), col("c"), col("r")).head()
      (row.getLong(1), row.getDouble(4), row.getDouble(5), row.getDouble(6))
    }
    // the textbook pair: LCS(ABCBDAB, BDCABA) = 4 (e.g. BCBA)
    assert(rl("ABCBDAB".map(_.toString), "BDCABA".map(_.toString))._1 == 4L)
    // identical → all ones; disjoint → zeros (incl. the 0/0 F guard)
    assert(rl(Seq("x", "y"), Seq("x", "y")) == ((2L, 1.0, 1.0, 1.0)))
    assert(rl(Seq("a"), Seq("b")) == ((0L, 0.0, 0.0, 0.0)))
    assert(rl(Nil, Seq("a"))._1 == 0L && rl(Nil, Seq("a"))._4 == 0.0)
    // ORDER sensitivity — the property token-F1 cannot see: a reversed
    // candidate keeps the multiset but loses the subsequence
    val gold = Seq("a", "b", "c", "d")
    assert(rl(gold, gold)._1 == 4L)
    assert(rl(gold.reverse, gold)._1 == 1L)
    // differential vs an independent full-matrix JVM reference on
    // deterministic pseudo-random arrays over a small alphabet (repeats)
    def ref(a: Seq[String], b: Seq[String]): Long = {
      val dp = Array.ofDim[Long](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
                   else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rnd = new scala.util.Random(20260815)
    for (_ <- 1 to 25) {
      val a = Seq.fill(rnd.nextInt(12))(('a' + rnd.nextInt(3)).toChar.toString)
      val b = Seq.fill(rnd.nextInt(12))(('a' + rnd.nextInt(3)).toChar.toString)
      assert(rl(a, b)._1 == ref(a, b), s"LCS($a, $b)")
    }
  }

  test("ChrfStats: differential vs exact substring multisets; unicode windows") {
    // independent reference: REAL substring multisets (no hashing) — any
    // window/hash/merge defect in the native expression shows up here
    def ref(c: String, r: String, maxN: Int): Seq[(Long, Long, Long)] =
      (1 to maxN).map { n =>
        def gs(s: String) = (0 to s.length - n).map(i => s.substring(i, i + n))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val (gc, gr) = (gs(c), gs(r))
        val m = gc.map { case (g, k) => math.min(k, gr.getOrElse(g, 0L)) }.sum
        (m, math.max(0, c.length - n + 1).toLong,
          math.max(0, r.length - n + 1).toLong)
      }
    def native(c: String, r: String, maxN: Int): Seq[(Long, Long, Long)] = {
      val arr = graft.functions.ChrfStats.compute(c, r, maxN)
      (0 until maxN).map(n =>
        (arr.getLong(3 * n), arr.getLong(3 * n + 1), arr.getLong(3 * n + 2)))
    }
    val rnd = new scala.util.Random(20260815)
    for (_ <- 1 to 200) {
      val c = Seq.fill(rnd.nextInt(24))(('a' + rnd.nextInt(4)).toChar).mkString
      val r = Seq.fill(rnd.nextInt(24))(('a' + rnd.nextInt(4)).toChar).mkString
      assert(native(c, r, 6) == ref(c, r, 6), s"ChrfStats($c, $r)")
    }
    // BMP unicode: windows count code points, not bytes
    assert(native("héllo", "héllo", 3) == ref("héllo", "héllo", 3))
    assert(native("", "ab", 2) == Seq((0L, 0L, 2L), (0L, 0L, 1L)))
  }

  test("chrfPP: word-order sensitivity chrF lacks; identity; differential word grams") {
    import spark.implicits._
    def pp(c: String, r: String): Double =
      Quality.chrfPP(Seq((1L, c, r)).toDF("id", "c", "r"),
        col("id"), col("c"), col("r")).head().getDouble(3)
    def cf(c: String, r: String): Double =
      Quality.chrF(Seq((1L, c, r)).toDF("id", "c", "r"),
        col("id"), col("c"), col("r")).head().getDouble(3)
    // identity scores 1.0 (all char orders present, both word orders)
    assert(pp("hello brave new world", "hello brave new world") == 1.0)
    // word order enters through the bigram term: reversing "a b" keeps
    // BOTH word unigrams (m=2/2) and both stripped char unigrams, but
    // zeroes the word bigram AND the char bigram —
    // p = (1 + 0 + 0·4 + 1 + 0)/8 = 0.25, F_2 = 5p²/(4p+p) = p
    val rev = pp("b a", "a b")
    assert(rev == 0.25, s"reversed-pair hand value: got $rev")
    assert(cf("b a", "a b") < 1.0 && pp("b a", "a b") < 1.0)
    // hand value on a tiny pair: cand "a b", ref "a c" —
    //   char grams (ws-stripped "ab" vs "ac"): n=1 m=1/2, n=2 m=0/1,
    //   n>=3 empty (0); word grams: n=1 m=1/2, n=2 m=0/1
    val got = pp("a b", "a c")
    val p = (1.0 / 2.0 + 0.0 + 0.0 + 0.0 + 0.0 + 0.0 + 1.0 / 2.0 + 0.0) / 8.0
    val exp = 5.0 * p * p / (4.0 * p + p)
    assert(got == exp, s"hand value: got $got want $exp")
    // TokenGramStats differential vs exact token-tuple multisets
    def refStats(a: Seq[String], b: Seq[String], maxN: Int): Seq[(Long, Long, Long)] =
      (1 to maxN).map { n =>
        def gs(s: Seq[String]) = s.sliding(n).filter(_.size == n).toSeq
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val (gc, gr) = (gs(a), gs(b))
        val m = gc.map { case (g, k) => math.min(k, gr.getOrElse(g, 0L)) }.sum
        (m, math.max(0, a.size - n + 1).toLong, math.max(0, b.size - n + 1).toLong)
      }
    val rnd = new scala.util.Random(20260816)
    for (_ <- 1 to 100) {
      val a = Seq.fill(rnd.nextInt(10))("w" + rnd.nextInt(3))
      val b = Seq.fill(rnd.nextInt(10))("w" + rnd.nextInt(3))
      val arr = graft.functions.TokenGramStats.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          a.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          b.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray), 3)
      val got3 = (0 until 3).map(n =>
        (arr.getLong(3 * n), arr.getLong(3 * n + 1), arr.getLong(3 * n + 2)))
      assert(got3 == refStats(a, b, 3), s"TokenGramStats($a, $b)")
    }
    // tuple boundaries: ("ab","c") and ("a","bc") are DIFFERENT bigrams
    val x = graft.functions.TokenGramStats.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("ab", "c").map(org.apache.spark.unsafe.types.UTF8String.fromString)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("a", "bc").map(org.apache.spark.unsafe.types.UTF8String.fromString)), 2)
    assert(x.getLong(0) == 0L && x.getLong(3) == 0L,
      "token tuples must not alias across boundaries")
  }

  test("sentenceBleu: identity, hand value, brevity penalty, zero-order collapse") {
    import spark.implicits._
    def sb(c: String, r: String): (Long, Long, Double, Double) = {
      val row = Quality.sentenceBleu(Seq((1L, c, r)).toDF("id", "c", "r"),
        col("id"), col("c"), col("r")).head()
      (row.getLong(1), row.getLong(2), row.getDouble(3), row.getDouble(4))
    }
    assert(sb("a b c d e", "a b c d e") == ((5L, 5L, 1.0, 1.0)))
    // hand value: p1 = 4/5, p2 = 3/4, p3 = 2/3, p4 = 1/2, bp = 1
    val (c1, r1, bp1, bleu1) = sb("a b c d e", "a b c d")
    assert((c1, r1, bp1) == ((5L, 4L, 1.0)))
    assert(bleu1 == math.sqrt(math.sqrt(4.0 / 5.0 * (3.0 / 4.0) * (2.0 / 3.0) * 0.5)))
    // a short candidate has no 3/4-grams: unsmoothed BLEU collapses to 0,
    // and the brevity penalty is exp(1 - r/c)
    val (c2, r2, bp2, bleu2) = sb("a b", "a b c d")
    assert((c2, r2) == ((2L, 4L)) && bp2 == math.exp(1.0 - 2.0) && bleu2 == 0.0)
    // empty candidate scores 0 with bp 0, row kept
    assert(sb("", "a b") == ((0L, 2L, 0.0, 0.0)))
  }

  test("selfBleu: collapsed group scores 1, diverse group scores 0, pairing is per-group") {
    import spark.implicits._
    // group A: three identical docs → 2 pairs, each BLEU 1 → mean 1.0
    // group B: two disjoint docs → 1 pair, BLEU 0
    // singleton group C: no pair → no row
    val docs = Seq(
      (1L, "a b c d e", "A"), (2L, "a b c d e", "A"), (3L, "a b c d e", "A"),
      (4L, "a b c d e", "B"), (5L, "v w x y z", "B"),
      (6L, "a b c d e", "C")
    ).toDF("doc_id", "text", "source")
    val got = Quality.selfBleu(docs, col("source")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map("A" -> ((2L, 1.0)), "B" -> ((1L, 0.0))), s"got $got")
  }

  test("quantile small-path guard: oversized histogram trips to the prefix sum") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val want = Quality.exactQuantiles(docs, col("n_chars"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // force the in-plan raise_error trip: every boundary must then come
    // from the two-phase prefix-sum fallback, bit-identically
    System.setProperty("graft.quantile.smallPathBound", "4")
    try {
      val got = Quality.exactQuantiles(docs, col("n_chars"), k = 10).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, "fallback boundaries diverged from the small path")
    } finally System.clearProperty("graft.quantile.smallPathBound")
  }

  test("decileBySlice: NULL slice is its own bucket, not an NPE") {
    import spark.implicits._
    val rows = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "a" else null,
      i.toLong)) // nulls hold odd values 1..39, 'a' holds even 2..40
    val out = Quality.decileBySlice(rows.toDF("doc_id", "src", "v"),
      col("src"), col("v")).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(3)))).toMap
    assert(out.size == 40)
    // slice labels survive the round-trip (NULL stays NULL)
    assert(out(2L)._1.contains("a") && out(1L)._1.isEmpty)
    // per-slice JVM rank rule for the NULL slice
    val nullVals = (1 to 39 by 2).map(_.toLong).sorted
    val bounds = (1 until 10).map(b =>
      nullVals(math.ceil(b.toDouble * nullVals.length / 10).toInt - 1))
    (1 to 39 by 2).foreach { i =>
      assert(out(i.toLong)._2 == bounds.count(_ <= i).toLong,
        s"null-slice decile for v=$i")
    }
  }

  test("train + scoreWith: separable corpus separates; filter keeps positives") {
    import spark.implicits._
    val df = synthetic(60).toDF("doc_id", "text", "y")
    val w = Quality.train(df, col("text"), col("y"), dim = 64, iters = 30)
    val scored = Quality.scoreWith(df, w.init, bias = w.last)
      .select(col("y"), col("quality_prob")).collect()
    val acc = scored.count(r =>
      (r.getDouble(1) >= 0.5) == (r.getInt(0) == 1)) / scored.length.toDouble
    assert(acc >= 0.95, s"separable corpus must separate, accuracy $acc")
    val kept = Quality.filterByQuality(df, w.init, bias = w.last)
    assert(kept.columns.toSet == df.columns.toSet, "filter preserves schema")
    assert(kept.where(col("y") === 1).count() >= 57, "positives survive")
    assert(kept.where(col("y") === 0).count() <= 3, "negatives filtered")
  }

  test("scoreWith: scoring is deterministic bit-for-bit across runs") {
    val docs = SparkEntry.table(spark, dir, "documents")
    def run(): Map[Long, Double] =
      Quality.scoreWith(docs, Quality.GateWeights)
        .select(col("doc_id"), col("quality_logit")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run(); val b = run()
    assert(a.size == b.size && a.forall { case (k, v) =>
      java.lang.Double.doubleToLongBits(b(k)) == java.lang.Double.doubleToLongBits(v)
    }, "sorted-fold scoring must be bit-reproducible")
  }

  test("trainOnHeuristic: bootstrap labels generalize the LM signal") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val reference = docs.where(col("doc_id") % 50 === 0)
    val crawl = docs.where(col("doc_id") % 50 =!= 0)
    val w = Quality.trainOnHeuristic(crawl, reference, dim = 256, iters = 20)
    // the classifier must agree with the labels it was fitted to much
    // better than chance — on the extreme strata it actually saw
    val scored = TextAnalysis.lmScore(crawl, reference)
      .select(col("doc_id"), col("mean_prob"))
    val Array(lo, hi) = scored.stat.approxQuantile("mean_prob", Array(0.3, 0.7), 0.001)
    val eval = crawl.join(scored, "doc_id")
      .where(col("mean_prob") <= lo || col("mean_prob") >= hi)
      .withColumn("y", (col("mean_prob") >= hi).cast("int"))
    val preds = Quality.scoreWith(eval, w.init, bias = w.last)
      .select(col("y"), col("quality_prob")).collect()
    val acc = preds.count(r =>
      (r.getDouble(1) >= 0.5) == (r.getInt(0) == 1)) / preds.length.toDouble
    assert(acc > 0.7, s"bootstrap classifier barely beats chance: $acc")
  }

  test("importanceWeights == ratio of two independent lmScore passes, bit-exact") {
    val docs = graft.SparkEntry.table(spark, dir, "documents")
    val target = docs.where(col("lang") === "en")
    val got = Quality.importanceWeights(docs, target, docs)
      .select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent composition: two lmScore runs share the identical
    // rational arithmetic, so the ratio must match to the last bit
    val t = TextAnalysis.lmScore(docs, target)
      .select(col("doc_id"), col("mean_prob").as("mt"))
    val r = TextAnalysis.lmScore(docs, docs)
      .select(col("doc_id"), col("mean_prob").as("mr"))
    val exp = t.join(r, "doc_id")
      .select(col("doc_id"), (col("mt") / col("mr")).as("w")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got.keySet == exp.keySet && got.nonEmpty)
    assert(got.forall { case (id, w) => w == exp(id) })
    // the signal points the right way: target-language docs weigh more
    val byLang = Quality.importanceWeights(docs, target, docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg("weight").as("aw"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(byLang("en") > byLang("zh"))
    // resample selects exactly the top-k of the weight ranking
    val top = Quality.importanceResample(docs, target, docs, k = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expTop = exp.toSeq.sortBy { case (id, w) => (-w, id) }.take(20)
      .map(_._1).toSet
    assert(top == expTop)
  }

  test("driftReport: brute-force bucket counts; clamped edges; smoothed shares") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val ref = docs.where(col("doc_id") % 2 === 0)
    val cur = docs.where(col("doc_id") % 2 === 1)
    val rv = ref.select("n_chars").collect().map(_.getLong(0))
    val cv = cur.select("n_chars").collect().map(_.getLong(0))
    val (mn, mx) = (rv.min, rv.max)
    val width = math.max(1L, (mx - mn + 10) / 10)
    def bucket(v: Long) = math.min(math.max((v - mn) / width, 0L), 9L)
    val refN = rv.groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val curN = cv.groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val rows = Quality.driftReport(ref, cur, col("n_chars")).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) == mn + b * width && r.getLong(2) == mn + (b + 1) * width)
      assert(r.getLong(3) == refN.getOrElse(b, 0L), s"ref_n bucket $b")
      assert(r.getLong(4) == curN.getOrElse(b, 0L), s"cur_n bucket $b")
      assert(r.getDouble(5) == (refN.getOrElse(b, 0L) + 1).toDouble / (rv.length + 10))
      assert(r.getDouble(6) == (curN.getOrElse(b, 0L) + 1).toDouble / (cv.length + 10))
    }
    // every row accounted: counts reconcile with slice sizes
    assert(rows.map(_.getLong(3)).sum == rv.length && rows.map(_.getLong(4)).sum == cv.length)
    // candidate mass OUTSIDE the reference range clamps into edge buckets
    import spark.implicits._
    val refT = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "v")
    val curT = Seq((3L, -100L), (4L, 999L)).toDF("doc_id", "v")
    val edges = Quality.driftReport(refT, curT, col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(edges(0L) == 1L && edges(9L) == 1L)
  }

  test("calibration/auc/prCurve: constructed-score exactness and invariants") {
    import spark.implicits._
    // 4 positives scoring high, 4 negatives low, one tied pair at 1.0
    // (one pos + one neg) — AUC must apply the half-credit tie correction
    val t = Seq(
      (2.6, true), (2.1, true), (1.2, true), (1.0, true),
      (1.0, false), (0.3, false), (-0.4, false), (-1.7, false)
    ).toDF("s", "y")
    val auc = Quality.aucExact(t, col("s"), col("y")).head()
    // hand count: pos-neg pairs won = 4*4 minus: (1.0 pos vs 1.0 neg) = ½,
    // (1.0 pos beats 0.3, -0.4, -1.7) ok → wins 15.5 of 16
    assert(auc.getDouble(0) == 15.5 / 16.0, s"auc ${auc.getDouble(0)}")
    assert(auc.getLong(1) == 4L && auc.getLong(2) == 4L)
    val cal = Quality.calibrationTable(t, col("s"), col("y"), width = 1.0,
      minBand = -2, maxBand = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cal(2L) == (2L, 2L))  // 2.6, 2.1 both positive
    assert(cal(1L) == (3L, 2L))  // 1.2, 1.0(pos), 1.0(neg)
    assert(cal(-2L) == (1L, 0L)) // -1.7 clamped into the floor band
    val pr = Quality.prCurve(t, col("s"), col("y"), width = 1.0,
      minBand = -2, maxBand = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(-_._1)
    // recall is monotone non-decreasing from the top band down and ends at 1
    pr.sliding(2).foreach {
      case Array(hi2, lo2) => assert(hi2._5 <= lo2._5)
      case _ =>
    }
    assert(pr.last._5 == 1.0 && pr.last._2 == 8L)
    // top band: accept score >= 2 → 2 accepted, both positive
    assert(pr.head == (2L, 2L, 2L, 1.0, 0.5))
  }

  test("absorbDriftBatch: cumulative streaming report == batch driftReport; replay safe") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val ref = docs.where(col("doc_id") % 2 === 0)
    val cur = docs.where(col("doc_id") % 2 === 1)
    val frozen = Quality.freezeDriftRef(ref, col("n_chars"))
    val stateDir = java.nio.file.Files.createTempDirectory("driftstate").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).toSet
    // three arrival batches of the candidate stream
    Quality.absorbDriftBatch(spark, stateDir, 0L,
      cur.where(col("doc_id") % 3 === 1), col("n_chars"), frozen)
    Quality.absorbDriftBatch(spark, stateDir, 1L,
      cur.where(col("doc_id") % 3 === 2), col("n_chars"), frozen)
    val streamed = rows(Quality.absorbDriftBatch(spark, stateDir, 2L,
      cur.where(col("doc_id") % 3 === 0), col("n_chars"), frozen))
    val batch = rows(Quality.driftReport(ref, cur, col("n_chars")))
    assert(streamed == batch,
      "cumulative streaming drift must equal the one-shot report")
    // replay reproduces the identical report without double counting
    val replayed = rows(Quality.absorbDriftBatch(spark, stateDir, 2L,
      cur.where(col("doc_id") % 3 === 0), col("n_chars"), frozen))
    assert(replayed == batch)
  }

  test("qualityEnsemble: deciles match the JVM rank rule; composite is their sum") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val raw = docs.select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // JVM reference: per signal, boundary b = value at rank ceil(b*n/10);
    // decile = #boundaries <= v (split with limit -1: Spark's semantics)
    val sigs: Map[String, Map[Long, Long]] = Map(
      "len" -> raw.map(r => r._1 -> r._2.split(" ", -1).length.toLong).toMap,
      "vocab" -> raw.map(r => r._1 -> r._2.split(" ", -1).distinct.length.toLong).toMap,
      "chars" -> raw.map(r => r._1 -> r._3).toMap)
    val n = raw.length
    def deciles(vals: Map[Long, Long]): Map[Long, Long] = {
      val sorted = vals.values.toSeq.sorted
      val bounds = (1 until 10).map { b =>
        sorted(math.ceil(b.toDouble * n / 10).toInt - 1)
      }
      vals.map { case (id, v) => id -> bounds.count(_ <= v).toLong }
    }
    val want = sigs.map { case (nm, vals) => nm -> deciles(vals) }
    val got = Quality.qualityEnsemble(docs, Seq(
        "len" -> size(split(col("text"), " ")),
        "vocab" -> size(array_distinct(split(col("text"), " "))),
        "chars" -> col("n_chars"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == n)
    got.foreach { case (id, dl, dv, dc, comp) =>
      assert(dl == want("len")(id), s"len decile of doc $id")
      assert(dv == want("vocab")(id), s"vocab decile of doc $id")
      assert(dc == want("chars")(id), s"chars decile of doc $id")
      assert(comp == dl + dv + dc, s"composite of doc $id")
    }
  }

  test("exactQuantiles: boundaries equal the JVM sorted-rank rule") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val vs = docs.select("n_chars").collect().map(_.getLong(0)).sorted
    val k = 20
    val want = (1 until k).map { q =>
      q.toLong -> vs(math.ceil(q.toDouble * vs.length / k).toInt - 1)
    }.toMap
    val got = Quality.exactQuantiles(docs, col("n_chars"), k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("decileBySlice: per-slice deciles equal the per-slice JVM rank rule") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val raw = docs.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = raw.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.map(_._3).sorted
      val bounds = (1 until 10).map(b =>
        sorted(math.ceil(b.toDouble * rows.length / 10).toInt - 1))
      rows.map { case (id, _, v) => id -> bounds.count(_ <= v).toLong }
    }.toMap
    val got = Quality.decileBySlice(docs, col("source"), col("n_chars"))
      .select("doc_id", "decile").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("aucByGroup: one-group slice == aucExact; single-class slice yields null") {
    import spark.implicits._
    val docs = SparkEntry.table(spark, dir, "documents")
    val scored = docs.select(col("doc_id"), col("lang"),
      col("n_chars").cast("double").as("s"))
    val whole = Quality.aucExact(scored, col("s"), col("lang") === "en").head()
    val grouped = Quality.aucByGroup(
        scored.withColumn("g", lit("all")), col("g"), col("s"),
        col("lang") === "en").head()
    assert(java.lang.Double.doubleToLongBits(grouped.getDouble(1)) ==
      java.lang.Double.doubleToLongBits(whole.getDouble(0)),
      "a single slice must reproduce the global AUC bit-for-bit")
    assert(grouped.getLong(2) == whole.getLong(1) &&
      grouped.getLong(3) == whole.getLong(2))
    val oneClass = Seq((1.0, true, "x"), (2.0, true, "x")).toDF("s", "y", "g")
    val row = Quality.aucByGroup(oneClass, col("g"), col("s"), col("y")).head()
    assert(row.isNullAt(1), "single-class slice must be null, not NaN")
  }

  test("madOutliers: medians and flags equal the JVM recompute") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val vs = docs.select("n_chars").collect().map(_.getLong(0))
    val sorted = vs.sorted
    val med = sorted(math.ceil(vs.length / 2.0).toInt - 1)
    val devs = vs.map(v => math.abs(v - med)).sorted
    val mad = devs(math.ceil(vs.length / 2.0).toInt - 1)
    val got = Quality.madOutliers(docs, col("n_chars")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    got.values.foreach { case (v, dev, flag) =>
      assert(dev == math.abs(v - med))
      assert(flag == (dev > 3 * mad))
    }
    assert(got.values.exists(_._3) || mad * 3 >= devs.last,
      "fixture should exercise the flag (or no value can exceed 3*MAD)")
  }

  test("winsorize: clamp equals the JVM sorted-rank boundaries") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val vs = docs.select("n_chars").collect().map(_.getLong(0)).sorted
    def bAt(q: Int, k: Int) = vs(math.ceil(q.toDouble * vs.length / k).toInt - 1)
    val (blo, bhi) = (bAt(1, 20), bAt(19, 20))
    val got = Quality.winsorize(docs.select("doc_id", "n_chars"),
        col("n_chars"), "w").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.values.foreach { case (raw, w) =>
      assert(w == math.min(math.max(raw, blo), bhi))
    }
    assert(got.values.exists { case (raw, w) => raw != w },
      "the gate corpus should actually have clamped tails")
  }

  test("absorbQuantileBatch: maintained boundaries == one-shot; replay idempotent") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val stateDir = java.nio.file.Files.createTempDirectory("qstate").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Quality.absorbQuantileBatch(spark, stateDir, 0L,
      docs.where(col("doc_id") % 3 === 0), col("n_chars"))
    Quality.absorbQuantileBatch(spark, stateDir, 1L,
      docs.where(col("doc_id") % 3 === 1), col("n_chars"))
    val maintained = rows(Quality.absorbQuantileBatch(spark, stateDir, 2L,
      docs.where(col("doc_id") % 3 === 2), col("n_chars")))
    val oneShot = rows(Quality.exactQuantiles(docs, col("n_chars"), 10))
    assert(maintained == oneShot,
      "the maintained histogram must reproduce the one-shot rank rule")
    // replaying the last batch recomputes against the pre-batch snapshot
    val replayed = rows(Quality.absorbQuantileBatch(spark, stateDir, 2L,
      docs.where(col("doc_id") % 3 === 2), col("n_chars")))
    assert(replayed == oneShot, "replay must not double-count")
  }

  test("quantileBounds prefix sum: exact on a 50k-distinct-value domain (multi-range)") {
    import spark.implicits._
    // high-cardinality probe: the distinct-value histogram spans every
    // shuffle partition, so a wrong cross-range offset would misplace
    // thousands of values into neighboring buckets
    val vs = (0 until 50000).map(i => (i.toLong * 2654435761L) % 1000003L)
    val ref = vs.toDF("n_chars")
    val sorted = vs.sorted
    val bounds = (1 until 10).map(b =>
      sorted(math.ceil(b.toDouble * vs.length / 10).toInt - 1))
    val refN = vs.groupBy(v => bounds.count(_ <= v).toLong)
      .view.mapValues(_.length.toLong).toMap
    val rows = Quality.driftReportQuantile(ref, ref, col("n_chars")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (b, (rn, cn)) =>
      assert(rn == refN.getOrElse(b, 0L), s"bucket $b ref count")
      assert(cn == rn, "identical slices must bucket identically")
    }
    assert(rows.values.map(_._1).sum == vs.length.toLong)
  }

  test("quantileBounds: empty reference slice fails loudly, not with an NPE") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("n_chars")
    val cur = Seq(1L, 2L).toDF("n_chars")
    val e = intercept[IllegalArgumentException] {
      Quality.driftReportQuantile(empty, cur, col("n_chars")).collect()
    }
    assert(e.getMessage.contains("empty"))
  }

  test("driftReportQuantile: brute-force boundaries; reference mass balanced per bucket") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val ref = docs.where(col("doc_id") % 2 === 0)
    val cur = docs.where(col("doc_id") % 2 === 1)
    val rv = ref.select("n_chars").collect().map(_.getLong(0)).sorted
    val n = rv.length
    val bounds = (1 until 10).map { b =>
      val need = math.ceil(b.toDouble * n / 10).toInt
      rv(need - 1) // smallest value whose running count reaches `need`
    }
    def bucket(v: Long) = bounds.count(_ <= v).toLong
    val refN = rv.groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val rows = Quality.driftReportQuantile(ref, cur, col("n_chars")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == (0L until 10L).toSet)
    rows.foreach { case (b, (rn, _)) => assert(rn == refN.getOrElse(b, 0L), s"bucket $b") }
    // equi-depth: every reference bucket holds [floor, ceil+ties] of n/10 —
    // loose band because ties cluster at boundaries
    val counts = rows.toSeq.sortBy(_._1).map(_._2._1)
    assert(counts.sum == n)
    assert(counts.max <= n / 10 * 3 && counts.count(_ > 0) >= 8,
      s"equal-depth buckets implausibly skewed: $counts")
  }

  test("psiTotal: equals the in-JVM ascending-bucket fold; zero on no drift") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val ref = docs.where(col("doc_id") % 2 === 0)
    val cur = docs.where(col("doc_id") % 2 === 1)
    val terms = Quality.driftReport(ref, cur, col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getDouble(5), r.getDouble(6))).sortBy(_._1)
    var want = 0.0
    terms.foreach { case (_, p, q) => want = want + (p - q) * math.log(p / q) }
    val got = Quality.psiTotal(ref, cur, col("n_chars")).head().getDouble(0)
    assert(got == want, "engine fold must be bit-identical to the JVM fold")
    // identical slices → identical counts and totals → every term ln(1)=0
    assert(Quality.psiTotal(ref, ref, col("n_chars")).head().getDouble(0) == 0.0)
  }

  test("tokenF1: constructed cases — exact, disjoint, multiset dups, empties") {
    import spark.implicits._
    val fix = Seq(
      (1L, "a b c", "a b c"),     // exact: ov 3, f1 1
      (2L, "a b", "c d"),         // disjoint: all zero
      (3L, "a a b", "a c"),       // multiset: min(2,1)=1 for 'a' → ov 1
      (4L, "", "a b"),            // empty pred: P defined 0
      (5L, "a b", ""),            // empty gold: R defined 0
      (6L, "", ""))               // both empty: exact but f1 defined 0
      .toDF("id", "p", "g")
    val got = Quality.tokenF1(fix, col("id"), col("p"), col("g")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))).toMap
    assert(got(1L) == ((3L, 3L, 3L, 1.0, 1.0, 1.0, 1L)))
    assert(got(2L) == ((0L, 2L, 2L, 0.0, 0.0, 0.0, 0L)))
    assert(got(3L) == ((1L, 3L, 2L, 1.0 / 3.0, 0.5, 2.0 / 5.0, 0L)))
    assert(got(4L) == ((0L, 0L, 2L, 0.0, 0.0, 0.0, 0L)))
    assert(got(5L) == ((0L, 2L, 0L, 0.0, 0.0, 0.0, 0L)))
    assert(got(6L) == ((0L, 0L, 0L, 0.0, 0.0, 0.0, 1L)))
  }
}
