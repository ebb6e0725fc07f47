package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.ProdSession

/** Differential pins for the round-14 native text/vector expressions:
  * each must be BIT-IDENTICAL to the interpreted higher-order-function
  * chain it replaced (the whole point of the swap is speed, not new
  * semantics), across the awkward token shapes — doubled/leading/trailing
  * spaces (empty tokens), unicode, short documents, empty strings. */
class NativeTextExprSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark
  import spark.implicits._

  /** Deterministic awkward corpus: spacing pathologies, unicode, repeats. */
  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a",                       // heavy repeats (distinct matters)
    "double  space  here",             // empty tokens between words
    " leading and trailing ",          // empty tokens at both ends
    "",                                // one empty token
    " ",                               // two empty tokens
    "one",                             // shorter than every k > 1
    "héllo wörld ünïcode tökens ünïcode wörld", // multi-byte UTF-8
    "x " * 200 + "y",                  // long doc
    (0 until 50).map(i => s"w${i % 7}").mkString(" ")) // periodic repeats

  private def df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("id", "text")

  /** The replaced HOF chain, verbatim (Hygiene.ngramsOf pre-r14). */
  private def hofGrams(w: Column, k: Int): Column =
    when(size(w) >= k,
        transform(sequence(lit(1), size(w) - (k - 1)),
          i => array_join(slice(w, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  test("WordGrams == split + transform/array_join/slice HOF chain") {
    for (k <- Seq(1, 2, 3, 4, 13)) {
      val got = df.select(col("id"),
        vectors.wordGrams(col("text"), k).as("g"),
        hofGrams(split(col("text"), " "), k).as("e")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"k=$k id=${r.getLong(0)}: native=${r.getSeq[String](1)} hof=${r.getSeq[String](2)}")
      }
      val gotD = df.select(col("id"),
        vectors.wordGrams(col("text"), k, distinct = true).as("g"),
        array_distinct(hofGrams(split(col("text"), " "), k)).as("e")).collect()
      gotD.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"distinct k=$k id=${r.getLong(0)}")
      }
    }
  }

  test("WordGramHashes == distinct chained multi-arg xxhash64 over the HOF grams") {
    for (n <- Seq(1, 2, 3, 4)) {
      val w = split(col("text"), " ")
      val hof = array_distinct(when(size(w) >= n,
          transform(sequence(lit(1), size(w) - (n - 1)), i =>
            xxhash64((0 until n).map(j => element_at(w, i + j)): _*)))
        .otherwise(array().cast("array<long>")))
      val got = df.select(col("id"),
        vectors.wordGramHashes(col("text"), n).as("g"), hof.as("e")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n id=${r.getLong(0)}: native=${r.getSeq[Long](1)} hof=${r.getSeq[Long](2)}")
      }
    }
  }

  test("WinnowFingerprints == the interpreted winnowing chain (pre-r14 verbatim)") {
    // the replaced chain, verbatim from TextAnalysis.winnow pre-r14
    def hofWinnow(k: Int, w: Int) = {
      val words = split(col("text"), " ")
      val grams = when(size(col("__w")) >= k,
        transform(sequence(lit(1), size(col("__w")) - (k - 1)), i =>
          concat_ws(" ", (0 until k).map(o => element_at(col("__w"), i + o)): _*)))
        .otherwise(array().cast("array<string>"))
      val hv = transform(col("__g"), g =>
        conv(substring(sha2(g, 256), 1, 8), 16, 10).cast("long"))
      val keys = transform(col("__h"), (h, p) => h * lit(1048576L) - p)
      val zero = struct(lit(Long.MaxValue).as("bk"), lit(-1).as("bp"))
      val sel = when(size(col("__k")) >= w,
        array_distinct(transform(sequence(lit(0), size(col("__k")) - w), i =>
          aggregate(sequence(i, i + (w - 1)), zero, (acc, p) =>
            when(element_at(col("__k"), p + 1) < acc.getField("bk"),
              struct(element_at(col("__k"), p + 1).as("bk"), p.as("bp")))
              .otherwise(acc)).getField("bp"))))
        .otherwise(array().cast("array<int>"))
      df.select(col("id"), words.as("__w"))
        .select(col("id"), grams.as("__g"))
        .select(col("id"), hv.as("__h"))
        .select(col("id"), col("__h"), keys.as("__k"))
        .select(col("id"), col("__h"), explode(sel).as("pos"))
        .select(col("id"), col("pos").cast("long").as("pos"),
          element_at(col("__h"), col("pos") + 1).as("fp"))
    }
    for ((k, w) <- Seq((3, 4), (2, 2), (1, 3), (4, 5))) {
      val native = df.select(col("id"),
          explode(vectors.winnowFingerprints(col("text"), k, w)).as("s"))
        .select(col("id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val hof = hofWinnow(k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(native == hof,
        s"k=$k w=$w: native-only=${(native -- hof).take(5)} hof-only=${(hof -- native).take(5)}")
    }
  }

  test("WindowBoundaryCos == the interpreted window-cosine chain (pre-r14 verbatim)") {
    def hofBoundaries(window: Int) = {
      val w = col("__w")
      val nWin = ceil(size(w) / lit(window.toDouble)).cast("int")
      val wins = transform(sequence(lit(0), nWin - 1),
        j => slice(w, j * window + 1, lit(window)))
      def cnt(f: Column, x: Column): Column =
        size(filter(f, t => t === x)).cast("long")
      val pairs = transform(sequence(lit(0), size(col("__wins")) - 2), j =>
        struct(j.as("j"),
          element_at(col("__wins"), j + 1).as("f1"),
          element_at(col("__wins"), j + 2).as("f2")))
      val f1 = col("p.f1"); val f2 = col("p.f2")
      val dot = aggregate(array_distinct(f1), lit(0L),
        (acc, x) => acc + cnt(f1, x) * cnt(f2, x))
      def norm2(f: Column): Column = aggregate(array_distinct(f), lit(0L),
        (acc, x) => acc + cnt(f, x) * cnt(f, x))
      df.select(col("id"), split(col("text"), " ").as("__w"))
        .where(size(col("__w")) > window)
        .select(col("id"), wins.as("__wins"))
        .select(col("id"), explode(pairs).as("p"))
        .select(col("id"),
          ((col("p.j") + 1) * window).cast("long").as("boundary_tok"),
          dot.as("__dot"), norm2(f1).as("__n1"), norm2(f2).as("__n2"))
        .select(col("id"), col("boundary_tok"),
          when(col("__n1") === 0L || col("__n2") === 0L, lit(0.0))
            .otherwise(col("__dot").cast("double") /
              (sqrt(col("__n1").cast("double")) * sqrt(col("__n2").cast("double"))))
            .as("cos"))
    }
    for (window <- Seq(2, 3, 16)) {
      val native = df.select(col("id"),
          explode(vectors.windowBoundaryCos(col("text"), window)).as("b"))
        .select(col("id"), col("b.boundary_tok"), col("b.cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      val hof = hofBoundaries(window)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      assert(native == hof,
        s"window=$window: native-only=${(native -- hof).take(3)} hof-only=${(hof -- native).take(3)}")
    }
  }

  test("ArrayGramHashes == xxhash64 over the concat_ws-joined HOF grams") {
    for (n <- Seq(1, 2, 3, 4)) {
      val t = filter(split(col("text"), " "), w => length(w) > 0)
      val hof = when(size(t) < n, array().cast("array<long>"))
        .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
          i => xxhash64(concat_ws("", slice(t, i, lit(n))))))
      val got = df.select(col("id"),
        vectors.arrayGramHashes(t, n).as("g"), hof.as("e")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n id=${r.getLong(0)}: native=${r.getSeq[Long](1).take(5)} hof=${r.getSeq[Long](2).take(5)}")
      }
    }
  }

  test("ModalRunLength == the sorted-run aggregate fold") {
    val hof = expr(
      """aggregate(array_sort(__a),
        |  named_struct('prev', '', 'run', 0L, 'best', 0L),
        |  (a, x) -> named_struct(
        |    'prev', x,
        |    'run',  IF(x = a.prev, a.run + 1L, 1L),
        |    'best', GREATEST(a.best, IF(x = a.prev, a.run + 1L, 1L))),
        |  a -> a.best)""".stripMargin)
    val got = df.select(col("id"), split(col("text"), " ").as("__a"))
      .select(col("id"), vectors.modalRunLength(col("__a")).as("g"), hof.as("e"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"id=${r.getLong(0)}: native=${r.getLong(1)} fold=${r.getLong(2)}")
    }
  }

  test("PrefixCosineSims == CosineSim over prefix slices, bit-exact per checkpoint") {
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, -3.0f, 0.5f, 0.25f, -1.5f, 2.5f, 0.125f),
            Seq(0.5f, -1.0f, 2.0f, 1.5f, -0.75f, 0.25f, -2.0f, 1.0f)),
      (2L, Seq(0.1f, 0.2f, 0.3f, 0.4f, 0.5f, 0.6f, 0.7f, 0.8f),
            Seq(0.8f, 0.7f, 0.6f, 0.5f, 0.4f, 0.3f, 0.2f, 0.1f)),
      (3L, Seq.fill(8)(1.0f), Seq.fill(8)(-1.0f)))
    val vdf = vecs.toDF("id", "a", "b")
    val dims = Seq(2, 5, 8, 100) // 100 > len: full-length semantics
    val got = vdf.select(col("id"),
      vectors.prefixCosineSims(col("a"), col("b"), dims :+ Int.MaxValue).as("p"),
      array((dims.map(d =>
        vectors.cosineSim(slice(col("a"), 1, d), slice(col("b"), 1, d))) :+
        vectors.cosineSim(col("a"), col("b"))): _*).as("e")).collect()
    got.foreach { r =>
      val p = r.getSeq[Double](1); val e = r.getSeq[Double](2)
      assert(p.size == e.size)
      p.zip(e).zipWithIndex.foreach { case ((pv, ev), i) =>
        // bit-exact, not approximate — same partial sums, same division
        assert(java.lang.Double.doubleToLongBits(pv) ==
          java.lang.Double.doubleToLongBits(ev),
          s"id=${r.getLong(0)} slot $i: native=$pv sliced=$ev")
      }
    }
    // zero-norm prefix: the sliced CosineSim is NULL; the fused expression
    // publishes NaN in that slot (documented — NaN fails every score
    // comparison, so such a pair can never enter a top-k, same outcome)
    val z = Seq((1L, Seq(0.0f, 1.0f), Seq(1.0f, 1.0f))).toDF("id", "a", "b")
    val zr = z.select(vectors.prefixCosineSims(col("a"), col("b"), Seq(1, 2)).as("p"))
      .head().getSeq[Double](0)
    assert(zr(0).isNaN, s"zero-norm prefix must be NaN, got ${zr(0)}")
    assert(!zr(1).isNaN)
    // and the whole-array null rule matches CosineSim: length mismatch
    val m = Seq((1L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("id", "a", "b")
    assert(m.select(vectors.prefixCosineSims(col("a"), col("b"), Seq(1)).as("p"))
      .head().isNullAt(0), "length mismatch must be NULL (CosineSim's rule)")
  }
}
