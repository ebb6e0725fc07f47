package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ProdSession

/** [[Web]]: HTML stripping edge cases (entity decode ordering, script/style
  * content, literal markup in text), NFC normalization against the JDK
  * reference, domain-scoped line-level boilerplate removal (JVM
  * differential + order preservation + all-boilerplate row parity), and
  * the URL canonicalization case table. */
class WebSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark

  test("htmlStrip: tags, blocks, entities, whitespace") {
    import spark.implicits._
    val cases = Seq(
      // entity decode happens AFTER tag strip: literal &lt;b&gt; text must
      // surface as <b> without being stripped as markup
      ("<p>a &lt;b&gt; c</p>", "a <b> c"),
      // &amp;lt; decodes to the TEXT "&lt;" (amp is decoded last, one pass)
      ("x &amp;lt; y", "x &lt; y"),
      // script/style CONTENT goes away entirely, including < and tags
      ("<script>if (a<b) { document.write('<i>hi</i>'); }</script>after",
        "after"),
      ("<style type=\"text/css\">p > em { color: red }</style>text", "text"),
      ("<div   class='x'\n data-y=\"1\">body</div>", "body"),
      ("a\n\n  b\tc", "a b c"),
      ("&quot;q&quot; &#39;s&#39; n&nbsp;b", "\"q\" 's' n b"),
      ("no markup at all", "no markup at all"))
    val got = cases.map(_._1).toDF("h")
      .select(Web.htmlStrip(col("h")).as("c")).as[String].collect()
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"case $i: got '$g'")
    }
  }

  test("nfcNormalize: JDK reference equality, identity on normalized input") {
    import spark.implicits._
    val inputs = Seq(
      "cafe\u0301",                     // decomposed acute
      "u\u0308ber stra\u00dfe",        // combining diaeresis
      "already composed \u00e9\u00fc", // composed: identity
      "plain ascii",
      "d\u0323\u0307 marks",           // dot-below+dot-above: composes
      "d\u0307\u0323 marks",           // same marks, other order: reorders
      "")
    val got = inputs.toDF("s")
      .select(Web.nfcNormalize(col("s")).as("n")).as[String].collect()
    got.zip(inputs).foreach { case (g, in) =>
      val want = java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC)
      assert(g == want, s"input '${in.codePoints().toArray.mkString(",")}'")
    }
    // guard against a vacuous fixture: normalization must CHANGE something
    assert(got.zip(inputs).exists { case (g, in) => g != in })
    // nulls pass through as nulls (UnaryExpression null convention)
    val n = Seq[Option[String]](None).toDF("s")
      .select(Web.nfcNormalize(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("boilerplateLines: JVM differential, domain scoping, order, parity") {
    import spark.implicits._
    // domain A: 3 docs sharing HDR and FTR (boilerplate at minDocs=3);
    // "shared2" appears in only 2 docs (kept); domain B carries the SAME
    // HDR line but only twice there (kept — scoping is per-domain);
    // doc 4 is chrome-only and must survive as an empty row
    val rows = Seq(
      (0L, "A", Seq("HDR", "alpha", "shared2", "FTR")),
      (1L, "A", Seq("HDR", "beta", "shared2", "FTR")),
      (2L, "A", Seq("HDR", "gamma", "delta", "FTR")),
      (3L, "B", Seq("HDR", "epsilon")),
      (4L, "A", Seq("HDR", "FTR", "HDR")),
      (5L, "B", Seq("HDR", "zeta")))
    val df = rows.toDF("doc_id", "dom", "lines")
    val got = Web.boilerplateLines(df, col("doc_id"), col("dom"),
        col("lines"), minDocs = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // JVM reference: line removed iff ≥3 distinct docs of the same domain
    val heavy = rows.flatMap { case (id, d, ls) => ls.distinct.map(l => (d, l) -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      .filter(_._2 >= 3).keySet.toSet
    rows.foreach { case (id, d, ls) =>
      val kept = ls.filterNot(l => heavy((d, l)))
      val (nl, nk, nr, txt) = got(id)
      assert(nl == ls.size && nk == kept.size && nr == ls.size - kept.size,
        s"counts of doc $id")
      assert(txt == kept.mkString("\n"), s"text of doc $id")
    }
    assert(got(3)._4 == "HDR\nepsilon", "domain scoping: B keeps HDR")
    assert(got(4) == ((3L, 0L, 3L, "")), "all-boilerplate doc keeps its row")
    assert(got(0)._4 == "alpha\nshared2", "original order preserved")
  }

  test("urlCanonicalize: case table") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowered, www and default port stripped, params sorted,
      // tracking dropped, fragment dropped, trailing slash dropped
      ("HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&b=2&a=1#f",
        "https://ex.com/A/b?a=1&b=2"),
      ("http://ex.com:80/p", "http://ex.com/p"),
      ("http://ex.com:8080/p", "http://ex.com:8080/p"),  // non-default kept
      ("https://ex.com/", "https://ex.com"),
      ("https://ex.com/p?utm_campaign=c&ref=rss&fbclid=1&gclid=2",
        "https://ex.com/p"),                              // all-tracking query
      ("https://ex.com/p?z=1&y=2&z=0", "https://ex.com/p?y=2&z=0&z=1"),
      ("ftp://Files.Ex.com:21/d/", "ftp://files.ex.com:21/d"), // unknown scheme: port kept
      ("https://ex.com/reftest?refresh=1", "https://ex.com/reftest?refresh=1"))
    val got = cases.map(_._1).toDF("u")
      .select(Web.urlCanonicalize(col("u")).as("c")).as[String].collect()
    got.zip(cases).foreach { case (g, (in, w)) => assert(g == w, s"url $in") }
  }

  test("dedupByUrl: canonical grouping with min-id representative") {
    import spark.implicits._
    val df = Seq(
      (10L, "https://ex.com/p?utm_source=a"),
      (7L, "HTTPS://WWW.ex.com/p"),
      (3L, "https://ex.com:443/p/"),
      (5L, "https://ex.com/q")).toDF("doc_id", "url")
    val got = Web.dedupByUrl(df, col("doc_id"), col("url"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "https://ex.com/p" -> ((3L, 3L)),
      "https://ex.com/q" -> ((5L, 1L))))
  }

  test("mojibakeStats: each artifact class counted separately; clean text clean") {
    import spark.implicits._
    val acc = "cafÃ©"                     // mis-decoded e-acute
    val pq = "donâ€™t"               // mangled right quote
    val nb = "aÂ b"                            // double-encoded NBSP
    val rp = "x � y"                           // replacement char
    val df = Seq(
      (1L, s"$acc $acc plain"), (2L, pq), (3L, nb), (4L, rp),
      (5L, "perfectly clean ascii text"),
      (6L, s"$acc $pq $nb $rp")).toDF("doc_id", "text")
    val got = Web.mojibakeStats(df, col("text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got(1L) == ((2L, 0L, 0L, 0L, false)))
    assert(got(2L) == ((0L, 1L, 0L, 0L, false)))
    assert(got(3L) == ((0L, 0L, 1L, 0L, false)))
    assert(got(4L) == ((0L, 0L, 0L, 1L, false)))
    assert(got(5L) == ((0L, 0L, 0L, 0L, true)))
    assert(got(6L) == ((1L, 1L, 1L, 1L, false)))
  }
}
