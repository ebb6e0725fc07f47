package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** BM25 retrieval against a same-JVM brute-force reference (exact double
  * equality — the plan and the reference fold in the same order), plus the
  * two-phase-top-k ≡ single-window equivalence the scale path relies on. */
class RetrievalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = SparkEntry.table(spark, dir, "documents")

  /** Plain-Scala BM25 with the identical arithmetic shape. */
  private def refScores(qs: Seq[(String, Seq[String])]): Map[(String, Long), Double] = {
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val n = corpus.length.toDouble
    val total = corpus.map(_._2.length.toLong).sum.toDouble
    val dfm = corpus.flatMap(_._2.distinct).groupBy(identity).map { case (t, xs) => t -> xs.length.toDouble }
    (for {
      (qid, terms) <- qs
      (id, toks) <- corpus
    } yield {
      val dl = toks.length.toDouble
      var acc = 0.0
      for (t <- terms) {
        val tf = toks.count(_ == t).toDouble
        val df = dfm.getOrElse(t, 0.0)
        val idf = (n - df + 0.5) / (df + 0.5)
        acc = acc + idf * ((tf * (Retrieval.K1 + 1.0)) /
          (tf + Retrieval.K1 * ((1.0 - Retrieval.B) + Retrieval.B * dl / (total / n))))
      }
      (qid, id) -> acc
    }).toMap
  }

  test("bm25 top-k matches brute-force reference exactly (2-term gate queries)") {
    val got = Retrieval.bm25(docs, Retrieval.GateQueries, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val ref = refScores(Retrieval.GateQueries)
    assert(got.length == 40)
    got.foreach { case (qid, id, _, score) =>
      assert(score == ref((qid, id)), s"score mismatch for ($qid, $id)")
    }
    // ranks are the reference's total order (score desc, doc_id asc)
    Retrieval.GateQueries.foreach { case (qid, _) =>
      val want = ref.collect { case ((q, id), s) if q == qid => (id, s) }.toSeq
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
      val have = got.filter(_._1 == qid).sortBy(_._3).map(_._2).toSeq
      assert(have == want, s"rank order mismatch for $qid")
    }
  }

  test("multi-term queries fold in query order (3- and 5-term)") {
    val qs = Seq("m1" -> Seq("spark", "join", "vector"),
                 "m2" -> Seq("the", "a", "slow", "fast", "nosuchterm"))
    val got = Retrieval.bm25(docs, qs, k = 5).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(3))).toMap
    val ref = refScores(qs)
    got.foreach { case (key, score) => assert(score == ref(key), s"$key") }
  }

  test("windowed top-k equals the reference total order") {
    val qs = Retrieval.GateQueries
    val got = Retrieval.bm25(docs, qs, k = 10)
      .select("query_id", "doc_id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val ref = refScores(qs)
    val single = qs.flatMap { case (qid, _) =>
      ref.collect { case ((q, id), s) if q == qid => (id, s) }.toSeq
        .sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, _), i) => (qid, id, i + 1) }
    }.toSet
    assert(got == single)
  }

  test("index df/cf match brute force") {
    val got = Retrieval.index(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val corpus = docs.select("text").collect().map(_.getString(0).split(" ").filter(_.nonEmpty))
    val ref = corpus.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val cf = corpus.flatten.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    assert(got.keySet == ref.keySet)
    got.foreach { case (t, (d, c)) => assert(d == ref(t) && c == cf(t), s"term $t") }
  }

  test("rrfFusion equals RRF recomputed from the two rank lists") {
    val qs = Retrieval.GateQueries
    val bm = Retrieval.bm25(docs, qs, 50).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val tf = Retrieval.tfidfRank(docs, qs, 50).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = (bm.keySet ++ tf.keySet).groupBy(_._1).flatMap { case (q, keys) =>
      keys.toSeq
        .map { k =>
          val s = bm.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            tf.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          (k._2, s)
        }
        .sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (q, id) -> ((i + 1, s)) }
    }
    val got = Retrieval.rrfFusion(docs, qs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getInt(2), r.getDouble(3)))).toMap
    assert(got == expected)
    // a document both systems rank must beat one only a single system ranks
    // at the same depth: 1/(60+r)·2 > 1/(60+r) for any r — spot-check that
    // every fused top-1 is present in at least one ranker's list (sanity)
    got.collect { case ((q, id), (1, _)) => (q, id) }.foreach { k =>
      assert(bm.contains(k) || tf.contains(k))
    }
  }
  test("rbo: bit-equal to a JVM recompute from the two rankings; bounded") {
    val docs = SparkEntry.table(spark, dir, "documents")
    def lists(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
      df.select("query_id", "doc_id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val a = lists(Retrieval.bm25(docs, Retrieval.GateQueries, 50))
    val b = lists(Retrieval.tfidfRank(docs, Retrieval.GateQueries, 50))
    val w = Retrieval.rboWeights(10, 0.9)
    val expect = (a.keySet ++ b.keySet).map { q =>
      val aa = a.getOrElse(q, Nil); val bb = b.getOrElse(q, Nil)
      var acc = 0.0
      for (d <- 1 to 10)
        acc = acc + w(d - 1) * (aa.take(d).toSet & bb.take(d).toSet).size
      q -> acc
    }.toMap
    val got = Retrieval.rbo(docs, Retrieval.GateQueries).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect, "engine fold must be bit-identical to the JVM fold")
    // truncated-RBO mass bound: identical lists score exactly sum(w_d * d)
    val bound = (1 to 10).map(d => w(d - 1) * d).sum
    got.values.foreach(v => assert(v >= 0.0 && v <= bound))
  }

  test("phrase search: matches brute-force sliding-window counts; counts overlaps") {
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val want = (for {
      (pid, terms) <- Retrieval.GatePhrases
      (id, toks) <- corpus
      n = toks.sliding(terms.length).count(_ == terms) if n > 0
    } yield (pid, id, n.toLong)).toSet
    val got = Retrieval.phraseSearch(docs, Retrieval.GatePhrases).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty, "gate phrases must actually occur in the corpus")

    // overlap semantics pinned on a constructed doc: "w w w" has TWO "w w"
    import spark.implicits._
    val tiny = Seq((1L, "w w w x w w")).toDF("doc_id", "text")
    val hits = Retrieval.phraseSearch(tiny, Seq("o" -> Seq("w", "w"))).collect()
    assert(hits.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 3L)))
    // single-term phrase degrades to term frequency
    val tf1 = Retrieval.phraseSearch(tiny, Seq("t" -> Seq("w"))).collect()
    assert(tf1.map(r => r.getLong(2)).toSeq == Seq(5L))
  }

  test("bm25Indexed: persisted-index path scores bit-identically to inline bm25") {
    val root = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      Retrieval.saveBm25Index(docs, s"$root/idx")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      val inline = rows(Retrieval.bm25(docs, Retrieval.GateQueries))
      val indexed = rows(Retrieval.bm25Indexed(docs, spark, s"$root/idx",
        Retrieval.GateQueries))
      assert(indexed == inline)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("mergeBm25Index: incremental merge scores bit-identically to a full rebuild") {
    val root = java.nio.file.Files.createTempDirectory("bm25inc").toString
    try {
      Retrieval.saveBm25Index(docs.where(col("doc_id") % 2 === 0), s"$root/idx")
      Retrieval.mergeBm25Index(spark, s"$root/idx", docs.where(col("doc_id") % 2 === 1))
      Retrieval.saveBm25Index(docs, s"$root/full")
      def rows(p: String) = Retrieval.bm25Indexed(docs, spark, p, Retrieval.GateQueries)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      assert(rows(s"$root/idx") == rows(s"$root/full"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("streaming phrase index: batch absorption == full build; replay no-op") {
    val root = java.nio.file.Files.createTempDirectory("phrasestream").toString
    try {
      val even = docs.where(col("doc_id") % 2 === 0)
      val odd = docs.where(col("doc_id") % 2 === 1)
      Retrieval.absorbPhraseIndexBatch(even, s"$root/idx", 0L)
      Retrieval.absorbPhraseIndexBatch(odd, s"$root/idx", 1L)
      val direct = Retrieval.phraseSearch(docs, Retrieval.GatePhrases).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      def indexed() = Retrieval.phraseSearchIndexed(spark, s"$root/idx",
        Retrieval.GatePhrases).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(indexed() == direct)
      // a replayed batch overwrites its own dir — counts must NOT double
      Retrieval.absorbPhraseIndexBatch(odd, s"$root/idx", 1L)
      assert(indexed() == direct)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("phrase index: partition-pruned read answers identically to the scan path") {
    val root = java.nio.file.Files.createTempDirectory("phraseidx").toString
    try {
      Retrieval.buildPhraseIndex(docs, s"$root/idx", nBuckets = 64)
      val direct = Retrieval.phraseSearch(docs, Retrieval.GatePhrases).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val indexed = Retrieval.phraseSearchIndexed(spark, s"$root/idx",
        Retrieval.GatePhrases, nBuckets = 64)
      assert(indexed.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == direct)
      // the scan must prune on the bucket partition column — never read
      // the whole postings index for a handful of terms
      import org.apache.spark.sql.execution.FileSourceScanExec
      val aqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val scans = Retrieval.phraseSearchIndexed(spark, s"$root/idx",
            Retrieval.GatePhrases, nBuckets = 64)
          .queryExecution.executedPlan
          .collect { case f: FileSourceScanExec => f }
        assert(scans.nonEmpty)
        scans.foreach { f =>
          assert(f.partitionFilters.exists(_.references.exists(_.name == "bucket")),
            s"expected a bucket partition filter on:\n$f")
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    } finally {
      val d = new java.io.File(root)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d)
    }
  }

  test("empty query-term sets: rankers return EMPTY results, not an exception (ADVICE r14 #5)") {
    // every query has an empty term list -> the distinct term set is empty;
    // the pre-TermCounts shape returned empty frames and the native base
    // must fall through identically
    val qs = Seq(("q1", Seq.empty[String]), ("q2", Seq.empty[String]))
    val b = Retrieval.bm25(docs, qs, k = 5)
    assert(b.columns.toSeq == Seq("query_id", "doc_id", "rank", "score"))
    assert(b.count() == 0)
    assert(Retrieval.tfidfRank(docs, qs, k = 5).count() == 0)
    assert(Retrieval.rrfFusion(docs, qs).count() == 0)
  }
}
