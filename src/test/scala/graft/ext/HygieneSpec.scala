package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Semantic invariants of the corpus-hygiene operators beyond the DuckDB
  * oracle rows: constructed-input behavior (the oracle only sees the
  * synthetic corpus' distribution), redaction completeness, and sampling
  * determinism against an independent JVM-side reimplementation. */
class HygieneSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = SparkEntry.table(spark, dir, "documents")

  test("repetitionStats: degenerate repetition is rejected, varied text kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val rows = Hygiene.repetitionStats(df).orderBy("doc_id").collect()
    val spam = rows(0)
    assert(spam.getDouble(1) == 1.0 - 1.0 / 8) // 1 distinct word of 8
    assert(spam.getDouble(2) == 1.0)           // the modal 2-gram is ALL 2-grams
    assert(spam.getDouble(3) == 1.0 - 1.0 / 6) // 1 distinct 3-gram of 6
    assert(!spam.getBoolean(4), "fully-repetitive doc must be dropped")
    val varied = rows(1)
    assert(varied.getDouble(1) == 0.0 && varied.getDouble(3) == 0.0)
    assert(varied.getDouble(2) == 1.0 / 7) // all 2-grams distinct
    assert(varied.getBoolean(4), "fully-varied doc must be kept")
  }

  test("repetitionStats/Gate: short documents define absent n-gram fractions as 0") {
    // 1- and 2-word docs have no 3-grams (and 1-word no 2-grams): the
    // fractions are 0.0 by definition, NOT a DIVIDE_BY_ZERO abort under
    // Spark 4's default ANSI mode (web crawls are full of such docs)
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, "hello world"), (3L, "a b a b"),
        (4L, null: String)) // ADVICE r14 #1: NULL text → 0.0 fracs, not NULL
      .toDF("doc_id", "text")
    val rows = Hygiene.repetitionStats(df).orderBy("doc_id").collect()
    assert(rows(0).getDouble(2) == 0.0 && rows(0).getDouble(3) == 0.0)
    assert(rows(0).getBoolean(4), "a single unique word has no repetition evidence")
    assert(rows(1).getDouble(3) == 0.0 && rows(1).getBoolean(4))
    assert(rows(2).getDouble(1) == 0.5, "a b a b: 2 distinct of 4")
    assert(!rows(3).isNullAt(2) && rows(3).getDouble(2) == 0.0 &&
      rows(3).getDouble(3) == 0.0,
      "NULL text must keep the empty-gram 0.0 fractions (ngramsOf coalesce)")
    // the pass-through gate agrees on the same input
    val gate = Hygiene.repetitionGate(df).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val stats = Hygiene.repetitionStats(df).where(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(gate.sameElements(stats))
  }

  test("repetitionStats: fractions bounded on the real corpus") {
    val agg = Hygiene.repetitionStats(docs)
      .agg(min("dup_word_frac"), max("dup_word_frac"),
        min("top_2gram_frac"), max("top_2gram_frac"),
        min("dup_3gram_frac"), max("dup_3gram_frac")).head()
    for (i <- 0 until 6)
      assert(agg.getDouble(i) >= 0.0 && agg.getDouble(i) <= 1.0, s"field $i out of [0,1]")
    // the modal 2-gram occurs at least once → frac strictly positive
    assert(agg.getDouble(2) > 0.0)
  }

  test("redactPii: every injected pattern is counted once and fully masked") {
    val out = Hygiene.redactPii(docs, Hygiene.piiAugmented).cache()
    try {
      assert(out.where(col("n_emails") =!= 1 || col("n_phones") =!= 1 ||
        col("n_ips") =!= 1).count() == 0, "each doc carries exactly one of each")
      val leaked = out.where(
        col("redacted").rlike(Hygiene.EmailPattern) ||
          col("redacted").rlike(Hygiene.PhonePattern) ||
          col("redacted").rlike(Hygiene.Ipv4Pattern))
      assert(leaked.count() == 0, "redacted text must contain no residual PII")
      assert(out.where(!col("redacted").contains("<EMAIL>") ||
        !col("redacted").contains("<PHONE>") ||
        !col("redacted").contains("<IP>")).count() == 0)
    } finally out.unpersist()
  }

  test("contamination: hits only on non-benchmark docs, against real overlap") {
    val bench = docs.where(col("doc_id") % 50 === 0)
    val corp = docs.where(col("doc_id") % 50 =!= 0)
    val hits = Hygiene.contamination(corp, bench, k = 3).collect()
    assert(hits.forall(_.getLong(1) >= 1))
    assert(hits.forall(_.getLong(0) % 50 != 0), "benchmark docs never self-report")
    // the hashed-key scale path must agree exactly on this corpus (8-byte
    // broadcast keys; collisions are ~2^-64 per gram pair)
    val hashed = Hygiene.contamination(corp, bench, k = 3, hashKeys = true).collect()
    assert(hashed.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      hits.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // brute-force check one flagged doc's overlap count
    if (hits.nonEmpty) {
      val id = hits.head.getLong(0)
      val grams = (t: String) => t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val dg = grams(corp.where(col("doc_id") === id).head().getAs[String]("text"))
      val bg = bench.select("text").collect().map(r => grams(r.getString(0)))
        .foldLeft(Set.empty[String])(_ ++ _)
      assert(hits.head.getLong(1) == dg.intersect(bg).size.toLong)
    }
  }

  test("packSequences: contiguous per-shard layout, chunk math consistent") {
    val out = Hygiene.packSequences(docs, ctxLen = 256).collect()
    val byShard = out.groupBy(_.getAs[String]("source"))
    for ((_, rows) <- byShard) {
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      // offsets are the exact running sum — no gaps, no overlap
      var expect = 0L
      for (r <- ordered) {
        assert(r.getAs[Long]("start_offset") == expect,
          s"doc ${r.getAs[Long]("doc_id")} not contiguous")
        expect += r.getAs[Long]("n_tokens")
      }
      for (r <- ordered) {
        assert(r.getAs[Long]("chunk_id") == r.getAs[Long]("start_offset") / 256)
        assert(r.getAs[Long]("offset_in_chunk") == r.getAs[Long]("start_offset") % 256)
      }
    }
    // every document is placed exactly once
    assert(out.length == docs.count())
  }

  test("narrow hygiene ops run unchanged on a STREAMING DataFrame") {
    // repetition / PII / sampling are pure projections+filters, so the same
    // code must work in a Structured Streaming micro-batch pipeline (the
    // continuous-ingest curation shape); packSequences (window) and
    // contamination (agg) are the documented batch-only exceptions
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // doc_id < 50, not limit(50): an unordered limit has no defined row set,
    // so the three independent plans below could pick different rows
    val rows = docs.select("doc_id", "text", "lang").where(col("doc_id") < 50)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[(Long, String, String)]
    in.addData(rows.toSeq)
    val streamed = in.toDF().toDF("doc_id", "text", "lang")
    val narrow = Hygiene.redactPii(
      Hygiene.stratifiedSample(streamed, col("lang"), Map("en" -> 1.0)),
      col("text"))
    assert(narrow.isStreaming, "plan must still be a streaming plan")
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val q = narrow.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= batch.select("doc_id").collect().map(_.getLong(0)); ()
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // identical rows to the batch run of the same ops on the same input
    val batchIds = Hygiene.redactPii(
      Hygiene.stratifiedSample(
        docs.select("doc_id", "text", "lang").where(col("doc_id") < 50), col("lang"), Map("en" -> 1.0)),
      col("text")).select("doc_id").collect().map(_.getLong(0))
    assert(got.sorted.toSeq == batchIds.sorted.toSeq)
    assert(got.nonEmpty)

    // the repetition gate is narrow too — run it as its own streaming query
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val q2 = Hygiene.repetitionStats(streamed).where(col("keep"))
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          kept ++= batch.select("doc_id").collect().map(_.getLong(0)); ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val batchKept = Hygiene.repetitionStats(docs.select("doc_id", "text").where(col("doc_id") < 50))
      .where(col("keep")).select("doc_id").collect().map(_.getLong(0))
    assert(kept.sorted.toSeq == batchKept.sorted.toSeq && kept.nonEmpty)
  }

  test("curateFull: every stage only removes documents; packing covers the survivors") {
    val corpus = docs.where(col("doc_id") % 50 =!= 0)
    val bench = docs.where(col("doc_id") % 50 === 0)
    val out = Curation.curateFull(corpus, bench).cache()
    try {
      val outIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(outIds.nonEmpty, "pipeline must not empty the corpus")
      assert(outIds.size < corpus.count(), "pipeline must filter something")
      // no benchmark doc survives into the training manifest
      assert(outIds.forall(_ % 50 != 0))
      // survivors of the full pipeline are a subset of each individual gate
      val repIds = Hygiene.repetitionGate(corpus).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val contamIds = Hygiene.contamination(corpus, bench, 4).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(outIds.subsetOf(repIds))
      assert(outIds.intersect(contamIds).isEmpty)
      // the packing layout is contiguous per shard over exactly the survivors
      for ((_, rows) <- out.collect().groupBy(_.getAs[String]("source"))) {
        var expect = 0L
        for (r <- rows.sortBy(_.getAs[Long]("doc_id"))) {
          assert(r.getAs[Long]("start_offset") == expect)
          expect += r.getAs[Long]("n_tokens")
        }
      }
    } finally out.unpersist()
  }

  test("chunkDocuments: stride-overlap windows cover every token losslessly") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val got = Hygiene.chunkDocuments(docs, ctxLen = 32, stride = 24).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    assert(got.map(_._1).toSet == texts.keySet)
    for ((id, idx, start, n, text) <- got) {
      val w = texts(id)
      assert(start == idx * 24)
      assert(n == math.min(32, w.length - start) && n >= 1)
      assert(text == w.slice(start, start + 32).mkString(" "))
    }
    // every consecutive chunk pair overlaps by ctxLen - stride = 8 tokens
    // (except short tails), and chunk 0 always starts at token 0
    val byDoc = got.groupBy(_._1)
    assert(byDoc.values.forall(_.exists(_._2 == 0)))
    // lossless: concatenating each chunk's NON-overlapped prefix (stride
    // tokens) plus the last chunk's full text reconstructs the document
    for ((id, cs) <- byDoc) {
      val ordered = cs.sortBy(_._2)
      val rebuilt = (ordered.init.map(_._5.split(" ").take(24)) :+
        ordered.last._5.split(" ")).flatten
      assert(rebuilt.sameElements(texts(id)), s"doc $id not covered")
    }
  }

  test("shuffleOrder: deterministic sharded permutation, salt changes the epoch") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val a = Hygiene.shuffleOrder(docs, nShards = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // a true permutation: every doc exactly once, positions contiguous per shard
    assert(a.map(_._1).distinct.length == docs.count())
    for ((shard, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $shard positions not contiguous")
    // deterministic across runs
    val b = Hygiene.shuffleOrder(docs, nShards = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // a different salt is a different epoch permutation
    val c = Hygiene.shuffleOrder(docs, nShards = 16, salt = "epoch1").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq != c.sortBy(_._1).toSeq)
  }

  test("lmScore: differential vs a plain-Scala unigram model; OOV semantics") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val ref = docs.where(col("doc_id") % 50 === 0)
    val crawl = docs.where(col("doc_id") % 50 =!= 0)
    val got = TextAnalysis.lmScore(crawl, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // independent plain-Scala model (same add-half smoothing, exact ints)
    val refTexts = ref.select("text").collect().map(_.getString(0))
    val lex = refTexts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val d2 = 2L * lex.values.sum + lex.size + 1
    val crawlRows = crawl.select("doc_id", "text").collect()
    assert(got.size == crawlRows.length)
    for (r <- crawlRows) {
      val ws = r.getString(1).split(" ").filter(_.nonEmpty)
      val cnts = ws.map(w => lex.getOrElse(w, 0L))
      val exp = (ws.length.toLong, cnts.count(_ == 0L).toLong,
        cnts.map(2L * _ + 1).sum.toDouble / (d2 * ws.length).toDouble,
        (2L * cnts.min + 1).toDouble / d2.toDouble)
      assert(got(r.getLong(0)) == exp, s"doc ${r.getLong(0)}")
    }
    // semantics: a doc of reference-frequent words must outscore a doc of
    // words the reference never saw, and OOV counting must see them all
    import spark.implicits._
    val probe = Seq((1L, "the a data value"), (2L, "zz yy xx wwq")).toDF("doc_id", "text")
    val scored = TextAnalysis.lmScore(probe, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(scored(2L)._1 == 4L && scored(1L)._1 < 4L)
    assert(scored(1L)._2 > scored(2L)._2)
  }

  test("c4Clean: the paper's default rules on constructed pages") {
    import spark.implicits._
    val pages = Seq(
      // survives: 3 lines, each >=5 words with terminal punctuation
      (1L, "This is a clean first sentence.\nHere is another full sentence!\nAnd a third proper sentence?"),
      // line rules: no terminal punct / too short / blocklisted term drop
      // individual lines, leaving <3 → page dropped
      (2L, "this line has no terminal punctuation\nToo short.\nEnable javascript to view this page.\nOne good sentence stays right here."),
      // page blocklist: lorem ipsum kills the page outright
      (3L, "Lorem ipsum dolor sit amet sentence one.\nA perfectly fine second sentence.\nA perfectly fine third sentence."),
      // page blocklist: a code brace kills the page outright
      (4L, "A fine sentence before the code.\nfunction f() { return 1; }\nA fine sentence after the code.\nAnother fine sentence right here."),
      // quoted terminal punctuation counts
      (5L, "He said the words \"it works fine.\"\nShe replied that it really does work!\nSo the story ends happily here."))
      .toDF("doc_id", "text")
    val got = Hygiene.c4Clean(pages).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == Set(1L, 5L))
    assert(got(1L) == ((3L, 3L,
      "This is a clean first sentence.\nHere is another full sentence!\nAnd a third proper sentence?")))
    assert(got(5L)._2 == 3L)
    // minLines relaxed: page 2 keeps exactly its one surviving line
    val relaxed = Hygiene.c4Clean(pages, minLines = 1).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(relaxed(2L) == "One good sentence stays right here.")
  }

  test("c4Clean gate shape: injected lines reassemble the original text") {
    // withInjectedLines must be a pure re-chunking: replacing the newlines
    // back with spaces recovers the original document exactly
    val docs = SparkEntry.table(spark, dir, "documents")
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val injected = Hygiene.withInjectedLines(docs, groupLen = 8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(injected.size == orig.size)
    for ((id, t) <- injected) assert(t.replace('\n', ' ') == orig(id), s"doc $id")
  }

  test("lmScoreBigram: differential vs a plain-Scala bigram model; word order bites") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val ref = docs.where(col("doc_id") % 50 === 0)
    val crawl = docs.where(col("doc_id") % 50 =!= 0)
    val got = TextAnalysis.lmScoreBigram(crawl, ref).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    // independent plain-Scala model: joint add-half bigrams + conditional
    val refToks = ref.select("text").collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty))
    val lex1 = refToks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val lex2 = refToks.flatMap(ws => ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val d2 = 2L * lex2.values.sum + lex2.size + 1
    val v1p1 = lex1.size.toLong + 1
    val crawlRows = crawl.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    assert(got.size == crawlRows.count(_._2.length >= 2))
    for ((id, ws) <- crawlRows if ws.length >= 2) {
      val bgs = ws.sliding(2).filter(_.length == 2).toArray
      val c2 = bgs.map(b => lex2.getOrElse(b.mkString(" "), 0L))
      val conds = bgs.map { b =>
        (2L * lex2.getOrElse(b.mkString(" "), 0L) + 1).toDouble /
          (2L * lex1.getOrElse(b(0), 0L) + v1p1).toDouble
      }
      val exp = (bgs.length.toLong, c2.count(_ == 0L).toLong,
        c2.map(2L * _ + 1).sum.toDouble / (d2 * bgs.length).toDouble,
        (2L * c2.min + 1).toDouble / d2.toDouble,
        conds.min, conds.count(_ < 1e-6).toLong)
      assert(got(id) == exp, s"doc $id")
    }
    // semantics: reversing a reference document's word order leaves the
    // unigram score untouched but must crater the bigram score — the
    // fluency signal this operator exists to add
    import spark.implicits._
    val sample = ref.select("text").head().getString(0)
    val probe = Seq((1L, sample), (2L, sample.split(" ").reverse.mkString(" ")))
      .toDF("doc_id", "text")
    val uni = TextAnalysis.lmScore(probe, ref).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(uni(1L) == uni(2L), "unigram model must be order-blind")
    val bi = TextAnalysis.lmScoreBigram(probe, ref).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getLong(2)))).toMap
    assert(bi(1L)._1 > bi(2L)._1, "bigram mean must drop under reversal")
    assert(bi(1L)._2 < bi(2L)._2, "reversal must surface unseen bigrams")
  }

  test("fusedGate == repetitionGate then qualityGate (shared tokenization)") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val fused = Curation.fusedGate(docs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val sequential = TextAnalysis.qualityGate(Hygiene.repetitionGate(docs), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(fused == sequential)
    assert(fused.nonEmpty && fused.size < docs.count(),
      "the gate must both keep and drop documents for the equivalence to bite")
  }

  test("repetitionGate matches repetitionStats' keep column") {
    val byStats = Hygiene.repetitionStats(docs).where(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val byGate = Hygiene.repetitionGate(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(byGate.sameElements(byStats))
  }

  test("qualityGate matches stats' quality threshold") {
    val byStats = TextAnalysis.stats(docs).where(col("quality") >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val byGate = TextAnalysis.qualityGate(docs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(byGate.sameElements(byStats) && byGate.nonEmpty)
  }

  test("repetitionStats: seeded randomized differential vs a plain-Scala model") {
    import spark.implicits._
    val rnd = new scala.util.Random(
      sys.env.getOrElse("GRAFT_FUZZ_SEED", "4242").toLong)
    val vocabAll = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val fuzz = (0 until 300).map { i =>
      val vocab = vocabAll.take(1 + rnd.nextInt(vocabAll.size)) // vary collision rates
      val n = 3 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = Hygiene.repetitionStats(fuzz.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    for (((id, text), row) <- fuzz.zip(got)) {
      val w = text.split(" ").toSeq
      def grams(k: Int) = w.sliding(k).map(_.mkString(" ")).toSeq
      val bi = if (w.size >= 2) grams(2) else Seq.empty
      val tri = if (w.size >= 3) grams(3) else Seq.empty
      assert(row.getLong(0) == id)
      assert(row.getDouble(1) == 1.0 - w.distinct.size.toDouble / w.size, s"doc $id dup_word")
      val modal = if (bi.isEmpty) null
        else bi.groupBy(identity).values.map(_.size).max
      if (bi.nonEmpty)
        assert(row.getDouble(2) ==
          modal.asInstanceOf[Int].toDouble / bi.size, s"doc $id top2 of '$text'")
      if (tri.nonEmpty)
        assert(row.getDouble(3) == 1.0 - tri.distinct.size.toDouble / tri.size,
          s"doc $id dup3")
    }
  }

  test("stratifiedSample: deterministic, rate-faithful, drops unknown strata") {
    val rates = Map("en" -> 0.5, "zh" -> 0.0)
    val s1 = Hygiene.stratifiedSample(docs, col("lang"), rates)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val s2 = Hygiene.stratifiedSample(docs, col("lang"), rates)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "hash sampling must be run-to-run deterministic")
    // independent JVM-side recomputation of the keep set
    def u(id: Long): Double = TestHash.u(id)
    val expected = docs.select("doc_id", "lang").collect()
      .filter(r => rates.getOrElse(r.getString(1), 0.0) > u(r.getLong(0)))
      .map(_.getLong(0)).sorted
    assert(s1.sameElements(expected))
    assert(expected.nonEmpty, "en at 50% must keep something")
  }

  test("temperatureMix: n^alpha rates, flattening toward small strata, cap at 1") {
    // independent rate recomputation from the measured histogram
    val counts = docs.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts.size >= 2, "corpus must have several sources")
    val alpha = 0.5; val target = 0.5
    val total = counts.values.sum.toDouble
    val powSum = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val rates = counts.map { case (s, n) =>
      s -> math.min(1.0, target * total * math.pow(n.toDouble, alpha) / powSum / n)
    }
    // alpha < 1 flattens: smaller strata get HIGHER keep rates
    val bySize = counts.toSeq.sortBy(_._2).map { case (s, _) => rates(s) }
    assert(bySize.reverse.sameElements(bySize.sorted),
      s"keep rate must be non-increasing in stratum size: $rates for $counts")
    // the operator's survivors == stratifiedSample with those closed-form rates
    val got = Hygiene.temperatureMix(docs, col("source"), alpha, target)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val expect = Hygiene.stratifiedSample(docs, col("source"), rates)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expect))
    assert(got.nonEmpty)
    // realized volume lands near the target fraction (hash noise aside)
    val frac = got.length / total
    assert(frac > target - 0.15 && frac < target + 0.15,
      s"realized fraction $frac far from target $target")
    // alpha = 1 is proportional sampling: every rate equals targetFrac
    // (budget_s/n_s = target·N·n_s/N/n_s) — survivors == flat targetFrac
    val flat = Hygiene.temperatureMix(docs, col("source"), alpha = 1.0, targetFrac = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val flatExpect = Hygiene.stratifiedSample(docs, col("source"),
        counts.map { case (s, _) => s -> 0.3 })
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(flat.sameElements(flatExpect))
  }

  test("perplexityPartition: thirds by reference-likelihood, ordered buckets") {
    val ref = docs.where(col("doc_id") % 10 === 0)
    val crawl = docs.where(col("doc_id") % 10 =!= 0)
    val out = TextAnalysis.perplexityPartition(crawl, ref)
      .select("doc_id", "mean_prob", "bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val n = out.length.toDouble
    val byB = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byB.keySet == Set("head", "middle", "tail"))
    // fraction sanity (percentile cut: within one tie-run of a third)
    assert(byB("head").length / n > 0.2 && byB("head").length / n < 0.5)
    assert(byB("tail").length / n > 0.2 && byB("tail").length / n < 0.5)
    // total order: every head score ≥ every middle score ≥ every tail score
    assert(byB("head").min >= byB("middle").max)
    assert(byB("middle").min >= byB("tail").max)
    // caller-supplied cutoffs (the 100 TB approx path) take precedence
    val all = out.map(_._2).sorted
    val (cH, cT) = (all(all.length * 2 / 3), all(all.length / 3))
    val fixed = TextAnalysis.perplexityPartition(crawl, ref, cutoffs = Some((cH, cT)))
      .select("mean_prob", "bucket").collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    assert(fixed.forall { case (s, b) =>
      b == (if (s >= cH) "head" else if (s < cT) "tail" else "middle") })
  }

  test("lengthHistogram: exact power-of-two buckets, totals preserved") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "s"),                       // 1 token  → bucket 0 [1,1]
      (2L, "a b", "s"),                     // 2 tokens → bucket 1 [2,3]
      (3L, "a b c", "s"),                   // 3 tokens → bucket 1
      (4L, "a b c d e f g h", "s"),         // 8 tokens → bucket 3 [8,15]
      (5L, "a b c d e f g", "t"))           // 7 tokens → bucket 2 [4,7]
      .toDF("doc_id", "text", "source")
    val rows = TextAnalysis.lengthHistogram(df)
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows(("s", 0)) == ((1L, 1L, 1L, 1L)))
    assert(rows(("s", 1)) == ((2L, 3L, 2L, 5L)))
    assert(rows(("s", 3)) == ((8L, 15L, 1L, 8L)), "an exact power of two lands in ITS bucket")
    assert(rows(("t", 2)) == ((4L, 7L, 1L, 7L)))
    // real corpus: histogram totals reconcile with the corpus
    val h = TextAnalysis.lengthHistogram(docs)
      .agg(sum("n_docs"), sum("n_tokens")).head()
    assert(h.getLong(0) == docs.count())
    val tok = docs.select(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(h.getLong(1) == tok)
  }

  test("ngramNovelty: constructed duplicates, short docs, hashKeys agreement") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"),   // shares its full text with doc 2
      (2L, "a b c d e f g h i j"),
      (3L, "q r s t u v w x y z"),   // fully unique
      (4L, "tiny")                   // shorter than k: zero grams
    ).toDF("doc_id", "text")
    val rows = Hygiene.ngramNovelty(df, k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 10 words, k=8 → 3 distinct grams per doc
    assert(rows(1L) == ((3L, 0L, 0.0)), s"duplicated doc must have zero novelty: ${rows(1L)}")
    assert(rows(2L) == ((3L, 0L, 0.0)))
    assert(rows(3L) == ((3L, 3L, 1.0)), s"unique doc must be fully novel: ${rows(3L)}")
    assert(rows(4L) == ((0L, 0L, 0.0)), "sub-k doc: defined as zero, not dropped")
    val hashed = Hygiene.ngramNovelty(df, k = 8, hashKeys = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(hashed == rows, "hashKeys path must agree where no collisions exist")
  }

  test("decontaminateSpans: JVM brute-force differential + invariants") {
    // independent reimplementation: mark covered token positions directly
    val corpus = docs.where(col("doc_id") % 50 =!= 0)
    val bench = docs.where(col("doc_id") % 50 === 0)
    val k = 4
    val benchGrams: Set[String] = bench.select("text").collect().flatMap { r =>
      val w = r.getString(0).split(" ", -1)
      if (w.length >= k) w.sliding(k).map(_.mkString(" ")) else Iterator.empty
    }.toSet
    val expected = corpus.select("doc_id", "text").collect().map { r =>
      val id = r.getLong(0); val w = r.getString(1).split(" ", -1)
      val covered = Array.fill(w.length)(false)
      for (s <- 0 to w.length - k if benchGrams(w.slice(s, s + k).mkString(" ")))
        for (j <- s until s + k) covered(j) = true
      val kept = w.indices.filterNot(j => covered(j)).map(j => w(j))
      (id, (kept.mkString(" "), (w.length - kept.size).toLong))
    }.toMap
    val got = Hygiene.decontaminateSpans(corpus, bench, k)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet, "every corpus doc must be emitted exactly once")
    got.foreach { case (id, (text, n)) =>
      assert((text, n) == expected(id),
        s"doc $id: got (${text.take(80)}, $n) expected ${expected(id)._1.take(80)}, ${expected(id)._2}")
    }
    assert(got.values.exists(_._2 > 0L), "gate corpus should contain contaminated spans")
    assert(got.values.exists(_._2 == 0L), "untouched docs must pass through")
    // hashKeys variant agrees on this corpus (no 64-bit collisions here)
    val hashed = Hygiene.decontaminateSpans(corpus, bench, k, hashKeys = true)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(hashed == got, "hashKeys path must agree where no collisions exist")
    // the broadcast-join regime (for benchmarks too large to ship as an
    // InSet) must be output-identical to the set path, hashed or not
    val joined = Hygiene.decontaminateSpans(corpus, bench, k, viaSet = false)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(joined == got, "join path must equal the set path")
    val joinedHashed = Hygiene.decontaminateSpans(corpus, bench, k,
      hashKeys = true, viaSet = false)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(joinedHashed == got, "hashed join path must equal the set path")
    // an EMPTY benchmark must pass every document through untouched (and
    // not build InSet over an empty set, which Spark assumes non-empty)
    val empty = Hygiene.decontaminateSpans(corpus, bench.limit(0), k)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(empty.values.forall(_._2 == 0L), "empty benchmark removes nothing")
    assert(empty.keySet == got.keySet)
    // a benchmark over `setSizeLimit` silently falls back to the join path
    // with identical output — the driver-collect guard
    val capped = Hygiene.decontaminateSpans(corpus, bench, k, setSizeLimit = 3L)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(capped == got, "overflowing the set cap must not change output")
  }

  test("selfDedupSpans: JVM brute force; constructed repeat/no-repeat cases") {
    import spark.implicits._
    val k = 3
    val fix = Seq(
      (1L, "a b c d a b c e"),      // "a b c" repeats at pos 4
      (2L, "x y z w"),              // no repeats
      (3L, "p q"),                  // shorter than k
      (4L, "m m m m m m"))          // degenerate: every later gram repeats
      .toDF("doc_id", "text")
    val got = Hygiene.selfDedupSpans(fix, k).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val want = fix.collect().map { r =>
      val id = r.getLong(0); val w = r.getString(1).split(" ", -1)
      val grams = if (w.length >= k) w.sliding(k).map(_.mkString(" ")).toArray
                  else Array.empty[String]
      val covered = Array.fill(w.length)(false)
      for (s <- grams.indices if grams.indexOf(grams(s)) < s;
           j <- s until s + k) covered(j) = true
      val kept = w.indices.filterNot(covered).map(w)
      (id, (kept.mkString(" "), (w.length - kept.size).toLong))
    }.toMap
    assert(got == want)
    assert(got(1L) == (("a b c e", 4L)) || got(1L)._2 > 0,
      s"repeat span must be removed: ${got(1L)}")
    assert(got(2L) == (("x y z w", 0L)) && got(3L) == (("p q", 0L)))
    // and the real corpus: untouched docs pass through verbatim
    val docs = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val real = Hygiene.selfDedupSpans(docs, k).collect()
    assert(real.length == docs.count())
    assert(real.exists(_.getLong(2) == 0L))
  }

  test("corpusOverlap: constructed shared/unshared grams; hashKeys agrees") {
    import spark.implicits._
    val a = Seq((1L, "one two three four five"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val b = Seq((10L, "one two three four six"), (11L, "p q r s"))
      .toDF("doc_id", "text")
    // b's distinct 4-grams: "one two three four", "two three four six",
    // "p q r s" → 3 total, 1 shared with a
    val row = Hygiene.corpusOverlap(a, b, k = 4).head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 1L)
    assert(row.getDouble(2) == 1.0 / 3)
    val hashed = Hygiene.corpusOverlap(a, b, k = 4, hashKeys = true).head()
    assert(hashed.getLong(0) == 3L && hashed.getLong(1) == 1L)
    // reporting consistency with the removal operator: a corpus fully
    // decontaminated against `other` has zero remaining overlap hits
    val contam = Hygiene.contamination(docs, docs, k = 4)
    assert(contam.count() > 0, "self-contamination must flag everything overlapping")
  }

  test("epochMix: absolute token budgets — full epochs, fractional hash slice, both directions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d", "big"), (2L, "e f g h", "big"), (3L, "i j k l", "big"),
      (4L, "m n o p", "small"), (5L, "q r s t", "small"),
      (6L, "u v", "unbudgeted")).toDF("doc_id", "text", "source")
    // big: 12 tokens, budget 30 → e = 2.5 (two full epochs + a half slice);
    // small: 8 tokens, budget 4 → e = 0.5 (pure fractional downsample)
    val out = Hygiene.epochMix(df, col("source"), Map("big" -> 30L, "small" -> 4L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.forall(_._2 != "unbudgeted"), "strata without a budget are dropped")
    for (id <- Seq(1L, 2L, 3L); ep <- Seq(0L, 1L))
      assert(out.exists(t => t._1 == id && t._4 == ep),
        s"every big doc runs full epochs 0 and 1 (missing $id@$ep)")
    assert(out.forall(t => t._4 >= 0L && t._4 <= 2L))
    // partial-epoch membership is exactly the sha slice u < frac, on BOTH
    // the upsampled (epoch 2 of big) and downsampled (only epoch of small)
    // strata — recomputed independently JVM-side
    def u(id: Long): Double = TestHash.u(id)
    assert(out.filter(t => t._2 == "big" && t._4 == 2L).map(_._1).sorted
      .sameElements(Seq(1L, 2L, 3L).filter(id => u(id) < 0.5).sorted))
    assert(out.filter(_._2 == "small").map(_._1).sorted
      .sameElements(Seq(4L, 5L).filter(id => u(id) < 0.5).sorted))
    assert(out.filter(_._1 == 1L).forall(_._3 == 4L), "n_tokens rides along")
    assert(out.toSet.size == out.length, "(doc, epoch) rows are unique")
    // real corpus: realized token volume concentrates on the budget when
    // the budget spans several epochs (hash noise is one partial slice)
    val budgets = Map("src0" -> 4000L, "src1" -> 1500L)
    val real = Hygiene.epochMix(docs, col("source"), budgets)
      .groupBy("stratum").agg(sum("n_tokens").as("tok")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    for ((s, b) <- budgets) {
      val got = real(s).toDouble
      assert(got > b * 0.7 && got < b * 1.3,
        s"$s realized $got vs budget $b — fractional slice off")
    }
    // determinism
    val again = Hygiene.epochMix(docs, col("source"), budgets)
      .groupBy("stratum").agg(sum("n_tokens").as("tok")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again == real)
  }

  test("leakageSafeSplit: one-sided cross-split near-dup removal") {
    import spark.implicits._
    def u(id: Long): Double = TestHash.u(id)
    val frac = 0.5
    val ids = (1L to 40L)
    val held = ids.filter(u(_) < frac)
    val train = ids.filterNot(u(_) < frac)
    assert(held.size >= 4 && train.size >= 4) // held(3)/train(3) are indexed below
    def doc(i: Long, words: String) = (i, words)
    // h0 ~ t0 (cross near-dup: train side must drop, heldout stays);
    // t1 ~ t2 (train-train near-dup: BOTH stay — removal is one-sided);
    // h1 ~ h2 (held-held: both stay); the rest unique
    val texts = Seq(
      doc(held(0), "alpha beta gamma delta epsilon zeta"),
      doc(train(0), "alpha beta gamma delta epsilon zeta"),
      doc(train(1), "one two three four five six seven"),
      doc(train(2), "one two three four five six seven"),
      doc(held(1), "red orange yellow green blue indigo"),
      doc(held(2), "red orange yellow green blue indigo"),
      doc(held(3), "lonely words that match nothing else"),
      doc(train(3), "another loner with its own vocabulary"))
    val df = texts.toDF("doc_id", "text")
    val out = Curation.leakageSafeSplit(df, heldoutFrac = frac)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(!out.contains(train(0)), "train near-dup of a heldout doc must drop")
    assert(out(held(0)) == "heldout", "the heldout twin survives")
    assert(out(train(1)) == "train" && out(train(2)) == "train",
      "train-train near-dups are NOT leakage")
    assert(out(held(1)) == "heldout" && out(held(2)) == "heldout")
    assert(out(held(3)) == "heldout" && out(train(3)) == "train")
    assert(out.size == texts.size - 1)
  }

  test("jaccardPairsWhere: pushed pair condition == post-filtered jaccardPairs") {
    // the refactor pin: pushing the predicate into the candidate join must
    // not change the emitted pair set (real corpus, the gate's cross-split
    // condition)
    def held(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(sha2(id.cast("string"), 256), 1, 8), 16, 10)
        .cast("long") / lit(4294967296.0) < 0.2
    val pushed = Dedup.jaccardPairsWhere(docs, (a, b) => held(a) =!= held(b))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val post = Dedup.jaccardPairs(docs)
      .where(held(col("id_a")) =!= held(col("id_b")))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pushed == post)
    assert(pushed.nonEmpty, "sf0.001 has cross-split near-dups by construction")
  }

  test("packGreedy: doc-boundary bins — no overflow, contiguous fill, truncation") {
    import spark.implicits._
    // ctx 10: [4,5] fill bin 0 (pad 1), 7 opens bin 1, 10 exactly fills
    // bin 2, the 23-token doc is alone+truncated in bin 3, 2 lands in bin 4
    val df = Seq(
      (1L, "s", 4L), (2L, "s", 5L), (3L, "s", 7L), (4L, "s", 10L),
      (5L, "s", 23L), (6L, "s", 2L)).toDF("doc_id", "source", "n")
      .select(col("doc_id"), col("source"),
        concat_ws(" ", array_repeat(lit("w"), col("n").cast("int"))).as("text"))
    val got = Hygiene.packGreedy(df, ctxLen = 10)
      .orderBy("doc_id")
      .select("doc_id", "bin_id", "offset_in_bin", "n_kept").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 0L, 0L, 4L), (2L, 0L, 4L, 5L), (3L, 1L, 0L, 7L),
      (4L, 2L, 0L, 10L), (5L, 3L, 0L, 10L), (6L, 4L, 0L, 2L)))
    // corpus-wide invariants: bins never overflow, every doc's span is
    // disjoint and contiguous from offset 0, bin ids are dense per shard
    val packed = Hygiene.packGreedy(docs, ctxLen = 256).collect().map(r =>
      (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    packed.groupBy(p => (p._1, p._2)).foreach { case ((_, _), ds) =>
      val spans = ds.map(d => (d._3, d._3 + d._4)).sortBy(_._1)
      assert(spans.head._1 == 0L && spans.last._2 <= 256L)
      assert(spans.sliding(2).forall {
        case Array((_, e1), (s2, _)) => e1 == s2
        case _ => true
      })
    }
    packed.groupBy(_._1).foreach { case (_, ds) =>
      val bins = ds.map(_._2).distinct.sorted
      assert(bins.head == 0L && bins.last == bins.length - 1L)
    }
  }
  test("exactKSample: equals the window-rank formulation, without a window") {
    import org.apache.spark.sql.expressions.Window
    val k = 7
    val got = Hygiene.exactKSample(docs, col("source"), col("doc_id"), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // the row_number reference the oracle runs, computed in-engine
    val rk = expr("cast(conv(substring(sha2(cast(doc_id as string), 256), 1, 8), 16, 10) as long)")
    val ref = docs.select(col("source"), col("doc_id"), rk.as("rk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("rk"), col("doc_id"))))
      .where(col("rn") <= k)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == ref)
    // exact size: every stratum has >= k members at sf0.001
    got.groupBy(_._1).foreach { case (_, g) => assert(g.size == k) }
    // determinism across physical layouts
    val again = Hygiene.exactKSample(docs.repartition(13), col("source"), col("doc_id"), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(again == got)
  }

  test("exactKSample plan: partial top-k aggregate, NO window, one exchange") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    // AQE off for the pin: with it on, executedPlan is an unexecuted
    // AdaptiveSparkPlanExec wrapper and collect() sees no exchanges (the
    // ExtSpec:383 discipline — restore afterwards, the suite may be
    // sharing a ProdSession context)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = Hygiene.exactKSample(docs, col("source"), col("doc_id"), 20)
        .queryExecution.executedPlan
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"selection must not globally sort the corpus:\n$p")
      assert(p.collect { case s: ShuffleExchangeExec => s }.size == 1,
        s"expected the single stratum exchange:\n$p")
      assert(p.collect { case a: ObjectHashAggregateExec => a }.size == 2,
        s"expected partial+final TopKAgg so <=k rows/stratum/partition shuffle:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
  test("release: publish-then-card reconciles with the curation output") {
    val root = java.nio.file.Files.createTempDirectory("release").toString
    val bench = docs.where(col("doc_id") % 50 === 0)
    val corpus = docs.where(col("doc_id") % 50 =!= 0)
    val (v, card) = Curation.release(corpus, bench, root)
    assert(v == 1L)
    // the card describes EXACTLY the published snapshot
    val published = Snapshot.readCurrent(spark, root)
    val cardRows = card.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val refRows = published.groupBy("source")
      .agg(countDistinct(col("doc_id")).as("d"), sum(col("n_tokens")).as("t"),
        countDistinct(col("chunk_id")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(cardRows == refRows)
    // the published manifest is curateFull's output, row for row
    val direct = Curation.curateFull(corpus, bench).collect()
      .map(_.toString).sorted.toSeq
    assert(published.collect().map(_.toString).sorted.toSeq == direct)
    // a second release bumps the version; the first stays readable
    val (v2, _) = Curation.release(corpus.limit(100), bench, root)
    assert(v2 == 2L)
    assert(spark.read.parquet(s"$root/v=1").count() == direct.size)
  }

  test("lengthBatching: sorted shards, full batches, exact padding accounting") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val rows = Hygiene.lengthBatching(docs, batchSize = 8, nShards = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == docs.count())
    rows.groupBy(_._2).foreach { case (_, shard) =>
      val byBatch = shard.groupBy(_._3).toSeq.sortBy(_._1)
      byBatch.foreach { case (bid, b) =>
        // every batch except the shard's last is full
        if (bid < byBatch.map(_._1).max) assert(b.length == 8)
        val mx = b.map(_._4).max
        b.foreach { case (_, _, _, nt, bmax, waste) =>
          assert(bmax == mx && waste == mx - nt && waste >= 0)
        }
      }
      // batches partition the shard's length order: max of batch i <= min of i+1
      byBatch.sliding(2).foreach {
        case Seq((_, a), (_, b)) => assert(a.map(_._4).max <= b.map(_._4).min)
        case _ =>
      }
    }
    // grouping by length beats random batching on padding waste
    val waste = rows.map(_._6).sum
    val lens = rows.map(r => (r._1, r._4)).sortBy(_._1)
    val randomWaste = lens.grouped(8).map { g =>
      g.map(_._2).max * g.length - g.map(_._2).sum }.sum
    assert(waste < randomWaste, s"length grouping must reduce padding: $waste vs $randomWaste")
  }

  test("interleaveOrder: proportional fractional positions, dense per-shard order") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val rows = Hygiene.interleaveOrder(docs, col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == docs.count())
    // per stratum: fracs are exactly {0/n, 1/n, ..., (n-1)/n} — the evenly
    // spaced grid that makes any window of the final order proportional
    rows.groupBy(_._2).foreach { case (_, g) =>
      val n = g.length
      assert(g.map(_._5).sorted.toSeq == (0 until n).map(_.toDouble / n))
    }
    // per shard: pos is dense 0..n-1 and ordered by (frac, stratum)
    rows.groupBy(_._3).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == g.indices.map(_.toLong))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 < b._5 || (a._5 == b._5 && a._2 <= b._2))
        case _ =>
      }
    }
    // deterministic under physical reshuffle
    val again = Hygiene.interleaveOrder(docs.repartition(11), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
  }

  test("assignIds: dense 0..n-1, shard-major, deterministic across layouts") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val rows = Hygiene.assignIds(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val n = docs.count()
    assert(rows.length == n)
    // sample_id is a dense permutation of 0..n-1
    assert(rows.map(_._4).sorted.toSeq == (0L until n).toSeq)
    // shard-major: every id in shard s is below every id in shard s+1
    val byShard = rows.groupBy(_._2).view.mapValues(_.map(_._4)).toMap
    byShard.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(byShard(a).max < byShard(b).min)
      case _ =>
    }
    // within a shard, sample_id order == pos order
    byShard.foreach { case (s, _) =>
      val g = rows.filter(_._2 == s).sortBy(_._3)
      assert(g.map(_._4).toSeq == (g.head._4 until g.head._4 + g.length).toSeq)
    }
    // identical on a different physical layout
    val again = Hygiene.assignIds(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(again == rows.map(r => (r._1, r._4)).toMap)
  }

  test("budgetSelect: per-stratum greedy fill matches brute force; boundary doc kept") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val rows = docs.select(col("doc_id"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val budget = 3000L
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      var cum = 0L
      g.sortBy { case (id, _, sc, _) => (-sc, id) }.takeWhile { case (_, _, _, nt) =>
        val keep = cum < budget; cum += nt; keep
      }.toSeq
    }.map(_._1).toSet
    val got = Curation.budgetSelect(docs, col("lang"), col("n_chars"),
      size(split(col("text"), " ")), budget).collect().map(_.getLong(0)).toSet
    assert(got == want)
    // the crossing document is INSIDE the selection: each stratum's kept
    // token mass reaches the budget (unless the stratum ran dry)
    val byStratum = Curation.budgetSelect(docs, col("lang"), col("n_chars"),
      size(split(col("text"), " ")), budget)
      .groupBy("stratum").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    byStratum.foreach { case (s2, t) =>
      assert(t >= math.min(budget, totals(s2)), s"stratum $s2 under-filled: $t")
    }
  }

  test("blocklistFilter: counts match brute force; keep ⇔ zero hits") {
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val bl = Hygiene.GateBlocklist.toSet
    val want = corpus.map { case (id, toks) =>
      (id, toks.count(bl).toLong, toks.distinct.count(bl).toLong)
    }.toSet
    val got = Hygiene.blocklistFilter(docs, Hygiene.GateBlocklist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.exists(_._2 > 0L) && want.exists(_._2 == 0L),
      "gate blocklist must split the corpus non-trivially")
    val keeps = Hygiene.blocklistFilter(docs, Hygiene.GateBlocklist).collect()
    keeps.foreach(r => assert(r.getBoolean(3) == (r.getLong(1) == 0L)))
  }
}
