package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** BPE induction correctness: the classic Sennrich corpus with hand-checked
  * merges, a seeded differential against an independent in-JVM reference
  * implementation, and encode-side losslessness. */
class VocabSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Independent reference BPE (plain Scala, word-frequency formulation,
    * same tie-break: count desc then pair lexicographic asc). */
  private def referenceBpe(text: Seq[String], nMerges: Int,
                           minPairCount: Long = 2L): Seq[(String, String)] = {
    var freq: Map[List[String], Long] = text.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) => (w.split("").toList, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, c) <- freq; Seq(a, b) <- sym.sliding(2) if sym.size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      val eligible = counts.filter(_._2 >= minPairCount)
      if (eligible.isEmpty) done = true
      else {
        // count desc, then (a+SEP+b) lexicographic asc — mirror the engine
        val best = eligible.minBy { case ((a, b), c) => (-c, a + "" + b) }._1
        merges += best
        freq = freq.toSeq.map { case (sym, c) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < sym.size) {
            if (i + 1 < sym.size && sym(i) == best._1 && sym(i + 1) == best._2) {
              out += best._1 + best._2; i += 2
            } else { out += sym(i); i += 1 }
          }
          (out.toList, c)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    merges.toSeq
  }

  test("classic corpus: merges follow pair frequencies deterministically") {
    import spark.implicits._
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = Seq(corpus.mkString(" ")).toDF("text")
    val got = Vocab.trainBpe(df, nMerges = 6)
    val exp = referenceBpe(Seq(corpus.mkString(" ")), nMerges = 6)
    assert(got == exp, s"got $got, expected $exp")
    // 'es' (9 occurrences: newest 6 + widest 3) must be the first merge
    assert(got.head == ("e", "s"))
    // and 'est' follows immediately (the es+t pair keeps the same 9 count)
    assert(got(1) == ("es", "t"))
  }

  test("real corpus: engine merges == independent reference, 30 rounds") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got = Vocab.trainBpe(docs, nMerges = 30)
    val exp = referenceBpe(texts, nMerges = 30)
    assert(got == exp)
    assert(got.size == 30, "corpus is rich enough for 30 merges")
  }

  test("batched == classic on a provably non-interacting corpus") {
    import spark.implicits._
    // two-letter words over DISJOINT alphabets with strictly ordered
    // frequencies: each merge collapses its word to one symbol, so no merge
    // can create or destroy another's pair — batch selection must reproduce
    // the classic greedy sequence exactly, for every batch size
    val words = Seq("ab" -> 100, "cd" -> 90, "ef" -> 80, "gh" -> 70,
      "ij" -> 60, "kl" -> 50, "mn" -> 40, "op" -> 30)
    val corpus = words.flatMap { case (w, n) => Seq.fill(n)(w) }
    val df = Seq(corpus.mkString(" ")).toDF("text")
    val classic = Vocab.trainBpe(df, nMerges = 8, batchSize = 1)
    assert(classic == words.map { case (w, _) => (w(0).toString, w(1).toString) })
    for (m <- Seq(2, 4, 8, 100))
      assert(Vocab.trainBpe(df, nMerges = 8, batchSize = m) == classic,
        s"batchSize=$m diverged from the classic sequence")
  }

  test("batched selection skips interacting pairs within one batch") {
    import spark.implicits._
    // 'aaa'×50: pairs are only (a,a) c=100. After merging (a,a) classic
    // re-counts and finds (aa,a) c=50. A batch must NOT take both in one
    // pass ((aa,a) shares symbols with (a,a)) — batched training needs one
    // extra iteration and lands on the same sequence.
    val df = Seq(Seq.fill(50)("aaa").mkString(" ")).toDF("text")
    val classic = Vocab.trainBpe(df, nMerges = 2, batchSize = 1)
    assert(classic == Seq(("a", "a"), ("aa", "a")))
    assert(Vocab.trainBpe(df, nMerges = 2, batchSize = 8) == classic)
  }

  test("batched training on the real corpus: valid merges, lossless encode") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val merges = Vocab.trainBpe(docs, nMerges = 64, batchSize = 32)
    assert(merges.size == 64)
    assert(merges.distinct.size == 64, "no merge may repeat")
    val rows = Vocab.encode(docs.limit(50), merges)
      .select(col("text"), col("bpe_tokens")).collect()
    for (r <- rows)
      assert(r.getSeq[String](1).mkString == r.getString(0).replace(" ", ""),
        "batched-vocab encode must stay lossless")
  }

  test("encode: lossless (tokens concatenate back to the words) and compressive") {
    import spark.implicits._
    val docs = SparkEntry.table(spark, dir, "documents").limit(100)
    val merges = Vocab.trainBpe(docs, nMerges = 20)
    val enc = Vocab.encode(docs, merges)
      .select(col("doc_id"), col("text"), col("bpe_tokens"))
    val rows = enc.collect()
    for (r <- rows) {
      val chars = r.getAs[String]("text").replace(" ", "")
      assert(r.getSeq[String](2).mkString == chars,
        s"doc ${r.getLong(0)}: tokens must concatenate to the original characters")
    }
    // merges actually merge: fewer tokens than characters
    val nTok = rows.map(_.getSeq[String](2).size.toLong).sum
    val nChar = rows.map(_.getAs[String]("text").replace(" ", "").length.toLong).sum
    assert(nTok < nChar)
    // rank-priority encode == sequential replay of the merge passes (the
    // equivalence the encode scaladoc claims)
    def mergeOnce(sym: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < sym.size) {
        if (i + 1 < sym.size && sym(i) == a && sym(i + 1) == b) {
          out += a + b; i += 2
        } else { out += sym(i); i += 1 }
      }
      out.toList
    }
    for (r <- rows.take(20)) {
      val seqTokens = r.getAs[String]("text").split(" ").filter(_.nonEmpty)
        .flatMap { wd =>
          merges.foldLeft(wd.split("").toList) {
            case (sym, (a, b)) => mergeOnce(sym, a, b)
          }
        }.toSeq
      assert(r.getSeq[String](2) == seqTokens, s"doc ${r.getLong(0)}")
    }
  }
  test("unigram: lossless segmentation, char coverage, vocab budget, determinism") {
    import spark.implicits._
    val docs = SparkEntry.table(spark, dir, "documents")
    val model = Vocab.trainUnigram(docs, vocabSize = 60, seedMaxPiece = 4, seedPool = 200)
    val chars = docs.select(explode(split(col("text"), "")).as("c"))
      .where(col("c") =!= "" && col("c") =!= " ").distinct().as[String].collect().toSet
    // every corpus character is a piece (segmentability), budget respected
    assert(chars.subsetOf(model.keySet.filter(_.length == 1)))
    assert(model.size <= math.max(60, chars.size))
    assert(model.valuesIterator.forall(_ >= 1))
    // encoding is lossless: pieces concatenate back to the words
    val enc = Vocab.encodeUnigram(docs, model)
      .select(col("doc_id"), array_join(col("uni_tokens"), "").as("joined"))
      .as[(Long, String)].collect().toMap
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach { case (id, t) =>
      assert(enc(id) == t.split(" ").filter(_.nonEmpty).mkString(""),
        s"doc $id does not reassemble")
    }
    // training is partitioning-invariant (all reductions are integer sums)
    val again = Vocab.trainUnigram(docs.repartition(7), vocabSize = 60,
      seedMaxPiece = 4, seedPool = 200)
    assert(again == model)
  }

  test("unigram Viterbi: integer cross-multiplied comparison picks the likelier piece") {
    // counts: 'ab' has high mass, singles low — one 'ab' piece (p=90/100)
    // must beat two singles (25/100 * 35/100); and the tie rules are total
    val c = Map("a" -> 25L, "b" -> 35L, "ab" -> 90L)
    assert(Vocab.segmentWord("ab", c, t = 150L, maxLen = 2) == Seq("ab"))
    // equal-likelihood tie: fewer pieces wins
    val c2 = Map("a" -> 10L, "aa" -> 10L)
    // 'aa' as one piece: 10/T; as two: 100/T^2 — one piece wins iff 10*T > 100
    assert(Vocab.segmentWord("aa", c2, t = 20L, maxLen = 2) == Seq("aa"))
  }

  test("merge artifact: save/load round-trip preserves order and encode output") {
    val docs = graft.SparkEntry.table(spark, dir, "documents")
    val merges = Vocab.trainBpe(docs, nMerges = 12)
    val root = java.nio.file.Files.createTempDirectory("vocabart").toString
    try {
      Vocab.saveMerges(spark, merges, s"$root/m")
      val loaded = Vocab.loadMerges(spark, s"$root/m")
      assert(loaded == merges, "rank order must survive the round-trip")
      // encode with the reloaded artifact is byte-identical
      val a = Vocab.encode(docs.limit(50), merges).collect()
        .map(_.toString).sorted.toSeq
      val b = Vocab.encode(docs.limit(50), loaded).collect()
        .map(_.toString).sorted.toSeq
      assert(a == b)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }
}
