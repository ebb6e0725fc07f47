package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.functions.vectors

/** North-star-operator correctness beyond the DuckDB oracle: recall of the
  * approximate (LSH / IVF) variants against exact brute force at sf0.001, and
  * the vector-expression primitives. */
class ExtSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = SparkEntry.table(spark, dir, "documents")
  private def emb = SparkEntry.table(spark, dir, "embeddings")

  test("spread: repartitions a one-file input to the core count, no-ops otherwise") {
    import spark.implicits._
    // one-file parquet input → spread to defaultParallelism partitions
    // (the r17 single-task-stage fix); a non-file input (no inputFiles)
    // must pass through UNTOUCHED — the cluster-scale / in-memory no-op
    val par = spark.sparkContext.defaultParallelism
    assert(Dedup.spread(docs).rdd.getNumPartitions == par,
      "one-file corpus should spread to the core count")
    val mem = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Dedup.spread(mem) eq mem, "non-file input must pass through")
  }

  test("spread: keys on the per-leaf MINIMUM file count, not the aggregate listing") {
    // ADVICE r17 #3: a composed frame whose heavy side is ONE file but
    // which references >= defaultParallelism files in total must still
    // spread — the aggregate inputFiles count would silently skip it and
    // the single-task-stage class returns. Build a >=par-file side, join
    // it to the one-file corpus, and require the spread to fire.
    val par = spark.sparkContext.defaultParallelism
    val tmp = java.nio.file.Files.createTempDirectory("spread_leaf").toString
    try {
      docs.select(col("doc_id")).repartition(par)
        .write.mode("overwrite").parquet(s"$tmp/wide.parquet")
      val wide = spark.read.parquet(s"$tmp/wide.parquet")
      assert(wide.inputFiles.length >= par, "fixture must have >= par files")
      val composed = docs.join(wide, "doc_id")
      assert(composed.inputFiles.length >= par,
        "aggregate listing must be >= par for the test to bite")
      assert(Dedup.spread(composed).rdd.getNumPartitions == par,
        "one-file heavy side inside a many-file composition must still spread")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("quantSim: shared integer quantization, NaN pinned to Long.MaxValue") {
    import spark.implicits._
    val rows = Seq(0.5, -0.5, 0.0, 1e-17, -1e-17, Double.NaN).toDF("c")
      .select(Similarity.quantSim(col("c")).as("q")).collect().map(_.getLong(0))
    assert(rows(0) == 500000000L && rows(1) == -500000000L)
    // HALF_UP at the scaled value: near-zero cosines collapse to the SAME
    // integer on both signs (the LSH sign-bit guard)
    assert(rows(2) == 0L && rows(3) == 0L && rows(4) == 0L)
    // NaN → +Inf → floor → Long.MaxValue (ranked greatest, like DuckDB's
    // CASE WHEN isnan mirror), with the cosine argument evaluated once
    assert(rows(5) == Long.MaxValue)
  }

  test("cosine_sim matches a reference double-precision fold") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val got = df.select(vectors.cosineSim(col("a"), col("b"))).head().getDouble(0)
    val exp = (4.0 + 10.0 + 18.0) / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(got == exp)
    // NULL on length mismatch and zero norm
    val df2 = Seq((Array(1f), Array(1f, 2f)), (Array(0f), Array(0f))).toDF("a", "b")
    assert(df2.select(vectors.cosineSim(col("a"), col("b"))).collect().forall(_.isNullAt(0)))
  }

  test("simhash: near-identical token lists have small hamming distance") {
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog and runs far away".split(" ")
    val t2 = (t1.dropRight(1) :+ "home") // one token changed
    val t3 = "completely different words in this unrelated document text here now".split(" ")
    val df = Seq(Tuple1(t1), Tuple1(t2), Tuple1(t3)).toDF("toks")
    val sigs = df.select(vectors.simhash64(col("toks"))).collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(1)) < ham(sigs(0), sigs(2)))
    assert(sigs(0) == df.select(vectors.simhash64(col("toks"))).collect()(0).getLong(0)) // deterministic
  }

  test("minhash signature estimates Jaccard") {
    import spark.implicits._
    val a = (1 to 100).map(i => s"sh$i").toArray
    val b = (1 to 80).map(i => s"sh$i").toArray ++ (1 to 20).map(i => s"zz$i")
    val df = Seq(Tuple1(a), Tuple1(b)).toDF("sh")
    val sigs = df.select(vectors.minhashSig(col("sh"), 128)).collect()
      .map(_.getSeq[Long](0))
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 128.0
    val trueJ = 80.0 / 120.0
    assert(math.abs(est - trueJ) < 0.15, s"est $est vs true $trueJ")
  }

  test("minhash-LSH near-dup pairs: exact precision, high recall vs brute force") {
    val truth = Dedup.jaccardPairs(docs, k = 3, tau = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRows = Dedup.minhashLsh(docs, tau = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lsh = lshRows.toSet
    // the first-shared-band predicate must keep EXACTLY one row per
    // colliding pair (r17 — the distinct() it replaced guaranteed this)
    assert(lshRows.length == lsh.size,
      s"duplicate pair rows: ${lshRows.length} rows over ${lsh.size} pairs")
    assert(truth.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh.subsetOf(truth), "exact-Jaccard verification must kill false positives")
    val recall = lsh.size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 (found ${lsh.size}/${truth.size})")
  }

  test("simhash banding finds exactly the hamming<=3 pairs (pigeonhole exactness)") {
    val sigs = docs.select(col("doc_id"), vectors.simhash64(split(col("text"), " ")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    val blockedRows = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val blocked = blockedRows.toSet
    // first-shared-band keeps exactly one row per multi-band collision (r17)
    assert(blockedRows.length == blocked.size,
      s"duplicate pair rows: ${blockedRows.length} rows over ${blocked.size} pairs")
    assert(blocked == brute, s"blocking must be exact: got ${blocked.size} vs ${brute.size}")
  }

  test("SQ8 ANN: near-lossless recall@5 and bounded sim error vs exact") {
    val queries = emb.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = pairs(Similarity.annTopK(emb, queries, k = 5))
    val sq8df = Similarity.annSq8(emb, queries, k = 5)
    val sq8 = pairs(sq8df)
    val recalls = exact.map { case (q, e) => (e & sq8.getOrElse(q, Set.empty)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, s"SQ8 mean recall@5 $mean below 0.85 (int8 is near-lossless)")
    // int8 quantization perturbs cosine by O(1/127) per dim — sims of the
    // returned neighbors must sit within 0.05 of the exact sims
    val exactSim = Similarity.annTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    sq8df.select("query_id", "neighbor_id", "sim").collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactSim.get(key).foreach { es =>
        assert(math.abs(r.getDouble(2) - es) < 0.05, s"sim drift at $key")
      }
    }
  }

  test("IVF ANN recall@5 vs exact brute force") {
    val queries = emb.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = pairs(Similarity.annTopK(emb, queries, k = 5))
    val ivf = pairs(Similarity.annIvf(emb, queries, k = 5))
    val recalls = exact.map { case (q, e) => (e & ivf.getOrElse(q, Set.empty)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"IVF mean recall@5 $mean below 0.7 (nProbe=4/nCells=16 scans ~25%)")
    // scale shape: cell assignment is a narrow expression — the big (streamed)
    // side of the probe join must reach the join with NO shuffle before it
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = Similarity.annIvf(emb, queries, k = 5).queryExecution.sparkPlan
    val bhj = plan.collectFirst { case j: BroadcastHashJoinExec => j }
    assert(bhj.isDefined, s"probe join should be a broadcast hash join:\n$plan")
    val streamed = bhj.get.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => bhj.get.right
      case _                                                 => bhj.get.left
    }
    assert(streamed.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      s"no exchange may precede the probe join on the data side:\n$plan")
  }

  test("hard negatives: labels differ, window-rank differential, IVF recall + plan") {
    val queries = emb.where(col("vec_id") < 10)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap

    val hn = Similarity.hardNegatives(emb, queries, k = 5)
    val rows = hn.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty, "hard negatives must return rows on the gate corpus")
    rows.foreach { case (q, n) =>
      assert(labels(q) != labels(n), s"anchor $q got same-label neighbor $n") }

    // differential against a window-rank reference built from the same
    // cosine expression: exercises the TopKAgg partial-aggregation path
    // against an independent top-k mechanism (global row_number)
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), col("label").as("qlabel"))
    val ref = emb.join(q, col("vec_id") =!= col("query_id") && col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id"),
        vectors.cosineSim(col("qe"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = hn.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == ref, s"TopKAgg disagrees with window-rank reference: ${got.size} vs ${ref.size}")

    // IVF-probed variant: same label contract, reasonable recall vs exact
    val ivf = Similarity.hardNegativesIvf(emb, queries, k = 5)
    val ivfRows = ivf.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ivfRows.foreach { case (qid, n) =>
      assert(labels(qid) != labels(n), s"IVF: anchor $qid got same-label neighbor $n") }
    val exactBy = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivfBy = ivfRows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exactBy.map { case (k2, e) => (e & ivfBy.getOrElse(k2, Set.empty)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"IVF hard-negative mean recall@5 $mean below 0.6")
    // scale shape: same pin as annIvf — broadcast probe join, data side
    // reaches the join unshuffled
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = Similarity.hardNegativesIvf(emb, queries, k = 5).queryExecution.sparkPlan
    val bhj = plan.collectFirst { case j: BroadcastHashJoinExec => j }
    assert(bhj.isDefined, s"probe join should be a broadcast hash join:\n$plan")
    val streamed = bhj.get.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => bhj.get.right
      case _                                                 => bhj.get.left
    }
    assert(streamed.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      s"no exchange may precede the probe join on the data side:\n$plan")
  }

  test("PQ ANN: encode shape, ADC recall vs exact L2, trained codebooks round-trip") {
    val queries = emb.where(col("vec_id") < 10)
    // plain-Scala exact squared-L2 top-5 ground truth (PQ approximates L2,
    // not the cosine the other ANN paths rank by)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact = (0L until 10L).map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (l2(vecs(q), v), id) }.take(5).map(_._1).toSet
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, e) =>
        (e & got.getOrElse(q, Set.empty)).size.toDouble / e.size }.sum / exact.size
    }
    // encode: m codes per vector, every code a valid codeword id
    val cbs = Similarity.pqSeedCodebooks(emb, 8, 16)
    val codes = Similarity.pqEncode(emb, cbs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(codes.length == vecs.size)
    assert(codes.forall { case (_, cs) => cs.length == 8 && cs.forall(c => c >= 0 && c < 16) })
    val seedRecall = recall(Similarity.annPq(emb, queries, k = 5))
    info(f"PQ seed-codebook mean recall@5: $seedRecall%.3f")
    assert(seedRecall > 0.2,
      s"seed-codebook ADC recall $seedRecall at random-candidate level — wiring bug")
    // trained codebooks: persisted round-trip must be bit-exact, and the
    // Lloyd quantizer must not be materially worse than the raw seed
    val trained = Similarity.trainPqCodebooks(emb, m = 8, nCodes = 16, iters = 3)
    val root = java.nio.file.Files.createTempDirectory("pqcb")
    val loaded = try {
      Similarity.savePqCodebooks(spark, trained, s"$root/cb")
      Similarity.loadPqCodebooks(spark, s"$root/cb")
    } finally TmpIo.deleteRecursively(root)
    assert(loaded == trained, "codebooks must round-trip parquet bit-exactly")
    val trainedRecall = recall(Similarity.annPq(emb, queries, k = 5, codebooks = Some(loaded)))
    info(f"PQ trained-codebook mean recall@5: $trainedRecall%.3f")
    assert(trainedRecall >= seedRecall - 0.1,
      s"trained recall $trainedRecall collapsed vs seed $seedRecall")
  }

  test("embedTfidf: unit norm, plain-Scala differential, feeds the ANN operators") {
    val dim = 16
    val e = TextAnalysis.embedTfidf(docs, dim = dim)
    val rows = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.nonEmpty && rows.values.forall(_.length == dim))
    rows.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"norm $n not unit")
    }
    // in-JVM reimplementation of the fixture contract (sorted-word fold,
    // linear idf, index-order norm, float32 rounding)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = texts.length
    val dfm = scala.collection.mutable.Map.empty[String, Int]
    val tfs = texts.map { case (id, t) =>
      val tf = t.split(" ").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length).toMap
      tf.keys.foreach(w => dfm(w) = dfm.getOrElse(w, 0) + 1)
      (id, tf)
    }
    // CODE-POINT iteration and UTF-8 byte ordering, matching the engine
    // (split-per-character + ascii = code points; sort_array = UTF8String
    // binary order) and the Python fixture (ord / sorted) — plain Char
    // iteration and String.sorted would diverge on non-BMP text
    def h(w: String): Int = {
      var acc = 7L
      w.codePoints().forEach(c => acc = (acc * 31 + c) % Quality.HashMod)
      (acc % dim).toInt
    }
    val utf8Order: Ordering[String] = (a, b) =>
      java.util.Arrays.compareUnsigned(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    tfs.filter(_._2.nonEmpty).foreach { case (id, tf) =>
      val acc = new Array[Double](dim)
      tf.keys.toSeq.sorted(utf8Order).foreach { w =>
        acc(h(w)) += tf(w) * ((n + 1.0) / (dfm(w) + 1.0))
      }
      val norm = math.sqrt(acc.map(v => v * v).sum)
      val expect = acc.map(v => (if (norm > 0) v / norm else 0.0).toFloat)
      assert(rows(id).sameElements(expect), s"doc $id differs from the reference fold")
    }
    // the output is directly the similarity operators' input shape
    val emb = e.withColumnRenamed("doc_id", "vec_id")
    val knn = Similarity.annTopK(emb, emb.where(col("vec_id") < 3), k = 3)
    assert(knn.count() > 0, "text-derived embeddings must drive ANN end-to-end")
  }

  test("dedupThresholdReport: hand-built counts per threshold off one pair pass") {
    import spark.implicits._
    // shingles(k=3): d1 = d2 = {abc, bcd} (jac 1.0); d3 = {abc, bcd, cde}
    // → jac(1,3) = jac(2,3) = 2/3; so at 0.5: 3 pairs / 3 docs,
    // at 0.7: 1 pair (the identical one) / 2 docs, at 0.9: same
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupThresholdReport(docs, taus = Seq(0.9, 0.5, 0.7))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(0.5 -> ((3L, 3L)), 0.7 -> ((1L, 2L)), 0.9 -> ((1L, 2L))),
      s"got $got")
    // a pair-free corpus still reports zero rows per threshold, not nulls
    val disjoint = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    val zero = Dedup.dedupThresholdReport(disjoint, taus = Seq(0.5))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(zero.toSeq == Seq((0L, 0L)))
  }

  test("dedupClusterSizes: hand-built distribution incl. the singleton row") {
    import spark.implicits._
    // d1=d2=d3 form one 3-cluster (jac 1.0 pairwise); d4, d5 unique
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"),
      (4L, "x y z w"), (5L, "p q r s")).toDF("doc_id", "text")
    val got = Dedup.dedupClusterSizes(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 1L -> 2L), s"got $got")
    // a fully-unique corpus yields ONLY the singleton row
    val uniq = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    val g2 = Dedup.dedupClusterSizes(uniq)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(1L -> 2L))
  }

  test("jaccardPairs: seeded randomized differential vs brute force (random tau, k)") {
    // the PPJoin math under test: prefix length n − ⌈τ·n⌉ + 1 (the eps
    // guard at exact τ·n), the length filter, and the positional filter —
    // exercised across corpora with planted near-dups at several (k, τ)
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (trial <- 0 until 4) {
      val k = Seq(2, 3, 5)(trial % 3)
      val tau = Seq(0.3, 0.5, 0.7, 0.9)(trial)
      val nDocs = 30 + rnd.nextInt(30)
      val base = (1 to nDocs).map { id =>
        val len = 3 + rnd.nextInt(12)
        (id.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // planted near-dups: verbatim copies and one-word mutations
      val planted = base.take(8).map { case (id, t) =>
        val words = t.split(" ").toVector
        val m =
          if (rnd.nextBoolean())
            words.updated(rnd.nextInt(words.size), vocab(rnd.nextInt(vocab.size)))
          else words
        (id + 1000L, m.mkString(" "))
      }
      val corpus = base ++ planted
      def shingleSet(t: String): Set[String] = {
        val w = t.split(" ")
        if (w.length >= k) w.sliding(k).map(_.mkString(" ")).toSet else Set(t)
      }
      val brute = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a < b
        sa = shingleSet(ta); sb = shingleSet(tb)
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= tau
      } yield (a, b, j)).toSet
      val got = Dedup.jaccardPairs(corpus.toDF("doc_id", "text"), k = k, tau = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute,
        s"trial $trial k=$k tau=$tau: engine ${got.size} vs brute ${brute.size} " +
          s"(missing ${(brute -- got).take(3)}, extra ${(got -- brute).take(3)})")
      assert(brute.nonEmpty, s"trial $trial planted no qualifying pair — vacuous")
    }
  }

  test("incremental Jaccard == full pairs restricted to the incoming batch") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jac").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val incoming = docs.where(col("doc_id") % 10 === 0)
    val full = pairSet(Dedup.jaccardPairs(docs, k = 3, tau = 0.5))
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    val idx = Dedup.buildJaccardIndex(corpus, k = 3, tau = 0.5)
    val inc = pairSet(Dedup.jaccardPairsIncremental(idx, incoming, k = 3, tau = 0.5))
    assert(inc == full, s"incremental ${inc.size} pairs vs full-restricted ${full.size}")
    assert(full.nonEmpty, "fixture split produced no cross-batch pairs — test is vacuous")
    // the index must survive a parquet round-trip (the persist-once contract)
    val dir = java.nio.file.Files.createTempDirectory("jacidx").toString
    idx.prefix.write.parquet(s"$dir/prefix")
    idx.arrays.write.parquet(s"$dir/arrays")
    idx.dfreq.write.parquet(s"$dir/dfreq")
    val reloaded = Dedup.JaccardIndex(
      spark.read.parquet(s"$dir/prefix"),
      spark.read.parquet(s"$dir/arrays"),
      spark.read.parquet(s"$dir/dfreq"))
    assert(pairSet(Dedup.jaccardPairsIncremental(reloaded, incoming, k = 3, tau = 0.5)) == full)
  }

  test("bucketed index probe: identical pairs, index side never re-shuffled") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jac").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val incoming = docs.where(col("doc_id") % 10 === 0)
    val idx = Dedup.buildJaccardIndex(corpus, k = 3, tau = 0.5)
    val expect = pairSet(Dedup.jaccardPairsIncremental(idx, incoming, k = 3, tau = 0.5))
    val dir = java.nio.file.Files.createTempDirectory("jidx_b").toString
    try {
      Dedup.saveJaccardIndexBucketed(idx, dir, nBuckets = 4)
      val loaded = Dedup.loadJaccardIndexBucketed(spark, dir)
      // 3-join formulation over the catalog tables: same pair set
      val probe = Dedup.jaccardPairsIncrementalBucketed(loaded, incoming, k = 3, tau = 0.5)
      assert(pairSet(probe) == expect && expect.nonEmpty)
      // the plan claim, with broadcasts disabled so every join keys on
      // real partitioning: the plain (parquet, unbucketed) probe shuffles
      // the index side into every candidate join; the bucketed probe reads
      // its on-disk h-buckets — strictly fewer exchanges. The overrides go
      // through ConfScope rather than mutating the base session: the probe
      // DF is itself ConfScope-bound since r16 (noInferredFilters), so
      // base-session conf mutations never reach its planner — stacking a
      // second scope (same SparkContext/catalog, fresh SQLConf with these
      // overrides) is the supported way to re-plan it under test confs.
      // count on the initial physical plan (bucketing removes exchanges
      // statically; executing first would hide them inside AQE stages —
      // hence adaptive off in the scope)
      def nShuffles(df: org.apache.spark.sql.DataFrame): Int =
        ConfScope(df,
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.enabled" -> "false")
          .queryExecution.executedPlan.collect {
            case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
          }.size
      val plainIdx = Dedup.JaccardIndex(
        spark.read.parquet(s"$dir/prefix"),
        spark.read.parquet(s"$dir/arrays"),
        spark.read.parquet(s"$dir/dfreq"))
      val plain = nShuffles(
        Dedup.jaccardPairsIncrementalBucketed(plainIdx, incoming, k = 3, tau = 0.5))
      val bucketed = nShuffles(
        Dedup.jaccardPairsIncrementalBucketed(loaded, incoming, k = 3, tau = 0.5))
      assert(bucketed < plain,
        s"bucketed probe must avoid index-side exchanges ($bucketed vs $plain)")
    } finally {
      Dedup.dropJaccardIndexBucketed(spark, dir)
      TmpIo.deleteRecursively(dir)
    }
  }

  test("streaming dedup: two batches probe + absorb against a persisted index") {
    val dir = java.nio.file.Files.createTempDirectory("streamdedup").toString + "/idx"
    val corpus = docs.where(col("doc_id") % 10 >= 2)      // seed
    val batch1 = docs.where(col("doc_id") % 10 === 0)
    val batch2 = docs.where(col("doc_id") % 10 === 1)
    Dedup.saveJaccardIndex(Dedup.buildJaccardIndex(corpus), dir)

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // reference policy, from the full exact pair set: a batch doc is
    // rejected if it pairs with the accepted set; remaining batch docs
    // collapse to one representative per within-batch component
    def expected(batch: Set[Long], accepted: Set[Long],
                 allPairs: Set[(Long, Long)]): Set[Long] = {
      val rejected = batch.filter(b => allPairs.exists { case (x, y) =>
        (x == b && accepted(y)) || (y == b && accepted(x)) })
      val remaining = batch -- rejected
      // connected components of within-batch pairs over `remaining`
      var comp = remaining.map(d => d -> d).toMap
      var changed = true
      while (changed) {
        changed = false
        for ((x, y) <- allPairs if remaining(x) && remaining(y)) {
          val m = math.min(comp(x), comp(y))
          if (comp(x) != m) { comp += x -> m; changed = true }
          if (comp(y) != m) { comp += y -> m; changed = true }
        }
      }
      remaining.filter(d => comp(d) == d)
    }

    val all = pairSet(Dedup.jaccardPairs(docs, k = 3, tau = 0.5))
    val corpusIds = ids(corpus)

    val s1 = ids(Dedup.dedupBatch(spark, dir, batch1))
    val e1 = expected(ids(batch1), corpusIds, all)
    assert(s1 == e1, s"batch1 survivors $s1 vs expected $e1")

    // replay safety (foreachBatch re-delivery happens BEFORE the next
    // batch): immediate re-run reproduces the survivors and does not
    // duplicate index rows
    val before = spark.read.parquet(s"$dir/arrays").count()
    val s1Again = ids(Dedup.dedupBatch(spark, dir, batch1))
    assert(s1Again == s1, s"replay diverged: $s1Again vs $s1")
    assert(spark.read.parquet(s"$dir/arrays").count() == before,
      "replay duplicated index rows")

    // batch 2 probes corpus + batch-1 SURVIVORS (already absorbed)
    val s2 = ids(Dedup.dedupBatch(spark, dir, batch2))
    val e2 = expected(ids(batch2), corpusIds ++ e1, all)
    assert(s2 == e2, s"batch2 survivors $s2 vs expected $e2")
    assert((s1 ++ s2).nonEmpty && (ids(batch1) -- s1).nonEmpty,
      "fixture must both accept and reject documents or the test is vacuous")
  }

  test("subdocDedup: boilerplate spans removed from every copy, clean docs intact") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ") // one exact 8-token chunk
    val df = Seq(
      (1L, boiler + " " + (1 to 8).map(i => s"x$i").mkString(" ")),
      (2L, boiler + " " + (1 to 8).map(i => s"y$i").mkString(" ")),
      (3L, (1 to 16).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.subdocDedup(df, chunkLen = 8).orderBy("doc_id").collect()
    // the shared leading chunk vanishes from BOTH carriers, suffixes survive
    assert(out(0).getAs[String]("text_clean") == (1 to 8).map(i => s"x$i").mkString(" "))
    assert(out(1).getAs[String]("text_clean") == (1 to 8).map(i => s"y$i").mkString(" "))
    assert(out(0).getAs[Long]("n_dropped") == 1 && out(1).getAs[Long]("n_dropped") == 1)
    // a document with no duplicated span reassembles to its exact input
    assert(out(2).getAs[String]("text_clean") == (1 to 16).map(i => s"z$i").mkString(" "))
    assert(out(2).getAs[Long]("n_dropped") == 0)
    // real corpus: row parity and order-preserving reassembly for clean docs
    val real = Dedup.subdocDedup(docs).cache()
    try {
      assert(real.count() == docs.count())
      val clean = real.where(col("n_dropped") === 0)
        .join(docs.select(col("doc_id"), col("text")), "doc_id")
      assert(clean.where(col("text_clean") =!= col("text")).count() == 0,
        "clean documents must reassemble byte-identically")
    } finally real.unpersist()
  }

  test("dedupStream wires the batch step into foreachBatch end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("streamwrap").toString + "/idx"
    val corpus = docs.where(col("doc_id") % 10 >= 2)
    Dedup.saveJaccardIndex(Dedup.buildJaccardIndex(corpus), dir)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val rows = docs.where(col("doc_id") % 10 < 2)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    in.addData(rows.toSeq)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val q = Dedup.dedupStream(in.toDF().toDF("doc_id", "text"), dir) { survivors =>
      out ++= survivors.select("doc_id").collect().map(_.getLong(0))
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // same survivors as the batch-step reference on the same split
    assert(out.nonEmpty && out.size < rows.length,
      s"stream must both accept and reject (accepted ${out.size} of ${rows.length})")
    val absorbed = spark.read.parquet(s"$dir/arrays").count()
    assert(absorbed == corpus.count() + out.size,
      "index must contain exactly the seed plus the survivors")
  }

  test("streaming quantiles over the shard source: stop/restart == one-shot rank rule") {
    // the maintained-histogram twin of the dedup e2e: absorb the value
    // stream through the real kinesiscat source in capped micro-batches,
    // kill after the first, resume from the checkpoint — the final
    // boundary table must equal the ONE-SHOT exactQuantiles over
    // everything streamed (associative state + exactly-once replay)
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.ShardStream
    val base = java.nio.file.Files.createTempDirectory("qstream").toString
    val vals = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val streamDir = s"$base/stream"
    ShardStream.writeShardDir(streamDir, vals.map { case (id, v) =>
      ("s0", f"$id%012d", id.toString, v.toString, 1700000000000L + id) })
    def run(stateDir: String, ckpt: String, trigger: Trigger): Map[Long, Long] = {
      var last = Map.empty[Long, Long]
      val src = spark.readStream.format("kinesiscat")
        .option("path", streamDir).option("startingPosition", ShardStream.TrimHorizon)
        .option("batchSize", "100").load()
        .select(col("data").cast("string").cast("long").as("v"))
      val q = Quality.quantileStream(src, stateDir, col("v")) { rep =>
        last = rep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }.option("checkpointLocation", ckpt).trigger(trigger).start()
      q.awaitTermination()
      last
    }
    val oneShot = {
      import spark.implicits._
      Quality.exactQuantiles(vals.map(_._2).toDF("v"), col("v"), 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val unbroken = run(s"$base/stA", s"$base/ckptA", Trigger.AvailableNow())
    assert(unbroken == oneShot, "uninterrupted stream must match one-shot")
    run(s"$base/stB", s"$base/ckptB", Trigger.Once()) // killed mid-corpus
    val resumed = run(s"$base/stB", s"$base/ckptB", Trigger.AvailableNow())
    assert(resumed == oneShot, "resumed stream must match one-shot")
  }

  test("streaming dedup over the shard source: checkpoint stop/restart == uninterrupted") {
    // The S10 exactly-once pattern applied to the INDEX: dedupStream over
    // the real kinesiscat source, killed after one capped micro-batch and
    // resumed from its checkpoint, must emit the same survivors and leave
    // byte-identical index state as a never-interrupted run with the same
    // batch cap (same segmentation → same within-batch collapse decisions).
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    import graft.sources.ShardStream
    val base = java.nio.file.Files.createTempDirectory("dedupe2e").toString
    val corpus = docs.where(col("doc_id") % 10 >= 2)
    val incoming = docs.where(col("doc_id") % 10 < 2)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val streamDir = s"$base/stream"
    ShardStream.writeShardDir(streamDir, incoming.map { case (id, t) =>
      ("s0", f"$id%012d", id.toString, t, 1700000000000L + id) })

    def seed(idxDir: String): Unit =
      Dedup.saveJaccardIndex(Dedup.buildJaccardIndex(corpus), idxDir)
    def run(idxDir: String, ckpt: String, trigger: Trigger): Seq[Long] = {
      val acc = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val src = spark.readStream.format("kinesiscat")
        .option("path", streamDir).option("startingPosition", ShardStream.TrimHorizon)
        .option("batchSize", "20").load()
        .select(col("partitionKey").cast("long").as("doc_id"),
          col("data").cast("string").as("text"))
      val q = Dedup.dedupStream(src, idxDir) { survivors =>
        survivors.select("doc_id").collect().foreach(r => acc.add(r.getLong(0)))
      }.option("checkpointLocation", ckpt).trigger(trigger).start()
      q.awaitTermination()
      acc.iterator().asScala.toSeq
    }

    val idxA = s"$base/idxA"; seed(idxA)
    val survA = run(idxA, s"$base/ckptA", Trigger.AvailableNow())

    val idxB = s"$base/idxB"; seed(idxB)
    val part = run(idxB, s"$base/ckptB", Trigger.Once())
    val rest = run(idxB, s"$base/ckptB", Trigger.AvailableNow())
    assert(part.nonEmpty && rest.nonEmpty, "the stop must land mid-corpus")
    val resumed = part ++ rest
    assert(resumed.distinct.size == resumed.size, "no re-delivered survivor")
    assert(resumed.sorted == survA.sorted,
      s"resumed survivors must equal the uninterrupted run's " +
        s"(${resumed.size} vs ${survA.size})")

    def idxState(d: String): (Seq[Long], Seq[(Long, Long)]) = (
      spark.read.parquet(s"$d/arrays").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq,
      spark.read.parquet(s"$d/prefix").select("doc_id", "h")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    assert(idxState(idxB) == idxState(idxA),
      "index rows after restart must be identical to the uninterrupted run")
  }

  test("sign-LSH ANN: deterministic buckets, recall@5 vs exact brute force") {
    val queries = emb.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = pairs(Similarity.annTopK(emb, queries, k = 5))
    val lsh = pairs(Similarity.annLsh(emb, queries, k = 5))
    // determinism: fixed-seed planes → identical output across runs
    assert(lsh == pairs(Similarity.annLsh(emb, queries, k = 5)))
    val recalls = exact.map { case (q, e) => (e & lsh.getOrElse(q, Set.empty)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    info(f"LSH mean recall@5 on the near-uniform sf corpus: $mean%.3f (tables=4, bits=8)")
    // the sf corpus is near-uniform random 64-dim data — neighbors sit at
    // ~70° where an 8-bit bucket collides with p ≈ 0.6^8: sign-LSH (like any
    // LSH) cannot beat that without structure, so the uniform-corpus check
    // only guards against a wiring bug (recall must beat the ~4/500 random-
    // candidate floor); the clustered corpus below is the real recall gauge
    // and the oracle gate (ann_lsh) pins the algorithm itself exactly.
    assert(mean > 0.0, s"LSH recall $mean at random-candidate level — wiring bug")
    // output must be a subset of each query's bucket-collision candidates
    // scored exactly — i.e. every reported neighbor is a true cosine value
    val withSim = Similarity.annLsh(emb, queries, k = 5)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
      .select(col("sim"), vectors.cosineSim(col("qe"), col("ne")).as("truth"))
      .collect()
    assert(withSim.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("sign-LSH ANN separates a clustered corpus (near-perfect recall, tight buckets)") {
    import spark.implicits._
    // the same adversarial-for-IVF clustered layout: 8 well-separated
    // clusters × 60 points, dim 16, deterministic integer-formula noise —
    // within-cluster angles are tiny, cross-cluster angles are near-90°,
    // exactly the regime hyperplane LSH is built for
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 60) yield {
      val id = (c * 60 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d == c * 2) 10f else 0f
        center + (((id * 31 + d * 17) % 7).toInt - 3) * 0.1f
      }
      (id, v.toSeq)
    }
    val cdf = rows.toDF("vec_id", "embedding")
    val queries = cdf.where(col("vec_id") % 60 === 30) // one query per cluster
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = pairs(Similarity.annTopK(cdf, queries, k = 5))
    val lsh = pairs(Similarity.annLsh(cdf, queries, k = 5))
    val recalls = exact.map { case (q, e) => (e & lsh.getOrElse(q, Set.empty)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    info(f"clustered-corpus LSH mean recall@5: $mean%.3f (tables=4, bits=8)")
    assert(mean >= 0.9, s"LSH recall@5 $mean below 0.9 on a clustered corpus")
  }

  test("PQ ANN separates a clustered corpus (trained codebooks, high recall)") {
    import spark.implicits._
    // the sign-LSH clustered layout: 8 well-separated clusters × 60 points,
    // dim 16 — within-cluster L2 distances are tiny vs cross-cluster, the
    // regime a trained product quantizer must preserve
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 60) yield {
      val id = (c * 60 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d == c * 2) 10f else 0f
        center + (((id * 31 + d * 17) % 7).toInt - 3) * 0.1f
      }
      (id, v.toSeq)
    }
    val cdf = rows.toDF("vec_id", "embedding")
    val queries = cdf.where(col("vec_id") % 60 === 30)
    val vecs = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact = vecs.keys.filter(_ % 60 == 30).map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (l2(vecs(q), v), id) }.take(5).map(_._1).toSet
    }.toMap
    val trained = Similarity.trainPqCodebooks(cdf, m = 4, nCodes = 16, iters = 5)
    val got = Similarity.annPq(cdf, queries, k = 5, codebooks = Some(trained))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, e) =>
      (e & got.getOrElse(q, Set.empty)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    info(f"clustered-corpus PQ mean recall@5: $mean%.3f (m=4, 16 codes)")
    assert(mean >= 0.9, s"PQ recall@5 $mean below 0.9 on a clustered corpus")
  }

  test("IVF-PQ (IVFADC): trained coarse cells + residual codebooks on a clustered corpus") {
    import spark.implicits._
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 60) yield {
      val id = (c * 60 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d == c * 2) 10f else 0f
        center + (((id * 31 + d * 17) % 7).toInt - 3) * 0.1f
      }
      (id, v.toSeq)
    }
    val cdf = rows.toDF("vec_id", "embedding")
    val queries = cdf.where(col("vec_id") % 60 === 30)
    val vecs = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact = vecs.keys.filter(_ % 60 == 30).map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (l2(vecs(q), v), id) }.take(5).map(_._1).toSet
    }.toMap
    // trained path end to end: full-vector L2 k-means IS trainPqCodebooks
    // at m=1; residual codebooks train on ivfResiduals of those cells
    val cents = Similarity.trainPqCodebooks(cdf, m = 1, nCodes = 8, iters = 5).head
    val cbs = Similarity.trainPqCodebooks(
      Similarity.ivfResiduals(cdf, cents), m = 4, nCodes = 16, iters = 5)
    def run() = Similarity.annIvfPq(cdf, queries, k = 5, nCells = 8, nProbe = 2,
        m = 4, nCodes = 16, centroids = Some(cents), codebooks = Some(cbs))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = run()
    val recalls = exact.map { case (q, e) =>
      (e & got.getOrElse(q, Set.empty)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    info(f"clustered-corpus IVF-PQ mean recall@5: $mean%.3f (8 cells/probe 2, m=4)")
    assert(mean >= 0.9, s"IVF-PQ recall@5 $mean below 0.9 on a clustered corpus")
    assert(got == run(), "the full trained IVFADC path must be deterministic")
  }

  test("k-means-trained IVF centroids: deterministic, well-formed, recall holds") {
    val queries = emb.where(col("vec_id") < 10)
    val trained = Similarity.trainCentroids(emb, nCells = 16, iters = 3)
    // shape + determinism (stride sample, no randomness: same corpus → same centroids)
    assert(trained.length == 16 && trained.forall(_._2.length == 64))
    assert(trained.forall(_._2.forall(v => !v.isNaN && !v.isInfinite)))
    assert(trained == Similarity.trainCentroids(emb, nCells = 16, iters = 3))
    // training must actually move the cells off the first-k seed
    val seed = emb.orderBy("vec_id").limit(16).select(col("embedding"))
      .collect().map(_.getSeq[Float](0)).toSet
    assert(trained.count(c => seed.contains(c._2)) < 16, "Lloyd rounds should move centroids")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(ivf: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (q, e) => (e & ivf.getOrElse(q, Set.empty)).size.toDouble / e.size }
      rs.sum / rs.size
    }
    val exact = pairs(Similarity.annTopK(emb, queries, k = 5))
    val rTrained = meanRecall(pairs(
      Similarity.annIvf(emb, queries, k = 5, centroids = Some(trained))), exact)
    val rSeed = meanRecall(pairs(Similarity.annIvf(emb, queries, k = 5)), exact)
    info(f"IVF recall@5: trained $rTrained%.3f vs first-k seed $rSeed%.3f")
    // the sf corpus is near-uniform random 64-dim data — there is no cluster
    // structure to recover, so trained recall at a fixed probe budget is a
    // local-optimum draw; the clustered-corpus test below is the real gauge
    assert(rTrained >= 0.5, s"trained-centroid recall $rTrained collapsed")
  }

  test("trained centroids persist + reload bit-exactly; loaded state reproduces queries") {
    val trained = Similarity.trainCentroids(emb, nCells = 16, iters = 3)
    val path = java.nio.file.Files.createTempDirectory("cents").toString + "/ivf"
    Similarity.saveCentroids(spark, trained, path)
    val loaded = Similarity.loadCentroids(spark, path)
    // floats round-trip parquet bit-exactly → identical assignments later
    assert(loaded == trained, "parquet round-trip changed the centroids")
    val queries = emb.where(col("vec_id") < 10)
    val a = Similarity.annIvf(emb, queries, k = 5, centroids = Some(trained))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = Similarity.annIvf(emb, queries, k = 5, centroids = Some(loaded))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b, "loaded centroids changed the ANN result")
  }

  test("codeSwitchStats: hand-built switching doc; monolingual and tie cases") {
    import spark.implicits._
    // 16 en-marker tokens then 16 fr-marker tokens: 2 windows, 1 switch,
    // dominant ties 1-1 → 'en' by the fixed priority; share = 1/2
    val mixed = (Seq.fill(16)("the") ++ Seq.fill(16)("table")).mkString(" ")
    val mono = Seq.fill(16)("the").mkString(" ")
    val docs = Seq((1L, mixed), (2L, mono), (3L, "slow fast"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.codeSwitchStats(docs, window = 16).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    assert(got(1L) == ((2L, 1L, "en", 0.5)), s"mixed: ${got(1L)}")
    assert(got(2L) == ((1L, 0L, "en", 1.0)))
    assert(got(3L) == ((1L, 0L, "en", 1.0)), "a sub-window doc is one window")
    // a 3-language alternation counts every adjacent change
    val tri = (Seq.fill(16)("the") ++ Seq.fill(16)("table") ++
      Seq.fill(16)("order") ++ Seq.fill(16)("the")).mkString(" ")
    val g3 = TextAnalysis.codeSwitchStats(Seq((9L, tri)).toDF("doc_id", "text"))
      .head()
    assert(g3.getLong(1) == 4L && g3.getLong(2) == 3L &&
      g3.getString(3) == "en" && g3.getDouble(4) == 0.5)
  }

  test("tokenFertility: hand counts per language, exact ratios") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "hello world"),         // 2 words, 2 pretokens, 11 bytes
      (2L, "en", "it's 42 degrees!"),    // 3 words, 5 pretokens, 16 bytes
      (3L, "fr", "café naïve")           // 2 words, 2 pretokens, 12 bytes
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenFertility(docs, col("lang"))
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(1) == 2 && en.getLong(2) == 5 && en.getLong(3) == 7)
    assert(en.getLong(4) == 27)
    assert(en.getDouble(5) == 7.0 / 5.0, "pretokens per word")
    assert(en.getDouble(6) == 27.0 / 7.0, "bytes per pretoken")
    val fr = out("fr")
    // 'café naïve' = 2 pretokens; é/ï are 2 UTF-8 bytes each → 12 bytes
    assert(fr.getLong(2) == 2 && fr.getLong(3) == 2 && fr.getLong(4) == 12)
  }

  test("icpOrder: NULL embeddings pin walkable-but-last, no NPE (ADVICE r12)") {
    import spark.implicits._
    // collect_list(struct(...)) KEEPS a row whose embedding is NULL, so
    // the walk must rank it by the oracle's COALESCE(cos, -2e9) rule
    // instead of NPE-ing the task
    assert(IcpWalk.quantCos(null, Seq(1.0f)) == -2000000000L)
    assert(IcpWalk.quantCos(Seq(1.0f), null) == -2000000000L)
    val mixed = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, null)
    ).toDF("vec_id", "embedding")
    val out = Similarity.icpOrder(mixed, nCells = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(3L) == 2L, "the null row must walk LAST, not crash")
  }

  test("icpOrder: default nCells derives the sqrt-n operating rule") {
    // nCells <= 0 → cells from Tuning.suggestIvf(count): the task-bounding
    // rule is the DEFAULT (VERDICT r12 item 9), and the output is still a
    // permutation with contiguous per-chain positions
    val out = Similarity.icpOrder(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = emb.count()
    assert(out.length == total && out.map(_._1).distinct.length == total)
    val cells = out.map(_._2).distinct.length
    val expected = Tuning.suggestIvf(total).nCells
    assert(cells <= expected,
      s"observed $cells chains must not exceed the derived $expected cells")
    assert(out.groupBy(_._2).values.forall(c =>
      c.map(_._3).sorted.sameElements(0L until c.length.toLong)))
  }

  test("icpOrder: permutation, chain rule matches the brute-force greedy walk") {
    val nCells = 8
    val out = Similarity.icpOrder(emb, nCells = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a PERMUTATION of the corpus: every vector exactly once
    val total = emb.count()
    assert(out.length == total && out.map(_._1).distinct.length == total)
    // chains agree with the independent assignment; positions contiguous
    val cents = Similarity.centroidLit(emb, nCells)
    val assigned = emb.select(col("vec_id"), col("embedding"),
        Similarity.nearestCell(col("embedding"), cents).as("cell"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2)))
    val cellOf = assigned.map(a => a._1 -> a._3).toMap
    assert(out.forall { case (id, chain, _) => cellOf(id) == chain })
    val byChain = out.groupBy(_._2)
    assert(byChain.values.forall(c =>
      c.map(_._3).sorted.sameElements(0L until c.length.toLong)),
      "positions must be contiguous from 0 within each chain")
    // the walk IS the greedy rule: independent brute-force recompute
    val embOf = assigned.map(a => a._1 -> a._2).toMap
    for ((chain, members) <- assigned.groupBy(_._3)) {
      val ids = members.map(_._1)
      var cur = ids.min
      val visited = collection.mutable.Set(cur)
      val expect = collection.mutable.ArrayBuffer(cur)
      while (visited.size < ids.length) {
        val next = ids.filterNot(visited).maxBy(j =>
          IcpWalk.quantCos(embOf(cur), embOf(j)) * 4294967296L - j)
        visited += next; expect += next; cur = next
      }
      val got = byChain(chain).sortBy(_._3).map(_._1).toSeq
      assert(got == expect.toSeq, s"chain $chain diverged from the greedy walk")
    }
    // adjacency beats a random (id-ordered) stream: mean adjacent cosine
    // of the ICP order must exceed the id order's (the operator's point)
    def meanAdjQ(order: Seq[Long]): Double = {
      val qs = order.sliding(2).collect { case Seq(a, b) =>
        IcpWalk.quantCos(embOf(a), embOf(b)).toDouble }.toSeq
      qs.sum / qs.length
    }
    val icpAdj = byChain.values.map(c => meanAdjQ(c.sortBy(_._3).map(_._1).toSeq))
      .sum / byChain.size
    val idAdj = meanAdjQ(assigned.map(_._1).sorted.toSeq)
    assert(icpAdj > idAdj,
      s"ICP order must beat the id-ordered stream on adjacent similarity: $icpAdj vs $idAdj")
  }

  test("clusterBalance: per-cell cap, deterministic sha rank, trained-centroid path") {
    val cap = 5; val nCells = 8
    val out = Similarity.clusterBalance(emb, cap = cap, nCells = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCell = out.groupBy(_._2)
    assert(byCell.values.forall(_.length <= cap), "a cell exceeded its cap")
    assert(byCell.values.forall(c =>
      c.map(_._3).sorted.sameElements(0L until c.length.toLong)),
      "ranks must be contiguous from 0 within each cell")
    // survivors agree with the independent assignment; cells at-or-under
    // the cap keep EVERY member (balancing only removes, never reassigns)
    val cents = Similarity.centroidLit(emb, nCells)
    val assigned = emb.select(col("vec_id"),
        Similarity.nearestCell(col("embedding"), cents).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cellOf = assigned.toMap
    assert(out.forall { case (id, cell, _) => cellOf(id) == cell })
    val sizes = assigned.groupBy(_._2).view.mapValues(_.length).toMap
    for ((cell, n) <- sizes if n <= cap)
      assert(byCell.get(cell).map(_.length).contains(n),
        s"under-cap cell $cell must keep all $n members")
    // the kept subset is the lowest sha256 ranks — independent recompute
    def u(id: Long): Long = TestHash.u64(id)
    for ((cell, members) <- assigned.groupBy(_._2)) {
      val expect = members.map(_._1).sortBy(id => (u(id), id)).take(cap).toSet
      assert(byCell.getOrElse(cell, Array.empty).map(_._1).toSet == expect,
        s"cell $cell kept the wrong sha-ranked members")
    }
    // determinism + the trained-centroid code path
    val again = Similarity.clusterBalance(emb, cap = cap, nCells = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    val trained = Similarity.trainCentroids(emb, nCells = nCells, iters = 2)
    val balT = Similarity.clusterBalance(emb, cap = cap, nCells = nCells,
      centroids = Some(trained)).collect()
    assert(balT.nonEmpty &&
      balT.map(_.getLong(1)).toSet.subsetOf(trained.map(_._1).toSet))
  }

  test("k-means centroids separate a clustered corpus where a first-k seed cannot") {
    import spark.implicits._
    // 8 well-separated clusters × 60 points, dim 16, ids ordered BY CLUSTER —
    // the adversarial layout for a first-k centroid seed (all 8 first
    // vectors sit in cluster 0). Deterministic integer-formula noise.
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 60) yield {
      val id = (c * 60 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d == c * 2) 10f else 0f
        center + (((id * 31 + d * 17) % 7).toInt - 3) * 0.1f
      }
      (id, v.toSeq)
    }
    val cdf = rows.toDF("vec_id", "embedding")
    val queries = cdf.where(col("vec_id") % 60 === 30) // one query per cluster
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(ivf: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (q, e) => (e & ivf.getOrElse(q, Set.empty)).size.toDouble / e.size }
      rs.sum / rs.size
    }
    val exact = pairs(Similarity.annTopK(cdf, queries, k = 5))
    val trained = Similarity.trainCentroids(cdf, nCells = 8, iters = 5)
    // training must recover the TRUE structure: every cluster gets its own
    // cell, 100% pure and perfectly balanced (the worst-case probe cost at
    // scale is one cluster, not a merged mega-cell)
    val lit0 = org.apache.spark.sql.functions.typedLit(trained)
    val cells = cdf.select((col("vec_id") / 60).cast("int").as("cluster"),
        Similarity.nearestCell(col("embedding"), lit0).as("cell"))
      .groupBy("cluster", "cell").count().collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(cells.length == 8, s"each cluster should map to exactly one cell:\n${cells.toSeq}")
    assert(cells.forall(_._3 == 60), s"cells should be perfectly balanced:\n${cells.toSeq}")
    assert(cells.map(_._2).distinct.length == 8, "no two clusters may share a cell")
    // with pure cells, a single probe suffices for perfect recall
    val rTrained = meanRecall(pairs(
      Similarity.annIvf(cdf, queries, k = 5, nCells = 8, nProbe = 1,
        centroids = Some(trained))), exact)
    info(f"clustered corpus recall@5 at nProbe=1/8 with trained centroids: $rTrained%.3f")
    assert(rTrained == 1.0, s"pure trained cells should give perfect recall, got $rTrained")
  }

  test("incremental embedding pairs == full pairs (frozen centroids) restricted to batch") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val corpus = emb.where(col("vec_id") % 10 =!= 0)
    val incoming = emb.where(col("vec_id") % 10 === 0)
    val idx = Dedup.buildEmbeddingIndex(corpus)
    // full run over the union with the SAME frozen centroids — identical
    // blocking, so restriction to batch-touching pairs must be an equality
    val full = pairSet(Dedup.embeddingPairs(emb, tau = 0.4,
        centroids = Some(idx.centroids)))
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    val inc = pairSet(Dedup.embeddingPairsIncremental(idx, incoming, tau = 0.4))
    assert(inc == full, s"incremental ${inc.size} vs full-restricted ${full.size}")
    assert(full.nonEmpty, "fixture split produced no cross-batch pairs — vacuous")
    // persist-once contract: the index round-trips parquet
    val dir = java.nio.file.Files.createTempDirectory("embidx").toString + "/idx"
    Dedup.saveEmbeddingIndex(idx, dir)
    val reloaded = Dedup.loadEmbeddingIndex(spark, dir)
    assert(reloaded.centroids == idx.centroids)
    assert(pairSet(Dedup.embeddingPairsIncremental(reloaded, incoming, tau = 0.4)) == full)
  }

  test("substringDedup: arbitrary-offset spans, keep-first, interval merge") {
    import spark.implicits._
    val L = 4
    val docs = Seq(
      // doc 1 holds the global first occurrence of the DUP 4-gram (pos 5)
      (1L, "p q r s D1 D2 D3 D4 t u"),
      // doc 2 repeats it MISALIGNED (pos 3) — fixed-chunk dedup would miss it
      (2L, "x y D1 D2 D3 D4 z w"),
      // doc 3: two overlapping duplicated grams (pos 1 and pos 3 both dup
      // vs doc 1/2 shifted copies) force the interval fold-merge
      (3L, "D1 D2 D3 D4 D1 D2 D3 D4"),
      // doc 4: unique text — passes through untouched
      (4L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    // brute-force in-JVM reference of the declared semantics
    val toks = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val grams = for ((id, w) <- toks.toSeq; i <- 1 to w.length - L + 1)
      yield (w.slice(i - 1, i - 1 + L).mkString(" "), id, i)
    val byGram = grams.groupBy(_._1).filter(_._2.size > 1)
    val removals = byGram.values.flatMap { occ =>
      occ.sortBy(o => (o._2, o._3)).drop(1).map(o => (o._2, o._3))
    }.toSeq
    val expected = toks.map { case (id, w) =>
      val covered = removals.filter(_._1 == id)
        .flatMap { case (_, p) => p until (p + L) }.toSet
      val kept = (1 to w.length).filterNot(covered)
      (id, w.length.toLong, (w.length - kept.size).toLong,
        kept.map(j => w(j - 1)).mkString(" "))
    }.toSet
    val got = Dedup.substringDedup(docs, gramLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // pin the headline facts independently of the reference
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == "p q r s D1 D2 D3 D4 t u", "first occurrence kept")
    assert(byId(2L)._4 == "x y z w", "misaligned later copy removed")
    assert(byId(3L)._3 == 8L && byId(3L)._4 == "", "overlapping spans merged, whole doc removed")
    assert(byId(4L)._3 == 0L, "unique doc untouched")
  }

  test("substringDedup: short docs emit no grams and survive verbatim") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    // 3-token docs < gramLen=8: identical docs still survive (this operator
    // is span-level; whole-doc dedup is Dedup.exact's job)
    val got = Dedup.substringDedup(docs, gramLen = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(got == Set((1L, 0L, "a b c"), (2L, 0L, "a b c")))
  }

  test("semdedup: one representative per semantic component, singletons survive") {
    import spark.implicits._
    // 4 well-separated semantic groups (one-hot anchors, 3 near-identical
    // members each) + 4 unrelated singletons: SemDeDup must keep exactly
    // the min vec_id of each group and every singleton
    val dim = 8
    def oneHot(d: Int, eps: Float, epsDim: Int): Array[Float] = {
      val v = Array.fill(dim)(0.0f); v(d) = 1.0f; v(epsDim) += eps; v
    }
    val rows =
      (for (g <- 0 until 4; j <- 0 until 3)
        yield ((g * 10 + j).toLong, oneHot(g, j * 0.001f, (g + 1) % dim))) ++
      (for (i <- 0 until 4) yield ((100 + i).toLong, oneHot(4 + i, 0.0f, 0)))
    val cdf = rows.toDF("vec_id", "embedding")
    val survivors = Dedup.semdedupPrune(cdf, tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 10L, 20L, 30L, 100L, 101L, 102L, 103L),
      s"unexpected survivor set: $survivors")
  }

  test("embedding near-dup blocking: exact precision, measured recall vs all-pairs") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairSet(Dedup.embeddingPairsExact(emb, tau = 0.4))
    val blocked = pairSet(Dedup.embeddingPairs(emb, tau = 0.4))
    assert(truth.nonEmpty, "sf0.001 embeddings should contain cos>=0.4 pairs")
    // exact-cosine verification: no false positives, ever
    assert(blocked.subsetOf(truth))
    // recall: tau=0.4 over near-uniform random vectors is the adversarial
    // regime for any blocking scheme (real near-dups sit at cos>=0.9, where
    // shared-nearest-cell probability approaches 1) — still require a
    // substantial majority to be found
    val recall = blocked.size.toDouble / truth.size
    assert(recall >= 0.5, s"cell-blocking recall $recall below 0.5 (${blocked.size}/${truth.size})")
    // and the plan must be a bucketed equality join, never a cartesian
    val plan = Dedup.embeddingPairs(emb, tau = 0.4).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"embeddingPairs plan must not contain an all-pairs join:\n$plan")
  }

  test("domainWeights: surprising domains upweighted; bit-deterministic") {
    import spark.implicits._
    // reference vocabulary = {in-domain words}; domain B is pure OOV →
    // lower mean_prob → strictly higher weight
    val docs = Seq(
      (1L, "alpha beta gamma", "A"), (2L, "alpha beta delta", "A"),
      (3L, "zz qq xx", "B"), (4L, "yy ww vv", "B"))
      .toDF("doc_id", "text", "source")
    val ref = docs.where(col("source") === "A")
    val rows = TextAnalysis.domainWeights(docs, ref, col("source")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows("B")._1 < rows("A")._1, "OOV domain must score lower")
    assert(rows("B")._2 > rows("A")._2, "surprising domain must be upweighted")
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-12)
    // partitioning invariance (the fold is domain-sorted, driver-side)
    val again = TextAnalysis.domainWeights(docs.repartition(7), ref, col("source"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    rows.foreach { case (d, (_, w)) =>
      assert(java.lang.Double.doubleToLongBits(again(d)) ==
        java.lang.Double.doubleToLongBits(w))
    }
  }

  test("knCounts: continuation vs raw counts — the Francisco property") {
    import spark.implicits._
    // 'francisco' is FREQUENT (5 raw) but always follows 'san' (1 context);
    // 'road' is rarer (3 raw) but follows 3 distinct words
    val docs = Seq(
      "san francisco bay", "san francisco fog", "san francisco hills",
      "san francisco piers", "san francisco food",
      "main road", "old road", "new road").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.knCounts(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("francisco") == ((5L, 1L)))
    assert(got("road") == ((3L, 3L)))
    assert(got("san") == ((5L, 0L)), "document-initial words have no context")
    // JVM differential over the real corpus
    val real = SparkEntry.table(spark, dir, "documents")
    val texts = real.select("text").collect().map(_.getString(0))
    val raw = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cont = texts.flatMap { t =>
      val w = t.split(" ").filter(_.nonEmpty)
      w.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
    }.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val gotReal = TextAnalysis.knCounts(real).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotReal.keySet == raw.keySet)
    gotReal.foreach { case (wd, (c, nc)) =>
      assert(c == raw(wd) && nc == cont.getOrElse(wd, 0L), s"word $wd")
    }
  }

  test("parseWav: the JDK's own WAV reader agrees; chunk walk survives extras") {
    for (id <- Seq(0L, 1L, 2L, 3L, 17L)) {
      val bytes = Multimodal.synthWav(id, 500)
      val meta = Multimodal.parseWav(id, bytes)
      // independent validation: javax.sound's RIFF reader on the same bytes
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      assert(aff.getFormat.getSampleRate.toLong == meta.sample_rate, s"id $id")
      assert(aff.getFormat.getChannels.toLong == meta.channels)
      assert(aff.getFormat.getSampleSizeInBits.toLong == meta.bits_per_sample)
      assert(aff.getFrameLength.toLong == meta.n_samples)
      assert(meta.duration_us == meta.n_samples * 1000000L / meta.sample_rate)
    }
    // robustness: a LIST chunk with an ODD size spliced before data must
    // be skipped with its pad byte (the spec's word-alignment rule)
    val base = Multimodal.synthWav(7L, 100)
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "abcde".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = base.slice(0, 36) ++ junk ++ base.slice(36, base.length)
    // fix the RIFF size field
    val riffSz = spliced.length - 8
    (0 until 4).foreach(i => spliced(4 + i) = ((riffSz >> (8 * i)) & 0xff).toByte)
    assert(Multimodal.parseWav(7L, spliced) == Multimodal.parseWav(7L, base))
  }

  test("parseBmp: ImageIO agrees on dimensions and the full blue-channel sum") {
    for (id <- Seq(0L, 1L, 2L, 3L, 9L)) {
      val bytes = Multimodal.synthBmp(id)
      val meta = Multimodal.parseBmp(id, bytes)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO must accept our BMP (id $id)")
      assert(img.getWidth.toLong == meta.width && img.getHeight.toLong == meta.height)
      var sum = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        sum += (img.getRGB(x, y) & 0xff) // blue channel
      assert(sum == meta.sum_blue,
        s"blue sum: parser ${meta.sum_blue} vs ImageIO $sum (id $id)")
    }
  }

  test("multimodal decode plumbing: batch iterator, schema, determinism") {
    val out = Multimodal.decodeMeta(docs)
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "n_frames", "n_sampled_frames", "checksum"))
    val rows = out.collect()
    assert(rows.length == docs.count())
    // deterministic fake decode: n_bytes equals the text length (ASCII corpus)
    val lens = docs.select(col("doc_id"), length(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(m => m.n_bytes == lens(m.doc_id)))
    assert(rows.forall(m => m.n_frames == m.n_bytes / 64 + 1))
  }

  test("multimodal frame sampling: stride geometry, window sums, empty tail frame") {
    import spark.implicits._
    // 130 bytes → frames 0..2 (64, 64, 2 bytes); 128 bytes → frames 0..2
    // where frame 2 is the EMPTY tail (exact multiple); stride 4 keeps only
    // frame 0 of each at the default stride — use stride 2 to see the tail
    val docs2 = Seq(
      (1L, "a" * 130),
      (2L, "b" * 128)).toDF("doc_id", "text")
    val out = Multimodal.sampleFrames(docs2, frameBytes = 64, stride = 2)
      .collect().map(f => (f.doc_id, f.frame_idx) -> (f.n_bytes, f.checksum)).toMap
    assert(out((1L, 0)) == ((64, 64L * 'a' % 997)))
    assert(out((1L, 2)) == ((2, 2L * 'a' % 997)))
    assert(out((2L, 2)) == ((0, 0L)), "exact-multiple payload has an empty tail frame")
    assert(!out.contains((1L, 1)), "stride skips unsampled frames")
    // stride-4 default on the corpus: sampled count matches decodeMeta's
    val metaCounts = Multimodal.decodeMeta(docs).collect()
      .map(m => m.doc_id -> m.n_sampled_frames).toMap
    val sampled = Multimodal.sampleFrames(docs).collect()
      .groupBy(_.doc_id).view.mapValues(_.length).toMap
    assert(sampled == metaCounts,
      "sampleFrames emits exactly the frames decodeMeta counts")
  }

  test("dedup clusters: connected components of the near-dup pair graph") {
    val pairs = Dedup.jaccardPairs(docs, k = 3, tau = 0.5)
    val pairSet = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val comp = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every pair endpoint is labeled, and both ends share a component
    assert(pairSet.forall { case (a, b) => comp(a) == comp(b) })
    // cluster id is the component minimum (a member labels itself)
    assert(comp.forall { case (id, c) => c <= id && comp(c) == c })
    // transitivity witness: brute-force union-find agrees
    val uf = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = uf.getOrElse(x, x); if (p == x) x else { val r = find(p); uf(x) = r; r } }
    pairSet.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) uf(math.max(ra, rb)) = math.min(ra, rb)
    }
    assert(comp.forall { case (id, c) => find(id) == c })
  }

  test("shingle_array output survives input-buffer reuse (no aliasing)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.ShingleArray
    def strings(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    // normal path: text points into a larger shared buffer
    val buf = ("aa bb cc dd" + "      ").getBytes("UTF-8")
    val out = ShingleArray.compute(UTF8String.fromBytes(buf, 0, 11), 3)
    val before = strings(out)
    java.util.Arrays.fill(buf, 'z'.toByte) // simulate reader-buffer reuse
    assert(strings(out) == before)
    // <k-token fallback: text spans its entire backing array
    val buf2 = "ab cd".getBytes("UTF-8")
    val out2 = ShingleArray.compute(UTF8String.fromBytes(buf2, 0, 5), 3)
    assert(strings(out2) == Seq("ab cd"))
    java.util.Arrays.fill(buf2, 'z'.toByte)
    assert(strings(out2) == Seq("ab cd"))
  }

  test("dedupAuto: healthy corpus routes to exact PPJoin, degenerate to LSH") {
    import spark.implicits._
    // healthy: the real corpus — candidate volume is O(n) (ScaleProbe's
    // linear regime), well inside the linear budget
    val pfH = Dedup.jaccardPreflight(docs).head()
    val routeH = Dedup.chooseJaccardRoute(
      pfH.getAs[Long]("n_docs"), pfH.getAs[Long]("candidate_volume"))
    assert(routeH == Dedup.ExactPpjoinRoute,
      s"healthy corpus must route exact: $pfH")
    // degenerate: collapsed shingle space (every doc shares nearly all
    // shingles — the ScaleProbe skew regime) blows the candidate budget
    val base = (0 until 200).map(i => (i.toLong,
      s"alpha beta gamma delta epsilon zeta eta theta iota kappa v$i"))
      .toDF("doc_id", "text")
    val pfD = Dedup.jaccardPreflight(base).head()
    val routeD = Dedup.chooseJaccardRoute(
      pfD.getAs[Long]("n_docs"), pfD.getAs[Long]("candidate_volume"))
    assert(routeD == Dedup.BandedMinhashRoute,
      s"collapsed corpus must route to LSH: $pfD")
    // thresholds are Tuning-derived (linear in n), not constants: the same
    // candidate volume that damns 200 docs is fine for a corpus 100× larger
    assert(Dedup.chooseJaccardRoute(20000L,
      pfD.getAs[Long]("candidate_volume")) == Dedup.ExactPpjoinRoute)
    // both routes return the same schema and exact-verified pairs
    val autoH = Dedup.dedupAuto(docs).columns.toSeq
    val autoD = Dedup.dedupAuto(base)
    assert(autoH == Seq("id_a", "id_b", "jac"))
    assert(autoD.columns.toSeq == Seq("id_a", "id_b", "jac"))
    // on the degenerate corpus the LSH route must agree with minhashLsh
    // run with the same Tuning-suggested band count
    val expD = Dedup.minhashLsh(base, k = 3, numHashes = 64,
        bands = Tuning.suggestMinhashBands(64, 0.5), tau = 0.5)
      .select("id_a", "id_b", "jac").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotD = autoD.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotD == expD)
  }

  test("softDedup: 1/n_copies weights, row parity, unit mass per content") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha beta"),
      (4L, "gamma"), (5L, "delta"), (6L, "delta")).toDF("doc_id", "text")
    val got = Dedup.softDedup(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.size == 6, "row parity: every copy is kept")
    assert(Seq(1L, 2L, 3L).forall(got(_) == (3L, 1.0 / 3)))
    assert(got(4L) == (1L, 1.0))
    assert(Seq(5L, 6L).forall(got(_) == (2L, 0.5)))
    // each distinct content contributes exactly one document of total mass
    val mass = got.values.groupBy(_._1).map { case (_, g) => g.map(_._2).sum }
    assert(mass.forall(m => math.abs(m - math.round(m)) < 1e-12))
    // real corpus: weights in (0, 1], n_copies >= 1, rows preserved
    val corpus = Dedup.softDedup(docs)
    assert(corpus.count() == docs.count())
    assert(corpus.where(col("weight") <= 0 || col("weight") > 1 ||
      col("n_copies") < 1).isEmpty)
  }

  test("corpusStats: per-(source, lang) accounting matches a plain-Scala fold") {
    val got = TextAnalysis.corpusStats(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val exp = docs.select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, g) =>
        val toks = g.map(_._3.split(" ", -1).length.toLong).sum
        val chars = g.map(_._3.length.toLong).sum
        k -> (g.length.toLong, toks, chars, toks.toDouble / g.length)
      }
    assert(got == exp)
  }

  test("bloomNewDocs: bloom-then-verify equals the plain content anti-join") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    val bloom = Dedup.buildContentBloom(corpus, fpp = 0.01)
    val got = Dedup.bloomNewDocs(bloom, corpus, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exp = batch.join(corpus.select("text").distinct(), Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == exp && got.nonEmpty)
    // no false negatives: every true dup probes bloom-positive …
    val dups = batch.join(corpus.select("text").distinct(), Seq("text"), "left_semi")
    assert(dups.where(!vectors.bloomMightContain(bloom, xxhash64(col("text"))))
      .count() == 0)
    // … and the filter actually prunes: some batch rows bypass the verify
    // join entirely via the narrow definitely-new path
    assert(batch.where(!vectors.bloomMightContain(bloom, xxhash64(col("text"))))
      .count() > 0)
  }

  test("multimodal feature-extract and resize stages") {
    val feats = Multimodal.extractFeatures(docs).collect()
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(_.features.forall(v => v >= 0f && v < 1f)))
    // deterministic: same doc → same vector
    val again = Multimodal.extractFeatures(docs).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.doc_id) == f.features.toSeq))
    // resize truncates/pads to the target byte budget
    val r = Multimodal.resizeStub(MediaRecord(1L, Array.fill(500)(7.toByte)), 64, 64)
    assert(r.media.length == 64 * 64 / 64)
  }
  test("IVF-PQ refine: exact rerank of the ADC shortlist, subset and order") {
    val queries = emb.where(col("vec_id") < 10)
    val short = Similarity.annIvfPq(emb, queries, k = 20)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Similarity.annIvfPqRefined(emb, queries, k = 5, kShort = 20)
      .select("query_id", "neighbor_id", "rank", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3)))
    assert(refined.forall(t => short.contains((t._1, t._2))),
      "every refined neighbor must come from the ADC shortlist")
    // the rerank must equal an in-JVM exact cosine over the shortlist
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = short.groupBy(_._1).flatMap { case (q, ps) =>
      ps.toSeq.map { case (_, n) => (n, cos(vecs(q), vecs(n))) }
        .sortBy { case (n, s) => (-s, n) }.take(5).zipWithIndex
        .map { case ((n, s), i) => (q, n, (i + 1).toLong) }
    }.toSet
    assert(refined.map(t => (t._1, t._2, t._3)).toSet == expect,
      "refined ranking must equal the exact-cosine rerank of the shortlist")
  }
  test("winnowing: JVM reference equality, shared-run guarantee, tie rule") {
    import spark.implicits._
    import java.security.MessageDigest
    def h64(s: String): Long = {
      val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def reference(text: String, k: Int = 3, w: Int = 4): Set[(Long, Long)] = {
      val wds = text.split(" ", -1)
      if (wds.length < k) return Set.empty
      val hs = wds.sliding(k).map(_.mkString(" ")).map(h64).toArray
      if (hs.length < w) return Set.empty
      val keys = hs.zipWithIndex.map { case (h, p) => h * 1048576L - p }
      (0 to hs.length - w).map { i =>
        val p = (i until i + w).minBy(keys)
        (p.toLong, hs(p))
      }.toSet
    }
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again today",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      // doc 3 shares a 6-token (= w+k-1) run with doc 1 in a new context
      3L -> "totally different prefix jumps over the lazy dog again suffix here now")
    val df = texts.toDF("doc_id", "text")
    val got = TextAnalysis.winnow(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    for ((id, t) <- texts)
      assert(got.getOrElse(id, Set.empty) == reference(t),
        s"doc $id diverges from the reference implementation")
    // the guarantee: a shared run of >= w+k-1 tokens yields a shared print
    val shared = got(1L).map(_._2) & got(3L).map(_._2)
    assert(shared.nonEmpty, "w+k-1 shared run must share a fingerprint")
    // density: fingerprints per gram stays well under 1 (expected 2/(w+1))
    val grams1 = texts.head._2.split(" ").length - 2
    assert(got(1L).size < grams1, "winnowing must select a strict subset")
    // rightmost tie: a doc of one repeated word has equal hashes everywhere;
    // each window must pick its RIGHTMOST position = i+w-1
    val rep = Seq(9L -> Seq.fill(10)("w").mkString(" ")).toDF("doc_id", "text")
    val reps = TextAnalysis.winnow(rep).collect().map(_.getLong(1)).sorted
    // grams m=8, windows i=0..4 pick pos i+3 -> {3,4,5,6,7}
    assert(reps.toSeq == Seq(3L, 4L, 5L, 6L, 7L), s"tie rule broke: ${reps.toSeq}")
  }
  test("winnowPairs: edit-robust candidate recall, capped hot prints, no cartesian") {
    import spark.implicits._
    val run = "jumps over the lazy dog again and again near the river bank"
    val df = Seq(
      (1L, s"aaa bbb ccc $run ddd eee fff"),
      // the SAME run at a totally different offset, different context
      (2L, s"zzz yyy $run xxx www vvv uuu ttt sss"),
      (3L, "unrelated words entirely separate content nothing shared here at all"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(df)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "a long shared run at misaligned offsets must pair (the subdoc-chunk blind spot)")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "no spurious pair")
    // boilerplate prints shared by EVERYTHING are capped out of the join
    val boiler = (1L to 30L).map(i => (i, s"common shared boilerplate line one two three unique$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowPairs(boiler, maxFpFreq = 5)
    assert(capped.count() == 0, "above-cap fingerprints must not generate pairs")
    // plan: inverted-index joins only
    val p = Dedup.winnowPairs(df).queryExecution.executedPlan
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
  }
  test("embeddingOutliers: injected corrupt vector surfaces; fraction bounded") {
    import spark.implicits._
    // the clustered-corpus layout (outlier-detection needs a manifold to
    // be outside of; on an isotropic random corpus every vector is equally
    // far from every centroid and the 1% tail is just noise): 8 tight
    // clusters, plus one junk vector aligned with NO cluster axis
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 60) yield {
      val id = (c * 60 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d == c * 2) 10f else 0f
        center + (((id * 31 + d * 17) % 7).toInt - 3) * 0.1f
      }
      (id, v.toSeq)
    }
    val junk = Array.tabulate(dim)(d => if (d % 2 == 1) 7f else -7f).toSeq
    val polluted = (rows :+ (99999L, junk)).toDF("vec_id", "embedding")
    val out = Similarity.embeddingOutliers(polluted, frac = 0.01, nCells = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.exists(_._1 == 99999L), s"the corrupt vector must be flagged: ${out.toSeq}")
    val n = rows.size + 1
    assert(out.length <= math.ceil(n * 0.02), s"${out.length} outliers of $n rows")
    out.foreach { case (_, c) => assert(c >= 0.0 && c <= 2.0) }
  }
  test("winnowing fuzz: 60 random corpora equal the JVM reference") {
    import spark.implicits._
    import java.security.MessageDigest
    def h64(s: String): Long = {
      val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def reference(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val wds = text.split(" ", -1)
      if (wds.length < k) return Set.empty
      val hs = wds.sliding(k).map(_.mkString(" ")).map(h64).toArray
      if (hs.length < w) return Set.empty
      val keys = hs.zipWithIndex.map { case (h, p) => h * 1048576L - p }
      (0 to hs.length - w).map { i =>
        val p = (i until i + w).minBy(keys)
        (p.toLong, hs(p))
      }.toSet
    }
    val rnd = new scala.util.Random(1234)
    // small vocab → repeated grams → the tie rule actually fires
    val vocabs = Seq(Seq("a", "b"), Seq("x", "y", "z"), (1 to 30).map(i => s"w$i"))
    val docs = (1 to 60).map { id =>
      val v = vocabs(id % vocabs.size)
      val n = rnd.nextInt(40)
      (id.toLong, (0 until n).map(_ => v(rnd.nextInt(v.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysis.winnow(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == reference(t, 3, 4),
        s"winnow fuzz diverged on doc $id: '$t'")
    }
  }

  test("spanCorruption fuzz: 40 random docs equal a JVM closed-form reference") {
    import spark.implicits._
    def hashU64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def reference(id: Long, text: String): Seq[(Long, Long, Long, String)] = {
      val w = text.split(" ", -1)
      val starts = (0 until w.length).filter(i =>
        hashU64(s"$id:ss:$i") < Sft.SpanStartThresh)
      starts.zipWithIndex.map { case (s, j) =>
        val nxt = if (j + 1 < starts.length) starts(j + 1) else w.length
        val len = 1L + hashU64(s"$id:sl:$s") % (2L * Sft.SpanMeanLen - 1)
        val e = math.min(math.min(s + len, nxt.toLong), w.length.toLong)
        (j.toLong, s.toLong, e, w.slice(s, e.toInt).mkString(" "))
      }
    }
    val rnd = new scala.util.Random(99)
    val docs = (1 to 40).map { id =>
      (id.toLong, (0 until rnd.nextInt(300)).map(i => s"v${rnd.nextInt(50)}").mkString(" "))
    }
    val got = Sft.spanCorruption(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    docs.foreach { case (id, t) =>
      assert(got.getOrElse(id, Nil) == reference(id, t),
        s"span fuzz diverged on doc $id")
    }
  }
  test("tsTopK: dense brute-force differential; identical series at distance 0") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // users 0 and 7 have IDENTICAL activity patterns; others vary
    val rows = (for {
      u <- 0L to 7L
      h <- 0 until 12
      n <- 0 until (if (u == 0L || u == 7L) (h % 3) + 1 else ((h + u.toInt) % 3) + 1)
    } yield (u, t(h * 3600L + n))).toDF("user_id", "ts")
    val got = TimeSeries.tsTopK(rows, "user_id", "ts", queryIds = Seq(0L), k = 7)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // JVM dense reference
    val counts = (0L to 7L).map { u =>
      u -> (0 until 12).map(h =>
        if (u == 0L || u == 7L) (h % 3) + 1 else ((h + u.toInt) % 3) + 1).toArray
    }.toMap
    val ref = (1L to 7L).map { v =>
      val d = counts(0L).zip(counts(v)).map { case (a, b) => (a - b).toLong * (a - b) }.sum
      (v, d)
    }.sortBy { case (v, d) => (d, v) }.zipWithIndex
      .map { case ((v, d), i) => (v, (i + 1).toLong, d) }
    assert(got.sortBy(_._2).toSeq == ref, s"got ${got.toSeq} vs $ref")
    assert(got.find(_._1 == 7L).exists(_._3 == 0L), "identical series must be at d2 = 0")
  }
  test("funnel: ordered-subsequence semantics on constructed paths") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val ev = Seq(
      // u1 full path in order; u2 click BEFORE view (only view counts);
      // u3 view only; u4 purchase first then full path later (all three)
      (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"),
      (2L, t(1), "click"), (2L, t(2), "view"),
      (3L, t(1), "view"),
      (4L, t(1), "purchase"), (4L, t(2), "view"), (4L, t(3), "click"), (4L, t(4), "purchase"),
      (5L, t(1), "error")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // view: u1 u2 u3 u4; click-after-view: u1 u4; full: u1 u4
    assert(got == Map("view" -> 4L, "click" -> 2L, "purchase" -> 2L), s"$got")
  }

  test("retention: cohort grid on constructed activity") {
    import spark.implicits._
    def d(day: Long) = new java.sql.Timestamp(1700000000000L + day * 86400000L)
    val ev = Seq(
      (1L, d(0)), (1L, d(1)), (1L, d(3)),   // cohort 0, offsets 0,1,3
      (2L, d(0)),                            // cohort 0, offset 0 only
      (3L, d(1)), (3L, d(2))                 // cohort 1, offsets 0,1
    ).toDF("user_id", "ts")
    val base = 1700000000000L / 86400000L   // epoch-day of t0
    val got = Behavior.retention(ev, grainSeconds = 24 * 3600)
      .collect().map(r => (r.getLong(0) - base, r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)),
      s"$got")
  }

  test("annAuto: small corpus routes exact, large routes IVF with suggested geometry") {
    val emb = SparkEntry.table(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // below the threshold: identical to brute force (it IS brute force)
    assert(rows(Similarity.annAuto(emb, queries, k = 5)) ==
      rows(Similarity.annTopK(emb, queries, k = 5)))
    // forced over the threshold: identical to annIvf at Tuning's geometry
    val n = emb.count()
    val p = Tuning.suggestIvf(n)
    assert(rows(Similarity.annAuto(emb, queries, k = 5, exactMax = 0L)) ==
      rows(Similarity.annIvf(emb, queries, k = 5, nCells = p.nCells, nProbe = p.nProbe)))
  }

  test("poolEmbeddings: ordered-fold mean equals JVM recompute bit-for-bit") {
    val emb = SparkEntry.table(spark, dir, "embeddings")
    val got = Similarity.poolEmbeddings(emb, pmod(col("vec_id"), lit(100L))).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val want = rows.groupBy(_._1 % 100).flatMap { case (g, ms) =>
      val sorted = ms.sortBy(_._1)
      val dims = sorted.head._2.length
      (0 until dims).map { d =>
        var acc = 0.0
        sorted.foreach { case (_, v) => acc = acc + v(d).toDouble }
        (g, d.toLong) -> (acc / sorted.length.toDouble)
      }
    }.toMap
    assert(got == want, "pooled means must be bit-identical to the ordered JVM fold")
    // deterministic across physical layouts (the fold order is logical)
    val again = Similarity.poolEmbeddings(emb.repartition(17),
      pmod(col("vec_id"), lit(100L))).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(again == got)
  }

  test("mrlRecall: full-dim slice is recall 1; a prefix sign-flip is caught") {
    val emb = SparkEntry.table(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") < 5)
    // slicing to the FULL dimension is the exact query — recall must be 1
    val full = Similarity.mrlRecall(emb, q, k = 5, dims = Seq(64)).collect()
    assert(full.length == 5 && full.forall(_.getDouble(3) == 1.0))
    // hand-built: the full-space neighbor has a NEGATIVE first coordinate,
    // so 1-dim truncation ranks the other candidate first (recall@1 = 0)
    // while 2-dim truncation is the full space (recall@1 = 1)
    import spark.implicits._
    val toy = Seq(
      (0L, Seq(1.0f, 1.0f)),    // the query
      (1L, Seq(-0.1f, 5.0f)),   // full-space top-1
      (2L, Seq(1.0f, -0.5f))    // 1-dim-prefix top-1
    ).toDF("vec_id", "embedding")
    val got = Similarity.mrlRecall(toy, toy.where(col("vec_id") === 0), k = 1,
        dims = Seq(1, 2)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 1.0), s"got $got")
  }

  test("embeddingDrift: identical slices are exactly zero-shift; direction shows in cos") {
    val emb = SparkEntry.table(spark, dir, "embeddings")
    // same slice on both sides: means are the SAME ordered fold, so every
    // abs_shift is exactly 0.0 and the centroid cosine is ~1
    val same = Similarity.embeddingDrift(emb, emb).collect()
    assert(same.length == 64)
    assert(same.forall(_.getDouble(3) == 0.0), "identical slices must be bit-zero shift")
    val sum = Similarity.embeddingDriftSummary(emb, emb).head()
    assert(math.abs(sum.getDouble(0) - 1.0) < 1e-12)
    assert(sum.getDouble(1) == sum.getDouble(2), "identical slices share a norm")
    // a hand-built rotation: ref along dim0, cur along dim1 → cos 0
    import spark.implicits._
    def mk(v: Seq[Float], ids: Seq[Long]) =
      ids.map(i => (i, v)).toDF("vec_id", "embedding")
    val refd = mk(Seq(1.0f, 0.0f), Seq(0L, 2L))
    val curd = mk(Seq(0.0f, 1.0f), Seq(1L, 3L))
    val s = Similarity.embeddingDriftSummary(refd, curd).head()
    assert(s.getDouble(0) == 0.0 && s.getDouble(1) == 1.0 && s.getDouble(2) == 1.0)
    val perDim = Similarity.embeddingDrift(refd, curd).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(perDim(0L) == ((1.0, 0.0, 1.0)) && perDim(1L) == ((0.0, 1.0, 1.0)))
  }

  test("jlProject: JVM fold bit-equality; partition-invariant; distances roughly survive") {
    val emb = SparkEntry.table(spark, dir, "embeddings")
    val outDim = 16
    def signOf(i: Int, j: Int): Double =
      1.0 - 2.0 * (((i.toLong * 1103515245L + j.toLong * 12345L + 6789L) / 65536L) % 2L)
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val want = raw.map { case (id, v) =>
      id -> (0 until outDim).map { j =>
        var acc = 0.0
        v.indices.foreach(i => acc = acc + v(i).toDouble * signOf(i, j))
        acc / math.sqrt(outDim.toDouble)
      }.toArray
    }.toMap
    val got = Similarity.jlProject(emb, outDim).select("vec_id", "jl").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, v) =>
      assert(v.toSeq == want(id).toSeq, s"vec $id must be bit-identical") }
    val again = Similarity.jlProject(emb.repartition(13), outDim)
      .select("vec_id", "jl").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(again.forall { case (id, v) => v.toSeq == got(id).toSeq })
    // JL property (sanity, not proof): on sampled pairs the projected
    // distance is within a loose band of the original
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = raw.map(_._1).sorted.take(20)
    val rawMap = raw.toMap
    val origD = ids.combinations(2).map(p =>
      d2(rawMap(p(0)).map(_.toDouble), rawMap(p(1)).map(_.toDouble))).toSeq
    val projD = ids.combinations(2).map(p => d2(got(p(0)), got(p(1)))).toSeq
    val ratios = origD.zip(projD).filter(_._1 > 0).map { case (o, p) => p / o }
    // 16 dims from 64 is a coarse ε — the band is wide on purpose; the
    // guard is against a BROKEN projection (collapsed or exploded), not a
    // tight JL bound
    assert(ratios.count(r => r > 0.15 && r < 6.0) >= (ratios.size * 0.8).toInt,
      s"projected distances collapsed: ${ratios.take(10)}")
  }

  test("kfoldAssign: a group never straddles folds; folds roughly balanced") {
    val events = SparkEntry.table(spark, dir, "events")
    val rows = Curation.kfoldAssign(events, col("user_id"), k = 5)
      .select("user_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byUser = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byUser.values.forall(_.size == 1),
      "every row of a user must share the user's fold")
    val foldSizes = byUser.values.map(_.head).groupBy(identity).view.mapValues(_.size)
    assert(foldSizes.keySet.subsetOf((0L until 5L).toSet))
    assert(foldSizes.size >= 4, s"folds implausibly concentrated: $foldSizes")
  }

  test("kAnonymityAudit: flags exactly the sub-k combinations") {
    import spark.implicits._
    val df = (Seq.fill(5)(("en", "a")) ++ Seq.fill(2)(("en", "b")) ++
      Seq(("fr", "a"))).zipWithIndex
      .map { case ((l, src), i) => (i.toLong, l, src) }
      .toDF("id", "lang", "source")
    val got = Versioning.kAnonymityAudit(df, Seq(col("lang"), col("source")), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("en", "b", 2L), ("fr", "a", 1L)))
  }

  test("temporalSplit: embargo rows dropped, no test row at or before the boundary") {
    val events = SparkEntry.table(spark, dir, "events")
    val boundary = 1705881600000000L
    val out = Curation.temporalSplit(events, "ts", boundary, 86400L)
      .select(col("event_id"), col("split"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (_, split, us) =>
      if (split == "train") assert(us <= boundary - 86400000000L)
      else { assert(split == "test"); assert(us > boundary) }
    }
    // the gap is really excised: total = train + test + dropped, dropped > 0
    val total = events.count()
    val gap = total - out.length
    assert(gap > 0, "the sf0.001 event log spans the embargo window")
    assert(out.exists(_._2 == "train") && out.exists(_._2 == "test"))
  }

  test("contractReport: one scan, NULL counts as violation; fkOrphans exact") {
    import spark.implicits._
    val t = Seq((1L, Some(5)), (2L, Some(-1)), (3L, None), (4L, Some(50)))
      .toDF("id", "v")
    val rep = Contract.contractReport(t, Seq(
      "v_not_null" -> col("v").isNotNull,
      "v_positive" -> (col("v") > 0),
      "v_le_10" -> (col("v") <= 10)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // NULL predicate results are violations: v_positive fails for -1 AND null
    assert(rep("v_not_null") == (4L, 1L))
    assert(rep("v_positive") == (4L, 2L))
    assert(rep("v_le_10") == (4L, 2L)) // 50 and NULL
    // the whole report is ONE job over one scan (plan has one aggregate
    // subtree — no per-rule scan)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val scans = Contract.contractReport(t, Seq("a" -> col("v").isNotNull,
          "b" -> (col("v") > 0)))
        .queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.LocalTableScanExec => s
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
      assert(scans.size == 1, s"expected one input scan for all rules")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)

    val child = Seq((10L, 1L), (11L, 2L), (12L, 99L)).toDF("ck", "fk")
    val parent = Seq((1L, "a"), (2L, "b")).toDF("pk", "x")
    val orphans = Contract.fkOrphans(child, parent, "fk", "pk")
      .collect().map(_.getAs[Long]("ck")).toSet
    assert(orphans == Set(12L))
  }

  test("absorbContractBatch: cumulative streaming report == one-shot; replay safe") {
    val li = SparkEntry.table(spark, dir, "lineitem")
    val rules = Seq(
      "qty_positive" -> (col("l_quantity") > 0),
      "qty_le_30" -> (col("l_quantity") <= 30))
    val stateDir = java.nio.file.Files.createTempDirectory("contractstate").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    Contract.absorbContractBatch(spark, stateDir, 0L,
      li.where(col("l_orderkey") % 2 === 0), rules)
    val streamed = rows(Contract.absorbContractBatch(spark, stateDir, 1L,
      li.where(col("l_orderkey") % 2 === 1), rules))
    val full = rows(Contract.contractReport(li, rules)
      .select("rule", "n_rows", "n_violations"))
    assert(streamed == full)
    val replayed = rows(Contract.absorbContractBatch(spark, stateDir, 1L,
      li.where(col("l_orderkey") % 2 === 1), rules))
    assert(replayed == full, "replay must not double-count")
  }

  test("imagePhashPairs: planted twins recalled, banding guarantee, JVM hash equality") {
    import spark.implicits._
    val docs = SparkEntry.table(spark, dir, "documents")
    val twins = docs.where(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(substring(col("text"), 1, 9), lit("z"),
          substring(col("text"), 11, 1000000)).as("text"))
    val media = docs.select("doc_id", "text").unionByName(twins)
    val got = Multimodal.imagePhashPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTwins = twins.count()
    // every planted twin pairs with its original; nothing else qualifies
    assert(got.length == nTwins, s"expected $nTwins twin pairs, got ${got.length}")
    got.foreach { case (a, b, h) =>
      assert(b == a + 1000000L, s"unexpected pair ($a, $b)")
      assert(h <= 3L)
    }
    // engine hashes equal an independent JVM aHash
    def refHash(t: String): Long = {
      val by = t.getBytes("UTF-8"); val n = by.length
      val sums = new Array[Long](63); val lens = new Array[Long](63)
      by.indices.foreach { i =>
        val b = (i.toLong * 63 / n).toInt
        sums(b) += (by(i) & 0xff); lens(b) += 1
      }
      val total = sums.sum
      (0 until 63).foldLeft(0L)((h, b) =>
        if (lens(b) > 0 && sums(b) * n > total * lens(b)) h | (1L << b) else h)
    }
    val engine = Multimodal.imageHashes(docs).collect()
      .map(m => m.doc_id -> m.phash).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) => assert(engine(id) == refHash(t), s"doc $id") }
    // pigeonhole recall: hamming <= 3 over 4 bands forces a shared band
    val h1 = refHash(texts.head._2)
    (0 until 3).foreach { i =>
      val h2 = h1 ^ (1L << (i * 20)) // 3 flipped bits across bands
      val shares = (0 until 4).exists(b => ((h1 >> (b * 16)) & 0xFFFF) == ((h2 >> (b * 16)) & 0xFFFF))
      assert(shares, "any <=3-bit corruption must leave one band intact")
    }
  }

  test("annIvfIndexed: equals inline annIvf; scan prunes to the probed cells") {
    val emb = SparkEntry.table(spark, dir, "embeddings")
    val seed = Similarity.centroidSeed(emb, 16)
    val root = java.nio.file.Files.createTempDirectory("ivfidx").toString
    try {
      Similarity.saveIvfIndex(emb, seed, s"$root/idx")
      val queries = emb.where(col("vec_id") < 10)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      val inline = rows(Similarity.annIvf(emb, queries, k = 5, nCells = 16,
        nProbe = 4, centroids = Some(seed)))
      val indexed = rows(Similarity.annIvfIndexed(spark, s"$root/idx", seed,
        queries, k = 5, nProbe = 4))
      assert(indexed == inline)
      // partition pruning on cell_id — the index must never be fully read
      import org.apache.spark.sql.execution.FileSourceScanExec
      val aqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val scans = Similarity.annIvfIndexed(spark, s"$root/idx", seed, queries,
            k = 5, nProbe = 4)
          .queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
          .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivfidx")))
        assert(scans.nonEmpty)
        scans.foreach { f =>
          assert(f.partitionFilters.exists(_.references.exists(_.name == "cell_id")),
            s"expected a cell_id partition filter on:\n$f")
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("semanticBoundaries: disjoint-topic joint scores 0, repeated topic 1; JVM differential") {
    import spark.implicits._
    // 16 tokens of topic A, 16 of topic A again (cos 1), 16 of topic B
    // (cos 0 at the joint) — the constructed topic shift
    val a = (1 to 16).map(i => s"alpha${i % 4}").mkString(" ")
    val b = (1 to 16).map(i => s"beta${i % 4}").mkString(" ")
    val doc = Seq((1L, s"$a $a $b")).toDF("doc_id", "text")
    val got = TextAnalysis.semanticBoundaries(doc).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
    assert(got.length == 2)
    assert(got(0) == (16L, 1.0, false), s"identical windows must score exactly 1: ${got(0)}")
    assert(got(1) == (32L, 0.0, true), s"disjoint windows must score exactly 0: ${got(1)}")
    // real-corpus differential vs a plain-Scala fold
    val docs = SparkEntry.table(spark, dir, "documents")
    val ref = docs.select("doc_id", "text").collect().flatMap { r =>
      val w = r.getString(1).split(" ")
      if (w.length <= 16) Nil
      else {
        val wins = w.grouped(16).toArray
        (0 until wins.length - 1).map { j =>
          val c1 = wins(j).groupBy(identity).view.mapValues(_.length.toLong).toMap
          val c2 = wins(j + 1).groupBy(identity).view.mapValues(_.length.toLong).toMap
          val dot = c1.keysIterator.map(k => c1(k) * c2.getOrElse(k, 0L)).sum
          val n1 = c1.values.map(v => v * v).sum
          val n2 = c2.values.map(v => v * v).sum
          val cos = if (n1 == 0 || n2 == 0) 0.0
            else dot.toDouble / (math.sqrt(n1.toDouble) * math.sqrt(n2.toDouble))
          (r.getLong(0), (j + 1) * 16L, cos)
        }
      }
    }.toSet
    val real = TextAnalysis.semanticBoundaries(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(real == ref)
  }

  test("cdcChunks: content-defined boundaries realign after a prefix shift") {
    import spark.implicits._
    val base = SparkEntry.table(spark, dir, "documents")
      .where(col("doc_id") === 1L).select("text").head().getString(0)
    // doc 2 = doc 1 with a 5-token prefix spliced in front
    val docs = Seq((1L, base), (2L, s"zz yy xx ww vv $base")).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val c1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val c2 = ch.filter(_._1 == 2L).map(_._2).toSet
    // boundaries are decided by gram content, so chunks after the first
    // boundary are IDENTICAL despite every token position shifting by 5
    val shared = c1 & c2
    assert(shared.size >= math.max(1, c1.size - 2),
      s"CDC must re-align after the shift: shared ${shared.size} of ${c1.size}")
    val pairs = Dedup.cdcPairs(docs, minShared = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 1 && pairs.head._1 == 1L && pairs.head._2 == 2L &&
      pairs.head._3 >= shared.count(_.split(" ").length >= 4) - 1,
      s"the shifted near-dup must surface as a CDC pair: ${pairs.toSeq}")
    // reconstruction: chunks concatenate back to the document, in order
    val ordered = Dedup.cdcChunks(docs).where(col("doc_id") === 2L)
      .orderBy("chunk_idx").collect().map(_.getString(4)).mkString(" ")
    assert(ordered == s"zz yy xx ww vv $base")
    // expected-length calibration: mean chunk length within 4x of target
    val lens = Dedup.cdcChunks(SparkEntry.table(spark, dir, "documents"))
      .agg(avg("n_tokens")).head().getDouble(0)
    assert(lens > 4.0 && lens < 64.0, s"mean chunk length $lens implausible for target 16")
  }

  test("dupRateByStratum: later copies charge the re-ingesting stratum") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "same text"), (2L, "srcB", "same text"),  // B re-ingests A's doc
      (3L, "srcB", "same text"),                             // and again
      (4L, "srcA", "unique a"), (5L, "srcB", "unique b")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.dupRateByStratum(docs, col("source")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("srcA") == (2L, 0L, 0.0), "the keeper's stratum is not charged")
    assert(got("srcB") == (3L, 2L, 2.0 / 3.0))
  }

  test("keepBest: cluster argmax by (score, -id), singleton pass-through") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L),   // cluster {1,2,3}: best = 2 (tie → lower id)
      (4L, 5L), (5L, 9L),                // cluster {4,5}: best = 5
      (6L, 7L)                           // singleton
    ).toDF("doc_id", "score").withColumn("text", lit("x"))
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.keepBest(docs, pairs, col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((2L, 1L, 30L), (5L, 4L, 9L), (6L, 6L, 7L)))
    // exactly one survivor per cluster + each singleton
    assert(got.map(_._2).size == 3)
  }

  test("editVerify: exact Levenshtein on candidates, threshold splits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown cat"),     // dist 3 to doc 1
      (3L, "a completely other text")  // far from both
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.editVerify(docs, pairs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 3L)))
    // threshold 0 keeps only identical texts
    assert(Dedup.editVerify(docs, pairs, maxDist = 0).count() == 0)
  }

  test("cooccurrence: brute-force window pairs with integer 12/d weights") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "b b")).toDF("doc_id", "text")
    // doc1 pairs (window 4): (a,b,d1) (a,a,d2) (a,c,d3) (a,b,d1) (b,c,d2) (a,c,d1)
    // doc2: (b,b,d1)
    val want = Map(
      ("a", "b") -> (2L, 24L),   // d=1 twice → 12+12
      ("a", "a") -> (1L, 6L),    // d=2 → 6
      ("a", "c") -> (2L, 16L),   // d=3 → 4, d=1 → 12
      ("b", "c") -> (1L, 6L),    // d=2 → 6
      ("b", "b") -> (1L, 12L))   // d=1 → 12
    val got = TextAnalysis.cooccurrence(docs, window = 4, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    // real corpus: engine equals a plain-Scala fold (window 4, minCount 5)
    val corpus = SparkEntry.table(spark, dir, "documents")
    val texts = corpus.select("text").collect().map(_.getString(0))
    val acc = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    for (t <- texts; w = t.split(" "); i <- w.indices; d <- 1 to math.min(4, w.length - 1 - i)) {
      val k = if (w(i) <= w(i + d)) (w(i), w(i + d)) else (w(i + d), w(i))
      val (c0, s0) = acc.getOrElse(k, (0L, 0L))
      acc(k) = (c0 + 1, s0 + 12L / d)
    }
    val ref = acc.filter(_._2._1 >= 5).toMap
    val real = TextAnalysis.cooccurrence(corpus, window = 4, minCount = 5L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(real == ref)
  }

  test("pagerank: JVM power-iteration reference; dangling mass conserved") {
    import spark.implicits._
    def ref(edges: Seq[(String, String, Double)], d: Double, iters: Int): Map[String, Double] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val n = nodes.size.toDouble
      val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      var r = nodes.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to iters) {
        val dang = nodes.filterNot(wout.contains).map(r).sum
        val c = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
        for ((s, t, w) <- edges) c(t) += (w / wout(s)) * r(s)
        r = nodes.map(id => id -> ((1 - d) / n + d * (c(id) + dang / n))).toMap
      }
      r
    }
    // hand graph with a dangling node D and weighted edges
    val hand = Seq(("a", "b", 2.0), ("b", "a", 1.0), ("c", "a", 1.0),
      ("a", "d", 1.0), ("c", "b", 3.0))
    val got = Behavior.pagerank(hand.toDF("src", "dst", "weight"), iters = 12).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = ref(hand, 0.85, 12)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"$k: $v vs ${want(k)}") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "rank mass must be conserved")
    // the real journey graph: transitions edges, same reference
    val tr = Behavior.transitions(SparkEntry.table(spark, dir, "events")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2).toDouble)).toSeq
    val got2 = Behavior.pagerank(tr.toDF("src", "dst", "weight"), iters = 8).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want2 = ref(tr, 0.85, 8)
    got2.foreach { case (k, v) => assert(math.abs(v - want2(k)) < 1e-10) }
  }

  test("appendPhraseIndex: incremental build answers identically to a full build") {
    val docs = SparkEntry.table(spark, dir, "documents")
    val root = java.nio.file.Files.createTempDirectory("phraseinc").toString
    try {
      Retrieval.buildPhraseIndex(docs.where(col("doc_id") % 2 === 0), s"$root/idx")
      Retrieval.appendPhraseIndex(docs.where(col("doc_id") % 2 === 1), s"$root/idx")
      val direct = Retrieval.phraseSearch(docs, Retrieval.GatePhrases).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val inc = Retrieval.phraseSearchIndexed(spark, s"$root/idx", Retrieval.GatePhrases)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(inc == direct)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("nextEventExamples: contexts are the k previous types in arrival order") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val ev = Seq(
      (1L, t(1), 10L, "a"), (1L, t(2), 11L, "b"), (1L, t(3), 12L, "c"),
      (1L, t(4), 13L, "d"),
      (2L, t(1), 20L, "x"), (2L, t(2), 21L, "y"), // too short for k=2 until 3rd
      (2L, t(3), 22L, "z")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.nextEventExamples(ev, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      (1L, 12L, "a b", "c"), (1L, 13L, "b c", "d"), (2L, 22L, "x y", "z")))
    // ties on ts resolve by event_id — swap arrival ids, context flips
    val tied = Seq(
      (3L, t(1), 31L, "p"), (3L, t(1), 30L, "q"), (3L, t(2), 32L, "r")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val ctx = Behavior.nextEventExamples(tied, k = 2).collect()
      .map(r => r.getString(2)).toSeq
    assert(ctx == Seq("q p"))
  }

  test("lateArrivals: per-key high-water mark, lateness threshold, in-order silence") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // u1: event 3 arrives (id order) with ts BEFORE the hwm set by id 2;
    // event 5 is late but within the allowed 60s; u2 strictly in order
    val ev = Seq(
      (1L, 1L, t(100)), (1L, 2L, t(500)), (1L, 3L, t(200)),
      (1L, 4L, t(600)), (1L, 5L, t(580)),
      (2L, 6L, t(100)), (2L, 7L, t(101))
    ).toDF("user_id", "event_id", "ts")
    val got = Sessionize.lateArrivals(ev, latenessSeconds = 60L).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((3L, 300000000L)))
    // zero allowed lateness surfaces every out-of-order event
    val all = Sessionize.lateArrivals(ev, latenessSeconds = 0L).collect()
      .map(_.getLong(1)).toSet
    assert(all == Set(3L, 5L))
    // a fully in-order stream reports nothing at any threshold
    assert(Sessionize.lateArrivals(ev.where(col("user_id") === 2L), 0L).count() == 0L)
  }

  test("absorbLateBatch: batched absorption == batch twin; replay exactly-once") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("latehwm").toString
    // the gate's injected-disorder stream at sf0.001, split into three
    // arrival-order (event_id) slices — the composition the streaming
    // wrapper performs
    val all = SparkEntry.table(spark, dir, "events").withColumn("ts",
      timestamp_micros(unix_micros(col("ts")) -
        when(col("event_id") % 97 === 0, 172800000000L).otherwise(0L)))
    val ids = all.select("event_id").collect().map(_.getLong(0)).sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val batches = Seq(
      all.where(col("event_id") <= cuts(0)),
      all.where(col("event_id") > cuts(0) && col("event_id") <= cuts(1)),
      all.where(col("event_id") > cuts(1)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = batches.zipWithIndex.map { case (b, i) =>
      rows(Sessionize.absorbLateBatch(spark, stateDir, i.toLong, b, 3600L))
    }
    val twin = rows(Sessionize.lateArrivals(all, 3600L))
    assert(streamed.reduce(_ ++ _) == twin,
      "the batched stream must find exactly the batch twin's late set")
    // cross-batch state matters: a constructed stream whose only late
    // event opens batch 2 — invisible without batch 1's persisted hwm
    val fresh = java.nio.file.Files.createTempDirectory("latehwm2").toString
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val cb1 = Seq((9L, 1L, t(10000))).toDF("user_id", "event_id", "ts")
    val cb2 = Seq((9L, 2L, t(100))).toDF("user_id", "event_id", "ts")
    assert(rows(Sessionize.absorbLateBatch(spark, fresh, 0L, cb1, 3600L)).isEmpty)
    assert(rows(Sessionize.absorbLateBatch(spark, fresh, 1L, cb2, 3600L)) ==
      Set((9L, 2L, 9900000000L)),
      "an early-in-batch event must be judged against the PREVIOUS batch's hwm")
    // replay of the last batch reproduces its output exactly (judged
    // against the batch-1 snapshot, not its own absorbed timestamps)
    val replayed = rows(Sessionize.absorbLateBatch(spark, stateDir, 2L, batches(2), 3600L))
    assert(replayed == streamed(2))
    // retention: exactly the two newest snapshots remain
    val dirs = new java.io.File(stateDir).listFiles.map(_.getName)
      .filter(_.startsWith("batch=")).sorted
    assert(dirs.toSeq == Seq("batch=1", "batch=2"))
  }

  test("parsePng: ImageIO agrees pixel-by-pixel; CRC corruption fails loudly") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 9L, 13L)) {
      val bytes = Multimodal.synthPng(id)
      val meta = Multimodal.parsePng(id, bytes)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO must accept our PNG (id $id)")
      assert(img.getWidth.toLong == meta.width && img.getHeight.toLong == meta.height)
      // pixel-by-pixel against the JDK's independent decoder: catches a bug
      // in ANY of the five filters (every row r uses filter r % 5)
      val raw = Multimodal.pngPixels(id, bytes)
      val w = meta.width.toInt
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert(((rgb >> 16) & 0xff) == (raw(o) & 0xff) &&
          ((rgb >> 8) & 0xff) == (raw(o + 1) & 0xff) &&
          (rgb & 0xff) == (raw(o + 2) & 0xff), s"pixel ($x,$y) id $id")
      }
      // channel sums consistent with the reconstruction
      var sr = 0L; var sa = 0L
      raw.indices.foreach { j =>
        sa += raw(j) & 0xff; if (j % 3 == 0) sr += raw(j) & 0xff
      }
      assert(sr == meta.sum_red && sa == meta.sum_all)
    }
    // a flipped payload byte must fail the CRC check, not decode garbage
    val b = Multimodal.synthPng(5L)
    val idatPayload = b.length - 12 - 20 // somewhere inside IDAT data
    b(idatPayload) = (b(idatPayload) ^ 0x40).toByte
    val ex = intercept[IllegalArgumentException](Multimodal.parsePng(5L, b))
    assert(ex.getMessage.contains("CRC"))
  }

  test("compactionPlan: sequential fill, per-partition bins, oversized files") {
    import spark.implicits._
    val files = Seq(
      ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L),  // 0,0,40+40=80<100→0? see rule
      ("a", 4L, 250L),                                  // oversized
      ("a", 5L, 10L),
      ("b", 1L, 100L), ("b", 2L, 1L)).toDF("src", "id", "n")
    val got = Layout.compactionPlan(files, col("src"), col("id"), col("n"), 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // exclusive cumsum // 100: a → 0,40,80,120,370; b → 0,100
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 0L,
      ("a", 4L) -> 1L, ("a", 5L) -> 3L, ("b", 1L) -> 0L, ("b", 2L) -> 1L))
  }

  test("cusum closed form == the textbook recursion; episode starts pinned") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // baseline ~100 with a sustained +80 shift in the middle third — the
    // drift regime CUSUM exists for (no single spike crosses a threshold)
    val rows = (0 until 600).map { i =>
      val base = 100L + rnd.nextInt(21) - 10
      val x = if (i % 200 >= 80 && i % 200 < 160) base + 80 else base
      (i.toLong % 3, i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), x)
    }
    val df = rows.toDF("user_id", "event_id", "ts", "c")
    val (slack, h) = (130L, 400L)
    val got = TimeSeries.cusum(df, "user_id", "ts", "event_id", col("c"), slack, h)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    // reference: the literal s_t = max(0, s_{t-1} + (x - slack)) recursion
    val want = rows.groupBy(_._1).flatMap { case (_, evs) =>
      var s = 0L; var prev = 0L
      evs.sortBy(e => (e._3.getTime, e._2)).flatMap { case (_, id, _, x) =>
        prev = s
        s = math.max(0L, s + x - slack)
        if (s > h) Some(id -> ((s, prev <= h))) else None
      }
    }.toMap
    assert(got == want, s"${got.size} flags vs reference ${want.size}")
    assert(got.nonEmpty && got.values.exists(_._2) && got.values.exists(!_._2),
      "fixture must produce both episode starts and continuations")
  }

  test("rollingSpike == JVM integer reference; constant-history semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      val cents = if (rnd.nextDouble() < 0.05) 5000L + rnd.nextInt(1000)
                  else 90L + rnd.nextInt(20)
      (i.toLong % 7, i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), cents)
    }
    val df = rows.toDF("user_id", "event_id", "ts", "c")
    val got = TimeSeries.rollingSpike(df, "user_id", "ts", "event_id", col("c"),
        n = 20, t = 3, minHistory = 8)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    // JVM reference: same (ts, id) order, same trailing-20 integer rule
    rows.groupBy(_._1).foreach { case (_, evs) =>
      val ord = evs.sortBy(e => (e._3.getTime, e._2))
      ord.zipWithIndex.foreach { case ((_, id, _, x), i) =>
        val h = ord.slice(math.max(0, i - 20), i).map(_._4)
        val m = h.size.toLong
        val s = h.sum
        val q = h.map(v => v * v).sum
        val num = (m * x - s) * (m * x - s)
        val den = m * q - s * s
        assert(got(id) == ((m, num, den, m >= 8 && num > 9 * den)), s"event $id")
      }
    }
    assert(got.values.count(_._4) > 0, "fixture must contain spikes")
    // constant history: ANY deviation flags, staying constant does not
    val const = (0 until 12).map(i =>
      (1L, i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        if (i == 10) 200L else 100L)).toDF("user_id", "event_id", "ts", "c")
    val gc = TimeSeries.rollingSpike(const, "user_id", "ts", "event_id", col("c"),
        n = 20, t = 3, minHistory = 8)
      .collect().map(r => r.getLong(1) -> r.getBoolean(7)).toMap
    assert(gc(10L) && !gc(9L) && !gc(11L))
  }

  test("survivalTable == JVM Kaplan-Meier reference; censoring + risk counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // per user a random stream of view/purchase/other; some users never
    // purchase after their first view (censored), some never view (excluded)
    val evs = (0 until 60).flatMap { u =>
      (0 until 1 + rnd.nextInt(12)).map { i =>
        val t = rnd.nextInt(1000000)
        val e = rnd.nextInt(6) match {
          case 0 => "view"; case 1 => "purchase"; case _ => "click"
        }
        (u.toLong, new java.sql.Timestamp(1700000000000L + t * 1000L), e)
      }
    }
    val df = evs.toDF("user_id", "ts", "event_type")
    val grain = 60L // 1-minute buckets
    val got = Behavior.survivalTable(df, "view", "purchase", grainSeconds = grain)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // JVM reference
    val durs = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val t0 = es.filter(_._3 == "view").map(_._2.getTime).sorted.headOption
      t0.map { s =>
        val tp = es.filter(e => e._3 == "purchase" && e._2.getTime >= s)
          .map(_._2.getTime).sorted.headOption
        val tend = es.map(_._2.getTime).max
        val durUs = (tp.getOrElse(tend) - s) * 1000L
        (durUs / (grain * 1000000L), tp.isDefined)
      }
    }
    assert(durs.exists(!_._2) && durs.exists(_._2),
      "fixture needs both observed and censored subjects")
    val want = durs.groupBy(_._1).map { case (t, xs) =>
      val risk = durs.count(_._1 >= t).toLong
      t -> ((risk, xs.count(_._2).toLong, xs.count(!_._2).toLong))
    }
    assert(got == want)
  }
}
