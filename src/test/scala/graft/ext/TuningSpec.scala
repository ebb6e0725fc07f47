package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** The corpus-size parameter suggestions ([[Tuning]]): formula-level pins
  * (the S-curve threshold, the √n geometry, the pair-budget cap) plus an
  * end-to-end check that suggested MinHash bands preserve recall on the
  * real documents corpus. */
class TuningSpec extends AnyFunSuite {

  test("minhash band suggestion tracks the target tau along the S-curve") {
    // 16 bands × 4 rows has threshold (1/16)^(1/4) = 0.5 exactly
    assert(math.abs(Tuning.minhashThreshold(16, 4) - 0.5) < 1e-12)
    assert(Tuning.suggestMinhashBands(64, 0.5) == 16)
    // a HIGHER tau wants FEWER bands (steeper, right-shifted curve):
    // 8 bands × 8 rows thresholds at 0.771 — nearest at-or-below 0.8
    assert(Tuning.suggestMinhashBands(64, 0.8) == 8)
    // a LOWER tau wants MORE bands: 32 × 2 thresholds at 0.177
    assert(Tuning.suggestMinhashBands(64, 0.3) == 32)
    // monotone: tau up → bands down (never up)
    val taus = Seq(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    val bands = taus.map(Tuning.suggestMinhashBands(64, _))
    assert(bands == bands.sorted.reverse, s"bands not monotone in tau: $bands")
    // the curve the suggestion promises: pairs well above tau collide with
    // high probability, pairs well below with low probability
    val b = Tuning.suggestMinhashBands(64, 0.5)
    assert(Tuning.minhashCollisionProb(0.7, b, 64 / b) > 0.95)
    assert(Tuning.minhashCollisionProb(0.2, b, 64 / b) < 0.05)
  }

  test("IVF geometry is O(sqrt(n)) on both axes, bounded at the extremes") {
    val p6 = Tuning.suggestIvf(1000000L)
    assert(p6.nCells == 1000 && p6.nProbe == 32)
    // 100 TB-scale corpus: still a one-task cell scan and a sub-percent probe fraction
    val p11 = Tuning.suggestIvf(100000000000L)
    assert(p11.nCells == 316228 && p11.nProbe == 562)
    assert(p11.nProbe.toDouble / p11.nCells < 0.002)
    // tiny corpora never degenerate to 0/1 cells
    assert(Tuning.suggestIvf(10L).nCells >= 4)
    // the cap holds
    assert(Tuning.suggestIvf(Long.MaxValue, maxCells = 1 << 20).nCells == (1 << 20))
  }

  test("hot-shingle cap comes from the per-shingle pair budget") {
    // df·(df−1)/2 ≤ budget at the returned cap, violated one above it
    for (budget <- Seq(1000L, 1000000L, 1000000000L)) {
      val cap = Tuning.suggestMaxDocFreq(budget).toLong
      assert(cap * (cap - 1) / 2 <= budget)
      assert((cap + 1) * cap / 2 > budget)
    }
  }

  test("sign-LSH bits hit the target bucket population, clamped") {
    assert(Tuning.suggestSignLshBits(100000000000L, 4096) == 25)
    assert(Tuning.suggestSignLshBits(100L, 4096) == 4)  // floor clamp
    assert(Tuning.suggestSignLshBits(Long.MaxValue, 1) == 48) // ceiling clamp
  }

  test("operator defaults are DERIVED from the formulas, not free constants (r15 item 5)") {
    // annLsh's default bits is the suggestSignLshBits solution at the
    // ~10^6-vector calibration corpus — the formula, not a magic 8
    assert(Tuning.LshDefaultBits == Tuning.suggestSignLshBits(1L << 20, 4096L))
    assert(Tuning.LshDefaultBits == 8)
    // 4 tables: the first multiplier where the miss curve flattens at the
    // calibration point cos 0.8 / 8 bits — P[miss] = (1-(1-θ/π)^bits)^T
    def missProb(tables: Int): Double = {
      val thetaOverPi = math.acos(0.8) / math.Pi
      math.pow(1.0 - math.pow(1.0 - thetaOverPi, Tuning.LshDefaultBits), tables)
    }
    assert(Tuning.LshDefaultTables == 4)
    assert(missProb(4) < 0.6 && missProb(4) < missProb(1) / 1.5,
      s"4 tables must materially cut the single-table miss (${missProb(1)} -> ${missProb(4)})")
    // the auto-router crossovers carried by the signatures
    assert(Tuning.AnnExactMax == 10_000L)
    assert(Tuning.BitextExactMaxProduct == 10_000_000L)
  }

  test("jaccard preflight separates a healthy corpus from a collapsed shingle space") {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    // healthy: diverse vocabulary — shingles mostly unique to a doc pair
    val healthy = (0 until 60).map(i =>
      (i.toLong, (0 until 12).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    // degenerate: every doc drawn from a 6-word pool — shingle space collapses
    val degen = (0 until 60).map(i =>
      (i.toLong, (0 until 12).map(j => s"w${(i + j) % 6}").mkString(" "))).toDF("doc_id", "text")
    def row(df: org.apache.spark.sql.DataFrame) = Dedup.jaccardPreflight(df).head()
    val h = row(healthy); val g = row(degen)
    val hVol = h.getAs[Long]("candidate_volume")
    val gVol = g.getAs[Long]("candidate_volume")
    // same doc count, same text lengths — but the collapsed space must show
    // an order-of-magnitude candidate-volume blowup and a hot max_df
    assert(h.getAs[Long]("n_docs") == 60 && g.getAs[Long]("n_docs") == 60)
    assert(h.getAs[Long]("distinct_shingles") > g.getAs[Long]("distinct_shingles") * 10)
    assert(gVol > hVol * 10, s"degenerate volume $gVol vs healthy $hVol")
    assert(g.getAs[Long]("max_df") > h.getAs[Long]("max_df") * 5)
  }

  test("repetition thresholds calibrate to the corpus' own distribution") {
    lazy val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val docs = SparkEntry.table(spark, "/root/testdata/sf0.001", "documents")
    val stats = Hygiene.repetitionStats(docs).cache()
    try {
      val t = Tuning.suggestRepetitionThresholds(stats, dropQuantile = 0.95)
      // thresholds sit inside each metric's observed range
      for ((thr, col0) <- Seq(t.maxDupWordFrac -> "dup_word_frac",
                              t.maxDup3GramFrac -> "dup_3gram_frac")) {
        val mm = stats.agg(min(col0), max(col0)).head()
        assert(thr >= mm.getDouble(0) && thr <= mm.getDouble(1), s"$col0 threshold $thr")
      }
      // and the calibrated gate keeps ~the target fraction (±5pp slack for
      // quantile ties on a 500-doc corpus)
      val kept = Hygiene.repetitionGate(docs, t.maxDupWordFrac, t.maxDup3GramFrac).count()
      val frac = kept.toDouble / docs.count()
      assert(frac >= 0.85 && frac <= 1.0, s"kept fraction $frac")
    } finally stats.unpersist()
  }

  test("suggested bands preserve recall on the real corpus at the gate tau") {
    lazy val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val docs = SparkEntry.table(spark, "/root/testdata/sf0.001", "documents")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.jaccardPairs(docs, tau = 0.5))
    val b = Tuning.suggestMinhashBands(64, 0.5)
    val lsh = pairs(Dedup.minhashLsh(docs, numHashes = 64, bands = b, tau = 0.5))
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"suggested-band recall $recall collapsed")
  }
}
