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

  test("stratifiedSample: deterministic, rate-faithful, drops unknown strata") {
    val rates = Map("en" -> 0.5, "zh" -> 0.0)
    val s1 = Hygiene.stratifiedSample(docs, col("lang"), rates)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val s2 = Hygiene.stratifiedSample(docs, col("lang"), rates)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "hash sampling must be run-to-run deterministic")
    // independent JVM-side recomputation of the keep set
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def u(id: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val expected = docs.select("doc_id", "lang").collect()
      .filter(r => rates.getOrElse(r.getString(1), 0.0) > u(r.getLong(0)))
      .map(_.getLong(0)).sorted
    assert(s1.sameElements(expected))
    assert(expected.nonEmpty, "en at 50% must keep something")
  }
}
