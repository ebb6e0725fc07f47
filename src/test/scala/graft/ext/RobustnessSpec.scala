package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.ProdSession

/** Malformed-input behavior of the pure-JVM media parsers and snapshot
  * maintenance: corrupt payloads on an executor must FAIL the task loudly
  * (feeding [[graft.engine.Quarantine]]'s dead-lettering), never hang it —
  * a wedged 100 TB stage is far more expensive than a retried record. */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark

  test("parseWav: corrupt chunk size throws instead of walking backwards") {
    val b = Multimodal.synthWav(3L, 200)
    // data chunk size field at offset 40 → u32 ~4 GiB: toInt would wrap
    // negative and loop `off` in place forever without the bound check
    b(40) = 0xf0.toByte; b(41) = 0xff.toByte; b(42) = 0xff.toByte; b(43) = 0xff.toByte
    val e = intercept[IllegalArgumentException](Multimodal.parseWav(3L, b))
    assert(e.getMessage.contains("corrupt chunk size"))
    // size that merely overruns the file (no sign wrap) also fails loudly
    val c = Multimodal.synthWav(3L, 200)
    c(40) = (c.length & 0xff).toByte // data len = file len >> remaining bytes
    c(41) = ((c.length >> 8) & 0xff).toByte
    intercept[IllegalArgumentException](Multimodal.parseWav(3L, c))
  }

  test("parsePng: IDAT stream shorter than the geometry claims throws") {
    val b = Multimodal.synthPng(4L)
    // grow IHDR's height (bytes 8+8+4..: big-endian at offset 20) so the
    // decoder expects more scanlines than the (valid, CRC-intact) DEFLATE
    // stream contains; recompute the IHDR CRC over type+data
    val h = ((b(20) & 0xff) << 24) | ((b(21) & 0xff) << 16) |
      ((b(22) & 0xff) << 8) | (b(23) & 0xff)
    val h2 = h + 7
    b(20) = ((h2 >> 24) & 0xff).toByte; b(21) = ((h2 >> 16) & 0xff).toByte
    b(22) = ((h2 >> 8) & 0xff).toByte; b(23) = (h2 & 0xff).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 4 + 13) // chunk type + IHDR payload
    val v = crc.getValue
    b(29) = ((v >> 24) & 0xff).toByte; b(30) = ((v >> 16) & 0xff).toByte
    b(31) = ((v >> 8) & 0xff).toByte; b(32) = (v & 0xff).toByte
    val e = intercept[IllegalArgumentException](Multimodal.parsePng(4L, b))
    assert(e.getMessage.contains("truncated IDAT"))
  }

  test("vacuum reaps stale orphaned .stage-* dirs, keeps fresh ones") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snaporphan").toString
    Snapshot.publish(Seq(1L, 2L).toDF("v"), root)
    val orphan = new java.io.File(root, ".stage-v=9-deadbeef")
    assert(orphan.mkdir())
    new java.io.FileOutputStream(new java.io.File(orphan, "part-0.parquet")).close()
    // default day-scale TTL: a freshly-crashed publisher's stage survives
    Snapshot.vacuum(spark, root)
    assert(orphan.exists(), "a fresh stage dir must not be reaped (could be live)")
    // past the TTL it is garbage and goes away (sleep so the dir's mtime
    // is strictly below the zero-TTL cutoff)
    Thread.sleep(20)
    Snapshot.vacuum(spark, root, stageTtlMs = 0L)
    assert(!orphan.exists(), "a stale orphaned stage dir must be reaped")
    assert(Snapshot.readCurrent(spark, root).count() == 2,
      "published data untouched by the stage reap")
  }

  test("source pattern ops: empty corpus and single-source edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(Hygiene.sourceNovelty(empty, col("source")).collect().isEmpty)
    assert(Hygiene.sourceOverlap(empty, col("source")).collect().isEmpty)
    // one source: every gram exclusive, no pairs
    val one = Seq((1L, "a b c d", "s"), (2L, "b c d e", "s"))
      .toDF("doc_id", "text", "source")
    val nov = Hygiene.sourceNovelty(one, col("source")).collect()
    assert(nov.length == 1)
    assert(nov.head.getLong(1) == nov.head.getLong(2), "all grams exclusive")
    assert(nov.head.getDouble(3) == 1.0)
    assert(Hygiene.sourceOverlap(one, col("source")).collect().isEmpty,
      "a single source has no pairs")
    // docs too short for a trigram contribute nothing but do not fail
    val short = Seq((1L, "a b", "s1"), (2L, "x y z", "s2"))
      .toDF("doc_id", "text", "source")
    val nv = Hygiene.sourceNovelty(short, col("source")).collect()
    assert(nv.map(_.getString(0)).toSet == Set("s2"))
  }

  test("icpOrder: empty and single-vector corpora") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val one = Seq((7L, Seq.fill(4)(1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.icpOrder(one, nCells = 4).collect()
    assert(out.length == 1 && out.head.getLong(0) == 7L && out.head.getLong(2) == 0L)
    // the default-arg path derives cells from the count — a 1-vector
    // corpus must not trip the suggestIvf "empty corpus" require
    assert(Similarity.icpOrder(one).collect().length == 1)
  }

  test("embeddingDrift: an empty side surfaces as NULL means, not a crash") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cur = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    // "no reference data yet" is a legitimate monitoring state: the
    // per-dim table keeps the cur means and reports ref as NULL
    val rows = Similarity.embeddingDrift(empty, cur).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.isNullAt(1) && !r.isNullAt(2) && r.isNullAt(3)))
    val s = Similarity.embeddingDriftSummary(empty, cur).head()
    assert(s.isNullAt(0), "centroid cosine vs nothing must be NULL")
  }

  test("chrfPP: null/empty sides score zero; both-null rows drop (the chrF rule)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pairs = Seq((1L, Some("abc def"), None: Option[String]),
      (2L, None: Option[String], None: Option[String]),
      (3L, Some(""), Some("abc"))).toDF("id", "c", "r")
    val got = Quality.chrfPP(pairs, col("id"), col("c"), col("r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> 0.0, 3L -> 0.0), s"got $got")
  }

  test("tokenFertility: empty-text docs count zero pretokens, not NULLs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "en", ""), (2L, "en", "hi")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.tokenFertility(docs, col("lang")).head()
    assert(r.getLong(1) == 2 && r.getLong(3) == 1 && r.getLong(4) == 2)
  }
}
