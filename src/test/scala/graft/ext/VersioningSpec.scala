package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Versioning.corpusDiff]]: the changelog semantics on a constructed
  * snapshot pair, and the scale property — the join carries (id, hash)
  * only, the text never reaches the exchange. */
class VersioningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.ProdSession.spark
  import spark.implicits._

  test("added / removed / changed / unchanged classify correctly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Versioning.corpusDiff(old, neu)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("diff plan: full-outer on 8-byte hashes — no text column above the scans") {
    val docs = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "documents")
    val p: SparkPlan = Versioning.corpusDiff(
      docs.where(col("doc_id") % 7 =!= 1), docs.where(col("doc_id") % 7 =!= 2))
      .queryExecution.executedPlan
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 2, s"expected one exchange per snapshot side:\n$p")
    // the text reduces to xxhash64 below the exchange: nothing wider than
    // (id, hash) crosses the wire
    shuffles.foreach { s =>
      val width = s.output.map(_.dataType.defaultSize).sum
      assert(width <= 16, s"exchange carries ${s.output} (width $width):\n$p")
      assert(!s.output.exists(_.name == "text"),
        s"text must be hashed below the exchange:\n$p")
    }
  }
  test("corpusChecksums: layout-invariant, localizes a single-doc change") {
    val docs = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "documents")
    def table(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Versioning.corpusChecksums(df, nBuckets = 16).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = table(docs)
    // XOR + deterministic buckets: any physical layout gives the same table
    assert(table(docs.repartition(13)) == base)
    // mutate ONE document: exactly its bucket's checksum changes, and no
    // bucket's count moves
    val mutId = docs.select("doc_id").head().getLong(0)
    val mutated = docs.withColumn("text",
      when(col("doc_id") === mutId, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val after = table(mutated)
    val changed = base.keySet.filter(b => base(b) != after(b))
    assert(changed == Set(((mutId % 16) + 16) % 16),
      s"only the mutated doc's bucket may change, got $changed")
    assert(base.view.mapValues(_._1).toMap == after.view.mapValues(_._1).toMap,
      "counts must be unchanged by a content mutation")
  }

  test("forget: erasure is complete and accounted; unknown keys audit as zero") {
    val events = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "events")
    val reqs = Versioning.GateForgetRequests
    val survivors = Versioning.forget(events, col("user_id"), reqs)
    // no requested key survives
    assert(survivors.where(col("user_id").isin(reqs: _*)).count() == 0)
    // conservation: removed + surviving == total
    val audit = Versioning.forgetAudit(events, col("user_id"), reqs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(survivors.count() + audit.values.sum == events.count())
    // the unknown key is in the audit with zero removals
    assert(audit(999999L) == 0L)
    assert(reqs.forall(audit.contains), "every request must be accounted")
  }

  test("absorbCardBatch: maintained card == full recompute; replay and crash safety") {
    val docs = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "documents")
    val stateDir = java.nio.file.Files.createTempDirectory("cardstate").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    Versioning.absorbCardBatch(spark, stateDir, 0L,
      docs.where(col("doc_id") % 3 === 0), col("source"))
    Versioning.absorbCardBatch(spark, stateDir, 1L,
      docs.where(col("doc_id") % 3 === 1), col("source"))
    val card = rows(Versioning.absorbCardBatch(spark, stateDir, 2L,
      docs.where(col("doc_id") % 3 === 2), col("source")))
    val full = rows(docs.groupBy(col("source").as("key"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens")))
    assert(card == full)
    // replaying the last batch must NOT double-count
    val replayed = rows(Versioning.absorbCardBatch(spark, stateDir, 2L,
      docs.where(col("doc_id") % 3 === 2), col("source")))
    assert(replayed == full)
    // an uncommitted snapshot dir (no _SUCCESS) is invisible to load
    val junk = new java.io.File(s"$stateDir/batch=99")
    junk.mkdirs()
    val after = rows(Versioning.absorbCardBatch(spark, stateDir, 3L,
      docs.limit(0), col("source")))
    assert(after == full, "a crash-partial snapshot must be ignored")
  }

  test("mergeUpsert: latest wins, deletes remove, untouched base persists") {
    import spark.implicits._
    val base = Seq((1L, -1L, 100L), (2L, -1L, 200L), (3L, -1L, 300L))
      .toDF("k", "eid", "cents")
    val changes = Seq(
      (1L, 10L, 111L, 5L, "u"),  // upsert over base
      (1L, 11L, 999L, 3L, "u"),  // older upsert — must lose
      (2L, 20L, 222L, 7L, "d"),  // delete key 2
      (4L, 40L, 444L, 9L, "u"))  // insert a new key
      .toDF("k", "eid", "cents", "ts", "op")
    val got = Versioning.mergeUpsert(base, changes, "k", "ts", "op",
        Seq("eid", "cents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((10L, 111L)), 3L -> ((-1L, 300L)), 4L -> ((40L, 444L))))
    // a later upsert resurrects a deleted key
    val resurrect = changes.unionByName(Seq((2L, 21L, 225L, 8L, "u"))
      .toDF("k", "eid", "cents", "ts", "op"))
    val got2 = Versioning.mergeUpsert(base, resurrect, "k", "ts", "op",
        Seq("eid", "cents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got2(2L) == ((21L, 225L)))
  }

  test("absorbMergeBatch: maintained == one-shot; tombstones beat late older upserts") {
    import spark.implicits._
    val base = Seq((1L, -1L, 100L), (2L, -1L, 200L)).toDF("k", "eid", "cents")
    val c1 = Seq((1L, 10L, 111L, 5L, "u"), (2L, 20L, 0L, 9L, "d"))
      .toDF("k", "eid", "cents", "ts", "op")
    // batch 2 carries a LATE change for key 2 that is OLDER than its
    // delete — the tombstone in state must win
    val c2 = Seq((2L, 21L, 222L, 7L, "u"), (3L, 30L, 333L, 4L, "u"))
      .toDF("k", "eid", "cents", "ts", "op")
    val stateDir = java.nio.file.Files.createTempDirectory("mergestate").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Versioning.absorbMergeBatch(spark, stateDir, 0L, base, c1,
      "k", "ts", "op", Seq("eid", "cents"))
    val maintained = rows(Versioning.absorbMergeBatch(spark, stateDir, 1L, base, c2,
      "k", "ts", "op", Seq("eid", "cents")))
    val oneShot = rows(Versioning.mergeUpsert(base, c1.unionByName(c2),
      "k", "ts", "op", Seq("eid", "cents")))
    assert(maintained == oneShot)
    assert(!maintained.contains(2L), "the newer delete must survive the late upsert")
    assert(maintained == Map(1L -> ((10L, 111L)), 3L -> ((30L, 333L))))
    // replay recomputes against the pre-batch snapshot
    val replayed = rows(Versioning.absorbMergeBatch(spark, stateDir, 1L, base, c2,
      "k", "ts", "op", Seq("eid", "cents")))
    assert(replayed == maintained)
  }

  test("scd2: validity ranges chain exactly; one open (current) row per key") {
    import spark.implicits._
    val changes = Seq(
      (1L, 10L, 100L, 5L), (1L, 11L, 110L, 7L), (1L, 12L, 120L, 9L),
      (2L, 20L, 200L, 6L))
      .toDF("k", "eid", "cents", "ts")
    val rows = Versioning.scd2(changes, "k", "ts", "eid", Seq("eid", "cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_._2).toSeq
      // each version closes exactly when the next opens; last stays open
      sorted.sliding(2).foreach { pair =>
        if (pair.size == 2) assert(pair(0)._4.contains(pair(1)._2), s"key $k chain")
      }
      assert(sorted.last._4.isEmpty, s"key $k must have one open row")
      assert(sorted.init.forall(_._4.isDefined))
    }
    assert(byKey(1L).size == 3 && byKey(2L).size == 1)
  }

  test("rollingFeatures: frame arithmetic equals the JVM sliding fold") {
    import spark.implicits._
    val n = 4
    val rnd = new scala.util.Random(11)
    val events = (1 to 200).map(i =>
      (i.toLong % 7, i.toLong, rnd.nextInt(100).toLong * 1000000L, rnd.nextInt(500).toLong))
      .toDF("user_id", "event_id", "ts_us0", "cents0")
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.timestamp_micros(col("ts_us0")).as("ts"),
        col("cents0"))
    val got = TimeSeries.rollingFeatures(events, "user_id", "ts", "event_id",
        col("cents0"), n = n).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(4), r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6)))))
      .toMap
    val want = events
      .withColumn("ts_us", org.apache.spark.sql.functions.unix_micros(col("ts")))
      .select("user_id", "event_id", "cents0", "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, vs) =>
        val sorted = vs.toSeq.sortBy(v => (v._3, v._2))
        sorted.zipWithIndex.map { case ((u, eid, ts, cents), i) =>
          val frame = sorted.slice(math.max(0, i - n + 1), i + 1)
          (u, eid) -> ((frame.size.toLong, frame.map(_._4).sum,
            if (i == 0) None else Some(ts - sorted(i - 1)._3)))
        }
      }.toMap
    assert(got == want)
  }
  test("lDiversityAudit: homogeneous groups flagged, diverse ones pass") {
    import spark.implicits._
    // group A: 4 rows, one sensitive value (flagged, n=4 diversity=1);
    // group B: 3 rows, two values (flagged at l=3);
    // group C: 3 rows, three values (passes)
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", "x"),
      ("C", "x"), ("C", "y"), ("C", "z")).toDF("qid", "sens")
    val got = Versioning.lDiversityAudit(df, Seq(col("qid")), col("sens"), l = 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("A" -> ((4L, 1L)), "B" -> ((3L, 2L))))
  }

  test("corpusTvDistance: 0 on identical corpora, 1 on disjoint, exact on a hand case") {
    import spark.implicits._
    val a = Seq((1L, "x x y"), (2L, "z")).toDF("doc_id", "text")
    assert(Versioning.corpusTvDistance(a, a).head().getDouble(3) == 0.0)
    val b = Seq((3L, "p q"), (4L, "q r")).toDF("doc_id", "text")
    assert(Versioning.corpusTvDistance(a, b).head().getDouble(3) == 1.0)
    // a: {x:2, y:1, z:1}/4; b: {p:1, q:2, r:1}... use overlapping instead
    val c = Seq((5L, "x y")).toDF("doc_id", "text") // {x:1/2, y:1/2}
    // TV(a, c): a = {x:1/2, y:1/4, z:1/4}; |1/2-1/2|+|1/4-1/2|+|1/4-0| = 1/2 → TV = 1/4
    val r = Versioning.corpusTvDistance(a, c).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.25)
  }
}
