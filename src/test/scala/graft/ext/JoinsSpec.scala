package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import graft.ProdSession

/** Correctness + plan-shape gates for [[Joins]].
  *
  * The as-of differential is the load-bearing test: a seeded random event
  * log with duplicate keys, tied timestamps, and keys with no right-side
  * rows, checked row-for-row against an independent brute-force formulation
  * (max-ts-≤ subquery via a plain inequality join). The driver-oracle rows
  * (`asof_join`, `interval_join`) then cross-check against DuckDB's native
  * ASOF JOIN and an inequality theta-join. */
class JoinsSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = ProdSession.spark

  private def physical(name: String): SparkPlan =
    graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
  private def count(p: SparkPlan)(pf: PartialFunction[SparkPlan, Unit]): Int =
    p.collect { case n if pf.isDefinedAt(n) => n }.size

  test("asofJoin matches brute force on adversarial data (ties, gaps, dup keys)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // keys 0..19; right side only for even keys; timestamps drawn from a
    // small range so left/right ties happen by construction
    val left = (1 to 400).map(i => (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(50).toLong))
      .toDF("l_id", "k", "t")
    val right = (1 to 200).map { i =>
      (1000L + i, rnd.nextInt(10).toLong * 2, rnd.nextInt(50).toLong, rnd.nextDouble())
    }.toDF("r_id", "k", "t", "v")
      // unique (k, t): max r_id wins, as the operator contract requires
      .groupBy("k", "t").agg(max(struct(col("r_id"), col("v"))).as("s"))
      .select(col("k"), col("t"), col("s.r_id").as("r_id"), col("s.v").as("v"))

    val got = Joins.asofJoin(left, right, Seq("k"), "t", Seq("r_id", "v"))
      .select("l_id", "r_r_id", "r_v")

    // brute force: the matching right row is the arg-max over t' ≤ t
    val brute = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.l_id").as("l_id"))
      .agg(max(struct(col("r.t"), col("r.r_id"), col("r.v"))).as("m"))
      .select(col("l_id"), col("m.r_id").as("r_r_id"), col("m.v").as("r_v"))

    val g = got.collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    val b = brute.collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(g.size == 400 && b.size == 400)
    assert(g == b)
  }

  test("asofJoinSalted == asofJoin on adversarial + skewed data; bucket edges exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // one pathologically hot key (0) with half the rows, plus the usual
    // ties/gaps; timestamps cluster so many land in one bucket and others
    // sit exactly ON bucket boundaries (t multiple of the grain)
    val left = (1 to 600).map { i =>
      val k = if (i % 2 == 0) 0L else rnd.nextInt(20).toLong
      (i.toLong, k, rnd.nextInt(100).toLong)
    }.toDF("l_id", "k", "t")
    val right = (1 to 300).map { i =>
      val k = if (i % 2 == 0) 0L else rnd.nextInt(10).toLong * 2
      (1000L + i, k, rnd.nextInt(100).toLong, rnd.nextDouble())
    }.toDF("r_id", "k", "t", "v")
      .groupBy("k", "t").agg(max(struct(col("r_id"), col("v"))).as("s"))
      .select(col("k"), col("t"), col("s.r_id").as("r_id"), col("s.v").as("v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("l_id", "r_r_id", "r_v").collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    val plain = rows(Joins.asofJoin(left, right, Seq("k"), "t", Seq("r_id", "v")))
    for (grain <- Seq(1L, 7L, 25L, 1000L)) { // incl. every-row-own-bucket and one-bucket
      val salted = rows(Joins.asofJoinSalted(left, right, Seq("k"), "t",
        Seq("r_id", "v"), grainSeconds = grain))
      assert(salted == plain, s"salted(grain=$grain) diverges from plain")
    }
    // the auto form picks a regime by measured skew; output identical either way
    val auto = rows(Joins.asofJoinAuto(left, right, Seq("k"), "t",
      Seq("r_id", "v"), hotRowThreshold = 100L, grainSeconds = 7L))
    assert(auto == plain)
  }

  test("asofJoinSalted == asofJoin when the unique-(key,ts) precondition is " +
      "VIOLATED: both regimes resolve ties to the max payload") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val left = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(30).toLong)).toDF("l_id", "k", "t")
    // deliberately duplicated (k, t) with different payloads — the tied
    // timestamps the docstring warns about; no pre-aggregation
    val right = (1 to 200).map(i =>
      (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(30).toLong, rnd.nextDouble()))
      .toDF("r_id", "k", "t", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("l_id", "r_r_id", "r_v").collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    val plain = rows(Joins.asofJoin(left, right, Seq("k"), "t", Seq("r_id", "v")))
    for (grain <- Seq(1L, 4L, 11L, 1000L)) {
      val salted = rows(Joins.asofJoinSalted(left, right, Seq("k"), "t",
        Seq("r_id", "v"), grainSeconds = grain))
      assert(salted == plain,
        s"salted(grain=$grain) must share the tie rule with plain")
    }
    // and a different physical partitioning cannot change the answer
    val reparted = rows(Joins.asofJoinSalted(left.repartition(7), right.repartition(3),
      Seq("k"), "t", Seq("r_id", "v"), grainSeconds = 4L))
    assert(reparted == plain)
  }

  test("asofJoinSalted plan: data window partitioned by (keys, bucket), never keys alone") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong, i.toLong % 3, i.toLong)).toDF("l_id", "k", "t")
    val right = (1 to 50).map(i => (100L + i, i.toLong % 3, i.toLong, 0.1 * i)).toDF("r_id", "k", "t", "v")
    val p = Joins.asofJoinSalted(left, right, Seq("k"), "t", Seq("r_id"), grainSeconds = 5L)
      .queryExecution.executedPlan
    val wins = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    // the window over the FULL data must salt by bucket; only the
    // summary-sized carry window may key alone — its subtree first
    // reduces to ONE row per (key, bucket), either via an aggregate
    // (pre-r19 allB distinct) or via the r19 `__rn = 1` row_number
    // filter over the bucket-salted window (same one-row-per-bucket
    // guarantee, no extra exchange)
    val dataWins = wins.filter(_.child.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.references.exists(_.name == "__rn") => f
    }.isEmpty)
    assert(dataWins.nonEmpty, s"expected the running window over the raw union:\n$p")
    dataWins.foreach(w => assert(w.partitionSpec.size == 2,
      s"full-data window must partition by (key, bucket):\n$p"))
  }

  test("asofJoin: a tied right-side timestamp is visible to the left row") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("l_id", "k", "t")
    val right = Seq((5L, 1L, 10L, 0.5)).toDF("r_id", "k", "t", "v")
    val out = Joins.asofJoin(left, right, Seq("k"), "t", Seq("r_id")).collect()
    assert(out.head.getAs[Long]("r_r_id") == 5L)
  }

  test("asof_join plan: NO join operator — one union, one window shuffle") {
    val p = physical("asof_join")
    assert(count(p) { case _: SortMergeJoinExec => } == 0 &&
      count(p) { case _: BroadcastHashJoinExec => } == 0 &&
      count(p) { case _: ShuffledHashJoinExec => } == 0 &&
      count(p) { case _: BroadcastNestedLoopJoinExec => } == 0 &&
      count(p) { case _: CartesianProductExec => } == 0,
      s"asof_join must be join-free (union + running window):\n$p")
    // shuffle 1: the right-side (user_id, ts) dedup agg; shuffle 2: the
    // window co-partitioning. The point side of the union never pre-shuffles.
    assert(count(p) { case _: ShuffleExchangeExec => } == 2,
      s"expected exactly 2 shuffles:\n$p")
  }

  test("interval_join plan: broadcast hash join, point side never shuffles") {
    val p = physical("interval_join")
    assert(count(p) { case _: CartesianProductExec => } == 0 &&
      count(p) { case _: BroadcastNestedLoopJoinExec => } == 0,
      s"interval_join must not plan a nested loop:\n$p")
    assert(count(p) { case _: BroadcastHashJoinExec => } == 1,
      s"expected one broadcast hash join:\n$p")
    assert(count(p) { case _: BroadcastExchangeExec => } == 1)
    // the only exchange is the final per-anchor aggregation
    assert(count(p) { case _: ShuffleExchangeExec => } == 1,
      s"point side must reach the join shuffle-free:\n$p")
  }
  test("overlapJoin == theta-join brute force; half-open bounds; no dup pairs") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // spans crossing many 1h buckets, touching endpoints, disjoint keys
    val a = Seq(
      (1L, "k1", t(0), t(7200)),      // 2h
      (2L, "k1", t(7200), t(7300)),   // starts exactly where 1 ends
      (3L, "k2", t(100), t(200)),
      (4L, "k1", t(100000), t(100100))).toDF("a_id", "k", "a_start", "a_end")
    val b = Seq(
      (10L, "k1", t(3600), t(10800)), // overlaps a1 and a2
      (11L, "k1", t(7300), t(7400)),  // touches a2's end: NO overlap
      (12L, "k2", t(150), t(160)),    // inside a3
      (13L, "k3", t(0), t(999999))).toDF("b_id", "k", "b_start", "b_end")
    val got = Joins.overlapJoin(a, b, Seq("k"), "a_start", "a_end", "b_start", "b_end")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val brute = a.join(b, Seq("k"))
      .where(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == brute, s"bucketed overlap diverges from brute force: $got vs $brute")
    assert(got == got.distinct, "multi-bucket pair must appear exactly once")
    assert(got.contains((1L, 10L)) && got.contains((2L, 10L)))
    assert(!got.contains((2L, 11L)), "touching endpoints is NOT an overlap (half-open)")
  }

  test("attribution: bucketed equi-join equals brute-force theta join") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // window-boundary cases: exactly at window (excluded), just inside,
    // click before view (excluded), cross-user (excluded), equal ts
    val w = 100L
    val ev = Seq(
      (1L, 1L, t(0), "view"), (1L, 2L, t(99), "click"),   // inside
      (1L, 3L, t(100), "click"),                          // at boundary: OUT
      (1L, 4L, t(50), "view"), (1L, 5L, t(50), "click"),  // equal ts: IN
      (2L, 6L, t(10), "click"),                           // cross-user: OUT
      (3L, 7L, t(0), "click"), (3L, 8L, t(1), "view")     // click first: OUT
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Joins.attribution(ev, "view", "click", w).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((2L, 1L, 99000000L), (5L, 4L, 0L), (2L, 4L, 49000000L),
      (5L, 1L, 50000000L), (3L, 4L, 50000000L)),
      s"got $got")
    // real-corpus differential vs the plain theta join
    val events = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "events")
    val bucketed = Joins.attribution(events, "view", "click", 86400L).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val v = events.where(col("event_type") === "view")
      .select(col("user_id").as("u"), col("event_id").as("vid"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("vts"))
    val c = events.where(col("event_type") === "click")
      .select(col("user_id").as("u2"), col("event_id").as("cid"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("cts"))
    val brute = v.join(c, col("u") === col("u2") && col("cts") >= col("vts") &&
        col("cts") < col("vts") + 86400000000L).collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("vid"))).toSet
    assert(bucketed == brute)
  }

  test("attributionStream: native stream-stream join equals the batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_id", "ts", "event_type")
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    in.addData(events.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getTimestamp(2), r.getString(3))).toSeq)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = Joins.attributionStream(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        "view", "click", 86400L)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= b.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batch = Joins.attribution(events, "view", "click", 86400L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out.toSet == batch,
      s"stream-stream join diverges: ${out.size} vs ${batch.size} pairs")
  }

  test("streaming attribution over the shard source: stop/restart == batch twin") {
    // the S10 exactly-once pattern applied to stream-stream JOIN state:
    // the watermarked attribution join over the real kinesiscat source,
    // killed after one capped micro-batch and resumed from checkpoint,
    // must emit exactly the uninterrupted (== batch-twin) pair set
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    import graft.sources.ShardStream
    val base = java.nio.file.Files.createTempDirectory("attre2e").toString
    val events = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_id", "ts", "event_type")
    val rows = events
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3))).sortBy(_._2)
    val streamDir = s"$base/stream"
    ShardStream.writeShardDir(streamDir, rows.toSeq.map { case (u, id, tsUs, et) =>
      ("s0", f"$id%012d", u.toString, s"$id|$tsUs|$et", 1700000000000L + id)
    })
    def run(ckpt: String, trigger: Trigger): Seq[(Long, Long, Long)] = {
      val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
      val src = spark.readStream.format("kinesiscat")
        .option("path", streamDir).option("startingPosition", ShardStream.TrimHorizon)
        .option("batchSize", "200").load()
        .select(col("partitionKey").cast("long").as("user_id"),
          split(col("data").cast("string"), "\\|").as("__p"))
        .select(col("user_id"),
          element_at(col("__p"), 1).cast("long").as("event_id"),
          timestamp_micros(element_at(col("__p"), 2).cast("long")).as("ts"),
          element_at(col("__p"), 3).as("event_type"))
      val q = Joins.attributionStream(src, "view", "click", 86400L)
        .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => acc.add((r.getLong(1), r.getLong(2), r.getLong(3))))
          ()
        }.option("checkpointLocation", ckpt).trigger(trigger).start()
      q.awaitTermination()
      acc.iterator().asScala.toSeq
    }
    val part = run(s"$base/ckpt", Trigger.Once())
    val rest = run(s"$base/ckpt", Trigger.AvailableNow())
    assert(rest.nonEmpty, "the stop must land mid-corpus")
    val resumed = part ++ rest
    assert(resumed.distinct.size == resumed.size, "no re-delivered pair")
    val batch = Joins.attribution(events, "view", "click", 86400L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(resumed.toSet == batch,
      s"resumed pairs must equal the batch twin (${resumed.size} vs ${batch.size})")
  }

  test("saltedJoin: plain-join equality on a skewed input; hot key spreads over salts") {
    import spark.implicits._
    // 90% of the left lands on one hot key — the straggler shape
    val left = (1L to 1000L).map(i =>
      (i, if (i <= 900) "hot" else s"k${i % 7}", i * 3)).toDF("id", "k", "v")
    val right = Seq(("hot", 1L), ("k1", 2L), ("k2", 3L), ("k3", 4L))
      .toDF("k", "dim")
    def rows(df: org.apache.spark.sql.DataFrame) = df.select("id", "k", "v", "dim")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val plain = rows(left.join(right, Seq("k")))
    val salted = rows(Joins.saltedJoin(left, right, Seq("k"), col("id"), nSalts = 8))
    assert(salted == plain, "salting must not change join semantics")
    // the hot key's rows really spread: all 8 salts occur for 900 rows
    val salts = left.select(
      org.apache.spark.sql.functions.pmod(Hygiene.hashU64(
        concat(col("k").cast("string"), lit("|"), col("id").cast("string"))),
        lit(8L)).as("s"))
      .where(lit(true)).collect().map(_.getLong(0)).toSet
    assert(salts.size == 8, s"expected all salts used, got $salts")
  }
}
