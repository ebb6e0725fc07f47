package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.KinesiscatStream
import graft.sinks.{DataFormat, FramedSink, PartitionKeyFormat, SequenceFormat}
import graft.sources.ShardStream

/** Streaming-semantics tests for the shard source (S1–S10), framed sink
  * (K1/K2), and the KinesiscatStream builder. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 3 shards × 20 records; sequence numbers zero-padded (string-ordered). */
  private def mkStream(closed: Set[String] = Set.empty): String = {
    val dir = Files.createTempDirectory("shardstream").toString
    val rows = for {
      shard <- Seq("a", "b", "c")
      i <- 0 until 20
    } yield (shard, f"$shard-$i%04d", s"pk-$i", s"""{"k": $i, "shard": "$shard"}""",
      1700000000000L + i * 1000L)
    ShardStream.writeShardDir(dir, rows, closed)
    dir
  }

  private def drain(dir: String, extra: Map[String, String] = Map.empty,
                    position: String = ShardStream.TrimHorizon): Seq[(String, String)] = {
    val name = s"t${System.nanoTime()}"
    var r = spark.readStream.format("kinesiscat")
      .option("path", dir).option("startingPosition", position)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .select(col("shardId"), col("sequenceNumber"))
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).collect().map(x => (x.getString(0), x.getString(1))).toSeq
  }

  test("S1/S4/S5: TRIM_HORIZON reads all shards, per-shard order preserved") {
    val got = drain(mkStream())
    assert(got.size == 60)
    assert(got.map(_._1).toSet == Set("a", "b", "c"))
    // per-shard order preserved within the merged output
    for (s <- Seq("a", "b", "c")) {
      val seqs = got.filter(_._1 == s).map(_._2)
      assert(seqs == seqs.sorted, s"shard $s out of order")
    }
  }

  test("S2: LATEST starts at stream head (reads nothing)") {
    assert(drain(mkStream(), position = ShardStream.Latest).isEmpty)
  }

  test("S2: AT/AFTER_SEQUENCE_NUMBER seek within each shard") {
    val dir = mkStream()
    val at = drain(dir, Map("startingSequenceNumber" -> "a-0015"),
      position = ShardStream.AtSequenceNumber)
    // shard a: seqs >= a-0015 → 5; shards b,c: all seqs > a-0015 sort-wise → 40
    assert(at.count(_._1 == "a") == 5)
    val after = drain(dir, Map("startingSequenceNumber" -> "a-0015"),
      position = ShardStream.AfterSequenceNumber)
    assert(after.count(_._1 == "a") == 4)
  }

  test("S2: numeric sequence numbers seek numerically, not lexicographically") {
    val dir = Files.createTempDirectory("shardstream").toString
    // unpadded numeric sequence numbers 1..120: "2" > "100" as strings
    val rows = (1 to 120).map(i =>
      ("n", i.toString, s"pk-$i", s"""{"i": $i}""", 1700000000000L + i))
    ShardStream.writeShardDir(dir, rows)
    val at = drain(dir, Map("startingSequenceNumber" -> "100"),
      position = ShardStream.AtSequenceNumber)
    assert(at.size == 21, s"AT 100 over 1..120 must read 100..120, got ${at.size}")
    val after = drain(dir, Map("startingSequenceNumber" -> "100"),
      position = ShardStream.AfterSequenceNumber)
    assert(after.size == 20)
  }

  test("S3: batchSize caps records per shard per micro-batch") {
    val dir = mkStream()
    val name = s"t${System.nanoTime()}"
    val q = spark.readStream.format("kinesiscat")
      .option("path", dir).option("startingPosition", ShardStream.TrimHorizon)
      .option("batchSize", "7")
      .load()
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).count() == 60)
    // 20 records / 7 per shard → 3 non-empty micro-batches
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3, s"expected 3 capped batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 7 * 3))
  }

  test("S9: lag telemetry reports recordsBehindLatest") {
    val dir = mkStream()
    val name = s"t${System.nanoTime()}"
    val q = spark.readStream.format("kinesiscat")
      .option("path", dir).option("startingPosition", ShardStream.TrimHorizon)
      .option("batchSize", "5")
      .load()
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val lags = q.recentProgress.filter(_.numInputRows > 0)
      .map(_.sources.head.metrics.get("recordsBehindLatest").toLong)
    assert(lags.nonEmpty)
    assert(lags.head > 0, s"first batch should report positive lag, got ${lags.toSeq}")
    assert(lags.last == 0, s"drained stream should report zero lag, got ${lags.toSeq}")
  }

  test("S9: lag telemetry includes per-shard keys (WorkerState{ShardId, Lag} parity)") {
    val dir = mkStream()
    val name = s"t${System.nanoTime()}"
    val q = spark.readStream.format("kinesiscat")
      .option("path", dir).option("startingPosition", ShardStream.TrimHorizon)
      .option("batchSize", "5")
      .load()
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val first = q.recentProgress.filter(_.numInputRows > 0).head.sources.head.metrics
    for (s <- Seq("a", "b", "c")) {
      val lag = Option(first.get(s"recordsBehindLatest.$s"))
      assert(lag.isDefined, s"missing per-shard lag for $s: ${first.asScala}")
      assert(lag.get.toLong > 0, s"shard $s should be behind after the first capped batch")
    }
    assert(first.get("recordsBehindLatest").toLong ==
      Seq("a", "b", "c").map(s => first.get(s"recordsBehindLatest.$s").toLong).sum)
  }

  test("shard split mid-stream: children gated until the parent drains (per-key order)") {
    val dir = Files.createTempDirectory("shardstream").toString
    // parent p00 splits into c01/c02; the same partition keys continue in the
    // children with later sequence numbers, as Kinesis does on a split
    val parentRows = (0 until 20).map(i =>
      ("p00", f"$i%04d", s"pk-${i % 4}", s"""{"i": $i}""", 1700000000000L + i * 1000L))
    val childRows = (20 until 30).flatMap(i => Seq(
      ("c01", f"$i%04d-a", s"pk-${i % 2}", s"""{"i": $i}""", 1700000100000L + i * 1000L),
      ("c02", f"$i%04d-b", s"pk-${2 + i % 2}", s"""{"i": $i}""", 1700000100000L + i * 1000L)))
    ShardStream.writeShardDir(dir, parentRows ++ childRows,
      closedShards = Set("p00"),
      parents = Map("c01" -> ("p00", None), "c02" -> ("p00", None)))
    // batchSize 6 → the parent needs 4 micro-batches; children must not emit
    // a single record until batch 5
    val got = drain(dir, Map("batchSize" -> "6"))
    assert(got.size == 40)
    val lastParent = got.lastIndexWhere(_._1 == "p00")
    val firstChild = got.indexWhere(r => r._1 == "c01" || r._1 == "c02")
    assert(lastParent >= 0 && firstChild > lastParent,
      s"child records before the parent drained: lastParent=$lastParent firstChild=$firstChild")
  }

  test("shard merge: child gated until BOTH adjacent parents drain") {
    val dir = Files.createTempDirectory("shardstream").toString
    val rows =
      (0 until 12).map(i => ("m1", f"$i%04d", s"pk-a", s"""{"i": $i}""", 1700000000000L + i)) ++
      (0 until 18).map(i => ("m2", f"$i%04d", s"pk-b", s"""{"i": $i}""", 1700000000000L + i)) ++
      (0 until 8).map(i => ("mc", f"z$i%04d", s"pk-a", s"""{"i": $i}""", 1700000200000L + i))
    ShardStream.writeShardDir(dir, rows,
      closedShards = Set("m1", "m2"),
      parents = Map("mc" -> ("m1", Some("m2"))))
    val got = drain(dir, Map("batchSize" -> "5"))
    assert(got.size == 38)
    val lastParent = math.max(got.lastIndexWhere(_._1 == "m1"), got.lastIndexWhere(_._1 == "m2"))
    val firstChild = got.indexWhere(_._1 == "mc")
    assert(firstChild > lastParent,
      s"merge child read before both parents drained: lastParent=$lastParent firstChild=$firstChild")
    // m2 (18 records at 5/batch → 4 batches) outlives m1 (3 batches): the
    // child must wait for the slower adjacent parent, not just the first
    val m1Last = got.lastIndexWhere(_._1 == "m1")
    val m2Last = got.lastIndexWhere(_._1 == "m2")
    assert(firstChild > m2Last && firstChild > m1Last)
  }

  test("S10: stop + restart from checkpoint resumes exactly-once") {
    val dir = mkStream()
    val ckpt = Files.createTempDirectory("ckpt").toString
    // foreachBatch sink (memory sink cannot recover from a checkpoint)
    def run(trigger: Trigger, batchSize: Int): Seq[String] = {
      val acc = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val q = spark.readStream.format("kinesiscat")
        .option("path", dir).option("startingPosition", ShardStream.TrimHorizon)
        .option("batchSize", batchSize.toString)
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => acc.add(r.getString(2)))
        }
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
      q.awaitTermination()
      acc.iterator().asScala.toSeq
    }
    // run 1: single capped micro-batch (our cap applies even under Once)
    val part = run(Trigger.Once(), 8)
    assert(part.size == 24, s"one capped batch should read 8×3 rows, got ${part.size}")
    // run 2: resume from the same checkpoint, drain the rest
    val rest = run(Trigger.AvailableNow(), 100)
    assert(rest.size == 36, s"restart must not re-read consumed offsets, got ${rest.size}")
    assert((part ++ rest).distinct.size == 60)
  }

  test("closed shard drains to EOF without crashing (reference nil-deref case)") {
    val got = drain(mkStream(closed = Set("b")))
    assert(got.size == 60) // closed shard still drained, then excluded
  }

  test("live appends between micro-batches are picked up") {
    val dir = mkStream()
    // drain fully, then append more records to shard a and re-run with the
    // same checkpoint: only the appended rows arrive
    val ckpt = Files.createTempDirectory("ckpt").toString
    def run(): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val q = spark.readStream.format("kinesiscat")
        .option("path", dir).option("startingPosition", ShardStream.TrimHorizon)
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          acc.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      acc.get()
    }
    assert(run() == 60)
    val w = new java.io.FileWriter(s"$dir/shard-a.jsonl", true)
    w.write("""{"sequenceNumber":"a-0020","partitionKey":"pk-20","data":"{\"k\":20}","approximateArrivalTimestamp":1700000020000}""" + "\n")
    w.close()
    assert(run() == 1)
  }

  test("K1/K2: framed sink formats, separators, NUL, filter intent") {
    import spark.implicits._
    val batch = Seq(
      ("""{"k": 87}""", "pk1", "s1"),
      ("""{"k": 3}""", "pk2", "s2"),
      ("""{"j": 1}""", "pk3", "s3"))
      .toDF("d", "partitionKey", "sequenceNumber")
      .select(col("d").cast("binary").as("data"), col("partitionKey"), col("sequenceNumber"))
    def run(fmt: graft.sinks.OutputFormat, sep: String, filter: Option[String]): String = {
      val out = new ByteArrayOutputStream()
      FramedSink.writeBatch(batch, fmt, sep, filter, out)
      out.toString("UTF-8")
    }
    assert(run(DataFormat, "\n", None) == "{\"k\": 87}\n{\"k\": 3}\n{\"j\": 1}\n")
    assert(run(DataFormat, "\u0000", None) ==
      "{\"k\": 87}\u0000{\"k\": 3}\u0000{\"j\": 1}\u0000")
    // sequence/partition-key ignore the separator (reference main.go:79,81)
    assert(run(SequenceFormat, "|", None) == "s1\ns2\ns3\n")
    assert(run(PartitionKeyFormat, "|", None) == "pk1\npk2\npk3\n")
    // filter: JMESPath result framed; null results skipped (intent fix)
    assert(run(DataFormat, "\n", Some("k")) == "87\n3\n")
  }

  test("CLI flag surface parses like the reference (main.go:30-49)") {
    import graft.engine.Cli
    val c = Cli.parse(Seq("-stream-name", "/tmp/s", "-position", "trim_horizon",
      "-format", "partition-key", "-separator", "|", "-batch-size", "64",
      "-sleep-time", "250", "-filter", "k", "-debug", "-region", "eu-west-1"))
    assert(c.streamName == "/tmp/s" && c.position == "trim_horizon" &&
      c.format == "partition-key" && c.separator == "|" && c.batchSize == 64 &&
      c.sleepTimeMs == 250 && c.filter.contains("k") && c.debug && c.region == "eu-west-1")
    assert(Cli.parse(Seq("-0")).effectiveSeparator == "\u0000")
    // -0 wins regardless of flag order (reference main.go:47-49)
    assert(Cli.parse(Seq("-0", "-separator", ",")).effectiveSeparator == "\u0000")
    assert(Cli.toStream(Cli.parse(Seq("-position", "trim_horizon"))).position ==
      ShardStream.TrimHorizon)
    intercept[IllegalArgumentException](Cli.parse(Seq("-bogus")))
  }

  test("event-time window aggregation over the streaming source matches batch") {
    val dir = mkStream()
    val name = s"t${System.nanoTime()}"
    val q = spark.readStream.format("kinesiscat")
      .option("path", dir).option("startingPosition", ShardStream.TrimHorizon)
      .option("batchSize", "13") // force multiple micro-batches
      .load()
      .withWatermark("approximateArrivalTimestamp", "10 seconds")
      .groupBy(window(col("approximateArrivalTimestamp"), "10 seconds"), col("shardId"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("shardId"), col("n"))
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    // batch twin over the same records: 20 events per shard at 1s spacing
    // from t0 → two 10s windows of 10 events each per shard
    assert(got.size == 6)
    assert(got.forall(_._3 == 10))
  }

  test("stateful sessionization: streaming closed sessions match the batch twin") {
    import graft.ext.Sessionize
    val sfDir = "/root/testdata/sf0.001"
    val shardDir = graft.engine.StreamingCoverage.shardDirFor(spark, sfDir)
    val name = s"t${System.nanoTime()}"
    val env = spark.readStream.format("kinesiscat")
      .option("path", shardDir).option("startingPosition", ShardStream.TrimHorizon)
      .option("batchSize", "200") // several micro-batches, sessions span them
      .load()
    val q = Sessionize.streaming(env).writeStream
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    // expected: every batch session except each user's open tail session
    val batchRows = Sessionize.batch(graft.SparkEntry.table(spark, sfDir, "events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getLong(3)))
    val lastSid = batchRows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batchRows.filter { case (u, sid, _, _) => sid != lastSid(u) }
      .map { case (u, _, start, n) => (u, start, n) }.toSet
    assert(streamed == expected,
      s"streamed ${streamed.size} vs expected closed ${expected.size}")
  }

  test("streaming exact dedup across micro-batches (dropDuplicates + state)") {
    val dir = Files.createTempDirectory("shardstream").toString
    // duplicate payloads across shards and positions
    val rows = for {
      shard <- Seq("a", "b"); i <- 0 until 30
    } yield (shard, f"$shard-$i%04d", s"pk-$i", s"""{"payload": ${i % 10}}""",
      1700000000000L + i * 1000L)
    ShardStream.writeShardDir(dir, rows)
    val name = s"t${System.nanoTime()}"
    val q = spark.readStream.format("kinesiscat")
      .option("path", dir).option("startingPosition", ShardStream.TrimHorizon)
      .option("batchSize", "7") // duplicates span micro-batches
      .load()
      .select(col("data").cast("string").as("payload"))
      .dropDuplicates("payload")
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name).collect().map(_.getString(0)).sorted.toSeq
    assert(got == (0 until 10).map(i => s"""{"payload": $i}""").sorted)
  }

  test("engine builder: CLI-parity pipeline end-to-end") {
    val dir = mkStream()
    val out = new ByteArrayOutputStream()
    val q = KinesiscatStream(
      path = dir, position = ShardStream.TrimHorizon, batchSize = 100,
      sleepTimeMs = 50, filter = Some("k >= `18` && shard"))
      .start(spark, out)
    // wait for the stream to drain, then stop gracefully (S10)
    val deadline = System.currentTimeMillis() + 30000
    while (System.currentTimeMillis() < deadline &&
      !q.recentProgress.exists(p => p.numInputRows == 0 && p.batchId > 0)) Thread.sleep(100)
    q.stop()
    val lines = out.toString("UTF-8").split("\n").filter(_.nonEmpty)
    // k >= 18 → truthy for 2 records per shard; `&& shard` yields the shard
    // name (raw string, unquoted); falsy results are skipped by the sink
    assert(lines.length == 6, s"got ${lines.toSeq}")
    assert(lines.count(_ == "a") == 2)
  }
}
