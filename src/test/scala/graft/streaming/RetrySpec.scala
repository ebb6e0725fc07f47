package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ShardStream

/** S8 (error handling / retry): the shard reader is deterministic over its
  * [start, end) range, so a failed task's retry re-reads exactly the same
  * records and Spark discards the failed attempt's partial output —
  * exactly-once despite mid-read crashes. The reference retries GetRecords
  * after a worker error (worker.go:219-224) but can emit duplicates on a
  * mid-batch crash; the Spark execution model upgrades that to exactly-once.
  *
  * Needs its own SparkContext: local-mode task retries come from the master
  * string (`local[4, 2]` = 2 attempts), not spark.task.maxFailures. Suites
  * run sequentially in the forked test JVM, so cycling the context here is
  * safe — later suites lazily re-create their own.
  */
class RetrySpec extends AnyFunSuite {
  test("S8: injected first-attempt reader failures are retried exactly-once") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4, 2]") // 2 task attempts: first fails, retry succeeds
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dir = Files.createTempDirectory("shardretry").toString
      val rows = for {
        shard <- Seq("a", "b", "c")
        i <- 0 until 20
      } yield (shard, f"$shard-$i%04d", s"pk-$i", s"""{"k": $i}""", 1700000000000L + i * 1000L)
      ShardStream.writeShardDir(dir, rows)
      ShardStream.chaosInjectedFailures.set(0L)
      val name = s"t${System.nanoTime()}"
      val q = spark.readStream.format("kinesiscat")
        .option("path", dir).option("startingPosition", ShardStream.TrimHorizon)
        .option("batchSize", "7") // several micro-batches ⇒ several failing tasks
        .option("chaosFailFirstAttempt", "true")
        .load()
        .select(col("shardId"), col("sequenceNumber"))
        .writeStream.format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(name).collect().map(r => (r.getString(0), r.getString(1))).toSeq
      // failures really fired (one per task first attempt)...
      assert(ShardStream.chaosInjectedFailures.get() > 0, "no failure was injected")
      // ...yet every record arrives exactly once, still per-shard ordered
      assert(got.size == 60, s"expected 60 exactly-once records, got ${got.size}")
      assert(got.distinct.size == 60, "retry introduced duplicates")
      for (s <- Seq("a", "b", "c")) {
        val seqs = got.filter(_._1 == s).map(_._2)
        assert(seqs == seqs.sorted, s"shard $s out of order after retries")
      }
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("live S8: injected first-attempt failures in the LIVE reader retry exactly-once") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val stream = s"retrylive${System.nanoTime()}"
      graft.sources.MockKinesis.createStream(stream, Seq("a", "b", "c"))
      for (shard <- Seq("a", "b", "c"); i <- 0 until 20)
        graft.sources.MockKinesis.putRecord(stream, shard, f"$shard-$i%04d",
          s"pk-$i", "x".getBytes("UTF-8"), 1700000000000L + i * 1000L)
      graft.sources.KinesisReaderFactory.chaosInjectedFailures.set(0L)
      val name = s"t${System.nanoTime()}"
      val q = spark.readStream.format("kinesiscat-live")
        .option("stream", stream)
        .option("apiFactoryClass", "graft.sources.MockKinesisFactory")
        .option("startingPosition", ShardStream.TrimHorizon)
        .option("batchSize", "7")
        .option("chaosFailFirstAttempt", "true")
        .load()
        .select(col("shardId"), col("sequenceNumber"))
        .writeStream.format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
      val got = spark.table(name).collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(graft.sources.KinesisReaderFactory.chaosInjectedFailures.get() > 0,
        "no failure was injected")
      // the live reader RE-FETCHES its [readFrom, stopAt] range through a
      // fresh client on retry — exactly-once, still per-shard ordered
      assert(got.size == 60, s"expected 60 exactly-once records, got ${got.size}")
      assert(got.distinct.size == 60, "retry introduced duplicates")
      for (s <- Seq("a", "b", "c")) {
        val seqs = got.filter(_._1 == s).map(_._2)
        assert(seqs == seqs.sorted, s"shard $s out of order after retries")
      }
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
