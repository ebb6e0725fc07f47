package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Quarantine
import graft.sources.ShardStream

/** [[Quarantine]]: exact two-way routing by the ENGINE's parser, the
  * parser-dialect pins the SQL oracle can't express, and the streaming
  * dead-letter queue over the shard source. */
class QuarantineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.ProdSession.spark
  import spark.implicits._

  test("split: every record lands on exactly one side") {
    val df = Seq(
      (1L, """{"k": 1}"""), (2L, "not json"), (3L, "null"), (4L, ""),
      (5L, "[1, 2]"), (6L, "{broken"), (7L, "42"), (8L, "\"str\"")
    ).toDF("id", "data")
    val (clean, bad) = Quarantine.split(df, "data")
    val c = clean.select("id").as[Long].collect().toSet
    val b = bad.select("id").as[Long].collect().toSet
    assert((c & b).isEmpty && (c | b) == (1L to 8L).toSet)
    // engine dialect: all JSON VALUES are valid (null/number/string/array),
    // empty and structurally-broken strings are not
    assert(c.contains(3L) && c.contains(5L) && c.contains(7L) && c.contains(8L))
    assert(b.contains(2L) && b.contains(4L) && b.contains(6L))
  }

  test("engine parser dialect: trailing garbage is ACCEPTED (first-value parse)") {
    // the documented divergence from RFC-strict validators (DuckDB
    // json_valid rejects this) — the engine contract is consistency with
    // the interpreted evaluator, which parses the FIRST value: a record
    // the JMES operators can evaluate must never be quarantined
    val df = Seq((1L, """{"k": 1}{{{""")).toDF("id", "data")
    val (clean, bad) = Quarantine.split(df, "data")
    assert(clean.count() == 1 && bad.count() == 0,
      "first-value-parsable payloads must stay in band")
  }

  test("streaming DLQ over the shard source: corrupt rows land in batch dirs") {
    val base = java.nio.file.Files.createTempDirectory("dlq").toString
    val rows = (0 until 60).map { i =>
      val payload = if (i % 7 == 3) s"{corrupt $i" else s"""{"k": $i}"""
      ("s0", f"$i%08d", i.toString, payload, 1700000000000L + i)
    }
    ShardStream.writeShardDir(s"$base/stream", rows)
    val cleanIds = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val src = spark.readStream.format("kinesiscat")
      .option("path", s"$base/stream").option("startingPosition", ShardStream.TrimHorizon)
      .option("batchSize", "25").load()
      .select(col("partitionKey"), col("data").cast("string").as("data"))
    val q = Quarantine.streamWithDlq(src, "data", s"$base/dlq") { clean =>
      clean.select("partitionKey").collect().foreach(r => cleanIds.add(r.getString(0)))
    }.option("checkpointLocation", s"$base/ck").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val badExpected = (0 until 60).filter(_ % 7 == 3).map(_.toString).toSet
    import scala.jdk.CollectionConverters._
    assert(cleanIds.asScala.toSet == (0 until 60).map(_.toString).toSet -- badExpected)
    val dlq = spark.read.parquet(s"$base/dlq/batch=*")
      .select("partitionKey").collect().map(_.getString(0)).toSet
    assert(dlq == badExpected, s"DLQ must hold exactly the corrupt rows: $dlq")
    // several capped micro-batches → several batch dirs (snapshot layout)
    val dirs = new java.io.File(s"$base/dlq").listFiles()
      .count(_.getName.startsWith("batch="))
    assert(dirs >= 2, s"expected per-batch DLQ dirs, got $dirs")
  }
}
