package graft.engine

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkEntry
import graft.sinks.{DataFormat, FramedSink}
import graft.sources.ShardStream

/** Driver-oracle entries for the streaming layer: the `events` table is
  * materialized once as a 4-shard stream directory (shard = user_id % 4,
  * per-shard ordered by event_id), drained through the kinesiscat source
  * with `Trigger.AvailableNow` in capped micro-batches, and compared to a
  * batch DuckDB oracle over the original parquet. */
object StreamingCoverage {
  private type Q = (SparkSession, String) => DataFrame

  /** Materialize (once per sf dir) the events table as a shard directory. */
  def shardDirFor(s: SparkSession, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = new File(System.getProperty("java.io.tmpdir"), s"graft_stream_$tag")
    val ready = new File(dir, "_READY")
    if (!ready.exists()) {
      val rows = SparkEntry.table(s, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("props"), col("ts"))
        .collect()
        .sortBy(_.getLong(0))
        .map { r =>
          val eventId = r.getLong(0); val userId = r.getLong(1)
          ((userId % 4).toString, f"$eventId%010d", userId.toString,
            r.getString(2), r.getTimestamp(3).getTime)
        }.toSeq
      ShardStream.writeShardDir(dir.toString, rows)
      java.nio.file.Files.writeString(ready.toPath, "ok")
    }
    dir.toString
  }

  /** Drain a streaming DF via AvailableNow into a memory sink; return it. */
  private def drain(s: SparkSession, df: DataFrame): DataFrame = {
    val name = s"graft_stream_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name)
  }

  val queries: Map[String, Q] = Map(
    // S1–S5 end-to-end: full drain in capped micro-batches; envelope mapped
    // back to oracle-comparable columns
    "stream_source" -> ((s, dir) => {
      val sd = shardDirFor(s, dir)
      val stream = KinesiscatStream(
        path = sd, position = ShardStream.TrimHorizon, batchSize = 2500).dataFrame(s)
      drain(s, stream.select(
        col("sequenceNumber").cast("long").as("event_id"),
        col("partitionKey").as("pk"),
        col("data").cast("string").as("data"),
        col("shardId").as("shard")))
    }),
    // CLI-parity: -format data -filter 'k >= `50` && k' over the stream
    "stream_filter_format" -> ((s, dir) => {
      val sd = shardDirFor(s, dir)
      val stream = KinesiscatStream(
        path = sd, position = ShardStream.TrimHorizon, batchSize = 5000,
        format = DataFormat, filter = Some("k >= `50` && k")).dataFrame(s)
      drain(s, stream
        .select(FramedSink.lineCol(DataFormat, Some("k >= `50` && k")).as("line"))
        .where(col("line").isNotNull))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "stream_source" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS pk, props AS data,
        |  CAST(user_id % 4 AS VARCHAR) AS shard
        |FROM events""".stripMargin,
    "stream_filter_format" ->
      """SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR) AS line
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50""".stripMargin,
  )
}
