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

  /** Materialize (once per sf dir) the events table as a shard directory.
    *
    * Distributed write — the events table is never collected to the driver:
    * each shard's rows are hash-partitioned to one task (`repartition` on the
    * shard key), ordered within the task by sequence number
    * (`sortWithinPartitions`), and streamed straight to that shard's JSONL
    * file by `foreachPartition`. A task owns every row of each shard it
    * writes, so files are written exactly once with no cross-task appends;
    * the `_READY` marker is written by the driver only after the job
    * succeeds, so a failed/retried run rewrites from scratch.
    *
    * PRECONDITIONS (asserted): a local master — executors must share the
    * driver's java.io.tmpdir for the driver-side `_READY` stamp to mean
    * anything — and speculation off, since a speculative duplicate of a
    * partition's task would interleave writes into the same shard file. On a
    * real cluster this helper would target a shared filesystem with
    * per-attempt staging + atomic rename instead. */
  def shardDirFor(s: SparkSession, sfDir: String): String = {
    require(s.sparkContext.isLocal,
      "shardDirFor writes shard files to the driver-local java.io.tmpdir and " +
        "requires a local[*] master; use a shared-FS variant on a cluster")
    require(!s.sparkContext.getConf.getBoolean("spark.speculation", false),
      "shardDirFor requires speculation off: speculative task attempts would " +
        "append duplicate lines into the per-shard JSONL files")
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = new File(System.getProperty("java.io.tmpdir"), s"graft_stream_$tag")
    val ready = new File(dir, "_READY")
    if (!ready.exists()) {
      dir.mkdirs()
      val dirPath = dir.toString
      val nShards = 4
      SparkEntry.table(s, sfDir, "events")
        .select((col("user_id") % nShards).cast("string").as("shard"),
          format_string("%010d", col("event_id")).as("seq"),
          col("user_id").cast("string").as("pk"),
          col("props").as("data"),
          unix_millis(col("ts")).as("ts_ms"))
        .repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"), col("seq"))
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          var shard: String = null
          var w: java.io.PrintWriter = null
          try {
            for (r <- rows) {
              if (r.getString(0) != shard) { // shard-sorted → sequential runs
                if (w != null) w.close()
                shard = r.getString(0)
                w = new java.io.PrintWriter(
                  new File(dirPath, s"shard-$shard.jsonl"), "UTF-8")
              }
              val node = mapper.createObjectNode()
              node.put("sequenceNumber", r.getString(1))
              node.put("partitionKey", r.getString(2))
              node.put("data", r.getString(3))
              node.put("approximateArrivalTimestamp", r.getLong(4))
              w.println(mapper.writeValueAsString(node))
            }
          } finally if (w != null) w.close()
        }
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
