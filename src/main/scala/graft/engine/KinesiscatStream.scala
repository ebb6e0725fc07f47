package graft.engine

import java.io.OutputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sinks.{DataFormat, FramedSink, OutputFormat}
import graft.sources.ShardStream

/** Library-embedding surface of the engine — the Spark analogue of the
  * reference's `StreamWorker` config struct + channels API
  * (worker/worker.go:38-53, worker/README.md:9-26) merged with the CLI flag
  * surface (main.go:30-49):
  *
  * {{{
  * val q = KinesiscatStream(path = "/streams/events",
  *     position = ShardStream.TrimHorizon, batchSize = 1000,
  *     sleepTimeMs = 1000, filter = Some("k > `50`"))
  *   .start(spark, System.out)
  * // ... q.stop() — graceful stop (S10); offsets checkpointed
  * }}}
  *
  * `dataFrame` returns the raw streaming envelope for arbitrary downstream
  * Spark transformations (the `Output` channel analogue); `start` attaches
  * the CLI-parity framed sink. Lag telemetry (the `State` channel analogue)
  * surfaces as `recordsBehindLatest` in each StreamingQueryProgress's source
  * metrics.
  */
case class KinesiscatStream(
    path: String,
    position: String = ShardStream.Latest,
    startingSequenceNumber: Option[String] = None,
    batchSize: Long = 10L,            // worker.go:21 DefaultBatchSize
    sleepTimeMs: Long = 1000L,        // main.go:38 default
    format: OutputFormat = DataFormat,
    separator: String = "\n",
    filter: Option[String] = None,
    checkpointLocation: Option[String] = None) {

  /** The streaming envelope DataFrame (S1–S5 wired; schema per SURVEY §1.1). */
  def dataFrame(spark: SparkSession): DataFrame = {
    var r = spark.readStream.format("kinesiscat")
      .option("path", path)
      .option("startingPosition", position)
      .option("batchSize", batchSize)
    startingSequenceNumber.foreach(s => r = r.option("startingSequenceNumber", s))
    r.load()
  }

  /** Formatted output lines (pre-framing), with null (skipped) rows removed. */
  def lines(spark: SparkSession): DataFrame =
    dataFrame(spark)
      .select(FramedSink.lineCol(format, filter).as("line"))
      .where(col("line").isNotNull)

  /** Start the CLI-parity pipeline: framed records to `out`, paced by
    * `sleepTimeMs` (S6). */
  def start(spark: SparkSession, out: OutputStream): StreamingQuery = {
    var w = dataFrame(spark).writeStream
      .trigger(Trigger.ProcessingTime(sleepTimeMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        FramedSink.writeBatch(batch, format, separator, filter, out)
      }
    checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
    w.start()
  }
}
