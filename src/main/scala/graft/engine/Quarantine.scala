package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.jmes

/** Dead-letter routing for malformed payloads — the operational upgrade
  * over both the reference (which nil-derefs on surprise input,
  * worker.go's unchecked shard fields) and a silent JMES-filter drop
  * (where a malformed record evaluates to null, fails the filter, and
  * VANISHES — at 100 TB, "0.3% of records disappeared" is an incident,
  * and the DLQ is how you notice and replay them).
  *
  * Validity is the ENGINE'S OWN parser ([[graft.compile.JsonIsValid]],
  * codegen-free native expression over one streaming parse), so "valid"
  * means exactly "every downstream JMES operator will evaluate this
  * record" — not some other library's JSON dialect.
  */
object Quarantine {
  /** Engine-parser JSON validity of `c` (the `null` literal is valid). */
  def isValidJson(c: Column): Column = jmes.jsonValid(c)

  /** (clean, quarantined) split of `df` on `dataCol` validity — two lazy
    * views over one scan; a caller consuming both pays the scan twice or
    * persists, a caller consuming one pays a scan-time filter. */
  def split(df: DataFrame, dataCol: String): (DataFrame, DataFrame) =
    (df.where(isValidJson(col(dataCol))),
      df.where(!isValidJson(col(dataCol))))

  /** Streaming ingest with a parquet dead-letter queue: per micro-batch,
    * invalid-payload rows land in `dlqDir/batch=<id>` (overwrite — a
    * Structured Streaming RETRY of the batch rewrites the same directory,
    * the idempotent-snapshot discipline of the streaming dedup index and
    * heavy-hitter state) and only valid rows reach `sink`. */
  def streamWithDlq(df: DataFrame, dataCol: String, dlqDir: String)
                   (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val (clean, bad) = split(batch, dataCol)
      bad.write.mode("overwrite").parquet(s"$dlqDir/batch=$id")
      sink(clean)
    }

  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // a tenth of the payloads corrupted deterministically (PREPENDED
    // garbage — trailing-garbage acceptance is a genuine dialect divergence
    // between parsers, pinned in QuarantineSpec instead): the split must
    // route EVERY record to exactly one side, by the engine's own parser
    "quarantine_split" -> ((s, dir) => {
      val events = graft.SparkEntry.table(s, dir, "events")
        .withColumn("data", when(col("event_id") % 10 === 3,
          concat(lit("{{{"), col("props"))).otherwise(col("props")))
      events.select(col("event_id"), isValidJson(col("data")).as("ok"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // DuckDB's json_valid agrees with the engine parser on this corpus's
    // simple object payloads (edge-dialect divergences are spec territory:
    // QuarantineSpec pins the engine parser's own acceptance directly)
    "quarantine_split" ->
      """SELECT event_id,
        |  json_valid(CASE WHEN event_id % 10 = 3 THEN '{{{' || props ELSE props END) AS ok
        |FROM events""".stripMargin,
  )
}
