package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.engine.KinesiscatStream
import graft.sinks.DataFormat
import graft.sinks.FramedSink
import graft.sources.ShardStream

/** Scratch: inspect the MICRO-BATCH optimized plan of the CLI streaming
  * pipeline (stream_filter_format) under the production config — the other
  * round-7 optimizer-looper. Prints fused-eval counts like ConvergeProbe. */
object StreamPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sd = graft.engine.StreamingCoverage.shardDirFor(spark, sfDir)
    val stream = KinesiscatStream(
      path = sd, position = ShardStream.TrimHorizon, batchSize = 5000,
      format = DataFormat, filter = Some("k >= `50` && k")).dataFrame(spark)
    val df = stream
      .select(FramedSink.lineCol(DataFormat, Some("k >= `50` && k")).as("line"))
      .where(col("line").isNotNull)
    val q = df.writeStream.format("memory").queryName("probe_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val last = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution
    val opt = last.optimizedPlan
    val total = graft.compile.FusedPlanStats.totalFused(opt)
    val inFilter = graft.compile.FusedPlanStats.filterFused(opt)
    println(s"STREAMPROBE totalFused=$total filterFused=$inFilter rows=${spark.table("probe_stream").count()}")
    println(opt.treeString.take(3000))
    spark.stop()
  }
}
