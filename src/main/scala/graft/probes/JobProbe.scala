package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side diagnostic: runs one gate query and reports every Spark
  * job it fires (eager jobs inside the operator + the final force),
  * with per-job wall time — the "count the eager jobs" feedback loop for
  * job-floor queries like quality_ensemble (VERDICT r12 item 4).
  *
  * Usage: runMain graft.JobProbe <queryName> [repeat]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("quality_ensemble")
    val repeat = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n').take(40)}(${si.numTasks}t)")
            .mkString(" | ")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) jobs.add((j.jobId, System.nanoTime() - s._1, s._2))
      }
    })

    def force(): (Double, Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val cols = df.columns.map(col)
      df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head()
      ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9)
    }
    force() // warm-up
    for (r <- 1 to repeat) {
      jobs.clear()
      val t0 = System.nanoTime()
      val (construct, fin) = force()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"== run $r: total $total%.3f s (construct $construct%.3f + force $fin%.3f), ${jobs.size} jobs")
      jobs.forEach { case (id, ns, desc) =>
        println(f"   job $id%3d  ${ns / 1e9}%.3f s  ${desc.take(90)}")
      }
    }
    spark.stop()
  }
}
