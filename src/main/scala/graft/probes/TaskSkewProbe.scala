package graft.probes

import graft.{SessionTuning, SparkEntry}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standing diagnostic for the r17 single-task-stage failure class: a
  * one-file (single-row-group) input makes any heavy narrow stage run on
  * ONE task, serializing the whole map side — found this round in
  * fuzzy_join (a 4.0 s single-task verify stage inside a 4.9 s gate),
  * bleu_corpus, chrF/chrF++, the MG sketch pass, ngram_novelty, and the
  * minhash/simhash/phash signature builds, all fixed with a conditional
  * input spread ([[graft.ext.Dedup.spread]], a no-op at cluster scale).
  *
  * Runs each named gate (default: the bench set) and reports every stage
  * that ran with ≤ `maxTasks` tasks AND took ≥ `minFrac` of the query's
  * wall time AND ≥ `minAbsSec` absolute — the shape where adding the
  * spread pays. Scheduling-floor stages (sub-0.4 s, however dominant in a
  * job-floor gate) do not flag.
  *
  * Usage: runMain graft.probes.TaskSkewProbe [minFrac] [query...]
  */
object TaskSkewProbe {
  def main(args: Array[String]): Unit = {
    val minFrac = args.headOption.flatMap(a => scala.util.Try(a.toDouble).toOption)
      .getOrElse(0.35)
    val names0 = args.drop(if (args.headOption.exists(a =>
      scala.util.Try(a.toDouble).isSuccess)) 1 else 0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxTasks = 2
    val spark = SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(tasks: Int, ms: Long, name: String)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(0L)
        stages.add(St(si.numTasks, ms, si.name.takeWhile(_ != '\n').take(60)))
      }
    })

    def force(n: String): Double = {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime()
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head()
      (System.nanoTime() - t0) / 1e9
    }

    val names =
      if (names0.nonEmpty) names0.toSeq else SparkEntry.benchQueries
    var flagged = 0
    names.foreach { n =>
      try {
        force(n) // warm (codegen/JIT out of the stage timings)
        stages.clear()
        val total = force(n)
        org.apache.spark.sql.graft.bridge.waitListenerBus(spark.sparkContext)
        val minAbsSec = 0.4
        val bad = scala.jdk.CollectionConverters.CollectionHasAsScala(stages)
          .asScala.toSeq
          .filter(s => s.tasks <= maxTasks && s.ms / 1e3 >= minFrac * total &&
            s.ms / 1e3 >= minAbsSec)
          .sortBy(-_.ms)
        if (bad.nonEmpty) {
          flagged += 1
          println(f"[skew] $n%-28s total $total%.2f s:")
          bad.foreach(s =>
            println(f"[skew]   ${s.ms / 1e3}%6.2f s  ${s.tasks}%2d task(s)  ${s.name}"))
        }
      } catch { case e: Throwable =>
        println(s"[skew] $n ERROR ${e.getMessage.take(80)}")
      }
    }
    println(s"[skew] flagged $flagged of ${names.size} queries " +
      s"(single-task stage >= ${(minFrac * 100).toInt}% of gate wall time)")
    spark.stop()
  }
}
