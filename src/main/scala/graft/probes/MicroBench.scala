package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-record JMESPath engine micro-benchmark: isolates the hot `-filter`
  * path CPU cost from Spark's per-job scheduling floor (which dominates
  * BENCH_r*.json at small scale factors and hides per-record wins).
  *
  * Times the SAME query two ways over N in-memory documents, through the
  * PRODUCTION path (interpreted API + GraftExtensions auto-lowering, toggled
  * per cell via spark.graft.jmes.lower):
  *   interp  — full JValue tree parse + AST walk per record per column
  *             (the reference's execution model, go-jmespath api.go:41-48);
  *   lowered — LowerJmesPathRule + ScanFusion + FuseProjectScans: one fused
  *             streaming scan per record, inside whole-stage codegen.
  * Cells: `filter` (path comparator gate+value), `function` (length() call),
  * `multicol` (4-column select — the cross-column fusion case).
  * Two document shapes: `small` (~100 B, 4 fields — tree parse is cheap) and
  * `wide` (~1.5 KB, 24 fields + a 40-element array — the shape where a
  * streaming scan that never materializes untouched subtrees pays off).
  * min-of-5 per cell: under bursty host contention the minimum is the
  * honest per-record cost; medians are still contention-inflated.
  *
  * Usage: runMain graft.MicroBench [nRows]; prints one JSON line.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-microbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    import graft.functions.jmes

    val small = spark.range(n).select(format_string(
      """{"k": %d, "tags": ["a", "b", "c%d"], "name": "user-%d", "note": "fill-%d-abcdefghijklmnop"}""",
      col("id") % 100, col("id") % 7, col("id"), col("id")).as("doc")).cache()
    val filler = (1 to 20).map(i => s""""f$i": "value-$i-abcdefghijklmnopqrstuvwxyz"""").mkString(", ")
    val bigArr = (1 to 40).map(i => s"$i").mkString("[", ", ", "]")
    val wide = spark.range(n).select(format_string(
      s"""{"k": %d, "tags": ["a", "b", "c%d"], "name": "user-%d", $filler, "nums": $bigArr}""",
      col("id") % 100, col("id") % 7, col("id")).as("doc")).cache()
    small.count(); wide.count()

    /** Forces every output column; lower toggles the optimizer rules so the
      * identical DataFrame code runs interpreted vs lowered+fused. */
    def time(df: DataFrame, cols: Seq[Column], lower: Boolean): Double = {
      spark.conf.set(graft.compile.LowerJmesPathRule.LowerConfKey, lower.toString)
      def once(): Double = {
        val t0 = System.nanoTime()
        df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up (janino + JIT)
      Seq.fill(9)(once()).min
    }
    // sacrificial first query absorbs first-stage JIT/startup cost
    time(small, Seq(jmes.jmesFiltered(col("doc"), "k")), lower = true)

    val cells = for {
      (shape, df) <- Seq("small" -> small, "wide" -> wide)
      (tag, cols) <- Seq[(String, Seq[Column])](
        "filter" -> Seq(jmes.jmesFiltered(col("doc"), "k >= `50` && k")),
        "function" -> Seq(jmes.jmesFiltered(col("doc"), "length(tags) > `2` && name")),
        "multicol" -> Seq(
          jmes.jmespathDouble(col("doc"), "k"),
          jmes.jmespath(col("doc"), "name"),
          jmes.jmespath(col("doc"), "tags[0]"),
          jmes.jmespathDouble(col("doc"), "length(tags)")))
    } yield {
      val ti = time(df, cols, lower = false)
      val tl = time(df, cols, lower = true)
      // scalastyle:off println
      println(f"# $shape/$tag: interp $ti%.3f s, lowered $tl%.3f s, speedup ${ti / tl}%.2f")
      // scalastyle:on println
      (s"$shape.$tag", ti, tl)
    }
    // CLI pipeline shape: `-filter` gate + 2-column extraction — the
    // cross-operator fusion case (gate + outputs in ONE pass below the
    // Filter). Built inside the timer so each run re-optimizes under the
    // toggled lowering conf.
    def timeQ(mk: () => DataFrame, lower: Boolean): Double = {
      spark.conf.set(graft.compile.LowerJmesPathRule.LowerConfKey, lower.toString)
      def once(): Double = {
        val q = mk()
        val t0 = System.nanoTime()
        q.select(xxhash64(q.columns.map(col): _*).as("h")).agg(expr("bit_xor(h)")).head()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      Seq.fill(9)(once()).min
    }
    val pipeCells = Seq("small" -> small, "wide" -> wide).map { case (shape, df) =>
      def mk() = df
        .where(jmes.jmesTruthy(col("doc"), "k >= `50` && length(tags) == `3`"))
        .select(jmes.jmespathDouble(col("doc"), "k").as("k"),
          jmes.jmespath(col("doc"), "tags[0]").as("t"))
      val ti = timeQ(() => mk(), lower = false)
      val tl = timeQ(() => mk(), lower = true)
      // scalastyle:off println
      println(f"# $shape/pipeline: interp $ti%.3f s, lowered $tl%.3f s, speedup ${ti / tl}%.2f")
      // scalastyle:on println
      (s"$shape.pipeline", ti, tl)
    }
    val parts = (cells ++ pipeCells).map { case (k, ti, tl) =>
      f""""$k":{"interp_sec":$ti%.3f,"lowered_sec":$tl%.3f,"speedup":${ti / tl}%.2f}"""
    }
    // scalastyle:off println
    println(s"""{"metric":"jmespath_percell","rows":$n,${parts.mkString(",")}}""")
    // scalastyle:on println
    spark.stop()
  }
}
