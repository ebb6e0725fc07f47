package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-record JMESPath engine micro-benchmark: isolates the hot `-filter`
  * path CPU cost from Spark's per-job scheduling floor (which dominates
  * BENCH_r*.json at small scale factors and hides per-record wins).
  *
  * Times the SAME expression two ways over N in-memory documents:
  *   interp  — JmesPathFiltered: full JValue tree parse + AST walk/record
  *             (the reference's execution model, go-jmespath api.go:41-48);
  *   lowered — Lowering.filteredNullSafe: fused single-pass streaming scan
  *             (JsonFusedEval) + native Catalyst residue, inside whole-stage
  *             codegen via JsonComputeExpr.
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
    import graft.functions.jmes
    import org.apache.spark.sql.graft.bridge
    import graft.jmespath.Parser

    val small = spark.range(n).select(format_string(
      """{"k": %d, "tags": ["a", "b", "c%d"], "name": "user-%d", "note": "fill-%d-abcdefghijklmnop"}""",
      col("id") % 100, col("id") % 7, col("id"), col("id")).as("doc")).cache()
    val filler = (1 to 20).map(i => s""""f$i": "value-$i-abcdefghijklmnopqrstuvwxyz"""").mkString(", ")
    val bigArr = (1 to 40).map(i => s"$i").mkString("[", ", ", "]")
    val wide = spark.range(n).select(format_string(
      s"""{"k": %d, "tags": ["a", "b", "c%d"], "name": "user-%d", $filler, "nums": $bigArr}""",
      col("id") % 100, col("id") % 7, col("id")).as("doc")).cache()
    small.count(); wide.count()

    def lowered(e: String) = bridge.column(
      graft.compile.Lowering.filteredNullSafe(
        bridge.expression(col("doc").cast("string")), Parser.parse(e)).get)

    def time(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.select(c.as("v")).where(col("v").isNotNull).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up (janino + JIT)
      Seq.fill(5)(once()).min
    }
    // sacrificial first query absorbs first-stage JIT/startup cost
    time(small, jmes.jmesFiltered(col("doc"), "k"))

    val cells = for {
      (shape, df) <- Seq("small" -> small, "wide" -> wide)
      (expr, tag) <- Seq("k >= `50` && k" -> "filter", "length(tags) > `2` && name" -> "function")
    } yield {
      val ti = time(df, jmes.jmesFiltered(col("doc"), expr))
      val tl = time(df, lowered(expr))
      // scalastyle:off println
      println(f"# $shape/$tag: interp $ti%.3f s, lowered $tl%.3f s, speedup ${ti / tl}%.2f")
      // scalastyle:on println
      (s"$shape.$tag", ti, tl)
    }
    val parts = cells.map { case (k, ti, tl) =>
      f""""$k":{"interp_sec":$ti%.3f,"lowered_sec":$tl%.3f,"speedup":${ti / tl}%.2f}"""
    }
    // scalastyle:off println
    println(s"""{"metric":"jmespath_percell","rows":$n,${parts.mkString(",")}}""")
    // scalastyle:on println
    spark.stop()
  }
}
