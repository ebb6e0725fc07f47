package graft.probes

import graft.{ext, GraftExtensions, SparkEntry}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B: interp vs lowered-unfused vs lowered-fused on the tiny-doc
  * function-call cell (round-7 verdict #7). */
object FuseProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    import graft.functions.jmes
    val small = spark.range(n).select(format_string(
      """{"k": %d, "tags": ["a", "b", "c%d"], "name": "user-%d", "note": "fill-%d-abcdefghijklmnop"}""",
      col("id") % 100, col("id") % 7, col("id"), col("id")).as("doc")).cache()
    small.count()
    def time(cols: Seq[Column], lower: Boolean, nofuse: Boolean): Double = {
      spark.conf.set(graft.compile.LowerJmesPathRule.LowerConfKey, lower.toString)
      graft.compile.ScanFusion.disabled = nofuse
      def once(): Double = {
        val t0 = System.nanoTime()
        small.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head()
        (System.nanoTime() - t0) / 1e9
      }
      once(); val r = Seq.fill(7)(once()).min
      graft.compile.ScanFusion.disabled = false
      r
    }
    for ((tag, cols) <- Seq[(String, Seq[Column])](
      "function" -> Seq(jmes.jmesFiltered(col("doc"), "length(tags) > `2` && name")),
      "filter" -> Seq(jmes.jmesFiltered(col("doc"), "k >= `50` && k")))) {
      val ti = time(cols, lower = false, nofuse = false)
      val tu = time(cols, lower = true, nofuse = true)
      val tf = time(cols, lower = true, nofuse = false)
      println(f"# $tag: interp $ti%.3f unfused $tu%.3f fused $tf%.3f (fused/interp ${ti / tf}%.2f, unfused/interp ${ti / tu}%.2f)")
    }
    spark.stop()
  }
}
