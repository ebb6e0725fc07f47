package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** §1.2 representation A/B diagnosis (VERDICT r14 #4): why does
  * variant_wide cost ≈ the interpreted JMESPath path while the fused raw
  * scan wins 4×? Hypotheses measured:
  *   (a) the gate's shape double-parses — predicate pushdown substitutes
  *       the `v = parse_json(doc)` alias into the filter, so the Variant
  *       builds once in the filter and once in the project;
  *   (b) even parsed ONCE (a nondeterministic barrier column blocks the
  *       pushdown), parse_json must still materialize the full binary
  *       tree per record — the same work class as the interpreted
  *       engine's JValue parse, which is exactly what the fused raw
  *       streaming scan avoids.
  * min-of-5 timings at sf0.1. */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.compile.LowerJmesPathRule.LowerConfKey, "true")

    def force(df: DataFrame): Unit = {
      val cols = df.columns.map(col)
      df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head()
    }
    def minOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // parse-once barrier form: rand() in the parsing projection blocks
    // predicate pushdown, so the filter reads the ALREADY-BUILT Variant
    val base = SparkEntry.table(spark, dir, "events")
      .withColumn("doc", SparkEntry.wideDocPublic)
    def parseOnce = base
      .select(col("event_id"), expr("parse_json(doc)").as("v"),
        rand(7).as("__barrier"))
      .where(expr("variant_get(v, '$.k', 'double') >= 50 AND " +
        "array_size(variant_get(v, '$.tags', 'array<string>')) = 2"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'double')").as("k"),
        expr("variant_get(v, '$.tags[0]', 'string')").as("tag0"),
        expr("variant_get(v, '$.meta.u', 'double')").as("mu"),
        expr("element_at(variant_get(v, '$.nums', 'array<double>'), -1)").as("nlast"))

    val cells: Seq[(String, () => DataFrame)] = Seq(
      ("variant_wide (gate)", () => SparkEntry.queries("variant_wide")(spark, dir)),
      ("variant parse-once", () => parseOnce),
      ("jmes_wide (fused raw)", () => SparkEntry.queries("jmes_wide")(spark, dir)),
      ("parse_json only", () => base.select(
        expr("variant_get(parse_json(doc), '$.k', 'double')").as("k"))))
    cells.foreach { case (_, f) => force(f()) } // warm
    for ((label, f) <- cells)
      println(f"[probe] $label%-24s ${minOf(5)(force(f()))}%.3f s")
    spark.stop()
  }
}
