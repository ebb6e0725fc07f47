package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** item_cooc floor diagnosis (VERDICT r14 #2): min-of-N stage timings in
  * one JVM (minimum is the honest value under bursty host contention),
  * plus the ObjectHashAggregate-threshold A/B on the basket collect_set. */
object CoocProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def minOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def force(df: DataFrame): Unit = {
      val cols = df.columns.map(col)
      df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head()
    }

    val li = SparkEntry.table(spark, dir, "lineitem")
    def baskets = li.select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .groupBy("basket")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .where(size(col("items")) <= 256)

    // warm
    force(graft.ext.Assoc.queries("item_cooc")(spark, dir))

    for (thr <- Seq("65536", "128")) {
      spark.conf.set(graft.SessionTuning.ObjectHashFallbackKey, thr)
      println(f"[probe] thr=$thr basket-agg only        ${minOf(3)(force(baskets.select(sum(size(col("items"))))))}%.3f s")
      println(f"[probe] thr=$thr full item_cooc         ${minOf(3)(force(graft.ext.Assoc.queries("item_cooc")(spark, dir)))}%.3f s")
    }
    spark.conf.set(graft.SessionTuning.ObjectHashFallbackKey, "65536")
    // pair explode + count agg only (no metric tail)
    val itemsDf = baskets
    def pairsOnly = itemsDf
      .select(explode(flatten(transform(col("items"), (a, i) =>
        transform(slice(col("items"), i + 2, size(col("items"))), b =>
          struct(a.as("a"), b.as("b")))))).as("t"))
      .groupBy("t.a", "t.b").agg(count(lit(1)).as("n"))
    println(f"[probe] pair explode+agg only   ${minOf(3)(force(pairsOnly.agg(sum(col("n")))))}%.3f s")
    spark.stop()
  }
}
