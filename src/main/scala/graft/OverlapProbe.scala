package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side A/B probe for the source_overlap pattern-table corpus
  * pass (VERDICT r12 item 3): times the gram→source-set collapse under
  * competing aggregation shapes, AQE on and off. Deleted once the shape
  * is settled — the winner lives in ext/Hygiene.gramPatternCounts. */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = SparkEntry.table(spark, sfDir, "documents")

    def pre = docs.select(col("source").cast("string").as("__s"),
      split(col("text"), " ").as("__w"))
    val w = col("__w")
    def gramsRaw = pre.select(col("__s"),
      explode(when(size(w) >= 3,
        transform(sequence(lit(1), size(w) - 2), i =>
          xxhash64(concat_ws(" ", element_at(w, i), element_at(w, i + 1),
            element_at(w, i + 2)))))
        .otherwise(array().cast("array<long>"))).as("gram"))
    def gramsDedup = pre.select(col("__s"),
      explode(array_distinct(when(size(w) >= 3,
        transform(sequence(lit(1), size(w) - 2), i =>
          xxhash64(concat_ws(" ", element_at(w, i), element_at(w, i + 1),
            element_at(w, i + 2)))))
        .otherwise(array().cast("array<long>")))).as("gram"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "old_collect_set" -> (() => gramsRaw
        .groupBy("gram").agg(sort_array(collect_set(col("__s"))).as("srcs"))
        .groupBy("srcs").agg(count(lit(1)).as("cnt"))),
      "adist_collect_set" -> (() => gramsDedup
        .groupBy("gram").agg(sort_array(collect_set(col("__s"))).as("srcs"))
        .groupBy("srcs").agg(count(lit(1)).as("cnt"))),
      "twolevel" -> (() => gramsRaw.where(col("__s").isNotNull).distinct()
        .groupBy("gram").agg(sort_array(collect_list(col("__s"))).as("srcs"))
        .groupBy("srcs").agg(count(lit(1)).as("cnt"))),
      "adist_twolevel" -> (() => gramsDedup.where(col("__s").isNotNull).distinct()
        .groupBy("gram").agg(sort_array(collect_list(col("__s"))).as("srcs"))
        .groupBy("srcs").agg(count(lit(1)).as("cnt"))),
      "nocat_adist_cset" -> (() => pre.select(col("__s"),
          explode(array_distinct(when(size(w) >= 3,
            transform(sequence(lit(1), size(w) - 2), i =>
              xxhash64(element_at(w, i), element_at(w, i + 1),
                element_at(w, i + 2))))
            .otherwise(array().cast("array<long>")))).as("gram"))
        .groupBy("gram").agg(sort_array(collect_set(col("__s"))).as("srcs"))
        .groupBy("srcs").agg(count(lit(1)).as("cnt"))))

    for (aqe <- Seq(true, false); (name, mk) <- variants) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      // warm
      mk().count()
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"aqe=$aqe%-5s $name%-18s median ${times(2)}%.3f s  min ${times.head}%.3f s")
    }
    spark.stop()
  }
}
