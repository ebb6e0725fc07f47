package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.{ProdSession, SparkEntry}

/** Gates for the APPROXIMATE twins of the exact `distinct_users` /
  * `event_quantiles` driver rows. The sketches are what a 100 TB deployment
  * runs — one pass, bounded memory per group, mergeable partial state — but
  * their outputs are estimator-specific (HLL++ register layout, KLL/GK
  * compaction schedule), so they can never hash-match a DuckDB oracle; the
  * gate here is the published error envelope against the exact answer
  * computed in the same engine, plus the plan property that makes them
  * scale: partial aggregation BEFORE the exchange, so the shuffle carries
  * one sketch per group per partition instead of the raw rows. */
class SketchSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = ProdSession.spark

  private def events = SparkEntry.table(spark, sfDir, "events")

  test("approx_count_distinct tracks exact cardinality within rsd envelope") {
    val rsd = 0.02
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      // 5·rsd: rsd is one standard deviation of the HLL++ estimator
      assert(math.abs(a - e) <= math.max(1.0, 5 * rsd * e),
        s"$k: approx $a vs exact $e outside 5·rsd")
    }
  }

  test("percentile_approx brackets the exact interpolated percentiles") {
    val exact = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // accuracy 10000 → rank error ≤ n/10000; at sf0.001 that is < 1 rank,
    // but the VALUE can still differ (percentile interpolates, the sketch
    // returns an observed element) — bound by the neighboring quantiles
    val approx = events.groupBy("event_type")
      .agg(expr("approx_percentile(value, 0.5, 10000)").as("p50"),
        expr("approx_percentile(value, 0.99, 10000)").as("p99"),
        expr("percentile(value, 0.45)").as("lo50"),
        expr("percentile(value, 0.55)").as("hi50"),
        expr("percentile(value, 0.98)").as("lo99"),
        max(col("value")).as("hi99"))
      .collect()
    approx.foreach { r =>
      val k = r.getString(0)
      assert(r.getDouble(1) >= r.getDouble(3) && r.getDouble(1) <= r.getDouble(4),
        s"$k p50 ${r.getDouble(1)} outside [p45, p55] around exact ${exact(k)._1}")
      assert(r.getDouble(2) >= r.getDouble(5) && r.getDouble(2) <= r.getDouble(6),
        s"$k p99 ${r.getDouble(2)} outside [p98, max] around exact ${exact(k)._2}")
    }
  }

  test("sketch aggregations partial-aggregate before the one exchange") {
    def shuffles(p: SparkPlan): Int =
      p.collect { case _: ShuffleExchangeExec => () }.size
    def aggs(p: SparkPlan): Int =
      p.collect { case n if n.nodeName.contains("Aggregate") => () }.size
    val hll = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("n"))
      .queryExecution.executedPlan
    assert(shuffles(hll) == 1, s"HLL must shuffle merged sketches only:\n$hll")
    assert(aggs(hll) == 2, s"expected partial+final aggregate pair:\n$hll")
    val pct = events.groupBy("event_type")
      .agg(expr("approx_percentile(value, 0.5, 10000)").as("p"))
      .queryExecution.executedPlan
    assert(shuffles(pct) == 1 && aggs(pct) == 2,
      s"approx_percentile must be partial-then-final:\n$pct")
    // the EXACT countDistinct twin needs a second exchange (distinct
    // expansion) — the measured cost the sketch avoids at scale
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .queryExecution.executedPlan
    assert(shuffles(exact) == 2,
      s"exact countDistinct is expected to cost an extra exchange:\n$exact")
  }
}
