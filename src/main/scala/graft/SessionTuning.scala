package graft

import org.apache.spark.sql.SparkSession

/** Session-level tunings every graft entry point applies (Bench, Verify, the
  * CLI, the test ProdSession). Each is runtime-mutable SQL conf, so a user
  * embedding the library can apply the same with `spark.conf.set`.
  *
  * `objectHashAggregate.sortBased.fallbackThreshold` (default 128): any
  * `ObjectHashAggregateExec` — every `TypedImperativeAggregate`, i.e. our
  * native top-k family and `collect_list` — abandons hash aggregation and
  * SORTS THE ENTIRE REMAINING INPUT once a task's hash map sees more than
  * this many DISTINCT KEYS. 128 is calamitous for top-k: the buffers are
  * strictly k-bounded (k·16 bytes + object header per group), so hashing
  * 64K groups per task costs ~tens of MB, while the fallback re-sorts the
  * full pre-aggregation input (measured: the bitext_mine dual top-k over
  * the 2M-row exploded sim matrix went 2.6 s → 1.4 s at sf0.1 when the
  * fallback stopped firing). 65536 keeps worst-case task memory bounded
  * (64K × ~250 B ≈ 16 MB for top-k buffers) while covering every gate's
  * group cardinality; at cluster scale tune to taste — the partial
  * aggregate's map is per-task, not per-executor. */
object SessionTuning {
  val ObjectHashFallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  val ObjectHashFallbackValue = "65536"

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config(ObjectHashFallbackKey, ObjectHashFallbackValue)
}
