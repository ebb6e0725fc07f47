package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ProdSession

/** Plan gates for [[Olap]] (every subtotal level from ONE scan) and
  * behavioral gates for [[Hygiene.weightedSample]]. */
class OlapSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = ProdSession.spark

  private def physical(name: String): SparkPlan =
    graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
  private def count(p: SparkPlan)(pf: PartialFunction[SparkPlan, Unit]): Int =
    p.collect { case n if pf.isDefinedAt(n) => n }.size

  test("cube_agg: one scan, one Expand, one aggregation exchange") {
    val p = physical("cube_agg")
    assert(count(p) { case _: FileSourceScanExec => } == 1,
      s"cube_agg must produce all levels from a single scan (no per-level UNION):\n$p")
    assert(count(p) { case _: ExpandExec => } == 1, s"cube_agg plans without Expand:\n$p")
    // partial agg collapses before the one exchange
    assert(count(p) { case _: ShuffleExchangeExec => } == 1,
      s"cube_agg should shuffle only pre-aggregated level rows:\n$p")
  }

  test("twoPhaseRollup on an EMPTY fact table matches native rollup (no rows)") {
    // ADVICE r13 #4 (corrected empirically): Spark's native .rollup
    // computes the grand total as a grouping-id GROUP, so an empty fact
    // table yields ZERO rows at every level — the old global-agg grand
    // level fabricated one row with NULL merges; a drop-in consumer must
    // see the native shape
    import spark.implicits._
    val empty = Seq.empty[(String, String, Long)].toDF("a", "b", "v")
    val nRows = org.apache.spark.sql.functions.count(lit(1))
    val native = empty.rollup(col("a"), col("b"))
      .agg(nRows.as("n"), sum(col("v")).as("s")).collect()
    assert(native.isEmpty, s"native rollup semantics changed: ${native.toSeq}")
    val got = Olap.twoPhaseRollup(empty, Seq("a", "b"),
      Seq(Olap.Measure.counted("n", nRows),
        Olap.Measure.summed("s", sum(col("v"))))).collect()
    assert(got.isEmpty, s"expected native empty-table shape (no rows), got ${got.toSeq}")
    // and on a NON-empty table the grand-total row is present with exact counts
    val one = Seq(("x", "y", 5L)).toDF("a", "b", "v")
    val rows = Olap.twoPhaseRollup(one, Seq("a", "b"),
      Seq(Olap.Measure.counted("n", nRows),
        Olap.Measure.summed("s", sum(col("v"))))).collect()
    assert(rows.length == 3) // (a,b), (a), ()
    val grand = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getLong(4) == 1L && grand.getLong(5) == 5L)
  }

  test("rollup_agg: two-phase — one un-replicated scan, NO Expand, reused base") {
    // the round-13 shape: the fact table streams once (ReuseExchange dedupes
    // the identical base aggregation under every level branch) and no Expand
    // replicates the scan stream; re-aggregation exchanges carry only the
    // tiny group table
    val p = physical("rollup_agg")
    assert(count(p) { case _: FileSourceScanExec => } == 1,
      s"two-phase rollup must still scan the fact table exactly once:\n$p")
    assert(count(p) { case _: ExpandExec => } == 0,
      s"two-phase rollup must not replicate the scan stream via Expand:\n$p")
  }

  test("twoPhaseRollup: differential vs Spark's native rollup (values + flags)") {
    val li = graft.SparkEntry.table(spark, sfDir, "lineitem")
    val native = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).as("__g_l_returnflag"),
        grouping(col("l_linestatus")).as("__g_l_linestatus"),
        org.apache.spark.sql.functions.count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_cents"))
    val two = Olap.twoPhaseRollup(li, Seq("l_returnflag", "l_linestatus"),
      Seq(Olap.Measure.summed("n", org.apache.spark.sql.functions.count(lit(1))),
        Olap.Measure.summed("sum_qty", sum(col("l_quantity"))),
        Olap.Measure.summed("sum_cents",
          sum(round(col("l_extendedprice") * 100).cast("long")))))
      .select(native.columns.map(col): _*) // same column order
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    assert(canon(two) == canon(native))
  }

  test("weightedSample: deterministic, monotone in scale, rate tracks weight") {
    import spark.implicits._
    val docs = (1L to 4000L).map(i => (i, 100 + (i % 400).toInt))
      .toDF("doc_id", "n_chars")
    def ids(scale: Long): Set[Long] =
      Hygiene.weightedSample(docs, col("doc_id"), col("n_chars"), scale)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(4000000L)
    assert(a == ids(4000000L), "same scale must select the same rows")
    assert(a.subsetOf(ids(8000000L)), "doubling scale must only add rows")
    // E[fraction] = avg(n_chars)·scale/2^32 ≈ 300·4e6/2^32 ≈ 27.9%
    assert(a.size > 800 && a.size < 1500, s"fraction off: ${a.size}/4000")
    // heavier rows must be sampled at a measurably higher rate
    val byW = Hygiene.weightedSample(docs, col("doc_id"), col("n_chars"), 4000000L)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val base = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(byW > base + 20, s"sampled mean weight $byW ≤ corpus mean $base")
  }
}
