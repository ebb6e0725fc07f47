package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ProdSession

/** Measures the property Z-ordering exists for: with per-partition min/max
  * stats (what parquet row groups give a scan planner), a Z-ordered layout
  * prunes well for slices in EITHER dimension, while a single-column sort
  * prunes in its own dimension only. Also pins mortonKey's bijectivity on
  * the masked domain (locality claims are vacuous if the key collapses
  * distinct cells). */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark
  // enough partitions that curve-cell granularity, not partition-boundary
  // straddle, sets the measurement (matches reality: a table has far more
  // row groups than a slice has curve cells)
  private val P = 64

  /** Partitions a min/max-pruning scan of `layout` must read to answer
    * `pred` — partitions whose [min,max] box on the filtered column
    * intersects the predicate's range. */
  private def partitionsRead(layout: DataFrame, dim: String, lo: Long, hi: Long): Long =
    layout
      .select(spark_partition_id().as("pid"), col(dim))
      .groupBy("pid").agg(min(dim).as("mn"), max(dim).as("mx"))
      .where(col("mx") >= lo && col("mn") <= hi)
      .count()

  test("mortonKey is a bijection on the 16-bit × 16-bit grid (sampled)") {
    import spark.implicits._
    val cells = (0 until 64).flatMap(i => (0 until 64).map(j => (i * 1021L, j * 1021L)))
      .toDF("a", "b")
    val keys = cells.select(Layout.mortonKey(col("a") % 65536, col("b") % 65536))
      .distinct().count()
    assert(keys == 64L * 64, "distinct cells must map to distinct keys")
  }

  test("z-order prunes both dimensions; single-column sort prunes only its own") {
    // controlled uniform grid — the regime the layout decision is about
    // (the sf0.001 events table has only 15 distinct users, so a 1/8
    // "slice" of that dimension degenerates to a point query and measures
    // quantization noise, not curve locality)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val e = (1 to 40000)
      .map(i => (i.toLong, rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("event_id", "a", "b").cache()
    try {
      // a 1/16-wide slice per dimension, placed OFF the domain midpoint: a
      // slice straddling the top-level curve split is Z-order's known worst
      // case (it touches both halves of the curve and reads ~2× the
      // partitions — real, but a placement accident, not the average the
      // layout decision is made on)
      val (lo, hi) = (2600L, 2850L)
      val z = Layout.zorderBy(e, col("a"), col("b"), P, bits = 12).cache()
      val byA = e.repartitionByRange(P, col("a")).sortWithinPartitions("a").cache()
      try {
        val zA = partitionsRead(z, "a", lo, hi)
        val zB = partitionsRead(z, "b", lo, hi)
        val sA = partitionsRead(byA, "a", lo, hi)
        val sB = partitionsRead(byA, "b", lo, hi)
        // the single-column layout is great on its own dimension...
        assert(sA <= P / 8, s"a-sorted layout should prune a-slices (read $sA/$P)")
        // ...and useless on the other: every partition spans all of b
        assert(sB >= (3 * P) / 4, s"a-sorted layout should fail b-slices (read $sB/$P)")
        // z-order prunes BOTH dimensions (a 1/16 slice touches ~1 of 8
        // curve octants + straddle, ≈ 1/4 of partitions)...
        assert(zA <= (3 * P) / 8, s"z-order should prune a-slices (read $zA/$P)")
        assert(zB <= (3 * P) / 8, s"z-order should prune b-slices (read $zB/$P)")
        // ...and wins the mixed workload — the criterion for choosing it
        assert(zA + zB < sA + sB,
          s"z-order must win the mixed workload ($zA+$zB vs $sA+$sB)")
      } finally { z.unpersist(); byA.unpersist() }
    } finally e.unpersist()
  }
  test("bucketed co-located join: ZERO exchanges at read time, same rows") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val base = java.nio.file.Files.createTempDirectory("bucketed").toString
    val li = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val or = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "b_li", s"$base/li", Seq("l_orderkey"), 8)
    Layout.writeBucketed(or.withColumnRenamed("o_orderkey", "l_orderkey"),
      "b_or", s"$base/or", Seq("l_orderkey"), 8)
    try {
      val j = spark.table("b_li").join(spark.table("b_or"), "l_orderkey")
      val p = j.queryExecution.executedPlan
      assert(p.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        s"bucketed layout must satisfy the join's partitioning at scan time:\n$p")
      // the layout changes the PLAN, never the ANSWER
      val plain = li.join(or.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
      assert(j.count() == plain.count() && j.count() > 0)
      val gotSum = j.agg(sum(col("l_quantity"))).head().getDouble(0)
      val expSum = plain.agg(sum(col("l_quantity"))).head().getDouble(0)
      assert(gotSum == expSum)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_li")
      spark.sql("DROP TABLE IF EXISTS b_or")
    }
  }

  test("compaction planner: partition count tracks on-disk bytes over target") {
    val docs = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "documents")
    val total = docs.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    assert(total > 0)
    // a quarter-of-total target must ask for 4 partitions (ceil division)
    val n4 = Layout.compactionPartitions(docs, (total + 3) / 4)
    assert(n4 == 4 || n4 == 5, s"expected ~4 partitions, got $n4")
    // a target above the total collapses to ONE file; never zero
    assert(Layout.compactionPartitions(docs, total * 2) == 1)
    // the rewrite really produces that many files
    val out = java.nio.file.Files.createTempDirectory("compact").toString + "/out"
    Layout.compacted(docs, (total + 3) / 4).write.parquet(out)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == n4, s"expected $n4 output files, got $files")
  }
  test("mortonKeyN(3 dims, 10 bits) is a bijection on a sampled grid") {
    import spark.implicits._
    val pts = for (a <- 0 until 32; b <- 0 until 32; c <- 0 until 32)
      yield (a.toLong * 33L, b.toLong * 31L % 1024L, c.toLong * 29L % 1024L)
    val keys = pts.toDF("a", "b", "c")
      .select(Layout.mortonKeyN(Seq(col("a"), col("b"), col("c")), 10).as("k"))
      .as[Long].collect()
    assert(keys.distinct.length == pts.distinct.length,
      "distinct inputs must map to distinct 30-bit keys")
    assert(keys.forall(k => k >= 0 && k < (1L << 30)))
  }
}
