package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{ProdSession, SparkEntry}

/** [[Similarity.bitextAuto]] routing (VERDICT r14 item 5): the product
  * boundary is exact, and each side of it is the verbatim output of the
  * routed form. */
class BitextAutoSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark

  private def halves: (DataFrame, DataFrame) = {
    val emb = SparkEntry.table(spark, "/root/testdata/sf0.001", "embeddings")
    (emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 === 1))
  }
  private def rows(df: DataFrame): Set[(Long, Long, Double, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet

  test("below the product bound: auto == exact miner, verbatim") {
    val (src, tgt) = halves
    assert(rows(Similarity.bitextAuto(src, tgt, 4, 1.0)) ==
      rows(Similarity.bitextMine(src, tgt, 4, 1.0)))
  }

  test("above the product bound: auto == IVF miner with suggestIvf(|tgt|) geometry") {
    val (src, tgt) = halves
    val p = Tuning.suggestIvf(tgt.count())
    assert(rows(Similarity.bitextAuto(src, tgt, 4, 1.0, exactMaxProduct = 1L)) ==
      rows(Similarity.bitextMineIvf(src, tgt, 4, 1.0,
        nCells = p.nCells, nProbe = p.nProbe)))
  }

  test("routing arithmetic at the default 10^7 boundary, non-square shapes (r15 item 7)") {
    val bound = Tuning.BitextExactMaxProduct
    assert(bound == 10_000_000L)
    // non-square shapes straddling the boundary exactly: the predicate is
    // the overflow-safe ns <= bound/nt, proven ≡ ns·nt <= bound for
    // integer ns — these pin the equivalence where floor division could
    // plausibly bite (nt not dividing the bound)
    assert(Similarity.bitextRoutesExact(4L, 2_500_000L, bound))       // == bound
    assert(!Similarity.bitextRoutesExact(4L, 2_500_001L, bound))      // 4 over
    assert(Similarity.bitextRoutesExact(3L, 3_333_333L, bound))       // 9,999,999
    assert(!Similarity.bitextRoutesExact(3L, 3_333_334L, bound))      // 10,000,002
    assert(Similarity.bitextRoutesExact(9_999_999L, 1L, bound))
    assert(!Similarity.bitextRoutesExact(10_000_001L, 1L, bound))
    // wildly asymmetric and overflow territory: the product of these two
    // would overflow a Long ~5000x over; the division form must still rout
    assert(!Similarity.bitextRoutesExact(10_000_000_000L, 10_000_000_000L, bound))
    // empty either side is trivially exact (the miner returns empty fast)
    assert(Similarity.bitextRoutesExact(0L, 10_000_000_000L, bound))
    assert(Similarity.bitextRoutesExact(10_000_000_000L, 0L, bound))
  }

  test("the boundary is inclusive: product == bound stays exact, one more pair routes IVF") {
    val (s0, t0) = halves
    // id filters, not limit(10): a GlobalLimit inserts its own exchange
    // and would muddy the shuffle-count discriminator below
    val src = s0.where(col("vec_id") < 20)  // even ids 0..18 → 10 rows
    val tgt = t0.where(col("vec_id") < 20)  // odd ids 1..19 → 10 rows
    // product 100: bound 100 → exact; bound 99 → IVF. Distinguish by plan:
    // the exact path is shuffle-free (one narrow scan + a broadcast-hash
    // join against the driver-built forward table), the IVF path shuffles
    // through its dual top-k aggregation.
    def shuffles(df: DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }.size
    assert(shuffles(Similarity.bitextAuto(src, tgt, 2, 0.0, exactMaxProduct = 100L)) == 0,
      "product == bound must route exact (shuffle-free plan)")
    assert(shuffles(Similarity.bitextAuto(src, tgt, 2, 0.0, exactMaxProduct = 99L)) > 0,
      "product > bound must route IVF (aggregation shuffles present)")
  }
}
