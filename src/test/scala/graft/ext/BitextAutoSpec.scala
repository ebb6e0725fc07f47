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
