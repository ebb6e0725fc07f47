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
    val src = s0.limit(10)
    val tgt = t0.limit(10)
    // product 100: bound 100 → exact; bound 99 → IVF. Distinguish by plan:
    // the exact path has no joins at all, the IVF path joins probe cells.
    def joins(df: DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.size
    assert(joins(Similarity.bitextAuto(src, tgt, 2, 0.0, exactMaxProduct = 100L)) == 0,
      "product == bound must route exact (join-free plan)")
    assert(joins(Similarity.bitextAuto(src, tgt, 2, 0.0, exactMaxProduct = 99L)) > 0,
      "product > bound must route IVF (probe joins present)")
  }
}
