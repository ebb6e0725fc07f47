package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.{ProdSession, SparkEntry}

/** The r15 fused exact bitext miner (plan-baked src matrix, two narrow tgt
  * scans, zero matrix joins — [[Similarity.bitextMine]]) must be BIT-EXACT
  * against the retained join form ([[Similarity.bitextMineJoin]]): same
  * pairs, same sims, same margins — on the real sf0.001 halves and on an
  * awkward corpus with zero-norm vectors (NULL cosines) and duplicate
  * embeddings (score ties broken by id). */
class BitextFusedSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark
  import spark.implicits._

  private def collectMine(df: DataFrame): Set[(Long, Long, Double, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet

  test("fused == join form on the sf0.001 even/odd halves (bit-exact)") {
    val emb = SparkEntry.table(spark, "/root/testdata/sf0.001", "embeddings")
    val src = emb.where(col("vec_id") % 2 === 0)
    val tgt = emb.where(col("vec_id") % 2 === 1)
    for (thr <- Seq(1.0, 0.0)) { // 0.0 keeps every mutual pair → more surface
      val fused = collectMine(Similarity.bitextMine(src, tgt, k = 4, thr))
      val join = collectMine(Similarity.bitextMineJoin(src, tgt, k = 4, thr))
      assert(fused == join, s"thr=$thr: fused ${fused.size} vs join ${join.size}")
      assert(fused.nonEmpty, "gate corpus must mine at least one pair")
    }
  }

  test("fused == join form with zero-norm vectors and duplicate embeddings") {
    def vec(seed: Int): Seq[Float] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toFloat)
    val rows =
      (0L until 40L).map { i =>
        val v = if (i % 9 == 0) Seq.fill(8)(0.0f) // zero norm → NULL cosine
        else vec((i % 11).toInt) // heavy duplicates → ties broken by id
        (i, v)
      }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val src = df.where(col("vec_id") % 2 === 0)
    val tgt = df.where(col("vec_id") % 2 === 1)
    val fused = collectMine(Similarity.bitextMine(src, tgt, k = 3, 0.0))
    val join = collectMine(Similarity.bitextMineJoin(src, tgt, k = 3, 0.0))
    assert(fused == join, s"fused $fused\njoin $join")
  }

  test("NULL src embeddings/ids drop like the join form — never NPE (ADVICE r15 #1)") {
    import org.apache.spark.sql.types._
    def vec(seed: Int): Seq[Float] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toFloat)
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = true),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    def rowsFor(withNulls: Boolean): Seq[Row] =
      (0L until 30L).flatMap { i =>
        if (i % 10 == 3)
          if (withNulls) Seq(Row(Long.box(i), null)) else Nil
        else Seq(Row(Long.box(i), vec(i.toInt)))
      }
    def df(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val tgt = df(rowsFor(withNulls = false)).where(col("vec_id") % 2 === 1)
    val srcNulls = df(rowsFor(withNulls = true)).where(col("vec_id") % 2 === 0)
    val srcClean = df(rowsFor(withNulls = false)).where(col("vec_id") % 2 === 0)
    // a NULL src embedding in the join form yields NULL cosines that fall
    // out of its inner joins; the fused form must drop it identically
    // instead of NPE-ing in the matrix bake
    val fusedN = collectMine(Similarity.bitextMine(srcNulls, tgt, k = 3, 0.0))
    val joinN = collectMine(Similarity.bitextMineJoin(srcNulls, tgt, k = 3, 0.0))
    assert(fusedN == joinN, s"fused $fusedN\njoin $joinN")
    assert(fusedN == collectMine(Similarity.bitextMine(srcClean, tgt, k = 3, 0.0)))
    // a NULL vec_id row drops as a whole (no NPE, no phantom group)
    val nullId = df(rowsFor(withNulls = false) :+ Row(null, vec(5)))
      .where(col("vec_id").isNull || col("vec_id") % 2 === 0)
    assert(collectMine(Similarity.bitextMine(nullId, tgt, k = 3, 0.0)) ==
      collectMine(Similarity.bitextMine(srcClean, tgt, k = 3, 0.0)))
  }

  test("EVERY src row NULL-keyed hits the empty-matrix early return (VERDICT r16 item 7)") {
    // a NON-empty src whose every row fails the NULL guard must take the
    // srcRows.isEmpty early return (Similarity.scala matrix bake) — the
    // shape a corrupt upstream batch produces: no NPE, no zero-column
    // matrix literal, the empty correctly-shaped result
    import org.apache.spark.sql.types._
    def vec(seed: Int): Seq[Float] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toFloat)
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = true),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    val allNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(null, vec(1)), Row(Long.box(2L), null), Row(null, null)), 2), schema)
    val tgt = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 9L by 2).map(i => Row(Long.box(i), vec(i.toInt))), 2), schema)
    assert(allNull.count() == 3, "src must be non-empty (the guard, not count, drops it)")
    val r = Similarity.bitextMine(allNull, tgt, k = 3, 0.0)
    assert(r.columns.toSeq == Seq("src_id", "tgt_id", "sim", "margin"))
    assert(r.count() == 0)
  }

  test("empty src or tgt yields an empty, correctly-shaped result") {
    val emb = SparkEntry.table(spark, "/root/testdata/sf0.001", "embeddings")
    val none = emb.where(lit(false))
    val r1 = Similarity.bitextMine(none, emb.limit(5), 4, 1.0)
    val r2 = Similarity.bitextMine(emb.limit(5), none, 4, 1.0)
    for (r <- Seq(r1, r2)) {
      assert(r.columns.toSeq == Seq("src_id", "tgt_id", "sim", "margin"))
      assert(r.count() == 0)
    }
  }

  test("fused plan: no join of the matrix — the only join is the tiny mutual-best one") {
    val emb = SparkEntry.table(spark, "/root/testdata/sf0.001", "embeddings")
    val src = emb.where(col("vec_id") % 2 === 0)
    val tgt = emb.where(col("vec_id") % 2 === 1)
    val p = Similarity.bitextMine(src, tgt, 4, 1.0).queryExecution.executedPlan
    val bnl = p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.isEmpty, s"fused miner must not cross-join the matrix:\n$p")
    val cart = p.collect {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(cart.isEmpty)
  }
}
