package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ProdSession

/** Behavioral gates for [[Similarity.bitextMine]] beyond the driver's
  * oracle row: the mutual-NN contract, the hub-rejection property the
  * ratio margin exists for, and a Scala brute-force differential. */
class BitextSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("bitextMine: paired clusters matched; a hub near everything is " +
      "rejected by the margin where raw cosine would accept it") {
    import spark.implicits._
    // three well-separated directions; src i pairs with tgt i
    val src = Seq(
      (0L, vec(1, 0, 0, 0.1)),
      (2L, vec(0, 1, 0, 0.1)),
      (4L, vec(0, 0, 1, 0.1)),
      // the hub: moderate cosine to EVERY tgt — its own top-k average is
      // as high as its best edge, so margin ≈ 1 and it cannot clear a
      // threshold the true pairs clear
      (6L, vec(1, 1, 1, 0.1))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, vec(0.95, 0.05, 0, 0.1)),
      (3L, vec(0.05, 0.95, 0, 0.1)),
      (5L, vec(0, 0.05, 0.95, 0.1))).toDF("vec_id", "embedding")
    val got = Similarity.bitextMine(src, tgt, k = 3, marginThreshold = 1.05)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (2L, 3L), (4L, 5L)),
      s"true pairs kept, hub 6 rejected; got $got")
    // with the margin disabled (threshold 0) the hub's best edge appears —
    // proving rejection came from the margin, not from mutuality
    val loose = Similarity.bitextMine(src, tgt, k = 3, marginThreshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.size >= 3 && got.subsetOf(loose))
  }

  test("bitextMineIvf: recall vs the exact miner on the gate halves") {
    val emb = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "embeddings")
    val src = emb.where(col("vec_id") % 2 === 0)
    val tgt = emb.where(col("vec_id") % 2 === 1)
    val exact = Similarity.bitextMine(src, tgt, k = 4, marginThreshold = 1.0)
      .select("src_id", "tgt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.bitextMineIvf(src, tgt, k = 4, marginThreshold = 1.0,
        nCells = 16, nProbe = 4)
      .select("src_id", "tgt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6,
      s"IVF mining recall $recall too low (${ivf.size} ivf vs ${exact.size} exact)")
  }

  test("bitextMine: random vectors equal a plain-Scala reimplementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 6; val k = 3
    def rv() = Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat)
    val a = (0 until 40).map(i => (i.toLong * 2, rv()))
    val b = (0 until 35).map(i => (i.toLong * 2 + 1, rv()))
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- 0 until dim) {
        d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i)
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    def topk(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
      xs.sortBy { case (id, s) => (-s, id) }.take(k)
    val fwd = a.map { case (ai, av) =>
      ai -> topk(b.map { case (bi, bv) => (bi, cos(av, bv)) }) }.toMap
    val bwd = b.map { case (bi, bv) =>
      bi -> topk(a.map { case (ai, av) => (ai, cos(av, bv)) }) }.toMap
    val expect = (for {
      (ai, nbs) <- fwd.toSeq
      (bi, s) = nbs.head
      if bwd(bi).head._1 == ai
      m = s / (0.5 * (nbs.map(_._2).sum / nbs.size) +
        0.5 * (bwd(bi).map(_._2).sum / bwd(bi).size))
      if m >= 1.0
    } yield (ai, bi)).toSet
    val got = Similarity.bitextMine(a.toDF("vec_id", "embedding"),
        b.toDF("vec_id", "embedding"), k = k, marginThreshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"got ${got.size} expect ${expect.size}")
  }
}
