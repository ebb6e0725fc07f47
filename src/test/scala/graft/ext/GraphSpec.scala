package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ProdSession

/** [[Graph]]: connected components vs an independent JVM union-find over
  * random graphs, the loud non-convergence contract, and fixed-point
  * PageRank vs an exact JVM integer mirror (plus partitioning
  * determinism — the property the integer formulation exists for). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  test("connectedComponents == union-find on random graphs (3 seeds, BOTH regimes)") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 150).map(_ =>
        (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter(e => e._1 != e._2)
      val want = unionFind(100, edges)
      // default routing: 150 edges ≤ driverEdges → the r18 driver-side
      // union-find regime
      val got = Graph.connectedComponents(
          edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed $seed (driver regime)")
      // driverEdges = -1 forces the distributed min-label loop: both
      // regimes must produce the identical labeling
      val gotDist = Graph.connectedComponents(
          edges.toDF("a", "b"), "a", "b", driverEdges = -1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == want, s"seed $seed (distributed regime)")
    }
  }

  test("connectedComponents: a diameter past maxIter fails loudly (distributed regime)") {
    import spark.implicits._
    // a 30-node path has diameter 29 — maxIter 3 cannot converge in the
    // min-label loop (the driver regime has no iteration cap: force the
    // distributed path, whose contract this pins)
    val path = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Graph.connectedComponents(path, "a", "b", maxIter = 3, driverEdges = -1L)
    }
    assert(e.getMessage.contains("not converged"))
    // and with enough rounds the same path collapses to component 0
    val ok = Graph.connectedComponents(path, "a", "b", maxIter = 40,
        driverEdges = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(0L) && ok.size == 30)
    // the driver regime handles the same long-diameter path with no cap
    val drv = Graph.connectedComponents(path, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv == ok)
  }

  private def jvmPagerank(edges: Seq[(String, String)], iters: Int,
                          scale: Long = 1000000000L): Map[String, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val teleport = scale * 15 / 100
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val acc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => acc(v) += r(u) / out(u) }
      r = nodes.map(v => v -> (acc(v) * 85 / 100 + teleport)).toMap
    }
    r
  }

  test("pagerankInt == the exact JVM integer mirror; partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (1 to 200).map(_ =>
      (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}")).distinct
      .filter(e => e._1 != e._2)
    val want = jvmPagerank(edges, iters = 5)
    val df = edges.toDF("s", "d")
    val got = Graph.pagerankInt(df, "s", "d", iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // integer arithmetic is summation-order-independent: a different
    // physical partitioning must produce the identical ranks
    val reparted = Graph.pagerankInt(df.repartition(7), "s", "d", iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reparted == got)
  }

  test("pagerankInt long-keyed: driver and distributed regimes are bit-identical") {
    import spark.implicits._
    // long ids route to the r18 driver regime by default; driverEdges=-1
    // forces the distributed loop — both must match the JVM mirror bit
    // for bit (pure integer arithmetic)
    val rnd = new scala.util.Random(13)
    val edges = (1 to 200).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).distinct
      .filter(e => e._1 != e._2)
    val want = jvmPagerank(edges.map { case (a, b) => (a.toString, b.toString) },
      iters = 5).map { case (k, v) => k.toLong -> v }
    val df = edges.toDF("s", "d")
    val drv = Graph.pagerankInt(df, "s", "d", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv == want, "driver regime vs JVM mirror")
    val dist = Graph.pagerankInt(df, "s", "d", iters = 5, driverEdges = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == drv, "distributed regime must match the driver regime")
  }

  test("pagerank gate: a source-less node earns exactly the teleport mass") {
    import spark.implicits._
    val df = Seq(("a", "b"), ("b", "c")).toDF("s", "d") // nothing points at a
    val got = Graph.pagerankInt(df, "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 150000000L)
    assert(got("b") > got("a") && got("c") > got("a"))
  }
  test("triangleCount == brute force on random graphs; star and clique pins") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 400).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val df = edges.toDF("u", "v")
    val got = Graph.triangleCount(df).collect().head
    val es = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var want = 0L
    for (i <- nodes; j <- nodes if i < j && es((i, j));
         k <- nodes if j < k && es((j, k)) && es((i, k))) want += 1
    assert(got.getLong(0) == nodes.size && got.getLong(1) == edges.size)
    assert(got.getLong(2) == want, s"brute force says $want")
    assert(want > 0, "fixture must contain triangles")
    // a star has zero triangles regardless of hub degree (the orientation
    // pushes every hub edge outward: zero wedges materialize at the hub)
    val star = (1L to 50L).map(i => (0L, i)).toDF("u", "v")
    assert(Graph.triangleCount(star).collect().head.getLong(2) == 0L)
    // K5 has C(5,3) = 10
    val k5 = (for (i <- 0L to 4L; j <- 0L to 4L if i < j) yield (i, j)).toDF("u", "v")
    assert(Graph.triangleCount(k5).collect().head.getLong(2) == 10L)
  }

  test("null edge endpoints are dropped identically in BOTH regimes (r19)") {
    import spark.implicits._
    // ADVICE r18 #1: a null endpoint used to NPE the driver regime while
    // the distributed loop silently carried it — both must now agree
    val edges = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(2L), None))
      .toDF("a", "b")
    val drv = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.connectedComponents(edges, "a", "b", driverEdges = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv == Map(1L -> 1L, 2L -> 1L))
    assert(dist == drv)
    val prDrv = Graph.pagerankInt(edges.toDF("s", "d"), "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prDist = Graph.pagerankInt(edges.toDF("s", "d"), "s", "d", iters = 2,
        driverEdges = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prDrv.keySet == Set(1L, 2L) && prDist == prDrv)
  }

  test("cooccurrenceEdges: distinct pairs within group only") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 40L), (3L, 50L)).toDF("g", "i")
    val got = Graph.cooccurrenceEdges(df, org.apache.spark.sql.functions.col("g"),
        org.apache.spark.sql.functions.col("i"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 20L), (10L, 30L), (20L, 30L), (10L, 40L)))
  }
}
