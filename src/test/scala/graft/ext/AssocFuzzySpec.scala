package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.ProdSession

/** Brute-force differentials for [[Assoc.itemCooc]] and [[Fuzzy.fuzzyJoin]]
  * plus the plan guarantees their 100 TB story rests on (no cartesian
  * anywhere in the fuzzy join — the blocked candidate join must be an
  * equi-join on the variant key). */
class AssocFuzzySpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark

  test("itemCooc: hand-computed metrics; mega-basket dropped whole") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 20L), // duplicate item in one basket
      (4L, 30L), (4L, 40L),
      // basket 5 exceeds the cap of 3 → dropped whole, excluded from N
      (5L, 10L), (5L, 20L), (5L, 30L), (5L, 40L))
      .toDF("b", "i")
    val got = Assoc.itemCooc(rows, col("b"), col("i"),
        minPairCount = 2L, maxBasketItems = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))))
      .toMap
    // retained baskets: {10,20,30}, {10,20}, {10,20}, {30,40} → N=4
    // n(10)=3 n(20)=3 n(30)=2 n(40)=1; pair (10,20) in 3 baskets
    assert(got.keySet == Set((10L, 20L)),
      s"only (10,20) reaches minPairCount=2; got ${got.keySet}")
    val (np, na, nb, sup, cab, cba, lift) = got((10L, 20L))
    assert(np == 3L && na == 3L && nb == 3L)
    assert(sup == 3.0 / 4.0 && cab == 1.0 && cba == 1.0)
    assert(lift == (3.0 * 4.0) / (3.0 * 3.0))
  }

  test("itemCooc: random baskets match an independent brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val raw = (1 to 1200).map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(30).toLong))
    val df = raw.toDF("b", "i")
    val got = Assoc.itemCooc(df, col("b"), col("i"), minPairCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val baskets = raw.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val brute = baskets.flatMap(s =>
        s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    assert(got == brute)
  }

  test("absorbCoocBatch: maintained == one-shot after 3 batches; replay idempotent") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val raw = (1 to 900).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(25).toLong))
    val df = raw.toDF("b", "i")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    val oneShot = rows(Assoc.itemCooc(df, col("b"), col("i"), minPairCount = 2L))
    val root = java.nio.file.Files.createTempDirectory("coocspec").toString
    // basket-atomic split by key residue
    var last: Map[(Long, Long), (Long, Long, Long, Double, Double, Double, Double)] = null
    for (m <- 0 to 2)
      last = rows(Assoc.absorbCoocBatch(spark, root, m.toLong,
        df.where(col("b") % 3 === m), col("b"), col("i"), minPairCount = 2L))
    assert(last == oneShot, "maintained table must equal the one-shot computation")
    // replaying the last batch (crash-before-commit recovery) recomputes
    // against the pre-batch snapshot: identical output, no double count
    val replayed = rows(Assoc.absorbCoocBatch(spark, root, 2L,
      df.where(col("b") % 3 === 2), col("b"), col("i"), minPairCount = 2L))
    assert(replayed == oneShot, "replay must not double-absorb")
  }

  test("streaming co-occurrence over the shard source: stop/restart == one-shot") {
    // baskets ride the stream WHOLE (one record per order, items joined
    // by comma) so batch boundaries cannot split a basket — the operator's
    // documented precondition; kill after the first trigger, resume from
    // the checkpoint, final metrics must equal the one-shot itemCooc
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.ShardStream
    val li = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
    val baskets = li.groupBy("b")
      .agg(concat_ws(",", sort_array(collect_set(col("i")))).as("items"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val base = java.nio.file.Files.createTempDirectory("coocstream").toString
    val streamDir = s"$base/stream"
    ShardStream.writeShardDir(streamDir, baskets.toSeq.map { case (b, items) =>
      ("s0", f"$b%012d", b.toString, items, 1700000000000L + b) })
    type M = Map[(Long, Long), (Long, Long, Long)]
    def run(stateDir: String, ckpt: String, trigger: Trigger): M = {
      var last: M = Map.empty
      val src = spark.readStream.format("kinesiscat")
        .option("path", streamDir).option("startingPosition", ShardStream.TrimHorizon)
        .option("batchSize", "400").load()
        .select(col("partitionKey").cast("long").as("b"),
          explode(split(col("data").cast("string"), ",")).as("i0"))
        .select(col("b"), col("i0").cast("long").as("i"))
      val q = Assoc.coocStream(src, stateDir, col("b"), col("i")) { rep =>
        last = rep.collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      }.option("checkpointLocation", ckpt).trigger(trigger).start()
      q.awaitTermination()
      last
    }
    val oneShot: M = Assoc.itemCooc(li, col("b"), col("i")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val unbroken = run(s"$base/stA", s"$base/ckptA", Trigger.AvailableNow())
    assert(unbroken == oneShot, "uninterrupted stream must match one-shot")
    run(s"$base/stB", s"$base/ckptB", Trigger.Once()) // killed mid-corpus
    val resumed = run(s"$base/stB", s"$base/ckptB", Trigger.AvailableNow())
    assert(resumed == oneShot, "resumed stream must match one-shot")
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzyJoin: equals O(n²) brute force at maxDist 1 and 2 " +
      "(indels, repeats, empty and length-1 strings)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // small alphabet + varied length → dense near-matches incl. indels
    val strs = (("" +: "a" +: (1 to 120).map(_ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
      ).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = Fuzzy.fuzzyJoin(df, df, col("id"), col("s"), col("id"), col("s"), d)
        .where(col("left_id") < col("right_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val brute = (for {
        (i, a) <- strs; (j, b) <- strs
        if i < j && lev(a, b) <= d
      } yield (i, j) -> lev(a, b).toLong).toMap
      assert(got == brute, s"maxDist=$d: ${got.size} vs brute ${brute.size}")
    }
  }

  test("resolveEntities: transitive chains collapse, keep-best canonical, singletons kept") {
    import spark.implicits._
    // chain abcd—abXd—abXe (a—b at 1, b—c at 1, a—c at 2: transitivity
    // must merge all three); unrelated singleton
    val recs = Seq(
      (1L, "abcd", 10L), (2L, "abXd", 30L), (3L, "abXe", 20L),
      (9L, "zzzz", 99L)).toDF("id", "nm", "w")
    val got = Fuzzy.resolveEntities(recs, col("id"), col("nm"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 2L), (9L, 1L, 9L)),
      s"chain → entity 1 with canonical 2 (max weight); got $got")
  }

  test("probeFuzzyIndex == brute force; a small batch prunes index partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val master = (0 until 200).map(i => (i.toLong,
      (1 to 6).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)).toDF("id", "s")
    val batch = (0 until 3).map(i => (1000L + i,
      (1 to 6).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
    val root = java.nio.file.Files.createTempDirectory("fuzzyidx").toString
    Fuzzy.saveFuzzyIndex(master, col("id"), col("s"), root)
    val probe = Fuzzy.probeFuzzyIndex(spark, root, batch.toDF("id", "s"),
      col("id"), col("s"))
    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ms = master.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (bi, bs) <- batch; (mi, s) <- ms
      if lev(bs, s) <= 1
    } yield (bi, mi) -> lev(bs, s).toLong).toMap
    assert(got == brute, s"${got.size} vs brute ${brute.size}")
    // the scan must carry a partition filter on the probed bucket set
    val scans = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.partitionFilters.nonEmpty),
      "index scan must be partition-pruned by the probed buckets")
  }

  test("fuzzyJoin plan: variant equi-join, no cartesian / nested-loop") {
    val p = graft.SparkEntry.queries("fuzzy_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    assert(p.collect {
      case n: CartesianProductExec => n
      case n: BroadcastNestedLoopJoinExec => n
    }.isEmpty, "blocked fuzzy join must never plan a cartesian")
  }
}
