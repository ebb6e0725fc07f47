package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Graph operators for corpus curation: the near-dup PAIR LIST becomes a
  * usable dedup only once pairs are closed into CLUSTERS (connected
  * components → one canonical doc per cluster), and link-graph centrality
  * (PageRank) is the classic crawl-corpus quality prior (its original
  * use). Both are iterative — the part Spark expresses as a driver loop
  * over DataFrame steps with per-iteration `localCheckpoint` lineage
  * truncation (the [[Vocab.trainBpe]] posture).
  *
  * Scale design (100 TB):
  *  - [[connectedComponents]] — min-label propagation: each round is one
  *    edge⋈label join + a dst-keyed min aggregate, all partial-agged;
  *    rounds = component diameter. Near-dup graphs are dense small
  *    clusters (diameter a few hops), so convergence is fast by
  *    construction; `maxIter` fails LOUDLY on non-convergence rather than
  *    returning a half-propagated labeling.
  *  - [[pagerankInt]] — FIXED-POINT INTEGER PageRank: ranks are scaled
  *    longs, contributions use truncating division, sums are integer —
  *    order-independent and bit-identical across engines/partitionings,
  *    where float PageRank diverges by summation order. Each iteration is
  *    one join + one partial-agged sum keyed by dst.
  */
object Graph {
  private type Q = (SparkSession, String) => DataFrame

  /** Release the persisted blocks behind a `localCheckpoint`ed frame.
    * The checkpointed Dataset's plan is a LogicalRDD over the persisted
    * RDD; `Dataset.unpersist` consults only the CacheManager and no-ops
    * on it. Only call once nothing will read the frame again — the
    * truncated lineage cannot recompute freed blocks. */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Undirected connected components over an edge list; returns
    * `(node, component)` with component = the smallest node id in the
    * component. Covers nodes that appear in at least one edge — join
    * singletons back with a coalesce (see the `dedup_components` gate).
    *
    * Two physical regimes, one result (r18, guide §1.2 "the distributed
    * algorithm first" + §5 bounded driver state — the [[Hygiene
    * .sourceOverlap]] collectPatterns / icp_order posture):
    *
    *  - ≤ `driverEdges` edges (known from ONE count over the already-
    *    checkpointed edge list): union-find ON THE DRIVER. A near-dup
    *    pair graph is orders of magnitude smaller than its corpus (500
    *    docs → ~250 pairs at sf0.1; even a 10⁹-doc corpus with a 1% dup
    *    rate is ~10⁷ edges = a few hundred MB of longs), and the
    *    distributed loop's per-round price is 2 jobs + an eager
    *    checkpoint + a count — ~1.2 s of pure scheduling on the sf0.1
    *    gate for a KB-sized label table. Union-by-min-root makes the
    *    root of every tree the component minimum by induction, so the
    *    labeling is bit-identical to the iterative fixpoint.
    *  - above the bound: the r17 min-label propagation loop, unchanged
    *    (one edge⋈label join + a dst-keyed min aggregate per round,
    *    rounds = component diameter, LOUD `require` on non-convergence).
    *
    * The edge list is checkpointed BEFORE symmetrization (also r18): the
    * previous `e.union(e.swap).distinct().localCheckpoint(true)` ran the
    * upstream pair pipeline through both union branches in one job —
    * exchange reuse does not dedup union branches that end in different
    * projections. Now the pair pipeline materializes exactly once and
    * both the count and (in the distributed regime) the symmetrize read
    * the cached blocks. */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 20,
                          driverEdges: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    // the ONE materialization of the (possibly expensive) edge pipeline.
    // Null endpoints are dropped UP FRONT (ADVICE r18 #1): the driver
    // regime's row.getLong would NPE on one while the distributed loop
    // silently carried it — a null edge is meaningless for components and
    // both regimes must agree on pathological input.
    val e0 = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .localCheckpoint(true)
    val nEdges = e0.count() // cached blocks — a scheduling-floor job
    if (nEdges <= driverEdges) {
      // driver regime: union-find with path compression; union keeps the
      // SMALLER root, so every root is its component's minimum id
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      // ONE collect job (toLocalIterator would schedule a job per
      // partition — the very overhead this regime removes); the bound
      // caps the transient edge array, collected as specialized
      // (Long, Long) tuples rather than boxed Rows (guide §5, the
      // pagerankInt r19 fix applied here too)
      import spark.implicits._
      e0.as[(Long, Long)].collect().foreach { case (a, b) =>
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val out = new Array[(Long, Long)](parent.size)
      val it = parent.keySet().iterator()
      var i = 0
      while (it.hasNext) { val n = it.next(); out(i) = (n, find(n)); i += 1 }
      java.util.Arrays.sort(out, Ordering.by((t: (Long, Long)) => t._1))
      import spark.implicits._
      // small label tables return as a LocalRelation (accurate stats →
      // downstream joins broadcast them); big ones as a parallelized RDD
      // so millions of rows never sit inside the logical plan
      if (out.length <= 100000) out.toSeq.toDF("node", "comp")
      else spark.createDataset(spark.sparkContext.parallelize(
        out.toSeq, spark.sparkContext.defaultParallelism)).toDF("node", "comp")
    } else {
      val sym = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
        .distinct().localCheckpoint(true)
      // free e0's blocks once sym is materialized (VERDICT r18 #3): the
      // loop below reads only sym, and holding both would pin ~3× the
      // edge list in executor storage at web-graph scale (guide §5).
      // Dataset.unpersist only clears CacheManager entries; a
      // localCheckpoint lives as persisted blocks under the plan's
      // LogicalRDD, so that is what must be released.
      freeLocalCheckpoint(e0)
      var labels = sym.select(col("a").as("node")).distinct()
        .withColumn("comp", col("node")).localCheckpoint(true)
      var changed = 1L
      var it = 0
      while (changed > 0 && it < maxIter) {
        val nb = sym
          .join(labels.select(col("node").as("b"), col("comp")), "b")
          .groupBy(col("a").as("node")).agg(min(col("comp")).as("nc"))
        val next = labels.join(nb, Seq("node"), "left")
          .select(col("node"),
            least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"),
            (coalesce(col("nc"), col("comp")) < col("comp")).as("ch"))
          .localCheckpoint(true)
        changed = next.where(col("ch")).count()
        labels = next.drop("ch")
        it += 1
      }
      require(changed == 0,
        s"connectedComponents: not converged after $maxIter rounds — the graph " +
          "has a longer diameter than expected; raise maxIter")
      labels
    }
  }

  /** Fixed-point integer PageRank over a DIRECTED edge list (symmetrize
    * first for an undirected graph): `iters` damped iterations at scale
    * `scale`, damping `dampNum/dampDen`. Every node starts at `scale`;
    * contribution of u to each out-neighbor is `r(u) div outdeg(u)`
    * (truncating); the update is `damp · Σcontrib div den + teleport`.
    * Ranks are relative integers (unnormalized — ordering and ratios are
    * what centrality consumers use). */
  def pagerankInt(edges: DataFrame, src: String, dst: String,
                  iters: Int = 5, scale: Long = 1000000000L,
                  dampNum: Long = 85, dampDen: Long = 100,
                  broadcastNodes: Long = 10000000L,
                  checkpointEvery: Int = 10,
                  driverEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen >= dampNum, "bad damping")
    // the ONE edge materialization; everything downstream reads the cache.
    // Null endpoints dropped up front (ADVICE r18 #1): the driver regime's
    // primitive decode would NPE on one while the distributed loop carried
    // it through joins — both regimes must agree on pathological input.
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    val teleport0 = scale * (dampDen - dampNum) / dampDen
    // two physical regimes, one result (r18 — the connectedComponents
    // posture applied to the second iterative operator): the fixpoint is
    // PURE INTEGER arithmetic (truncating div, sums of longs — addition
    // is order-independent), so a driver loop over a collected edge array
    // is bit-identical to the distributed iteration by construction
    // (GraphSpec runs both regimes against the same JVM mirror). Below
    // `driverEdges` (2M edges ≈ tens of MB transient) the distributed
    // loop's price is ~3 stage-jobs per iteration over a |nodes|-sized
    // rank table — ~1.7 s of scheduling on the sf0.1 gate — while the
    // driver loop is microseconds; above the bound the web-graph regime
    // runs unchanged.
    // the driver regime keys on 8-byte ids (the production regime — the
    // gate comment above `pagerank` spells out why ids should be longs at
    // web scale); any other key type routes to the distributed loop,
    // which is type-agnostic
    val longKeys = e.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val nEdges = e.count() // cached blocks — a scheduling-floor job
    if (longKeys && nEdges <= driverEdges) {
      // ONE job; bounded by driverEdges. Collected as a primitive tuple
      // Dataset, not Array[Row] (VERDICT r18 #4): a Row per edge carried
      // a GenericRowWithSchema + boxed fields — ~5× the transient driver
      // heap of the specialized (Long, Long) tuples for a 2M-edge graph
      // (guide §5: the driver should hold as little as possible).
      val sparkE = edges.sparkSession
      import sparkE.implicits._
      val rows = e.as[(Long, Long)].collect()
      val m = rows.length
      // dense-int node remap ONCE, then every iteration is primitive
      // array arithmetic: the first cut used boxed Long maps and spent
      // ~2 s driver-side on the 1.1M-edge gate graph (5 iterations ×
      // 3 boxed map ops per edge) — more than the Spark loop it replaced
      val idOf = new java.util.HashMap[java.lang.Long, Integer]()
      val ids = new scala.collection.mutable.ArrayBuffer[Long]()
      def idx(x: Long): Int = {
        val got = idOf.get(x)
        if (got != null) got.intValue
        else { val nid = ids.length; idOf.put(x, nid); ids += x; nid }
      }
      val srcI = new Array[Int](m); val dstI = new Array[Int](m)
      var i = 0
      while (i < m) {
        srcI(i) = idx(rows(i)._1); dstI(i) = idx(rows(i)._2)
        i += 1
      }
      val n = ids.length
      val deg = new Array[Long](n)
      i = 0; while (i < m) { deg(srcI(i)) += 1L; i += 1 }
      var r = Array.fill(n)(scale)
      for (_ <- 1 to iters) {
        val acc = new Array[Long](n)
        i = 0
        while (i < m) {
          // r div deg: truncating division of non-negative longs — the
          // same value Spark's `div` produces
          acc(dstI(i)) += r(srcI(i)) / deg(srcI(i))
          i += 1
        }
        var j = 0
        while (j < n) {
          acc(j) = acc(j) * dampNum / dampDen + teleport0
          j += 1
        }
        r = acc
      }
      val out = Array.tabulate(n)(j => (ids(j), r(j)))
      java.util.Arrays.sort(out, Ordering.by((t: (Long, Long)) => t._1))
      // small rank tables as a LocalRelation (accurate stats → broadcast
      // downstream); big ones parallelized so the plan stays small
      return if (out.length <= 100000) out.toSeq.toDF("node", "r")
      else sparkE.createDataset(sparkE.sparkContext.parallelize(
        out.toSeq, sparkE.sparkContext.defaultParallelism)).toDF("node", "r")
    }
    // the degree table is |nodes|-sized: broadcast once, ReuseExchange
    // dedups it across every iteration inside the final action
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val nNodes = nodes.count()
    // two physical regimes, one logical plan: below `broadcastNodes` the
    // rank table broadcasts both ways and the edge table NEVER shuffles
    // (one partial-agged exchange of ≤|nodes| rows per iteration); above
    // it the joins co-partition — the web-graph regime where |nodes|
    // exceeds executor memory
    val bc: DataFrame => DataFrame =
      if (nNodes <= broadcastNodes) broadcast else identity
    val teleport = scale * (dampDen - dampNum) / dampDen
    // iterations CHAIN inside one query (each exchange is computed once —
    // ReuseExchange dedups the shared prefixes), with a lineage-truncating
    // checkpoint only every `checkpointEvery` rounds: at 5-iteration
    // centrality depth the whole run is ONE action over the cached edge
    // table; a 50-round run truncates periodically like [[Vocab.trainBpe]]
    var r = nodes.withColumn("r", lit(scale))
    for (i <- 1 to iters) {
      val contrib = e.join(bc(deg), "src")
        .join(bc(r.select(col("node").as("src"), col("r"))), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("acc"))
      r = nodes.join(bc(contrib), Seq("node"), "left")
        .select(col("node"),
          (expr(s"coalesce(acc, cast(0 as bigint)) * $dampNum div $dampDen")
            + lit(teleport)).as("r"))
      if (i % checkpointEvery == 0 && i < iters) r = r.localCheckpoint(true)
    }
    r
  }

  /** Distinct co-occurrence edges: an undirected edge `(u, v)` with
    * `u < v` between every pair of `item`s sharing a `group` (parts in
    * one order, docs citing one entity, users in one session). The pair
    * explosion is a self-join on the group key — fanout is bounded by
    * group size (orders hold a handful of items; cap or sample
    * pathological groups before calling, the [[Dedup]] hot-bucket-cap
    * posture). */
  def cooccurrenceEdges(df: DataFrame, group: Column, item: Column): DataFrame = {
    val a = df.select(group.as("__g"), item.cast("long").as("u")).distinct()
    val b = a.select(col("__g"), col("u").as("v"))
    a.join(b, Seq("__g")).where(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
  }

  /** Exact triangle count over an undirected edge list (`u < v` unique
    * pairs) — the standard clustering/cohesion diagnostic for the graphs
    * this module builds (a near-dup pair graph whose triangle density is
    * ~0 is mostly hash-collision noise; a co-purchase graph's triangle
    * count tracks community structure). One row: nodes, edges, triangles.
    *
    *  Scale shape: each edge is ORIENTED from its (degree, id)-smaller
    * endpoint to the larger — every triangle becomes exactly one directed
    * path a→b→c plus the closing edge a→c, and a node's out-degree is
    * bounded by O(√m) (only higher-degree neighbors receive its edges),
    * so the wedge join materializes O(m^1.5) rows worst-case instead of
    * Σ deg² (the hub explosion: one 10⁶-degree node contributes 10¹²
    * unoriented wedges but ≤ m oriented ones). Joins shuffle on 8-byte
    * node keys; the only driver values are three scalar counts. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val oriented = e.join(du, "u").join(dv, "v")
      .select(when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val e1 = oriented.select(col("s").as("a"), col("t").as("b"))
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a"), col("t").as("c"))
    val nTri = e1.join(e2, "b").select("a", "c").join(e3, Seq("a", "c")).count()
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((deg.count(), e.count(), nTri))
      .toDF("n_nodes", "n_edges", "n_triangles")
  }

  val queries: Map[String, Q] = Map(
    // near-dup pairs closed into dedup clusters; singleton docs are their
    // own component — the canonical-representative table a cluster-level
    // dedup keeps
    "dedup_components" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, k = 3, tau = 0.5)
      val cc = connectedComponents(pairs, "id_a", "id_b")
        .withColumnRenamed("node", "doc_id")
      docs.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("component"))
    }),
    // cluster-level dedup CLOSURE: per component, the canonical document
    // (longest text, ties to the smallest id) and the cluster size — the
    // keep-list a near-dup dedup actually applies
    "dedup_canonical" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, k = 3, tau = 0.5)
      val cc = connectedComponents(pairs, "id_a", "id_b")
        .withColumnRenamed("node", "doc_id")
      docs.select(col("doc_id"), col("n_chars"))
        .join(cc, Seq("doc_id"), "left")
        .select(coalesce(col("comp"), col("doc_id")).as("component"),
          col("doc_id"), col("n_chars"))
        .groupBy("component")
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("n_chars"), (-col("doc_id")).as("ni"))).as("w"))
        .select(col("component"), col("n_docs"), (-col("w.ni")).as("keep_id"))
    }),
    // centrality over the customer–supplier transaction graph (symmetrized
    // bipartite), 5 fixed-point iterations. Node ids are LONGS (customer =
    // 2k, supplier = 2k+1) — an 8-byte id shuffles and compares several
    // times cheaper than a tagged string at web-graph scale
    "pagerank" -> ((s, dir) => {
      val orders = SparkEntry.table(s, dir, "orders")
      // NOT spread — twice measured: r18 round-robin spread flat (1.565
      // vs 1.510), and the r19 no-sort hash spread re-try split across
      // two paired windows (1.75@0.107 vs 1.80@0.085, then 1.77@0.093 vs
      // 1.30@0.110 favoring UNSPREAD) — the 3-task edge-build stage's
      // per-task work (one broadcast probe + partial distinct) is too
      // cheap to reliably beat the added exchange
      val lineitem = SparkEntry.table(s, dir, "lineitem")
      val ok = broadcast(orders.select(col("o_orderkey"), col("o_custkey")))
      val e0 = lineitem.join(ok,
          lineitem("l_orderkey") === ok("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val sym = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      pagerankInt(sym, "a", "b", iters = 5)
    }),
    // cohesion of the co-purchase graph (parts sharing an order):
    // distinct part-pair edges, then the degree-oriented exact count
    "triangle_count" -> ((s, dir) =>
      triangleCount(cooccurrenceEdges(SparkEntry.table(s, dir, "lineitem"),
        col("l_orderkey"), col("l_partkey")))),
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_components" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(string_split(text,' ')) >= 3 THEN
        |      list_transform(generate_series(1, len(string_split(text,' ')) - 2),
        |        i -> array_to_string(string_split(text,' ')[i:i+2], ' '))
        |      ELSE [text] END) AS sh
        |  FROM documents),
        |inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
        |co AS (
        |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter,
        |    any_value(x.n) AS na, any_value(y.n) AS nb
        |  FROM inv x JOIN inv y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id),
        |p AS (SELECT id_a, id_b FROM co
        |      WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |reach(node, r) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.node),
        |comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node)
        |SELECT doc_id, COALESCE(comp, doc_id) AS component
        |FROM documents LEFT JOIN comp ON comp.node = documents.doc_id""".stripMargin,
    "dedup_canonical" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(string_split(text,' ')) >= 3 THEN
        |      list_transform(generate_series(1, len(string_split(text,' ')) - 2),
        |        i -> array_to_string(string_split(text,' ')[i:i+2], ' '))
        |      ELSE [text] END) AS sh
        |  FROM documents),
        |inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
        |co AS (
        |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter,
        |    any_value(x.n) AS na, any_value(y.n) AS nb
        |  FROM inv x JOIN inv y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id),
        |p AS (SELECT id_a, id_b FROM co
        |      WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |reach(node, r) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.node),
        |comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
        |asg AS (SELECT COALESCE(comp, doc_id) AS component, doc_id, n_chars
        |        FROM documents LEFT JOIN comp ON comp.node = documents.doc_id)
        |SELECT component, count(*) AS n_docs,
        |  CAST(-(max(struct_pack(c := n_chars, i := -doc_id)).i) AS BIGINT) AS keep_id
        |FROM asg GROUP BY component""".stripMargin,
    "pagerank" -> {
      val iter = (k: Int) =>
        s"""r$k AS (
           |  SELECT n.node,
           |    CAST(COALESCE(s.acc, 0) * 85 // 100 + 150000000 AS BIGINT) AS r
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS node, sum(r${k - 1}.r // deg.deg) AS acc
           |    FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
           |    JOIN deg ON deg.src = e.src
           |    GROUP BY e.dst) s USING (node))""".stripMargin
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT a AS src, b AS dst FROM e0
         |      UNION SELECT b, a FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM n),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT node, r FROM r5""".stripMargin
    },
    // unoriented canonical form (u < v < w counts each triangle once);
    // the engine's degree orientation is an internal optimization the
    // count is invariant to
    "triangle_count" ->
      """WITH e AS (
        |  SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |nn AS (SELECT count(*) AS n_nodes
        |  FROM (SELECT u FROM e UNION SELECT v FROM e)),
        |ne AS (SELECT count(*) AS n_edges FROM e),
        |nt AS (SELECT count(*) AS n_triangles FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT nn.n_nodes, ne.n_edges, nt.n_triangles FROM nn, ne, nt""".stripMargin,
  )
}
