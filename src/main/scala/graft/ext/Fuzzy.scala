package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Edit-distance similarity JOIN for short strings (names, titles, SKUs,
  * query logs) via deletion-neighborhood blocking — the FastSS scheme
  * (Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007;
  * popularized as SymSpell): two strings within Levenshtein distance `d`
  * always share a variant obtained by deleting at most `d` characters
  * from each (align the edit script; delete each substituted/inserted
  * position from its own side — at most `d` deletions per side), so
  * matching on the deletion neighborhood is a lossless candidate filter
  * and an exact `levenshtein` verify finishes the join.
  *
  * This is the ENTITY-RESOLUTION counterpart of [[Dedup]]'s token-set
  * joins: PPJoin-style prefix filtering blocks on set overlap and
  * degrades into one giant block when every record shares a common
  * prefix/boilerplate (a customer table where every name starts with the
  * same literal), while deletion variants keep the discriminating
  * characters IN the key — blocks stay near-unique on exactly the data
  * that breaks q-gram blocking.
  *
  * Plan shape at 100 TB: variant generation is NARROW (an array
  * expression per row, `O(m^d)` variants for length-`m` strings — the
  * documented short-string bound; route long-text near-dup to
  * [[Dedup.jaccardPairs]] instead), the candidate join shuffles only
  * (variant, id) pairs, and the verify runs on the candidate set — bounded
  * by true near-matches plus same-neighborhood noise, never |L|·|R|. The
  * verify uses Spark's threshold form of `levenshtein`, which abandons a
  * row as soon as the running distance exceeds `maxDist` (O(d·m) per
  * candidate, not O(m²)).
  */
object Fuzzy {
  private type Q = (SparkSession, String) => DataFrame

  /** All distinct strings reachable from `s` by at most `maxDels`
    * single-character deletions (including `s` itself). Built as ONE
    * concat of per-level arrays with a single trailing `array_distinct`:
    * higher-order functions evaluate interpreted inside codegen'd plans,
    * so every extra HOF layer (per-level distinct/flatten wrappers) is
    * per-row interpreter overhead — the flat form measured 2× faster. */
  private[ext] def delNeighborhood(s: Column, maxDels: Int): Column = {
    def delsOf(x: Column): Column =
      transform(sequence(lit(1), length(x)), i =>
        concat(substr(x, lit(1), i - 1), substr(x, i + 1, length(x))))
    val levels = Iterator.iterate(array(s))(lvl =>
      flatten(transform(lvl, delsOf(_)))).take(maxDels + 1).toSeq
    array_distinct(concat(levels: _*))
  }

  /** Pairs `(left_id, right_id, dist)` with `levenshtein ≤ maxDist`,
    * deletion-neighborhood blocked. `maxDist` is meant to be small (1–2):
    * the neighborhood is `O(m^maxDist)` keys per row. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftId: Column, leftStr: Column,
                rightId: Column, rightStr: Column,
                maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3, "maxDist must be in [1, 3]")
    // variants join on xxhash64 (8-byte keys instead of m-char strings —
    // the [[Dedup]] hash-key discipline); a hash collision only ADDS a
    // candidate pair, which the exact levenshtein verify rejects, so the
    // output stays exact. Both sides spread across the cores first
    // (r17): a one-file input otherwise runs the whole neighborhood
    // explode + thresholded-levenshtein verify on ONE task — measured
    // 4.0 s of the gate's 4.9 s in a single-task stage
    val (ls, rs) = (Dedup.spread(left), Dedup.spread(right))
    val l = ls.select(leftId.as("left_id"), leftStr.as("__ls"))
      .select(col("left_id"), col("__ls"),
        explode(delNeighborhood(col("__ls"), maxDist)).as("__v0"))
      .select(col("left_id"), col("__ls"), xxhash64(col("__v0")).as("__v"))
    val r = rs.select(rightId.as("right_id"), rightStr.as("__rs"))
      .select(col("right_id"), col("__rs"),
        explode(delNeighborhood(col("__rs"), maxDist)).as("__v0"))
      .select(col("right_id"), col("__rs"), xxhash64(col("__v0")).as("__v"))
    // verify BEFORE dedup: the thresholded levenshtein is O(d·m) per
    // candidate (early-abandoned), so re-verifying a pair once per shared
    // variant is cheaper than a pre-verify distinct that shuffles the
    // candidate strings — the dedup then groups matched pairs on 16-byte
    // id keys only (measured ~2× on the sf0.1 gate)
    l.join(r, "__v")
      .withColumn("dist", levenshtein(col("__ls"), col("__rs"), maxDist))
      .where(col("dist") =!= -1) // threshold form: -1 = early-abandoned
      .groupBy("left_id", "right_id")
      .agg(min(col("dist")).cast("long").as("dist")) // dist is pair-determined
  }

  /** Persist the deletion-variant index for INCREMENTAL fuzzy matching —
    * the [[graft.ext.Dedup]] frozen-index discipline applied to entity
    * resolution: the reference table's variants land once in
    * bucket-partitioned parquet, and each arriving batch probes ONLY its
    * own buckets (partition-pruned scan), never re-deriving the reference
    * side. The steady-state cost of "match today's new records against
    * the customer master" is batch-sized, not master-sized. */
  def saveFuzzyIndex(records: DataFrame, id: Column, name: Column,
                     path: String, maxDist: Int = 1, nBuckets: Int = 32): Unit =
    records.select(id.as("index_id"), name.as("__is"))
      .select(col("index_id"), col("__is"),
        explode(delNeighborhood(col("__is"), maxDist)).as("__v0"))
      .select(col("index_id"), col("__is"), xxhash64(col("__v0")).as("__v"))
      .withColumn("bucket", pmod(col("__v"), lit(nBuckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Probe a [[saveFuzzyIndex]] directory with a batch: pairs
    * `(probe_id, index_id, dist)` with `levenshtein ≤ maxDist` between
    * batch and reference names. The probed-bucket set (≤ nBuckets ints)
    * is collected driver-side to prune the index scan — a SMALL batch
    * touches few buckets and reads only those partitions. */
  def probeFuzzyIndex(spark: SparkSession, path: String, batch: DataFrame,
                      id: Column, name: Column, maxDist: Int = 1,
                      nBuckets: Int = 32): DataFrame = {
    val b = batch.select(id.as("probe_id"), name.as("__bs"))
      .select(col("probe_id"), col("__bs"),
        explode(delNeighborhood(col("__bs"), maxDist)).as("__v0"))
      .select(col("probe_id"), col("__bs"), xxhash64(col("__v0")).as("__v"))
      .withColumn("bucket", pmod(col("__v"), lit(nBuckets.toLong)).cast("int"))
    val probed = b.select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    spark.read.parquet(path)
      .where(col("bucket").isin(probed: _*))
      .join(b, Seq("bucket", "__v"))
      .withColumn("dist", levenshtein(col("__bs"), col("__is"), maxDist))
      .where(col("dist") =!= -1)
      .groupBy("probe_id", "index_id")
      .agg(min(col("dist")).cast("long").as("dist"))
  }

  /** Blocking-quality report for a fuzzy join — the ER ops metric that
    * decides whether a blocking scheme is production-safe BEFORE running
    * it at full scale: candidate-pair count vs the |L|·|R| cross product
    * (reduction ratio), the matched count, and precision of the candidate
    * set. All counts integer, one double division each. */
  def blockingReport(left: DataFrame, right: DataFrame,
                     leftId: Column, leftStr: Column,
                     rightId: Column, rightStr: Column,
                     maxDist: Int = 1): DataFrame = {
    val l = left.select(leftId.as("left_id"), leftStr.as("__ls"))
      .select(col("left_id"), col("__ls"),
        explode(delNeighborhood(col("__ls"), maxDist)).as("__v0"))
      .select(col("left_id"), col("__ls"), xxhash64(col("__v0")).as("__v"))
    val r = right.select(rightId.as("right_id"), rightStr.as("__rs"))
      .select(col("right_id"), col("__rs"),
        explode(delNeighborhood(col("__rs"), maxDist)).as("__v0"))
      .select(col("right_id"), col("__rs"), xxhash64(col("__v0")).as("__v"))
    val cand = l.join(r, "__v")
      .withColumn("dist", levenshtein(col("__ls"), col("__rs"), maxDist))
      .groupBy("left_id", "right_id").agg(min(col("dist")).as("__d"))
    val nl = left.agg(count(lit(1)).as("n_left"))
    val nr = right.agg(count(lit(1)).as("n_right"))
    cand.agg(count(lit(1)).as("n_candidates"),
        sum(when(col("__d") =!= -1, 1L).otherwise(0L)).as("n_matched"))
      .crossJoin(broadcast(nl)).crossJoin(broadcast(nr))
      .select(col("n_left"), col("n_right"), col("n_candidates"),
        col("n_matched"),
        (lit(1.0) - col("n_candidates").cast("double") /
          (col("n_left").cast("double") * col("n_right").cast("double")))
          .as("reduction_ratio"),
        (col("n_matched").cast("double") / col("n_candidates").cast("double"))
          .as("candidate_precision"))
  }

  /** END-TO-END entity resolution: fuzzy self-join → transitive closure →
    * one canonical record per entity cluster (keep-best: highest balance,
    * ties to the smallest id — the [[graft.ext.Graph]] `dedup_canonical`
    * rule). The three stages are the independently-gated operators
    * composed; this gate pins the COMPOSITION, the way `curate_full` pins
    * the curation pipeline. */
  def resolveEntities(records: DataFrame, id: Column, name: Column,
                      weight: Column, maxDist: Int = 1): DataFrame = {
    val pairs = fuzzyJoin(records, records, id, name, id, name, maxDist)
      .where(col("left_id") < col("right_id"))
    val cc = Graph.connectedComponents(pairs, "left_id", "right_id")
    records.select(id.as("__id"), weight.as("__w"))
      .join(cc.select(col("node").as("__id"), col("comp")), Seq("__id"), "left")
      .select(coalesce(col("comp"), col("__id")).as("entity"),
        col("__id"), col("__w"))
      .groupBy("entity")
      .agg(count(lit(1)).as("n_records"),
        max(struct(col("__w"), (-col("__id")).as("ni"))).as("b"))
      .select(col("entity"), col("n_records"), (-col("b.ni")).as("canonical_id"))
  }

  val queries: Map[String, Q] = Map(
    // near-identical customer names (differ in at most one character),
    // each unordered pair once
    "fuzzy_join" -> ((s, dir) => {
      val c = SparkEntry.table(s, dir, "customer")
      fuzzyJoin(c, c, col("c_custkey"), col("c_name"),
        col("c_custkey"), col("c_name"), maxDist = 1)
        .where(col("left_id") < col("right_id"))
    }),
    // frozen fuzzy index on the even half, probe-only batch on the odd
    // half — the steady-state "match arrivals against the master" shape
    "fuzzy_incremental" -> ((s, dir) => {
      val c = SparkEntry.table(s, dir, "customer")
      val root = TmpIo.freshDir("fuzzyidx")
      try {
        saveFuzzyIndex(c.where(col("c_custkey") % 2 === 0),
          col("c_custkey"), col("c_name"), root.toString)
        probeFuzzyIndex(s, root.toString, c.where(col("c_custkey") % 2 === 1),
          col("c_custkey"), col("c_name"))
          .localCheckpoint(true)
      } finally TmpIo.deleteRecursively(root)
    }),
    // candidate volume / reduction ratio / candidate precision of the
    // deletion-neighborhood blocking between the two halves
    "blocking_report" -> ((s, dir) => {
      val c = SparkEntry.table(s, dir, "customer")
      blockingReport(c.where(col("c_custkey") % 2 === 1),
        c.where(col("c_custkey") % 2 === 0),
        col("c_custkey"), col("c_name"), col("c_custkey"), col("c_name"))
    }),
    // inject-then-resolve (the piiAugmented pattern): every name gets its
    // key as a suffix (so distinct customers sit at distance >= 2 and the
    // raw one-digit-apart degeneracy of the synthetic names vanishes),
    // and every 10th customer gains a noisy duplicate with ONE character
    // mutated and a different record id — resolution must find exactly
    // those pairs and collapse each to its keep-best record
    "entity_resolution" -> ((s, dir) => {
      val c = SparkEntry.table(s, dir, "customer")
      val p = pmod(col("c_custkey"), lit(8L)) + 1 // mutation position
      val base = c.select((col("c_custkey") * 2).as("rid"),
        concat(col("c_name"), lit("-"), col("c_custkey")).as("nm"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val dups = c.where(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") * 2 + 1).as("rid"),
          concat(substr(col("c_name"), lit(1), p - 1), lit("X"),
            substr(col("c_name"), p + 1, length(col("c_name"))),
            lit("-"), col("c_custkey")).as("nm"),
          (round(col("c_acctbal") * 100).cast("long") - 7L).as("cents"))
      resolveEntities(base.unionByName(dups),
        col("rid"), col("nm"), col("cents"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the oracle is the O(n²) ground truth the blocked plan must equal
    "fuzzy_join" ->
      """SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND abs(len(a.c_name) - len(b.c_name)) <= 1
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    // cross-parity O(n²) ground truth — the blocked probe must equal it
    "fuzzy_incremental" ->
      """SELECT b.c_custkey AS probe_id, a.c_custkey AS index_id,
        |  CAST(levenshtein(b.c_name, a.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey % 2 = 0 AND b.c_custkey % 2 = 1
        | AND abs(len(a.c_name) - len(b.c_name)) <= 1
        |WHERE levenshtein(b.c_name, a.c_name) <= 1""".stripMargin,
    // the oracle recomputes the deletion-variant blocking itself (string
    // keys; the engine's xxhash64 keys add only astronomically-unlikely
    // collision candidates, which the verify step rejects anyway and
    // which would surface here as a count mismatch)
    "blocking_report" ->
      """WITH l AS (SELECT c_custkey AS id, c_name AS nm FROM customer
        |           WHERE c_custkey % 2 = 1),
        |r AS (SELECT c_custkey AS id, c_name AS nm FROM customer
        |      WHERE c_custkey % 2 = 0),
        |lv AS (SELECT id, nm, unnest(list_distinct(list_prepend(nm,
        |         list_transform(generate_series(1, len(nm)),
        |           i -> substr(nm, 1, CAST(i - 1 AS INT))
        |                || substr(nm, CAST(i + 1 AS INT)))))) AS v
        |       FROM l),
        |rv AS (SELECT id, nm, unnest(list_distinct(list_prepend(nm,
        |         list_transform(generate_series(1, len(nm)),
        |           i -> substr(nm, 1, CAST(i - 1 AS INT))
        |                || substr(nm, CAST(i + 1 AS INT)))))) AS v
        |       FROM r),
        |cand AS (SELECT DISTINCT lv.id AS lid, rv.id AS rid,
        |           lv.nm AS ln, rv.nm AS rn
        |         FROM lv JOIN rv USING (v)),
        |agg AS (SELECT count(*) AS n_candidates,
        |          CAST(sum(CASE WHEN levenshtein(ln, rn) <= 1
        |                        THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
        |        FROM cand),
        |nl AS (SELECT count(*) AS n_left FROM l),
        |nr AS (SELECT count(*) AS n_right FROM r)
        |SELECT n_left, n_right, n_candidates, n_matched,
        |  1.0 - CAST(n_candidates AS DOUBLE) /
        |    (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)) AS reduction_ratio,
        |  CAST(n_matched AS DOUBLE) / CAST(n_candidates AS DOUBLE)
        |    AS candidate_precision
        |FROM agg, nl, nr""".stripMargin,
    // same injected-duplicate construction, O(n²) pair ground truth, a
    // recursive-CTE transitive closure (the dedup_components oracle
    // pattern), and the same keep-best rule via a window
    "entity_resolution" ->
      """WITH RECURSIVE recs AS (
        |  SELECT c_custkey * 2 AS rid,
        |    c_name || '-' || CAST(c_custkey AS VARCHAR) AS nm,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey * 2 + 1,
        |    substr(c_name, 1, CAST(c_custkey % 8 AS INT)) || 'X' ||
        |      substr(c_name, CAST(c_custkey % 8 AS INT) + 2) ||
        |      '-' || CAST(c_custkey AS VARCHAR),
        |    CAST(round(c_acctbal * 100) AS BIGINT) - 7
        |  FROM customer WHERE c_custkey % 10 = 0),
        |p AS (
        |  SELECT a.rid AS id_a, b.rid AS id_b
        |  FROM recs a JOIN recs b ON a.rid < b.rid
        |  WHERE levenshtein(a.nm, b.nm) <= 1),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |reach(node, r) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.node),
        |comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
        |m AS (SELECT COALESCE(comp, rid) AS entity, rid, cents
        |      FROM recs LEFT JOIN comp ON comp.node = recs.rid),
        |r2 AS (SELECT entity, rid, cents,
        |         row_number() OVER (PARTITION BY entity
        |           ORDER BY cents DESC, rid ASC) AS rk,
        |         count(*) OVER (PARTITION BY entity) AS n
        |       FROM m)
        |SELECT entity, CAST(n AS BIGINT) AS n_records,
        |  rid AS canonical_id
        |FROM r2 WHERE rk = 1""".stripMargin,
  )
}
