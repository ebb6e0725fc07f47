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
    // output stays exact
    val l = left.select(leftId.as("left_id"), leftStr.as("__ls"))
      .select(col("left_id"), col("__ls"),
        explode(delNeighborhood(col("__ls"), maxDist)).as("__v0"))
      .select(col("left_id"), col("__ls"), xxhash64(col("__v0")).as("__v"))
    val r = right.select(rightId.as("right_id"), rightStr.as("__rs"))
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

  val queries: Map[String, Q] = Map(
    // near-identical customer names (differ in at most one character),
    // each unordered pair once
    "fuzzy_join" -> ((s, dir) => {
      val c = SparkEntry.table(s, dir, "customer")
      fuzzyJoin(c, c, col("c_custkey"), col("c_name"),
        col("c_custkey"), col("c_name"), maxDist = 1)
        .where(col("left_id") < col("right_id"))
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
  )
}
