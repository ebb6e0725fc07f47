package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Market-basket co-occurrence mining — support / confidence / lift over
  * (basket, item) pairs, the "frequently bought together" primitive a
  * recommendation or data-curation pipeline runs over order logs, co-click
  * streams, or document–entity tables (association-rule metrics per
  * Agrawal et al., SIGMOD 1993, computed exactly rather than via the
  * candidate-generation Apriori machinery — at the pair (2-itemset) level
  * a single aggregation IS the exact answer).
  *
  * Plan shape at 100 TB:
  *  - ONE shuffle of the distinct (basket, item) pairs to basket keys;
  *    each basket's items become one SORTED array and the pair explosion
  *    `{(a,b) : a < b}` is NARROW (bounded by `maxBasketItems`² per row —
  *    the cap is the skew guard: a degenerate mega-basket, e.g. a crawler
  *    account touching every item, would otherwise explode quadratically
  *    and its pairs are noise for association purposes anyway; capped-out
  *    baskets are DROPPED whole, deterministically, and excluded from the
  *    basket total so every metric stays exact over the retained set).
  *  - The pair stream partial-aggregates map-side into (a, b) counts —
  *    far smaller than the explosion — then two joins attach the item
  *    marginals (AQE broadcasts the marginal side when the item catalog
  *    is small; at catalog scale they are shuffle joins on already
  *    pair-collapsed data).
  *  - Metrics are single IEEE-double divisions of exact BIGINT counts
  *    (lift's cross-products are multiplied in DOUBLE — each factor is
  *    exact below 2^53, where a BIGINT product would overflow at
  *    web-event scale; the oracle mirrors the operation order).
  */
object Assoc {
  private type Q = (SparkSession, String) => DataFrame

  /** Pairwise association metrics over `(basket, item)` rows.
    *
    * Returns one row per unordered item pair `(item_a < item_b)` seen in
    * at least `minPairCount` retained baskets: the pair count, both item
    * marginal counts, `support = n_ab / N`, directional confidences, and
    * `lift = n_ab·N / (n_a·n_b)` (N = retained-basket count). */
  def itemCooc(rows: DataFrame, basket: Column, item: Column,
               minPairCount: Long = 2L, maxBasketItems: Int = 256): DataFrame = {
    require(minPairCount >= 1 && maxBasketItems >= 2,
      "minPairCount must be >= 1 and maxBasketItems >= 2")
    // the capped basket table feeds THREE consumers (total, marginals,
    // pairs); they branch directly above the one (basket)-keyed exchange,
    // so ReuseExchange shares the corpus-sized shuffle across them — a
    // localCheckpoint here measured SLOWER (materialization I/O without
    // saving a shuffle)
    val baskets = rows.select(basket.as("basket"), item.as("item"))
      .groupBy("basket")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .where(size(col("items")) <= maxBasketItems)
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    // marginals and pairs from the SAME capped basket table, so N, n_a,
    // n_b, n_ab all count over one consistent universe
    val itemCounts = baskets.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = baskets
      .select(explode(flatten(transform(col("items"), (a, i) =>
        transform(slice(col("items"), i + 2, size(col("items"))), b =>
          struct(a.as("item_a"), b.as("item_b")))))).as("p"))
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .where(col("n_pairs") >= minPairCount)
    pairs
      .join(itemCounts.withColumnRenamed("n_item", "n_a"),
        pairs("item_a") === itemCounts("item"))
      .drop("item")
      .join(itemCounts.withColumnRenamed("n_item", "n_b"),
        pairs("item_b") === itemCounts("item"))
      .drop("item")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pairs"),
        col("n_a"), col("n_b"),
        (col("n_pairs").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_pairs").cast("double") / col("n_a").cast("double"))
          .as("conf_a_to_b"),
        (col("n_pairs").cast("double") / col("n_b").cast("double"))
          .as("conf_b_to_a"),
        ((col("n_pairs").cast("double") * col("n_baskets").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  val queries: Map[String, Q] = Map(
    // parts ordered together: baskets = orders, items = parts; pairs seen
    // in >= 2 orders
    "item_cooc" -> ((s, dir) =>
      itemCooc(SparkEntry.table(s, dir, "lineitem"),
        col("l_orderkey"), col("l_partkey"))),
  )

  val oracleSql: Map[String, String] = Map(
    "item_cooc" ->
      """WITH b AS (
        |  SELECT l_orderkey AS basket, list_sort(list(DISTINCT l_partkey)) AS items
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING count(DISTINCT l_partkey) <= 256),
        |n AS (SELECT count(*) AS n_baskets FROM b),
        |ic AS (SELECT item, count(*) AS n_item
        |       FROM (SELECT unnest(items) AS item FROM b) GROUP BY item),
        |p AS (
        |  -- items are DISTINCT per basket, so value order == position order
        |  SELECT item_a, item_b, count(*) AS n_pairs
        |  FROM (SELECT basket, unnest(items) AS item_a FROM b) u
        |  JOIN (SELECT basket, unnest(items) AS item_b FROM b) v USING (basket)
        |  WHERE item_b > item_a
        |  GROUP BY item_a, item_b
        |  HAVING count(*) >= 2)
        |SELECT item_a, item_b, n_pairs, a.n_item AS n_a, b2.n_item AS n_b,
        |  CAST(n_pairs AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
        |  CAST(n_pairs AS DOUBLE) / CAST(a.n_item AS DOUBLE) AS conf_a_to_b,
        |  CAST(n_pairs AS DOUBLE) / CAST(b2.n_item AS DOUBLE) AS conf_b_to_a,
        |  (CAST(n_pairs AS DOUBLE) * CAST(n_baskets AS DOUBLE)) /
        |    (CAST(a.n_item AS DOUBLE) * CAST(b2.n_item AS DOUBLE)) AS lift
        |FROM p JOIN ic a ON a.item = p.item_a
        |       JOIN ic b2 ON b2.item = p.item_b, n""".stripMargin,
  )
}
