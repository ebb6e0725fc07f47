package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** End-to-end training-data curation: the composition the individual
  * operators exist for —
  *
  *  1. quality gate: keep documents with [[TextAnalysis.stats]] quality ≥
  *     threshold (narrow, shuffle-free);
  *  2. near-dup collapse: within each [[Dedup.clusters]] component of the
  *     exact-Jaccard pair graph, keep only the representative (min doc_id);
  *     documents in no near-dup pair pass through.
  *
  * Output: the surviving corpus (doc_id, n_tokens, quality), the input to a
  * tokenizer/packer stage. Every stage is itself oracle-gated; this entry
  * gates the composition. */
object Curation {
  private type Q = (SparkSession, String) => DataFrame

  def curate(docs: DataFrame, minQuality: Double = 0.5, jaccardTau: Double = 0.5): DataFrame = {
    val stats = TextAnalysis.stats(docs).select("doc_id", "n_tokens", "quality")
    val clusters = Dedup.clusters(Dedup.jaccardPairs(docs, k = 3, tau = jaccardTau))
    // non-representative near-dups (cluster members that are not the min id)
    val drop = clusters.where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    stats
      .where(col("quality") >= minQuality)
      .join(drop, Seq("doc_id"), "left_anti")
  }

  val queries: Map[String, Q] = Map(
    "curate_pipeline" -> ((s, dir) => curate(SparkEntry.table(s, dir, "documents"))),
  )

  val oracleSql: Map[String, String] = Map(
    "curate_pipeline" ->
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |st AS (
        |  SELECT doc_id, len(t) AS n_tokens, length(text) AS len_chars,
        |    len(list_filter(t, x -> x IN ('the', 'a', 'data', 'value'))) AS n_stop
        |  FROM toks),
        |q AS (
        |  SELECT doc_id, n_tokens,
        |    0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) +
        |    0.3 * (CAST(n_stop AS DOUBLE) / n_tokens) +
        |    0.3 * least((CAST(len_chars - (n_tokens - 1) AS DOUBLE) / n_tokens) / 8.0, 1.0)
        |      AS quality
        |  FROM st),
        |d AS (
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
        |      UNION ALL SELECT id_b, id_a FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        |comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
        |SELECT q.doc_id, q.n_tokens, q.quality
        |FROM q
        |WHERE q.quality >= 0.5
        |  AND q.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)""".stripMargin,
  )
}
