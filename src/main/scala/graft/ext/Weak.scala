package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Weak supervision — programmatic labeling for training data (the
  * Snorkel/data-programming workflow, Ratner et al. VLDB 2018, reduced to
  * its exact-arithmetic core): a set of LABELING FUNCTIONS (LFs) each
  * votes an integer label or abstains (null); the corpus label is the
  * per-row majority vote, and the LF diagnostic report (coverage,
  * agreement, conflict) is what decides which LFs to keep, fix, or
  * reweight. The full Snorkel label model learns LF accuracies by EM —
  * float-iterative and engine-divergent; majority vote is its
  * deterministic, exact backbone (and Snorkel's own default when LFs are
  * few), so that is the operator: pure integer compares, bit-identical on
  * any engine.
  *
  * Scale design (100 TB): [[labelVote]] is entirely NARROW — the LF
  * columns, the vote, and the tie logic are per-row array expressions; no
  * exchange at all, label assignment rides the corpus scan.
  * [[lfReport]] is one partial-aggregated global aggregation (a handful
  * of counters per LF) over the same narrow vote expression — one
  * scan, one tiny exchange of per-partition counters. */
object Weak {
  private type Q = (SparkSession, String) => DataFrame

  /** The majority-vote expression over already-materialized LF output
    * columns: the label with the strictly highest vote count, null
    * (abstain) on a tie or when every LF abstained. Deterministic: vote
    * counts are integers; the unique-winner check needs no tie-break
    * convention at all. */
  private def voteExpr(lfCols: Seq[Column]): Column = {
    val lbls = filter(array(lfCols: _*), x => x.isNotNull)
    val pairs = transform(array_sort(array_distinct(lbls)),
      l => struct(size(filter(lbls, x => x === l)).as("c"), l.as("l")))
    val top = array_max(pairs)
    when(size(pairs) > 0 &&
        size(filter(pairs, p => p.getField("c") === top.getField("c"))) === 1,
      top.getField("l"))
  }

  /** Per-row labels: each `(name, lf)` emits its raw vote as `<name>`,
    * plus `n_votes` (LFs that fired) and `vote` (majority or null). */
  def labelVote(df: DataFrame, idCol: Column,
                lfs: Seq[(String, Column)]): DataFrame = {
    require(lfs.nonEmpty, "need at least one labeling function")
    val cast = lfs.map { case (n, c) => n -> c.cast("long") }
    df.select(idCol.as("id") +: cast.map { case (n, c) => c.as(n) }: _*)
      .withColumn("n_votes",
        size(filter(array(cast.map(c => col(c._1)): _*), x => x.isNotNull))
          .cast("long"))
      .withColumn("vote", voteExpr(cast.map(c => col(c._1))))
  }

  /** Per-LF diagnostics against the majority vote: how often it fired
    * (`n_fired`), agreed with a non-null vote (`n_agree`), conflicted
    * with one (`n_conflict`), and fired while the ensemble abstained
    * (`n_unresolved`). The table that drives LF iteration. */
  def lfReport(df: DataFrame, idCol: Column,
               lfs: Seq[(String, Column)]): DataFrame = {
    val voted = labelVote(df, idCol, lfs)
    // EVERY LF's counters in one aggregation — 4·|LFs|+1 aggregate
    // columns over a single corpus pass, never a pass per LF
    val aggs = count(lit(1)).as("__n") +: lfs.flatMap { case (name, _) =>
      val f = col(name)
      Seq(count(f).as(s"${name}__fired"),
        count(when(f === col("vote"), 1)).as(s"${name}__agree"),
        count(when(f.isNotNull && col("vote").isNotNull && f =!= col("vote"), 1))
          .as(s"${name}__conflict"),
        count(when(f.isNotNull && col("vote").isNull, 1)).as(s"${name}__unresolved"))
    }
    val row = voted.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    lfs.zipWithIndex.map { case ((name, _), i) =>
      val base = 1 + i * 4
      (name, row.getLong(base), row.getLong(base + 1), row.getLong(base + 2),
        row.getLong(base + 3), row.getLong(base).toDouble / n.toDouble)
    }.toDF("lf", "n_fired", "n_agree", "n_conflict", "n_unresolved", "coverage")
  }

  /** The gate's three heterogeneous LFs over `documents` — a length rule
    * that abstains mid-range, a language rule that always fires, and a
    * lexical-diversity rule that abstains on short texts. */
  private def gateLfs: Seq[(String, Column)] = Seq(
    "lf_len" -> when(col("n_chars") > 400L, 1L).when(col("n_chars") < 150L, 0L),
    "lf_lang" -> when(col("lang") === "en", 1L).otherwise(0L),
    "lf_div" -> when(size(split(col("text"), " ")) >= 20,
      when(size(array_distinct(split(col("text"), " "))).cast("double") >=
        size(split(col("text"), " ")).cast("double") * 0.5, 1L).otherwise(0L)))

  val queries: Map[String, Q] = Map(
    "label_vote" -> ((s, dir) =>
      labelVote(SparkEntry.table(s, dir, "documents"), col("doc_id"), gateLfs)),
    "lf_report" -> ((s, dir) =>
      lfReport(SparkEntry.table(s, dir, "documents"), col("doc_id"), gateLfs)),
  )

  // the same LFs as SQL expressions (binary domain → the majority is a
  // closed-form CASE on the two counts; a tie abstains)
  private val lfSql =
    """SELECT doc_id,
      |  CASE WHEN n_chars > 400 THEN CAST(1 AS BIGINT)
      |       WHEN n_chars < 150 THEN CAST(0 AS BIGINT) END AS lf_len,
      |  CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
      |       ELSE CAST(0 AS BIGINT) END AS lf_lang,
      |  CASE WHEN len(string_split(text, ' ')) >= 20 THEN
      |    CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) >=
      |              CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.5
      |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
      |  END AS lf_div
      |FROM documents""".stripMargin

  private val votedSql =
    s"""WITH lf AS ($lfSql),
       |v AS (SELECT doc_id, lf_len, lf_lang, lf_div,
       |  CAST(lf_len IS NOT NULL AS BIGINT) + CAST(lf_lang IS NOT NULL AS BIGINT)
       |    + CAST(lf_div IS NOT NULL AS BIGINT) AS n_votes,
       |  COALESCE(CAST(lf_len = 1 AS BIGINT), 0) + COALESCE(CAST(lf_lang = 1 AS BIGINT), 0)
       |    + COALESCE(CAST(lf_div = 1 AS BIGINT), 0) AS ones,
       |  COALESCE(CAST(lf_len = 0 AS BIGINT), 0) + COALESCE(CAST(lf_lang = 0 AS BIGINT), 0)
       |    + COALESCE(CAST(lf_div = 0 AS BIGINT), 0) AS zeros
       |  FROM lf)
       |SELECT doc_id AS id, lf_len, lf_lang, lf_div, n_votes,
       |  CASE WHEN ones > zeros THEN CAST(1 AS BIGINT)
       |       WHEN zeros > ones THEN CAST(0 AS BIGINT) END AS vote
       |FROM v""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "label_vote" -> votedSql,
    "lf_report" ->
      s"""WITH voted AS ($votedSql),
         |t AS (SELECT count(*) AS n FROM voted)
         |SELECT lf, n_fired, n_agree, n_conflict, n_unresolved,
         |  CAST(n_fired AS DOUBLE) / n AS coverage
         |FROM (
         |  SELECT 'lf_len' AS lf, count(lf_len) AS n_fired,
         |    count(CASE WHEN lf_len = vote THEN 1 END) AS n_agree,
         |    count(CASE WHEN lf_len IS NOT NULL AND vote IS NOT NULL
         |               AND lf_len != vote THEN 1 END) AS n_conflict,
         |    count(CASE WHEN lf_len IS NOT NULL AND vote IS NULL THEN 1 END)
         |      AS n_unresolved FROM voted
         |  UNION ALL
         |  SELECT 'lf_lang', count(lf_lang),
         |    count(CASE WHEN lf_lang = vote THEN 1 END),
         |    count(CASE WHEN lf_lang IS NOT NULL AND vote IS NOT NULL
         |               AND lf_lang != vote THEN 1 END),
         |    count(CASE WHEN lf_lang IS NOT NULL AND vote IS NULL THEN 1 END)
         |  FROM voted
         |  UNION ALL
         |  SELECT 'lf_div', count(lf_div),
         |    count(CASE WHEN lf_div = vote THEN 1 END),
         |    count(CASE WHEN lf_div IS NOT NULL AND vote IS NOT NULL
         |               AND lf_div != vote THEN 1 END),
         |    count(CASE WHEN lf_div IS NOT NULL AND vote IS NULL THEN 1 END)
         |  FROM voted
         |), t""".stripMargin,
  )
}
