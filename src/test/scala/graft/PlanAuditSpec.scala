package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution._

/** Whole-surface standing audit for the three optimizer/plan traps rounds
  * 16-17 caught and fixed by hand in ann_lsh, bitext_mine, and the
  * minhash/simhash pair joins:
  *
  *  1. a pushdown / constraint-inference rule inlining an aliased HEAVY
  *     native expression (matrix cosine, gram hashes, JMESPath eval, …)
  *     into a Filter or a scan's DataFilters below the Project that
  *     defines it — the expression then evaluates ≥2× per row (measured
  *     3.4× on bitext_mine's final job before the fix);
  *
  *  2. a lambda higher-order function inside a JOIN condition — HOFs have
  *     no codegen, and one in the condition drops the entire join out of
  *     whole-stage codegen (measured +25% on ann_lsh's bucket join);
  *
  *  3. a DISTINCT (grouping-only aggregate) over a bucket-equality join
  *     BOTH of whose sides are exploded (each row lands in several
  *     buckets, so a pair can collide more than once) — the candidate-
  *     dedup shape that exchanges the whole candidate stream a second
  *     time, eliminated from ann_lsh (r16) and from minhashLsh /
  *     simhashPairs / imagePhashPairs / embeddingPairs(Incremental)
  *     (r17) by the first-shared-bucket per-row predicate. Joins with
  *     only one exploded side (inverted-index probes), aggregates WITH
  *     aggregate functions (groupBy.agg over joins), and distincts over
  *     non-exploded joins (e.g. retention's user-period join) cannot
  *     produce the multi-collision stream and pass.
  *
  * Every [[SparkEntry.queries]] entry is planned (sf0.001, the PlanSpec
  * scale — plan shapes are statistics-driven and scale-stable) and all
  * three invariants asserted. A NEW legitimate use (e.g. a verify-on-
  * candidates join that deliberately filters on the metric, or PPJoin's
  * variable-length-prefix dedup-by-aggregation) belongs in the documented
  * whitelist below, not silently in the plan. */
class PlanAuditSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  lazy val spark = ProdSession.spark

  // expensive per-row natives: an extra evaluation is a real second pass
  private val heavy = Seq(
    "arg_top_k_lit", "array_gram_hashes", "chrf_stats", "cooc_pairs",
    "cooc_structs", "cosine_sims_all", "jmespath(", "jmespath_double",
    "jmespath_filtered", "lcs_length", "minhash_sig", "modal_run_length",
    "prefix_cosine_sims", "shingle_array", "simhash64", "term_counts",
    "token_gram_stats", "window_boundary_cos", "winnow_fingerprints",
    "word_gram_hashes", "word_grams")

  // documented legitimate exceptions: query -> markers allowed in a
  // filter. minhashLsh's EXPLICIT `size(sh) > 0` guard protects the
  // banding from the empty-shingle hot bucket (every empty doc shares one
  // signature — |empties|² candidate pairs without it); plain predicate
  // pushdown inlines it below the defining Project, and that rule cannot
  // be excluded without losing pushdown for the whole query. The inline
  // was A/B'd at sf0.1 (InferProbe `nopush` phase): ≤5%, inside noise —
  // accepted and pinned here so any NEW heavy-in-filter shape still fails.
  // Invariant-3 whitelist — ONE adjudicated pattern: PPJoin's candidate
  // distinct (the single `candidates()` site in Dedup.scala). Its
  // prefixes are VARIABLE-LENGTH exploded rows under a per-doc window
  // order, so dedup-by-aggregation is the standard PPJoin shape: a
  // first-shared-bucket predicate would require carrying each side's
  // full prefix array on every exploded row, bloating the very exchange
  // the distinct avoids (VERDICT r16 adjudication of Dedup.scala:420).
  // Every gate listed reaches exactly that code site (directly or via
  // jaccardPairs composition).
  private val ppjoinGates = Seq("dedup_jaccard_pairs", "dedup_auto",
    "dedup_edit_verify", "dedup_incremental", "dedup_lsh_recall",
    "dedup_threshold_report", "leakage_split")

  private val whitelist: Map[String, Seq[String]] =
    (Seq("dedup_minhash_lsh" -> "shingle_array",
         "dedup_lsh_recall" -> "shingle_array") ++
      ppjoinGates.map(_ -> "candidate-distinct-over-exploded-join"))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }

  /** Walk through multiplicity-preserving unary nodes to the first
    * "shape" node below a distinct: an aggregate means the distinct sits
    * over an already-reduced stream (fine); a join means the candidate-
    * distinct pattern (invariant 3). */
  @annotation.tailrec
  private def firstShapeBelow(p: SparkPlan): SparkPlan = p match {
    case _: aggregate.BaseAggregateExec => p
    case u: UnaryExecNode => firstShapeBelow(u.child)
    case x => x
  }

  /** True when the subtree explodes rows (a Generate) before any
    * aggregate re-reduces them — the side shape that makes a pair able
    * to collide more than once in a bucket join. */
  private def explodedSide(p: SparkPlan): Boolean = p match {
    case _: aggregate.BaseAggregateExec => false
    case _: GenerateExec => true
    // a reused exchange is a LEAF wrapper over the original exchange —
    // a self-join's second side hides its Generate behind one
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      explodedSide(r.child)
    case x => x.children.exists(explodedSide)
  }

  private def flagsOf(p: SparkPlan): Seq[String] = {
    val flags = scala.collection.mutable.ArrayBuffer[String]()
    p.foreach {
      case f: FilterExec =>
        val c = f.condition.toString
        heavy.filter(c.contains).foreach(h => flags += s"heavy-in-filter:$h")
      case s: FileSourceScanExec =>
        val d = s.dataFilters.mkString(";")
        heavy.filter(d.contains).foreach(h => flags += s"heavy-in-scanfilter:$h")
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        if (j.condition.exists(_.toString.contains("lambdafunction")))
          flags += "hof-in-join-condition"
      case a: aggregate.BaseAggregateExec if a.aggregateExpressions.isEmpty =>
        firstShapeBelow(a.child) match {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec
              if explodedSide(j.left) && explodedSide(j.right) =>
            flags += "candidate-distinct-over-exploded-join"
          case _ =>
        }
      case _ =>
    }
    flags.distinct.toSeq
  }

  test("ConfScope optimizer scopes never change results (rules are redundancy-only)") {
    // the r16 scopes (noInferredFilters on the dedup family, constraint
    // propagation off in bitext_mine, AQE off in annLsh) all claim their
    // excluded machinery is semantically redundant. Pin it: re-enabling
    // the default optimizer on the SAME logical plan (a stacked ConfScope
    // with empty exclusions and defaults restored) must produce identical
    // rows. This differential survives Spark upgrades that change what
    // the excluded rules infer.
    // compare as row-count MULTISETS, not sets (ADVICE r16 #2): an
    // excluded-rule divergence that duplicates or drops copies of an
    // already-present row must fail too
    def rows(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
      df.collect().map(_.mkString("|")).groupBy(identity)
        .map { case (k, v) => (k, v.length) }
    for (name <- Seq("dedup_jaccard_pairs", "dedup_simhash", "bitext_mine",
        "ann_lsh", "leakage_split")) {
      val scoped = SparkEntry.queries(name)(spark, sfDir)
      val unscoped = ext.ConfScope(scoped,
        "spark.sql.optimizer.excludedRules" -> "",
        "spark.sql.constraintPropagation.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "true")
      assert(rows(scoped) == rows(unscoped),
        s"$name: scoped and default-optimizer results diverge")
    }
  }

  test("ConfScope excluded-rule names exist in this Spark build's optimizer (rename guard)") {
    // spark.sql.optimizer.excludedRules matches rule names as STRINGS — a
    // Spark upgrade that renames InferFiltersFromGenerate/-Constraints
    // would silently re-enable the heavy-inline trap everywhere the scope
    // is applied (VERDICT r16 item 7). Pin that every excluded name is a
    // rule the session optimizer actually carries.
    val optimizerRules = spark.sessionState.optimizer.batches
      .flatMap(_.rules).map(_.ruleName).toSet
    ext.ConfScope.RedundantInferRules.split(",").foreach { rn =>
      assert(optimizerRules.contains(rn),
        s"excluded rule '$rn' is not in this Spark build's optimizer — " +
          "the exclusion is dead and the inline trap is re-enabled")
    }
  }

  test("invariant-3 detector control: the old distinct-over-banded-join shape DOES flag") {
    // the r16 ann_lsh anti-pattern rebuilt in miniature — if the detector
    // ever stops seeing it (e.g. a plan wrapper like ReusedExchangeExec
    // hiding the Generate, which silently blinded the first r17 draft),
    // this control fails before the audit goes quietly green
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val banded = Seq((1L, Seq(10L, 20L)), (2L, Seq(10L, 20L)), (3L, Seq(30L, 40L)))
      .toDF("id", "bhs")
      .select(col("id"), col("bhs"), posexplode(col("bhs")).as(Seq("band", "bh")))
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "bh"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    assert(flagsOf(cand.queryExecution.executedPlan)
        .contains("candidate-distinct-over-exploded-join"),
      s"detector no longer sees the candidate-distinct pattern:\n" +
        cand.queryExecution.executedPlan)
  }

  test("no gate query re-evaluates a heavy native in a filter or carries a HOF join condition") {
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      val flags =
        try flagsOf(mk(spark, sfDir).queryExecution.executedPlan)
        catch { case e: Throwable => Seq(s"PLAN-ERROR:${e.getMessage.take(60)}") }
      val allowed = whitelist.getOrElse(name, Nil)
      val effective = flags.filterNot(f => allowed.exists(f.contains))
      if (effective.nonEmpty) bad += s"$name -> ${effective.mkString(", ")}"
    }
    assert(bad.isEmpty,
      s"optimizer-trap audit flagged ${bad.size} queries:\n${bad.mkString("\n")}")
  }
}
