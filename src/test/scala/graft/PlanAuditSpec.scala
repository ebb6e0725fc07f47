package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution._

/** Whole-surface standing audit for the two optimizer traps round 16
  * caught and fixed by hand in ann_lsh and bitext_mine:
  *
  *  1. a pushdown / constraint-inference rule inlining an aliased HEAVY
  *     native expression (matrix cosine, gram hashes, JMESPath eval, …)
  *     into a Filter or a scan's DataFilters below the Project that
  *     defines it — the expression then evaluates ≥2× per row (measured
  *     3.4× on bitext_mine's final job before the fix);
  *
  *  2. a lambda higher-order function inside a JOIN condition — HOFs have
  *     no codegen, and one in the condition drops the entire join out of
  *     whole-stage codegen (measured +25% on ann_lsh's bucket join).
  *
  * Every [[SparkEntry.queries]] entry is planned (sf0.001, the PlanSpec
  * scale — plan shapes are statistics-driven and scale-stable) and both
  * invariants asserted. A NEW legitimate use (e.g. a verify-on-candidates
  * join that deliberately filters on the metric) belongs in the
  * documented whitelist below, not silently in the plan. */
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
  private val whitelist: Map[String, Seq[String]] = Map(
    "dedup_minhash_lsh" -> Seq("shingle_array"),
    "dedup_lsh_recall" -> Seq("shingle_array"))

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
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
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
