package graft.probes

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Whole-surface plan audit for the two optimizer traps round 16 caught in
  * ann_lsh and bitext_mine:
  *
  *  1. DUPLICATED HEAVY EXPRESSIONS — a pushdown/constraint-inference rule
  *     inlines an aliased native expression (matrix cosine, gram hashes,
  *     JMESPath eval, …) into a Filter / scan DataFilters below the Project
  *     that defines it, so the expensive expression evaluates ≥2× per row.
  *     Detector: a heavy prettyName appearing inside any Filter condition
  *     or FileSourceScan DataFilters, or >1 occurrence inside one
  *     WholeStageCodegen subtree's projections.
  *
  *  2. HOF IN A JOIN CONDITION — `lambdafunction(` inside a join condition
  *     has no codegen and drops the whole join out of whole-stage codegen.
  *
  * Runs every SparkEntry.queries entry at the given sfDir and prints one
  * line per flag. Diagnostic main; not part of the library surface.
  * Usage: runMain graft.probes.PlanAuditProbe [sfDir]
  */
object PlanAuditProbe {
  private val heavy = Seq(
    "arg_top_k_lit", "array_gram_hashes", "chrf_stats", "cooc_pairs",
    "cooc_structs", "cosine_sims_all", "jmespath", "jmespath_double",
    "jmespath_filtered", "lcs_length", "minhash_sig", "modal_run_length",
    "prefix_cosine_sims", "shingle_array", "simhash64", "term_counts",
    "token_gram_stats", "window_boundary_cos", "winnow_fingerprints",
    "word_gram_hashes", "word_grams")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def audit(name: String, p: SparkPlan): Seq[String] = {
      val flags = scala.collection.mutable.ArrayBuffer[String]()
      p.foreach {
        case f: org.apache.spark.sql.execution.FilterExec =>
          val c = f.condition.toString
          heavy.filter(c.contains).foreach(h =>
            flags += s"heavy-in-filter:$h")
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          val d = s.dataFilters.mkString(";")
          heavy.filter(d.contains).foreach(h =>
            flags += s"heavy-in-scanfilter:$h")
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          if (j.condition.exists(_.toString.contains("lambdafunction")))
            flags += "hof-in-join-condition"
        case _ =>
      }
      // duplicate heavy expr across Project nodes in ONE stage: count
      // occurrences in project lists (cheap textual proxy; aggregates
      // legitimately repeat partial/final so they are excluded)
      val projTexts = p.collect {
        case pr: org.apache.spark.sql.execution.ProjectExec =>
          pr.projectList.mkString(";")
      }
      heavy.foreach { h =>
        val n = projTexts.map(t => h.r.findAllIn(t).size).sum
        if (n > 1) flags += s"heavy-multi-project:$h x$n"
      }
      flags.distinct.toSeq
    }

    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      try {
        val df = mk(spark, sfDir)
        val p = df.queryExecution.executedPlan
        val flags = audit(name, p)
        if (flags.nonEmpty) { flagged += 1; println(s"[audit] $name: ${flags.mkString(", ")}") }
      } catch {
        case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    println(s"[audit] done, $flagged flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
