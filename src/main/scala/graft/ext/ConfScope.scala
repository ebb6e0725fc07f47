package graft.ext

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.bridge

/** Per-QUERY SQL-conf scoping without mutating the caller's session: a
  * memoized session CLONE per (base session, conf overrides).
  * `newSession()` builds a fresh SessionState — too heavy per call, hence
  * the memo — and the clone shares the SparkContext, catalog and cache
  * manager while owning its own SQLConf, so an override executed through
  * it can never leak into concurrent planners on the base session (the
  * round-13 quantile-bounds discipline, now shared).
  *
  * Eviction (ADVICE r14 #4): clones of STOPPED contexts are swept on every
  * lookup — mirroring `SparkEntry.tableCache` — so test suites that cycle
  * sessions do not accumulate dead SessionStates. */
object ConfScope {
  private val sessions =
    new ConcurrentHashMap[(SparkSession, Seq[(String, String)]), SparkSession]()
  // clone -> (root base session, flattened overrides) so STACKED scopes
  // compose instead of silently dropping the inner scope (ADVICE r16 #3):
  // newSession() starts from initial confs, not the clone's runtime confs,
  // so re-scoping must re-apply the inherited overrides explicitly
  private val scopeOf =
    new ConcurrentHashMap[SparkSession, (SparkSession, Seq[(String, String)])]()

  def session(base: SparkSession, confs: Seq[(String, String)]): SparkSession = {
    val it = sessions.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) { scopeOf.remove(e.getValue); it.remove() }
    }
    // flatten: scoping an already-scoped clone starts from its ROOT with
    // the union of overrides, the OUTER scope winning on a shared key —
    // e.g. PlanAuditSpec's differential restores a default over
    // noInferredFilters while any unrelated inner override survives
    val (root, inherited) = Option(scopeOf.get(base)).getOrElse((base, Nil))
    val merged =
      inherited.filterNot { case (k, _) => confs.exists(_._1 == k) } ++ confs
    sessions.computeIfAbsent((root, merged), { key =>
      val s = key._1.newSession()
      key._2.foreach { case (k, v) => s.conf.set(k, v) }
      scopeOf.put(s, (key._1, key._2))
      s
    })
  }

  /** Re-bind `df`'s logical plan to the scoped clone: actions on the
    * returned frame plan and execute under `confs`. Stacking on an
    * already-scoped frame composes — the plan re-binds to a clone of the
    * ROOT session carrying both scopes' overrides (outer wins per key). */
  def apply(df: DataFrame, confs: (String, String)*): DataFrame =
    bridge.ofRows(session(df.sparkSession, confs.toSeq), df)

  /** Scope a query whose dominant ObjectHashAggregate carries GROWABLE
    * buffers (collect_set / collect_list) over MANY groups back to Spark's
    * default sort-based fallback: [[graft.SessionTuning]] raises the
    * fallback threshold session-wide for the k-BOUNDED top-k buffers
    * (hash wins ~2× there), but for high-cardinality set collection the
    * sort path wins instead (r15 probes: item_cooc basket agg 1.0→0.8 s,
    * source_overlap 1.3→1.0 s at sf0.1 — while bleu_corpus and every
    * top-k gate prefer the raised value). The preference tracks buffer
    * shape, not data size, so it is a per-OPERATOR property — scoped
    * here, not a session knob. */
  def sortBasedAgg(df: DataFrame): DataFrame =
    apply(df, graft.SessionTuning.ObjectHashFallbackKey -> "128")

  /** The two filter-INFERENCE rules whose inferred predicates are
    * semantically redundant by construction (a Generate drops null/empty
    * generator inputs itself; an inner join drops null keys itself) but
    * can inline a HEAVY aliased expression below the Project that defines
    * it — `explode(sh)` over a shingle/signature column infers
    * `size(sh) > 0 AND isnotnull(sh)` and predicate pushdown substitutes
    * the alias into the scan's filter, so shingle_array/simhash64/
    * arg_top_k_lit evaluate 2-3× per row (the r16 ann_lsh/bitext_mine
    * trap, then found across the dedup family by PlanAuditSpec). */
  val RedundantInferRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate," +
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints"

  /** Scope a query whose hot path computes an expensive native per row
    * and then explodes/joins on it: the redundant inferred filters (see
    * [[RedundantInferRules]]) are excluded, so the expression evaluates
    * exactly once per row. Measured at sf0.1 (InferProbe, min-of-5, one
    * JVM): leakage_split −62%, dedup_incremental −53%, dedup_simhash
    * −46%, dedup_minhash_lsh −31%, dedup_jaccard_pairs −15%. The
    * inference being off also drops inferred IsNotNull parquet pushdowns
    * for the whole query — cheap-column early-drops the measurement
    * already nets against. */
  def noInferredFilters(df: DataFrame): DataFrame =
    apply(df, "spark.sql.optimizer.excludedRules" -> RedundantInferRules)
}
