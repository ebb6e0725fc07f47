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

  def session(base: SparkSession, confs: Seq[(String, String)]): SparkSession = {
    val it = sessions.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    sessions.computeIfAbsent((base, confs), { key =>
      val s = key._1.newSession()
      key._2.foreach { case (k, v) => s.conf.set(k, v) }
      s
    })
  }

  /** Re-bind `df`'s logical plan to the scoped clone: actions on the
    * returned frame plan and execute under `confs`. */
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
}
