package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.functions.vectors

/** Deduplication operators for LLM-training-data pipelines over
  * `documents` / `embeddings`:
  *
  *  - exact dedup: group on a 256-bit content hash (shuffling a 32-byte key,
  *    not the document body — the 100 TB-safe variant of `groupBy(text)`);
  *  - exact near-dup pairs: k-shingle Jaccard via an inverted-index
  *    candidate join (EXACT for any threshold > 0: J(a,b) ≥ τ > 0 implies a
  *    shared shingle, so candidate generation loses nothing) — never an
  *    all-pairs cross join;
  *  - MinHash-LSH: one-pass 64-hash signatures ([[graft.functions.MinHashSig]]),
  *    banded bucket join for candidates, exact-Jaccard verification;
  *  - SimHash: 64-bit fingerprints ([[graft.functions.SimHash]]), 16-bit-band
  *    blocking (pigeonhole: hamming ≤ 3 guarantees one of the 4 bands matches
  *    exactly, so blocking is EXACT for maxHamming ≤ 3), XOR-popcount verify;
  *  - embedding near-dup pairs: IVF-cell-blocked candidates (narrow
  *    nearest-centroid assignment, cell-equality bucket join) verified with
  *    exact double-precision cosine ([[graft.functions.CosineSim]]) — the
  *    all-pairs cross join survives only as the ExtSpec recall baseline.
  *
  * Scale notes (100 TB): the shingle inverted index shuffles one row per
  * (shingle, doc); hot shingles skew the join — AQE skew-join handles
  * moderate skew, and `maxDocFreq` can drop shingles present in more than a
  * fixed number of documents (turns the pairing approximate; off by default).
  */
object Dedup {
  private type Q = (SparkSession, String) => DataFrame

  /** Distinct k-word shingles of `text` (space-tokenized), ascending binary
    * order — a single-pass native expression
    * ([[graft.functions.ShingleArray]]); set-equal to the SQL-oracle
    * formulation `array_distinct(transform(...concat_ws(slice(split))))`. */
  def shingles(text: Column, k: Int = 3): Column =
    vectors.shingleArray(text, k)

  /** Exact dedup: one representative (min doc_id) per distinct content. */
  def exact(df: DataFrame): DataFrame =
    df.groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** SOFT dedup — duplicate DOWN-WEIGHTING instead of removal (the
    * SoftDeDup observation: some duplication is signal, so keep every copy
    * but scale its training weight to `1/n_copies`, making each distinct
    * content contribute one document's worth of gradient regardless of its
    * copy count). Output: `doc_id, n_copies, weight` — row parity with the
    * input; the loader multiplies per-example loss by `weight`.
    *
    * Plan: ONE shuffle — a count window partitioned by the sha2-256 content
    * hash. Only `(doc_id, hash)` crosses the wire (the [[exact]] posture:
    * never document bodies), and the weight is a single IEEE division —
    * bit-identical across engines. */
  def softDedup(df: DataFrame): DataFrame = {
    val byContent = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
    df.select(col("doc_id"), sha2(col("text"), 256).as("__h"))
      .withColumn("n_copies", count(lit(1)).over(byContent))
      .select(col("doc_id"), col("n_copies"),
        (lit(1.0) / col("n_copies")).as("weight"))
  }

  /** Serialized corpus Bloom filter over `xxhash64(text)` — the persistable
    * membership sketch of a corpus snapshot (build once per snapshot, reuse
    * for every incoming batch, like [[JaccardIndex]] for the near-dup path).
    * Built distributed (`DataFrameStatFunctions.bloomFilter` merges per-
    * partition filters); the driver holds only the final bit array —
    * ~1.2 GB for 10⁹ items at 1% fpp, the standard memory/shuffle trade.
    * `expectedItems <= 0` measures the corpus with one `count()` job. */
  def buildContentBloom(corpus: DataFrame, expectedItems: Long = 0L,
                        fpp: Double = 0.01): Array[Byte] = {
    val n = if (expectedItems > 0) expectedItems else corpus.count()
    val bf = corpus.select(xxhash64(col("text")).as("h"))
      .stat.bloomFilter("h", math.max(n, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** EXACT incremental exact-dedup via bloom-then-verify: the batch rows
    * whose content does NOT appear in the corpus — without ever shuffling
    * the corpus. The filter has no false negatives, so
    * `NOT mightContain(xxhash64(text))` is a sound scan-time "definitely
    * new" filter that lets ~(1 − dup_rate − fpp) of the batch bypass the
    * verify join entirely; only bloom-maybes (true dups + the fpp sliver)
    * are verified against the corpus by content hash. Exactness: the final
    * key is sha2-256 of the text ([[exact]]'s posture), the bloom only
    * routes.
    *
    * Plan shape at 100 TB: batch probe is narrow (the filter rides inside
    * whole-stage codegen, [[graft.functions.BloomMightContain]]); the
    * corpus is scanned once and semi-joined against the BROADCAST maybe
    * hashes (no corpus shuffle — the maybe set is batch-sized × (dup rate
    * + fpp)); the surviving present-set is tiny and broadcasts back for the
    * anti-join. Compare the plain `left_anti` join oracle: that shuffles
    * corpus AND batch on the content hash. */
  def bloomNewDocs(bloomBytes: Array[Byte], corpus: DataFrame,
                   batch: DataFrame): DataFrame = {
    val maybe = vectors.bloomMightContain(bloomBytes, xxhash64(col("text")))
    val definitelyNew = batch.where(!maybe)
    val maybes = batch.where(maybe)
    val maybeHashes = maybes.select(sha2(col("text"), 256).as("__h")).distinct()
    val present = corpus.select(sha2(col("text"), 256).as("__h"))
      .join(broadcast(maybeHashes), Seq("__h"), "left_semi")
      .distinct()
    val stillNew = maybes.join(broadcast(present),
      sha2(col("text"), 256) === col("__h"), "left_anti")
    definitelyNew.unionByName(stillNew)
  }

  /** SUB-document exact dedup (CCNet/Dolma-style duplicated-span removal):
    * cut every document into non-overlapping `chunkLen`-token chunks, drop
    * every chunk whose exact text occurs more than once in the WHOLE corpus
    * (boilerplate, license headers, templated spans — including both copies,
    * as repeated text adds no training signal), and reassemble the
    * survivors in order. Output: `doc_id, n_chunks, n_dropped, text_clean`
    * (`text_clean` is `""` when everything was boilerplate — row parity with
    * the input is preserved).
    *
    * Plan: explode chunks → global occurrence count keyed on
    * `xxhash64(chunk)` (8-byte shuffle keys instead of ~chunkLen-word
    * strings, the [[Hygiene.contamination]] `hashKeys` pattern — at corpus
    * scale this is the hottest aggregation; the chunk TEXT travels only on
    * the doc-side rows that reassembly needs) → count join back →
    * per-document reassembly (one groupBy; survivors re-ordered via
    * `array_sort` over `(pos, chunk)` structs). Three shuffles, keyed by
    * hash or doc_id — never all-pairs. Collision posture: an xxhash64
    * collision merges two distinct chunks' counts, so a unique chunk can be
    * over-dropped as boilerplate (conservative for training data; at 10¹⁰
    * chunks the expected collision count is ~10⁻²·corpus-fraction — the
    * same acceptance as contamination's `hashKeys`). */
  def subdocDedup(df: DataFrame, chunkLen: Int = 8): DataFrame = {
    val w = col("__w")
    val pcs = transform(
      sequence(lit(1), ceil(size(w) / lit(chunkLen.toDouble)).cast("int")),
      i => struct(i.as("pos"),
        array_join(slice(w, (i - lit(1)) * chunkLen + 1, lit(chunkLen)), " ")
          .as("chunk")))
    val chunks = df.select(col("doc_id"), split(col("text"), " ").as("__w"))
      .select(col("doc_id"), explode(pcs).as("pc"))
      .select(col("doc_id"), col("pc.pos").as("pos"), col("pc.chunk").as("chunk"))
      .withColumn("h", xxhash64(col("chunk")))
    val counts = chunks.groupBy("h").agg(count(lit(1)).as("cnt"))
    chunks.join(counts, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("cnt") > 1, lit(1))).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("cnt") === 1, struct(col("pos"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("text_clean"))
  }

  /** EXACT-SUBSTRING dedup at arbitrary offsets — the distributed analogue
    * of Lee et al. 2022's ExactSubstr (arXiv:2107.06499 §4.1): where
    * [[subdocDedup]] drops duplicated FIXED chunks (both copies), this
    * removes every duplicated run of `gramLen` consecutive tokens wherever
    * it starts. The corpus-global first occurrence of each duplicated gram
    * (min `(doc_id, pos)`) is KEPT; every later occurrence marks its token
    * span `[pos, pos+gramLen)` for removal; overlapping spans are merged per
    * document; survivors reassemble in order. Output:
    * `doc_id, n_tokens, n_removed, text_clean` (row parity with the input).
    *
    * Plan: explode sliding gram positions → hash each gram AT SCAN TIME
    * (`xxhash64` — 8-byte shuffle keys; the gram text never shuffles) → one
    * global `min(struct(doc_id, pos))`+count aggregation per key → join
    * duplicated keys back to occurrences → per-doc interval collect →
    * sort + fold-merge (a periodic fully-duplicated doc collapses to ONE
    * island, so the per-token coverage probe is bounded by the merged-island
    * count, not the raw removal count) → reassemble. Every shuffle is keyed
    * by hash or doc_id — never all-pairs. Gram construction materializes
    * each token into `gramLen` grams (O(n·gramLen) chars/doc); at corpus
    * scale a polynomial rolling hash makes it O(n) — a constant-factor
    * refinement of the same plan. Collision posture: an xxhash64 collision
    * can mark a unique span duplicated and over-remove it (conservative for
    * training data — the [[subdocDedup]] acceptance). */
  def substringDedup(df: DataFrame, gramLen: Int = 8): DataFrame = {
    val L = gramLen
    require(L >= 2, "gramLen >= 2 (1-grams would remove every repeated word)")
    val toks = df.select(col("doc_id"), split(col("text"), " ").as("__w"))
    // guard: sequence(1, n-L+1) with n < L would count DOWN (Spark infers a
    // negative step), inventing positions — short docs emit no grams at all
    val nPos = size(col("__w")) - (L - 1)
    val grams = toks
      .select(col("doc_id"), col("__w"),
        explode(when(nPos >= 1, sequence(lit(1), nPos))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(array_join(slice(col("__w"), col("pos"), lit(L)), " ")).as("h"))
    val occ = grams.groupBy("h").agg(
      min(struct(col("doc_id"), col("pos"))).as("first"),
      count(lit(1)).as("cnt"))
    val ivs = grams.join(occ.where(col("cnt") > 1), "h")
      .where(!(col("doc_id") === col("first.doc_id") &&
               col("pos") === col("first.pos")))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("pos").as("s"),
        (col("pos") + L).as("e"))).as("ivs"))
    val emptyIvs = array().cast("array<struct<s:int,e:int>>")
    toks.join(ivs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("__w"),
        array_sort(coalesce(col("ivs"), emptyIvs)).as("__iv"))
      .select(col("doc_id"), col("__w"),
        // fold-merge sorted intervals: extend the last island or open a new
        // one (CaseWhen is non-strict, so element_at(acc, -1) never runs on
        // an empty accumulator)
        aggregate(col("__iv"), emptyIvs, (acc, iv) =>
          when(size(acc) === 0 ||
               iv.getField("s") > element_at(acc, -1).getField("e"),
            concat(acc, array(iv)))
          .otherwise(concat(slice(acc, lit(1), size(acc) - 1), array(struct(
            element_at(acc, -1).getField("s").as("s"),
            greatest(element_at(acc, -1).getField("e"),
              iv.getField("e")).as("e")))))).as("__m"))
      .select(col("doc_id"), col("__w"),
        filter(sequence(lit(1), size(col("__w"))), j =>
          !exists(col("__m"), iv =>
            j >= iv.getField("s") && j < iv.getField("e"))).as("__kept"))
      .select(col("doc_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        (size(col("__w")) - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(transform(col("__kept"), j => element_at(col("__w"), j)),
          " ").as("text_clean"))
  }

  /** All pairs with k-shingle Jaccard ≥ tau, via PPJoin-style prefix
    * filtering over an inverted index. EXACT for tau > 0: a pair with
    * J(A,B) ≥ τ must share ≥ ⌈τ·max(|A|,|B|)⌉ shingles, so under any global
    * total order its FIRST common shingle sits within the first
    * |X| − ⌈τ·|X|⌉ + 1 shingles of both docs (prefix-filtering lemma) —
    * indexing only those prefixes loses no qualifying pair. The candidate
    * join also applies the length filter (min(|A|,|B|) ≥ τ·max(|A|,|B|))
    * and the PPJoin positional filter
    * ((1 + min(|A|−pa, |B|−pb))·(1+τ) ≥ τ·(|A|+|B|) — an overlap upper
    * bound given the first shared prefix position; both hold for the first
    * common shingle of every qualifying pair, so both stay exact).
    * Surviving candidates are verified with an exact array intersection.
    *
    * The global order is ascending DOCUMENT FREQUENCY (ties by shingle hash,
    * then shingle value — a true total order), the PPJoin ordering: rarest
    * shingles land in the prefixes, collapsing candidate volume. This costs a df aggregation + join + per-doc window,
    * but measured A/B (sf0.1), a cheaper value-ordered prefix (plain
    * `sort_array` + `slice`, two fewer shuffles) is 2-3× SLOWER end-to-end:
    * lexicographic prefixes correlate across documents sharing vocabulary,
    * so the equality join explodes — df-ordering wins at every scale.
    *
    * `maxDocFreq` (optional) additionally drops shingles occurring in more
    * than that many docs — a scale valve that makes the result approximate
    * but bounds worst-case blowup. Size it from the candidate-pair budget
    * the cluster can verify (`Tuning.suggestMaxDocFreq(pairBudget)`: a
    * df-doc shingle alone contributes df·(df−1)/2 pairs), not from an
    * absolute frequency that stops binding as the corpus grows. */
  def jaccardPairs(df: DataFrame, k: Int = 3, tau: Double = 0.5,
                   maxDocFreq: Option[Int] = None): DataFrame =
    jaccardPairsWhere(df, (_, _) => lit(true), k, tau, maxDocFreq)

  /** Threshold-calibration report for near-dup removal: per candidate τ,
    * how many pairs fire and how many documents are touched — the "what
    * does each threshold cost" table consulted BEFORE committing a dedup
    * threshold (τ = 0.9 removes near-identical copies; τ = 0.5 is
    * aggressive and eats templated families; picking blind is how
    * corpora lose whole domains). Output: (tau, n_pairs,
    * n_docs_affected), exact integers.
    *
    * Scale: ONE pair pass at the LOOSEST τ (the [[jaccardPairs]]
    * inverted-index shape — never re-run per threshold), consumed by ONE
    * downstream tree (VERDICT r13 item 5: the previous crossJoin of two
    * aggregates over the same `pairs` subtree relied on AQE exchange
    * reuse to stay single-pass — unpinned and plan-fragile): each pair
    * explodes into its two doc contributions, a per-doc aggregation
    * folds both the doc's conditional pair counts and its max jaccard,
    * and one global aggregation finishes — `n_pairs` is the conditional
    * count over exploded rows halved (every pair contributes exactly
    * twice, so the division is exact), `n_docs_affected` counts docs by
    * max. Pinned single-pass by PlanSpec (the pair subtree appears once
    * in the physical plan). Jaccard values are single divisions of exact
    * integers (bit-identical cross-engine), so the τ comparisons never
    * straddle an engine-dependent rounding. */
  def dedupThresholdReport(df: DataFrame,
                           taus: Seq[Double] = Seq(0.5, 0.7, 0.9),
                           k: Int = 3): DataFrame = {
    require(taus.nonEmpty && taus.forall(t => t > 0.0 && t <= 1.0),
      "need thresholds in (0, 1]")
    val ts = taus.distinct.sorted
    val pairs = jaccardPairs(df, k, ts.head)
    val byDoc = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"), col("jac"))
      .groupBy("doc_id")
      .agg(max(col("jac")).as("mx"),
        ts.zipWithIndex.map { case (t, i) =>
          sum(when(col("jac") >= t, 1L).otherwise(0L)).as(s"__np_$i") }: _*)
    val aggs =
      ts.zipWithIndex.map { case (_, i) => // exact halving: the sum is even
        shiftright(sum(col(s"__np_$i")), 1).as(s"__np_$i") } ++
      ts.zipWithIndex.map { case (t, i) =>
        sum(when(col("mx") >= t, 1L).otherwise(0L)).as(s"__nd_$i") }
    byDoc.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ts.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("tau"),
          coalesce(col(s"__np_$i"), lit(0L)).as("n_pairs"),
          coalesce(col(s"__nd_$i"), lit(0L)).as("n_docs_affected")) }: _*))
        .as("__r"))
      .select(col("__r.tau"), col("__r.n_pairs"), col("__r.n_docs_affected"))
  }

  /** [[jaccardPairs]] restricted to pairs satisfying `pairCond(idA, idB)` —
    * the condition is pushed INTO the candidate equi-join, so pairs outside
    * the restriction are dropped before the (more expensive) exact-verify
    * join, not filtered afterwards. Exactness is unchanged: the prefix
    * lemma bounds where a qualifying pair's first shared shingle sits
    * regardless of which pairs the caller keeps. The main client is
    * bipartite pairing where membership is a pure function of the id
    * (e.g. [[graft.ext.Curation.leakageSafeSplit]]'s cross-split pairs) —
    * recomputing a cheap hash per candidate beats threading a side column
    * through the shingle/df/prefix shuffles. */
  def jaccardPairsWhere(df: DataFrame, pairCond: (Column, Column) => Column,
                        k: Int = 3, tau: Double = 0.5,
                        maxDocFreq: Option[Int] = None): DataFrame = {
    val d = shingled(df, k)
    val inv = invRows(d)
    // df per HASH (collisions merge counts — a vanishing perturbation of the
    // frequency heuristic, not of correctness). ONE h-keyed shuffle both
    // counts df and re-attaches it (r19, guide §2.4): the previous
    // aggregate-then-join shape shuffled the exploded stream by h TWICE
    // (once into the dfreq aggregation, once as the join probe side).
    // Group size is bounded by max df — and a df large enough to strain
    // one collect_list buffer produces df² candidate pairs, which kills
    // the downstream join first (jaccardPreflight is the guard for that
    // degenerate-corpus regime at any scale).
    val withDf = withDfRows(inv)
    val prefix0 = maxDocFreq match {
      case Some(cap) =>
        // count hotness by the shingle VALUE and evict on (h, s): an h-only
        // anti-join would let a hash collision merge a cold shingle's count
        // into a hot one's and evict the cold shingle's prefix rows too — a
        // silent recall loss beyond the documented cap heuristic (ADVICE
        // r7 #5). `s` is carried through the prefix window (already in its
        // shuffle) and dropped before the candidate join, so the 8-byte
        // join keys are unchanged.
        val hot = d.select(explode(col("sh")).as("s"))
          .groupBy(col("s")).agg(count(lit(1)).as("df"))
          .where(col("df") > cap)
          .select(xxhash64(col("s")).as("h"), col("s"))
        prefixRows(withDf, tau, keepShingle = true)
          .join(hot, Seq("h", "s"), "left_anti").drop("s")
      case None => prefixRows(withDf, tau)
    }
    // NOT sharedStage'd (r19 A/B, min-of-5 sentinel-matched, re-run on the
    // one-shuffle/agg-prefix shape): checkpointing the prefix table made
    // dedup_jaccard_pairs 1.36 → 4.13 s and dedup_components 1.43 → 4.82 s
    // — the serial materialization barrier replaced an AQE DAG whose
    // shuffle subtrees are stage-reused at runtime (the buildJaccardIndex
    // lesson; the broadcast-side re-derivation visible in the static plan
    // is deduped at runtime by AQE stage reuse, unlike minhashLsh's).
    val prefix = prefix0
    // redundant-inference scope (r16): InferFiltersFromGenerate turns the
    // invRows explode into `size(shingle_array(text)) > 0 AND isnotnull(
    // shingle_array(text))` scan filters — 2 extra shingle passes per row
    // (PlanAuditSpec; InferProbe measured −15% here, more downstream)
    ConfScope.noInferredFilters(verifyPairs(
      candidates(prefix, prefix, tau, pairCond(col("x.doc_id"), col("y.doc_id"))),
      d, tau))
  }

  // ——— shared internals of the PPJoin family ———

  private val eps = 1e-9 // slack so float rounding never prunes a boundary pair

  /** Shingle arrays, spread across the cluster first: shingling + the
    * candidate join are CPU-bound relative to input bytes, so split-based
    * scan parallelism underparallelizes small-file inputs (one 594 KB
    * parquet split would run the whole index build on ONE task). At real
    * scale the scan already has ≥ defaultParallelism splits → no-op. `sh`
    * is value-sorted (ShingleArray emits ascending order): verification
    * uses set ops only. Detects underparallelized FILE inputs from the
    * driver-side listing — unlike df.rdd.getNumPartitions this never
    * materializes an RDD lineage just to read a number. */
  private def shingled(df: DataFrame, k: Int): DataFrame =
    spread(df).select(col("doc_id"), shingles(col("text"), k).as("sh"))

  /** Spread a few-files input across the cores before a heavy narrow
    * stage (a one-file parquet corpus otherwise computes single-task).
    *
    * Contract: call on a SINGLE-SOURCE frame, before composition (every
    * call site does; Fuzzy spreads each join side separately). The
    * decision keys on the per-leaf MINIMUM file count, not the aggregate
    * listing (ADVICE r17 #3): a composed frame whose heavy side is ONE
    * file but which references ≥ cores files in total would otherwise
    * silently skip the spread and the single-task-stage class returns.
    * For a contract-violating multi-leaf frame the min rule degrades to
    * the safe side — one extra exchange — instead of that
    * silent perf cliff. Driver-side listing only (never materializes an
    * RDD lineage just to read a partition count); in-memory frames (no
    * file leaves) pass through untouched, and at real scale every leaf
    * has ≥ defaultParallelism files → provable no-op.
    *
    * The exchange hashes the FULL ROW (xxhash64 over every column), not
    * round-robin (r19, guide §2.5): a keyless repartition first pays a
    * local sort of its input (`sortBeforeRepartition`, kept on for retry
    * determinism) — measured −9…16% across the spread-heavy queries
    * (dedup_jaccard_pairs 1.65 → 1.40, bleu_corpus 1.85 → 1.71,
    * chrf_eval 0.42 → 0.38 s, same-window min-of-7) — while a
    * content-hash is retry-deterministic BY VALUE with no sort, and 2⁶⁴
    * key values spread evenly over any partition count. Every call site
    * spreads a frame carrying a unique id column, so rows hash distinct;
    * the degenerate case (identical full rows colliding) degrades to the
    * un-spread single-task behavior, never to wrong results. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val leafFiles = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.length
          // non-file relation: no listing to reason about — never the
          // single-row-group parquet shape this helper exists for
          case _ => Int.MaxValue
        }
      // DSv2 file scans (ADVICE r18 #2): with parquet removed from
      // useV1SourceList the leaf is a DataSourceV2Relation over a
      // FileTable — matching only v1 leaves would silently disable the
      // spread and re-open the single-task-stage cliff
      case dv2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        dv2.table match {
          case ft: org.apache.spark.sql.execution.datasources.v2.FileTable =>
            ft.fileIndex.inputFiles.length
          case _ => Int.MaxValue
        }
    }
    val nFiles = if (leafFiles.isEmpty) 0 else leafFiles.min
    if (nFiles > 0 && nFiles < par)
      df.repartition(par, xxhash64(df.columns.map(col): _*))
    else df
  }

  /** Shared-stage reuse point: a heavy derived table consumed by SEVERAL
    * plan branches (both self-join sides, verify joins) is lazily
    * checkpointed so the pipeline computes ONCE — Spark's exchange/stage
    * reuse does not dedup independent broadcast builds (measured on
    * minhashLsh: three serialized single-task builds each re-deriving the
    * full signature pipeline, ~0.8 s apiece at sf0.1; checkpointed gate
    * 1.84 → 0.95 s on the same window). Spread the INPUT before the
    * heavy projection (an exchange after it would compute single-task
    * first). Lazy, never eager: plan construction must not fire jobs
    * (ADVICE r7 #4). At scale, persisting the shared stage beats N corpus
    * scans + N recomputes — the dedupBatch pairs-cache precedent.
    *
    * Storage/recovery tradeoff (ADVICE r17 #2), accepted deliberately:
    * localCheckpoint blocks are NON-REPLICATED and truncate lineage, so
    * (a) at cluster scale an executor loss makes the checkpointed RDD
    * unrecoverable — the job fails and retries from the source, where the
    * pre-r17 plans recomputed the branch 4× every run; a deployment that
    * cannot retry should swap this for `spark.sparkContext
    * .setCheckpointDir` + reliable `checkpoint()` at the cost of one
    * write to fault-tolerant storage; and (b) the persisted blocks are
    * freed by the ContextCleaner only when the driver GCs the DataFrame —
    * a long session looping banded gates holds one signature table per
    * in-flight gate (bounded: these tables are a projection of the
    * corpus, and each gate's reference dies with its query). Explicit
    * unpersist is not possible here — the helper RETURNS the plan; the
    * consuming action happens in caller/driver code that must not know
    * about persistence. */
  private[ext] def sharedStage(derived: DataFrame): DataFrame =
    derived.localCheckpoint(false)

  /** The first index i < n where `eq(i)` holds, else -1 — the shared
    * first-shared-band/table dedup predicate of the banded families
    * (VERDICT r17 #4: one definition instead of four hand-rolled copies).
    * A pair colliding in several bands/tables keeps exactly the exploded
    * row whose band equals this index, replacing the `distinct()` that
    * exchanged the whole candidate stream. Built as a CASE chain over
    * LITERAL indices, never zip_with/array_position: higher-order
    * functions have no codegen, and one in a join condition drops the
    * whole join out of whole-stage codegen (measured +25% on the sf0.1
    * ann_lsh gate). n is a plan-time constant, so the chain is bounded. */
  private[graft] def firstSharedIndex(n: Int)(eq: Int => Column): Column =
    (0 until n).foldRight(lit(-1): Column) {
      case (i, acc) => when(eq(i), lit(i)).otherwise(acc)
    }

  /** Exploded inverted-index rows (doc_id, n, s, h). Everything from here
    * to verification keys on h = xxhash64(shingle), not the shingle string:
    * the df aggregation, the prefix join, the window sort, and the
    * candidate equi-join all shuffle/compare 8 bytes instead of a ~3-word
    * text (measured ~15% off the whole query at sf0.1, and the byte savings
    * grow with shingle length at real scale). Exactness is unaffected: the
    * global prefix order is (df, h, s) — a true total order because s
    * breaks any h collision — and a hash collision in the candidate join
    * can only ADD candidates, which the exact verify removes. */
  private def invRows(d: DataFrame): DataFrame =
    d.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      .withColumn("h", xxhash64(col("s")))

  /** (doc_id, n, s, h, df) rows from ONE h-keyed shuffle (r19, guide §2.4):
    * the per-h aggregation counts df AND carries the group's (doc_id, n, s)
    * rows, re-exploded with the count attached — where the previous
    * aggregate-then-join shape paid a second full shuffle of the exploded
    * stream as the join's probe side. Only for BATCH pipelines that derive
    * df from the same inv rows; the incremental probes join against a
    * PERSISTED dfreq and keep the join shape. Group state is bounded by
    * max df; a corpus degenerate enough to strain it (df in the many
    * millions) already fails at the df²-candidate join this feeds, which
    * is exactly what [[jaccardPreflight]] screens for. */
  private def withDfRows(inv: DataFrame): DataFrame =
    inv.groupBy("h")
      .agg(count(lit(1)).as("df"),
        collect_list(struct(col("doc_id"), col("n"), col("s"))).as("__ds"))
      .select(col("h"), col("df"), explode(col("__ds")).as("__d"))
      .select(col("__d.doc_id").as("doc_id"), col("__d.n").as("n"),
        col("__d.s").as("s"), col("h"), col("df"))

  /** Per-doc PPJoin prefix under the (df, h, s) global order, from rows
    * (doc_id, n, s, h, df). True prefix length is n − ⌈τ·n⌉ + 1; the inner
    * −eps keeps double rounding from over-ceiling an exact τ·n (which would
    * drop a shingle the lemma needs); over-long by one is harmless.
    *
    * Agg form (r19): one doc-keyed aggregation sorts the (df, h, s) structs
    * in place and re-explodes ONLY the prefix slice — the previous
    * row_number window shuffled the same rows but sorted the whole
    * partition and emitted every row for the pos filter to discard.
    * `s` stays in the sort struct: it breaks (df, h) hash-collision ties,
    * keeping the global order total so both docs of a pair rank shingles
    * identically (the prefix lemma's requirement). posexplode is 0-based;
    * +1 restores the window's 1-based rank exactly. Group state is one
    * doc's shingle structs — the same rows the window buffered per doc. */
  private def prefixRows(withDf: DataFrame, tau: Double,
                         keepShingle: Boolean = false): DataFrame = {
    val outCols = Seq(col("doc_id"), col("n"), col("__e.h").as("h")) ++
      (if (keepShingle) Seq(col("__e.s").as("s")) else Nil) :+
      (col("__p0") + 1).as("pos")
    withDf
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("h"), col("s"))))
        .as("__ord"))
      .select(col("doc_id"), size(col("__ord")).as("n"),
        posexplode(slice(col("__ord"), lit(1),
          (size(col("__ord")) - ceil(lit(tau) * size(col("__ord")) - eps) + 1)
            .cast("int"))).as(Seq("__p0", "__e")))
      .select(outCols: _*)
  }

  /** Distinct candidate pairs from two prefix sets: h equality + the length
    * filter (min(|A|,|B|) ≥ τ·max(|A|,|B|)) + the PPJoin positional filter,
    * all exact for the first common shingle of every qualifying pair.
    * `extra` restricts the pair universe (lit(true) for all pairs). */
  private def candidates(px: DataFrame, py: DataFrame, tau: Double,
                         extra: Column): DataFrame =
    px.as("x").join(py.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id") &&
          col("y.n") >= lit(tau) * col("x.n") - eps &&
          col("x.n") >= lit(tau) * col("y.n") - eps &&
          (lit(1) + least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos"))) *
            lit(1.0 + tau) >= lit(tau) * (col("x.n") + col("y.n")) - eps &&
          extra)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()

  /** Exact-Jaccard verification of candidate pairs against shingle arrays. */
  private def verifyPairs(cand: DataFrame, arrays: DataFrame, tau: Double): DataFrame =
    cand
      .join(arrays.as("da"), col("id_a") === col("da.doc_id"))
      .join(arrays.as("db"), col("id_b") === col("db.doc_id"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("da.sh"), col("db.sh"))).as("inter"),
        size(col("da.sh")).as("na"), size(col("db.sh")).as("nb"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jac"))
      .where(col("jac") >= tau)

  /** Pre-flight cost estimate for [[jaccardPairs]] — the check a 100 TB
    * pipeline runs BEFORE launching the O(candidate-volume) join. One
    * aggregation pass (shingle + df + prefix, the same first stages the
    * real query runs) yields one row:
    *
    *  - `n_docs`, `distinct_shingles`, `max_df`: corpus shape. A healthy
    *    text corpus has distinct_shingles ≫ n_docs; a COLLAPSED shingle
    *    space (distinct_shingles ≲ n_docs, large max_df) is the degenerate
    *    regime where prefix filtering cannot prune — every document really
    *    does share shingles with most others, and candidate volume grows
    *    ~quadratically in corpus size no matter the algorithm. Measured on
    *    a deliberately-degenerate 10× corpus (ScaleProbe's skew variant):
    *    ~960 distinct shingles per 5000 docs → 490× the candidate volume
    *    of the healthy corpus at 10× the rows.
    *  - `prefix_rows`: the join input size.
    *  - `candidate_volume` = Σ_h prefixCnt(h)² — an upper bound on the
    *    pairs the equi-join enumerates (before length/positional filters).
    *
    * Operating rule: if candidate_volume is beyond the cluster's budget,
    * switch to [[minhashLsh]] (banded signatures keep bucket volume
    * bounded even on degenerate corpora) or raise τ (shorter prefixes). */
  def jaccardPreflight(df: DataFrame, k: Int = 3, tau: Double = 0.5): DataFrame = {
    val d = shingled(df, k)
    val inv = invRows(d)
    val dfreq = inv.groupBy("h").agg(count(lit(1)).as("df"))
    val prefix = prefixRows(inv.join(dfreq, "h"), tau)
    // coalesce: an EMPTY corpus must report zeros, not NULL aggregates (a
    // scheduled pipeline legitimately pre-flights empty partitions).
    // c² accumulates in decimal(38,0) and SATURATES at Long.MaxValue: a
    // degenerate corpus puts ~every doc on one shingle, and an int64
    // overflow would report a NEGATIVE volume to exactly the regime
    // decision this preflight exists to inform (saturation still routes
    // "beyond budget" correctly)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pstats = prefix.groupBy("h").agg(count(lit(1)).as("c"))
      .agg(least(coalesce(sum(col("c").cast(dec) * col("c").cast(dec)),
            lit(0).cast(dec)), lit(Long.MaxValue).cast(dec))
          .cast("long").as("candidate_volume"),
        coalesce(sum(col("c")), lit(0L)).as("prefix_rows"))
    val shape = dfreq.agg(count(lit(1)).as("distinct_shingles"),
      coalesce(max(col("df")), lit(0L)).as("max_df"),
      coalesce(expr("approx_percentile(df, 0.5)"), lit(0L)).as("df_p50"),
      coalesce(expr("approx_percentile(df, 0.99)"), lit(0L)).as("df_p99"))
    d.agg(count(lit(1)).as("n_docs")).crossJoin(shape).crossJoin(pstats)
  }

  /** Routing decision of [[dedupAuto]], exposed so callers (and the spec)
    * can inspect WHY a corpus took the LSH path. */
  sealed abstract class JaccardRoute(val exact: Boolean)
  case object ExactPpjoinRoute extends JaccardRoute(true)
  case object BandedMinhashRoute extends JaccardRoute(false)

  /** The [[dedupAuto]] regime switch as pure arithmetic: exact PPJoin when
    * the measured candidate volume fits the budget, banded MinHash-LSH
    * when it doesn't. Thresholds come from [[Tuning.suggestCandidateBudget]]
    * (linear in corpus size), never an absolute constant that stops
    * binding as the corpus grows. */
  def chooseJaccardRoute(nDocs: Long, candidateVolume: Long,
                         perDocCandidates: Long = 64L): JaccardRoute =
    if (candidateVolume <= Tuning.suggestCandidateBudget(nDocs, perDocCandidates))
      ExactPpjoinRoute
    else BandedMinhashRoute

  /** Near-dup pairs with the exact-vs-LSH regime switch WIRED IN (round-8
    * verdict missing #2): run [[jaccardPreflight]]'s one aggregation pass,
    * then route — exact [[jaccardPairs]] when the measured candidate
    * volume fits [[Tuning.suggestCandidateBudget]], [[minhashLsh]] (band
    * count from [[Tuning.suggestMinhashBands]], so the S-curve threshold
    * tracks `tau`) on the collapsed-shingle regime where prefix filtering
    * cannot prune and exact candidate volume grows ~quadratically
    * (measured 27× slower at 10× rows on the degenerate ScaleProbe
    * corpus). Both routes verify candidates with exact Jaccard, so the
    * output schema and threshold semantics are identical — LSH only
    * affects recall. The preflight costs one extra aggregation over the
    * corpus — at 100 TB that is the check that decides whether the
    * O(candidate-volume) join is launchable at all. */
  def dedupAuto(df: DataFrame, k: Int = 3, tau: Double = 0.5,
                numHashes: Int = 64,
                perDocCandidates: Long = 64L): DataFrame = {
    val pf = jaccardPreflight(df, k, tau).head()
    val route = chooseJaccardRoute(
      pf.getAs[Long]("n_docs"), pf.getAs[Long]("candidate_volume"), perDocCandidates)
    route match {
      case ExactPpjoinRoute => jaccardPairs(df, k, tau)
      case BandedMinhashRoute =>
        minhashLsh(df, k, numHashes, Tuning.suggestMinhashBands(numHashes, tau), tau)
          .select(col("id_a"), col("id_b"), col("jac"))
    }
  }

  /** Shared by `dedup_incremental` and `dedup_incremental_bucketed`: the
    * full-corpus pair set restricted to pairs touching the batch split. */
  private lazy val incrementalOracleSql: String =
    """WITH d AS (
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
      |  GROUP BY x.doc_id, y.doc_id)
      |SELECT id_a, id_b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jac
      |FROM co WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
      |  AND (id_a % 10 = 0 OR id_b % 10 = 0)""".stripMargin

  /** Frozen corpus-snapshot index for INCREMENTAL dedup: the three
    * deterministic DataFrames a pipeline persists once per corpus snapshot
    * (all are pure functions of the corpus, so they round-trip through
    * parquet) and reuses for every incoming batch. At 100 TB this is the
    * difference between re-pairing the whole corpus per batch and probing a
    * prebuilt inverted index. */
  case class JaccardIndex(prefix: DataFrame, arrays: DataFrame, dfreq: DataFrame)

  /** Build the persistable [[JaccardIndex]] of a corpus (same k/tau must be
    * used for the incremental probes against it). */
  def buildJaccardIndex(corpus: DataFrame, k: Int = 3, tau: Double = 0.5): JaccardIndex = {
    // Deliberately NOT sharedStage'd despite the multi-consumer static
    // plan (12 scans in dedup_incremental's r18 before-plan): every
    // duplicated subtree here ends in a SHUFFLE (the df aggregation, the
    // prefix window sort), and AQE's runtime stage reuse dedups
    // canonically-equal shuffle stages — unlike the BROADCAST-side builds
    // sharedStage exists for (minhashLsh, winnowPairs). Measured r18 A/B
    // at sf0.1 (min-of-5, sentinel-matched subset runs): checkpointing
    // d/dfreq/prefix made dedup_incremental 1.61 → 2.86 s — four serial
    // materialization barriers replaced one AQE DAG with stage reuse.
    // The write-side alternative (VERDICT r18 #2: persist the index, probe
    // from parquet) measured the same way r19: dedup_incremental_bucketed —
    // exactly that shape, save + catalog load + bucketed probe inside the
    // timed query — ran 4.61 s vs 1.76 s for this in-plan build in the same
    // min-of-5 window. The persisted path EXISTS for deployments that amortize
    // the build across many batches; for a single build+probe the AQE-reused
    // in-plan DAG stays the right physical form at any scale.
    val d = shingled(corpus, k)
    val inv = invRows(d)
    val dfreq = inv.groupBy("h").agg(count(lit(1)).as("df"))
    // The dfreq-join shape is KEPT here even though jaccardPairsWhere
    // moved to withDfRows (r19 paired A/B: withDfRows made
    // dedup_incremental 1.78 → 2.02 s on a better window): unlike the
    // batch path, dfreq must exist separately anyway — it is part of the
    // persisted index contract the probes join against — so the old
    // shape's single dfreq aggregation is stage-reused by BOTH the prefix
    // join and the probe join, while withDfRows adds a second h-keyed
    // aggregation of the exploded stream next to it.
    JaccardIndex(prefixRows(inv.join(dfreq, "h"), tau), d, dfreq)
  }

  /** Incremental near-dup pairs: all (a, b) with J ≥ tau where AT LEAST ONE
    * side is from `incoming` — the daily operation of a training-data
    * pipeline (dedupe a new crawl batch against the corpus and itself)
    * WITHOUT re-pairing the corpus with itself. Doc ids must be disjoint
    * from the corpus.
    *
    * EXACT, via a frozen order: incoming shingles unseen in the corpus take
    * df = 0 (rarest-first — maximally conservative prefixes), seen shingles
    * take the corpus df. That extends the index's (df, h, s) order to a
    * total order over all shingles that both sides agree on, so the
    * prefix-filtering lemma holds for every emitted pair even though the
    * corpus prefixes were computed before `incoming` existed. Output is
    * therefore exactly `jaccardPairs(corpus ∪ incoming)` restricted to
    * pairs touching `incoming`, up to the df-vs-frozen-df ordering (both
    * orders are exact; asserted in ExtSpec). */
  def jaccardPairsIncremental(index: JaccardIndex, incoming: DataFrame,
                              k: Int = 3, tau: Double = 0.5): DataFrame = {
    // NOT sharedStage'd — the [[buildJaccardIndex]] measurement: the
    // duplicated consumers end in shuffles AQE stage-reuse dedups at
    // runtime, and checkpoint barriers measured net-negative here
    val dNew = shingled(incoming, k)
    val withDf = invRows(dNew)
      .join(index.dfreq, Seq("h"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
    val prefNew = prefixRows(withDf, tau).withColumn("is_new", lit(true))
    val all = index.prefix.withColumn("is_new", lit(false)).unionByName(prefNew)
    val cand = candidates(all, all, tau, col("x.is_new") || col("y.is_new"))
    // redundant-inference scope (r16): the incremental probe pays the same
    // inferred shingle_array scan filters as the batch form (InferProbe
    // measured −53% at sf0.1)
    ConfScope.noInferredFilters(
      verifyPairs(cand, index.arrays.unionByName(dNew), tau))
  }

  /** Persist a [[JaccardIndex]] (three parquet dirs under `dir`). */
  def saveJaccardIndex(idx: JaccardIndex, dir: String): Unit = {
    idx.prefix.write.mode("overwrite").parquet(s"$dir/prefix")
    idx.arrays.write.mode("overwrite").parquet(s"$dir/arrays")
    idx.dfreq.write.mode("overwrite").parquet(s"$dir/dfreq")
  }

  /** Load a [[JaccardIndex]] persisted by [[saveJaccardIndex]] /
    * [[absorbIntoIndex]]. */
  def loadJaccardIndex(spark: SparkSession, dir: String): JaccardIndex =
    JaccardIndex(
      spark.read.parquet(s"$dir/prefix"),
      spark.read.parquet(s"$dir/arrays"),
      spark.read.parquet(s"$dir/dfreq"))

  /** BUCKETED persistence of a [[JaccardIndex]] — the 100 TB storage
    * layout: each component is written `bucketBy` its join key (`h` for
    * prefix/dfreq, `doc_id` for arrays), so a probe join against the index
    * reuses the ON-DISK hash partitioning instead of re-shuffling the
    * corpus-sized side for every incoming batch — the batch side alone
    * takes an exchange (or broadcasts). `sortBy` additionally pre-sorts
    * bucket files for the merge join. Catalog entries live in the session
    * catalog; the data is plain parquet under `dir`. */
  def saveJaccardIndexBucketed(idx: JaccardIndex, dir: String,
                               nBuckets: Int = 8): Unit = {
    val spark = idx.prefix.sparkSession
    def save(df: DataFrame, comp: String, key: String): Unit = {
      val tbl = bucketTableName(dir, comp)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      df.write.mode("overwrite")
        .bucketBy(nBuckets, key).sortBy(key)
        .option("path", s"$dir/$comp")
        .saveAsTable(tbl)
    }
    save(idx.prefix, "prefix", "h")
    save(idx.arrays, "arrays", "doc_id")
    save(idx.dfreq, "dfreq", "h")
  }

  /** Load a bucketed index saved by [[saveJaccardIndexBucketed]]; reads go
    * through the catalog table so Spark keeps the bucket partitioning. */
  def loadJaccardIndexBucketed(spark: SparkSession, dir: String): JaccardIndex =
    JaccardIndex(
      spark.table(bucketTableName(dir, "prefix")),
      spark.table(bucketTableName(dir, "arrays")),
      spark.table(bucketTableName(dir, "dfreq")))

  /** Drop the catalog entries of a bucketed index (files under `dir` are
    * the caller's). */
  def dropJaccardIndexBucketed(spark: SparkSession, dir: String): Unit =
    Seq("prefix", "arrays", "dfreq").foreach(c =>
      spark.sql(s"DROP TABLE IF EXISTS ${bucketTableName(dir, c)}"))

  /** Session-catalog table name for a bucketed index component, keyed by a
    * digest of the directory (two dirs can coexist in one session). */
  private def bucketTableName(dir: String, comp: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
    s"graft_jidx_${h}_$comp"
  }

  /** [[jaccardPairsIncremental]] restructured as THREE bipartite joins
    * (index×batch, batch×index, batch×batch — disjoint by the `id_a <
    * id_b` orientation, so their union needs no dedup) instead of one
    * self-join over `index.prefix ∪ batch-prefix`. Result-identical (the
    * same frozen (df, h, s) order; pinned in ExtSpec) — the point is the
    * PLAN: a union destroys the index side's bucket partitioning, while
    * here a [[saveJaccardIndexBucketed]] index joins on its on-disk `h`
    * buckets and the corpus-sized prefix set is never re-shuffled per
    * batch (the index side is scanned by two of the three joins, but a
    * scan is streaming-local — the avoided exchange is a full
    * write+network+read cycle of the index). */
  def jaccardPairsIncrementalBucketed(index: JaccardIndex, incoming: DataFrame,
                                      k: Int = 3, tau: Double = 0.5): DataFrame = {
    val dNew = shingled(incoming, k)
    val withDf = invRows(dNew)
      .join(index.dfreq, Seq("h"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
    val prefNew = prefixRows(withDf, tau)
    val cand = candidates(index.prefix, prefNew, tau, lit(true))
      .unionByName(candidates(prefNew, index.prefix, tau, lit(true)))
      .unionByName(candidates(prefNew, prefNew, tau, lit(true)))
    // redundant-inference scope (r16): the incremental probe pays the same
    // inferred shingle_array scan filters as the batch form (InferProbe
    // measured −53% at sf0.1)
    ConfScope.noInferredFilters(
      verifyPairs(cand, index.arrays.unionByName(dNew), tau))
  }

  /** Grow a persisted index with `newDocs` under the index's FROZEN
    * (df, h, s) total order (unseen shingles keep df = 0, seen ones the
    * snapshot df — the same order [[jaccardPairsIncremental]] probes with).
    * The PPJoin lemma needs only an order every side agrees on, so probes
    * against the grown index stay EXACT; only prefix selectivity drifts as
    * true frequencies move (efficiency, not correctness — re-snapshot with
    * [[buildJaccardIndex]] when drift accumulates). Idempotent: doc_ids
    * already absorbed are skipped, so a replayed batch (foreachBatch
    * re-delivery) cannot duplicate index rows. */
  def absorbIntoIndex(spark: SparkSession, dir: String, newDocs: DataFrame,
                      k: Int = 3, tau: Double = 0.5): Unit = {
    // idempotency is keyed PER COMPONENT: the two appends are not atomic,
    // so a crash between them must leave a state a replay completes rather
    // than duplicates (prefix committed + arrays missing, or vice versa,
    // each repair independently on re-delivery)
    def missingFrom(component: String): DataFrame =
      newDocs.join(
        spark.read.parquet(s"$dir/$component").select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
    val dPref = shingled(missingFrom("prefix"), k)
    val withDf = invRows(dPref)
      .join(spark.read.parquet(s"$dir/dfreq"), Seq("h"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
    // materialize BEFORE appending: the plans read the dirs being grown
    val pref = prefixRows(withDf, tau).localCheckpoint()
    val arrays = shingled(missingFrom("arrays"), k).localCheckpoint()
    pref.write.mode("append").parquet(s"$dir/prefix")
    arrays.write.mode("append").parquet(s"$dir/arrays")
  }

  /** One micro-batch of streaming near-dup filtering against a persisted
    * index: reject batch documents that near-duplicate (J ≥ tau) the
    * absorbed corpus, collapse the remainder to one representative per
    * within-batch near-dup component (min doc_id — the same policy as
    * [[graft.ext.Curation.curate]]), absorb the SURVIVORS, and return
    * them. Batch doc_ids must be disjoint from the corpus. Deterministic
    * and replay-safe: a re-delivered batch recomputes the same survivors
    * (docs already absorbed pair only with ids ≠ their own, and absorption
    * skips already-present ids). */
  def dedupBatch(spark: SparkSession, indexDir: String, batch: DataFrame,
                 k: Int = 3, tau: Double = 0.5): DataFrame = {
    val idx = loadJaccardIndex(spark, indexDir)
    // pin the micro-batch once: it feeds shingling, the survivors join,
    // absorption, and the caller's sink — without this every action
    // re-scans the streaming source (foreachBatch multi-action guidance)
    val b = batch.localCheckpoint()
    val batchIds = b.select(col("doc_id"))
    val pairs = jaccardPairsIncremental(idx, b, k, tau)
      .select(col("id_a"), col("id_b"))
      .cache()
    pairs.count()
    // corpus-paired batch docs: pairs with exactly one side in the batch
    val corpusRejected = pairs
      .join(batchIds.withColumnRenamed("doc_id", "id_a").withColumn("a_in", lit(true)),
        Seq("id_a"), "left")
      .join(batchIds.withColumnRenamed("doc_id", "id_b").withColumn("b_in", lit(true)),
        Seq("id_b"), "left")
      .withColumn("a_in", coalesce(col("a_in"), lit(false)))
      .withColumn("b_in", coalesce(col("b_in"), lit(false)))
      .cache()
    val rejectedByCorpus = corpusRejected.where(col("a_in") =!= col("b_in"))
      .select(when(col("a_in"), col("id_a")).otherwise(col("id_b")).as("doc_id"))
      .distinct()
    // within-batch pairs among docs NOT corpus-rejected → component reps
    val withinPairs = corpusRejected.where(col("a_in") && col("b_in"))
      .select("id_a", "id_b")
      .join(rejectedByCorpus.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_anti")
      .join(rejectedByCorpus.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_anti")
    val nonRep = clusters(withinPairs)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    // localCheckpoint (not cache): materialized eagerly before the index
    // grows, lineage truncated, and reclaimed by the ContextCleaner when
    // the caller drops the reference — a cache() here would leak one
    // CacheManager entry per micro-batch of a long-running stream
    val survivors = b
      .join(rejectedByCorpus, Seq("doc_id"), "left_anti")
      .join(nonRep, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    absorbIntoIndex(spark, indexDir, survivors, k, tau)
    pairs.unpersist(); corpusRejected.unpersist()
    survivors
  }

  /** Streaming near-dup filter: wires [[dedupBatch]] into `foreachBatch` —
    * each micro-batch is probed against everything accepted so far (seed
    * corpus + earlier batches), survivors go to `sink` and are absorbed.
    * Seed the index once with `saveJaccardIndex(buildJaccardIndex(seed))`
    * (an empty seed DataFrame works). The caller sets trigger/checkpoint
    * options on the returned writer and starts it. */
  def dedupStream(docs: DataFrame, indexDir: String, k: Int = 3,
                  tau: Double = 0.5)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(dedupBatch(batch.sparkSession, indexDir, batch, k, tau))
    }

  /** MinHash-LSH near-dup pairs: `numHashes` signature, `bands` bands of
    * `numHashes/bands` rows; candidates from per-band bucket equality;
    * final exact-Jaccard filter at tau (output ⊆ exact pairs; LSH only
    * affects recall). The default 16 bands threshold the S-curve at
    * `(1/16)^(1/4) = 0.5` — for any other tau pass
    * `bands = Tuning.suggestMinhashBands(numHashes, tau)` so the candidate
    * volume follows the requested threshold instead of 0.5's.
    *
    * A pair colliding in several bands is deduped by the FIRST-SHARED-BAND
    * predicate (r17, VERDICT r16 item 1 — the [[Similarity.annLsh]] form):
    * each exploded row carries its side's full `bands`-element band-hash
    * array, and only the row whose `band` equals the first index where the
    * two arrays agree survives — a pure per-row filter replacing the
    * `distinct()` that exchanged the whole candidate stream a second time.
    * The surviving pair SET is provably identical to the distinct form
    * (every colliding pair keeps exactly one row; the verify columns are
    * computed downstream of the pair set), so the committed fixture oracle
    * is unchanged. Built as a CASE chain over literal indices, not
    * zip_with/array_position — a higher-order function in the join
    * condition drops the join out of whole-stage codegen (the annLsh
    * measurement). */
  def minhashLsh(df: DataFrame, k: Int = 3, numHashes: Int = 64, bands: Int = 16,
                 tau: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // (doc_id, sh, sig) is consumed FOUR times (both banded join sides +
    // both verify sides) — see [[sharedStage]]
    val d = sharedStage(spread(df)
      .select(col("doc_id"), shingles(col("text"), k).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", vectors.minhashSig(col("sh"), numHashes)))
    // each exploded row keeps its side's FULL band-hash array (`bands`
    // BIGINTs — a bounded narrow recompute) so multi-band collisions dedup
    // by the per-row predicate below instead of a distinct() exchange.
    // The array is a literal array() of per-band hashes — NOT a
    // transform() lambda over sig: sig referenced once inside a lambda is
    // CollapseProject-inlined, and an expression substituted into a lambda
    // body evaluates once per BAND — the full minhash signature 16× per
    // row (measured 2.7× the whole gate). `bands` direct references keep
    // sig materialized in its own Project (the annLsh array(planes.map…)
    // shape). posexplode of the array attribute (generator + output = two
    // bhs references) keeps bhs below the Generate the same way; the
    // inferred size/isnotnull-filter trap that motivated annLsh's
    // literal-range explode is already off here — the whole query runs
    // under noInferredFilters.
    val bhsCol = array((0 until bands).map(b =>
      xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)
    val banded = d.select(col("doc_id"), bhsCol.as("bhs"))
      .select(col("doc_id"), col("bhs"),
        posexplode(col("bhs")).as(Seq("band", "bh")))
    // first-shared-band dedup: the joined row already agrees at index
    // `band`, so the first agreeing index always exists and is <= band;
    // keeping only band == that index leaves exactly one row per pair
    val firstShared = firstSharedIndex(bands)(i =>
      col("x.bhs").getItem(i) === col("y.bhs").getItem(i))
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "bh"))
      .where(col("x.doc_id") < col("y.doc_id") && col("band") === firstShared)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    // redundant-inference scope (r16): the verify joins' key constraints
    // otherwise inline shingle_array + minhash_sig into the scan filters
    // (InferProbe measured −31% at sf0.1)
    ConfScope.noInferredFilters(cand
      .join(d.as("da"), col("id_a") === col("da.doc_id"))
      .join(d.as("db"), col("id_b") === col("db.doc_id"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("da.sig"), col("db.sig"),
            (p, q) => (p === q).cast("int")), lit(0), (s, v) => s + v)
          .cast("double") / numHashes).as("est_jac"),
        (size(array_intersect(col("da.sh"), col("db.sh"))).cast("double") /
          size(array_union(col("da.sh"), col("db.sh")))).as("jac"))
      .where(col("jac") >= tau))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming. Blocking on
    * four 16-bit bands is exact for maxHamming ≤ 3. A pair colliding in
    * several bands is deduped by the FIRST-SHARED-BAND predicate (r17,
    * VERDICT r16 item 1): both band keys are bit-slices of the `sig` each
    * row already carries, so the first agreeing band index is a pure
    * per-row expression over (x.sig, y.sig) — no array to carry and no
    * `distinct()` exchange of the candidate stream. Every colliding pair
    * keeps exactly one row and `hamming` is the same expression on every
    * copy, so the output set is identical to the distinct form and the
    * committed fixture oracle is unchanged. */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band blocking is only exact for hamming <= 3")
    // the signature table feeds BOTH self-join sides — see [[sharedStage]]
    val d = sharedStage(spread(df)
      .select(col("doc_id"), vectors.simhash64(split(col("text"), " ")).as("sig")))
    val banded = d.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> (sig >> (b * 16)) & 65535)")).as(Seq("band", "key")))
    def bandKey(sig: Column, i: Int): Column =
      shiftright(sig, i * 16).bitwiseAND(lit(65535L))
    val firstShared = firstSharedIndex(4)(i =>
      bandKey(col("x.sig"), i) === bandKey(col("y.sig"), i))
    // redundant-inference scope (r16): join-key constraints otherwise
    // inline simhash64(split(text)) into the scan filter — the signature
    // computed twice per row (InferProbe measured −46% at sf0.1)
    ConfScope.noInferredFilters(
      banded.as("x").join(banded.as("y"), Seq("band", "key"))
        .where(col("x.doc_id") < col("y.doc_id") && col("band") === firstShared)
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
        .where(col("hamming") <= maxHamming))
  }

  /** Duplicate-cluster SIZE distribution: `(cluster_size, n_clusters)`
    * over the transitive closure of the near-dup pair graph, plus the
    * size-1 row for unique documents — the shape question behind every
    * dedup decision ("are my duplicates pairwise near-misses or massive
    * templated families?"): a heavy tail means keep-one-per-cluster
    * deletes most of a source, while all-pairs means dedup barely
    * shrinks the corpus. Exact integers end to end.
    *
    * Scale: one [[jaccardPairs]] pass + the O(diameter) [[clusters]]
    * closure (both gated/probed); the distribution folds over cluster
    * ids, and the singleton row is two count aggregates — no extra
    * corpus pass beyond the one total count. */
  def dedupClusterSizes(df: DataFrame, k: Int = 3,
                        tau: Double = 0.5): DataFrame = {
    val cl = clusters(jaccardPairs(df, k, tau))
    val dist = cl.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    // clustered sizes are always >= 2, so the singleton row never collides
    val singles = df.agg(count(lit(1)).as("__t"))
      .crossJoin(cl.agg(count(lit(1)).as("__c")))
      .select(lit(1L).as("cluster_size"),
        (col("__t") - col("__c")).as("n_clusters"))
    dist.unionByName(singles).where(col("n_clusters") > 0)
  }

  /** Near-dup CLUSTERS from a pair list: connected components via min-label
    * propagation (each round every node adopts the smallest component id
    * among itself and its neighbors; converges in O(diameter) rounds —
    * near-dup clusters are small, so a handful). Output: (doc_id,
    * cluster_id = min doc_id of the component), one row per document that
    * appears in at least one pair.
    *
    * ONE audited loop shared with the graph family (r17, VERDICT r16 item
    * 6 — this was a second hand-rolled propagation loop with join-count
    * change detection and NO non-convergence guard; it now delegates to
    * [[Graph.connectedComponents]], inheriting the carried change column,
    * per-round lineage truncation, and the LOUD `require` on
    * non-convergence). */
  def clusters(pairs: DataFrame, maxIter: Int = 25): DataFrame =
    Graph.connectedComponents(pairs.select(col("id_a"), col("id_b")),
        "id_a", "id_b", maxIter)
      .select(col("node").as("doc_id"), col("comp").as("cluster_id"))

  /** Embedding near-dup pairs: candidates from IVF-cell blocking (each
    * vector assigned to its `nAssign` nearest of `nCells` centroids, pairs
    * sharing a cell become candidates — the same bucket-join shape as
    * [[minhashLsh]]), then exact-cosine verification at `tau`. Never an
    * all-pairs cross join: the candidate join is an equality join on
    * `cell_id`, and both the assignment and the verification are narrow.
    *
    * The assignment is deterministic (centroids = first `nCells` ids,
    * bit-exact cosine, ties to the smallest cell), so the SQL oracle mirrors
    * the algorithm exactly. Recall vs the exact all-pairs reference
    * ([[embeddingPairsExact]]) is measured in ExtSpec. At 100 TB, scale
    * `nCells` with the corpus so per-cell population stays bounded — the
    * candidate volume is Σ_cells |cell|², never n². */
  // Gate parameters, interpolated into BOTH the queries-map call and the
  // oracle SQL below so they can never silently desync.
  private[ext] val GateEmbedTau = 0.4
  private[ext] val GateEmbedCells = 32
  private[ext] val GateEmbedAssign = 4

  /** First-shared-cell dedup predicate (r17, the annLsh form adapted to
    * VALUE-set blocking): a pair assigned to several common cells keeps
    * only the row whose joined cell equals the first element of x's cell
    * array that y's array also contains — a pure per-row filter over the
    * two carried `nAssign`-element arrays, replacing the `distinct()`
    * that exchanged the whole candidate stream. array_contains is not a
    * lambda HOF, so the join stays inside whole-stage codegen; the
    * sentinel -1 is unreachable (the joined row already shares a cell). */
  private def firstSharedCell(xCells: Column, yCells: Column,
                              nAssign: Int): Column =
    (0 until nAssign).foldRight(lit(-1L): Column) {
      case (i, acc) =>
        when(array_contains(yCells, xCells.getItem(i)), xCells.getItem(i))
          .otherwise(acc)
    }

  def embeddingPairs(df: DataFrame, tau: Double,
                     nCells: Int = GateEmbedCells,
                     nAssign: Int = GateEmbedAssign,
                     centroids: Option[Seq[(Long, Seq[Float])]] = None): DataFrame = {
    val cents = centroids.map(cs => typedLit(cs))
      .getOrElse(Similarity.centroidLit(df, nCells))
    // each exploded row carries its FULL cell-assignment array (nAssign
    // longs) so multi-cell collisions dedup by the first-shared-cell
    // predicate instead of a distinct() exchange (r17); the assignment
    // table feeds both self-join sides — see [[sharedStage]]
    val cells = sharedStage(spread(df).select(col("vec_id"),
        Similarity.nearestCells(col("embedding"), cents, nAssign).as("cells")))
      .select(col("vec_id"), col("cells"), explode(col("cells")).as("cell_id"))
    val cand = cells.as("x").join(cells.as("y"),
        col("x.cell_id") === col("y.cell_id") && col("x.vec_id") < col("y.vec_id") &&
          col("x.cell_id") === firstSharedCell(col("x.cells"), col("y.cells"), nAssign))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
    cand
      .join(df.as("a"), col("id_a") === col("a.vec_id"))
      .join(df.as("b"), col("id_b") === col("b.vec_id"))
      .select(col("id_a"), col("id_b"),
        vectors.cosineSim(col("a.embedding"), col("b.embedding")).as("sim"))
      .where(col("sim") >= tau)
  }

  /** Frozen corpus-snapshot index for INCREMENTAL embedding dedup — the
    * vector-modality twin of [[JaccardIndex]]: the per-vector cell
    * assignments (the blocking state — one row per vector with its FULL
    * `nAssign`-element cell array, exploded at probe time so the
    * first-shared-cell predicate can dedup multi-cell collisions without
    * a distinct(), r17), the vectors themselves (for exact verification),
    * and the frozen centroids. All deterministic functions of the corpus,
    * so the index round-trips parquet. */
  case class EmbeddingIndex(cells: DataFrame, vecs: DataFrame,
                            centroids: Seq[(Long, Seq[Float])])

  def buildEmbeddingIndex(corpus: DataFrame,
                          nCells: Int = GateEmbedCells,
                          nAssign: Int = GateEmbedAssign,
                          centroids: Option[Seq[(Long, Seq[Float])]] = None)
      : EmbeddingIndex = {
    val cs = centroids.getOrElse(Similarity.centroidSeed(corpus, nCells))
    val cells = corpus.select(col("vec_id"),
      Similarity.nearestCells(col("embedding"), typedLit(cs), nAssign).as("cells"))
    EmbeddingIndex(cells, corpus.select("vec_id", "embedding"), cs)
  }

  def saveEmbeddingIndex(idx: EmbeddingIndex, dir: String): Unit = {
    idx.cells.write.mode("overwrite").parquet(s"$dir/cells")
    idx.vecs.write.mode("overwrite").parquet(s"$dir/vecs")
    Similarity.saveCentroids(idx.vecs.sparkSession, idx.centroids, s"$dir/centroids")
  }

  def loadEmbeddingIndex(spark: SparkSession, dir: String): EmbeddingIndex =
    EmbeddingIndex(
      spark.read.parquet(s"$dir/cells"),
      spark.read.parquet(s"$dir/vecs"),
      Similarity.loadCentroids(spark, s"$dir/centroids"))

  /** Incremental embedding near-dup pairs: all (a, b) with cosine ≥ tau
    * where at least one side is from `incoming`, WITHOUT re-pairing the
    * corpus with itself. Incoming vectors are assigned with the index's
    * FROZEN centroids (both sides agree on the blocking), so the result
    * equals `embeddingPairs(corpus ∪ incoming, centroids = frozen)`
    * restricted to pairs touching `incoming` (asserted in ExtSpec) —
    * verification is exact; the frozen blocking governs recall exactly as
    * in the full run. Vec ids must be disjoint from the corpus. */
  def embeddingPairsIncremental(index: EmbeddingIndex, incoming: DataFrame,
                                tau: Double,
                                nAssign: Int = GateEmbedAssign): DataFrame = {
    val cents = typedLit(index.centroids)
    val newCells = incoming.select(col("vec_id"),
        Similarity.nearestCells(col("embedding"), cents, nAssign).as("cells"))
      .withColumn("is_new", lit(true))
    val all = index.cells.withColumn("is_new", lit(false)).unionByName(newCells)
      .select(col("vec_id"), col("cells"), col("is_new"),
        explode(col("cells")).as("cell_id"))
    val cand = all.as("x").join(all.as("y"),
        col("x.cell_id") === col("y.cell_id") && col("x.vec_id") < col("y.vec_id") &&
          (col("x.is_new") || col("y.is_new")) &&
          col("x.cell_id") === firstSharedCell(col("x.cells"), col("y.cells"), nAssign))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
    val vecs = index.vecs.unionByName(incoming.select("vec_id", "embedding"))
    cand
      .join(vecs.as("a"), col("id_a") === col("a.vec_id"))
      .join(vecs.as("b"), col("id_b") === col("b.vec_id"))
      .select(col("id_a"), col("id_b"),
        vectors.cosineSim(col("a.embedding"), col("b.embedding")).as("sim"))
      .where(col("sim") >= tau)
  }

  /** Exact all-pairs reference for [[embeddingPairs]] — O(n²), small-scale
    * recall baseline ONLY (ExtSpec); not part of the shipped query surface. */
  def embeddingPairsExact(df: DataFrame, tau: Double): DataFrame =
    df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        vectors.cosineSim(col("a.embedding"), col("b.embedding")).as("sim"))
      .where(col("sim") >= tau)

  /** SemDeDup-style SEMANTIC pruning (Abbas et al. 2023, arXiv:2303.09540):
    * where the text-side near-dup operators catch lexical copies, this
    * collapses documents that *say the same thing* — embeddings land in
    * IVF cells (the paper's k-means clusters), vectors whose cosine meets
    * `tau` inside a shared cell are semantic duplicates, and only one
    * representative (min vec_id) of each connected duplicate component
    * survives. Output: the surviving `vec_id` keep-list a pipeline
    * anti-joins its corpus against.
    *
    * Composition of already-scale-safe parts: [[embeddingPairs]] (cell-
    * blocked candidates, never all-pairs) + [[clusters]] (O(diameter)
    * iterative CC over the small pair set) + one anti-join. At 100 TB,
    * pass frozen `centroids` (a [[Similarity.trainCentroids]] /
    * [[Similarity.loadCentroids]] product) and scale `nCells` with the
    * corpus (`Tuning.suggestIvfCells`) so per-cell candidate volume stays
    * bounded — exactly the paper's setting, where dedup quality is governed
    * by the clustering the same way recall is for [[annIvf]]. */
  def semdedupPrune(df: DataFrame, tau: Double = GateEmbedTau,
                    nCells: Int = GateEmbedCells,
                    nAssign: Int = GateEmbedAssign,
                    centroids: Option[Seq[(Long, Seq[Float])]] = None): DataFrame = {
    val dup = clusters(embeddingPairs(df, tau, nCells, nAssign, centroids))
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"))
    df.select("vec_id").join(dup, Seq("vec_id"), "left_anti")
  }

  /** Winnowing-blocked near-dup candidates: pairs of documents sharing at
    * least `minShared` [[TextAnalysis.winnow]] fingerprints. The MOSS
    * guarantee turns into a RECALL contract the fixed-chunk and
    * whole-hash families can't give: any pair sharing one ≥ w+k−1-token
    * run is guaranteed a common fingerprint, regardless of where the run
    * sits in either document. Same inverted-index shape as
    * [[jaccardPairs]]: one (doc, fp)-distinct table, per-fingerprint
    * document-frequency cap `maxFpFreq` bounds the hottest posting list
    * (boilerplate fingerprints shared by everything generate quadratic
    * pairs and zero signal — the PPJoin hot-cap argument verbatim), then
    * a fp-keyed self-join counts shared prints per pair. Shuffles carry
    * 8-byte fingerprints, never text. */
  def winnowPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                  minShared: Int = 2, maxFpFreq: Int = 100): DataFrame = {
    // the fingerprint table feeds THREE plan branches (the hot-fp cap agg
    // + both self-join sides) that each re-ran the winnow pass — per-gram
    // sha256 + per-window argmin, the query's dominant cost — from
    // parquet (4 scans in the r18 before-plan; AQE stage reuse dedups
    // shuffle stages, not these broadcast-side builds) — see
    // [[sharedStage]]. Measured r18 A/B at sf0.1 (min-of-5,
    // sentinel-matched subset runs): 1.59 → 1.30 s.
    val fps = sharedStage(TextAnalysis.winnow(docs, k, w)
      .select(col("doc_id"), col("fp")).distinct())
    val cold = fps.groupBy("fp")
      .agg(count(lit(1)).as("__dfp")).where(col("__dfp") <= maxFpFreq)
      .select("fp")
    val pruned = fps.join(cold, "fp")
    // Self-join kept over the per-fp collect+generate alternative (r19
    // A/B, two paired min-of-7 windows): replacing the self-join with
    // groupBy(fp).collect_list + the CoocStructs pair generator measured
    // 1.08 → 1.10/1.15 s — the fp-keyed ObjectHashAggregate's buffering
    // cost matches what the removed exchange+join machinery saved, and
    // both self-join sides read the checkpointed fps blocks in parallel
    // where the agg serializes. Re-measure if maxFpFreq or the
    // fingerprint density changes materially.
    pruned.as("x").join(pruned.as("y"), "fp")
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Shared oracle fragment: tokens → content-defined cuts → bounded
    * spans (`st`: doc_id, w, span start `s`, gap end `b2`). Ends WITHOUT a
    * trailing comma; compositions append either the final SELECT
    * (cdc_chunks) or further CTEs (dedup_cdc). */
  private lazy val CdcChunksSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |b AS (SELECT doc_id, w,
      |  list_sort(list_distinct(list_concat(list_concat(
      |    [CAST(0 AS BIGINT)],
      |    list_filter(list_transform(list_filter(range(3, len(w) + 1), i ->
      |      CAST(('0x' || substring(sha256(array_to_string(w[i-2:i], ' ')), 1, 8))
      |        AS BIGINT) % 16 = 0), x -> CAST(x AS BIGINT)),
      |      x -> x < len(w))),
      |    [CAST(len(w) AS BIGINT)]))) AS cuts
      |  FROM t),
      |pr AS (SELECT doc_id, w, u.z AS z
      |       FROM b, LATERAL UNNEST(list_zip(cuts[1:len(cuts)-1], cuts[2:len(cuts)])) AS u(z)),
      |sp AS (SELECT doc_id, w, z[1] AS a, z[2] AS b2 FROM pr),
      |st AS (SELECT doc_id, w, a, b2, s.s AS s
      |       FROM sp, LATERAL unnest(range(a, b2, 64)) AS s(s))""".stripMargin

  /** Content-defined chunking (the token-level FastCDC/Rabin idea): chunk
    * boundaries fall where a `g`-token gram's hash is ≡ 0 mod `target`,
    * so boundaries are decided by CONTENT, not position — prepend a
    * paragraph to a document and every boundary after the first re-aligns,
    * where [[subdocDedup]]'s fixed-width chunks all shift and nothing
    * matches again. Expected chunk length ≈ `target` tokens; a gap longer
    * than `maxLen` is split at fixed offsets (boundedness without the
    * sequential min/max state of FastCDC proper — the [[Sft
    * .spanCorruption]] closed-form discipline, every boundary decidable
    * from the hash stream alone).
    *
    * Narrow scan-time HOFs end to end; emits (doc_id, chunk_idx,
    * start_tok, n_tokens, chunk). Gram hashes are [[Hygiene.hashU64]]
    * (SQL-mirrorable sha256, the cross-engine posture). */
  def cdcChunks(df: DataFrame, g: Int = 3, target: Int = 16,
                maxLen: Int = 64): DataFrame = {
    require(g >= 1 && target >= 2 && maxLen >= target,
      "need g >= 1, target >= 2, maxLen >= target")
    val w = col("__w"); val n = size(w)
    val bpos = filter(sequence(lit(g), greatest(n, lit(g))), i =>
      i <= n && pmod(Hygiene.hashU64(array_join(slice(w, i - (g - 1), lit(g)), " ")),
        lit(target.toLong)) === 0L)
    val cuts = array_sort(array_distinct(concat(
      array(lit(0)), filter(bpos, b => b < n), array(n))))
    val spans = flatten(transform(
      arrays_zip(slice(cuts, lit(1), size(cuts) - 1), slice(cuts, lit(2), size(cuts) - 1)),
      pr => {
        val a = pr.getField("0"); val b = pr.getField("1")
        transform(sequence(a, b - 1, lit(maxLen)), s =>
          struct(s.as("start"), least(s + maxLen, b).as("end")))
      }))
    df.select(col("doc_id"), split(col("text"), " ").as("__w"))
      .select(col("doc_id"), col("__w"), posexplode(spans).as(Seq("chunk_idx", "sp")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("sp.start").cast("long").as("start_tok"),
        (col("sp.end") - col("sp.start")).cast("long").as("n_tokens"),
        array_join(slice(col("__w"), col("sp.start") + 1,
          col("sp.end") - col("sp.start")), " ").as("chunk"))
  }

  /** Document pairs sharing at least `minShared` content-defined chunks of
    * at least `minChunkTokens` tokens — the shift-robust chunk-level
    * near-dup detector [[cdcChunks]] exists for. Chunk identity shuffles
    * as 8-byte `xxhash64` keys (the [[graft.ext.Hygiene]] contamination
    * `hashKeys` posture), with the df-cap guard against boilerplate
    * chunks. */
  def cdcPairs(df: DataFrame, g: Int = 3, target: Int = 16, maxLen: Int = 64,
               minChunkTokens: Int = 4, minShared: Long = 1L,
               maxChunkDf: Int = 64): DataFrame = {
    val ch = cdcChunks(df, g, target, maxLen)
      .where(col("n_tokens") >= minChunkTokens)
      .select(col("doc_id"), xxhash64(col("chunk")).as("h"))
      .distinct()
    val hot = ch.groupBy("h").agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxChunkDf).select("h")
    val pruned = ch.join(broadcast(hot), Seq("h"), "left_anti")
    pruned.as("a").join(pruned.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Per-stratum duplication audit: for each stratum (source, crawl,
    * language), how many of its documents are exact-content duplicates of
    * an EARLIER document anywhere in the corpus — the "which feed is
    * polluting the corpus" table a recurring ingest reviews next to
    * [[graft.ext.Quality.driftReport]]. "Earlier" (min doc_id keeps its
    * copy) charges the duplicate to the re-ingesting stratum, not the
    * original's. Content identity by sha2-256 (the [[exact]] posture);
    * one hash groupBy + one hash-keyed window, integer counts + one
    * division. */
  def dupRateByStratum(docs: DataFrame, stratum: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__h")
    docs.select(stratum.as("stratum"), col("doc_id"),
        sha2(col("text"), 256).as("__h"))
      .withColumn("__keep", col("doc_id") === min(col("doc_id")).over(w))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dups"))
      .select(col("stratum"), col("n_docs"), col("n_dups"),
        (col("n_dups").cast("double") / col("n_docs").cast("double")).as("dup_rate"))
  }

  /** Keep-BEST representative selection over near-dup clusters — the
    * policy refinement of plain dedup: instead of keeping an arbitrary
    * member (min doc_id), keep each cluster's highest-`score` document
    * (token count, quality logit rank, recency — any integer signal).
    * Singleton documents (in no pair) pass through as their own
    * representative. Output is the full keep-list: exactly one row per
    * surviving document with its cluster id and score.
    *
    * Cost on top of [[clusters]]: one struct-max aggregate over the
    * cluster key (partial-agg, two structs per cluster per map task — the
    * [[Sft.preferencePairs]] shape) and one broadcast-sized anti-join for
    * the singleton pass-through (the pair set, and hence the clustered-id
    * set, is vanishingly small next to the corpus). */
  def keepBest(docs: DataFrame, pairs: DataFrame, score: Column): DataFrame = {
    val cl = clusters(pairs)
    val scored = docs.select(col("doc_id"), score.cast("long").as("score"))
    val best = scored.join(cl, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(max(struct(col("score"), (-col("doc_id")).as("ni"))).as("__b"))
      .select((-col("__b.ni")).as("doc_id"), col("cluster_id"), col("__b.score").as("score"))
    val singles = scored
      .join(broadcast(cl.select("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"), col("score"))
    best.unionByName(singles)
  }

  /** Exact edit-distance verification of near-dup CANDIDATE pairs — the
    * verify stage fuzzy dedup runs after blocking: Levenshtein is O(|a|·|b|)
    * per pair, affordable exactly because the candidate set (from the
    * prefix/banded/winnowing indexes) is bounded, never corpus². Both
    * engines implement the standard unit-cost edit distance, so the
    * emitted integer is cross-engine exact. Pairs at or under `maxDist`
    * survive. */
  def editVerify(docs: DataFrame, pairs: DataFrame, maxDist: Int): DataFrame =
    pairs.select("id_a", "id_b")
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("__ta")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("__tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb")).cast("long").as("edit_dist"))
      .where(col("edit_dist") <= maxDist)

  val queries: Map[String, Q] = Map(
    "dedup_winnow_pairs" -> ((s, dir) =>
      winnowPairs(SparkEntry.table(s, dir, "documents"))),
    "dedup_exact" -> ((s, dir) => exact(SparkEntry.table(s, dir, "documents"))),
    "dup_rate_by_source" -> ((s, dir) =>
      dupRateByStratum(SparkEntry.table(s, dir, "documents"), col("source"))),
    "dedup_subdoc" -> ((s, dir) => subdocDedup(SparkEntry.table(s, dir, "documents"))),
    "dedup_soft" -> ((s, dir) => softDedup(SparkEntry.table(s, dir, "documents"))),
    "dedup_substring" -> ((s, dir) =>
      substringDedup(SparkEntry.table(s, dir, "documents"))),
    "dedup_jaccard_pairs" -> ((s, dir) =>
      jaccardPairs(SparkEntry.table(s, dir, "documents"), k = 3, tau = 0.5)),
    // threshold calibration off ONE pair pass at the loosest tau
    "dedup_threshold_report" -> ((s, dir) =>
      dedupThresholdReport(SparkEntry.table(s, dir, "documents"),
        taus = Seq(0.5, 0.7, 0.9), k = 3)),
    // the auto-router on the (healthy) gate corpus: the preflight must pick
    // the exact route, so the oracle is the exact pair set — the LSH route
    // is exercised by ExtSpec's degenerate corpus
    "dedup_auto" -> ((s, dir) =>
      dedupAuto(SparkEntry.table(s, dir, "documents"), k = 3, tau = 0.5)),
    // bloom-then-verify exact dedup of a batch against a corpus snapshot:
    // every 10th doc plays the incoming batch; output = genuinely-new docs
    "dedup_bloom" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      val bloom = buildContentBloom(corpus, fpp = 0.01)
      bloomNewDocs(bloom, corpus, docs.where(col("doc_id") % 10 === 0))
        .select("doc_id")
    }),
    // incremental batch-vs-corpus dedup: every 10th doc plays the incoming
    // crawl batch, the rest the frozen corpus snapshot
    "dedup_incremental" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      val idx = buildJaccardIndex(docs.where(col("doc_id") % 10 =!= 0), k = 3, tau = 0.5)
      jaccardPairsIncremental(idx, docs.where(col("doc_id") % 10 === 0), k = 3, tau = 0.5)
    }),
    // the bucketed round-trip: save the index bucketBy its join keys, load
    // through the session catalog, probe with the bipartite 3-join plan
    // (index side never re-shuffled); eager-checkpointed before the temp
    // state is dropped
    "dedup_incremental_bucketed" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      val idx = buildJaccardIndex(docs.where(col("doc_id") % 10 =!= 0), k = 3, tau = 0.5)
      val root = TmpIo.freshDir("jidx_bucketed")
      try {
        saveJaccardIndexBucketed(idx, root.toString)
        val loaded = loadJaccardIndexBucketed(s, root.toString)
        jaccardPairsIncrementalBucketed(loaded, docs.where(col("doc_id") % 10 === 0))
          .localCheckpoint()
      } finally {
        dropJaccardIndexBucketed(s, root.toString)
        TmpIo.deleteRecursively(root)
      }
    }),
    // LSH/SimHash outputs are xxhash64-dependent: oracles are committed
    // fixtures from an independent Python impl (see oracleSql below);
    // ExtSpec additionally asserts recall/exactness vs brute force.
    "dedup_minhash_lsh" -> ((s, dir) =>
      minhashLsh(SparkEntry.table(s, dir, "documents"), tau = 0.5)),
    // LSH recall AS A QUERY — the eval every banded-LSH deployment runs
    // (the ann_recall precedent applied to the dedup family): both legs
    // are the already-gated jobs, the fusion join is pair-set-sized. LSH
    // output ⊆ exact by construction (final exact-Jaccard filter), so
    // this MEASURES the bands' candidate recall directly.
    "dedup_lsh_recall" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      val exact = jaccardPairs(docs, tau = 0.5).select("id_a", "id_b")
      val lsh = minhashLsh(docs, tau = 0.5).select(col("id_a").as("la"), col("id_b").as("lb"))
      val hit = exact.join(lsh,
        col("id_a") === col("la") && col("id_b") === col("lb"), "left")
      hit.agg(
        count(lit(1)).as("n_exact"),
        count(col("la")).as("n_hit"))
        .select(col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }),
    "dedup_simhash" -> ((s, dir) =>
      simhashPairs(SparkEntry.table(s, dir, "documents"), maxHamming = 3)),
    "dedup_embedding_pairs" -> ((s, dir) =>
      embeddingPairs(SparkEntry.table(s, dir, "embeddings"), tau = GateEmbedTau,
        nCells = GateEmbedCells, nAssign = GateEmbedAssign)),
    // SemDeDup keep-list over the whole embeddings table (deterministic
    // id-seeded cells, so the oracle mirrors the algorithm end-to-end)
    "dedup_semantic" -> ((s, dir) =>
      semdedupPrune(SparkEntry.table(s, dir, "embeddings"))),
    // incremental embedding dedup: every 10th vector plays the incoming
    // batch, the rest the frozen corpus snapshot (centroids frozen at the
    // corpus — mirrored exactly by the SQL oracle)
    "dedup_embedding_incremental" -> ((s, dir) => {
      val emb = SparkEntry.table(s, dir, "embeddings")
      val idx = buildEmbeddingIndex(emb.where(col("vec_id") % 10 =!= 0))
      embeddingPairsIncremental(idx, emb.where(col("vec_id") % 10 === 0),
        tau = GateEmbedTau)
    }),
    "dedup_clusters" -> ((s, dir) =>
      clusters(jaccardPairs(SparkEntry.table(s, dir, "documents"), k = 3, tau = 0.5))),
    // the closure's size histogram + the unique-doc singleton row
    "dedup_cluster_sizes" -> ((s, dir) =>
      dedupClusterSizes(SparkEntry.table(s, dir, "documents"), k = 3, tau = 0.5)),
    "cdc_chunks" -> ((s, dir) =>
      cdcChunks(SparkEntry.table(s, dir, "documents"))),
    // pairs sharing >= 2 content-defined chunks of >= 4 tokens
    "dedup_cdc" -> ((s, dir) =>
      cdcPairs(SparkEntry.table(s, dir, "documents"), minShared = 2L)),
    // keep the longest member of every near-dup cluster (token count as
    // the integer quality signal), singletons pass through
    "dedup_keep_best" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      keepBest(docs, jaccardPairs(docs, k = 3, tau = 0.5),
        size(split(col("text"), " ")))
    }),
    // exact Levenshtein over the PPJoin candidates: the corpus's planted
    // near-dups sit at distance 4, one far pair at 8 — maxDist 4 keeps
    // the true dups and drops the far pair (a non-vacuous split)
    "dedup_edit_verify" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      editVerify(docs, jaccardPairs(docs, k = 3, tau = 0.5), maxDist = 4)
    }),
    // one micro-batch of the streaming dedup pipeline: seed the index from
    // the corpus snapshot, run the probe/reject/absorb step on the batch,
    // emit the surviving doc ids (fresh temp index per run — deterministic)
    "dedup_stream_batch" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      // dedupBatch localCheckpoints its survivors (materialized, lineage
      // truncated), so the temp index is disposable the moment it returns —
      // deleting here keeps repeated Verify/Bench runs from accumulating
      // index dirs in tmp (ADVICE r8)
      val root = TmpIo.freshDir("dedup_stream")
      try {
        saveJaccardIndex(
          buildJaccardIndex(docs.where(col("doc_id") % 10 =!= 0), k = 3, tau = 0.5),
          s"$root/idx")
        dedupBatch(s, s"$root/idx", docs.where(col("doc_id") % 10 === 0), k = 3, tau = 0.5)
          .select("doc_id")
      } finally TmpIo.deleteRecursively(root)
    }),
  )

  /** Where the committed dedup fixture parquet lives. Overridable via
    * GRAFT_FIXTURES_DIR so a relocated checkout (or a driver running from a
    * different cwd) still finds them; falls back to the repo checkout
    * location, then to a cwd-relative `fixtures/`. */
  private[ext] val fixturesDir: String =
    sys.env.get("GRAFT_FIXTURES_DIR")
      .orElse(Option("/root/repo/fixtures").filter(p => new java.io.File(p).isDirectory))
      .getOrElse(new java.io.File("fixtures").getAbsolutePath)

  /** Corpus fingerprint the fixture partitions are keyed by: ids AND texts,
    * so any change to either selects no fixture rows (loud failure). */
  private[ext] val corpusTag =
    "(SELECT md5(string_agg(doc_id || ':' || text, '|' ORDER BY doc_id)) FROM documents)"

  private val jaccardPairsOracle: String =
    """WITH d AS (
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
      |  GROUP BY x.doc_id, y.doc_id)
      |SELECT id_a, id_b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jac
      |FROM co WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5""".stripMargin

  // lazy: the winnow-pairs entry reads TextAnalysis.oracleSql, and
  // TextAnalysis's own init reads Dedup.fixturesDir — strict init on both
  // sides would deadlock into a null map whichever object loads first
  lazy val oracleSql: Map[String, String] = Map(
    // the winnow gate's oracle as a CTE (WITH-in-subquery namespacing) +
    // the df-cap/self-join/shared-count mirror; composed without
    // stripMargin — the interpolated inner oracle is already margin-free
    "dedup_winnow_pairs" ->
      ("WITH fps AS (SELECT DISTINCT doc_id, fp FROM (\n" +
        TextAnalysis.oracleSql("winnow_fingerprints") + "\n)),\n" +
        "cold AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 100),\n" +
        "pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN cold USING (fp))\n" +
        "SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_shared\n" +
        "FROM pr x JOIN pr y ON x.fp = y.fp AND x.doc_id < y.doc_id\n" +
        "GROUP BY 1, 2 HAVING count(*) >= 2"),
    "dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text",
    // text equality ⇔ sha2 equality; the min-id copy keeps, later copies
    // charge their own stratum
    "dup_rate_by_source" ->
      """WITH k AS (SELECT source AS stratum, doc_id,
        |    min(doc_id) OVER (PARTITION BY text) AS keeper
        |  FROM documents)
        |SELECT stratum, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id = keeper THEN 0 ELSE 1 END) AS BIGINT) AS n_dups,
        |  CAST(sum(CASE WHEN doc_id = keeper THEN 0 ELSE 1 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dup_rate
        |FROM k GROUP BY stratum""".stripMargin,
    // text equality ⇔ sha2 equality; 1/n is one IEEE division — bit-exact
    "dedup_soft" ->
      """SELECT doc_id, count(*) OVER (PARTITION BY text) AS n_copies,
        |  CAST(1.0 AS DOUBLE) / count(*) OVER (PARTITION BY text) AS weight
        |FROM documents""".stripMargin,
    // the bloom is routing only — the result is the plain content anti-join
    "dedup_bloom" ->
      """SELECT b.doc_id FROM documents b
        |WHERE b.doc_id % 10 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents c
        |  WHERE c.doc_id % 10 <> 0 AND c.text = b.text)""".stripMargin,
    "dedup_subdoc" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (SELECT doc_id, i AS pos,
        |    array_to_string(w[(i-1)*8+1 : least(i*8, len(w))], ' ') AS chunk
        |  FROM t, unnest(generate_series(1, CAST(ceil(len(w)/8.0) AS INT))) AS u(i)),
        |d AS (SELECT chunk, count(*) AS cnt FROM c GROUP BY chunk)
        |SELECT doc_id,
        |  count(*) AS n_chunks,
        |  count(*) FILTER (WHERE cnt > 1) AS n_dropped,
        |  COALESCE(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE cnt = 1), '')
        |    AS text_clean
        |FROM c JOIN d USING (chunk)
        |GROUP BY doc_id""".stripMargin,
    // same keep-first / span-merge semantics as substringDedup, keyed on the
    // gram TEXT (chunk equality ⇒ hash equality, the dedup_subdoc posture);
    // removal = every token index covered by a non-first duplicated 8-gram
    "dedup_substring" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |        array_to_string(w[CAST(i AS INT) : CAST(i AS INT) + 7], ' ') AS gram
        |      FROM t, unnest(generate_series(1, len(w) - 7)) AS u(i)),
        |o AS (SELECT doc_id, pos,
        |        row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
        |        count(*) OVER (PARTITION BY gram) AS cnt
        |      FROM g),
        |r AS (SELECT doc_id, pos AS s, pos + 8 AS e FROM o WHERE cnt > 1 AND rn > 1),
        |tok AS (SELECT doc_id, CAST(j AS INT) AS j, w[CAST(j AS INT)] AS word
        |        FROM t, unnest(generate_series(1, len(w))) AS u(j)),
        |rem AS (SELECT DISTINCT tok.doc_id, tok.j
        |        FROM tok JOIN r ON tok.doc_id = r.doc_id AND tok.j >= r.s AND tok.j < r.e),
        |kept AS (SELECT tok.doc_id, tok.j, tok.word
        |         FROM tok LEFT JOIN rem ON tok.doc_id = rem.doc_id AND tok.j = rem.j
        |         WHERE rem.j IS NULL)
        |SELECT t.doc_id, len(t.w) AS n_tokens,
        |       len(t.w) - count(kept.j) AS n_removed,
        |       coalesce(string_agg(kept.word, ' ' ORDER BY kept.j), '') AS text_clean
        |FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id
        |GROUP BY t.doc_id, len(t.w)""".stripMargin,
    // xxhash64-dependent outputs can't be recomputed in DuckDB SQL; the
    // oracle is committed fixture parquet produced by an INDEPENDENT
    // pure-Python reimplementation (tools/gen_dedup_fixtures.py — pure-Python
    // xxh64 + set-based LSH, validated bit-for-bit against this engine at
    // generation time). The `corpus` tag keys each fixture partition to the
    // exact documents table it was generated from, so a scale-factor or
    // data change fails loudly (empty oracle) instead of silently passing.
    "dedup_minhash_lsh" ->
      s"""SELECT id_a, id_b, est_jac, jac
        |FROM read_parquet('$fixturesDir/dedup_minhash_lsh.parquet')
        |WHERE corpus = $corpusTag""".stripMargin,
    // exact leg = the jaccard oracle; LSH leg = the committed independent
    // fixture — composed, so recall is pinned end-to-end
    "dedup_lsh_recall" ->
      ("WITH ex AS (SELECT id_a, id_b FROM (\n" + jaccardPairsOracle + "\n)),\n" +
        s"lsh AS (SELECT id_a, id_b FROM read_parquet('$fixturesDir/dedup_minhash_lsh.parquet')\n" +
        s"        WHERE corpus = $corpusTag),\n" +
        "h AS (SELECT ex.id_a, l.id_a AS hit FROM ex\n" +
        "      LEFT JOIN lsh l ON ex.id_a = l.id_a AND ex.id_b = l.id_b)\n" +
        "SELECT count(*) AS n_exact, count(hit) AS n_hit,\n" +
        "  CAST(count(hit) AS DOUBLE) / count(*) AS recall FROM h"),
    "dedup_simhash" ->
      s"""SELECT id_a, id_b, hamming
        |FROM read_parquet('$fixturesDir/dedup_simhash.parquet')
        |WHERE corpus = $corpusTag""".stripMargin,
    // same inverted-index co-occurrence formulation as the Spark plan (an
    // all-pairs cross join would be a pathological baseline: >1000s at sf0.1)
    "dedup_jaccard_pairs" -> jaccardPairsOracle,
    // the factored pair oracle (already >= 0.5, the loosest tau) + a
    // per-doc max collapse; one UNION ALL branch per threshold
    "dedup_threshold_report" ->
      ("WITH pairs AS (\n" + jaccardPairsOracle + "\n),\n" +
        """dm AS (SELECT doc_id, max(jac) AS mx FROM (
          |    SELECT id_a AS doc_id, jac FROM pairs
          |    UNION ALL SELECT id_b AS doc_id, jac FROM pairs)
          |  GROUP BY doc_id)
          |SELECT 0.5 AS tau,
          |  (SELECT count(*) FROM pairs WHERE jac >= 0.5) AS n_pairs,
          |  (SELECT count(*) FROM dm WHERE mx >= 0.5) AS n_docs_affected
          |UNION ALL SELECT 0.7,
          |  (SELECT count(*) FROM pairs WHERE jac >= 0.7),
          |  (SELECT count(*) FROM dm WHERE mx >= 0.7)
          |UNION ALL SELECT 0.9,
          |  (SELECT count(*) FROM pairs WHERE jac >= 0.9),
          |  (SELECT count(*) FROM dm WHERE mx >= 0.9)""".stripMargin),
    // the healthy gate corpus routes to exact PPJoin, so the auto-router's
    // contract is the exact pair set
    "dedup_auto" -> jaccardPairsOracle,
    // the incremental result is DEFINED as the full exact pair set
    // restricted to pairs touching the incoming batch (doc_id % 10 = 0) —
    // the frozen-df order changes candidate generation, never the output
    "dedup_incremental" -> incrementalOracleSql,
    // identical result contract: the bucketed gate runs the same probe
    // through the saveJaccardIndexBucketed → catalog-table round-trip and
    // the 3-join formulation — a layout or restructuring divergence breaks
    // the hash match (the ann_ivf_trained pattern)
    "dedup_incremental_bucketed" -> incrementalOracleSql,
    // mirror of the IVF-cell blocking algorithm (deterministic: id-seeded
    // centroids, bit-exact double cosine, ties to the smallest cell) —
    // assignment, cell-equality candidates, exact-cosine verify
    "dedup_embedding_pairs" ->
      s"""WITH cents AS (
        |  SELECT vec_id AS cell_id, CAST(embedding AS DOUBLE[]) AS cent
        |  FROM embeddings ORDER BY vec_id LIMIT $GateEmbedCells),
        |asg AS (
        |  SELECT e.vec_id, c.cell_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${Similarity.quantSimSql(s"list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cent)")} DESC,
        |      c.cell_id) AS rn
        |  FROM embeddings e, cents c),
        |cells AS (SELECT vec_id, cell_id FROM asg WHERE rn <= $GateEmbedAssign),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM cells x JOIN cells y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id)
        |SELECT c.id_a, c.id_b,
        |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim
        |FROM cand c
        |JOIN embeddings a ON c.id_a = a.vec_id
        |JOIN embeddings b ON c.id_b = b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= $GateEmbedTau""".stripMargin,
    // SemDeDup = the embedding-pairs algorithm mirror composed with the
    // dedup_clusters transitive closure: survivors are every vec_id that is
    // not a non-representative member of a semantic-duplicate component
    "dedup_semantic" ->
      s"""WITH RECURSIVE
        |cents AS (
        |  SELECT vec_id AS cell_id, CAST(embedding AS DOUBLE[]) AS cent
        |  FROM embeddings ORDER BY vec_id LIMIT $GateEmbedCells),
        |asg AS (
        |  SELECT e.vec_id, c.cell_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${Similarity.quantSimSql(s"list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cent)")} DESC,
        |      c.cell_id) AS rn
        |  FROM embeddings e, cents c),
        |cells AS (SELECT vec_id, cell_id FROM asg WHERE rn <= $GateEmbedAssign),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM cells x JOIN cells y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id),
        |p AS (
        |  SELECT c.id_a, c.id_b FROM cand c
        |  JOIN embeddings a ON c.id_a = a.vec_id
        |  JOIN embeddings b ON c.id_b = b.vec_id
        |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |          CAST(b.embedding AS DOUBLE[])) >= $GateEmbedTau),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        |nonrep AS (
        |  SELECT a AS vec_id FROM reach GROUP BY a
        |  HAVING a <> least(a, min(b)))
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM nonrep)""".stripMargin,
    // the streaming-dedup batch policy over the full exact pair set:
    // reject batch docs paired with the corpus, then one representative
    // (min id) per connected component of within-batch pairs among the
    // remainder — the same recursive-CTE machinery as dedup_clusters
    "dedup_stream_batch" ->
      """WITH RECURSIVE
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
        |batch AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
        |crej AS (
        |  SELECT DISTINCT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS doc_id
        |  FROM p WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)),
        |rem AS (SELECT doc_id FROM batch
        |        WHERE doc_id NOT IN (SELECT doc_id FROM crej)),
        |wp AS (SELECT id_a, id_b FROM p
        |       WHERE id_a IN (SELECT doc_id FROM rem)
        |         AND id_b IN (SELECT doc_id FROM rem)),
        |e AS (SELECT id_a AS a, id_b AS b FROM wp
        |      UNION ALL SELECT id_b, id_a FROM wp),
        |reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        |nonrep AS (
        |  SELECT a AS doc_id FROM reach GROUP BY a
        |  HAVING a <> least(a, min(b)))
        |SELECT doc_id FROM rem
        |WHERE doc_id NOT IN (SELECT doc_id FROM nonrep)""".stripMargin,
    // incremental twin: centroids frozen at the CORPUS snapshot (vec_id %
    // 10 <> 0), every vector assigned with those frozen cells, candidates
    // restricted to pairs touching the incoming batch (% 10 = 0) — the
    // exact algorithm mirror of embeddingPairsIncremental
    "dedup_embedding_incremental" ->
      s"""WITH cents AS (
        |  SELECT vec_id AS cell_id, CAST(embedding AS DOUBLE[]) AS cent
        |  FROM embeddings WHERE vec_id % 10 <> 0 ORDER BY vec_id LIMIT $GateEmbedCells),
        |asg AS (
        |  SELECT e.vec_id, c.cell_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      ${Similarity.quantSimSql(s"list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cent)")} DESC,
        |      c.cell_id) AS rn
        |  FROM embeddings e, cents c),
        |cells AS (SELECT vec_id, cell_id FROM asg WHERE rn <= $GateEmbedAssign),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM cells x JOIN cells y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
        |  WHERE x.vec_id % 10 = 0 OR y.vec_id % 10 = 0)
        |SELECT c.id_a, c.id_b,
        |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim
        |FROM cand c
        |JOIN embeddings a ON c.id_a = a.vec_id
        |JOIN embeddings b ON c.id_b = b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= $GateEmbedTau""".stripMargin,
    // transitive closure over the same exact-Jaccard pairs; cluster id = min
    // doc_id of the connected component
    // same content-defined cuts (sha gram hash % 16 = 0 after token i,
    // < maxLen enforced by fixed sub-splits), same span arithmetic
    "cdc_chunks" -> (CdcChunksSql + """
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS chunk_idx,
        |  s AS start_tok, least(s + 64, b2) - s AS n_tokens,
        |  array_to_string(w[CAST(s + 1 AS INT) : CAST(least(s + 64, b2) AS INT)], ' ') AS chunk
        |FROM st""".stripMargin),

    // chunk identity by TEXT here vs 8-byte xxhash64 keys in the engine —
    // the contamination hashKeys collision posture (chunk equality implies
    // hash equality; a 64-bit collision would add a spurious pair)
    "dedup_cdc" -> (CdcChunksSql + """,
        |ck AS (
        |  SELECT doc_id, s, b2,
        |    array_to_string(w[CAST(s + 1 AS INT) : CAST(least(s + 64, b2) AS INT)], ' ') AS chunk
        |  FROM st),
        |ch AS (SELECT DISTINCT doc_id, chunk FROM ck
        |       WHERE least(s + 64, b2) - s >= 4),
        |hot AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) > 64),
        |pr2 AS (SELECT * FROM ch WHERE chunk NOT IN (SELECT chunk FROM hot))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM pr2 a JOIN pr2 b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin),

    // clusters CTE as in dedup_clusters, then the (score DESC, doc_id)
    // argmax per cluster + singleton pass-through
    "dedup_keep_best" ->
      """WITH RECURSIVE
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
        |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
        |sc AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS score
        |       FROM documents),
        |best AS (
        |  SELECT doc_id, cluster_id, score FROM (
        |    SELECT sc.doc_id, cl.cluster_id, sc.score,
        |      row_number() OVER (PARTITION BY cl.cluster_id
        |        ORDER BY sc.score DESC, sc.doc_id) AS rn
        |    FROM sc JOIN cl USING (doc_id)) WHERE rn = 1),
        |singles AS (
        |  SELECT sc.doc_id, sc.doc_id AS cluster_id, sc.score
        |  FROM sc LEFT JOIN cl USING (doc_id) WHERE cl.doc_id IS NULL)
        |SELECT * FROM best UNION ALL SELECT * FROM singles""".stripMargin,

    // the PPJoin candidate pairs verified by DuckDB's own Levenshtein
    "dedup_edit_verify" ->
      """WITH d AS (
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
        |      WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5)
        |SELECT p.id_a, p.id_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
        |FROM p
        |JOIN documents a ON a.doc_id = p.id_a
        |JOIN documents b ON b.doc_id = p.id_b
        |WHERE levenshtein(a.text, b.text) <= 4""".stripMargin,

    "dedup_clusters" ->
      """WITH RECURSIVE
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
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
        |SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a""".stripMargin,

    // the same closure's size histogram; clustered sizes are >= 2 so the
    // singleton row (total - clustered) never collides
    "dedup_cluster_sizes" ->
      """WITH RECURSIVE
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
        |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |       FROM reach GROUP BY a),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY cluster_id),
        |dist AS (SELECT cluster_size, count(*) AS n_clusters FROM sz GROUP BY cluster_size),
        |singles AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
        |    (SELECT count(*) FROM documents) - (SELECT count(*) FROM cl) AS n_clusters)
        |SELECT cluster_size, n_clusters FROM dist
        |UNION ALL SELECT cluster_size, n_clusters FROM singles WHERE n_clusters > 0""".stripMargin,
  )
}
