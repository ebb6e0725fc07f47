package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.functions.vectors

/** Corpus-hygiene & data-mixing operators for LLM-training-data pipelines:
  * the filters that sit between raw crawl and tokenizer in a real pretraining
  * pipeline, complementing [[TextAnalysis]] (quality scores) and [[Dedup]]
  * (near-dup removal):
  *
  *  - '''repetition filters''' (Gopher-style, Rae et al. 2021 §A1.1):
  *    duplicate-word fraction, modal-2-gram coverage, duplicate-3-gram
  *    fraction — the "remove degenerate repetitive documents" gate;
  *  - '''PII redaction''': regex detection + masking of emails / phone
  *    numbers / IPv4 addresses;
  *  - '''benchmark contamination''': n-gram overlap of the corpus against a
  *    held-out evaluation set (the decontamination join every training run
  *    needs);
  *  - '''stratified sampling''': deterministic hash-based per-stratum
  *    subsampling — the data-mixing knob (e.g. "downsample web to 30%, keep
  *    books") — reproducible across runs and engines by construction.
  *
  * 100 TB shapes: repetition, PII, and sampling are narrow, shuffle-free
  * per-document projections (repetition's per-document cost is O(n log n)
  * in document length, never a function of corpus size — and every
  * higher-order lambda reads a MATERIALIZED array, see [[ngramsOf]]).
  * Contamination broadcasts the benchmark n-gram set (evaluation suites are
  * MBs, corpora are TBs) so the corpus side stays a narrow explode +
  * broadcast-hash-join; its one shuffle is the per-document hit count.
  */
/** One placed document of [[Hygiene.packGreedy]]: `n_kept = min(n_tokens,
  * ctxLen)` tokens land in bin `bin_id` at `offset_in_bin`. */
case class PackedDoc(doc_id: Long, source: String, n_tokens: Long,
                     bin_id: Long, offset_in_bin: Long, n_kept: Long)

object Hygiene {
  private type Q = (SparkSession, String) => DataFrame

  private def toks: Column = split(col("text"), " ")

  /** Word k-grams of the text column, one NATIVE byte scan per document
    * ([[graft.functions.WordGrams]] — r14): until round 13 this was a
    * `transform(sequence(…), i => array_join(slice(w, i, k), " "))` chain
    * over a materialized split, evaluated through interpreted HOF lambdas
    * (one closure call per gram per document, plus a join/slice
    * allocation each). Bit-identical output — each gram string IS the
    * original byte span between its end tokens. */
  private[ext] def ngramsOf(text: Column, k: Int,
                            distinct: Boolean = false): Column =
    // NULL text yields an EMPTY gram array, not NULL (ADVICE r14 #1): the
    // pre-r14 when(size(w) >= k, …).otherwise(array()) form did, and
    // repetitionStats' fractions must stay 0.0 — not NULL — on NULL-text
    // rows; WordGrams itself is null-intolerant like every UnaryExpression
    coalesce(vectors.wordGrams(text, k, distinct),
      array().cast("array<string>"))

  /** Gopher-style repetition metrics per document (Rae et al. 2021, §A1.1 —
    * fractions of duplicated words / n-grams; degenerate machine-generated
    * text is dominated by them):
    *
    *  - `dup_word_frac`   = 1 − distinct words / total words
    *  - `top_2gram_frac`  = occurrences of the modal 2-gram / total 2-grams
    *  - `dup_3gram_frac`  = 1 − distinct 3-grams / total 3-grams
    *  - `keep`            = passes the configured thresholds
    *
    * All-narrow column math over three chained projections (tokens → n-gram
    * arrays → stats), so every higher-order lambda reads a materialized
    * array: the modal count is the longest equal run of the sorted 2-gram
    * array — O(n log n) per document (bounded by document length, never
    * corpus size), zero shuffles, scales with executor count alone. */
  def repetitionStats(df: DataFrame, maxDupWordFrac: Double = 0.55,
                      maxDup3GramFrac: Double = 0.01): DataFrame = {
    val w = col("__w"); val bi = col("__bi"); val tri = col("__tri")
    df.select(col("doc_id"), toks.as("__w"),
        ngramsOf(col("text"), 2).as("__bi"), ngramsOf(col("text"), 3).as("__tri"))
      .select(
        col("doc_id"),
        (lit(1.0) - size(array_distinct(w)).cast("double") / size(w))
          .as("dup_word_frac"),
        // modal-2-gram count = longest equal run of the SORTED 2-gram array:
        // O(n log n) per document, vs the naive per-distinct-gram recount
        // (O(distinct·n) interpreted lambda calls — HOFs never enter
        // whole-stage codegen — measured 2.5× slower end-to-end at sf0.1).
        // r14: the sort+scan is one native expression
        // ([[graft.functions.ModalRunLength]], same binary sort order) —
        // the aggregate fold allocated a struct per gram interpreted.
        // Short docs (no 2-/3-grams): the fraction is 0.0 by definition —
        // no repeated n-gram evidence — and an unguarded /0 would abort the
        // job under Spark 4's default ANSI mode.
        when(size(bi) === 0, lit(0.0)).otherwise(
          vectors.modalRunLength(bi).cast("double") / size(bi))
          .as("top_2gram_frac"),
        when(size(tri) === 0, lit(0.0))
          .otherwise(lit(1.0) - size(array_distinct(tri)).cast("double") / size(tri))
          .as("dup_3gram_frac"))
      .withColumn("keep",
        col("dup_word_frac") <= maxDupWordFrac &&
          col("dup_3gram_frac") <= maxDup3GramFrac)
  }

  /** Pass-through repetition gate: [[repetitionStats]]' `keep` predicate as
    * a filter that RETAINS the input columns — the composition-friendly
    * shape ([[Curation.curateFull]] chains it without a doc_id join). The
    * token array is materialized in a projection below the filter so the
    * 3-gram lambda never re-tokenizes (same trap as [[repetitionStats]]);
    * the modal-2-gram metric is not part of the gate, so this stays O(n). */
  def repetitionGate(df: DataFrame, maxDupWordFrac: Double = 0.55,
                     maxDup3GramFrac: Double = 0.01): DataFrame = {
    val w = col("__rep_w")
    val tri = col("__rep_tri") // materialized: the predicate reads it twice
    df.withColumn("__rep_w", toks)
      .withColumn("__rep_tri", ngramsOf(col("text"), 3))
      .where(
        (lit(1.0) - size(array_distinct(w)).cast("double") / size(w))
          <= maxDupWordFrac &&
        when(size(tri) === 0, lit(0.0)) // short doc: no 3-gram evidence (ANSI /0)
          .otherwise(lit(1.0) - size(array_distinct(tri)).cast("double") / size(tri))
          <= maxDup3GramFrac)
      .drop("__rep_w", "__rep_tri")
  }

  /** RE2-compatible (and Java-regex-identical) PII patterns: no backrefs,
    * no lookaround — the same string matches in Spark, DuckDB, and the Go
    * regexp the reference ecosystem would use. */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhonePattern = """\+1-555-[0-9]{4}"""
  val Ipv4Pattern = """\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  /** Detect + mask PII in `textCol`: per-row match counts (pre-redaction)
    * and the masked text. Narrow, shuffle-free; redaction order (email →
    * phone → IP) is fixed so masks cannot partially overlap a later
    * pattern's match. */
  def redactPii(df: DataFrame, textCol: Column): DataFrame = {
    val emails = regexp_replace(textCol, EmailPattern, "<EMAIL>")
    val phones = regexp_replace(emails, PhonePattern, "<PHONE>")
    df.select(
      col("doc_id"),
      size(regexp_extract_all(textCol, lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(textCol, lit(PhonePattern), lit(0))).as("n_phones"),
      size(regexp_extract_all(textCol, lit(Ipv4Pattern), lit(0))).as("n_ips"),
      regexp_replace(phones, Ipv4Pattern, "<IP>").as("redacted"))
  }

  /** The synthetic corpus contains no PII, so the driver gate exercises the
    * operator on a deterministic augmentation: one email, one phone, one IP
    * derived from `doc_id` appended to each document (the [[Multimodal]]
    * derive-from-real-columns precedent). [[redactPii]] itself is generic
    * over any text column. */
  private[ext] def piiAugmented: Column = concat(
    col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@mail.example.com or call +1-555-"),
    lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
    lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
    lit(".0."), pmod(col("doc_id") * 7, lit(256)).cast("string"))

  /** Benchmark-contamination detector: for every corpus document, the number
    * of distinct word-`k`-gram matches against the benchmark documents'
    * `k`-gram set (only contaminated documents are returned). `k = 13` is
    * the published decontamination choice (GPT-3, Brown et al. 2020 §C);
    * the gate uses `k = 4` scaled to the synthetic corpus' ~60-word docs.
    *
    * Plan shape: the benchmark side (an evaluation suite — MBs, vs a TB
    * corpus) is distinct-reduced then '''broadcast''', so the corpus side
    * is a narrow explode + broadcast hash join; the only shuffle is the
    * final per-document count aggregation. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, k: Int = 13,
                    hashKeys: Boolean = false): DataFrame = {
    // hashKeys: join on xxhash64(gram) instead of the gram string — shrinks
    // the broadcast ~10× at k=13 (8 bytes vs ~100-byte grams). A collision
    // adds a spurious hit (flags an extra document — conservative for
    // decontamination); the driver gate keys on strings so it stays exact.
    val key: Column => Column = if (hashKeys) g => xxhash64(g) else identity
    def grams(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
          explode(ngramsOf(col("text"), k, distinct = true)).as("g0"))
        .select(col("doc_id"), key(col("g0")).as("g"))
    val bench = grams(benchmark).select("g").distinct()
    grams(corpus)
      .join(broadcast(bench), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** Cross-corpus n-gram overlap accounting — the train/test overlap table
    * a dedup/decontamination paper reports (Lee et al. 2022 §5 measure
    * overlap this way): of `other`'s DISTINCT word-`k`-grams, how many also
    * occur anywhere in `corpus`? One summary row:
    * `grams_other`, `grams_shared`, `overlap_frac`. Where
    * [[contamination]] flags individual documents for REMOVAL, this
    * measures corpus-level overlap for REPORTING (sized before/after a
    * dedup or decontamination run).
    *
    * Plan shape: both sides reduce to distinct gram sets (partial-agg
    * before the exchange) and meet in ONE join keyed by the gram; the
    * count/fraction falls out of a single final aggregation. At 100 TB set
    * `hashKeys` like [[contamination]]'s — 8-byte keys for the
    * corpus-sized distinct+join (a collision inflates `grams_shared` by
    * ~n²/2⁶⁴ — nothing at any real corpus size). */
  def corpusOverlap(corpus: DataFrame, other: DataFrame, k: Int = 13,
                    hashKeys: Boolean = false): DataFrame = {
    val key: Column => Column = if (hashKeys) g => xxhash64(g) else identity
    def grams(df: DataFrame): DataFrame =
      df.select(explode(ngramsOf(col("text"), k, distinct = true)).as("g0"))
        .select(key(col("g0")).as("g")).distinct()
    grams(other)
      .join(grams(corpus).withColumn("__hit", lit(1)), Seq("g"), "left")
      .agg(
        count(lit(1)).as("grams_other"),
        count(col("__hit")).as("grams_shared"),
        (count(col("__hit")).cast("double") / count(lit(1)))
          .as("overlap_frac"))
  }

  /** Per-document n-gram novelty audit: of each document's DISTINCT word
    * `k`-grams, how many occur in NO other document? Emits every document as
    * `(doc_id, n_grams, n_unique, novelty_frac)`. Low novelty at long `k`
    * means the document's long sequences recur across the corpus — exactly
    * the sequences a model memorizes verbatim (Lee et al. 2022 observe
    * repeated long n-grams drive memorization; Carlini et al. 2022 scale
    * this with duplication count), so this is the reporting view a dedup
    * pass is prioritized by: sort ascending, dedup the head.
    *
    * Plan shape at 100 TB: `n_grams` is a purely NARROW per-row expression
    * (`size(array_distinct(grams))` — no exchange at all), and `n_unique`
    * needs no df join-back: a gram with df = 1 has exactly ONE holder, so
    * the gram-keyed aggregation emits `(count, min(doc_id))` and the
    * singleton grams alone — already a tiny subset — roll up by doc_id.
    * ONE tokenize pass, one gram-keyed exchange (per-doc distinctness
    * makes partial aggregation collapse hot grams before it), one small
    * doc-keyed exchange over the SINGLETON grams only. The trick that
    * avoids both a second corpus scan and a df-join-back: each document
    * contributes one synthetic per-doc SENTINEL "gram" (`":"+doc_id` —
    * distinguished by its POSITION past the end of the real gram array,
    * never by its spelling, so text content cannot forge one) carrying
    * `n_grams` alongside the real grams; the sentinel is a guaranteed
    * singleton, so every document — including zero-gram and zero-unique
    * ones — surfaces from the same aggregation that finds the unique
    * grams, and no join with a re-tokenized corpus is needed. Set
    * `hashKeys` to shuffle 8-byte `xxhash64(gram)` keys instead of
    * ~100-byte strings at k=13 (sentinel-ness is detected by POSITION in
    * the exploded array — never by content — and rides the grouping key,
    * so a document whose text happens to contain the sentinel spelling
    * cannot corrupt the audit; a collision merges two gram families —
    * n_unique undercounts by at most the collision count, invisible at
    * any real corpus size); the driver gate keys on strings and stays
    * exact. Document text never rides any exchange. */
  def ngramNovelty(docs: DataFrame, k: Int = 13,
                   hashKeys: Boolean = false): DataFrame = {
    val key: Column => Column = if (hashKeys) g => xxhash64(g) else identity
    // spread first (r17): the gram explosion over a one-file corpus
    // otherwise runs single-task (no-op on many-files inputs)
    val singles = Dedup.spread(docs)
      .select(col("doc_id"), ngramsOf(col("text"), k, distinct = true).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("ng"),
        posexplode(concat(col("gs"),
          array(concat(lit(":"), col("doc_id"))))).as(Seq("pos", "g0")))
      .select(col("doc_id"), col("ng"), key(col("g0")).as("g"),
        (col("pos") === col("ng")).as("sent"))
      .groupBy("g", "sent")
      .agg(count(lit(1)).as("df"),
        min(struct(col("doc_id"), col("ng"))).as("h"))
      .where(col("df") === 1)
    singles
      .groupBy(col("h.doc_id").as("doc_id"))
      .agg(max(when(col("sent"), col("h.ng"))).as("n_grams"),
        count(when(!col("sent"), lit(1))).as("n_unique"))
      .select(col("doc_id"), col("n_grams"), col("n_unique"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_unique").cast("double") / col("n_grams"))
          .as("novelty_frac"))
  }

  /** Span-level decontamination: instead of DROPPING every document that
    * shares a word-`k`-gram with the benchmark ([[contamination]] → an
    * anti-join), REMOVE just the overlapping spans and keep the rest of the
    * document — the surgical variant used when contaminated documents are
    * too valuable to discard wholesale. A token is removed iff it is
    * covered by at least one matching k-gram occurrence (start `s` covers
    * positions `[s, s+k)`); survivors are re-joined with single spaces.
    *
    * Returns every corpus document: `(doc_id, clean_text, n_removed)` —
    * untouched documents pass through with `n_removed = 0`.
    *
    * Plan shape at 100 TB — two regimes, same output (spec-pinned equal):
    *
    *  - '''set path''' (`viaSet = true`, the default): the benchmark gram
    *    set — an eval suite, small by definition — is distinct-reduced and
    *    collected once, then matching is a NARROW `isin` (Catalyst
    *    compiles ≥10 values to an `InSet` hash lookup, O(1) per gram)
    *    inside the per-document span lambda. ONE corpus scan, ZERO corpus
    *    shuffles, two jobs total; the corpus side is a pure scan-time
    *    map. Driver/plan state is the |bench-grams| set — with `hashKeys`
    *    it is 8-byte longs, so even a million-gram benchmark is ~8 MB.
    *  - '''join path''' (`viaSet = false`): for a benchmark too large to
    *    ship in the plan, the gram set is '''broadcast''' (same as
    *    [[contamination]]); the corpus side is a narrow posexplode feeding
    *    that broadcast join, so only MATCHING (doc_id, pos) rows — bounded
    *    by actual contamination, not corpus size — reach the per-document
    *    `collect_list` aggregation; the start lists then broadcast back
    *    onto the corpus scan. Document text never shuffles.
    *
    * The set path self-guards: the gram fetch is a single bounded
    * CollectLimit of at most `setSizeLimit`+1 rows, and a benchmark that
    * overflows the cap (or is empty — `InSet` assumes non-empty) falls
    * back to the join path / an empty-starts literal automatically.
    *
    * `hashKeys` matches on `xxhash64(gram)` (8-byte keys at k=13); a
    * collision removes an innocent span — conservative, like
    * [[contamination]]'s posture — while the driver gate keys on strings
    * and stays exact. */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame, k: Int = 13,
                         hashKeys: Boolean = false,
                         viaSet: Boolean = true,
                         setSizeLimit: Long = 8L * 1000 * 1000): DataFrame = {
    val key: Column => Column = if (hashKeys) g => xxhash64(g) else identity
    // per-doc distinct only; the set path dedups in the driver `.toSet`
    // (no global-distinct exchange), the join path adds `.distinct()`
    val benchRaw = benchmark
      .select(explode(ngramsOf(col("text"), k, distinct = true)).as("g0"))
      .select(key(col("g0")).as("g"))
    // guard the driver collect: fetch at most `setSizeLimit`+1 grams in
    // ONE CollectLimit job (no separate count pass); a benchmark that
    // overflows the cap silently takes the join path instead of
    // materializing an unbounded set in the plan
    val probed: Option[Array[org.apache.spark.sql.Row]] =
      if (viaSet) {
        val rows = benchRaw.limit(
          math.min(setSizeLimit, Int.MaxValue - 1L).toInt + 1).collect()
        if (rows.length <= setSizeLimit) Some(rows) else None
      } else None
    val useSet = probed.isDefined
    val w = col("__w"); val st = col("__starts"); val gr = col("__g")
    val starts =
      if (useSet) {
        // a hash set `InSet` built directly: `isin` would stay a linear
        // `In` list inside the lambda (OptimizeIn does not descend into
        // HigherOrderFunction bodies — measured 10× slower at 4k grams)
        val hset: Set[Any] = probed.get.map(_.get(0) match {
          case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
          case x => x
        }).toSet
        val bridge = org.apache.spark.sql.graft.bridge
        def inBench(c: Column): Column = bridge.column(
          org.apache.spark.sql.catalyst.expressions.InSet(bridge.expression(c), hset))
        // empty benchmark → no spans to remove; InSet assumes a non-empty
        // set, so short-circuit rather than build InSet(∅)
        if (hset.isEmpty) array().cast("array<int>")
        // match + span-start collection as one narrow lambda: position s
        // (0-based) starts a hit iff its k-gram is in the benchmark set —
        // grams read from the materialized native array (r14), not a
        // per-position join/slice re-build inside the interpreted lambda
        else when(size(gr) > 0,
            filter(sequence(lit(0), size(gr) - 1),
              s => inBench(key(element_at(gr, s + 1)))))
          .otherwise(array().cast("array<int>"))
      } else col("starts")
    val base =
      if (useSet) corpus
      else {
        val perDoc = corpus
          .select(col("doc_id"), posexplode(ngramsOf(col("text"), k)).as(Seq("pos", "g0")))
          .select(col("doc_id"), col("pos"), key(col("g0")).as("g"))
          .join(broadcast(benchRaw.distinct()), "g")
          .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("starts"))
        corpus.join(broadcast(perDoc), Seq("doc_id"), "left")
      }
    // span removal: expand starts to covered positions, keep the rest.
    // Every derived array (`__starts`, `__cov`, `__keep`) is consumed ONLY
    // as a higher-order-function ARGUMENT (evaluated once per row) — a
    // per-token `exists(starts, ...)` predicate would let CollapseProject
    // inline the whole bench-matching expression into the token lambda and
    // re-evaluate it once PER TOKEN (measured 10× on the gate corpus)
    base
      .withColumn("__w", toks)
      .withColumn("__g", ngramsOf(col("text"), k))
      .withColumn("__starts", coalesce(starts, array().cast("array<int>")))
      .withColumn("__keep", array_except(
        sequence(lit(0), size(w) - 1),
        array_distinct(flatten(transform(st, s0 => sequence(s0, s0 + lit(k - 1)))))))
      .select(col("doc_id"),
        array_join(transform(col("__keep"), j => element_at(w, j + 1)), " ")
          .as("clean_text"),
        (size(w) - size(col("__keep"))).cast("long").as("n_removed"))
  }

  /** WITHIN-document repeated-span removal — the cleaning twin of the
    * Gopher repetition METRICS ([[repetitionStats]] measures, this
    * repairs): any k-gram occurrence whose gram already appeared EARLIER
    * in the same document marks its span `[s, s+k)` for removal; the
    * first occurrence survives. Degenerate machine-generated text is
    * dominated by such self-repeats (Rae et al. 2021 §A1.1), and
    * removing just the repeated spans keeps the document where a
    * drop-the-document gate would lose it.
    *
    * Entirely NARROW per-row compute — no exchange, rides the corpus
    * scan like [[decontaminateSpans]]'s set path, and consumes every
    * derived array only as a higher-order-function ARGUMENT (the
    * CollapseProject discipline). Repeat detection is
    * `array_position(grams, gram(s)) − 1 < s` — first-index compare,
    * O(n) per position over the per-doc gram list (documents are
    * KB-sized; the quadratic-in-tokens worst case is a per-row bound,
    * not a corpus-scale one). */
  def selfDedupSpans(corpus: DataFrame, k: Int = 3): DataFrame = {
    val w = col("__w"); val gr = col("__g"); val st = col("__starts")
    corpus
      .withColumn("__w", toks)
      .withColumn("__g", ngramsOf(col("text"), k))
      .withColumn("__starts",
        when(size(gr) > 0,
            filter(sequence(lit(0), size(gr) - 1),
              s => array_position(gr, element_at(gr, s + 1)) - 1 < s))
          .otherwise(array().cast("array<int>")))
      .withColumn("__keep", array_except(
        sequence(lit(0), size(w) - 1),
        array_distinct(flatten(transform(st, s0 => sequence(s0, s0 + lit(k - 1)))))))
      .select(col("doc_id"),
        array_join(transform(col("__keep"), j => element_at(w, j + 1)), " ")
          .as("clean_text"),
        (size(w) - size(col("__keep"))).cast("long").as("n_removed"))
  }

  /** The sha256-derived deterministic hash behind EVERY sampling/ranking
    * decision in this library ([[stratifiedSample]], [[epochMix]],
    * [[graft.ext.Curation.leakageSafeSplit]],
    * [[graft.ext.Similarity.clusterBalance]]) and mirrored verbatim in
    * their DuckDB oracles: the first 8 hex chars of sha256(id) as a long.
    * ONE definition — an edit here is an edit to the cross-engine
    * determinism contract, and a divergent copy would silently desync an
    * operator from the others and from its oracle. */
  private[ext] def hashU64(id: Column): Column =
    conv(substring(sha2(id.cast("string"), 256), 1, 8), 16, 10).cast("long")

  /** [[hashU64]] scaled to a uniform double in [0, 1) (divide by 16⁸). */
  private[ext] def hashU(id: Column): Column = hashU64(id) / lit(4294967296.0)

  /** Deterministic stratified sampling for training-data mixing: keep a row
    * iff `u(doc_id) < rates(stratum)`, where `u` maps the first 8 hex chars
    * of sha256(doc_id) to [0,1). Strata absent from `rates` are dropped.
    *
    * Hash-based (not `df.sample`): the decision is a pure function of the
    * row, so the sample is reproducible across runs, engines, partitionings,
    * and retries — and consistent when a document is seen twice. Narrow and
    * shuffle-free; at 100 TB this is a scan-time filter. */
  def stratifiedSample(df: DataFrame, strataCol: Column,
                       rates: Map[String, Double]): DataFrame = {
    val rate = coalesce(element_at(typedLit(rates), strataCol), lit(0.0))
    df.where(hashU(col("doc_id")) < rate)
  }

  /** Weighted Bernoulli sampling: keep a row with probability proportional
    * to its `weight` (capped at 1) — the consumer of per-example importance
    * weights ([[graft.ext.Quality]]'s DSIR weights, length-proportional
    * sampling, per-domain boosts). Inclusion is `hashU64(id) < weight ·
    * scale`, a PURE INTEGER comparison: exact cross-engine (no pow/ln at
    * the decision boundary, unlike priority-sampling formulations) and a
    * reproducible, narrow, shuffle-free scan-time filter like
    * [[stratifiedSample]]. Expected sample fraction for a row is
    * `min(1, weight·scale / 2^32)`. */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     scale: Long): DataFrame =
    df.where(hashU64(id) < weight.cast("long") * lit(scale))

  /** EXACT-k per-stratum sample (fixed-size eval/holdout sets per source,
    * where the Bernoulli samplers above only hit k in expectation): the k
    * members of each stratum with the smallest [[hashU64]] rank — a
    * deterministic function of ids alone, reproducible across runs and
    * engines.
    *
    * Selection runs through the [[TopKAgg]] partial aggregate, NOT a
    * `row_number` window: each input partition reduces to ≤ k rows per
    * stratum BEFORE the shuffle, where the window formulation hash-
    * exchanges and sorts the ENTIRE corpus to then discard all but
    * strata·k rows. Ranks are < 2³², exact in the aggregate's double
    * score; equal ranks (hash collisions) break by ascending id on both
    * engines. */
  def exactKSample(df: DataFrame, stratum: Column, id: Column, k: Int): DataFrame = {
    val topk = graft.functions.topk.topK(k)
    df.select(stratum.as("stratum"), id.as("id"))
      .withColumn("r", hashU64(col("id")))
      .groupBy("stratum")
      .agg(topk(col("id"), -col("r").cast("double")).as("top"))
      .select(col("stratum"), explode(col("top")).as("s"))
      .select(col("stratum"), col("s.id").as("id"))
  }

  /** The gate's mixing spec: favor English, downsample the rest. */
  private[ext] val GateRates: Map[String, Double] =
    Map("en" -> 0.9, "fr" -> 0.5, "de" -> 0.5, "es" -> 0.25, "zh" -> 0.1)

  /** Temperature-scaled source mixing — the multinomial `p_s ∝ n_s^alpha`
    * rule of multi-source/multilingual pretraining (Lample & Conneau 2019
    * §3.1; the `alpha < 1` regime flattens the size distribution so
    * low-resource strata are *relatively* upsampled): measured stratum
    * sizes `n_s` become per-stratum row budgets
    * `targetFrac · N · n_s^alpha / Σ_t n_t^alpha`, realized as the same
    * deterministic sha256 keep-decision as [[stratifiedSample]] with
    * `rate_s = min(1, budget_s / n_s)`.
    *
    * Downsampling-only: a stratum whose budget exceeds its size caps at
    * rate 1.0 (no row duplication; epoch-level upsampling belongs to the
    * data loader), and capped strata's unused budget is deliberately NOT
    * redistributed — rates stay a closed-form function of the counts, so
    * the sample is reproducible from the histogram alone.
    *
    * Two jobs: one tiny `groupBy(strata).count()` collect (bounded by the
    * number of strata — sources/languages, not rows) and one scan-time
    * filter; the corpus itself is never shuffled. */
  def temperatureMix(df: DataFrame, strataCol: Column, alpha: Double = 0.5,
                     targetFrac: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac in (0, 1]")
    val counts = df.groupBy(strataCol.as("__stratum")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val total = counts.values.sum.toDouble
    val powSum = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val rates = counts.map { case (s, n) =>
      val budget = targetFrac * total * math.pow(n.toDouble, alpha) / powSum
      s -> math.min(1.0, budget / n)
    }
    stratifiedSample(df, strataCol, rates)
  }

  /** Epoch-based token-budget mixing — the upsampling counterpart of
    * [[temperatureMix]]: each stratum gets an ABSOLUTE token budget and is
    * repeated `e_s = budget_s / tokens_s` epochs to meet it (the Llama-style
    * mixture recipe where scarce high-quality sources run multiple epochs
    * while the bulk source runs a fraction of one). Every document emits one
    * row per full epoch `0 .. ⌊e_s⌋−1`, plus the partial epoch `⌊e_s⌋` iff
    * its [[stratifiedSample]] hash `u(doc_id) < frac(e_s)` — so e_s < 1 is
    * plain deterministic downsampling and e_s > 1 duplicates rows with a
    * deterministically-chosen fractional remainder. Strata without a budget
    * are dropped.
    *
    * The realized token count per stratum concentrates on
    * `budget_s ± O(√n · max_doc_tokens)`: the fractional subset is a
    * uniform hash slice, not a bin-packed exact fit — exactness to the
    * budget belongs to the data loader, reproducibility here: the output
    * is a pure function of (corpus, budgets).
    *
    * Two jobs, like [[temperatureMix]]: one stratum-bounded token-count
    * collect, then ONE narrow scan-time explode — `sequence` is bounded by
    * ⌈e_s⌉ per row and the corpus is never shuffled. */
  def epochMix(df: DataFrame, strataCol: Column,
               targetTokens: Map[String, Long]): DataFrame = {
    require(targetTokens.values.forall(_ > 0), "token budgets must be positive")
    val counts = df.groupBy(strataCol.as("__s"))
      .agg(sum(size(toks).cast("long")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val eBy = targetTokens.flatMap { case (s, tgt) =>
      counts.get(s).map { n => s -> (tgt.toDouble / n.toDouble) }
    }
    val fullMap = eBy.map { case (s, e) => s -> math.floor(e).toLong }
    val fracMap = eBy.map { case (s, e) => s -> (e - math.floor(e)) }
    val nEpochs = element_at(typedLit(fullMap), strataCol) +
      when(hashU(col("doc_id")) < element_at(typedLit(fracMap), strataCol), 1L)
        .otherwise(0L)
    df.withColumn("__ne", nEpochs) // null stratum → null __ne → filtered
      .where(col("__ne") >= 1)
      .select(col("doc_id"), strataCol.as("stratum"),
        size(toks).cast("long").as("n_tokens"),
        explode(sequence(lit(0L), col("__ne") - 1)).as("epoch"))
  }

  /** The gate's per-source token budgets (absolute, so the same spec up- or
    * downsamples depending on corpus scale), shared with the SQL oracle. */
  private[ext] val GateEpochTargets: Map[String, Long] = Map(
    "src0" -> 4000L, "src1" -> 1500L, "src2" -> 700L, "src3" -> 60000L)

  /** `(s, t)` VALUES rows carrying the identical budgets into DuckDB. */
  private def epochTargetValues: String =
    GateEpochTargets.toSeq.sorted
      .map { case (s, t) => s"('$s', CAST($t AS BIGINT))" }.mkString(", ")

  /** Sequence packing for pretraining batch assembly — the concat-and-chunk
    * layout: within each pack shard (`source`), documents are concatenated
    * in doc_id order and the token stream is cut into fixed `ctxLen`
    * windows; a document starts at `start_offset` =
    * `offset_in_chunk` of chunk `(source, chunk_id)`.
    *
    * Sharded by `source` so packing is embarrassingly parallel across
    * shards — ONE shuffle+sort (the window), never a global single-partition
    * ordering; at 100 TB the shard key would also fold in a date/bucket
    * component to bound shard size. Deterministic: the layout is a pure
    * function of (source, doc_id, n_tokens). */
  def packSequences(df: DataFrame, ctxLen: Int = 256): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col("doc_id"), col("source"), size(toks).cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      // integer DIV/%: exact on longs (a double round-trip would not be)
      .withColumn("chunk_id", expr(s"start_offset DIV $ctxLen"))
      .withColumn("offset_in_chunk", col("start_offset") % ctxLen)
  }

  /** Greedy document-BOUNDARY packing — the padding layout used when
    * documents must not be split across training sequences (instruction
    * tuning, document-masked attention): within each `source` shard, docs
    * are taken in doc_id order and appended to the current `ctxLen`-token
    * bin while they fit; a doc that would overflow opens the next bin, and
    * the unreachable tail of each bin is padding. Docs longer than `ctxLen`
    * get a bin alone, truncated (`n_kept < n_tokens` marks them).
    *
    * Inherently SEQUENTIAL within a shard — bin boundaries depend on every
    * predecessor — so this is the one packing variant that runs as
    * per-shard imperative logic (`flatMapGroups`) instead of a window:
    * one shuffle on the shard key, then a linear in-memory pass per shard.
    * At 100 TB the shard key folds in a date/bucket component so a shard's
    * (doc_id, n_tokens) pairs fit an executor — same bound
    * [[packSequences]] documents for its window sort. The layout is a pure
    * function of (source, doc_id, n_tokens): deterministic, and exactly
    * reproducible by the oracle's recursive CTE. */
  def packGreedy(df: DataFrame, ctxLen: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("source"),
        size(toks).cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (src, it) =>
        val docs = it.toArray.sortBy(_._1)
        var bin = 0L
        var used = 0L
        docs.iterator.map { case (id, _, n) =>
          val eff = math.min(n, ctxLen.toLong)
          if (used + eff > ctxLen) { bin += 1; used = 0L }
          val off = used
          used += eff
          PackedDoc(id, src, n, bin, off, eff)
        }
      }
      .toDF()
  }

  /** Fixed-window chunking of LONG documents with stride overlap — the
    * per-document twin of [[packSequences]]' concat-and-chunk layout (HF
    * `return_overflowing_tokens` semantics): token windows of `ctxLen`
    * starting every `stride` tokens while the start is inside the document;
    * trailing windows shorter than `ctxLen` are kept (lossless — dropping
    * tails is a caller-side filter on `chunk_n_tokens`). Narrow and
    * shuffle-free: one explode per document, chunk math pure per row; every
    * lambda-free `slice` reads the materialized token array. */
  def chunkDocuments(df: DataFrame, ctxLen: Int = 256, stride: Int = 192): DataFrame = {
    require(ctxLen > 0 && stride > 0, "ctxLen and stride must be positive")
    val w = col("__w")
    df.select(col("doc_id"), toks.as("__w"))
      .select(col("doc_id"), w,
        explode(sequence(lit(0), expr(s"(size(__w) - 1) DIV $stride").cast("int")))
          .as("chunk_idx"))
      .select(
        col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(ctxLen), size(w) - col("chunk_idx") * stride).as("chunk_n_tokens"),
        array_join(slice(w, col("chunk_idx") * stride + 1, lit(ctxLen)), " ")
          .as("chunk_text"))
  }

  /** Deterministic sharded shuffle — the pretraining DATA-ORDERING step: a
    * reproducible pseudo-random permutation of the corpus, sharded so no
    * stage ever globally sorts. Each document hashes (sha256 of
    * `doc_id:salt` — the [[stratifiedSample]] engine-portable construction)
    * to `shard = u % nShards` and ranks within its shard by `(u, doc_id)`;
    * the training loader reads shards in index order, positions in rank
    * order. Pure function of (doc_id, salt): re-runs, engines, and
    * partitionings all agree, and changing `salt` is a fresh epoch
    * permutation. One shuffle (the per-shard window sort), O(corpus/nShards)
    * per-task memory — at 100 TB pick nShards so a shard fits a task. */
  def shuffleOrder(df: DataFrame, nShards: Int = 64, salt: String = "epoch0"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val u = conv(substring(
        sha2(concat(col("doc_id").cast("string"), lit(":" + salt)), 256), 1, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__u"), col("doc_id"))
    df.select(col("doc_id"), u.as("__u"))
      .withColumn("shard", pmod(col("__u"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select("doc_id", "shard", "pos")
  }

  /** Length-grouped padded batching — the dynamic-batching layout used
    * when sequences are PADDED to the batch max rather than packed
    * ([[packSequences]]' concat-and-chunk alternative): shard the corpus
    * by document hash, sort each shard by token count, cut into
    * `batchSize`-document batches, and account the padding each batch
    * wastes (`batch_max − n_tokens` per document). Similar-length
    * neighbors make `batch_max ≈ n_tokens`, which is the whole point —
    * the emitted `pad_waste` column QUANTIFIES it, so the report doubles
    * as the evaluation of the layout.
    *
    * Scale shape: the [[shuffleOrder]] template — hash-sharding bounds
    * every sort to a shard, shards process in parallel, nothing global-
    * sorts. Two windows share the one shard exchange (rank, then the
    * batch max). All integers. */
  def lengthBatching(df: DataFrame, batchSize: Int = 8, nShards: Int = 16,
                     salt: String = "epoch0"): DataFrame = {
    require(batchSize > 0 && nShards > 0, "batchSize and nShards must be positive")
    val u = hashU64(concat(col("doc_id").cast("string"), lit(":" + salt)))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("n_tokens"), col("doc_id"))
    val wBatch = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "batch_id")
    df.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        pmod(u, lit(nShards.toLong)).cast("int").as("shard"))
      .withColumn("batch_id", ((row_number().over(wRank) - 1) / batchSize).cast("long"))
      .withColumn("batch_max", max(col("n_tokens")).over(wBatch))
      .select(col("doc_id"), col("shard"), col("batch_id"), col("n_tokens"),
        col("batch_max"), (col("batch_max") - col("n_tokens")).as("pad_waste"))
  }

  /** Deterministic PROPORTIONAL source interleave — the epoch ordering
    * that avoids source-correlated batches without random shuffling:
    * within each stratum documents take hashed rank `r` (0-based), and
    * the cross-stratum order key is the fraction `r / n_s` — stratum s's
    * documents sit at evenly-spaced fractional positions, so a stratum
    * with 10× the documents appears 10× as often in any window of the
    * final order. ([[shuffleOrder]] gives an unstructured shuffle;
    * [[temperatureMix]] changes WHAT is kept — this changes only the
    * ORDER.)
    *
    * Same shard-bounded shape as [[shuffleOrder]]: positions are emitted
    * per hash-shard (`pos` within shard), so no global sort exists at any
    * scale; a writer materializes shards independently. The order key is
    * one IEEE division of two integers — bit-reproducible, ties broken by
    * (stratum, r). */
  def interleaveOrder(df: DataFrame, strataCol: Column, nShards: Int = 16,
                      salt: String = "epoch0"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val u = hashU64(concat(col("doc_id").cast("string"), lit(":" + salt)))
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy(col("__u"), col("doc_id"))
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("frac"), col("stratum"), col("r"))
    df.select(col("doc_id"), strataCol.as("stratum"), u.as("__u"))
      .withColumn("r", (row_number().over(wR) - 1).cast("long"))
      .withColumn("n_s", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("stratum")))
      .withColumn("frac", col("r").cast("double") / col("n_s").cast("double"))
      .withColumn("shard", pmod(col("__u"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(wPos) - 1).cast("long"))
      .select(col("doc_id"), col("stratum"), col("shard"), col("pos"), col("frac"))
  }

  /** Dense contiguous sample IDs 0..n−1 WITHOUT a global sort — the id
    * assignment every training run needs (sample indices, shard-local
    * file offsets) done the scalable way: per-shard ranks in parallel
    * (the [[shuffleOrder]] order), plus per-shard base offsets from one
    * `nShards`-row count aggregate collected to the driver. Equivalent to
    * `row_number() OVER (ORDER BY u, doc_id) − 1` — which would funnel
    * the corpus through ONE task — at the cost of a 16-row collect.
    * Deterministic from ids alone (hash order), so a re-run or a resumed
    * job assigns identical ids. */
  def assignIds(df: DataFrame, nShards: Int = 16, salt: String = "epoch0"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    val sharded = shuffleOrder(df, nShards, salt)
    val offsets = sharded.groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases = (0 until nShards).scanLeft(0L)((acc, s) =>
      acc + offsets.getOrElse(s, 0L)).dropRight(1)
    val baseCol = element_at(typedLit(bases), col("shard") + 1)
    sharded.select(col("doc_id"), col("shard"), col("pos"),
      (baseCol + col("pos")).as("sample_id"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the heuristics
    * behind the C4 corpus, reused by most web-crawl pipelines since): split
    * each page into lines, keep a line only if it has at least
    * `minLineWords` words, (optionally) ends in terminal punctuation, and
    * contains no `lineBlocklist` term ("javascript" in the paper); drop the
    * whole page if it contains a `pageBlocklist` term ("lorem ipsum", "{")
    * or fewer than `minLines` lines survive. Survivors are reassembled in
    * order as `text_clean` with `n_lines`/`n_kept` accounting.
    *
    * Every rule is a per-document array operation over ONE materialized
    * line split (lambdas re-split only their own ≤line-sized element — the
    * doc-resplit trap documented at [[repetitionStats]] doesn't apply) —
    * narrow, shuffle-free, scan-time at 100 TB, and composable in front of
    * the dedup/packing stages like the reference C4 pipeline. */
  def c4Clean(df: DataFrame,
              minLineWords: Int = 5,
              minLines: Int = 3,
              requireTerminalPunct: Boolean = true,
              lineBlocklist: Seq[String] = Seq("javascript"),
              pageBlocklist: Seq[String] = Seq("lorem ipsum", "{")): DataFrame = {
    require(minLineWords >= 0 && minLines >= 0, "thresholds must be non-negative")
    val keepLine = (l: Column) => {
      val words = size(filter(split(l, " "), w => w =!= "")) >= minLineWords
      val punct = if (requireTerminalPunct) rtrim(l).rlike("[.!?\"']$") else lit(true)
      lineBlocklist.foldLeft(words && punct)((acc, t) =>
        acc && !contains(lower(l), lit(t)))
    }
    val pageOk = pageBlocklist.foldLeft(lit(true))((acc, t) =>
      acc && !contains(lower(col("text")), lit(t)))
    df.where(pageOk)
      .select(col("doc_id"), split(col("text"), "\n").as("__lines"))
      .select(col("doc_id"), size(col("__lines")).cast("long").as("n_lines"),
        filter(col("__lines"), keepLine).as("__kept"))
      .where(size(col("__kept")) >= minLines)
      .select(col("doc_id"), col("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), "\n").as("text_clean"))
  }

  /** Token-level blocklist audit — the "bad words" policy filter every
    * web-crawl pipeline runs in front of training (the C4 paper's
    * badwords list, refined-web's URL/term blocklists): per document, how
    * many token occurrences hit the list, how many DISTINCT listed terms
    * appear, and the resulting keep decision.
    *
    * Scale design: the blocklist travels as a plan literal (policy lists
    * are 10²-10⁴ terms — kilobytes), and every metric is an array HOF over
    * ONE materialized token split — narrow, codegen'd, shuffle-free,
    * scan-time at 100 TB. For 10⁵+-term lists the literal would bloat the
    * plan; switch to the [[contamination]] shape (distinct-term broadcast
    * join on exploded tokens) at that size. Audit rows (not a silent
    * filter) so the drop REASON is inspectable; compose `.where(col
    * ("keep"))` in front of dedup/packing like [[c4Clean]]. */
  def blocklistFilter(df: DataFrame, blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must be non-empty")
    val bl = typedLit(blocklist)
    val hits = filter(col("__toks"), t => array_contains(bl, t))
    df.select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"),
        size(hits).cast("long").as("n_hits"),
        size(filter(array_distinct(col("__toks")), t => array_contains(bl, t)))
          .cast("long").as("n_distinct_hits"))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** The corpus has no newlines, so the [[c4Clean]] gate re-chunks each
    * document into `groupLen`-token lines first (the [[piiAugmented]]
    * inject-then-detect pattern): a deterministic construction both engines
    * compute identically. */
  private[ext] def withInjectedLines(df: DataFrame, groupLen: Int): DataFrame = {
    val nGroups = ceil(size(col("__arr")) / lit(groupLen.toDouble)).cast("int")
    df.select(col("doc_id"), split(col("text"), " ").as("__arr"))
      .select(col("doc_id"),
        array_join(
          transform(sequence(lit(0), greatest(nGroups - 1, lit(0))),
            g => array_join(slice(col("__arr"), g * groupLen + 1, lit(groupLen)), " ")),
          "\n").as("text"))
  }

  /** Gini coefficient of corpus contribution concentration across a
    * grouping key (sources, domains, languages) — the one-number "is this
    * corpus dominated by a handful of providers" diversity check that
    * complements [[clusterBalance]]'s per-slice table. Sorted-rank form
    * over 1-based ascending ranks: `G = (2·Σᵢ i·xᵢ − (K+1)·Σxᵢ) /
    * (K·Σxᵢ)` — exact integer arithmetic in decimal(38,0) until ONE
    * correctly-rounded division, rank ties broken by (count, key) so the
    * rank·count products are deterministic (any tie order yields the same
    * G, but determinism makes it bit-checkable).
    *
    * Scale: the corpus collapses to K per-key counts in one partial-agged
    * pass; the rank window runs over K rows (group cardinality, never row
    * count) — the single-task stage is bounded by the number of sources. */
  def giniConcentration(df: DataFrame, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").asc, col("key").asc)
    counts
      .select(col("x").cast("decimal(38,0)").as("__x"),
        row_number().over(w).cast("decimal(38,0)").as("__i"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__k"),
        sum(col("__x")).as("__sx"), sum(col("__i") * col("__x")).as("__six"))
      .select(col("__k").cast("long").as("n_groups"),
        col("__sx").cast("long").as("total"),
        ((lit(2).cast("decimal(38,0)") * col("__six") -
          (col("__k") + 1) * col("__sx")).cast("double") /
          (col("__k") * col("__sx")).cast("double")).as("gini"))
  }

  /** The corpus collapsed to per-gram SOURCE-SET PATTERN COUNTS — the
    * shared statistic behind [[sourceNovelty]] and [[sourceOverlap]]:
    * `(sorted source set, #grams with exactly that set)`. One corpus
    * pass: grams key the only corpus-sized exchange by their xxhash64
    * (8-byte keys instead of ~25-byte strings — the [[graft.ext.Dedup]]
    * hash-keyed-index precedent; a 64-bit collision would merge two
    * grams' source sets, ~10⁻⁵ odds at 10⁹ distinct grams, and the
    * driver oracle would catch it), `collect_set` dedups map-side, and a
    * second (tiny) exchange counts identical patterns. The pattern table
    * has at most min(#grams, 2^K) rows for K sources — co-occurrence
    * patterns repeat heavily, so realistically thousands — and BOTH
    * consumers derive their full answer from it: nothing downstream of
    * the one corpus pass scales with corpus size, and the per-gram
    * C(|srcs|,2) pair explosion that carried a 27× constant against the
    * columnar baseline never happens.
    *
    * The split is materialized ONCE as a projected attribute before the
    * trigram HOF: lambda bodies are interpreted without common-
    * subexpression elimination, so an inline `split(text)` re-runs per
    * `element_at` call (measured 10× at sf0.1). */
  /** NULL sources are excluded from these statistics (`collect_set`
    * drops them): a NULL-source doc's grams contribute no set membership,
    * and a gram seen ONLY under NULL sources yields an empty pattern both
    * consumers ignore. Coalesce the source column to a label first if
    * "unattributed" should rank as a source of its own.
    *
    * Shape (settled by a round-13 A/B over 5 variants — probe deleted once settled, r13 verdict housekeeping):
    * the `collect_set` single collapse BEATS a two-level distinct →
    * collect_list rewrite (1.13 s vs 1.20 s median at sf0.1) — at
    * realistic source cardinality the sets are tiny and the extra
    * exchange costs more than the set buffers save. What DOES pay:
    * `array_distinct` BEFORE the explode (intra-document repeats of a
    * trigram collapse row-locally — free pre-aggregation at any scale)
    * and hashing the three words DIRECTLY with multi-arg xxhash64 (no
    * per-gram concat allocation; words cannot contain the separator, so
    * the keying is equivalent). Together: 1.13 → 0.81 s median. The
    * remaining constant is the map-side explode over ONE task — an
    * artifact of the single 594 KB parquet file; at real scale the scan
    * parallelizes by file/row-group. */
  private def gramPatternCounts(df: DataFrame, source: Column): DataFrame = {
    // r14: the gram pass is ONE native byte scan per document
    // (WordGramHashes — bit-compatible with the split + HOF-transform +
    // multi-arg xxhash64 + array_distinct chain it replaces, which
    // evaluated through interpreted lambdas: one closure call per word
    // per gram was the measured constant on this corpus pass). The r13
    // small-file repartition spread is GONE with it: that exchange paid
    // off only while gram hashing was interpreter-bound (0.8 → 0.45 s);
    // at native scan speed it inverts to a net cost (0.99 vs 1.35 s
    // measured) — hashing now runs near input bandwidth, so split-level
    // parallelism is enough at any real scale.
    // millions of gram groups × growable set buffers → the sort-path
    // aggregation shape (r15 ConfScope A/B: 1.32 → 0.99 s at sf0.1 once
    // SessionTuning raised the session-wide threshold for top-k)
    ConfScope.sortBasedAgg(
      df.select(source.cast("string").as("__s"),
          explode(graft.functions.vectors.wordGramHashes(col("text"), 3)).as("gram"))
        .groupBy("gram")
        .agg(sort_array(collect_set(col("__s"))).as("srcs"))
        .groupBy("srcs").agg(count(lit(1)).as("cnt")))
  }

  /** Distinct-pattern bound for the driver-side collect: below it, the
    * source statistics finish on the driver in microseconds; above it,
    * the plan-side explosion over the (still tiny) pattern table runs —
    * same answer, no driver state. The guard is persist → count →
    * collect-from-cache, ONE corpus pass either way (a `limit(n+1)`
    * probe measured 5-10× slower here: CollectLimit scans result
    * partitions in incremental rounds). */
  private val MaxDriverPatterns = 1 << 16

  /** Right = the collected pattern table (under the bound); Left = the
    * SAME rows localCheckpointed FROM the still-persisted cache — the
    * checkpoint materializes before the `finally` unpersist, so the
    * guard's count stays the only extra job and the plan-side fallback
    * never re-runs the corpus pass. */
  private def collectPatterns(patternCounts: DataFrame)
      : Either[DataFrame, Array[(Seq[String], Long)]] = {
    // (An AQE-off variant of this guard was probed in round 13 and
    // measured SLOWER than letting AQE coalesce the tiny exchanges —
    // unlike the quantile small path, the corpus pass here is large
    // enough that coalescing pays more than the saved job rounds.)
    val cached = patternCounts
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (cached.count() > MaxDriverPatterns)
        Left(cached.localCheckpoint(true))
      else Right(cached.collect().map(r =>
        (r.getSeq[String](0), r.getLong(1))))
    } finally cached.unpersist()
  }

  /** Per-source `(source, n_grams, n_exclusive)` — the plan-side
    * fallback shape: one narrow explosion of the tiny pattern table. */
  private def perSourceGramCounts(patternCounts: DataFrame): DataFrame =
    patternCounts
      .select(col("cnt"), (size(col("srcs")) === 1).as("__ex"),
        explode(col("srcs")).as("source"))
      .groupBy("source")
      .agg(sum(col("cnt")).as("n_grams"),
        sum(when(col("__ex"), col("cnt")).otherwise(0L)).as("n_exclusive"))

  /** Per-source content novelty: of each source's distinct word-trigrams,
    * how many appear in NO other source — the data-valuation signal for
    * "does this provider add content or re-serve what we already have"
    * (the marginal-contribution question behind corpus mixing and
    * licensing decisions). Exclusive share = exclusive / distinct, one
    * division of exact counts.
    *
    * Scale: the corpus collapses to the tiny source-set pattern table
    * ONCE ([[gramPatternCounts]]); the per-source gram and exclusive
    * counts fold over that — driver-side under the pattern bound,
    * plan-side explosion above it. */
  def sourceNovelty(df: DataFrame, source: Column): DataFrame = {
    val patterns = gramPatternCounts(df, source)
    collectPatterns(patterns) match {
      case Right(pc) =>
        val nGrams = collection.mutable.Map.empty[String, Long]
        val nExcl = collection.mutable.Map.empty[String, Long]
        pc.foreach { case (srcs, cnt) =>
          srcs.foreach(s => nGrams(s) = nGrams.getOrElse(s, 0L) + cnt)
          if (srcs.size == 1)
            nExcl(srcs.head) = nExcl.getOrElse(srcs.head, 0L) + cnt
        }
        val spark = df.sparkSession
        import spark.implicits._
        nGrams.keys.toSeq.sorted.map { s =>
          val (g, e) = (nGrams(s), nExcl.getOrElse(s, 0L))
          (s, g, e, e.toDouble / g.toDouble)
        }.toDF("source", "n_grams", "n_exclusive", "exclusive_share")
      case Left(checkpointed) =>
        perSourceGramCounts(checkpointed)
          .withColumn("exclusive_share",
            col("n_exclusive").cast("double") / col("n_grams").cast("double"))
    }
  }

  /** Pairwise source content overlap: Jaccard similarity of the distinct
    * word-trigram sets of every source pair — the redundancy matrix that
    * complements [[sourceNovelty]]'s per-source view (novelty says "how
    * much is mine alone"; this says WHICH other source shares the rest).
    * `J = inter / (nA + nB − inter)` — exact integers, one division.
    *
    * Scale: NO per-gram pair explosion at all — the corpus collapses to
    * the tiny pattern table ([[gramPatternCounts]], one corpus pass),
    * and the K² intersection matrix folds over THAT: driver-side under
    * the pattern bound, else a C(|srcs|,2) explosion per pattern row
    * (|patterns|·C(K,2) rows — independent of corpus size). */
  def sourceOverlap(df: DataFrame, source: Column): DataFrame = {
    val patterns = gramPatternCounts(df, source)
    collectPatterns(patterns) match {
      case Right(pc) =>
        val nG = collection.mutable.Map.empty[String, Long]
        val inter = collection.mutable.Map.empty[(String, String), Long]
        pc.foreach { case (srcs, cnt) =>
          srcs.foreach(s => nG(s) = nG.getOrElse(s, 0L) + cnt)
          for (i <- srcs.indices; j <- (i + 1) until srcs.size) {
            val k = (srcs(i), srcs(j))
            inter(k) = inter.getOrElse(k, 0L) + cnt
          }
        }
        val spark = df.sparkSession
        import spark.implicits._
        inter.toSeq.sortBy(_._1).map { case ((a, b), n) =>
          (a, b, nG(a), nG(b), n,
            n.toDouble / (nG(a) + nG(b) - n).toDouble)
        }.toDF("source_a", "source_b", "n_a", "n_b", "n_inter", "jaccard")
      case Left(checkpointed) =>
        val pairCol = flatten(transform(col("srcs"), (a, i) =>
          transform(slice(col("srcs"), i + 2, size(col("srcs"))), b =>
            struct(a.as("sa"), b.as("sb")))))
        val inter = checkpointed.where(size(col("srcs")) >= 2)
          .select(col("cnt"), explode(pairCol).as("__p"))
          .groupBy(col("__p.sa").as("source_a"), col("__p.sb").as("source_b"))
          .agg(sum(col("cnt")).as("n_inter"))
        val sizes = perSourceGramCounts(checkpointed)
          .select(col("source"), col("n_grams").as("n"))
        inter
          .join(broadcast(sizes.select(col("source").as("source_a"),
            col("n").as("n_a"))), Seq("source_a"))
          .join(broadcast(sizes.select(col("source").as("source_b"),
            col("n").as("n_b"))), Seq("source_b"))
          .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
            col("n_inter"),
            (col("n_inter").cast("double") /
              (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
              .as("jaccard"))
    }
  }

  val queries: Map[String, Q] = Map(
    "repetition_stats" -> ((s, dir) =>
      repetitionStats(SparkEntry.table(s, dir, "documents"))),
    // how concentrated is the corpus across sources
    "gini_sources" -> ((s, dir) =>
      giniConcentration(SparkEntry.table(s, dir, "documents"), col("source"))),
    // which sources add unique trigram content
    "source_novelty" -> ((s, dir) =>
      sourceNovelty(SparkEntry.table(s, dir, "documents"), col("source"))),
    // the pairwise redundancy matrix over the same gram sets
    "source_overlap" -> ((s, dir) =>
      sourceOverlap(SparkEntry.table(s, dir, "documents"), col("source"))),
    // fixed 20-doc eval slice per source, selected by hash rank
    "exact_k_sample" -> ((s, dir) =>
      exactKSample(SparkEntry.table(s, dir, "documents"),
        col("source"), col("doc_id"), k = 20)
        .select(col("stratum").as("source"), col("id").as("doc_id"))),
    "pii_redact" -> ((s, dir) =>
      redactPii(SparkEntry.table(s, dir, "documents"), piiAugmented)),
    "contamination" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      contamination(docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0), k = 4)
    }),
    "corpus_overlap" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      corpusOverlap(docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0), k = 4)
    }),
    // within-doc repeated 3-gram spans removed, first occurrence kept
    "self_dedup_spans" -> ((s, dir) =>
      selfDedupSpans(SparkEntry.table(s, dir, "documents")
        .select("doc_id", "text"), k = 3)),
    "decontaminate_spans" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      decontaminateSpans(docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0), k = 4)
    }),
    "ngram_novelty" -> ((s, dir) =>
      ngramNovelty(SparkEntry.table(s, dir, "documents"), k = 8)),
    "stratified_sample" -> ((s, dir) =>
      stratifiedSample(SparkEntry.table(s, dir, "documents"), col("lang"), GateRates)
        .select("doc_id", "lang", "source")),
    // keep probability ∝ document length: 4e6/2^32 ≈ 0.093% per char
    "weighted_sample" -> ((s, dir) =>
      weightedSample(SparkEntry.table(s, dir, "documents"),
        col("doc_id"), col("n_chars"), scale = 4000000L)
        .select("doc_id", "source", "n_chars")),
    // temperature mix over source strata: rates derive from the measured
    // histogram (closed-form), so the oracle recomputes them in SQL
    "temperature_mix" -> ((s, dir) =>
      temperatureMix(SparkEntry.table(s, dir, "documents"), col("source"),
        alpha = 0.5, targetFrac = 0.5)
        .select("doc_id", "lang", "source")),
    // absolute token budgets over source strata: src3's budget upsamples
    // (multiple epochs per doc), src2's downsamples (fractional epoch)
    "epoch_mix" -> ((s, dir) =>
      epochMix(SparkEntry.table(s, dir, "documents"), col("source"),
        GateEpochTargets)),
    "pack_sequences" -> ((s, dir) =>
      packSequences(SparkEntry.table(s, dir, "documents"))),
    "pack_greedy" -> ((s, dir) =>
      packGreedy(SparkEntry.table(s, dir, "documents"))),
    // ctx 32 / stride 24 on ~60-word docs → 2-3 overlapping chunks each
    "chunk_documents" -> ((s, dir) =>
      chunkDocuments(SparkEntry.table(s, dir, "documents"), ctxLen = 32, stride = 24)),
    // 8-token injected lines: the tail line trips minLineWords on most docs,
    // the blocklist term ("vector" — present in the corpus vocabulary) drops
    // content-dependent lines, and minLines drops short documents outright;
    // the punctuation rule is spec-covered (the corpus has no punctuation)
    "c4_line_filter" -> ((s, dir) =>
      c4Clean(withInjectedLines(SparkEntry.table(s, dir, "documents"), groupLen = 8),
        minLineWords = 5, minLines = 3, requireTerminalPunct = false,
        lineBlocklist = Seq("vector"))),
    "shuffle_order" -> ((s, dir) =>
      shuffleOrder(SparkEntry.table(s, dir, "documents"), nShards = 16)),
    // two corpus-vocabulary terms so hit counts are non-trivial on most docs
    "blocklist_filter" -> ((s, dir) =>
      blocklistFilter(SparkEntry.table(s, dir, "documents"), GateBlocklist)),
    "length_batching" -> ((s, dir) =>
      lengthBatching(SparkEntry.table(s, dir, "documents"))),
    "assign_ids" -> ((s, dir) =>
      assignIds(SparkEntry.table(s, dir, "documents"))),
    "interleave_order" -> ((s, dir) =>
      interleaveOrder(SparkEntry.table(s, dir, "documents"), col("source"))),
  )

  /** Gate blocklist — corpus-vocabulary terms, shared with the oracle. */
  val GateBlocklist: Seq[String] = Seq("slow", "big")
  private def gateBlocklistSql: String =
    GateBlocklist.map(t => s"'$t'").mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    // same ascending (count, key) ranks, same HUGEINT sums, one division
    "gini_sources" ->
      """WITH c AS (SELECT source AS key, count(*) AS x FROM documents GROUP BY 1),
        |r AS (SELECT CAST(x AS HUGEINT) AS x,
        |    CAST(row_number() OVER (ORDER BY x, key) AS HUGEINT) AS i
        |  FROM c),
        |a AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(x) AS sx,
        |    sum(i * x) AS six FROM r)
        |SELECT CAST(k AS BIGINT) AS n_groups, CAST(sx AS BIGINT) AS total,
        |  CAST(2 * six - (k + 1) * sx AS DOUBLE) /
        |    CAST(k * sx AS DOUBLE) AS gini
        |FROM a""".stripMargin,
    // same distinct (source, trigram) pairs, same spread counts
    "source_novelty" ->
      """WITH gs AS (SELECT DISTINCT source AS grp,
        |    w[g.i] || ' ' || w[g.i+1] || ' ' || w[g.i+2] AS gram
        |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents) d,
        |       LATERAL unnest(range(1, greatest(len(w) - 1, 1))) AS g(i)),
        |sp AS (SELECT gram, count(*) AS nsrc FROM gs GROUP BY 1)
        |SELECT grp AS source, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exclusive,
        |  CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS exclusive_share
        |FROM gs JOIN sp USING (gram)
        |GROUP BY 1""".stripMargin,
    // same gram-keyed self-join intersection, same single division
    "source_overlap" ->
      """WITH gs AS (SELECT DISTINCT source AS grp,
        |    w[g.i] || ' ' || w[g.i+1] || ' ' || w[g.i+2] AS gram
        |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents) d,
        |       LATERAL unnest(range(1, greatest(len(w) - 1, 1))) AS g(i)),
        |sz AS (SELECT grp, count(*) AS n FROM gs GROUP BY 1),
        |iv AS (SELECT a.grp AS source_a, b.grp AS source_b, count(*) AS n_inter
        |       FROM gs a JOIN gs b ON a.gram = b.gram AND a.grp < b.grp
        |       GROUP BY 1, 2)
        |SELECT source_a, source_b, za.n AS n_a, zb.n AS n_b, n_inter,
        |  CAST(n_inter AS DOUBLE) /
        |    CAST(za.n + zb.n - n_inter AS DOUBLE) AS jaccard
        |FROM iv
        |JOIN sz za ON za.grp = source_a
        |JOIN sz zb ON zb.grp = source_b""".stripMargin,
    // the window formulation the engine-side partial top-k provably equals
    "exact_k_sample" ->
      """WITH r AS (SELECT source, doc_id,
        |  CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS rk
        |  FROM documents),
        |w AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY rk, doc_id) AS rn FROM r)
        |SELECT source, doc_id FROM w WHERE rn <= 20""".stripMargin,
    // mirrors c4Clean over withInjectedLines(groupLen=8): re-chunk into
    // 8-token lines (range is end-exclusive; list_slice is 1-indexed
    // inclusive), then the line rules — >=5 words, no 'vector' — and the
    // >=3-surviving-lines page rule; page blocklist mirrored for fidelity
    "c4_line_filter" ->
      """WITH a AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |b AS (SELECT doc_id,
        |  list_transform(range(0, greatest(CAST(ceil(len(arr) / 8.0) AS INT), 1)),
        |    g -> array_to_string(list_slice(arr, g * 8 + 1, g * 8 + 8), ' ')) AS lines
        | FROM a),
        |p AS (SELECT doc_id, lines FROM b
        |  WHERE NOT contains(lower(array_to_string(lines, chr(10))), 'lorem ipsum')
        |    AND NOT contains(lower(array_to_string(lines, chr(10))), '{')),
        |c AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        |  list_filter(lines, l ->
        |    len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
        |    AND NOT contains(lower(l), 'vector')) AS kept
        | FROM p)
        |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
        |  array_to_string(kept, chr(10)) AS text_clean
        |FROM c WHERE len(kept) >= 3""".stripMargin,

    // mirrors repetitionStats: CASTs keep every division a double/int IEEE
    // division (a bare `1.0` would make DuckDB compute in DECIMAL)
    "repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, w,
        |  CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1]) ELSE [] END AS bi,
        |  CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w)-2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END AS tri
        | FROM t),
        |s AS (SELECT doc_id,
        |  1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_frac,
        |  CASE WHEN len(bi) = 0 THEN 0.0 ELSE
        |    CAST(list_max(list_transform(list_distinct(bi),
        |      x -> len(list_filter(bi, y -> y = x)))) AS DOUBLE) / len(bi)
        |  END AS top_2gram_frac,
        |  CASE WHEN len(tri) = 0 THEN 0.0 ELSE
        |    1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri)
        |  END AS dup_3gram_frac
        | FROM g)
        |SELECT doc_id, dup_word_frac, top_2gram_frac, dup_3gram_frac,
        |  dup_word_frac <= 0.55 AND dup_3gram_frac <= 0.01 AS keep
        |FROM s""".stripMargin,

    "pii_redact" ->
      """WITH a AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |       || '@mail.example.com or call +1-555-'
        |       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |       || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
        |       || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS aug
        | FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS n_phones,
        |  len(regexp_extract_all(aug, '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |    '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted
        |FROM a""".stripMargin,

    "contamination" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 4 THEN
        |    list_distinct(list_transform(generate_series(1, len(w)-3),
        |      i -> array_to_string(w[i:i+3], ' ')))
        |  ELSE [] END AS gr FROM t),
        |bench AS (SELECT DISTINCT unnest(gr) AS g FROM g WHERE doc_id % 50 = 0),
        |corp AS (SELECT doc_id, unnest(gr) AS g FROM g WHERE doc_id % 50 != 0)
        |SELECT doc_id, count(*) AS n_hits
        |FROM corp JOIN bench USING (g)
        |GROUP BY doc_id""".stripMargin,

    "ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |d AS (SELECT doc_id, CASE WHEN len(w) >= 8 THEN
        |    list_distinct(list_transform(generate_series(1, len(w)-7),
        |      i -> array_to_string(w[i:i+7], ' ')))
        |  ELSE [] END AS gr FROM t),
        |inv AS (SELECT doc_id, unnest(gr) AS g FROM d),
        |dfc AS (SELECT g, count(*) AS df FROM inv GROUP BY g),
        |per AS (
        |  SELECT inv.doc_id, count(*) AS n_grams,
        |    sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_unique
        |  FROM inv JOIN dfc USING (g) GROUP BY inv.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(n_unique, 0) AS BIGINT) AS n_unique,
        |  CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
        |       ELSE CAST(n_unique AS DOUBLE) / n_grams END AS novelty_frac
        |FROM d LEFT JOIN per USING (doc_id)""".stripMargin,

    // positions are 1-based here vs 0-based in the engine — both sides are
    // internally consistent, and only (clean_text, n_removed) are compared
    "self_dedup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, w, CASE WHEN len(w) >= 3 THEN
        |    list_transform(generate_series(1, len(w) - 2),
        |      i -> array_to_string(w[i:i+2], ' '))
        |  ELSE [] END AS gr FROM t),
        |st AS (SELECT doc_id, w,
        |    list_filter(generate_series(0, len(gr) - 1),
        |      s -> list_position(gr, gr[CAST(s + 1 AS INT)]) - 1 < s) AS starts
        |  FROM g),
        |kp AS (SELECT doc_id, w,
        |    list_filter(generate_series(1, len(w)), j ->
        |      len(list_filter(starts, s -> s <= j - 1 AND j - 1 < s + 3)) = 0) AS keep
        |  FROM st)
        |SELECT doc_id,
        |  array_to_string(list_transform(keep, j -> w[j]), ' ') AS clean_text,
        |  CAST(len(w) - len(keep) AS BIGINT) AS n_removed
        |FROM kp""".stripMargin,
    "decontaminate_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 4 THEN
        |    list_distinct(list_transform(generate_series(1, len(w)-3),
        |      i -> array_to_string(w[i:i+3], ' ')))
        |  ELSE [] END AS gr FROM t),
        |bench AS (SELECT DISTINCT unnest(gr) AS g FROM g WHERE doc_id % 50 = 0),
        |cg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 4 THEN
        |    list_transform(generate_series(1, len(w)-3),
        |      i -> struct_pack(pos := i, g := array_to_string(w[i:i+3], ' ')))
        |  ELSE [] END, recursive := true) FROM t WHERE doc_id % 50 != 0),
        |hit AS (SELECT cg.doc_id, cg.pos FROM cg JOIN bench USING (g)),
        |st AS (SELECT doc_id, list(pos ORDER BY pos) AS starts FROM hit GROUP BY doc_id),
        |o AS (SELECT t.doc_id, t.w, COALESCE(st.starts, []) AS starts
        |      FROM t LEFT JOIN st USING (doc_id) WHERE t.doc_id % 50 != 0),
        |kp AS (SELECT doc_id, w,
        |    list_filter(generate_series(1, len(w)), j ->
        |      len(list_filter(starts, s -> s <= j AND j < s + 4)) = 0) AS keep
        |  FROM o)
        |SELECT doc_id,
        |  array_to_string(list_transform(keep, j -> w[j]), ' ') AS clean_text,
        |  CAST(len(w) - len(keep) AS BIGINT) AS n_removed
        |FROM kp""".stripMargin,

    "pack_sequences" ->
      """WITH n AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |o AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  -- DuckDB SUM(BIGINT) widens to HUGEINT; pin the driver-compared type
        |  CAST(COALESCE(SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        | FROM n)
        |SELECT doc_id, source, n_tokens, start_offset,
        |  start_offset // 256 AS chunk_id,
        |  start_offset % 256 AS offset_in_chunk
        |FROM o""".stripMargin,

    // the sequential greedy fill replayed exactly: a recursive CTE carries
    // (bin_id, used) across each shard's doc_id order, one doc per step
    "pack_greedy" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n, rn,
        |         CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS offset_in_bin,
        |         least(n, 256) AS used
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.doc_id, d.n, d.rn,
        |         CASE WHEN r.used + least(d.n, 256) <= 256
        |              THEN r.bin_id ELSE r.bin_id + 1 END,
        |         CASE WHEN r.used + least(d.n, 256) <= 256
        |              THEN r.used ELSE CAST(0 AS BIGINT) END,
        |         CASE WHEN r.used + least(d.n, 256) <= 256
        |              THEN r.used + least(d.n, 256) ELSE least(d.n, 256) END
        |  FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1)
        |SELECT doc_id, source, n AS n_tokens, bin_id, offset_in_bin,
        |       least(n, 256) AS n_kept
        |FROM r""".stripMargin,

    // same gram construction as the contamination oracle, reduced to the
    // corpus-level distinct sets and one summary row
    "corpus_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 4 THEN
        |    list_distinct(list_transform(generate_series(1, len(w)-3),
        |      i -> array_to_string(w[i:i+3], ' ')))
        |  ELSE [] END AS gr FROM t),
        |a AS (SELECT DISTINCT unnest(gr) AS g FROM g WHERE doc_id % 50 != 0),
        |b AS (SELECT DISTINCT unnest(gr) AS g FROM g WHERE doc_id % 50 = 0)
        |SELECT count(*) AS grams_other,
        |  count(a.g) AS grams_shared,
        |  CAST(count(a.g) AS DOUBLE) / count(*) AS overlap_frac
        |FROM b LEFT JOIN a ON a.g = b.g""".stripMargin,

    "stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |        / 4294967296.0
        |  < CASE lang WHEN 'en' THEN 0.9 WHEN 'fr' THEN 0.5 WHEN 'de' THEN 0.5
        |              WHEN 'es' THEN 0.25 WHEN 'zh' THEN 0.1 ELSE 0.0 END""".stripMargin,

    // pure integer comparison — no float at the decision boundary
    "weighted_sample" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |  < n_chars * 4000000""".stripMargin,

    // rates recomputed from the histogram with the same operation order as
    // temperatureMix ((0.5·N·n^0.5/Σ)/n); the one float-order divergence
    // risk is the Σ n^0.5 summation order, which can shift a rate by ~1 ulp
    // — a row flips only if its 2^-32-granular u lands within that ulp of
    // the boundary (P ≈ corpus_rows · 1e-16, negligible)
    "temperature_mix" ->
      """WITH c AS (SELECT source AS s, count(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT sum(n) AS total, sum(pow(n, 0.5)) AS psum FROM c),
        |r AS (SELECT s, least(1.0, (0.5 * total * pow(n, 0.5) / psum) / n) AS rate
        |      FROM c, t)
        |SELECT d.doc_id, d.lang, d.source FROM documents d JOIN r ON d.source = r.s
        |WHERE CAST(('0x' || substring(sha256(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |        / 4294967296.0 < r.rate""".stripMargin,

    // epochs recomputed from the same histogram arithmetic as epochMix
    // (one IEEE division per stratum → floor / frac agree bit-exactly)
    "epoch_mix" ->
      s"""WITH tk AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM tk GROUP BY source),
        |tgt(s, t) AS (VALUES $epochTargetValues),
        |f AS (SELECT source,
        |        CAST(floor(CAST(t AS DOUBLE) / CAST(tot AS DOUBLE)) AS BIGINT) AS nfull,
        |        CAST(t AS DOUBLE) / CAST(tot AS DOUBLE)
        |          - floor(CAST(t AS DOUBLE) / CAST(tot AS DOUBLE)) AS frac
        |      FROM c JOIN tgt ON source = s),
        |d AS (SELECT tk.doc_id, tk.source, tk.n,
        |        f.nfull + CASE WHEN
        |          CAST(('0x' || substring(sha256(CAST(tk.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |            / 4294967296.0 < f.frac THEN 1 ELSE 0 END AS ne
        |      FROM tk JOIN f USING (source))
        |SELECT doc_id, source AS stratum, n AS n_tokens, CAST(e AS BIGINT) AS epoch
        |FROM d, unnest(generate_series(0, ne - 1)) AS g(e)
        |WHERE ne >= 1""".stripMargin,

    "chunk_documents" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (SELECT doc_id, w, CAST(i AS INT) AS chunk_idx
        |      FROM t, unnest(generate_series(0, (len(w) - 1) // 24)) AS u(i))
        |SELECT doc_id, chunk_idx,
        |  chunk_idx * 24 AS start_tok,
        |  least(32, len(w) - chunk_idx * 24) AS chunk_n_tokens,
        |  array_to_string(w[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ') AS chunk_text
        |FROM c""".stripMargin,

    "blocklist_filter" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(w, x -> list_contains($gateBlocklistSql, x))) AS BIGINT) AS n_hits,
        |  CAST(len(list_filter(list_distinct(w),
        |    x -> list_contains($gateBlocklistSql, x))) AS BIGINT) AS n_distinct_hits,
        |  len(list_filter(w, x -> list_contains($gateBlocklistSql, x))) = 0 AS keep
        |FROM t""".stripMargin,

    // same two stacked windows over the same shard hash
    "length_batching" ->
      """WITH h AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':epoch0'), 1, 8))
        |      AS BIGINT) % 16 AS INT) AS shard
        |  FROM documents),
        |b AS (SELECT doc_id, shard, n_tokens,
        |  CAST((row_number() OVER (PARTITION BY shard ORDER BY n_tokens, doc_id) - 1) // 8
        |    AS BIGINT) AS batch_id
        |  FROM h)
        |SELECT doc_id, shard, batch_id, n_tokens,
        |  max(n_tokens) OVER (PARTITION BY shard, batch_id) AS batch_max,
        |  max(n_tokens) OVER (PARTITION BY shard, batch_id) - n_tokens AS pad_waste
        |FROM b""".stripMargin,

    // same rank/fraction arithmetic: one IEEE division per row, ties on
    // (stratum, r); positions per hash shard
    "interleave_order" ->
      """WITH h AS (
        |  SELECT doc_id, source AS stratum,
        |    CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':epoch0'), 1, 8))
        |      AS BIGINT) AS u
        |  FROM documents),
        |rk AS (SELECT doc_id, stratum, u,
        |  CAST(row_number() OVER (PARTITION BY stratum ORDER BY u, doc_id) - 1 AS BIGINT) AS r,
        |  count(*) OVER (PARTITION BY stratum) AS n_s
        |  FROM h),
        |f AS (SELECT doc_id, stratum, CAST(u % 16 AS INT) AS shard, r,
        |  CAST(r AS DOUBLE) / CAST(n_s AS DOUBLE) AS frac
        |  FROM rk)
        |SELECT doc_id, stratum, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY frac, stratum, r) - 1
        |    AS BIGINT) AS pos,
        |  frac
        |FROM f""".stripMargin,

    // the single-task global window the offset arithmetic provably equals
    "assign_ids" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':epoch0'), 1, 8)) AS BIGINT) AS u
        |  FROM documents),
        |s AS (SELECT doc_id, CAST(u % 16 AS INT) AS shard, u FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY u, doc_id) - 1 AS BIGINT) AS pos,
        |  CAST(row_number() OVER (ORDER BY shard, u, doc_id) - 1 AS BIGINT) AS sample_id
        |FROM s""".stripMargin,

    "shuffle_order" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':epoch0'), 1, 8)) AS BIGINT) AS u
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(u % 16 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY u % 16 ORDER BY u, doc_id) - 1 AS BIGINT) AS pos
        |FROM h""".stripMargin,
  )
}
