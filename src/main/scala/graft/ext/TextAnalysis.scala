package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Text-analysis operators for LLM-training-data pipelines over the
  * `documents` table: token counting (whitespace + a BPE-ish subword
  * estimate), quality scoring (length / stopword ratios), language ID
  * (marker-token voting + CJK codepoint detection), and document
  * fingerprinting (rolling hash).
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split/filter/aggregate/transform) — narrow, shuffle-free per-document
  * plans that scale horizontally; `top_terms` is the one shuffling query
  * (explode → partial-agg → global top-k with a deterministic tie-break).
  */
object TextAnalysis {
  private type Q = (SparkSession, String) => DataFrame

  /** Toy stopword list drawn from the synthetic corpus vocabulary; a real
    * deployment would plug a per-language list in here. */
  val Stopwords: Seq[String] = Seq("the", "a", "data", "value")

  /** Marker-token vote lists for the language-ID heuristic (a stand-in for
    * character-n-gram profiles; the synthetic corpus is ASCII-only). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "fr" -> Seq("table", "value", "part", "line"),
    "de" -> Seq("order", "group", "hash", "window"),
    "es" -> Seq("data", "column", "row", "batch"))

  private def toks: Column = split(col("text"), " ")

  /** doc_id + token/char/stopword counts + ratio features + quality score. */
  def stats(df: DataFrame): DataFrame =
    df.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        length(col("text")).as("len_chars"),
        size(filter(toks, t => t.isInCollection(Stopwords))).as("n_stop"),
        // BPE-ish subword estimate: ceil(len/4) units per word
        aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
          .as("n_bpe_tokens"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("avg_token_len",
        (col("len_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("quality",
        lit(0.4) * least(col("n_tokens") / lit(64.0), lit(1.0)) +
          lit(0.3) * col("stop_ratio") +
          lit(0.3) * least(col("avg_token_len") / lit(8.0), lit(1.0)))

  /** GPT-2-shaped pretokenizer pattern (Radford et al. 2019's regex minus
    * the RE2-incompatible `(?!\S)` lookahead), valid VERBATIM in both
    * Java regex (Spark `regexp_count`) and RE2 (DuckDB
    * `regexp_extract_all`) — match counts verified identical across
    * engines on contractions, unicode letters, digits, runs of
    * whitespace, and symbol clusters. */
  val BpePretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Tokenizer fertility per language — the tokenizer-selection eval table
    * (how many subword units a tokenizer spends per whitespace word and
    * per byte, by language): whitespace words, BPE-ish pretokens
    * ([[BpePretokenPattern]] match count — the unit count a byte-level BPE
    * starts from), and UTF-8 bytes, rolled up per `langCol` with the two
    * fertility ratios as single divisions of exact integer sums. High
    * bytes-per-pretoken languages are where a shared tokenizer
    * under-serves — the number this table exists to surface.
    *
    * Scale: three scan-time integer counters per row (regexp_count is
    * codegen'd), one partial-agged groupBy to |langs| rows. */
  def tokenFertility(df: DataFrame, langCol: Column): DataFrame =
    df.select(langCol.as("lang"),
        size(filter(toks, t => t =!= "")).cast("long").as("__w"),
        regexp_count(col("text"), lit(BpePretokenPattern)).cast("long").as("__p"),
        octet_length(col("text")).cast("long").as("__b"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__p")).as("n_pretokens"), sum(col("__b")).as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_pretokens"),
        col("n_bytes"),
        (col("n_pretokens").cast("double") / col("n_words").cast("double"))
          .as("pretokens_per_word"),
        (col("n_bytes").cast("double") / col("n_pretokens").cast("double"))
          .as("bytes_per_pretoken"))

  /** Pass-through quality gate: [[stats]]' quality score as a filter that
    * RETAINS the input columns (no doc_id self-join — at corpus scale the
    * gate must be a scan-time filter). Arithmetic is IDENTICAL to [[stats]]
    * (same expressions over a materialized token array), so
    * `qualityGate(df, q)` ≡ `df` semi-joined with `stats(df) WHERE quality
    * >= q`. */
  def qualityGate(df: DataFrame, minQuality: Double): DataFrame = {
    val w = col("__q_w")
    val nTok = size(w)
    val nStop = size(filter(w, t => t.isInCollection(Stopwords)))
    val avgLen = (length(col("text")) - (nTok - 1)).cast("double") / nTok
    val quality =
      lit(0.4) * least(nTok / lit(64.0), lit(1.0)) +
        lit(0.3) * (nStop.cast("double") / nTok) +
        lit(0.3) * least(avgLen / lit(8.0), lit(1.0))
    df.withColumn("__q_w", toks)
      .where(quality >= minQuality)
      .drop("__q_w")
  }

  /** Language-ID: CJK codepoints → zh, else marker-token argmax with a fixed
    * tie-break order (en > fr > de > es). */
  def langId(df: DataFrame): DataFrame = {
    // chained narrow projections — no join/shuffle; the second select only
    // references columns of the first
    val scored = df.select(
      col("doc_id") +: col("text") +:
        LangMarkers.map { case (lang, markers) =>
          size(filter(toks, t => t.isInCollection(markers))).as(s"s_$lang")
        }: _*)
    scored
      .select(
        col("doc_id"),
        when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
          .when(col("s_en") >= greatest(col("s_fr"), col("s_de"), col("s_es")), lit("en"))
          .when(col("s_fr") >= greatest(col("s_de"), col("s_es")), lit("fr"))
          .when(col("s_de") >= col("s_es"), lit("de"))
          .otherwise(lit("es")).as("lang_pred"),
        col("s_en"), col("s_fr"), col("s_de"), col("s_es"))
  }

  /** Code-switch detection: [[langId]]'s Latin-marker argmax applied to
    * NON-OVERLAPPING `window`-token windows, reporting per document the
    * window count, the number of adjacent-window language SWITCHES, the
    * dominant window language, and its share — the cleanup signal doc-level
    * language-ID cannot see (a half-English half-French page classifies
    * "en" at doc level and then pollutes a monolingual corpus; switches > 0
    * flags it for splitting or dropping). CJK stays doc-level territory
    * ([[langId]]'s codepoint check): windows use the marker argmax only,
    * with the same fixed en > fr > de > es tie order.
    *
    * Entirely NARROW (the [[winnow]] posture): windows, per-window marker
    * counts, the switch fold, and the dominant argmax are HOFs over the
    * per-document token array — zero exchanges, scales with tokens.
    * dominant_share is ONE division of exact integers. */
  def codeSwitchStats(df: DataFrame, window: Int = 16): DataFrame = {
    require(window >= 1, "need a positive window")
    val nw = floor((size(toks) + lit(window - 1)).cast("double") /
      lit(window.toDouble)).cast("int")
    val base = df.select(col("doc_id"), toks.as("__t"), nw.as("__nw"))
    def winLang(i: Column): Column = {
      val win = slice(col("__t"), i * window + 1, lit(window))
      val s = LangMarkers.map { case (lang, markers) =>
        lang -> size(filter(win, t => t.isInCollection(markers)))
      }.toMap
      when(s("en") >= greatest(s("fr"), s("de"), s("es")), lit("en"))
        .when(s("fr") >= greatest(s("de"), s("es")), lit("fr"))
        .when(s("de") >= s("es"), lit("de"))
        .otherwise(lit("es"))
    }
    // sequence(0, m) DESCENDS when m < 0 — guard the empty-window case
    val langs = when(col("__nw") >= 1,
      transform(sequence(lit(0), col("__nw") - 1), winLang(_)))
      .otherwise(array().cast("array<string>"))
    val l = col("__l")
    val switches = when(size(l) <= 1, lit(0L))
      .otherwise(aggregate(sequence(lit(1), size(l) - 1), lit(0L),
        (acc, i) => acc +
          when(element_at(l, i + 1) =!= element_at(l, i), 1L).otherwise(0L)))
    val counts = LangMarkers.map { case (lang, _) =>
      lang -> size(filter(l, x => x === lang))
    }.toMap
    val dominant = when(size(l) === 0, lit(null).cast("string"))
      .when(counts("en") >= greatest(counts("fr"), counts("de"), counts("es")), lit("en"))
      .when(counts("fr") >= greatest(counts("de"), counts("es")), lit("fr"))
      .when(counts("de") >= counts("es"), lit("de"))
      .otherwise(lit("es"))
    val share = when(size(l) === 0, lit(null).cast("double"))
      .otherwise(greatest(counts("en"), counts("fr"), counts("de"), counts("es"))
        .cast("double") / size(l).cast("double"))
    base.select(col("doc_id"), langs.as("__l"), col("__nw"))
      .select(col("doc_id"), col("__nw").cast("long").as("n_windows"),
        switches.as("n_switches"), dominant.as("dominant_lang"),
        share.as("dominant_share"))
  }

  /** Polynomial rolling hash over characters, mod 1e9+7 (stays exact in both
    * long and double arithmetic — oracle-comparable). */
  def fingerprint(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      aggregate(split(col("text"), ""), lit(0L),
        (h, c) => (h * 31 + ascii(c)) % 1000000007L).as("fp"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the MOSS
    * algorithm): hash every word `k`-gram, slide a window of `w` hashes,
    * record each window's minimum (RIGHTMOST on ties), deduplicate. The
    * guarantee that makes it the position-robust fingerprint selector for
    * copy detection: any shared run of ≥ `w + k − 1` tokens between two
    * documents shares at least one fingerprint, at an expected density of
    * only 2/(w+1) fingerprints per gram — [[fingerprint]]'s whole-document
    * hash breaks on ONE edited character; winnowing degrades by one
    * window.
    *
    * Entirely NARROW — and since r14 entirely NATIVE: one byte scan per
    * document ([[graft.functions.WinnowFingerprints]], a monotonic-deque
    * O(n) sliding min) replacing the interpreted HOF chain (per-gram
    * sha256 through a 64-char hex string + `conv`, then an O(n·w)
    * nested-aggregate argmin per window), bit-identical output
    * (differential-pinned in NativeTextExprSpec). The argmin key packs
    * (hash, −pos) into one integer (`h·2²⁰ − pos`, < 2⁵³: exact), so
    * "min hash, rightmost position" is a single comparison in BOTH
    * dialects; gram hashes use the sha256-derived [[Hygiene.hashU64]]
    * scheme (cross-engine exact, like every sampling/ranking op). */
  def winnow(df: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    // spread first (r17): the per-gram sha256 + per-window argmin is the
    // heavy stage, single-task on a one-file corpus otherwise
    Dedup.spread(df).select(col("doc_id"),
        explode(graft.functions.vectors.winnowFingerprints(col("text"), k, w)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))

  /** Global term frequencies, top 20 by (count desc, term asc) — the
    * tie-break makes the LIMIT cut deterministic. */
  def topTerms(df: DataFrame, k: Int = 20): DataFrame =
    df.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term"))
      .limit(k)

  /** Per-document top-k keywords by TF-IDF with a LINEAR idf (score =
    * tf / df): integer division in IEEE doubles is bit-exact across engines,
    * whereas ln-based idf can flip ranks on mathematically-equal scores
    * (2·ln5 vs ln25 differ in the last ulp, and differently per libm).
    * Two aggregations (term-in-doc, then document frequency) + a
    * broadcast-size df join; per-doc ranking ties broken by term. */
  def tfidfKeywords(df: DataFrame, k: Int = 3): DataFrame = {
    val tf = df.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    tf.join(broadcast(dfreq), "term")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"), col("score"))
  }

  /** CCNet-style unigram language-model scoring (Wenzek et al. 2020 use a
    * KenLM perplexity to rank crawl text against a clean reference corpus;
    * the unigram variant is the distributable first-order version): train
    * word frequencies on `reference`, then score every document by its
    * tokens' add-½-smoothed probabilities
    * `p(w) = (cnt(w) + ½) / (total + (V+1)/2)` (the +1 is the OOV bucket).
    *
    * Emitted per document: `n_tokens`, `n_oov` (tokens unseen in the
    * reference), `mean_prob`, `min_prob`. Probabilities are kept in
    * RATIONAL form — every per-doc aggregate is an exact integer sum/min
    * (`Σ(2·cnt+1)`, `min(cnt)`) divided ONCE by the exact common
    * denominator `2·total + V + 1` — so results are bit-exact across
    * engines and partitionings (a float `SUM(p)` would be summation-order
    * dependent, and `ln` differs in the last ulp per libm — the
    * [[tfidfKeywords]] linear-idf precedent). A deployment ranking by
    * perplexity maps these monotonically (`-log` of a mean is order-
    * reversing), so the rational form loses nothing for filtering.
    *
    * Plan shape at 100 TB: the lexicon is one aggregation of the REFERENCE
    * corpus (references are curated and much smaller than the crawl;
    * vocabularies are millions of rows — MBs) broadcast to a narrow
    * left join on the crawl side; the only corpus-sized shuffle is the
    * final per-document aggregation. Integer headroom: `2·total + V + 1`
    * at a 10¹³-token reference is ~2×10¹³ and the mean's denominator
    * multiplies by doc length — still < 2⁵³, so the double division stays
    * exact. */
  def lmScore(docs: DataFrame, reference: DataFrame): DataFrame = {
    val lex = reference.select(explode(toks).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // ONE scalar collected at build time (bounded driver state, like the
    // IVF centroid seed): folding d2 in as a literal keeps the crawl side
    // a pure narrow+broadcast plan — no 1-row nested-loop cross join —
    // which also makes the scorer applicable to a STREAMING crawl side
    val d2 = lex.agg(
      (lit(2) * coalesce(sum("cnt"), lit(0L)) + count(lit(1)) + lit(1)).as("d2"))
      .head().getLong(0)
    docs.select(col("doc_id"), explode(toks).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(lex), Seq("w"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("cnt") === 0, lit(1))).as("n_oov"),
        (sum(lit(2) * col("cnt") + 1).cast("double") /
          (lit(d2) * count(lit(1))).cast("double")).as("mean_prob"),
        ((lit(2) * min("cnt") + 1).cast("double") / lit(d2.toDouble)).as("min_prob"))
  }

  /** Second-order extension of [[lmScore]]: score each document by its word
    * BIGRAMS against a reference corpus — the word-order/fluency signal the
    * unigram model cannot see (a bag of reference-frequent words in garbage
    * order scores identically under [[lmScore]]; here its unseen bigrams
    * drag the score down). CCNet's KenLM is a 5-gram conditional model;
    * the distributable exact form is the JOINT bigram likelihood with one
    * global denominator — a conditional mean needs per-prefix denominators
    * whose float sums are summation-order-dependent, so instead of an
    * inexact conditional mean we emit the two conditional aggregates that
    * ARE order-independent (`min`, and a below-threshold count).
    *
    * Trained on `reference`: bigram counts `cnt2(b)` (add-½ smoothed with
    * one denominator `d2 = 2·T2 + V2 + 1`, the [[lmScore]] construction one
    * order up) and unigram counts `cnt1(w)` for the conditional
    * `p(w₂|w₁) = (2·cnt2 + 1) / (2·cnt1(w₁) + V1 + 1)`.
    *
    * Emitted per document (docs with <2 tokens have no bigrams and are
    * absent, like their [[lmScore]] zero-token analogue): `n_bigrams`,
    * `n_bigram_oov`, `mean_prob2`/`min_prob2` (joint, exact rational —
    * integer sums divided once), `min_cond_prob` (worst single transition:
    * each element is ONE correctly-rounded IEEE division of exact <2⁵³
    * integers, and `min` is order-independent — bit-exact across engines),
    * and `n_weak_cond` (transitions with conditional below `weakCond`,
    * a deterministic literal compare of those same doubles).
    *
    * Plan shape at 100 TB: both lexicons are aggregations of the curated
    * REFERENCE (bigram vocabularies of clean references are tens of
    * millions of rows — still broadcastable; for a web-scale reference,
    * pre-prune counts ≥ 2 like KenLM's default) broadcast to narrow left
    * joins on the crawl side; the only corpus-sized shuffle is the final
    * per-document aggregation, map-side combined. */
  def lmScoreBigram(docs: DataFrame, reference: DataFrame,
                    weakCond: Double = 1e-6): DataFrame = {
    val refToks = reference.select(
      filter(toks, w => w =!= "").as("arr")).where(size(col("arr")) >= 1)
    val lex1 = refToks.select(explode(col("arr")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt1"))
    val bigramsOf = (arr: Column) =>
      zip_with(
        slice(arr, lit(1), greatest(size(arr) - 1, lit(0))),
        slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("b")))
    val lex2 = refToks.select(explode(bigramsOf(col("arr"))).as("bg"))
      .groupBy(col("bg.b").as("b")).agg(count(lit(1)).as("cnt2"))
    // two scalars of driver state (the lmScore d2 pattern): the shared joint
    // denominator and V1+1 for the conditional's per-prefix denominator
    val d2 = lex2.agg(
      (lit(2) * coalesce(sum("cnt2"), lit(0L)) + count(lit(1)) + lit(1)).as("d2"))
      .head().getLong(0)
    val v1p1 = lex1.agg((count(lit(1)) + lit(1)).as("v")).head().getLong(0)
    val cond = (lit(2) * col("cnt2") + 1).cast("double") /
      (lit(2) * col("cnt1") + lit(v1p1)).cast("double")
    docs.select(col("doc_id"), filter(toks, w => w =!= "").as("arr"))
      .select(col("doc_id"), explode(bigramsOf(col("arr"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.b").as("b"))
      .join(broadcast(lex2), Seq("b"), "left")
      .join(broadcast(lex1.withColumnRenamed("w", "w1")), Seq("w1"), "left")
      .withColumn("cnt2", coalesce(col("cnt2"), lit(0L)))
      .withColumn("cnt1", coalesce(col("cnt1"), lit(0L)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(when(col("cnt2") === 0, lit(1))).as("n_bigram_oov"),
        (sum(lit(2) * col("cnt2") + 1).cast("double") /
          (lit(d2) * count(lit(1))).cast("double")).as("mean_prob2"),
        ((lit(2) * min("cnt2") + 1).cast("double") / lit(d2.toDouble)).as("min_prob2"),
        min(cond).as("min_cond_prob"),
        count(when(cond < weakCond, lit(1))).as("n_weak_cond"))
  }

  /** CCNet-style perplexity partition (Wenzek et al. 2020 §4.3): rank every
    * document by its [[lmScore]] reference-likelihood and split the corpus
    * into `head` (most reference-like `headFrac`), `tail` (least
    * reference-like `tailFrac`), and `middle` — the bucketing CCNet
    * publishes per language and downstream recipes sample from
    * (head-heavy for quality, tail kept for diversity ablations).
    *
    * Deterministic: `mean_prob` is bit-exact rational arithmetic, and the
    * cutoffs are EXACT percentiles whose linear interpolation
    * (`(hi−pos)·lower + (pos−lo)·upper`) matches DuckDB's `quantile_cont`
    * operation-for-operation, so the bucket boundary cannot flake across
    * engines. Buckets: `head` = score ≥ the (1−headFrac) percentile,
    * `tail` = score < the tailFrac percentile.
    *
    * Scale shape: scoring is the [[lmScore]] broadcast-lexicon plan; the
    * cutoff is one exact-percentile aggregation collapsing to TWO doubles
    * of driver state, then bucketing is a scan-time CASE. The exact
    * percentile's memory is O(distinct scores) on the final reducer — at
    * 100 TB pass `cutoffs` computed once from `approx_percentile` (or a
    * sample) instead; the bucketing plan is unchanged. */
  def perplexityPartition(docs: DataFrame, reference: DataFrame,
                          headFrac: Double = 1.0 / 3, tailFrac: Double = 1.0 / 3,
                          cutoffs: Option[(Double, Double)] = None): DataFrame = {
    require(headFrac > 0 && tailFrac > 0 && headFrac + tailFrac <= 1,
      "headFrac/tailFrac must be positive with sum <= 1")
    val scored = lmScore(docs, reference)
    val (cHead, cTail) = cutoffs.getOrElse {
      val r = scored.agg(
        percentile(col("mean_prob"), lit(1.0 - headFrac)).as("h"),
        percentile(col("mean_prob"), lit(tailFrac)).as("t")).head()
      // empty crawl side → null percentiles; any cutoffs label the zero
      // rows (a scheduled pipeline legitimately partitions empty shards)
      if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
    }
    scored.withColumn("bucket",
      when(col("mean_prob") >= cHead, lit("head"))
        .when(col("mean_prob") < cTail, lit("tail"))
        .otherwise(lit("middle")))
  }

  /** Document-length histogram by power-of-two token buckets per source —
    * the length-distribution panel of a dataset card, and the input for
    * sizing [[Hygiene.chunkDocuments]]/[[Hygiene.packSequences]] context
    * windows. Buckets are INTEGER-derived (`⌊log₂ n⌋` via the binary
    * string length, never a float log that could mis-bucket an exact power
    * of two), so counts are bit-reproducible. One partial-then-final hash
    * aggregation on (source, bucket) — map-side combined, the corpus never
    * shuffles. */
  def lengthHistogram(df: DataFrame): DataFrame =
    df.select(col("source"), size(toks).cast("long").as("n"))
      .withColumn("bucket", (length(bin(col("n"))) - 1).cast("int"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
      .select(col("source"), col("bucket"),
        expr("shiftleft(cast(1 as bigint), bucket)").as("lo_tokens"),
        (expr("shiftleft(cast(1 as bigint), bucket + 1)") - 1).as("hi_tokens"),
        col("n_docs"), col("n_tokens"))

  /** Hashing-trick TF-IDF document embeddings — the model-free featurizer
    * that connects the TEXT side of the library to its embedding operators
    * ([[Similarity.annTopK]]/[[Similarity.clusterBalance]]/
    * [[Dedup.semdedupPrune]] all consume exactly this `(id, Array[Float])`
    * shape): each document becomes an L2-normalized `dim`-vector where
    * word `w` contributes `tf(w,d) · (N+1)/(df(w)+1)` (linear idf — the
    * [[tfidfKeywords]] no-`ln` precedent) to component
    * `hash(w) mod dim` (the [[Quality.featurize]] char-polynomial fold, so
    * the whole path stays engine-mirrorable with no float library calls
    * except the correctly-rounded IEEE `sqrt`).
    *
    * Bit-deterministic across engines and partitionings: the per-document
    * accumulation folds over the doc's distinct words in SORTED order (the
    * struct array is canonicalized before the fold), the norm folds in
    * index order, and every input to the float arithmetic is an exact
    * integer — pinned by the `embed_tfidf` gate against an INDEPENDENT
    * pure-Python fixture (`tools/gen_embed_fixture.py`), the
    * [[Vocab]]-encode oracle pattern.
    *
    * Plan shape at 100 TB: tf is one (doc, word) aggregation, the df
    * lexicon one more (vocabulary-sized — MBs, broadcast back), then ONE
    * shuffle groups each doc's entries for the narrow fold; the `O(dim)`
    * vector math never leaves the row. Documents with zero (non-empty)
    * tokens have no entries and drop out — upstream hygiene's job. */
  def embedTfidf(docs: DataFrame, dim: Int = 64): DataFrame = {
    require(dim > 0, "dim must be positive")
    val n = docs.count()
    // spread first (r17): the word explosion + tf map side over a
    // one-file corpus otherwise runs single-task.
    // Per-doc tf is emitted ROW-LOCALLY by the native TermTfEntries
    // generator (r19, the bm25_index change applied here): the previous
    // groupBy(doc_id, w) shuffled corpus-sized word pairs even though
    // every group lives inside one source row, and the df aggregation
    // below now partial-aggregates to |vocab| rows per task.
    val tf = Dedup.spread(docs).select(col("doc_id"),
        explode(graft.functions.TermTfEntries.termTfEntries(
          filter(toks, w => length(w) > 0))).as("te"))
      .select(col("doc_id"), col("te.term").as("w"), col("te.tf").as("tf"))
    val lex = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val h = pmod(aggregate(split(col("w"), ""), lit(7L),
      (acc, c) => (acc * 31 + ascii(c)) % Quality.HashMod), lit(dim.toLong))
      .cast("int")
    val entries = tf.join(broadcast(lex), "w")
      .select(col("doc_id"),
        struct(col("w"), h.as("h"), col("tf"), col("df")).as("e"))
    // the O(words·dim) accumulation runs as a typed JVM map, not a chained
    // higher-order-function column: HOFs are interpreted (no codegen), and
    // the when-per-element fold measured ~3.7 s at sf0.1 vs ~1 s for the
    // identical arithmetic in a plain loop (the packGreedy per-row-
    // imperative precedent; same bits — JVM doubles, same operation order)
    val spark = docs.sparkSession
    import spark.implicits._
    val idfNum = n + 1.0
    entries.groupBy("doc_id")
      // collect_list is order-nondeterministic; sort_array canonicalizes
      // (w is unique per doc, so struct order = word order — the fold order
      // the fixture replays)
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .as[(Long, Seq[(String, Int, Long, Long)])]
      .map { case (id, es) =>
        val acc = new Array[Double](dim)
        es.foreach { case (_, hh, tfc, dfc) =>
          acc(hh) += tfc * (idfNum / (dfc + 1.0))
        }
        var n2 = 0.0
        var i = 0
        while (i < dim) { n2 += acc(i) * acc(i); i += 1 }
        val norm = math.sqrt(n2)
        (id, acc.map(v => (if (norm > 0) v / norm else 0.0).toFloat).toSeq)
      }
      .toDF("doc_id", "embedding")
  }

  /** Corpus composition accounting — the dataset-card table (docs, tokens,
    * chars, mean length per (source, lang) cell) every released training
    * set publishes, and the input the mixing stages ([[Hygiene.temperatureMix]],
    * [[Hygiene.stratifiedSample]] rates) are sized from.
    *
    * One partial-then-final hash aggregation over strata-count groups —
    * token/char counts combine map-side, so the one shuffle carries a few
    * rows per (source, lang, partition), not the corpus. The mean is one
    * IEEE division over exact integer sums — bit-identical across engines. */
  def corpusStats(df: DataFrame): DataFrame =
    df.groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        (sum(size(toks).cast("long")).cast("double") / count(lit(1)))
          .as("mean_doc_tokens"))

  /** Canonical text normalization — the preprocessing every exact-dedup /
    * fingerprint stage should run first (CCNet normalizes before hashing;
    * the reference CLI passes payload bytes through untouched, so this is a
    * north-star extension): Unicode-space unification, casefold, punctuation
    * strip, whitespace collapse, trim. Pure scan-time per-row compute —
    * narrow, codegen'd `regexp_replace`/`lower`, composable under any
    * downstream dedup or gate at any scale. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Exact dedup over [[normalizeText]] — catches trivial variants (case,
    * punctuation, spacing) that byte-exact [[Dedup.exact]] misses. Same
    * min-id survivor convention, same single map-side-combined shuffle. */
  def dedupNormalized(df: DataFrame): DataFrame =
    df.select(col("doc_id"), normalizeText(col("text")).as("norm"))
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .drop("norm")

  /** Heaps-law vocabulary-growth curve: new and cumulative distinct terms
    * per `bucketSize`-document slice of the corpus (ordered by doc_id) —
    * the saturation diagnostic that tells you whether more crawl is still
    * buying vocabulary. Term first-occurrence = `min(doc_id)` per term (one
    * map-side-combined shuffle keyed by term, the IDF-job shape); the
    * running sum's window input is |buckets| rows, driver-bounded. */
  def vocabGrowth(df: DataFrame, bucketSize: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket")).rowsBetween(Long.MinValue, 0)
    df.select(col("doc_id"), explode(array_distinct(toks)).as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy((col("first_doc") / bucketSize).cast("long").as("bucket"))
      .agg(count(lit(1)).as("new_terms"))
      .withColumn("cum_terms", sum(col("new_terms")).over(w))
  }

  /** Semantic chunking boundaries — the RAG-era text splitter: slice each
    * document into fixed token windows and flag the window joints where
    * the lexical cosine between ADJACENT windows drops below `tau` (the
    * topic-shift signal; splitting there instead of at fixed offsets
    * keeps retrieval chunks topically coherent). Emits EVERY joint with
    * its cosine, so the threshold is tunable downstream and the table
    * doubles as a within-document topic-drift profile.
    *
    * Determinism: window vectors are integer word counts, the dot and
    * squared norms are INTEGER sums (order-independent — no fold
    * discipline needed), and the cosine is the fixed chain
    * `dot / (√n1 · √n2)` — one division, two sqrts, one multiply,
    * identical IEEE ops in identical order cross-engine. Since r14 the
    * per-joint count vectors and cosines come from ONE native byte scan
    * per document ([[graft.functions.WindowBoundaryCos]]) — the previous
    * HOF chain recounted each distinct word with a `size(filter(...))`
    * scan, O(window²) interpreted closure calls per joint
    * (differential-pinned in NativeTextExprSpec). Nothing shuffles. */
  def semanticBoundaries(docs: DataFrame, window: Int = 16,
                         tau: Double = 0.2): DataFrame = {
    require(window >= 2, "window must be at least 2 tokens")
    docs.select(col("doc_id"),
        explode(graft.functions.vectors.windowBoundaryCos(col("text"), window)).as("b"))
      .select(col("doc_id"), col("b.boundary_tok").as("boundary_tok"),
        col("b.cos").as("cos"))
      .withColumn("is_boundary", col("cos") < tau)
  }

  /** GloVe-style windowed co-occurrence counts (Pennington et al. 2014
    * §3) — the corpus-wide matrix-construction job behind classical word
    * embeddings and collocation/PMI mining: for every unordered token
    * pair within `window` positions, the raw co-occurrence count and
    * GloVe's distance-discounted weight Σ 1/d.
    *
    * The 1/d weights are INTEGER-scaled: `scale = lcm(1..window)` (12 for
    * the default window 4) makes every contribution `scale/d` a whole
    * number, so the aggregated `weight_scaled` is an exact integer on any
    * engine and summation order — divide by `scale` at consumption time.
    *
    * Shape: the pair explosion is narrow per-document compute (since r14
    * ONE native byte scan per document, [[graft.functions.CoocPairs]] —
    * the nested HOF explosion it replaces ran interpreted closures with
    * an element_at per pair; ~n·window rows per doc either way), then one
    * partial-aggregated groupBy on the canonicalized (a, b) key — the
    * exact df-table shape every term-statistics job here uses. At 100 TB
    * the explosion dominates; `window` bounds it linearly, and min-count
    * pruning (`HAVING`) belongs AFTER the partial agg, where it is. */
  def cooccurrence(docs: DataFrame, window: Int = 4, minCount: Long = 1L): DataFrame = {
    require(window >= 1, "window must be positive")
    val scale = (1 to window).foldLeft(1L)((acc, d) =>
      acc * d / java.math.BigInteger.valueOf(acc).gcd(java.math.BigInteger.valueOf(d)).longValue())
    docs
      .select(explode(
        graft.functions.vectors.coocPairs(col("text"), window, scale)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_cooc"), sum(col("p.ws")).as("weight_scaled"))
      .where(col("n_cooc") >= minCount)
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429,
    * reduced to its deterministic one-step core): domains the REFERENCE
    * language model finds SURPRISING get upweighted — `weight_d ∝ 1 −
    * mean_prob_d`, the add-½-smoothed unigram likelihood of
    * [[lmScore]] aggregated at DOMAIN level (exact integer sums, ONE
    * division per domain), normalized over domains. Full DoReMi
    * alternates proxy-model training with Group-DRO — float-iterative
    * and engine-divergent; the one-step surprise weighting is its
    * deterministic backbone. The normalization folds the ≤|domains|
    * excesses in DOMAIN-SORTED order (driver-side, bounded), so weights
    * are bit-reproducible; the oracle mirrors the fold with
    * `list(... ORDER BY domain)` + `list_reduce`. */
  def domainWeights(docs: DataFrame, reference: DataFrame,
                    domain: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = reference.select(explode(toks).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val d2 = lex.agg(
      (lit(2) * coalesce(sum("cnt"), lit(0L)) + count(lit(1)) + lit(1)).as("d2"))
      .head().getLong(0)
    val perDomain = docs.select(domain.cast("string").as("domain"),
        explode(toks).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(lex), Seq("w"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_tokens"),
        // numerator summed in decimal (exact to 1e30 — no Long wrap at
        // web-corpus token counts), denominator multiplied in DOUBLE
        // (each factor exact below 2^53; a Long product of d2·n_tokens
        // overflows at ~1e12 tokens × 1e7 d2); the oracle mirrors both
        (sum((lit(2) * col("cnt") + 1).cast("decimal(20,0)")).cast("double") /
          (lit(d2).cast("double") * count(lit(1)).cast("double"))).as("mean_prob"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val tot = perDomain.foldLeft(0.0) { case (a, (_, _, mp)) => a + (1.0 - mp) }
    perDomain.map { case (d, n, mp) => (d, n, mp, (1.0 - mp) / tot) }
      .toSeq.toDF("domain", "n_tokens", "mean_prob", "weight")
  }

  /** Kneser–Ney preprocessing counts (Kneser & Ney 1995; the smoothing
    * every production n-gram LM uses): per word, the RAW unigram count
    * AND the CONTINUATION count — how many DISTINCT left contexts the
    * word follows. "Francisco" is frequent but follows almost only
    * "San"; its continuation count is tiny, and KN backs off by
    * continuation, not frequency. One pass: the bigram explode reduces
    * to distinct (prev, w) pairs map-side (per-doc distinctness first),
    * then a word-keyed count; raw counts ride a second aggregation of
    * the same narrow subtree. Document-initial words have no left
    * context and contribute no continuation. All integers. */
  def knCounts(docs: DataFrame): DataFrame = {
    val toks = filter(split(col("text"), " "), w => length(w) > 0)
    val base = docs.select(toks.as("w"))
    val raw = base.select(explode(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val cont = base
      .select(explode(array_distinct(zip_with(
        slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
        slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
        (p, c) => struct(p.as("prev"), c.as("word"))))).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.word").as("word"))
      .groupBy("prev", "word").agg(count(lit(1)).as("__n"))
      .groupBy("word").agg(count(lit(1)).as("n_contexts"))
    raw.join(cont, Seq("word"), "left")
      .select(col("word"), col("cnt"),
        coalesce(col("n_contexts"), lit(0L)).as("n_contexts"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995 with
    * the standard absolute discount D = 0.75 = 3/4 — exact in binary):
    * for every OBSERVED bigram (prev, w),
    *
    *   P(w|prev) = (c(prev,w) − D)/c(prev)
    *             + D·N₁₊(prev,·)/c(prev) · N₁₊(·,w)/N₁₊(·,·)
    *
    * — the [[knCounts]] continuation counts put to their actual use. The
    * probabilities sum to 1 over each prev's observed successors plus the
    * backoff mass, making this the LM table a [[lmScore]]-style scorer
    * would consume at the bigram order.
    *
    * Determinism: every count is an exact integer; the discount terms are
    * evaluated as `(4c−3)/(4c_p)` (integer numerators/denominators, ONE
    * correctly-rounded division each) and the backoff product multiplies
    * its exact-below-2^53 factors in DOUBLE in a pinned order the oracle
    * mirrors operation-for-operation — bit-identical across engines.
    *
    * Plan shape: the corpus collapses to the bigram-type table in ONE
    * explode + partial-agged groupBy; the three marginals (prev totals,
    * prev fan-out, continuation counts) are aggregations OVER THE
    * COLLAPSED table (vocab²-bounded, not corpus-bounded) joined back on
    * its own keys; the single global scalar N₁₊(·,·) broadcasts. */
  def knBigramLm(docs: DataFrame): DataFrame = {
    val toksL = filter(split(col("text"), " "), w => length(w) > 0)
    // AQE stays ON here, by measurement (r18, VERDICT r17 #7 A/B at
    // sf0.1, min-of-5, comparable idle sentinels): scoping it off — the
    // ann_lsh pattern — ran 0.485 → 0.687 s. Unlike ann_lsh's single
    // bounded exchange, this plan's three marginal joins over the
    // checkpointed pair table profit from AQE's coalescing and runtime
    // join re-planning; its stage-job rounds are cheaper than the static
    // 32-partition exchanges they replace.
    val pairs = docs.select(toksL.as("w"))
      .select(explode(zip_with(
        slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
        slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
        (p, c) => struct(p.as("prev"), c.as("word")))).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.word").as("word"))
      .groupBy("prev", "word").agg(count(lit(1)).as("n_pw"))
      // materialized: FOUR consumers (output rows + three marginals) would
      // otherwise each re-run the corpus explode (the lambda-bearing
      // exchange does not canonicalize for ReuseExchange); the pair table
      // is the vocab²-bounded sufficient statistic, so this is the right
      // thing to persist at any scale
      .localCheckpoint()
    val prevStats = pairs.groupBy("prev")
      .agg(sum(col("n_pw")).as("c_p"), count(lit(1)).as("n1p_prev"))
    val wordStats = pairs.groupBy("word").agg(count(lit(1)).as("n1c_w"))
    val tot = pairs.agg(count(lit(1)).as("n1p_all"))
    pairs.join(prevStats, "prev").join(wordStats, "word")
      .crossJoin(broadcast(tot))
      .select(col("prev"), col("word"), col("n_pw"),
        (((lit(4) * col("n_pw") - 3).cast("double") /
            (lit(4) * col("c_p")).cast("double")) +
          (lit(3.0) * col("n1p_prev") * col("n1c_w")) /
            (lit(4.0) * col("c_p") * col("n1p_all"))).as("prob"))
  }

  val queries: Map[String, Q] = Map(
    "kn_counts" -> ((s, dir) =>
      knCounts(SparkEntry.table(s, dir, "documents"))),
    "kn_bigram_lm" -> ((s, dir) =>
      knBigramLm(SparkEntry.table(s, dir, "documents"))),
    // mixture weights over sources, the en slice as the reference LM
    "domain_weights" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      domainWeights(docs, docs.where(col("lang") === "en"), col("source"))
    }),
    // window 4 → scale 12: weights 12, 6, 4, 3 by distance — all integer
    "glove_cooc" -> ((s, dir) =>
      cooccurrence(SparkEntry.table(s, dir, "documents"), window = 4, minCount = 5L)),
    // 16-token windows; tau 0.2 flags ~18% of joints at sf0.01
    "semantic_boundaries" -> ((s, dir) =>
      semanticBoundaries(SparkEntry.table(s, dir, "documents"))),
    "corpus_stats" -> ((s, dir) => corpusStats(SparkEntry.table(s, dir, "documents"))),
    "normalize_text" -> ((s, dir) =>
      SparkEntry.table(s, dir, "documents")
        .select(col("doc_id"), normalizeText(col("text")).as("norm"))),
    "dedup_normalized" -> ((s, dir) =>
      dedupNormalized(SparkEntry.table(s, dir, "documents"))),
    "vocab_growth" -> ((s, dir) =>
      vocabGrowth(SparkEntry.table(s, dir, "documents"))),
    "text_stats" -> ((s, dir) => stats(SparkEntry.table(s, dir, "documents"))),
    // which languages a byte-level BPE under-serves: pretokens/word and
    // bytes/pretoken per language, exact integer sums
    "tokenizer_fertility" -> ((s, dir) =>
      tokenFertility(SparkEntry.table(s, dir, "documents"), col("lang"))),
    "lang_id" -> ((s, dir) => langId(SparkEntry.table(s, dir, "documents"))),
    // windowed language spans: switches + dominant share per doc (W = 16)
    "code_switch_stats" -> ((s, dir) =>
      codeSwitchStats(SparkEntry.table(s, dir, "documents"), window = 16)),
    "doc_fingerprint" -> ((s, dir) => fingerprint(SparkEntry.table(s, dir, "documents"))),
    "winnow_fingerprints" -> ((s, dir) => winnow(SparkEntry.table(s, dir, "documents"))),
    "top_terms" -> ((s, dir) => topTerms(SparkEntry.table(s, dir, "documents"))),
    "tfidf_keywords" -> ((s, dir) => tfidfKeywords(SparkEntry.table(s, dir, "documents"))),
    // the gate trains the reference LM on the held-out split (doc_id % 50
    // == 0, the curate_full benchmark split) and scores the crawl side —
    // the CCNet deployment shape (clean reference ranks raw crawl)
    "lm_score" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      lmScore(docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0))
    }),
    // same reference/crawl split as lm_score, one model order up
    "lm_score_bigram" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      lmScoreBigram(docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0))
    }),
    // same reference/crawl split as lm_score; thirds partition
    "perplexity_partition" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      perplexityPartition(docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0))
    }),
    "length_histogram" -> ((s, dir) =>
      lengthHistogram(SparkEntry.table(s, dir, "documents"))),
    // flattened to (doc_id, dim, v) rows for the fixture compare (the
    // multimodal_features pattern); float32 widened exactly to double
    "embed_tfidf" -> ((s, dir) => {
      val e = embedTfidf(SparkEntry.table(s, dir, "documents"), dim = 64)
      e.select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("doc_id"), col("dim"), col("v").cast("double").as("v"))
    }),
  )

  private val stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "domain_weights" ->
      """WITH rt AS (SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
        |            FROM documents WHERE lang = 'en'),
        |lex AS (SELECT w, count(*) AS cnt FROM (SELECT unnest(w) AS w FROM rt) GROUP BY w),
        |dv AS (SELECT 2 * COALESCE(sum(cnt), 0) + count(*) + 1 AS d2 FROM lex),
        |tok AS (SELECT source AS domain, unnest(
        |    list_filter(string_split(text, ' '), x -> len(x) > 0)) AS w
        |  FROM documents),
        |j AS (SELECT domain, COALESCE(lex.cnt, 0) AS cnt
        |      FROM tok LEFT JOIN lex USING (w)),
        |pd AS (SELECT domain, count(*) AS n_tokens,
        |    CAST(sum(2 * cnt + 1) AS DOUBLE) /
        |      (CAST(d2 AS DOUBLE) * CAST(count(*) AS DOUBLE))
        |      AS mean_prob
        |  FROM j, dv GROUP BY domain, d2),
        |tot AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(1.0 - mean_prob ORDER BY domain)), (a, b) -> a + b) AS t FROM pd)
        |SELECT domain, n_tokens, mean_prob, (1.0 - mean_prob) / t AS weight
        |FROM pd, tot""".stripMargin,
    "kn_counts" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
        |           FROM documents),
        |raw AS (SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(w) AS word FROM t) GROUP BY 1),
        |bg AS (SELECT DISTINCT s.prev AS prev, s.word AS word FROM (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> struct_pack(prev := w[CAST(i AS INT)],
        |                     word := w[CAST(i + 1 AS INT)]))) AS s
        |  FROM t WHERE len(w) >= 2)),
        |cont AS (SELECT word, count(*) AS n_contexts FROM bg GROUP BY word)
        |SELECT raw.word, raw.cnt, COALESCE(cont.n_contexts, 0) AS n_contexts
        |FROM raw LEFT JOIN cont ON cont.word = raw.word""".stripMargin,
    // same bigram explode; every arithmetic term mirrors the Spark
    // expression operation-for-operation (integer numerators, pinned
    // double multiply order), so prob is bit-identical
    "kn_bigram_lm" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
        |           FROM documents),
        |p AS (SELECT s.prev AS prev, s.word AS word, count(*) AS n_pw FROM (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> struct_pack(prev := w[CAST(i AS INT)],
        |                     word := w[CAST(i + 1 AS INT)]))) AS s
        |  FROM t WHERE len(w) >= 2) GROUP BY 1, 2),
        |ps AS (SELECT prev, CAST(sum(n_pw) AS BIGINT) AS c_p,
        |              count(*) AS n1p_prev FROM p GROUP BY prev),
        |ws AS (SELECT word, count(*) AS n1c_w FROM p GROUP BY word),
        |tot AS (SELECT count(*) AS n1p_all FROM p)
        |SELECT prev, word, n_pw,
        |  CAST(4 * n_pw - 3 AS DOUBLE) / CAST(4 * c_p AS DOUBLE) +
        |    (3.0 * n1p_prev * n1c_w) / (4.0 * c_p * n1p_all) AS prob
        |FROM p JOIN ps USING (prev) JOIN ws USING (word), tot""".stripMargin,
    // same windows, same integer dot/norm folds, same cosine op chain
    "semantic_boundaries" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) > 16),
        |wn AS (SELECT doc_id, list_transform(range(0, CAST(ceil(len(w) / 16.0) AS INT)),
        |         j -> w[CAST(j*16+1 AS INT) : CAST(j*16+16 AS INT)]) AS wins FROM t),
        |pr AS (SELECT doc_id, j.j AS j,
        |         wins[CAST(j.j + 1 AS INT)] AS f1, wins[CAST(j.j + 2 AS INT)] AS f2
        |       FROM wn, LATERAL unnest(range(0, len(wins) - 1)) AS j(j)),
        |m AS (SELECT doc_id, j,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_distinct(f1),
        |    x -> CAST(len(list_filter(f1, t -> t = x)) * len(list_filter(f2, t -> t = x)) AS BIGINT))),
        |    (a, b) -> a + b) AS dot,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_distinct(f1),
        |    x -> CAST(len(list_filter(f1, t -> t = x)) * len(list_filter(f1, t -> t = x)) AS BIGINT))),
        |    (a, b) -> a + b) AS n1,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_distinct(f2),
        |    x -> CAST(len(list_filter(f2, t -> t = x)) * len(list_filter(f2, t -> t = x)) AS BIGINT))),
        |    (a, b) -> a + b) AS n2
        |  FROM pr)
        |SELECT doc_id, CAST((j + 1) * 16 AS BIGINT) AS boundary_tok,
        |  CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0
        |       ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))
        |  END AS cos,
        |  CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0
        |       ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))
        |  END < 0.2 AS is_boundary
        |FROM m""".stripMargin,

    // same pair enumeration (i, i+d) d<=4, same canonical (a,b) order,
    // same integer-scaled 12/d weights
    "glove_cooc" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |p AS (
        |  SELECT least(w[i], w[i + d]) AS a, greatest(w[i], w[i + d]) AS b,
        |         12 // d AS ws
        |  FROM t,
        |    LATERAL unnest(generate_series(1, len(w) - 1)) AS u(i),
        |    LATERAL unnest(generate_series(1, least(4, len(w) - i))) AS v(d))
        |SELECT a, b, count(*) AS n_cooc, CAST(sum(ws) AS BIGINT) AS weight_scaled
        |FROM p GROUP BY a, b HAVING count(*) >= 5""".stripMargin,
    "normalize_text" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |                      '\s+', ' ', 'g')) AS norm
        |FROM documents""".stripMargin,
    "dedup_normalized" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents
        |GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |                             '\s+', ' ', 'g'))""".stripMargin,
    // CAST truncation vs rounding: DuckDB CAST(double AS BIGINT) rounds, so
    // the bucket uses floor() to mirror Spark's truncating cast
    "vocab_growth" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents),
        |f AS (SELECT term, min(doc_id) AS first_doc FROM t GROUP BY term),
        |b AS (SELECT CAST(floor(first_doc / 100.0) AS BIGINT) AS bucket,
        |             count(*) AS new_terms
        |      FROM f GROUP BY 1)
        |SELECT bucket, new_terms,
        |  CAST(sum(new_terms) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_terms
        |FROM b""".stripMargin,
    // integer sums + one division (sum cast to BIGINT: DuckDB's sum(int)
    // widens to HUGEINT, which pandas would surface as a mismatched dtype)
    "corpus_stats" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
        |    AS mean_doc_tokens
        |FROM documents GROUP BY source, lang""".stripMargin,
    "text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
         |u AS (SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  length(text) AS len_chars,
         |  len(list_filter(toks, x -> x IN ($stopList))) AS n_stop,
         |  CAST(list_sum(list_transform(toks, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_tokens
         |  FROM t)
         |SELECT doc_id, n_tokens, len_chars, n_stop, n_bpe_tokens,
         |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
         |  CAST(len_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
         |  0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) +
         |  0.3 * (CAST(n_stop AS DOUBLE) / n_tokens) +
         |  0.3 * least((CAST(len_chars - (n_tokens - 1) AS DOUBLE) / n_tokens) / 8.0, 1.0) AS quality
         |FROM u""".stripMargin,
    // the same verbatim RE2/Java-shared pretokenizer pattern; strlen =
    // UTF-8 bytes in DuckDB (octet_length's twin)
    "tokenizer_fertility" ->
      """WITH t AS (SELECT lang,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
        |    len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+')) AS p,
        |    strlen(text) AS b
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS n_words,
        |  CAST(sum(p) AS BIGINT) AS n_pretokens,
        |  CAST(sum(b) AS BIGINT) AS n_bytes,
        |  CAST(sum(p) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS pretokens_per_word,
        |  CAST(sum(b) AS DOUBLE) / CAST(sum(p) AS DOUBLE) AS bytes_per_pretoken
        |FROM t GROUP BY lang""".stripMargin,
    "lang_id" -> {
      val scoreCols = LangMarkers.map { case (lang, markers) =>
        val lst = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($lst))) AS s_$lang"
      }.mkString(",\n  ")
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
         |u AS (SELECT doc_id, text,
         |  $scoreCols
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |       WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
         |       WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
         |       WHEN s_de >= s_es THEN 'de'
         |       ELSE 'es' END AS lang_pred,
         |  s_en, s_fr, s_de, s_es
         |FROM u""".stripMargin
    },
    // the lang_id marker argmax per non-overlapping 16-token window,
    // lag() for adjacent switches, conditional sums for the dominant pivot
    "code_switch_stats" -> {
      val scoreCols = LangMarkers.map { case (lang, markers) =>
        val lst = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(win, x -> x IN ($lst))) AS s_$lang"
      }.mkString(",\n  ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, toks,
        |        CAST(floor((len(toks) + 15) / 16.0) AS INT) AS nw FROM t),
        |w AS (SELECT doc_id, nw, u.wi AS wi,
        |        toks[u.wi * 16 + 1 : u.wi * 16 + 16] AS win
        |      FROM n, LATERAL unnest(range(0, nw)) AS u(wi)),
        |s AS (SELECT doc_id, nw, wi,
        |  $scoreCols
        |  FROM w),
        |l AS (SELECT doc_id, nw, wi,
        |        CASE WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
        |             WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
        |             WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS lang
        |      FROM s),
        |g AS (SELECT doc_id, nw, wi, lang,
        |        lag(lang) OVER (PARTITION BY doc_id ORDER BY wi) AS lg
        |      FROM l),
        |a AS (SELECT doc_id, any_value(nw) AS nw,
        |        CAST(coalesce(sum(CASE WHEN lg IS NOT NULL AND lang <> lg
        |          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_switches,
        |        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_en,
        |        sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS c_fr,
        |        sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS c_de,
        |        sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS c_es
        |      FROM g GROUP BY doc_id)
        |SELECT doc_id, CAST(nw AS BIGINT) AS n_windows, n_switches,
        |  CASE WHEN c_en >= greatest(c_fr, c_de, c_es) THEN 'en'
        |       WHEN c_fr >= greatest(c_de, c_es) THEN 'fr'
        |       WHEN c_de >= c_es THEN 'de' ELSE 'es' END AS dominant_lang,
        |  CAST(greatest(c_en, c_fr, c_de, c_es) AS DOUBLE) / nw AS dominant_share
        |FROM a""".stripMargin
    },
    "doc_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (h, x) -> (h * 31 + x) % 1000000007) AS fp
        |FROM documents""".stripMargin,
    // window-by-window mirror of the winnowing selection: per (doc,
    // window-start) the arg_min of the packed (hash·2^20 − pos) key —
    // unique per position, so arg_min is deterministic — then DISTINCT
    "winnow_fingerprints" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS wds FROM documents),
        |g AS (SELECT doc_id, t.i - 1 AS pos,
        |        array_to_string(list_slice(wds, t.i, t.i + 2), ' ') AS gram,
        |        len(wds) - 2 AS m
        |      FROM d, LATERAL unnest(range(1, greatest(len(wds) - 1, 1))) AS t(i)),
        |kk AS (SELECT doc_id, pos, m,
        |         CAST(('0x' || substring(sha256(gram), 1, 8)) AS BIGINT) AS hv,
        |         CAST(('0x' || substring(sha256(gram), 1, 8)) AS BIGINT) * 1048576 - pos AS key
        |       FROM g),
        |wnd AS (SELECT doc_id, t.i AS ws
        |        FROM (SELECT DISTINCT doc_id, m FROM kk WHERE m >= 4) dm,
        |             LATERAL unnest(range(0, dm.m - 3)) AS t(i)),
        |sel AS (SELECT w.doc_id, arg_min(k.pos, k.key) AS pos
        |        FROM wnd w JOIN kk k ON k.doc_id = w.doc_id
        |          AND k.pos BETWEEN w.ws AND w.ws + 3
        |        GROUP BY w.doc_id, w.ws)
        |SELECT DISTINCT s.doc_id, CAST(s.pos AS BIGINT) AS pos, k.hv AS fp
        |FROM sel s JOIN kk k ON k.doc_id = s.doc_id AND k.pos = s.pos""".stripMargin,
    "top_terms" ->
      """SELECT term, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin,
    "tfidf_keywords" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
        |r AS (
        |  SELECT tfc.doc_id, tfc.term, CAST(tfc.tf AS DOUBLE) / dfc.df AS score,
        |    row_number() OVER (PARTITION BY tfc.doc_id
        |                       ORDER BY CAST(tfc.tf AS DOUBLE) / dfc.df DESC, tfc.term) AS rank
        |  FROM tfc JOIN dfc USING (term))
        |SELECT doc_id, term, rank, score FROM r WHERE rank <= 3""".stripMargin,

    // exact mirror of lmScore's rational arithmetic: integer numerators
    // summed exactly (DuckDB widens to HUGEINT — cast to DOUBLE only at the
    // final division, values < 2^53 so the cast is exact), one shared
    // denominator 2*total + V + 1
    "lm_score" ->
      """WITH lex AS (
        |  SELECT w, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |        WHERE doc_id % 50 = 0)
        |  WHERE w <> '' GROUP BY w),
        |t AS (SELECT CAST(2 * COALESCE(sum(cnt), 0) + count(*) + 1 AS BIGINT) AS d2 FROM lex),
        |words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |    WHERE doc_id % 50 != 0)
        |  WHERE w <> ''),
        |j AS (SELECT doc_id, COALESCE(cnt, 0) AS cnt
        |      FROM words LEFT JOIN lex USING (w))
        |SELECT doc_id,
        |  count(*) AS n_tokens,
        |  count(*) FILTER (WHERE cnt = 0) AS n_oov,
        |  CAST(sum(2 * cnt + 1) AS DOUBLE) / CAST(t.d2 * count(*) AS DOUBLE) AS mean_prob,
        |  CAST(2 * min(cnt) + 1 AS DOUBLE) / CAST(t.d2 AS DOUBLE) AS min_prob
        |FROM j, t GROUP BY doc_id, t.d2""".stripMargin,

    // lmScoreBigram's arithmetic mirrored one order up: joint aggregates are
    // exact integer sums over the shared denominator d2; the conditional
    // aggregates (min, below-threshold count) are order-independent over
    // per-row correctly-rounded divisions of exact <2^53 integers — the two
    // forms of float math that cannot diverge across engines. Parallel
    // unnests in one SELECT zip positionally in DuckDB; range(1, len) is
    // end-exclusive so i covers 1..len-1, bigram = arr[i] || arr[i+1]
    // (DuckDB lists are 1-indexed).
    "lm_score_bigram" ->
      """WITH refarr AS (
        |  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS arr
        |  FROM documents WHERE doc_id % 50 = 0),
        |lex1 AS (
        |  SELECT w, count(*) AS cnt1
        |  FROM (SELECT unnest(arr) AS w FROM refarr) GROUP BY w),
        |lex2 AS (
        |  SELECT b, count(*) AS cnt2 FROM (
        |    SELECT unnest(list_transform(range(1, len(arr)), i -> arr[i] || ' ' || arr[i + 1])) AS b
        |    FROM refarr) GROUP BY b),
        |t AS (SELECT CAST(2 * COALESCE(sum(cnt2), 0) + count(*) + 1 AS BIGINT) AS d2 FROM lex2),
        |v AS (SELECT CAST(count(*) + 1 AS BIGINT) AS v1p1 FROM lex1),
        |crawl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS arr
        |  FROM documents WHERE doc_id % 50 != 0),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(arr)), i -> arr[i])) AS w1,
        |    unnest(list_transform(range(1, len(arr)), i -> arr[i] || ' ' || arr[i + 1])) AS b
        |  FROM crawl),
        |j AS (
        |  SELECT doc_id, COALESCE(cnt2, 0) AS cnt2, COALESCE(cnt1, 0) AS cnt1
        |  FROM bg LEFT JOIN lex2 USING (b) LEFT JOIN lex1 ON bg.w1 = lex1.w)
        |SELECT doc_id,
        |  count(*) AS n_bigrams,
        |  count(*) FILTER (WHERE cnt2 = 0) AS n_bigram_oov,
        |  CAST(sum(2 * cnt2 + 1) AS DOUBLE) / CAST(t.d2 * count(*) AS DOUBLE) AS mean_prob2,
        |  CAST(2 * min(cnt2) + 1 AS DOUBLE) / CAST(t.d2 AS DOUBLE) AS min_prob2,
        |  min(CAST(2 * cnt2 + 1 AS DOUBLE) / CAST(2 * cnt1 + v.v1p1 AS DOUBLE)) AS min_cond_prob,
        |  count(*) FILTER (WHERE CAST(2 * cnt2 + 1 AS DOUBLE) / CAST(2 * cnt1 + v.v1p1 AS DOUBLE) < 1e-6)
        |    AS n_weak_cond
        |FROM j, t, v GROUP BY doc_id, t.d2, v.v1p1""".stripMargin,

    // the lm_score fragment + quantile_cont cutoffs: DuckDB's interpolation
    // ((hi−pos)·lower + (pos−lo)·upper over pos = p·(n−1)) matches Spark's
    // exact Percentile operation-for-operation, and the percentile
    // arguments ride as shortest-repr double strings — boundary-exact.
    "perplexity_partition" ->
      s"""WITH lex AS (
        |  SELECT w, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |        WHERE doc_id % 50 = 0)
        |  WHERE w <> '' GROUP BY w),
        |t AS (SELECT CAST(2 * COALESCE(sum(cnt), 0) + count(*) + 1 AS BIGINT) AS d2 FROM lex),
        |words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |    WHERE doc_id % 50 != 0)
        |  WHERE w <> ''),
        |j AS (SELECT doc_id, COALESCE(cnt, 0) AS cnt
        |      FROM words LEFT JOIN lex USING (w)),
        |sc AS (SELECT doc_id,
        |  count(*) AS n_tokens,
        |  count(*) FILTER (WHERE cnt = 0) AS n_oov,
        |  CAST(sum(2 * cnt + 1) AS DOUBLE) / CAST(t.d2 * count(*) AS DOUBLE) AS mean_prob,
        |  CAST(2 * min(cnt) + 1 AS DOUBLE) / CAST(t.d2 AS DOUBLE) AS min_prob
        |FROM j, t GROUP BY doc_id, t.d2),
        |c AS (SELECT
        |  quantile_cont(mean_prob, CAST('${1.0 - 1.0 / 3}' AS DOUBLE)) AS ch,
        |  quantile_cont(mean_prob, CAST('${1.0 / 3}' AS DOUBLE)) AS ct FROM sc)
        |SELECT sc.*, CASE WHEN mean_prob >= ch THEN 'head'
        |                  WHEN mean_prob < ct THEN 'tail'
        |                  ELSE 'middle' END AS bucket
        |FROM sc, c""".stripMargin,

    // integer bucket from the binary-string length (no float log2); counts
    // map-side combined, HUGEINT sums pinned back to BIGINT
    "length_histogram" ->
      """WITH n AS (SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |b AS (SELECT source, CAST(length(bin(n)) - 1 AS INT) AS bucket, n FROM n)
        |SELECT source, bucket,
        |  CAST(1 AS BIGINT) << bucket AS lo_tokens,
        |  (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi_tokens,
        |  count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM b GROUP BY source, bucket""".stripMargin,

    // TF-IDF embedding vs the committed independent-Python fixture
    // (tools/gen_embed_fixture.py), corpus-tagged like the dedup fixtures
    "embed_tfidf" ->
      s"""SELECT doc_id, CAST(dim AS INT) AS dim, CAST(v AS DOUBLE) AS v
        |FROM read_parquet('${Dedup.fixturesDir}/embed_tfidf.parquet')
        |WHERE corpus = ${Dedup.corpusTag}""".stripMargin,
  )
}
