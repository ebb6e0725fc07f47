package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import graft.SparkEntry

/** Web-corpus hygiene: the extraction/normalization stages that sit between
  * a raw crawl and every operator downstream of it (dedup, quality scoring,
  * tokenization). All four are narrow scan-time transforms or one-shuffle
  * jobs — the shapes that survive a 100 TB crawl unchanged:
  *
  *  - [[htmlStrip]] — tag/script/style removal + entity decode (the
  *    text-extraction step every CommonCrawl pipeline runs first);
  *  - [[nfcNormalize]] — NFC Unicode normalization (composed vs decomposed
  *    forms hash differently; normalize BEFORE any dedup/shingle hash);
  *  - [[boilerplateLines]] — line-level boilerplate removal (CCNet
  *    §"deduplication", Wenzek et al. 2020: drop lines shared by many
  *    documents of the same domain — headers, footers, nav, cookie
  *    banners — the highest-yield cleaning step on web text);
  *  - [[urlCanonicalize]]/[[dedupByUrl]] — URL canonicalization and
  *    URL-level dedup (the cheapest dedup signal a crawl has: the same
  *    page fetched via tracking-tagged links differs only in its URL
  *    decoration).
  */
object Web {
  private type Q = (SparkSession, String) => DataFrame

  /** NFC-normalize a string column ([[graft.functions.NfcNormalize]] — a
    * codegen'd native expression, zero-allocation on already-normalized
    * input). */
  def nfcNormalize(c: Column): Column =
    bridge.column(graft.functions.NfcNormalize(bridge.expression(c)))

  /** Plain text from an HTML document: drop `<script>`/`<style>` blocks
    * (their CONTENT is code, not prose), strip remaining tags, decode the
    * six ubiquitous entities (after tag-stripping, so literal `&lt;tag&gt;`
    * text cannot be re-interpreted as markup), collapse whitespace.
    *
    * Regex-based by design: a conforming HTML5 parser is not expressible
    * as engine-portable columnar ops, and for corpus EXTRACTION (not
    * rendering) the regex form is the published norm (C4/CCNet both strip
    * with patterns). Narrow, codegen'd, shuffle-free. */
  def htmlStrip(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** CCNet-style line-level boilerplate removal: a line that appears in
    * ≥ `minDocs` distinct documents of the SAME `domain` is boilerplate
    * (site chrome — headers, footers, nav, legal banners) and is removed
    * from every document that carries it. Returns one row per input
    * document: kept-line text (original order) + removal accounting.
    *
    * Shape at 100 TB: explode is narrow; the heavy-line table is ONE
    * partial-agged groupBy on (domain, line) — partial aggregation
    * collapses each task's repeats of a chrome line before the shuffle,
    * so the exchange carries ~distinct lines, not corpus lines — and the
    * anti-join shuffles on the same key. Reassembly is one groupBy(doc)
    * with an ordered fold (`array_sort(collect_list(struct(pos, line)))`,
    * the deterministic-fold posture). Keys here are the line STRINGS so
    * the DuckDB oracle can mirror the join exactly; a production corpus
    * would key both sides on `xxhash64(domain, line)` (8-byte exchange
    * keys, the [[Dedup]] hashKeys posture) with identical semantics minus
    * the 2⁻⁶⁴ collision band. */
  def boilerplateLines(df: DataFrame, docId: Column, domain: Column,
                       lines: Column, minDocs: Long): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would remove every line")
    val ex = df.select(docId.as("doc_id"), domain.as("__dom"),
      posexplode(lines).as(Seq("__pos", "__line")))
    val heavy = ex.groupBy(col("__dom"), col("__line"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__dom"), col("__line"))
    val keptAgg = ex.join(heavy, Seq("__dom", "__line"), "left_anti")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")), "\n").as("clean_text"))
    // left join from the full document list: a document whose EVERY line
    // was boilerplate must still appear (n_kept = 0, empty text) — row
    // parity with the input, the Dedup text_clean convention
    df.select(docId.as("doc_id"), size(lines).cast("long").as("n_lines"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Canonical form of a URL: lowercase scheme + host, strip a leading
    * `www.`, strip the scheme's default port, strip the fragment, drop
    * tracking parameters (`utm_*`, `ref`, `fbclid`, `gclid`), sort the
    * surviving query parameters, strip trailing path slashes. Two fetches
    * of one page through differently-decorated links canonicalize to the
    * same string — the key [[dedupByUrl]] groups on.
    *
    * Pure string/regex ops, codegen'd, narrow. Path case is preserved
    * (paths are case-sensitive per RFC 3986; only scheme and host are
    * case-insensitive). */
  def urlCanonicalize(url: Column): Column = {
    val u0 = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u0, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val h0 = regexp_replace(
      lower(regexp_extract(u0, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(h0, ":443$", ""))
      .when(scheme === "http", regexp_replace(h0, ":80$", ""))
      .otherwise(h0)
    val path = regexp_replace(
      regexp_extract(u0, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val q = regexp_extract(u0, "\\?([^#]*)", 1)
    val params = filter(split(q, "&"), p =>
      (p =!= "") && not(p.startsWith("utm_") || p.startsWith("ref=") ||
        p.startsWith("fbclid=") || p.startsWith("gclid=")))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** URL-level dedup: one row per canonical URL with the smallest doc_id
    * as the deterministic representative and the duplicate count. ONE
    * shuffle on the canonical string. */
  def dedupByUrl(df: DataFrame, docId: Column, url: Column): DataFrame =
    df.select(docId.as("doc_id"), urlCanonicalize(url).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))

  // ---- driver gates -----------------------------------------------------
  // The documents table is single-line prose, so each gate CONSTRUCTS its
  // web-shaped input deterministically from the row (same expression
  // mirrored in the oracle): an HTML page, a decomposed-Unicode suffix, a
  // paged line list with per-source chrome, a tracking-decorated URL.

  /** Per-source chrome (header + footer) around the text split into 8-word
    * lines — every doc of a source shares its chrome, nothing else. */
  /** Encoding-damage (mojibake) audit: per-document counts of the classic
    * UTF-8-decoded-as-cp1252 artifacts — mis-decoded accented letters
    * ("A-tilde + copyright" where "e-acute" was meant), smart-quote
    * wrecks, double-encoded NBSP damage, and the U+FFFD replacement
    * character a lossy transcode leaves behind. A crawl slice with a high
    * mojibake rate was fetched or stored with the wrong charset and
    * should be RE-EXTRACTED, not cleaned token-by-token (detection is
    * cheap and certain; repair is neither). Narrow, scan-time; patterns
    * are literal alternations (no classes/ranges), so Java regex and RE2
    * match byte-identically. All artifact strings are built from \\u
    * escapes — the source file stays ASCII and cannot itself be
    * mojibake'd by an editor. */
  private[ext] val MojiAccents =
    "Ã©|Ã¨|Ã¤|Ã¶|Ã¼|Ã±"
  private[ext] val MojiPunct =
    "â€™|â€œ|â€“"
  private[ext] val MojiNbsp = "Â "
  private[ext] val MojiRepl = "�"

  def mojibakeStats(df: DataFrame, textCol: Column): DataFrame =
    df.select(col("doc_id"),
      size(regexp_extract_all(textCol, lit(MojiAccents), lit(0))).cast("long")
        .as("n_accents"),
      size(regexp_extract_all(textCol, lit(MojiPunct), lit(0))).cast("long")
        .as("n_punct"),
      size(regexp_extract_all(textCol, lit(MojiNbsp), lit(0))).cast("long")
        .as("n_nbsp"),
      size(regexp_extract_all(textCol, lit(MojiRepl), lit(0))).cast("long")
        .as("n_replacement"))
      .withColumn("clean",
        col("n_accents") + col("n_punct") + col("n_nbsp") +
          col("n_replacement") === 0L)

  /** The synthetic corpus is clean, so the gate injects deterministic
    * damage (the piiAugmented precedent): every 13th document gains one
    * artifact of each class. */
  private[ext] val MojiInjectSuffix =
    " cafÃ© donâ€™t thisÂ and � end"
  private[ext] def mojibakeAugmented: Column =
    when(col("doc_id") % 13 === 0, concat(col("text"), lit(MojiInjectSuffix)))
      .otherwise(col("text"))

  private[ext] def gatePages(s: SparkSession, dir: String): DataFrame = {
    val docs = SparkEntry.table(s, dir, "documents")
    val ws = split(col("text"), " ")
    val nl = floor((size(ws) - lit(1)) / lit(8)).cast("int")
    docs.withColumn("lines",
      concat(
        array(concat(lit("HEADER "), col("source"))),
        transform(sequence(lit(0), nl),
          i => array_join(slice(ws, i * 8 + 1, lit(8)), " ")),
        array(concat(lit("(c) 2026 "), col("source")))))
  }

  private def gateHtml: Column = concat(
    lit("<html><head><title>"), col("source"),
    lit("</title><style>body{color:red}</style></head><body><h1>"),
    col("source"), lit("</h1><p>"),
    replace(col("text"), lit(" merge "), lit(" <b>merge</b> ")),
    lit("</p><script>var x=1 && y<2;</script>"),
    lit("<div class=\"nav\">Home &amp; &lt;Search&gt;</div></body></html>"))

  private def gateUrl: Column = concat(
    lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM:443/Articles/"),
    (col("doc_id") % 40).cast("string"), lit("/"),
    lit("?utm_source=feed&ref=rss&page="), (col("doc_id") % 2).cast("string"),
    lit("&b=2&a=1#frag"), (col("doc_id") % 5).cast("string"))

  val queries: Map[String, Q] = Map(
    // injected encoding damage on every 13th doc; the audit must count
    // each artifact class and flag exactly those docs
    "mojibake_stats" -> ((s, dir) =>
      mojibakeStats(SparkEntry.table(s, dir, "documents"), mojibakeAugmented)),
    "html_strip" -> ((s, dir) =>
      SparkEntry.table(s, dir, "documents")
        .withColumn("clean", htmlStrip(gateHtml))
        .select(col("doc_id"), col("clean"),
          length(col("clean")).cast("long").as("n_chars_clean"))),
    // decomposed suffix (e+U+0301, u+U+0308) appended to every doc; NFC
    // must compose it and leave the ASCII body untouched
    "unicode_nfc" -> ((s, dir) =>
      SparkEntry.table(s, dir, "documents")
        .withColumn("raw", concat(col("text"), lit(" cafe\u0301 u\u0308ber")))
        .withColumn("norm", nfcNormalize(col("raw")))
        .select(col("doc_id"), col("norm"),
          (col("norm") =!= col("raw")).as("changed"),
          length(col("raw")).cast("long").as("n_before"),
          length(col("norm")).cast("long").as("n_after"))),
    // every source's 25-ish docs share the constructed header/footer →
    // both removed from every doc; no 8-word prose chunk recurs 3× within
    // a source
    "boilerplate_lines" -> ((s, dir) =>
      boilerplateLines(gatePages(s, dir), col("doc_id"), col("source"),
        col("lines"), minDocs = 3L)),
    "url_canonical" -> ((s, dir) =>
      SparkEntry.table(s, dir, "documents")
        .withColumn("url", gateUrl)
        .select(col("doc_id"), col("url"),
          urlCanonicalize(col("url")).as("canonical_url"))),
    "dedup_url" -> ((s, dir) =>
      dedupByUrl(SparkEntry.table(s, dir, "documents")
        .withColumn("url", gateUrl), col("doc_id"), col("url"))),
  )

  private val OracleUrl: String =
    """SELECT doc_id,
      |    'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Articles/' ||
      |    (doc_id % 40) || '/?utm_source=feed&ref=rss&page=' || (doc_id % 2) ||
      |    '&b=2&a=1#frag' || (doc_id % 5) AS url
      |  FROM documents""".stripMargin

  private val OracleCanonical: String =
    """s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u0 FROM u),
      |s2 AS (SELECT *,
      |    lower(regexp_extract(u0, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(lower(regexp_extract(u0,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\.', '') AS h0,
      |    regexp_replace(regexp_extract(u0,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
      |    regexp_extract(u0, '\?([^#]*)', 1) AS q FROM s1),
      |s3 AS (SELECT *,
      |    CASE WHEN scheme = 'https' THEN regexp_replace(h0, ':443$', '')
      |         WHEN scheme = 'http' THEN regexp_replace(h0, ':80$', '')
      |         ELSE h0 END AS host,
      |    array_to_string(list_sort(list_filter(string_split(q, '&'),
      |      p -> p <> '' AND NOT (p LIKE 'utm\_%' ESCAPE '\' OR p LIKE 'ref=%'
      |        OR p LIKE 'fbclid=%' OR p LIKE 'gclid=%'))), '&') AS q2
      |  FROM s2),
      |c AS (SELECT doc_id, url,
      |    scheme || '://' || host || path ||
      |    CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canonical_url
      |  FROM s3)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // interpolated from the SAME Scala constants as the engine patterns
    // and injection — the two sides cannot drift
    "mojibake_stats" ->
      s"""WITH a AS (SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0 THEN text || '$MojiInjectSuffix'
        |       ELSE text END AS aug
        | FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '$MojiAccents')) AS BIGINT) AS n_accents,
        |  CAST(len(regexp_extract_all(aug, '$MojiPunct')) AS BIGINT) AS n_punct,
        |  CAST(len(regexp_extract_all(aug, '$MojiNbsp')) AS BIGINT) AS n_nbsp,
        |  CAST(len(regexp_extract_all(aug, '$MojiRepl')) AS BIGINT) AS n_replacement,
        |  len(regexp_extract_all(aug, '$MojiAccents'))
        |    + len(regexp_extract_all(aug, '$MojiPunct'))
        |    + len(regexp_extract_all(aug, '$MojiNbsp'))
        |    + len(regexp_extract_all(aug, '$MojiRepl')) = 0 AS clean
        |FROM a""".stripMargin,
    "html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>' || source ||
        |    '</title><style>body{color:red}</style></head><body><h1>' || source ||
        |    '</h1><p>' || replace(text, ' merge ', ' <b>merge</b> ') ||
        |    '</p><script>var x=1 && y<2;</script>' ||
        |    '<div class="nav">Home &amp; &lt;Search&gt;</div></body></html>' AS page
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(page,
        |          '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS n_chars_clean
        |FROM s""".stripMargin,
    "unicode_nfc" ->
      """WITH r AS (
        |  SELECT doc_id, text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber' AS raw
        |  FROM documents),
        |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM r)
        |SELECT doc_id, norm, norm <> raw AS changed,
        |  CAST(length(raw) AS BIGINT) AS n_before,
        |  CAST(length(norm) AS BIGINT) AS n_after
        |FROM n""".stripMargin,
    "boilerplate_lines" ->
      """WITH pg AS (
        |  SELECT doc_id, source,
        |    list_concat(list_concat(
        |      ['HEADER ' || source],
        |      list_transform(range(0, (len(string_split(text, ' ')) - 1) // 8 + 1),
        |        i -> array_to_string(string_split(text, ' ')[i*8+1 : i*8+8], ' '))),
        |      ['(c) 2026 ' || source]) AS lines
        |  FROM documents),
        |ex AS (
        |  SELECT doc_id, source, generate_subscripts(lines, 1) - 1 AS pos,
        |    unnest(lines) AS line
        |  FROM pg),
        |heavy AS (
        |  SELECT source, line FROM ex
        |  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 3),
        |kept AS (
        |  SELECT ex.doc_id, ex.pos, ex.line FROM ex
        |  LEFT JOIN heavy ON ex.source = heavy.source AND ex.line = heavy.line
        |  WHERE heavy.line IS NULL),
        |ka AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT pg.doc_id, CAST(len(pg.lines) AS BIGINT) AS n_lines,
        |  CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(pg.lines) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(ka.clean_text, '') AS clean_text
        |FROM pg LEFT JOIN ka ON pg.doc_id = ka.doc_id""".stripMargin,
    "url_canonical" ->
      s"""WITH u AS ($OracleUrl),
         |$OracleCanonical
         |SELECT doc_id, url, canonical_url FROM c""".stripMargin,
    "dedup_url" ->
      s"""WITH u AS ($OracleUrl),
         |$OracleCanonical
         |SELECT canonical_url, min(doc_id) AS doc_id, count(*) AS n_dups
         |FROM c GROUP BY canonical_url""".stripMargin,
  )
}
