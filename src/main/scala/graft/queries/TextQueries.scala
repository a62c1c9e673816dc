package graft.queries

import graft.Tables
import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis pack (north-star): token counting, language ID, quality
  * scoring, fingerprinting over the `documents` table. Oracles are
  * generated from the same Scala constants (marker lists, weights) the
  * Spark implementation uses, so the two can't drift.
  */
object TextQueries extends QueryPack {
  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  // q24 — token counts + ratios + quality score per document.
  private def q24(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"),
        round(TextAnalysis.punctRatio(col("text")), 9).as("punct_ratio"),
        round(TextAnalysis.meanTokenLength(col("text")), 9).as("mean_tok_len"),
        round(TextAnalysis.stopwordRatio(col("text")), 9).as("stop_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id").asc_nulls_first)
  // The oracle mirrors Spark's empty-doc semantics exactly: tokens filter
  // out empty strings (DuckDB string_split_regex('') yields ['']) and every
  // division is guarded the same way the Spark side guards it (→ 0.0), so
  // parity holds for empty/whitespace-only docs, not just the fixtures.
  /** DuckDB expression for TextAnalysis.qualityScore over (text, token
    * list, char length) aliases — shared by q24/q60. */
  private def qualitySql(text: String, t: String, len: String): String = s"""
           ROUND((LEAST(CAST(len($t) AS DOUBLE) / 32.0, 1.0) * 0.3)
               + ((1.0 - CASE WHEN $len > 0
                              THEN CAST($len - LENGTH(regexp_replace($text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / $len
                              ELSE 0.0 END) * 0.3)
               + (CASE WHEN len($t) > 0
                       THEN CAST(len(list_filter($t, x -> regexp_full_match(x, '[A-Za-z]+'))) AS DOUBLE) / len($t)
                       ELSE 0.0 END * 0.4), 9)"""

  private val q24Sql = {
    val stop = sqlList(TextAnalysis.langMarkers.flatMap(_._2).distinct)
    s"""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t,
             LENGTH(text) AS len
      FROM documents)
    SELECT doc_id,
           CAST(len(t) AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpeish,
           CASE WHEN len > 0
                THEN ROUND(CAST(len - LENGTH(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / len, 9)
                ELSE 0.0 END AS punct_ratio,
           CASE WHEN len(t) > 0
                THEN ROUND(CAST(LENGTH(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(t), 9)
                ELSE 0.0 END AS mean_tok_len,
           CASE WHEN len(t) > 0
                THEN ROUND(CAST(len(list_filter(t, x -> list_contains($stop, x))) AS DOUBLE) / len(t), 9)
                ELSE 0.0 END AS stop_ratio,
           ${qualitySql("text", "t", "len")} AS quality
    FROM toks ORDER BY doc_id ASC NULLS FIRST"""
  }

  /** DuckDB expression for TextAnalysis.langId's argmax over marker scores,
    * parametrized on the token-list alias — shared by q25/q60 so the two
    * oracles can't drift. */
  private def langPredSql(t: String): String = {
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      val terms = ms.map(m => s"CAST(list_contains($t, '$m') AS INT)").mkString(" + ")
      lang -> s"($terms)"
    }
    val best = s"GREATEST(${scores.map(_._2).mkString(", ")})"
    val cases = scores
      .map { case (lang, sc) => s"WHEN $sc = $best AND $sc > 0 THEN '$lang'" }
      .mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  // q25 — language-ID confusion matrix: heuristic marker-score argmax vs
  // the generator's `lang` label.
  private def q25(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang").asc_nulls_first, col("lang_pred").asc_nulls_first)
  private val q25Sql = s"""
    WITH toks AS (
      SELECT lang,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    pred AS (
      SELECT lang, ${langPredSql("t")} AS lang_pred FROM toks)
    SELECT lang, lang_pred, COUNT(*) AS n FROM pred
    GROUP BY 1, 2 ORDER BY lang ASC NULLS FIRST, lang_pred ASC NULLS FIRST"""

  // q26 — order-sensitive rolling-hash fingerprint, the PORTABLE variant:
  // per-token Horner over code points, then Horner over token hashes —
  // pure modular arithmetic DuckDB reproduces bit-for-bit, so this gets a
  // full hash-match oracle. The xxhash64 fast path (TextAnalysis
  // .fingerprint, the one to use at 100 TB) stays covered by the OpsSpec
  // order-sensitivity invariant — xxhash64 itself has no DuckDB spelling.
  /** DuckDB expression for TextAnalysis.fingerprintPortable over a
    * token-list alias — shared by q26/q60. */
  private[queries] def fpSql(t: String): String = s"""
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform($t, tok ->
                 list_reduce(
                   list_prepend(CAST(7 AS BIGINT),
                     list_transform(range(1, len(tok) + 1),
                       i -> CAST(ascii(tok[i]) AS BIGINT))),
                   (a, c) -> (a * 131 + c) % 1000000007))),
             (a, h) -> (a * 31 + h) % 1000000007)"""

  private def q26(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.fingerprintPortable(col("text")).as("fp"))
      .orderBy(col("doc_id").asc_nulls_first)
  private val q26Sql = s"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents)
    SELECT doc_id, ${fpSql("t")} AS fp
    FROM toks ORDER BY doc_id ASC NULLS FIRST"""

  // q60 — the FLAGSHIP training-data curation pipeline, declared as ONE
  // config: score (quality, lang-ID, token count, content fingerprint in
  // the scan stage via registered functions) → filter (quality, language,
  // length) → exact content dedup (min-doc_id winner per fingerprint) →
  // deterministic content-derived sample (fp % 10 < 8 — replay-stable,
  // DuckDB-reproducible, unlike rand()) → per-language corpus stats.
  // The sample filter commutes with the dedup (both are functions of fp),
  // so it rides in `filters` ahead of the dedup shuffle. Every stage is
  // the scale-safe shape: scan-stage scoring, one dedup aggregate, one
  // stats aggregate. Oracle rebuilds the pipeline from the SAME shared
  // SQL generators as q24/q25/q26 — hash-checked end to end.
  private def q60(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"n_tok": "token_count(text)",
                  "quality": "quality_score(text)",
                  "lang_pred": "lang_id(text)",
                  "fp": "doc_fingerprint_portable(text)"},
       "filters": ["quality > 0.5", "lang_pred != 'und'", "n_tok >= 5",
                   "pmod(fp, 10) < 8"],
       "dedup": {"keys": ["fp"], "id_col": "doc_id"},
       "aggregate": {"group_by": ["lang"],
         "aggregations": [
           {"col": "*", "func": "count", "new_name": "n_docs"},
           {"col": "n_tok", "func": "sum", "new_name": "total_tokens"},
           {"col": "quality", "func": "davg", "new_name": "avg_quality"}]},
       "with_columns": {"avg_quality": "round(avg_quality, 9)"},
       "order_by": ["lang asc"]}""")
  private val q60Sql = s"""
    WITH toks AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t,
             LENGTH(text) AS len
      FROM documents),
    feat AS (
      SELECT doc_id, lang,
             CAST(len(t) AS INT) AS n_tok,
             ${qualitySql("text", "t", "len")} AS quality,
             ${langPredSql("t")} AS lang_pred,
             ${fpSql("t")} AS fp
      FROM toks),
    kept AS (
      SELECT * FROM feat
      WHERE quality > 0.5 AND lang_pred <> 'und' AND n_tok >= 5
        AND fp % 10 < 8),
    deduped AS (
      SELECT * FROM kept
      QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           ROUND(${graft.Tables.davgSql("quality")}, 9) AS avg_quality
    FROM deduped GROUP BY 1 ORDER BY lang ASC NULLS FIRST"""

  // q67 — corpus term statistics (the vocabulary-build shape): top-20
  // tokens by document frequency with total occurrences. Exact oracle —
  // tokenization parity with DuckDB is already pinned by q24/q25/q26's
  // shared split spelling.
  private def q67(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.termStats(docs(s, dir), "doc_id", "text")
      .orderBy(col("df").desc_nulls_last, col("tf").desc_nulls_last,
        col("token").asc_nulls_first)
      .limit(20)
  private val q67Sql = """
    WITH ex AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS token
      FROM documents)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM ex GROUP BY 1
    ORDER BY df DESC NULLS LAST, tf DESC NULLS LAST, token ASC NULLS FIRST
    LIMIT 20"""

  // q68 — per-document tf-idf top-3 characteristic tokens. The ln() is
  // the one transcendental in the oracle surface: both engines compute
  // IEEE double log (verified hash-equal at every SF — a ½-ulp libm
  // divergence would need a value within 1e-16 of a 9-dp rounding
  // boundary to flip the hash).
  // maxDfRatio 0.9 (not the 0.5 default): the synthetic corpus draws from
  // a ~31-token vocabulary where almost every token hits >half the docs —
  // 0.9 keeps 30/31 tokens so every document scores, while still proving
  // the stop-token prune (the one ubiquitous token is dropped).
  private def q68(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(docs(s, dir), "doc_id", "text", k = 3, maxDfRatio = 0.9)
      .select("doc_id", "token", "tfidf", "rank")
      .orderBy(col("doc_id").asc_nulls_first, col("rank").asc_nulls_first)
  private val q68Sql = """
    WITH N AS (SELECT COUNT(*) AS n FROM documents),
    ex AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS token
      FROM documents),
    dt AS (SELECT doc_id, token, COUNT(*) AS tf_doc FROM ex GROUP BY 1, 2),
    dft AS (SELECT token, COUNT(DISTINCT doc_id) AS dfc FROM ex GROUP BY 1),
    vocab AS (
      SELECT token, ln(CAST(n AS DOUBLE) / dfc) AS idf
      FROM dft, N WHERE dfc <= n * 0.9),
    scored AS (
      SELECT doc_id, token, ROUND(tf_doc * idf, 9) AS tfidf
      FROM dt JOIN vocab USING (token)),
    ranked AS (
      SELECT doc_id, token, tfidf,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, token ASC) AS INT) AS rank
      FROM scored)
    SELECT doc_id, token, tfidf, rank FROM ranked WHERE rank <= 3
    ORDER BY doc_id ASC NULLS FIRST, rank ASC NULLS FIRST"""

  // q106 — corpus-LM perplexity (CCNet-style quality signal): bigram LM
  // trained on the corpus itself (add-0.5 smoothing), each doc scored by
  // mean negative log-prob. Pure count arithmetic + ln (the q68
  // precedent) with per-occurrence 6-dp rounding before the decimal-exact
  // sum → exact oracle.
  private def q106(s: SparkSession, dir: String): DataFrame =
    graft.ops.Corpus.lmPerplexity(docs(s, dir), "doc_id", "text", k = 0.5)
      .orderBy(col("doc_id").asc_nulls_first)
  private val q106Sql = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS t
      FROM documents),
    bg AS (
      SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                             for i in generate_series(1, len(t)-1)]) AS bg
      FROM toks WHERE len(t) >= 2),
    c12 AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY 1),
    c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v
          FROM (SELECT unnest(t) AS w FROM toks)),
    lp AS (
      SELECT doc_id,
             ROUND(LN((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)), 6) AS lp
      FROM bg
      JOIN c12 USING (bg)
      JOIN c1 ON split_part(bg.bg, ' ', 1) = c1.w1
      CROSS JOIN v)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(-(CAST(SUM(CAST(lp AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)), 6) AS nll
    FROM lp GROUP BY 1
    ORDER BY doc_id ASC NULLS FIRST"""

  // q108 — the LM score from PURE JSON, feeding downstream node keys: the
  // `lm_perplexity` key scores the corpus, then order_by + limit keep the
  // 50 least predictable documents (the "probably gibberish" review
  // queue). Same count-arithmetic oracle as q106 with the ranking applied.
  private def q108(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "lm_perplexity": {"id_col": "doc_id", "text_col": "text"},
       "order_by": ["nll desc", "doc_id asc"],
       "limit": 50}""")
  private val q108Sql = q106Sql.replace(
    "ORDER BY doc_id ASC NULLS FIRST",
    "ORDER BY nll DESC, doc_id ASC NULLS FIRST LIMIT 50")

  // q118 — keep_unscored=true over a corpus with PLANTED unscorable docs
  // (one single-token, one empty): they must come out with n_bigrams = 0
  // and NULL nll instead of silently vanishing — the round-7 advice item
  // (a curation cascade filtering on nll was dropping them implicitly).
  // The oracle mirrors the union source and LEFT JOINs the same
  // count-arithmetic scores; note the planted "solo" token ALSO grows the
  // corpus vocabulary V, so every nll shifts vs q106 — both engines
  // recompute identically.
  private def q118(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = Seq((9000001L, "solo"), (9000002L, "")).toDF("doc_id", "text")
    graft.ops.Corpus.lmPerplexity(
        docs(s, dir).select("doc_id", "text").unionByName(planted),
        "doc_id", "text", k = 0.5, keepUnscored = true)
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q118Sql = """
    WITH src AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT * FROM (VALUES (9000001, 'solo'), (9000002, ''))),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS t
      FROM src),
    bg AS (
      SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                             for i in generate_series(1, len(t)-1)]) AS bg
      FROM toks WHERE len(t) >= 2),
    c12 AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY 1),
    c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v
          FROM (SELECT unnest(t) AS w FROM toks)),
    lp AS (
      SELECT doc_id,
             ROUND(LN((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)), 6) AS lp
      FROM bg
      JOIN c12 USING (bg)
      JOIN c1 ON split_part(bg.bg, ' ', 1) = c1.w1
      CROSS JOIN v),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             ROUND(-(CAST(SUM(CAST(lp AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)), 6) AS nll
      FROM lp GROUP BY 1)
    SELECT src.doc_id, COALESCE(scored.n_bigrams, 0) AS n_bigrams, scored.nll
    FROM src LEFT JOIN scored ON src.doc_id = scored.doc_id
    ORDER BY src.doc_id ASC NULLS FIRST"""

  // q128 — URL canonicalization + dedup-by-URL from PURE JSON: every doc
  // gets a messy crawl URL (uppercase scheme/host, default port, trailing
  // slash, unsorted params, tracking params, fragment) derived from its
  // fields; `canonical_url` (the registered native kernel) normalizes it
  // and the exact-dedup key keeps one doc per canonical URL — the
  // standard first pass of web-corpus dedup. The oracle derives the
  // canonical form INDEPENDENTLY: the rules applied by hand to the same
  // template (host lowercased, :80 stripped, slash/fragment dropped,
  // tracking params removed, a= sorted before z=), then the same
  // min-doc_id dedup.
  private def q128(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {
         "url": "concat('HTTP://News.Example.COM:80/', source, '/item/', cast(doc_id % 40 as string), '/?utm_source=feed&z=9&a=', cast(doc_id % 3 as string), '&fbclid=track#sec')",
         "curl": "canonical_url(url)"},
       "dedup": {"keys": ["curl"], "id_col": "doc_id"},
       "keep_columns": ["doc_id", "curl"],
       "order_by": ["doc_id asc"]}""")
  }
  private val q128Sql = """
    WITH c AS (
      SELECT doc_id,
             'http://news.example.com/' || source || '/item/' ||
             CAST(doc_id % 40 AS VARCHAR) || '?a=' ||
             CAST(doc_id % 3 AS VARCHAR) || '&z=9' AS curl
      FROM documents),
    d AS (SELECT curl, MIN(doc_id) AS doc_id FROM c GROUP BY 1)
    SELECT doc_id, curl FROM d ORDER BY doc_id ASC NULLS FIRST"""

  // q111 — canonical text normalization (native NormalizeText kernel):
  // NFC composition, ROOT lowercase, control→space, space-run collapse,
  // trim — the pre-fingerprint step of every dedup pipeline. The derive
  // plants DECOMPOSED accents (E+U+0301, I/U+U+0308 — NFC must compose
  // them), uppercase, a tab and ragged padding around each document so
  // the unicode paths run on corpus data; the oracle rebuilds the
  // identical bytes (shared constants below) and normalizes with
  // DuckDB's nfc_normalize — both engines implement UAX #15. The
  // fingerprint of the normalized text proves normalize→hash composes
  // cross-engine.
  private val messyPrefix = "  CAFE\u0301\tNAI\u0308VE  " // decomposed accents + tab
  private val messySuffix = "   U\u0308BER"
  private def q111(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.registerAll(s)
    // a raw TAB is illegal inside a JSON string \u2014 escape it for the config
    // side; the SQL oracle embeds the constant directly (legal in SQL)
    val jsonPrefix = messyPrefix.replace("\t", "\\t")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "derive": {
         "messy": "concat('$jsonPrefix', text, '$messySuffix')",
         "norm": "normalize_text(messy)",
         "fp": "doc_fingerprint_portable(norm)",
         "n_norm": "length(norm)"},
       "keep_columns": ["doc_id", "norm", "fp", "n_norm"],
       "order_by": ["doc_id asc"]}""")
      .select("doc_id", "norm", "fp", "n_norm")
  }
  private val q111Sql = s"""
    WITH m AS (
      SELECT doc_id, '$messyPrefix' || text || '$messySuffix' AS messy
      FROM documents),
    n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(nfc_normalize(messy)),
                    '[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g'), ' ') AS norm
      FROM m),
    toks AS (
      SELECT doc_id, norm,
             list_filter(string_split_regex(trim(norm), '\\s+'), x -> len(x) > 0) AS t
      FROM n)
    SELECT doc_id, norm, ${fpSql("t")} AS fp,
           CAST(LENGTH(norm) AS INT) AS n_norm
    FROM toks ORDER BY doc_id ASC NULLS FIRST"""

  // q144/q145 — HTML text extraction: each document is wrapped in a
  // deterministic page template (title with an entity, style block,
  // comment HIDING a link, single-quoted/entity-bearing attributes, a
  // script whose content contains `<`, `&&` and a fake `</p>` close),
  // so extraction output is exact arithmetic on the original text: the
  // template is known, the corpus is markup-free (asserted at build
  // time: no '<'/'&'/'>' at any SF), and the kernel's whitespace
  // normalization mirrors as the q72-style tokenize-and-rejoin. The
  // SAME expr string builds the html column on both the API path (q144)
  // and the PURE-JSON derive (q145) — the paths cannot drift.
  private val htmlExpr: String =
    "concat('<html><head><title>Doc ', doc_id, ' &amp; friends</title>" +
      "<style>p { color: red; }</style></head><body>" +
      "<!-- nav <a href=''http://skip.me''>x</a> -->" +
      "<h1 class=''hd''>Doc ', doc_id, '</h1><p>', text, " +
      "'</p><script>if (a<b && c>d) { x</p>y = 1; }</script>" +
      "<a href=''https://ex.com/doc/', doc_id, '?a=1&amp;b=2''>link text</a>" +
      " &#72;i&#x21;</body></html>')"
  private def q144(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.htmlExtract(
        docs(s, dir).withColumn("html", expr(htmlExpr)), "doc_id", "html")
      .select(col("doc_id"), col("title"), col("body_text"),
        element_at(col("links"), 1).as("href"), size(col("links")).as("n_links"))
      .orderBy(col("doc_id").asc_nulls_first)
  private val q144Sql = """
    SELECT doc_id,
           'Doc ' || doc_id || ' & friends' AS title,
           coalesce(array_to_string(list_filter(string_split_regex(
             'Doc ' || doc_id || ' ' || text || ' link text Hi!', '\s+'),
             x -> len(x) > 0), ' '), '') AS body_text,
           'https://ex.com/doc/' || doc_id || '?a=1&b=2' AS href,
           CAST(1 AS INT) AS n_links
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""
  private def q145(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "derive": {"html": "$htmlExpr"},
       "html_extract": {"id_col": "doc_id", "html_col": "html"},
       "with_columns": {"href": "element_at(links, 1)",
                        "n_links": "size(links)"},
       "drop": ["links"],
       "order_by": ["doc_id asc"]}""")
  }

  // q146 — the crawl-to-clean-text path, end to end: each doc becomes a
  // two-record WARC file (a response wrapping a page template + a
  // request record the pipeline must skip), parsed by the container
  // kernel, filtered by record type, and the response payload extracted
  // by the HTML kernel. Every output is exact arithmetic: the oracle
  // rebuilds the same payload string, so content_length is just strlen
  // of the same concat, and title/body follow the q144 template logic.
  private def q146(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{HtmlKernels, WarcKernels}
    val payload = concat(lit("<html><head><title>D"), col("doc_id"),
      lit("</title></head><body><p>"), col("text"),
      lit("</p><a href='next'>n</a></body></html>"))
    val resp = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://ex.com/doc/"),
      col("doc_id"), lit("\r\nWARC-Date: 2026-02-03T04:05:06Z\r\nContent-Length: "),
      length(payload), lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
    val req = lit("WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n")
    val warc = concat(resp, req).cast("binary")
    docs(s, dir)
      .select(col("doc_id"),
        size(WarcKernels.warcRecords(warc)).as("n_records"),
        explode(WarcKernels.warcRecords(warc)).as("r"))
      .filter(col("r.warc_type") === "response")
      .select(col("doc_id"), col("n_records"), col("r.url").as("url"),
        col("r.content_length").as("content_length"),
        HtmlKernels.htmlExtract(col("r.payload").cast("string")).as("h"))
      .select(col("doc_id"), col("n_records"), col("url"), col("content_length"),
        col("h.title").as("title"), col("h.body_text").as("body_text"))
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q146Sql = """
    SELECT doc_id,
           CAST(2 AS INT) AS n_records,
           'https://ex.com/doc/' || doc_id AS url,
           CAST(strlen('<html><head><title>D' || doc_id ||
             '</title></head><body><p>' || text ||
             '</p><a href=''next''>n</a></body></html>') AS BIGINT)
             AS content_length,
           'D' || doc_id AS title,
           coalesce(array_to_string(list_filter(string_split_regex(
             text || ' n', '\s+'), x -> len(x) > 0), ' '), '') AS body_text
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  // q147 — the .warc.gz layout, in-query: each record compressed as its
  // OWN gzip member, members concatenated, then the auto-sniffing
  // decompression + container walk recover the records. gzip∘gunzip
  // cancels, so the oracle is plain string arithmetic — what the gate
  // actually pins is the multi-member framing (a reader that stops after
  // member one loses the request record and n_records flips to 1) and
  // CRC/ISIZE-verified inflation on 500 real payloads.
  private def q147(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{GzipKernels, WarcKernels}
    val payload = concat(lit("page "), col("doc_id"), lit(": "), col("text"))
    val resp = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://ex.com/doc/"),
      col("doc_id"), lit("\r\nContent-Length: "), length(payload),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
    val req = lit("WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n")
    val gz = concat(GzipKernels.gzipCompress(resp.cast("binary")),
      GzipKernels.gzipCompress(req.cast("binary")))
    docs(s, dir)
      .select(col("doc_id"),
        size(WarcKernels.warcRecords(GzipKernels.gunzipAuto(gz))).as("n_records"),
        explode(WarcKernels.warcRecords(GzipKernels.gunzipAuto(gz))).as("r"))
      .filter(col("r.warc_type") === "response")
      .select(col("doc_id"), col("n_records"), col("r.url").as("url"),
        col("r.content_length").as("content_length"),
        col("r.payload").cast("string").as("payload_text"))
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q147Sql = """
    SELECT doc_id,
           CAST(2 AS INT) AS n_records,
           'https://ex.com/doc/' || doc_id AS url,
           CAST(strlen('page ' || doc_id || ': ' || text) AS BIGINT)
             AS content_length,
           'page ' || doc_id || ': ' || text AS payload_text
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  // q152/q153 — PDF text extraction: each document becomes a REAL
  // two-page PDF (catalog → page tree → per-page content streams, a
  // correct xref table, deterministic bytes) whose text ops exercise the
  // kernel surface — page 1 is a RAW content stream using a TJ array
  // (kern number invisible) plus a hex-string Tj; page 2 is
  // FlateDecode'd (JDK Deflater, zlib) with two Tj's split by T* and
  // escaped parens in the trailing line. Extraction output is exact
  // arithmetic on the original text: "Doc <id>!\n<text>\np. 2 (end)",
  // n_pages = 2 from the page-tree walk, version from the header. The
  // builder writes structure the extractor must genuinely parse back
  // (object scan, /Length framing, inflate, tree resolution, operator
  // walk) — same fixture posture as the WARC/gzip gates (q146/q147).
  private def pdfEsc(t: String): String =
    t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private[graft] val textToPdf: (String, String) => Array[Byte] = (id, body) => {
    val latin = java.nio.charset.StandardCharsets.ISO_8859_1
    val c1 = s"BT /F1 12 Tf 72 720 Td [(Doc ) -120 (${pdfEsc(id)})] TJ <21> Tj ET"
      .getBytes(latin)
    val c2raw = s"BT 72 720 Td (${pdfEsc(body)}) Tj T* (p. 2 \\(end\\)) Tj ET"
      .getBytes(latin)
    val c2 = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(c2raw); d.finish()
      val buf = new Array[Byte](c2raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def dictObj(body: String): Array[Byte] = (body + "\nendobj\n").getBytes(latin)
    def streamObj(dict: String, data: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(s"$dict\nstream\n".getBytes(latin))
      o.write(data)
      o.write("\nendstream\nendobj\n".getBytes(latin))
      o.toByteArray
    }
    val page =
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 7 0 R >> >> /Contents %d 0 R >>"
    val bodies: Seq[Array[Byte]] = Seq(
      dictObj("<< /Type /Catalog /Pages 2 0 R >>"),
      dictObj("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
      dictObj(page.format(4)),
      streamObj(s"<< /Length ${c1.length} >>", c1),
      dictObj(page.format(6)),
      streamObj(s"<< /Length ${c2.length} /Filter /FlateDecode >>", c2),
      dictObj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes(latin))
    val offsets = bodies.zipWithIndex.map { case (b, i) =>
      val off = out.size()
      out.write(s"${i + 1} 0 obj\n".getBytes(latin))
      out.write(b)
      off
    }
    val xref = out.size()
    out.write(("xref\n0 8\n0000000000 65535 f \n" +
      offsets.map(o => f"$o%010d 00000 n \n").mkString +
      s"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
      .getBytes(latin))
    out.toByteArray
  }

  // q162 — PDF extraction through a NON-IDENTITY /ToUnicode CMap plus a
  // /WinAnsiEncoding base font (the subset-font mechanism real crawl
  // PDFs need): page 1's string bytes are the text SHIFTED +1 and only
  // the font's bfrange (<01><7F> → U+0000…, i.e. code k → k−1) recovers
  // it, with a bfchar mapping code 0xFF → '€'; page 2 selects a WinAnsi
  // font and shows byte 0x97 → '—'. /Resources live on the /Pages node
  // (inherited, not per-page). A regression to the Latin-1 byte map
  // garbles every page-1 char, so the oracle is a true decode gate.
  private[graft] val textToPdfCMap: (String, String) => Array[Byte] = (id, body) => {
    val latin = java.nio.charset.StandardCharsets.ISO_8859_1
    def hexShift(t: String): String =
      t.map(c => f"${(c + 1) & 0xff}%02X").mkString
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |1 beginbfchar
        |<FF> <20AC>
        |endbfchar
        |1 beginbfrange
        |<01> <7F> <0000>
        |endbfrange
        |endcmap
        |end
        |end""".stripMargin
    val c1 = s"BT /F1 12 Tf 72 720 Td <${hexShift(s"Doc $id!")}> Tj <FF> Tj ET"
      .getBytes(latin)
    val c2 = (s"BT /F2 12 Tf 72 720 Td (${pdfEsc(body)}) Tj T* " +
      "(p. 2 \\(end\\) ) Tj <97> Tj ET").getBytes(latin)
    def dictObj(body: String): String = body
    val cmapBytes = cmap.getBytes(latin)
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> ("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 " +
        "/Resources << /Font << /F1 7 0 R /F2 8 0 R >> >> >>"),
      3 -> "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
      5 -> "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 6 0 R >>",
      7 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /AAAAAA+Custom " +
        "/ToUnicode 9 0 R >>"),
      8 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /WinAnsiEncoding >>"))
    val streams = Map(
      4 -> c1,
      6 -> c2,
      9 -> cmapBytes)
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes(latin))
    (1 to 9).foreach { n =>
      objs.toMap.get(n) match {
        case Some(d) =>
          out.write(s"$n 0 obj\n${dictObj(d)}\nendobj\n".getBytes(latin))
        case None => streams.get(n).foreach { data =>
          out.write(s"$n 0 obj\n<< /Length ${data.length} >>\nstream\n".getBytes(latin))
          out.write(data)
          out.write("\nendstream\nendobj\n".getBytes(latin))
        }
      }
    }
    out.write("%%EOF\n".getBytes(latin))
    out.toByteArray
  }

  /** q174's builder: a one-page PDF whose content bytes are Caesar-shifted
    * (+1 on [a-z], [0-9] and space) and whose font carries NO ToUnicode —
    * only an /Encoding /Differences array mapping each shifted code back
    * to the original glyph NAME (/a../z, /zero../nine, /space). A reader
    * without glyph-name resolution extracts shifted garbage; the exact
    * oracle is the plain template, so q174 hash-fails on any /Differences
    * regression. Corpus text is strictly [a-z ] (checked), so the shift
    * is collision-free by construction. */
  private[graft] val textToPdfDiff: (String, String) => Array[Byte] = (id, body) => {
    val latin = java.nio.charset.StandardCharsets.ISO_8859_1
    def shift(s: String): String = s.map {
      case c if (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') => (c + 1).toChar
      case ' ' => '!'
      case c => c
    }
    val diffs = "33 /space 49 /zero /one /two /three /four /five /six " +
      "/seven /eight /nine 98 /a /b /c /d /e /f /g /h /i /j /k /l /m " +
      "/n /o /p /q /r /s /t /u /v /w /x /y /z"
    val content = (s"BT /F1 12 Tf 72 720 Td (${shift(s"doc $id says")}) Tj T* " +
      s"(${shift(pdfEsc(body))}) Tj ET").getBytes(latin)
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes(latin))
    def obj(n: Int, b: String): Unit =
      out.write(s"$n 0 obj\n$b\nendobj\n".getBytes(latin))
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    out.write((s"4 0 obj\n<< /Length ${content.length} >>\nstream\n").getBytes(latin))
    out.write(content)
    out.write("\nendstream\nendobj\n".getBytes(latin))
    obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /GAAAAA+Shifted " +
      s"/Encoding << /Differences [ $diffs ] >> >>")
    out.write("%%EOF\n".getBytes(latin))
    out.toByteArray
  }

  // q174 — /Differences glyph-name decoding through the driver gate: the
  // fixture's bytes are shifted, so ONLY correct Differences resolution
  // reproduces the plain template the oracle states.
  private def q174(s: SparkSession, dir: String): DataFrame = {
    val toPdf = udf(textToPdfDiff)
    TextAnalysis.pdfExtract(
        docs(s, dir).withColumn("pdf",
          toPdf(col("doc_id").cast("string"), col("text"))),
        "doc_id", "pdf")
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q174Sql = """
    SELECT doc_id, '1.4' AS version, CAST(1 AS INT) AS n_pages,
           'doc ' || doc_id || ' says' || chr(10) || text AS text
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  // q175 — domain blocklist filtering from PURE JSON: `url_host`
  // extracts the blocklist key (authority lowercased, userinfo/port
  // stripped; '' for non-URLs) and a plain not_isin filter IS the
  // blocklist — no dedicated node key, the function surface composes.
  // Four authority shapes exercise every strip rule.
  private def q175(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {
         "url": "case when doc_id % 4 = 0 then concat('https://u:p@News.Example.COM:443/a/', cast(doc_id as string)) when doc_id % 4 = 1 then concat('HTTP://Blog.Example.ORG/x?id=', cast(doc_id as string)) when doc_id % 4 = 2 then 'http://SPAM.Tracker.Net:80/z' else concat('not a url ', cast(doc_id as string)) end",
         "host": "url_host(url)"},
       "filters": [{"col": "host", "op": "not_isin",
                    "value": ["spam.tracker.net", ""]}],
       "aggregate": {"group_by": ["host"], "aggregations": [
         {"col": "*", "func": "count", "new_name": "n_docs"},
         {"col": "doc_id", "func": "min", "new_name": "min_id"}]},
       "order_by": ["host asc"]}""")
  }
  private val q175Sql = """
    WITH u AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                    THEN 'https://u:p@News.Example.COM:443/a/' || CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 4 = 1
                    THEN 'HTTP://Blog.Example.ORG/x?id=' || CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 4 = 2 THEN 'http://SPAM.Tracker.Net:80/z'
                  ELSE 'not a url ' || CAST(doc_id AS VARCHAR) END AS url
      FROM documents),
    e AS (
      SELECT doc_id,
             lower(regexp_replace(regexp_replace(
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1),
               '^[^@]*@', ''), ':[0-9]*$', '')) AS host
      FROM u)
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_id
    FROM e WHERE host NOT IN ('spam.tracker.net', '')
    GROUP BY 1 ORDER BY host ASC NULLS FIRST"""

  /** q178's builder: a REAL RC4-encrypted PDF (standard security
    * handler, R=3/V=2/128-bit, empty user password — the owner-locked
    * crawl shape): content streams encrypted with per-object keys, /U
    * computed per Algorithm 5 so authentication genuinely runs. Only
    * correct key derivation + RC4 + per-object keys recover the
    * template text the oracle states. */
  private[graft] val textToPdfEnc: (String, String) => Array[Byte] = (id, body) => {
    import graft.functions.PdfOps
    val latin = java.nio.charset.StandardCharsets.ISO_8859_1
    val id0 = (0 until 16).map(i => ((i * 17 + 3) & 0xff).toByte).toArray
    val oEntry = (0 until 32).map(i => ((i * 7 + 91) & 0xff).toByte).toArray
    val pPerm = -44L
    val key = PdfOps.deriveKey(oEntry, pPerm, id0, r = 3, lengthBits = 128,
      encryptMetadata = true)
    val uEntry = PdfOps.expectedU(key, id0, 3) ++ Array.fill(16)(0x7a.toByte)
    def hexStr(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    val content = s"BT /F1 12 Tf 72 720 Td (locked ${pdfEsc(id)}) Tj T* " +
      s"(${pdfEsc(body)}) Tj ET"
    val enc = PdfOps.rc4(PdfOps.objectKey(key, 4, 0), content.getBytes(latin))
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes(latin))
    def obj(n: Int, b: String): Unit =
      out.write(s"$n 0 obj\n$b\nendobj\n".getBytes(latin))
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>")
    out.write(s"4 0 obj\n<< /Length ${enc.length} >>\nstream\n".getBytes(latin))
    out.write(enc)
    out.write("\nendstream\nendobj\n".getBytes(latin))
    obj(5, "<< /Filter /Standard /V 2 /R 3 /Length 128 " +
      s"/P $pPerm /O <${hexStr(oEntry)}> /U <${hexStr(uEntry)}> >>")
    out.write((s"trailer\n<< /Root 1 0 R /Encrypt 5 0 R " +
      s"/ID [<${hexStr(id0)}> <${hexStr(id0)}>] >>\n%%EOF\n").getBytes(latin))
    out.toByteArray
  }

  // q178 — RC4-encrypted PDFs through the driver gate: the fixture's
  // content streams are genuinely encrypted, so the template only comes
  // back through correct key derivation + authentication + per-object
  // RC4 — a regression anywhere in the handler hash-fails.
  private def q178(s: SparkSession, dir: String): DataFrame = {
    val toPdf = udf(textToPdfEnc)
    TextAnalysis.pdfExtract(
        docs(s, dir).withColumn("pdf",
          toPdf(col("doc_id").cast("string"), col("text"))),
        "doc_id", "pdf")
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q178Sql = """
    SELECT doc_id, '1.4' AS version, CAST(1 AS INT) AS n_pages,
           'locked ' || doc_id || chr(10) || text AS text
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  // q179 — the REAL crawl path end to end: WARC response records whose
  // payloads are RAW HTTP (status line + headers + body, CHUNKED for
  // odd ids — the Common Crawl layout), routed `warc_records` →
  // `http_response` (status/content-type gate + dechunk) →
  // `html_extract`. Chunking exists only on the build side: the
  // dechunked body must equal the plain template, so one oracle covers
  // both parities — a dechunk/header regression hash-fails half the
  // rows.
  private def q179(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{HtmlKernels, HttpKernels, WarcKernels}
    val page = concat(lit("<html><head><title>H"), col("doc_id"),
      lit("</title></head><body><p>"), col("text"), lit("</p></body></html>"))
    // plain body for even ids; two-chunk transfer coding for odd ids
    // (first chunk fixed 0x10 bytes, second the hex-sized remainder)
    val chunked = concat(
      lit("10\r\n"), substring(page, 1, 16), lit("\r\n"),
      lower(conv((length(page) - 16).cast("string"), 10, 16)), lit("\r\n"),
      expr("substring(page_c, 17)"), lit("\r\n0\r\n\r\n"))
    val http = when(col("doc_id") % 2 === 0,
      concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        "Content-Length: "), length(page), lit("\r\n\r\n"), page))
      .otherwise(concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
          "Transfer-Encoding: chunked\r\n\r\n"), chunked))
    val resp = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://ex.com/p/"),
      col("doc_id"), lit("\r\nContent-Length: "), length(http),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    docs(s, dir)
      .withColumn("page_c", page)
      .select(col("doc_id"),
        explode(WarcKernels.warcRecords(resp.cast("binary"))).as("r"))
      .filter(col("r.warc_type") === "response")
      .select(col("doc_id"),
        HttpKernels.httpResponse(col("r.payload")).as("h"))
      .filter(col("h.status") === 200 && col("h.content_type") === "text/html")
      .select(col("doc_id"), col("h.status").as("status"),
        col("h.content_type").as("content_type"),
        HtmlKernels.htmlExtract(col("h.body").cast("string")).as("x"))
      .select(col("doc_id"), col("status"), col("content_type"),
        col("x.title").as("title"), col("x.body_text").as("body_text"))
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q179Sql = """
    SELECT doc_id, CAST(200 AS INT) AS status, 'text/html' AS content_type,
           'H' || doc_id AS title,
           coalesce(array_to_string(list_filter(string_split_regex(
             text, '\s+'), x -> len(x) > 0), ' '), '') AS body_text
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  private val cmapTextSql =
    "'Doc ' || doc_id || '!' || '€' || chr(10) || text || chr(10) || 'p. 2 (end) ' || '—'"
  private val q162Sql = s"""
    SELECT doc_id, '1.4' AS version, CAST(2 AS INT) AS n_pages,
           $cmapTextSql AS text
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""
  private def q162(s: SparkSession, dir: String): DataFrame = {
    val toPdf = udf(textToPdfCMap)
    TextAnalysis.pdfExtract(
        docs(s, dir).withColumn("pdf",
          toPdf(col("doc_id").cast("string"), col("text"))),
        "doc_id", "pdf")
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** q152's builder plus `id % 3` planted image XObjects (payload length
    * 10 + id % 7 + k for image k — opaque bytes behind /DCTDecode, the
    * realistic shape): the q169 image-inventory fixture. Appending
    * objects after q152's seven leaves the text path byte-identical. */
  private[graft] val textToPdfImg: (String, String) => Array[Byte] = (id, body) => {
    val latin = java.nio.charset.StandardCharsets.ISO_8859_1
    val base = textToPdf(id, body)
    val n = (id.toLong % 3).toInt
    if (n == 0) base
    else {
      val out = new java.io.ByteArrayOutputStream()
      // strip the trailing xref/trailer/%%EOF (the scanner never reads
      // it); append image objects and a fresh EOF marker
      val cut = new String(base, latin).lastIndexOf("xref\n")
      out.write(base, 0, if (cut > 0) cut else base.length)
      (0 until n).foreach { k =>
        val len = 10 + (id.toLong % 7).toInt + k
        val payload = new Array[Byte](len)
        java.util.Arrays.fill(payload, 'J'.toByte)
        out.write((s"${8 + k} 0 obj\n<< /Type /XObject /Subtype /Image " +
          s"/Width 4 /Height 4 /Filter /DCTDecode /Length $len >>\nstream\n")
          .getBytes(latin))
        out.write(payload)
        out.write("\nendstream\nendobj\n".getBytes(latin))
      }
      out.write("%%EOF\n".getBytes(latin))
      out.toByteArray
    }
  }

  // q169 — the PDF image inventory through the pdf_extract FUNCTION
  // surface (struct projection in pure column code): documents carry
  // id % 3 planted /Subtype /Image XObjects whose byte totals are id
  // arithmetic, so count and size are exact oracle terms. Text/pages
  // stay the q152 template — one kernel pass yields all five fields.
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val toPdf = udf(textToPdfImg)
    docs(s, dir)
      .withColumn("pdf", toPdf(col("doc_id").cast("string"), col("text")))
      .select(col("doc_id"),
        graft.functions.PdfKernels.pdfExtract(col("pdf")).as("p"))
      .select(col("doc_id"), col("p.n_pages").as("n_pages"),
        col("p.n_images").as("n_images"),
        col("p.image_bytes").as("image_bytes"))
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q169Sql = """
    SELECT doc_id, CAST(2 AS INT) AS n_pages,
           CAST(doc_id % 3 AS INT) AS n_images,
           CAST((doc_id % 3) * (10 + doc_id % 7)
                + (doc_id % 3) * (doc_id % 3 - 1) / 2 AS BIGINT) AS image_bytes
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  private val pdfTextSql =
    "'Doc ' || doc_id || '!' || chr(10) || text || chr(10) || 'p. 2 (end)'"
  private val q152Sql = s"""
    SELECT doc_id, '1.4' AS version, CAST(2 AS INT) AS n_pages,
           $pdfTextSql AS text
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""
  private def q152(s: SparkSession, dir: String): DataFrame = {
    val toPdf = udf(textToPdf)
    TextAnalysis.pdfExtract(
        docs(s, dir).withColumn("pdf",
          toPdf(col("doc_id").cast("string"), col("text"))),
        "doc_id", "pdf")
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private def q153(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    s.udf.register("text_to_pdf", textToPdf)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"pdf": "text_to_pdf(cast(doc_id as string), text)"},
       "pdf_extract": {"id_col": "doc_id", "pdf_col": "pdf"},
       "order_by": ["doc_id asc"]}""")
  }

  // q156/q157 — BPE vocabulary training + real-tokenizer packing. The
  // trainer is M vocabulary-shaped aggregate rounds (deterministic
  // tie-break: count DESC, pair lexicographic ASC); the oracle restates
  // round N as N UNROLLED scalar-subquery CTE pairs over the word-
  // frequency table: symbols live in a space-delimited string, one
  // greedy left-to-right merge pass IS one non-overlapping string
  // replace of ' l r ' with ' lr ' — DuckDB's replace() semantics, which
  // is exactly why the kernel contract (BpeOps) fixes application as
  // one pass per rank. q156 hash-pins the merge table itself; q157 runs
  // the trained tokenizer over every document and packs by REAL subword
  // counts (the q73 shape upgraded from whitespace counts to BPE).
  private val bpeMerges = 6
  private def bpeSqlCtes(m: Int): String = {
    val sb = new StringBuilder
    sb.append("""
    WITH w0 AS MATERIALIZED (
      SELECT w, ' ' || array_to_string(str_split_regex(w, ''), ' ') || ' ' AS sym,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                   x -> len(x) > 0)) AS w FROM documents)
      GROUP BY 1)""")
    for (i <- 1 to m) {
      val p = i - 1
      sb.append(s""",
    r$i AS MATERIALIZED (
      SELECT l, r, pc FROM (
        SELECT s[i] AS l, s[i+1] AS r, CAST(SUM(cnt) AS BIGINT) AS pc
        FROM (SELECT s, cnt, unnest(generate_series(1, len(s)-1)) AS i
              FROM (SELECT list_filter(string_split(sym, ' '),
                             x -> len(x) > 0) AS s, cnt
                    FROM w$p))
        GROUP BY 1, 2)
      ORDER BY pc DESC, l ASC, r ASC LIMIT 1),
    w$i AS MATERIALIZED (
      SELECT w, replace(sym,
               ' ' || (SELECT l FROM r$i) || ' ' || (SELECT r FROM r$i) || ' ',
               ' ' || (SELECT l FROM r$i) || (SELECT r FROM r$i) || ' ') AS sym,
             cnt
      FROM w$p)""")
    }
    sb.toString
  }
  private def q156(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.trainDF(s, docs(s, dir), "text", bpeMerges)
      .select(col("rank"), col("left").as("left_sym"),
        col("right").as("right_sym"), col("pair_count"))
      .orderBy(col("rank").asc_nulls_first)
  private val q156Sql = bpeSqlCtes(bpeMerges) + "\n    " +
    (1 to bpeMerges).map(i =>
      s"SELECT $i AS rank, l AS left_sym, r AS right_sym, pc AS pair_count FROM r$i")
      .mkString("\n    UNION ALL ") +
    "\n    ORDER BY rank ASC NULLS FIRST"

  // q158 — q156's PURE-JSON twin via the `bpe` node key (output=merges):
  // the config path must reproduce the API path's merge table exactly,
  // so it shares q156's unrolled oracle.
  private def q158(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "bpe": {"text_col": "text", "num_merges": $bpeMerges},
       "rename": {"left": "left_sym", "right": "right_sym"},
       "order_by": ["rank asc"]}""")
  }

  private def q157(s: SparkSession, dir: String): DataFrame = {
    val merges = graft.ops.Bpe.train(docs(s, dir), "text", bpeMerges)
      .map(t => (t._1, t._2))
    val counted = docs(s, dir).select(col("doc_id"),
      size(graft.functions.BpeKernels.bpeTokenize(col("text"), merges))
        .as("n_bpe"))
    graft.ops.Corpus.packSequences(counted, "doc_id", "n_bpe",
        budget = 512L, numShards = 8)
      .select("doc_id", "n_bpe", "shard", "bin")
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q157Sql = bpeSqlCtes(bpeMerges) + s""",
    wlen AS (SELECT w, len(list_filter(string_split(sym, ' '),
                           x -> len(x) > 0)) AS l
             FROM w$bpeMerges),
    docw AS (SELECT doc_id,
                    unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                      x -> len(x) > 0)) AS w
             FROM documents),
    per AS (SELECT dw.doc_id, CAST(SUM(wl.l) AS INT) AS n_bpe
            FROM docw dw JOIN wlen wl USING (w) GROUP BY 1),
    full0 AS (SELECT d.doc_id, COALESCE(per.n_bpe, 0) AS n_bpe
              FROM documents d LEFT JOIN per USING (doc_id))
    SELECT doc_id, n_bpe, CAST(doc_id % 8 AS INT) AS shard,
           CAST(FLOOR(CAST(COALESCE(SUM(n_bpe) OVER (
                 PARTITION BY doc_id % 8 ORDER BY doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) / 512.0) AS INT) AS bin
    FROM full0 ORDER BY doc_id ASC NULLS FIRST"""

  // q164 — the `bpe_apply` ARTIFACT-tokenization key, exactly mirrored:
  // a FIXED six-merge table (rank order matters — later merges build on
  // earlier outputs: th+e only fires after t+h) is persisted in the
  // trainDF artifact shape, reloaded by pure JSON, and every document is
  // tokenized scan-stage. The oracle restates the tokenizer as six
  // nested rank-ordered string replaces over the per-word symbol string
  // (the q156/q157 kernel contract: one greedy non-overlapping pass per
  // rank IS one replace of ' l r ' with ' lr ').
  private lazy val q164Merges = Seq(
    ("e", "r"), ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"))
  private def q164(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q164_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "keep_columns": ["doc_id", "text"],
       "bpe_apply": {"text_col": "text", "merges_dir": "$mdir"},
       "drop": ["text", "bpe_tokens"],
       "order_by": ["doc_id asc"]}""")
  }
  private val q164Sql = {
    val replaced = q164Merges.foldLeft("sym") { case (acc, (l, r)) =>
      s"replace($acc, ' $l $r ', ' $l$r ')"
    }
    s"""
    WITH w0 AS MATERIALIZED (
      SELECT w, ' ' || array_to_string(str_split_regex(w, ''), ' ') || ' ' AS sym
      FROM (SELECT DISTINCT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                   x -> len(x) > 0)) AS w FROM documents)),
    wlen AS (SELECT w, len(list_filter(string_split($replaced, ' '),
                           x -> len(x) > 0)) AS l
             FROM w0),
    docw AS (SELECT doc_id,
                    unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                      x -> len(x) > 0)) AS w
             FROM documents),
    per AS (SELECT dw.doc_id, CAST(SUM(wl.l) AS INT) AS n_bpe
            FROM docw dw JOIN wlen wl USING (w) GROUP BY 1)
    SELECT d.doc_id, COALESCE(per.n_bpe, 0) AS n_bpe
    FROM documents d LEFT JOIN per USING (doc_id)
    ORDER BY doc_id ASC NULLS FIRST"""
  }

  // q148 — the WEB-curation flagship, PURE JSON, on named defs: crawl
  // pages (the q144 template) → html_extract → token-count quality
  // filter (n_tok ≤ 45 — drops 329/500 at sf0.01) → language rejoin
  // (child) → temperature resample (α=0.5, frac 0.5 — flattens en 38%
  // vs de 59% keep rates) → per-language doc/token report. Every stage
  // bites and every stage mirrors exactly: body token count is 5 + the
  // text's (template arithmetic), and the sampling stage recomputes the
  // q142 rate fold over the SURVIVING mixture.
  private def q148(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
        {"id": "extracted",
         "source": {"table": "documents"},
         "derive": {"html": "$htmlExpr"},
         "html_extract": {"id_col": "doc_id", "html_col": "html"}},
        {"id": "scored",
         "source": {"ref": "extracted"},
         "derive": {"n_tok": "size(split(body_text, ' '))"},
         "filters": ["n_tok <= 45"],
         "keep_columns": ["doc_id", "n_tok"],
         "children": [{"id": "langs", "source": {"table": "documents"},
                       "keep_columns": ["doc_id", "lang"],
                       "join": {"on": ["doc_id"], "how": "inner"}}]}],
       "id": "webflag",
       "source": {"ref": "scored"},
       "temperature_sample": {"group_col": "lang", "id_col": "doc_id",
                              "target_fraction": 0.5},
       "aggregate": {"group_by": ["lang"],
         "aggregations": [
           {"col": "*", "func": "count", "new_name": "n_docs"},
           {"col": "n_tok", "func": "sum", "new_name": "sum_tok"}]},
       "order_by": ["lang asc"]}""")
  }
  private val q148Sql = """
    WITH surv AS (
      SELECT doc_id, lang,
             5 + len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0)) AS n_tok
      FROM documents
      WHERE 5 + len(list_filter(string_split_regex(trim(text), '\s+'),
        x -> len(x) > 0)) <= 45),
    g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM surv GROUP BY lang),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS N,
                 list_sum(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang)) AS S
          FROM g),
    r AS (SELECT g.lang,
                 CAST(FLOOR(LEAST(1.0,
                       CAST(CAST(FLOOR(0.5 * t.N) AS BIGINT) AS DOUBLE)
                         * (sqrt(CAST(g.n AS DOUBLE)) / t.S)
                         / CAST(g.n AS DOUBLE)) * 1000000.0) AS BIGINT) AS k
          FROM g, t)
    SELECT s.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s.n_tok) AS BIGINT) AS sum_tok
    FROM surv s JOIN r ON s.lang = r.lang
    WHERE ((s.doc_id % 1000000) * 25214903917) % 1000000 < r.k
    GROUP BY s.lang ORDER BY s.lang ASC NULLS FIRST"""

  // q159 — the MIXED-DOCUMENT-LAKE flagship, PURE JSON on named defs:
  // one binary payload column carries real PDFs (even ids, the q152
  // builder) next to HTML pages (odd ids); `sniff_mime` routes each row
  // to its extractor branch (`pdf_extract` / `html_extract`), the
  // branches unify by name, and the report aggregates per document
  // kind. This is the round-11 composition proof — the sniff→extract
  // gap named by the round-9 verdict, closed end to end in config. The
  // oracle is parity arithmetic: extracted PDF text is the q152
  // template (n_tok = text's + 5, 2 pages), extracted HTML body is the
  // bare text (n_tok = text's, 0 pages).
  private def q159(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    s.udf.register("text_to_pdf", textToPdf)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
        {"id": "lake", "cache": true,
         "source": {"table": "documents"},
         "derive": {"payload": "if(doc_id % 2 = 0, text_to_pdf(cast(doc_id as string), text), cast(concat('<html><head><title>H', doc_id, '</title></head><body><p>', text, '</p></body></html>') as binary))",
                    "mime": "sniff_mime(payload)"}},
        {"id": "pdfdocs",
         "source": {"ref": "lake"},
         "filters": ["mime = 'application/pdf'"],
         "pdf_extract": {"id_col": "doc_id", "pdf_col": "payload"},
         "with_columns": {"kind": "'pdf'", "n_tok": "token_count(text)"},
         "drop": ["version", "text"]},
        {"id": "htmldocs",
         "source": {"ref": "lake"},
         "derive": {"html": "cast(payload as string)"},
         "filters": ["mime = 'text/html'"],
         "html_extract": {"id_col": "doc_id", "html_col": "html"},
         "with_columns": {"kind": "'html'", "n_tok": "token_count(body_text)",
                          "n_pages": "0"},
         "drop": ["title", "body_text", "links"]}],
       "id": "mixflag",
       "combine": {"op": "union", "nodes": [
         {"id": "pb", "source": {"ref": "pdfdocs"}},
         {"id": "hb", "source": {"ref": "htmldocs"}}]},
       "aggregate": {"group_by": ["kind"],
         "aggregations": [
           {"col": "*", "func": "count", "new_name": "n_docs"},
           {"col": "n_tok", "func": "sum", "new_name": "sum_tok"},
           {"col": "n_pages", "func": "sum", "new_name": "sum_pages"}]},
       "order_by": ["kind asc"]}""")
  }
  private val q159Sql = """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> len(x) > 0)) AS n
      FROM documents)
    SELECT CASE WHEN k = 0 THEN 'html' ELSE 'pdf' END AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN k = 1 THEN n + 5 ELSE n END) AS BIGINT) AS sum_tok,
           CAST(SUM(CASE WHEN k = 1 THEN 2 ELSE 0 END) AS BIGINT) AS sum_pages
    FROM (SELECT doc_id, n, CAST(1 - doc_id % 2 AS INT) AS k FROM t)
    GROUP BY 1 ORDER BY kind ASC NULLS FIRST"""

  // q252 — compression-ratio quality signal (`compression_ratio`): the
  // deflate-ratio heuristic the word/line-tier rules can't see —
  // boilerplate/repetition compresses well (low ratio), high-entropy
  // noise badly (>1). zlib output can drift ~1% across zlib VERSIONS, so
  // the gates are INVARIANTS, never absolute ratios (the media-checksum
  // posture): the signal exists exactly for non-empty text, sits in
  // (0, 8], and 8x self-repetition ALWAYS compresses strictly better
  // (verified to hold corpus-wide at the documents table's 44-577 B
  // lengths — every repeat start is well inside deflate's 32 KiB
  // window).
  private def q252(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {
         "cr": "compression_ratio(text)",
         "cr8": "compression_ratio(repeat(text, 8))",
         "has_signal": "cr IS NOT NULL",
         "in_bounds": "CASE WHEN cr IS NOT NULL THEN cr > 0 AND cr <= 8 END",
         "rep_lower": "CASE WHEN cr IS NOT NULL THEN cr8 < cr END"},
       "keep_columns": ["doc_id", "has_signal", "in_bounds", "rep_lower"],
       "order_by": ["doc_id asc"]}""")
  private val q252Sql = """
    SELECT doc_id,
           COALESCE(length(text) > 0, FALSE) AS has_signal,
           CASE WHEN COALESCE(length(text), 0) > 0 THEN TRUE END AS in_bounds,
           CASE WHEN COALESCE(length(text), 0) > 0 THEN TRUE END AS rep_lower
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  // q263 — COLLOCATIONS (`collocations`): the corpus's top adjacent word
  // pairs by pointwise mutual information — phrase-lexicon building and
  // BPE merge auditing. Exact oracle: integer token/pair counts
  // restated in DuckDB with the shared q67 tokenizer spelling, the one
  // PMI formula spelled identically in both engines (IEEE double ops on
  // exact integers — the q68 ln() precedent), ROUND 6, total order.
  private def q263(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "collocations": {"text_col": "text", "min_count": 5, "top_k": 50},
       "order_by": ["pmi desc", "w1 asc", "w2 asc"]}""")
  private val q263Sql = """
    WITH toks AS (
      SELECT list_filter(string_split_regex(trim(text), '\s+'),
             x -> len(x) > 0) AS t
      FROM documents),
    pairs AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
    uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
    ptot AS (SELECT COUNT(*) AS n_pairs_total FROM pairs),
    pc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 5)
    SELECT w1, w2, n_pair,
           ROUND(ln((CAST(n_pair AS DOUBLE) * n_tok * n_tok) /
                    (CAST(n_pairs_total AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
    FROM pc
    JOIN uni u1 ON pc.w1 = u1.w
    JOIN uni u2 ON pc.w2 = u2.w
    CROSS JOIN tot CROSS JOIN ptot
    ORDER BY pmi DESC NULLS LAST, w1 ASC NULLS FIRST, w2 ASC NULLS FIRST
    LIMIT 50"""

  // q269 — per-GROUP collocations (`group_cols`): per-language phrase
  // lexicons — counts, totals, the PMI denominator AND the top-k all
  // become group-local. Mirrored with a QUALIFY row_number per lang.
  private def q269(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "collocations": {"text_col": "text", "min_count": 3, "top_k": 10,
                        "group_cols": ["lang"]},
       "order_by": ["lang asc", "pmi desc", "w1 asc", "w2 asc"]}""")
  private val q269Sql = """
    WITH toks AS (
      SELECT lang, list_filter(string_split_regex(trim(text), '\s+'),
             x -> len(x) > 0) AS t
      FROM documents),
    pairs AS (
      SELECT lang, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
    uni AS (
      SELECT lang, w, COUNT(*) AS c
      FROM (SELECT lang, unnest(t) AS w FROM toks) GROUP BY 1, 2),
    tot AS (
      SELECT lang, CAST(SUM(len(t)) AS BIGINT) AS n_tok,
             CAST(SUM(greatest(len(t) - 1, 0)) AS BIGINT) AS n_pairs_total
      FROM toks GROUP BY 1),
    pc AS (
      SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM pairs GROUP BY 1, 2, 3 HAVING COUNT(*) >= 3),
    scored AS (
      SELECT pc.lang, w1, w2, n_pair,
             ROUND(ln((CAST(n_pair AS DOUBLE) * n_tok * n_tok) /
                      (CAST(n_pairs_total AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
      FROM pc
      JOIN uni u1 ON pc.lang = u1.lang AND pc.w1 = u1.w
      JOIN uni u2 ON pc.lang = u2.lang AND pc.w2 = u2.w
      JOIN tot ON pc.lang = tot.lang)
    SELECT lang, w1, w2, n_pair, pmi FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
      ORDER BY pmi DESC, w1 ASC, w2 ASC) <= 10
    ORDER BY lang ASC NULLS FIRST, pmi DESC NULLS LAST,
             w1 ASC NULLS FIRST, w2 ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q252_compression_ratio", q252, Some(q252Sql)),
    Q("q263_collocations", q263, Some(q263Sql)),
    Q("q269_collocations_grouped", q269, Some(q269Sql)),
    Q("q24_text_stats", q24, Some(q24Sql)),
    Q("q25_lang_id", q25, Some(q25Sql)),
    Q("q26_fingerprint", q26, Some(q26Sql)),
    Q("q60_curation_pipeline", q60, Some(q60Sql)),
    Q("q67_token_df", q67, Some(q67Sql)),
    Q("q68_tfidf", q68, Some(q68Sql)),
    Q("q106_lm_perplexity", q106, Some(q106Sql)),
    Q("q108_config_lm_score", q108, Some(q108Sql)),
    Q("q118_lm_keep_unscored", q118, Some(q118Sql)),
    Q("q128_url_dedup", q128, Some(q128Sql)),
    Q("q111_normalize_text", q111, Some(q111Sql)),
    Q("q144_html_extract", q144, Some(q144Sql)),
    Q("q145_config_html_extract", q145, Some(q144Sql)),
    Q("q146_warc_pipeline", q146, Some(q146Sql)),
    Q("q147_warc_gz_members", q147, Some(q147Sql)),
    Q("q148_web_curation_flagship", q148, Some(q148Sql)),
    Q("q152_pdf_extract", q152, Some(q152Sql)),
    Q("q153_config_pdf_extract", q153, Some(q152Sql)),
    Q("q162_pdf_tounicode", q162, Some(q162Sql)),
    Q("q156_bpe_train", q156, Some(q156Sql)),
    Q("q157_bpe_pack", q157, Some(q157Sql)),
    Q("q158_config_bpe", q158, Some(q156Sql)),
    Q("q164_bpe_apply_artifact", q164, Some(q164Sql)),
    Q("q159_mixed_lake_flagship", q159, Some(q159Sql)),
    Q("q169_pdf_image_inventory", q169, Some(q169Sql)),
    Q("q174_pdf_differences", q174, Some(q174Sql)),
    Q("q175_domain_blocklist", q175, Some(q175Sql)),
    Q("q178_pdf_encrypted", q178, Some(q178Sql)),
    Q("q179_http_crawl_path", q179, Some(q179Sql)),
    Q("q186_host_pagerank", q186, Some(q186Sql)),
    Q("q187_config_pagerank", q187, Some(q186Sql)),
    Q("q190_bm25_topk", q190, Some(q190Sql)),
    Q("q191_config_bm25", q191, Some(q190Sql)),
    Q("q254_bm25_index_search", q254, Some(q190Sql)),
    Q("q257_bm25_index_lifecycle", q257, Some(q190Sql)),
    Q("q275_bm25_ingest_lifecycle", q275, Some(q190Sql)),
    Q("q280_bm25_ingest_inline_compact", q280, Some(q190Sql)),
    Q("q258_bm25_index_stats", q258, Some(q258Sql)),
    Q("q261_weighted_rrf", q261, Some(q261Sql)),
    Q("q202_bm25_phrase", q202, Some(q202Sql)),
    Q("q226_rrf_fusion", q226, Some(q226Sql)),
    Q("q279_streamed_hybrid_search", q279, Some(q226Sql)),
    Q("q228_ranking_eval", q228, Some(q228Sql)),
    Q("q229_config_hybrid_search", q229, Some(q226Sql)),
    Q("q233_bpe_decode_roundtrip", q233, Some(q233Sql)),
    Q("q193_lm_kneser_ney", q193, Some(q193Sql)),
    Q("q196_crawl_to_shards", q196, Some(q196Sql)),
    Q("q197_robots_audit", q197, Some(q197Sql)),
    Q("q199_bpe_token_ids", q199, Some(q199Sql)),
    Q("q200_tokenized_shards", q200, Some(q200Sql)),
    Q("q203_sequence_pack", q203, Some(q203Sql)),
    Q("q206_pack_bounds", q206, Some(q206Sql)),
    Q("q207_pack_whole_doc", q207, Some(q207Sql)),
    Q("q208_training_batches_flagship", q208, Some(q208Sql)),
    Q("q247_incremental_release", q247, Some(q247Sql)),
    Q("q209_pack_best_fit", q209, Some(q209Sql)),
    Q("q211_config_chunk_ids", q211, Some(q211Sql)),
    Q("q213_chunk_pack_no_truncation", q213, Some(q213Sql))
  )

  // q209 — best-fit-decreasing packing under an exact oracle: the
  // recursive CTE carries the OPEN-WINDOW FILL LIST as its state — each
  // doc (length-desc, id-tiebreak order) either lands in the fullest
  // window that still fits (list_max of the fitting fills; first
  // occurrence = lowest window index, the engine's TreeSet tie rule) or
  // appends a new window — so the placement order, the tie rules, the
  // per-window doc offsets (the fill at placement), and the padding are
  // all restated independently of the TreeMap implementation.
  private def q209(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "derive": {"ids": "$packIdsExpr"},
       "sequence_pack": {"id_col": "doc_id", "ids_col": "ids",
                         "seq_len": 24, "eos_id": 0, "shards": 2,
                         "mode": "best_fit", "with_bounds": true,
                         "pad_id": 999},
       "with_columns": {"fold": "$idFold", "bfold": "$boundFold"},
       "drop": ["ids", "doc_starts"],
       "order_by": ["shard asc", "seq asc"]}""")
  }
  private lazy val q209Sql = {
    val fit = "list_max(list_filter(bf.fills, f -> f + d.l <= 24))"
    val idx = s"list_position(bf.fills, $fit)"
    s"""
    WITH RECURSIVE d0 AS (
      SELECT CAST(doc_id % 2 AS INT) AS shard, doc_id,
             list_append(($packIdsSql)[1 : 23], 0) AS idl
      FROM documents),
    d AS (
      SELECT shard, doc_id, idl, len(idl) AS l,
             row_number() OVER (PARTITION BY shard
                                ORDER BY len(idl) DESC, doc_id) AS i
      FROM d0),
    bf AS (
      SELECT shard, i, idl, l, CAST(0 AS BIGINT) AS seq, 0 AS off,
             [l] AS fills
      FROM d WHERE i = 1
      UNION ALL
      SELECT d.shard, d.i, d.idl, d.l,
             CASE WHEN $fit IS NULL THEN CAST(len(bf.fills) AS BIGINT)
                  ELSE CAST($idx - 1 AS BIGINT) END,
             CASE WHEN $fit IS NULL THEN 0 ELSE $fit END,
             CASE WHEN $fit IS NULL THEN list_append(bf.fills, d.l)
                  ELSE bf.fills[1 : $idx - 1] || [$fit + d.l]
                       || bf.fills[$idx + 1 : len(bf.fills)] END
      FROM bf JOIN d ON d.shard = bf.shard AND d.i = bf.i + 1),
    w AS (
      SELECT shard, seq, flatten(list(idl ORDER BY i)) AS ids,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
                                      list(CAST(off AS BIGINT) ORDER BY i)),
                         (a, x) -> (a * 31 + x) % 1000000007) AS bfold
      FROM bf GROUP BY shard, seq)
    SELECT shard, seq, CAST(len(ids) AS INT) AS n_tokens,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_concat(ids,
                 list_transform(range(24 - len(ids)), x -> 999))),
             (a, x) -> (a * 31 + x) % 1000000007) AS fold,
           bfold
    FROM w
    ORDER BY shard ASC NULLS FIRST, seq ASC NULLS FIRST"""
  }

  // q208 — the round-15 FLAGSHIP: the complete LM TRAINING-BATCH product
  // from one pure-JSON config — per-language TOKEN budgets
  // (token_budget_sample) pick the mixture, the artifact tokenizer maps
  // the survivors to stable ids (bpe_apply with_ids), sequence_pack
  // slices the id stream into fixed 32-token windows, and each window
  // ships as a big-endian member of deterministic WebDataset tar shards
  // (ints_binary + tar_pack). The gate is the q200 discipline composed
  // end-to-end: REPARSE every shard, decode every member back to ids,
  // and sum in-order Horner folds — so the budget boundary, the
  // tokenizer, the id map, the window slicing, the serialization, and
  // the archive bytes all sit under ONE exact oracle.
  private def q208(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q208_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
        {"id": "mix", "source": {"table": "documents"},
         "keep_columns": ["doc_id", "text", "lang", "n_chars"],
         "token_budget_sample": {"group_col": "lang", "id_col": "doc_id",
           "tokens_col": "n_chars",
           "budgets": {"en": 16384, "de": 8192, "es": 8192,
                       "fr": 8192, "zh": 8192}}},
        {"id": "packed", "source": {"ref": "mix"},
         "bpe_apply": {"text_col": "text", "merges_dir": "$mdir",
                       "with_ids": true},
         "sequence_pack": {"id_col": "doc_id", "ids_col": "bpe_ids",
                           "seq_len": 32, "eos_id": 0, "shards": 4},
         "with_columns": {"name": "concat('w', shard, '_', seq, '.ids')",
                          "data": "ints_binary(ids)"},
         "drop": ["shard", "seq", "ids", "n_tokens"]}],
       "source": {"ref": "packed"},
       "tar_pack": {"name_col": "name", "payload_col": "data", "shards": 2},
       "with_columns": {
         "fold_sum": "aggregate(tar_members(tar), cast(0 as bigint), (a, m) -> a + aggregate(binary_ints(m.data), cast(0 as bigint), (aa, x) -> (aa * 31 + x) % 1000000007))"},
       "drop": ["tar"],
       "order_by": ["shard asc"]}""")
  }
  /** The pack→tar restatement tail over an `ids` CTE (doc_id, idl):
    * eos-append, doc-ordered per-pshard concatenation, 32-token window
    * folds, sample-key tar sharding, and the record-padded archive-size
    * formula. Shared verbatim by q208 (budget-mixture source) and q247
    * (diff-delta source) — one mirror, two gates. */
  private val packTarSqlTail: String = s"""
    sh AS (
      SELECT CAST(doc_id % 4 AS INT) AS pshard, doc_id,
             list_append(idl, 0) AS idl
      FROM ids),
    cc AS (
      SELECT pshard, flatten(list(idl ORDER BY doc_id)) AS L
      FROM sh GROUP BY pshard),
    seqs AS (
      SELECT pshard,
             unnest([CAST(w - 1 AS BIGINT)
                     for w in generate_series(1, len(L) // 32)]) AS seq,
             unnest([list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         L[(w - 1) * 32 + 1 : (w - 1) * 32 + 32]),
                       (a, x) -> (a * 31 + x) % 1000000007)
                     for w in generate_series(1, len(L) // 32)]) AS fold
      FROM cc),
    m AS (
      -- tar_pack shards by the WebDataset SAMPLE KEY: the member name up
      -- to its last '.', so 'w3_17.ids' hashes as 'w3_17'
      SELECT CAST(list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(
                   range(1, len('w' || pshard || '_' || seq) + 1),
                   i -> CAST(ascii(('w' || pshard || '_' || seq)[i])
                             AS BIGINT))),
               (a, c) -> (a * 131 + c) % 1000000007) % 2 AS INT) AS shard,
             fold
      FROM seqs)
    SELECT shard, CAST(COUNT(*) AS INT) AS n_members,
           CAST(((1024 + SUM(512 + 512) + 10239) // 10240) * 10240
                AS BIGINT) AS tar_bytes,
           CAST(SUM(fold) AS BIGINT) AS fold_sum
    FROM m GROUP BY shard ORDER BY shard ASC NULLS FIRST"""

  // q247 — INCREMENTAL RELEASE flagship: the r16 snapshot-diff key feeds
  // the r15 training last mile. The previous corpus snapshot (a def with
  // a planted extraction-bug truncation on id % 7 = 0 and missing
  // id % 11 = 0 docs) diffs against the current corpus; ONLY the delta
  // (added + changed, carry: "new") is re-tokenized, re-packed into
  // 32-token windows, and re-shipped as WebDataset tar shards — the
  // incremental re-release a 100 TB pipeline runs nightly instead of
  // re-packing the world. Gate: the q208 discipline over the delta —
  // REPARSE every shard byte, decode every member, sum in-order Horner
  // folds; the diff verdict set, the tokenizer, the window slicing, and
  // the archive bytes all under ONE exact oracle (shared tail mirror).
  private def q247(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q247_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
        {"id": "oldsnap", "source": {"table": "documents"},
         "filters": ["doc_id % 11 != 0"],
         "derive": {"text": "if(doc_id % 7 = 0, substring(text, 1, 10), text)"},
         "keep_columns": ["doc_id", "text"]},
        {"id": "delta", "source": {"table": "documents"},
         "keep_columns": ["doc_id", "text"],
         "diff": {"on": ["doc_id"], "ref": "oldsnap",
                  "compare": ["text"], "carry": "new"}},
        {"id": "packed", "source": {"ref": "delta"},
         "bpe_apply": {"text_col": "text", "merges_dir": "$mdir",
                       "with_ids": true},
         "sequence_pack": {"id_col": "doc_id", "ids_col": "bpe_ids",
                           "seq_len": 32, "eos_id": 0, "shards": 4},
         "with_columns": {"name": "concat('w', shard, '_', seq, '.ids')",
                          "data": "ints_binary(ids)"},
         "drop": ["shard", "seq", "ids", "n_tokens"]}],
       "source": {"ref": "packed"},
       "tar_pack": {"name_col": "name", "payload_col": "data", "shards": 2},
       "with_columns": {
         "fold_sum": "aggregate(tar_members(tar), cast(0 as bigint), (a, m) -> a + aggregate(binary_ints(m.data), cast(0 as bigint), (aa, x) -> (aa * 31 + x) % 1000000007))"},
       "drop": ["tar"],
       "order_by": ["shard asc"]}""")
  }
  private lazy val q247Sql = s"""
    WITH oldsnap AS (
      SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN substr(text, 1, 10)
                          ELSE text END AS otext
      FROM documents WHERE doc_id % 11 <> 0),
    sel AS (
      SELECT d.doc_id, d.text
      FROM documents d LEFT JOIN oldsnap o ON d.doc_id = o.doc_id
      WHERE o.doc_id IS NULL OR d.text IS DISTINCT FROM o.otext),
    ${bpeIdsCteFrom("sel")},
    $packTarSqlTail"""

  private lazy val q208Sql = s"""
    WITH b(grp, budget) AS (VALUES ('en', 16384), ('de', 8192),
                                   ('es', 8192), ('fr', 8192), ('zh', 8192)),
    hh AS (
      SELECT doc_id, lang, n_chars, text,
             (((doc_id % 1000000 + 1000000) % 1000000) * 1103515245)
               % 1000000 AS h
      FROM documents),
    cum AS (
      SELECT doc_id, lang, text,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY lang ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
      FROM hh),
    sel AS (
      SELECT cum.doc_id, cum.text
      FROM cum JOIN b ON cum.lang = b.grp WHERE cum.c < b.budget),
    ${bpeIdsCteFrom("sel")},
    $packTarSqlTail"""

  // q206/q207 — the two round-15 packing extensions under exact oracles,
  // over a synthetic engine-portable id array (sequence + modular
  // arithmetic — the pack semantics are about POSITIONS, so the gate
  // salts values by doc to catch misalignment). q206: split mode with
  // `with_bounds` — every window's doc-start slots (position-id reset
  // points) fold under init 7 next to the q203-style id fold (init 0), so
  // boundary arithmetic is gated exactly, including the empty-starts
  // continuation window (fold == init). q207: whole-doc next-fit mode
  // (docs never split, truncate-to-fit, pad_id) — the oracle restates the
  // sequential fold as a recursive CTE whose per-doc state (seq, fill)
  // IS the next-fit recurrence, and each doc's start slot falls out as
  // fill − len.
  private val packIdsExpr =
    "transform(sequence(1, pmod(n_chars, 50) + 1), " +
      "i -> cast((doc_id * 31 + i) % 1000 as int))"
  private val packIdsSql =
    "list_transform(generate_series(1, n_chars % 50 + 1), " +
      "i -> CAST((doc_id * 31 + i) % 1000 AS INT))"
  private val idFold =
    "aggregate(ids, cast(0 as bigint), (a, x) -> (a * 31 + x) % 1000000007)"
  private val boundFold =
    "aggregate(doc_starts, cast(7 as bigint), (a, x) -> (a * 31 + x) % 1000000007)"
  private def q206(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "derive": {"ids": "$packIdsExpr"},
       "sequence_pack": {"id_col": "doc_id", "ids_col": "ids",
                         "seq_len": 16, "eos_id": 0, "shards": 2,
                         "with_bounds": true},
       "with_columns": {"fold": "$idFold", "bfold": "$boundFold"},
       "drop": ["ids", "doc_starts"],
       "order_by": ["shard asc", "seq asc"]}""")
  }
  private lazy val q206Sql = s"""
    WITH d AS (
      SELECT doc_id, CAST(doc_id % 2 AS INT) AS shard,
             list_append($packIdsSql, 0) AS idl
      FROM documents),
    cc AS (
      SELECT shard, flatten(list(idl ORDER BY doc_id)) AS L,
             list(len(idl) ORDER BY doc_id) AS lens
      FROM d GROUP BY shard),
    so AS (
      SELECT shard, L,
             [COALESCE(list_sum(lens[1 : j - 1]), 0)
              for j in generate_series(1, len(lens))] AS offs
      FROM cc),
    seqs AS (
      SELECT shard,
             unnest([CAST(w - 1 AS BIGINT)
                     for w in generate_series(1, len(L) // 16)]) AS seq,
             unnest([list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         L[(w - 1) * 16 + 1 : (w - 1) * 16 + 16]),
                       (a, x) -> (a * 31 + x) % 1000000007)
                     for w in generate_series(1, len(L) // 16)]) AS fold
      FROM so),
    st AS (
      SELECT shard, s // 16 AS seq, CAST(s % 16 AS BIGINT) AS slot
      FROM (SELECT shard, unnest(offs) AS s FROM so)),
    bf AS (
      SELECT shard, seq,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
                                      list(slot ORDER BY slot)),
                         (a, x) -> (a * 31 + x) % 1000000007) AS bfold
      FROM st GROUP BY shard, seq)
    SELECT q.shard, q.seq, CAST(16 AS INT) AS n_tokens, q.fold,
           COALESCE(bf.bfold, 7) AS bfold
    FROM seqs q LEFT JOIN bf ON q.shard = bf.shard AND q.seq = bf.seq
    ORDER BY q.shard ASC NULLS FIRST, q.seq ASC NULLS FIRST"""
  private def q207(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "derive": {"ids": "$packIdsExpr"},
       "sequence_pack": {"id_col": "doc_id", "ids_col": "ids",
                         "seq_len": 24, "eos_id": 0, "shards": 2,
                         "mode": "whole", "drop_last": false,
                         "with_bounds": true, "pad_id": 999},
       "with_columns": {"fold": "$idFold", "bfold": "$boundFold"},
       "drop": ["ids", "doc_starts"],
       "order_by": ["shard asc", "seq asc"]}""")
  }
  private lazy val q207Sql = s"""
    WITH RECURSIVE d AS (
      SELECT CAST(doc_id % 2 AS INT) AS shard,
             row_number() OVER (PARTITION BY doc_id % 2
                                ORDER BY doc_id) AS i,
             list_append(($packIdsSql)[1 : 23], 0) AS idl
      FROM documents),
    dl AS (SELECT shard, i, idl, len(idl) AS l FROM d),
    nf AS (
      SELECT shard, i, idl, l, CAST(0 AS BIGINT) AS seq,
             CAST(l AS BIGINT) AS fill
      FROM dl WHERE i = 1
      UNION ALL
      SELECT dl.shard, dl.i, dl.idl, dl.l,
             CASE WHEN nf.fill + dl.l <= 24 THEN nf.seq ELSE nf.seq + 1 END,
             CASE WHEN nf.fill + dl.l <= 24 THEN nf.fill + dl.l
                  ELSE CAST(dl.l AS BIGINT) END
      FROM nf JOIN dl ON dl.shard = nf.shard AND dl.i = nf.i + 1),
    w AS (
      SELECT shard, seq, flatten(list(idl ORDER BY i)) AS ids,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
                                      list(fill - l ORDER BY i)),
                         (a, x) -> (a * 31 + x) % 1000000007) AS bfold
      FROM nf GROUP BY shard, seq)
    SELECT shard, seq, CAST(len(ids) AS INT) AS n_tokens,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_concat(ids,
                 list_transform(range(24 - len(ids)), x -> 999))),
             (a, x) -> (a * 31 + x) % 1000000007) AS fold,
           bfold
    FROM w
    ORDER BY shard ASC NULLS FIRST, seq ASC NULLS FIRST"""

  // q203 — fixed-length TRAINING SEQUENCES from PURE JSON: artifact
  // tokenizer → stable ids → per-shard EOS-separated concatenation in
  // doc order, sliced every 32 tokens (`sequence_pack`) — the rows an LM
  // trainer actually consumes, where q200 ships per-doc files. The gate
  // Horner-folds every packed window IN ORDER, so the tokenizer, the id
  // map, the shard assignment, the concatenation order, the EOS
  // separators, and the window boundaries all sit under one exact
  // oracle (the q199 id mirror + per-shard flatten + slice arithmetic).
  private def q203(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q203_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "keep_columns": ["doc_id", "text"],
       "bpe_apply": {"text_col": "text", "merges_dir": "$mdir",
                     "with_ids": true},
       "sequence_pack": {"id_col": "doc_id", "ids_col": "bpe_ids",
                         "seq_len": 32, "eos_id": 0, "shards": 4},
       "with_columns": {"fold": "aggregate(ids, cast(0 as bigint), (a, x) -> (a * 31 + x) % 1000000007)"},
       "drop": ["ids"],
       "order_by": ["shard asc", "seq asc"]}""")
  }
  private lazy val q203Sql = s"""
    WITH $bpeIdsCte,
    sh AS (
      SELECT CAST(doc_id % 4 AS INT) AS shard, doc_id, list_append(idl, 0) AS idl
      FROM ids),
    cc AS (
      SELECT shard, flatten(list(idl ORDER BY doc_id)) AS L
      FROM sh GROUP BY shard),
    seqs AS (
      SELECT shard,
             unnest([CAST(i - 1 AS BIGINT)
                     for i in generate_series(1, len(L) // 32)]) AS seq,
             unnest([list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         L[(i - 1) * 32 + 1 : (i - 1) * 32 + 32]),
                       (a, x) -> (a * 31 + x) % 1000000007)
                     for i in generate_series(1, len(L) // 32)]) AS fold
      FROM cc)
    SELECT shard, seq, CAST(32 AS INT) AS n_tokens, fold
    FROM seqs
    ORDER BY shard ASC NULLS FIRST, seq ASC NULLS FIRST"""

  // q211 — sliding-window chunking from the config language, TOKEN-ID
  // tier: bpe_apply with_ids → chunk over the id arrays (size 12,
  // overlap 4) in ONE node — the context-window prep for embedding /
  // no-truncation packing pipelines. Scan-stage generator: no shuffle;
  // the oracle restates the window rule (⌈(n − overlap) / stride⌉ chunks,
  // chunk k = idl[k·stride+1 : k·stride+size]) over the independent
  // DuckDB BPE chain and Horner-folds each chunk.
  private def q211(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q211_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "keep_columns": ["doc_id", "text"],
       "bpe_apply": {"text_col": "text", "merges_dir": "$mdir",
                     "with_ids": true},
       "chunk": {"id_col": "doc_id", "ids_col": "bpe_ids",
                 "size": 12, "overlap": 4},
       "with_columns": {"fold": "aggregate(chunk_ids, cast(0 as bigint), (a, x) -> (a * 31 + x) % 1000000007)"},
       "drop": ["chunk_ids"],
       "order_by": ["doc_id asc", "chunk_id asc"]}""")
  }
  private lazy val q211Sql = s"""
    WITH $bpeIdsCte,
    d AS (SELECT doc_id, idl, len(idl) AS n FROM ids WHERE len(idl) > 0),
    k AS (SELECT doc_id, idl,
                 unnest(range(0, greatest(1,
                   CAST(ceil((n - 4) / 8.0) AS BIGINT)))) AS c
          FROM d),
    ch AS (SELECT doc_id, c, idl[c * 8 + 1 : c * 8 + 12] AS cids FROM k)
    SELECT doc_id, CAST(c AS INT) AS chunk_id,
           CAST(len(cids) AS INT) AS n_tokens,
           list_reduce(list_prepend(CAST(0 AS BIGINT), cids),
             (a, x) -> (a * 31 + x) % 1000000007) AS fold
    FROM ch
    ORDER BY doc_id ASC NULLS FIRST, chunk_id ASC NULLS FIRST"""

  // q213 — the NO-TRUNCATION packing pipeline, one config: bpe_apply →
  // chunk (token-id tier, overlap 0) → whole-doc sequence_pack. Long
  // documents arrive at the packer PRE-SPLIT into ≤ 12-token chunks, so
  // mode:"whole" never hits its truncate-to-fit rule — the lossless
  // composition the chunk ids tier exists for. Fixture-bounded to a
  // third of the corpus (doc_id % 3 = 0 — the q28 convention): the
  // oracle's next-fit recursive CTE steps once per CHUNK per shard.
  // Gates: the q207-style window/bound folds over chunks keyed by
  // cid = doc_id·1024 + chunk_id (the derived per-chunk pack id).
  private def q213(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q213_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
        {"id": "chunks",
         "source": {"table": "documents"},
         "filters": ["doc_id % 3 = 0"],
         "keep_columns": ["doc_id", "text"],
         "bpe_apply": {"text_col": "text", "merges_dir": "$mdir",
                       "with_ids": true},
         "chunk": {"id_col": "doc_id", "ids_col": "bpe_ids",
                   "size": 12, "overlap": 0}}],
       "id": "packed",
       "source": {"ref": "chunks"},
       "derive": {"cid": "doc_id * 1024 + chunk_id"},
       "sequence_pack": {"id_col": "cid", "ids_col": "chunk_ids",
                         "seq_len": 32, "eos_id": 0, "shards": 2,
                         "mode": "whole", "drop_last": false,
                         "with_bounds": true, "pad_id": 999},
       "with_columns": {"fold": "$idFold", "bfold": "$boundFold"},
       "drop": ["ids", "doc_starts"],
       "order_by": ["shard asc", "seq asc"]}""")
  }
  private lazy val q213Sql = s"""
    WITH RECURSIVE sel AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
    ${bpeIdsCteFrom("sel")},
    c0 AS (SELECT doc_id, idl, len(idl) AS n FROM ids WHERE len(idl) > 0),
    ck AS (SELECT doc_id, idl,
                  unnest(range(0, greatest(1,
                    CAST(ceil(n / 12.0) AS BIGINT)))) AS c
           FROM c0),
    ch AS (SELECT doc_id * 1024 + c AS cid,
                  idl[c * 12 + 1 : c * 12 + 12] AS cids
           FROM ck),
    d AS (
      SELECT CAST(cid % 2 AS INT) AS shard,
             row_number() OVER (PARTITION BY cid % 2 ORDER BY cid) AS i,
             list_append(cids[1 : 31], 0) AS idl2
      FROM ch),
    dl AS (SELECT shard, i, idl2, len(idl2) AS l FROM d),
    nf AS (
      SELECT shard, i, idl2, l, CAST(0 AS BIGINT) AS seq,
             CAST(l AS BIGINT) AS fill
      FROM dl WHERE i = 1
      UNION ALL
      SELECT dl.shard, dl.i, dl.idl2, dl.l,
             CASE WHEN nf.fill + dl.l <= 32 THEN nf.seq ELSE nf.seq + 1 END,
             CASE WHEN nf.fill + dl.l <= 32 THEN nf.fill + dl.l
                  ELSE CAST(dl.l AS BIGINT) END
      FROM nf JOIN dl ON dl.shard = nf.shard AND dl.i = nf.i + 1),
    w AS (
      SELECT shard, seq, flatten(list(idl2 ORDER BY i)) AS pids,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
                                      list(fill - l ORDER BY i)),
                         (a, x) -> (a * 31 + x) % 1000000007) AS bfold
      FROM nf GROUP BY shard, seq)
    SELECT shard, seq, CAST(len(pids) AS INT) AS n_tokens,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_concat(pids,
                 list_transform(range(32 - len(pids)), x -> 999))),
             (a, x) -> (a * 31 + x) % 1000000007) AS fold,
           bfold
    FROM w
    ORDER BY shard ASC NULLS FIRST, seq ASC NULLS FIRST"""

  // q200 — the COMPLETE training-data product, one config: artifact
  // tokenizer → stable ids → big-endian packed payloads → deterministic
  // WebDataset tar shards — then the gate REPARSES each shard, decodes
  // every member's bytes back to ids, and sums the per-member in-order
  // Horner folds, so the tokenizer, the id map, the serialization, the
  // archive bytes, and the parse are all under one exact oracle.
  private def q200(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q200_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
        {"id": "enc", "source": {"table": "documents"},
         "keep_columns": ["doc_id", "text"],
         "bpe_apply": {"text_col": "text", "merges_dir": "$mdir",
                       "with_ids": true},
         "with_columns": {"name": "concat('s', doc_id, '.ids')",
                          "data": "ints_binary(bpe_ids)"},
         "drop": ["doc_id", "text", "bpe_tokens", "n_bpe", "bpe_ids"]}],
       "source": {"ref": "enc"},
       "tar_pack": {"name_col": "name", "payload_col": "data", "shards": 3},
       "with_columns": {
         "fold_sum": "aggregate(tar_members(tar), cast(0 as bigint), (a, m) -> a + aggregate(binary_ints(m.data), cast(0 as bigint), (aa, x) -> (aa * 31 + x) % 1000000007))"},
       "drop": ["tar"],
       "order_by": ["shard asc"]}""")
  }
  private lazy val q200Sql = s"""
    WITH $bpeIdsCte,
    m AS (
      SELECT CAST(list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(range(1, len('s' || doc_id) + 1),
                   i -> CAST(ascii(('s' || doc_id)[i]) AS BIGINT))),
               (a, c) -> (a * 131 + c) % 1000000007) % 3 AS INT) AS shard,
             CAST(4 * len(idl) AS BIGINT) AS sz,
             list_reduce(list_prepend(CAST(0 AS BIGINT), idl),
               (a, x) -> (a * 31 + x) % 1000000007) AS fold
      FROM ids)
    SELECT shard,
           CAST(COUNT(*) AS INT) AS n_members,
           CAST(((1024 + SUM(512 + CAST(CEIL(sz / 512.0) * 512 AS BIGINT))
                  + 10239) // 10240) * 10240 AS BIGINT) AS tar_bytes,
           CAST(SUM(fold) AS BIGINT) AS fold_sum
    FROM m GROUP BY shard ORDER BY shard ASC NULLS FIRST"""

  // q199 — BPE ID ENCODING from a persisted artifact: the integer
  // sequences a training shard actually ships (single code points id as
  // themselves; merge k's symbol as 0x110000+k−1, so a grown merge list
  // only appends ids). The gate folds every document's id sequence IN
  // ORDER (Horner mod 1e9+7), so the tokenizer, the id mapping, AND the
  // sequence order are all under one exact oracle (restated as the q164
  // nested-replace mirror + a CASE id map + an in-order list fold).
  private def q199(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q199_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "keep_columns": ["doc_id", "text"],
       "bpe_apply": {"text_col": "text", "merges_dir": "$mdir", "with_ids": true},
       "with_columns": {
         "n_ids": "size(bpe_ids)",
         "ids_fold": "aggregate(bpe_ids, cast(0 as bigint), (a, x) -> (a * 31 + x) % 1000000007)"},
       "drop": ["text", "bpe_tokens", "n_bpe", "bpe_ids"],
       "order_by": ["doc_id asc"]}""")
  }
  /** Shared CTE chain: toks → `ids(doc_id, idl)` — each doc's BPE id
    * sequence under the q164 artifact (nested-replace tokenizer mirror +
    * CASE id map). Shared by q199/q200. */
  private lazy val bpeIdsCte = bpeIdsCteFrom("documents")
  /** The same chain over any (doc_id, text) relation — q208 scopes it to
    * the budget-sampled subset. */
  private def bpeIdsCteFrom(src: String): String = {
    val sym = "' ' || array_to_string(str_split_regex(w, ''), ' ') || ' '"
    val replaced = q164Merges.foldLeft(s"($sym)") {
      case (acc, (l, r)) => s"replace($acc, ' $l $r ', ' $l$r ')"
    }
    val idCase = q164Merges.zipWithIndex.map { case ((l, r), i) =>
      s"WHEN tok = '$l$r' THEN ${0x110000 + i}"
    }.mkString(" ")
    s"""toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM $src),
    ids AS (
      SELECT doc_id,
             flatten(list_transform(t, w ->
               list_transform(
                 list_filter(string_split($replaced, ' '), x -> len(x) > 0),
                 tok -> CASE $idCase ELSE unicode(tok) END))) AS idl
      FROM toks)"""
  }
  private lazy val q199Sql = s"""
    WITH $bpeIdsCte
    SELECT doc_id, CAST(len(idl) AS INT) AS n_ids,
           list_reduce(list_prepend(CAST(0 AS BIGINT), idl),
             (a, x) -> (a * 31 + x) % 1000000007) AS ids_fold
    FROM ids ORDER BY doc_id ASC NULLS FIRST"""

  // q197 — robots.txt compliance audit from PURE JSON (RFC 9309): every
  // doc gets a deterministic URL path and one site policy (a specific
  // graftbot group with prefix, longest-match-override, and $-anchored
  // wildcard rules, plus a deny-all * group the specific group must
  // shield from); robots_allowed decides each path and the oracle
  // restates the verdicts as modular arithmetic — precedence, anchoring,
  // and group selection are all under the hash gate.
  private def q197(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {
         "path": "case when doc_id % 6 = 2 then concat('/pub/f', doc_id, '.php') when doc_id % 3 = 0 then concat('/private/doc', doc_id) when doc_id % 3 = 1 then concat('/private/ok/doc', doc_id) else concat('/pub/doc', doc_id) end",
         "robots": "'User-agent: graftbot\\nDisallow: /private\\nAllow: /private/ok\\nDisallow: /*.php$\\n\\nUser-agent: *\\nDisallow: /'",
         "ok": "robots_allowed(robots, 'graftbot', path)"},
       "keep_columns": ["doc_id", "path", "ok"],
       "order_by": ["doc_id asc"]}""")
  }
  private val q197Sql = """
    SELECT doc_id,
           CASE WHEN doc_id % 6 = 2 THEN '/pub/f' || doc_id || '.php'
                WHEN doc_id % 3 = 0 THEN '/private/doc' || doc_id
                WHEN doc_id % 3 = 1 THEN '/private/ok/doc' || doc_id
                ELSE '/pub/doc' || doc_id END AS path,
           CASE WHEN doc_id % 6 = 2 THEN false
                WHEN doc_id % 3 = 0 THEN false
                ELSE true END AS ok
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  // q196 — crawl → TRAINING SHARDS, one pure-JSON config: each doc
  // becomes a WARC response (in-query fixture), the container kernel
  // parses it, html_extract recovers the text, a token-count gate
  // curates, and tar_pack writes deterministic WebDataset shards — the
  // complete ingest-to-package story through registered functions
  // (warc_records / html_extract / tar_members all reachable from expr
  // strings). The gate reaches THROUGH THE ARCHIVE BYTES: members_fp
  // re-parses each shard and sums the portable fingerprint of every
  // member's text, which the oracle recomputes from the source table
  // (html_extract normalizes whitespace, and the fingerprint is
  // token-based, so fp(body_text) = fp(text) — the q146 identity).
  private def q196(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {
         "payload": "concat('<html><head><title>D', doc_id, '</title></head><body><p>', text, '</p></body></html>')",
         "warc": "cast(concat('WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://ex.com/doc/', doc_id, '\r\nContent-Length: ', length(payload), '\r\n\r\n', payload, '\r\n\r\n') as binary)",
         "rec": "element_at(filter(warc_records(warc), r -> r.warc_type = 'response'), 1)",
         "body": "html_extract(cast(rec.payload as string)).body_text",
         "name": "concat('d', doc_id, '.txt')",
         "data": "cast(body as binary)"},
       "filters": ["token_count(body) >= 5"],
       "keep_columns": ["name", "data"],
       "tar_pack": {"name_col": "name", "payload_col": "data", "shards": 3},
       "with_columns": {
         "members_fp": "aggregate(tar_members(tar), cast(0 as bigint), (a, m) -> a + doc_fingerprint_portable(cast(m.data as string)))"},
       "drop": ["tar"],
       "order_by": ["shard asc"]}""")
  }
  private val q196Sql = s"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    f AS (SELECT doc_id, t FROM toks WHERE len(t) >= 5),
    m AS (
      SELECT CAST(list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(range(1, len('d' || doc_id) + 1),
                   i -> CAST(ascii(('d' || doc_id)[i]) AS BIGINT))),
               (a, c) -> (a * 131 + c) % 1000000007) % 3 AS INT) AS shard,
             strlen(array_to_string(t, ' ')) AS sz,
             ${fpSql("t")} AS bfp
      FROM f)
    SELECT shard,
           CAST(COUNT(*) AS INT) AS n_members,
           CAST(((1024 + SUM(512 + CAST(CEIL(sz / 512.0) * 512 AS BIGINT))
                  + 10239) // 10240) * 10240 AS BIGINT) AS tar_bytes,
           CAST(SUM(bfp) AS BIGINT) AS members_fp
    FROM m GROUP BY shard ORDER BY shard ASC NULLS FIRST"""

  // q193 — Kneser–Ney LM perplexity (the KenLM/CCNet-production
  // smoothing family) from PURE JSON: interpolated absolute-discount
  // bigram scores with continuation probabilities. The oracle restates
  // the whole model — c12/c1, distinct continuations per left word,
  // distinct left-contexts per right word, total bigram types, the
  // discounted-interpolated probability, and the per-doc decimal mean.
  private def q193(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "lm_perplexity": {"id_col": "doc_id", "text_col": "text",
                         "smoothing": "kn", "discount": 0.75},
       "order_by": ["doc_id asc"]}""")
  private val q193Sql = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS t
      FROM documents),
    bg AS (
      SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                             for i in generate_series(1, len(t)-1)]) AS bg
      FROM toks WHERE len(t) >= 2),
    c12 AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY 1),
    c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    n1l AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(COUNT(*) AS BIGINT) AS n1l
            FROM c12 GROUP BY 1),
    n1r AS (SELECT split_part(bg, ' ', -1) AS w2, CAST(COUNT(*) AS BIGINT) AS n1r
            FROM c12 GROUP BY 1),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM c12),
    lp AS (
      SELECT doc_id,
             ROUND(LN((GREATEST(c12.c12 - 0.75e0, 0e0)
                + 0.75e0 * n1l.n1l * (n1r.n1r / tt.tt)) / c1.c1), 6) AS lp
      FROM bg
      JOIN c12 USING (bg)
      JOIN c1 ON split_part(bg.bg, ' ', 1) = c1.w1
      JOIN n1l ON split_part(bg.bg, ' ', 1) = n1l.w1
      JOIN n1r ON split_part(bg.bg, ' ', -1) = n1r.w2
      CROSS JOIN tt)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(-(CAST(SUM(CAST(lp AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)), 6) AS nll
    FROM lp GROUP BY 1
    ORDER BY doc_id ASC NULLS FIRST"""

  // q190 — BM25 top-5 retrieval (Lucene variant, k1=1.2 b=0.75): three
  // audit queries against the whole corpus. The oracle restates the
  // ENTIRE ranking — postings, document frequencies, avgdl, per-term
  // 9-dp contributions summed in DECIMAL, 6-dp scores, doc-id
  // tie-broken row_number — so idf/tf/normalization regressions all
  // fail the hash gate.
  private val bm25Queries = Seq(
    (1L, "spark hash join"), (2L, "window agg batch"), (3L, "vector stream sort"))
  private def q190(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = bm25Queries.toDF("qid", "qtext")
    graft.ops.Retrieval.bm25TopK(
        docs(s, dir), "doc_id", "text", qs, "qid", "qtext", topK = 5)
      .orderBy(col("qid").asc_nulls_first, col("rn").asc_nulls_first)
  }
  /** The q190 BM25 CTE chain through `ranked` — shared verbatim by the
    * q226 fusion oracle (its lexical list must be byte-identical to
    * q190's ranking). */
  private val bm25CtesSql = s"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(dl) AS DOUBLE) / COUNT(*), 9) AS avgdl
      FROM dl),
    post AS (
      SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, tok),
    dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
    q AS (SELECT * FROM (VALUES ${bm25Queries
        .map { case (i, t) => s"($i, '$t')" }.mkString(", ")}) AS v(qid, qtext)),
    qt AS (
      SELECT DISTINCT qid, unnest(
        list_filter(string_split_regex(trim(qtext), '\\s+'), x -> len(x) > 0)) AS term
      FROM q),
    sc AS (
      SELECT qt.qid, post.doc_id,
             ROUND(ROUND(ln(1e0 + (stats.n - dft.df + 0.5e0) / (dft.df + 0.5e0)), 9)
               * (post.tf * (1.2e0 + 1e0))
               / (post.tf + 1.2e0 * ((1e0 - 0.75e0)
                  + 0.75e0 * dl.dl / stats.avgdl)), 9) AS s
      FROM qt
      JOIN post ON post.term = qt.term
      JOIN dft ON dft.term = qt.term
      JOIN dl ON dl.doc_id = post.doc_id
      CROSS JOIN stats),
    agg AS (
      SELECT qid, doc_id,
             ROUND(CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
      FROM sc GROUP BY qid, doc_id),
    ranked AS (
      SELECT qid, doc_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY score DESC, doc_id ASC) AS INT) AS rn
      FROM agg)"""
  private val q190Sql = s"""$bm25CtesSql
    SELECT qid, doc_id, score, rn FROM ranked WHERE rn <= 5
    ORDER BY qid ASC NULLS FIRST, rn ASC NULLS FIRST"""

  // q254 — BM25 against the AT-REST index (`bm25_index` + `bm25_search`):
  // the corpus tokenizes ONCE into bucket-partitioned postings from pure
  // JSON, and a JSON search against the artifact must be BIT-IDENTICAL
  // to q190's in-memory ranking — same oracle, verbatim. The artifact
  // amortizes the expensive pass (at 100 TB, the full-corpus tokenize +
  // postings shuffle) across every future audit query batch; the query
  // terms' buckets prune the postings scan.
  private val q254IdxDir =
    s"${System.getProperty("java.io.tmpdir")}/graft_q254_bm25"
  private def q254(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "bm25_index": {"id_col": "doc_id", "text_col": "text",
                      "dir": "$q254IdxDir", "buckets": 16}}""")
    import s.implicits._
    bm25Queries.toDF("qid", "qtext")
      .createOrReplaceTempView("bm25_queries_q254")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "bm25_queries_q254"},
       "bm25_search": {"qid_col": "qid", "qtext_col": "qtext",
                       "index_dir": "$q254IdxDir", "top_k": 5},
       "order_by": ["qid asc", "rn asc"]}""")
  }

  // q257 — the FULL BM25 index LIFECYCLE under one driver gate, all from
  // pure JSON: build over the even-doc half → append the odd half →
  // compact the fragmented buckets → search — which must STILL equal
  // q190's in-memory ranking over the WHOLE corpus (same oracle,
  // verbatim): append is exact (df computes at search time over the
  // union) and compaction is invisible. The maintenance chain a
  // long-running corpus audit actually performs, end to end.
  private val q257IdxDir =
    s"${System.getProperty("java.io.tmpdir")}/graft_q257_bm25"
  private def q257(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    rmrf(new java.io.File(q257IdxDir))
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0"},
       "bm25_index": {"id_col": "doc_id", "text_col": "text",
                      "dir": "$q257IdxDir", "buckets": 16}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1"},
       "bm25_index": {"id_col": "doc_id", "text_col": "text",
                      "dir": "$q257IdxDir", "mode": "append"}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "bm25_index": {"dir": "$q257IdxDir", "mode": "compact"}}""")
    import s.implicits._
    bm25Queries.toDF("qid", "qtext")
      .createOrReplaceTempView("bm25_queries_q257")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "bm25_queries_q257"},
       "bm25_search": {"qid_col": "qid", "qtext_col": "qtext",
                       "index_dir": "$q257IdxDir", "top_k": 5},
       "order_by": ["qid asc", "rn asc"]}""")
  }

  // q275 — CONTINUOUS lexical ingest (`bm25_ingest`) under the driver
  // hash: seed the index over the even-doc half (JSON), stream the odd
  // half through the bm25_ingest root sink (file-source stream over a
  // staged parquet dir — each micro-batch lands as an overwritten
  // batch=<id> delta partition, the idempotent-replay layout), compact
  // to fold the delta into the base, then search — which must STILL
  // equal q190's in-memory ranking over the WHOLE corpus (same oracle
  // verbatim): streamed appends are exact because df/idf/avgdl compute
  // query-shaped at search time, and the delta fold is bit-invisible.
  private val q275Base =
    s"${System.getProperty("java.io.tmpdir")}/graft_q275_bm25"

  /** Shared lifecycle scaffold for the streamed-ingest gates (q275,
    * q280): seed the index over the even docs, stage the odd docs and
    * stream them through the bm25_ingest sink, compact SCOPED TO THE
    * INGEST CHECKPOINT's committed batches (the stream is quiesced with
    * everything committed, so the scoped fold folds it all —
    * hash-identical to an unscoped compact while gating
    * lastCommittedBatch + the scoped fold under the driver hash), then
    * search — which must equal q190's in-memory ranking over the WHOLE
    * corpus (same oracle verbatim). */
  private def bm25IngestLifecycle(
      s: SparkSession, dir: String, base: String, tag: String,
      stageFiles: Int, oneFilePerBatch: Boolean,
      compactEvery: Option[Int]): DataFrame = {
    Tables.registerViews(s, dir)
    rmrf(new java.io.File(base))
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0"},
       "bm25_index": {"id_col": "doc_id", "text_col": "text",
                      "dir": "$base/idx", "buckets": 16}}""")
    s.sql("SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1")
      .repartition(stageFiles).write.mode("overwrite").parquet(s"$base/in")
    val srcOpts =
      if (oneFilePerBatch) """, "options": {"maxFilesPerTrigger": "1"}""" else ""
    val ce = compactEvery.map(n => s""", "compact_every": $n""").getOrElse("")
    val q = graft.compile.Compiler.compileStreamJson(s, s"""
      {"source": {"path": "$base/in"$srcOpts},
       "bm25_ingest": {"id_col": "doc_id", "text_col": "text",
                       "index_dir": "$base/idx",
                       "checkpoint_dir": "$base/ckpt"$ce}}""")
    try q.processAllAvailable() finally q.stop()
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "bm25_index": {"dir": "$base/idx", "mode": "compact",
                      "checkpoint": "$base/ckpt"}}""")
    import s.implicits._
    bm25Queries.toDF("qid", "qtext")
      .createOrReplaceTempView(s"bm25_queries_$tag")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "bm25_queries_$tag"},
       "bm25_search": {"qid_col": "qid", "qtext_col": "qtext",
                       "index_dir": "$base/idx", "top_k": 5},
       "order_by": ["qid asc", "rn asc"]}""")
  }

  private def q275(s: SparkSession, dir: String): DataFrame =
    bm25IngestLifecycle(s, dir, q275Base, "q275",
      stageFiles = 2, oneFilePerBatch = false, compactEvery = None)

  // q280 — UNATTENDED continuous ingest (`compact_every`) under the
  // driver hash: q275's lifecycle with the maintenance loop CLOSED —
  // the stream is throttled to one staged file per micro-batch
  // (maxFilesPerTrigger) so the in-stream fold actually fires
  // (compact_every: 2 folds the committed prior batches INSIDE
  // foreachBatch), then the final checkpoint-scoped compact folds the
  // tail. Search must STILL equal q190's in-memory ranking over the
  // whole corpus (same oracle verbatim): in-stream folds move rows
  // delta → base and are bit-invisible to the query-shaped df/idf/avgdl.
  private val q280Base =
    s"${System.getProperty("java.io.tmpdir")}/graft_q280_bm25"
  private def q280(s: SparkSession, dir: String): DataFrame =
    bm25IngestLifecycle(s, dir, q280Base, "q280",
      stageFiles = 3, oneFilePerBatch = true, compactEvery = Some(2))

  // q258 — BM25 index HEALTH (`bm25_index mode:"stats"`), the lexical
  // twin of q250: n_docs and sum_dl are EXACT mirrors of the corpus
  // (the stored stats row), n_postings is exactly the count of DISTINCT
  // (doc, token) pairs (the oracle recomputes it from scratch in
  // DuckDB), and the bucket-skew gauge is gated by internal consistency
  // (mean·buckets = n_postings; skew = max/mean; max within bounds) —
  // the hash placement itself is engine arithmetic the oracle doesn't
  // restate.
  private val q258IdxDir =
    s"${System.getProperty("java.io.tmpdir")}/graft_q258_bm25"
  private def q258(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "bm25_index": {"id_col": "doc_id", "text_col": "text",
                      "dir": "$q258IdxDir", "buckets": 16}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "bm25_index": {"dir": "$q258IdxDir", "mode": "stats"}}""")
      .select(
        col("n_docs"), col("sum_dl"), col("buckets"), col("prox"),
        col("n_postings"),
        (abs(col("mean_bucket_n") * col("buckets") - col("n_postings")) < lit(1e-6))
          .as("mean_ok"),
        (col("max_bucket_n") >= ceil(col("mean_bucket_n")) &&
          col("max_bucket_n") <= col("n_postings")).as("max_ok"),
        (abs(col("skew") - col("max_bucket_n") / col("mean_bucket_n")) < lit(1e-6))
          .as("skew_ok"))
  }
  private val q258Sql = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS t
      FROM documents),
    post AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks))
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(SUM(len(t)) AS BIGINT) FROM toks) AS sum_dl,
           16 AS buckets, FALSE AS prox,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           TRUE AS mean_ok, TRUE AS max_ok, TRUE AS skew_ok
    FROM post"""

  // q226 — HYBRID retrieval via reciprocal-rank fusion: the lexical BM25
  // top-5 (q190's exact ranking) and a dense cosine top-5 (each query id
  // paired with the embeddings-table vector of the same id; brute-force
  // verify tier, self-match excluded — the q31 discipline) fuse by
  // rrf = Σ 1/(60 + rank) — the score-calibration-free combiner every
  // hybrid search stack runs (RRF, SIGIR'09). The oracle replays BOTH
  // rankings independently (the q190 CTE chain verbatim + the q31 cosine
  // mirror) and the fusion arithmetic: 9-dp reciprocal weights summed in
  // DECIMAL, fused score 9-dp, ties by doc id. Scale: both inputs are
  // top-k-shaped; the fuse is one (query, doc) aggregate + one
  // WindowGroupLimit window — corpus size never enters the fusion.
  private def q226(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = bm25Queries.toDF("qid", "qtext")
    val lex = graft.ops.Retrieval.bm25TopK(
        docs(s, dir), "doc_id", "text", qs, "qid", "qtext", topK = 5)
      .select(col("qid"), col("doc_id"), col("rn").as("rank"))
    val e = graft.Tables.load(s, dir, "embeddings")
    val dense = graft.ops.Similarity.cosineTopK(
        e.filter(col("vec_id").isin(1L, 2L, 3L))
          .select(col("vec_id").as("qid"), col("embedding")),
        e.select(col("vec_id").as("doc_id"), col("embedding")),
        queryId = "qid", queryVec = "embedding",
        corpusId = "doc_id", corpusVec = "embedding", k = 5)
      .select(col("qid"), col("doc_id"), col("rank"))
    graft.ops.Retrieval.rrfFuse(
        lex.unionByName(dense), "qid", "doc_id", "rank", topK = 5)
      .orderBy(col("qid").asc_nulls_first, col("rn").asc_nulls_first)
  }
  /** The shared lexical+dense ranked-list CTEs (through `lex`/`dense`) —
    * used verbatim by the q226 (unweighted) and q261 (weighted) fusion
    * oracles; only the reciprocal-weight arithmetic differs. */
  private val hybridCtesSql = s"""$bm25CtesSql,
    lex AS (SELECT qid, doc_id, rn AS rank FROM ranked WHERE rn <= 5),
    denseq AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id IN (1, 2, 3)),
    dscored AS (
      SELECT qid, c.vec_id AS doc_id,
             ${SimQueries.duckCosine("qe", "c.embedding")} AS dscore
      FROM denseq, embeddings c WHERE c.vec_id <> qid),
    dense AS (
      SELECT qid, doc_id, rank FROM (
        SELECT qid, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY dscore DESC, doc_id ASC) AS INT) AS rank
        FROM dscored) WHERE rank <= 5)"""
  /** Fusion tail over `unioned(qid, doc_id, rank, w)` — the exact RRF
    * arithmetic (9-dp reciprocal, DECIMAL sum, 9-dp score, id ties). */
  private def rrfTailSql(lexW: String, denseW: String) = s"""
    unioned AS (
      SELECT qid, doc_id, rank, $lexW AS w FROM lex
      UNION ALL SELECT qid, doc_id, rank, $denseW AS w FROM dense),
    fused AS (
      SELECT qid, doc_id,
             ROUND(CAST(SUM(CAST(ROUND(w / (60 + rank), 9)
               AS DECIMAL(38,12))) AS DOUBLE), 9) AS rrf_score
      FROM unioned GROUP BY qid, doc_id),
    franked AS (
      SELECT qid, doc_id, rrf_score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rn
      FROM fused)
    SELECT qid, doc_id, rrf_score, rn FROM franked WHERE rn <= 5
    ORDER BY qid ASC NULLS FIRST, rn ASC NULLS FIRST"""
  private val q226Sql = s"""$hybridCtesSql, ${rrfTailSql("1e0", "1e0")}"""

  // q261 — WEIGHTED hybrid fusion (the tuning knob every hybrid stack
  // exposes: "lexical x1.0 + dense x0.5"): the same two ranked lists as
  // q226, each tagged with its list weight upstream, fused by
  // w/(60+rank). The oracle replays both rankings AND the weighted
  // arithmetic; q226's hash is unchanged (weight 1.0 twice == plain).
  private def q261(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = bm25Queries.toDF("qid", "qtext")
    val lex = graft.ops.Retrieval.bm25TopK(
        docs(s, dir), "doc_id", "text", qs, "qid", "qtext", topK = 5)
      .select(col("qid"), col("doc_id"), col("rn").as("rank"))
      .withColumn("w", lit(1.0))
    val e = graft.Tables.load(s, dir, "embeddings")
    val dense = graft.ops.Similarity.cosineTopK(
        e.filter(col("vec_id").isin(1L, 2L, 3L))
          .select(col("vec_id").as("qid"), col("embedding")),
        e.select(col("vec_id").as("doc_id"), col("embedding")),
        queryId = "qid", queryVec = "embedding",
        corpusId = "doc_id", corpusVec = "embedding", k = 5)
      .select(col("qid"), col("doc_id"), col("rank"))
      .withColumn("w", lit(0.5))
    graft.ops.Retrieval.rrfFuse(
        lex.unionByName(dense), "qid", "doc_id", "rank", topK = 5,
        weightCol = Some("w"))
      .orderBy(col("qid").asc_nulls_first, col("rn").asc_nulls_first)
  }
  private val q261Sql = s"""$hybridCtesSql, ${rrfTailSql("1e0", "0.5e0")}"""

  // q233 — BPE DECODE round trip (`bpe_apply decode_col` — the
  // shard-inspection path: what a landed training shard's id sequences
  // say, decoded under the same artifact): encode text to stable ids,
  // decode the ids back to subword strings, and gate TWO invariants at
  // once — (1) the decoded tokens are EXACTLY the tokenizer's tokens
  // (ids_roundtrip rides the hash as a boolean that must be true on
  // every row), and (2) concatenating the decoded tokens reproduces the
  // whitespace-stripped character stream of the ORIGINAL text — an
  // invariant that holds for ANY merge list (token boundaries vanish
  // under concat), which the oracle restates with zero BPE machinery.
  private def q233(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    import s.implicits._
    val mdir = s"${System.getProperty("java.io.tmpdir")}/graft_q233_merges"
    q164Merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(mdir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "keep_columns": ["doc_id", "text"],
       "bpe_apply": {"text_col": "text", "merges_dir": "$mdir",
                     "with_ids": true, "decode_col": "bpe_ids"},
       "with_columns": {"detok": "concat_ws('', bpe_decoded)",
                        "ids_roundtrip": "bpe_decoded = bpe_tokens"},
       "drop": ["text", "bpe_tokens", "n_bpe", "bpe_ids", "bpe_decoded"],
       "order_by": ["doc_id asc"]}""")
  }
  private val q233Sql = """
    SELECT doc_id,
           array_to_string(list_filter(string_split_regex(trim(text), '\s+'),
             x -> len(x) > 0), '') AS detok,
           TRUE AS ids_roundtrip
    FROM documents
    ORDER BY doc_id ASC NULLS FIRST"""

  // q228 — RANKING-QUALITY EVALUATION of the q190 retrieval: relevance
  // judgments are derived independently of the ranking (a doc is
  // relevant to a query iff it shares ≥ 2 DISTINCT query terms — the
  // boolean-conjunction-relaxed standard), and `rankingEval` emits the
  // per-query tuning metrics at k=5: n_rel, hits@5, RR@5 (mean = MRR),
  // recall@5, precision@5. The oracle recomputes the ranking (the q190
  // CTE chain verbatim), the judgment set, and every metric ratio
  // independently. Scale: judgments and top-k rows only — corpus size
  // never enters the evaluation joins.
  private def q228(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = bm25Queries.toDF("qid", "qtext")
    val d = docs(s, dir)
    val results = graft.ops.Retrieval.bm25TopK(
        d, "doc_id", "text", qs, "qid", "qtext", topK = 5)
      .select(col("qid"), col("doc_id"), col("rn").as("rank"))
    val qt = qs.select(col("qid"),
      explode(graft.ops.TextAnalysis.tokens(col("qtext"))).as("term")).distinct()
    val dt = d.select(col("doc_id"),
      explode(graft.ops.TextAnalysis.tokens(col("text"))).as("term")).distinct()
    val qrels = qt.join(dt, "term")
      .groupBy("qid", "doc_id")
      .agg(countDistinct(col("term")).as("__c"))
      .filter(col("__c") >= 2)
      .select("qid", "doc_id")
    graft.ops.Retrieval.rankingEval(results, "qid", "doc_id", "rank", qrels, k = 5)
      .orderBy(col("qid").asc_nulls_first)
  }
  private val q228Sql = s"""$bm25CtesSql,
    res AS (SELECT qid, doc_id, rn AS rank FROM ranked WHERE rn <= 5),
    qrels AS (
      SELECT qt.qid, post.doc_id
      FROM qt JOIN post ON post.term = qt.term
      GROUP BY qt.qid, post.doc_id
      HAVING COUNT(DISTINCT qt.term) >= 2),
    nrel AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel
             FROM qrels GROUP BY qid),
    hits AS (
      SELECT qr.qid, CAST(COUNT(*) AS BIGINT) AS h, MIN(res.rank) AS fr
      FROM qrels qr JOIN res ON res.qid = qr.qid AND res.doc_id = qr.doc_id
      GROUP BY qr.qid)
    SELECT nrel.qid, nrel.n_rel,
           CAST(COALESCE(hits.h, 0) AS BIGINT) AS hits_at_k,
           ROUND(CASE WHEN hits.fr IS NOT NULL
                      THEN 1e0 / hits.fr ELSE 0e0 END, 9) AS rr_at_k,
           ROUND(CAST(COALESCE(hits.h, 0) AS DOUBLE) / nrel.n_rel, 9) AS recall_at_k,
           ROUND(CAST(COALESCE(hits.h, 0) AS DOUBLE) / 5e0, 9) AS precision_at_k
    FROM nrel LEFT JOIN hits ON hits.qid = nrel.qid
    ORDER BY nrel.qid ASC NULLS FIRST"""

  // q229 — the WHOLE hybrid-search stack from PURE JSON (q226's config
  // twin — carries the identical oracle): child A ranks the corpus
  // lexically (`bm25` against the query def), child B probes the
  // at-rest ANN index at FULL coverage (`ann_search` nprobe = nlist —
  // provably exact brute force, with annSearchIndex's cosineTopK
  // rounding/tie/self-exclusion semantics), `combine` unions the two
  // (qid, doc_id, rank) lists, and `rrf_fuse` re-ranks. The index is
  // built once in Scala (the q218 artifact pattern); every ranking and
  // the fusion after that is config. Proves the retrieval keys COMPOSE:
  // defs + bm25 + ann_search + combine + rrf_fuse in one spec.
  private def q229(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q229_index"
    val e = graft.Tables.load(s, dir, "embeddings")
    graft.ops.Similarity.saveAnnIndex(s,
      e.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", idxDir, nlist = 16)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [{"id": "hq",
                 "source": {"sql": "SELECT * FROM VALUES ${bm25Queries
        .map { case (i, t) => s"($i, '$t')" }.mkString(", ")} AS v(qid, qtext)"}}],
       "combine": {"op": "union", "nodes": [
         {"id": "lex",
          "source": {"table": "documents"},
          "keep_columns": ["doc_id", "text"],
          "bm25": {"queries_ref": "hq", "id_col": "doc_id",
                   "text_col": "text", "top_k": 5},
          "rename": {"rn": "rank"},
          "drop": ["score"]},
         {"id": "dense",
          "source": {"sql": "SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id IN (1, 2, 3)"},
          "ann_search": {"id_col": "qid", "vec_col": "embedding",
                         "index_dir": "$idxDir", "k": 5, "nprobe": 16},
          "rename": {"match_id": "doc_id"},
          "drop": ["score"]}]},
       "rrf_fuse": {"query_col": "qid", "doc_col": "doc_id", "rank_col": "rank",
                    "top_k": 5},
       "order_by": ["qid asc", "rn asc"]}""")
  }

  // q279 — the r18 INGEST-PAIR CAPSTONE: hybrid search where BOTH
  // retrieval artifacts are at-rest AND half of each corpus arrived by
  // STREAM. Seed the BM25 index on even docs and the ANN index on even
  // vectors (pure config), stream the odd halves through bm25_ingest
  // and ann_ingest (each landing replay-safe deltas), then hybrid-search
  // BOTH artifacts from config (bm25_search + ann_search at full probe,
  // combine, rrf_fuse) — which must STILL equal q226's in-memory hybrid
  // fusion over the whole corpora, same oracle verbatim: streamed BM25
  // appends are exact (df computes query-shaped at search time), the
  // streamed vectors assign to the saved centroids, and full-coverage
  // ANN equals brute force. The production composition end to end:
  // batch-build → stream-maintain → search-many → fuse.
  private val q279Base =
    s"${System.getProperty("java.io.tmpdir")}/graft_q279_hybrid"
  private def q279(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    rmrf(new java.io.File(q279Base))
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0"},
       "bm25_index": {"id_col": "doc_id", "text_col": "text",
                      "dir": "$q279Base/bm25", "buckets": 16}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0"},
       "ann_index": {"id_col": "vec_id", "vec_col": "embedding",
                     "dir": "$q279Base/ann", "nlist": 16}}""")
    s.sql("SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1")
      .coalesce(1).write.mode("overwrite").parquet(s"$q279Base/docs_in")
    s.sql("SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1")
      .coalesce(1).write.mode("overwrite").parquet(s"$q279Base/vecs_in")
    val qb = graft.compile.Compiler.compileStreamJson(s, s"""
      {"source": {"path": "$q279Base/docs_in"},
       "bm25_ingest": {"id_col": "doc_id", "text_col": "text",
                       "index_dir": "$q279Base/bm25",
                       "checkpoint_dir": "$q279Base/ck_b"}}""")
    try qb.processAllAvailable() finally qb.stop()
    val qa = graft.compile.Compiler.compileStreamJson(s, s"""
      {"source": {"path": "$q279Base/vecs_in"},
       "ann_ingest": {"id_col": "vec_id", "vec_col": "embedding",
                      "index_dir": "$q279Base/ann",
                      "checkpoint_dir": "$q279Base/ck_a"}}""")
    try qa.processAllAvailable() finally qa.stop()
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [{"id": "hq",
                 "source": {"sql": "SELECT * FROM VALUES ${bm25Queries
        .map { case (i, t) => s"($i, '$t')" }.mkString(", ")} AS v(qid, qtext)"}}],
       "combine": {"op": "union", "nodes": [
         {"id": "lex",
          "source": {"ref": "hq"},
          "bm25_search": {"qid_col": "qid", "qtext_col": "qtext",
                          "index_dir": "$q279Base/bm25", "top_k": 5},
          "rename": {"rn": "rank"},
          "drop": ["score"]},
         {"id": "dense",
          "source": {"sql": "SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id IN (1, 2, 3)"},
          "ann_search": {"id_col": "qid", "vec_col": "embedding",
                         "index_dir": "$q279Base/ann", "k": 5, "nprobe": 16},
          "rename": {"match_id": "doc_id"},
          "drop": ["score"]}]},
       "rrf_fuse": {"query_col": "qid", "doc_col": "doc_id", "rank_col": "rank",
                    "top_k": 5},
       "order_by": ["qid asc", "rn asc"]}""")
  }

  // q191 — the same retrieval from PURE JSON: the query table is a def
  // (an inline VALUES source), the corpus node ranks against it via the
  // bm25 key.
  private def q191(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [{"id": "auditq",
                 "source": {"sql": "SELECT * FROM VALUES ${bm25Queries
        .map { case (i, t) => s"($i, '$t')" }.mkString(", ")} AS v(qid, qtext)"}}],
       "source": {"table": "documents"},
       "keep_columns": ["doc_id", "text"],
       "bm25": {"queries_ref": "auditq", "id_col": "doc_id",
                "text_col": "text", "top_k": 5},
       "order_by": ["qid asc", "rn asc"]}""")
  }

  // q202 — PHRASE-aware BM25 (prox_weight = 2): the corpus plus two
  // planted docs — one carrying the query as a verbatim phrase, one
  // carrying the same words scattered (zero query bigrams). The bigram
  // tier scores adjacency with the same BM25 formula over bigram
  // postings, so the verbatim doc takes rank 1 while bag-of-words
  // scoring alone cannot separate the plants — the decontamination gap
  // this option closes. The oracle restates BOTH tiers (unigram and
  // weighted bigram contributions union into one decimal sum), so the
  // phrase ranking is exact end to end.
  private def q202(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      (9000001L, "spark hash join spark hash join"),
      (9000002L, "spark also hash then join maybe hash again spark join lots"))
      .toDF("doc_id", "text")
    val corpus = docs(s, dir).select("doc_id", "text").unionAll(planted)
    val qs = Seq((1L, "spark hash join")).toDF("qid", "qtext")
    graft.ops.Retrieval.bm25TopK(corpus, "doc_id", "text", qs, "qid", "qtext",
        topK = 5, proxWeight = 2.0)
      .orderBy(col("qid").asc_nulls_first, col("rn").asc_nulls_first)
  }
  private val q202Sql = s"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES
        (9000001, 'spark hash join spark hash join'),
        (9000002, 'spark also hash then join maybe hash again spark join lots'))
        AS v(doc_id, text)),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM corpus),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(dl) AS DOUBLE) / COUNT(*), 9) AS avgdl
      FROM dl),
    post AS (
      SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, tok),
    dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
    post2 AS (
      SELECT doc_id, bg AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                                   for i in generate_series(1, len(t)-1)]) AS bg
            FROM toks WHERE len(t) >= 2)
      GROUP BY doc_id, bg),
    dft2 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post2 GROUP BY term),
    qtk AS (SELECT 1 AS qid,
                   list_filter(string_split_regex(trim('spark hash join'), '\\s+'),
                               x -> len(x) > 0) AS t),
    qt AS (SELECT DISTINCT qid, unnest(t) AS term FROM qtk),
    qt2 AS (SELECT DISTINCT qid,
                   unnest([array_to_string(t[i:i+1], ' ')
                           for i in generate_series(1, len(t)-1)]) AS term
            FROM qtk WHERE len(t) >= 2),
    sc AS (
      SELECT qt.qid, post.doc_id,
             ROUND(ROUND(ln(1e0 + (stats.n - dft.df + 0.5e0) / (dft.df + 0.5e0)), 9)
               * (post.tf * (1.2e0 + 1e0))
               / (post.tf + 1.2e0 * ((1e0 - 0.75e0)
                  + 0.75e0 * dl.dl / stats.avgdl)), 9) AS s
      FROM qt
      JOIN post ON post.term = qt.term
      JOIN dft ON dft.term = qt.term
      JOIN dl ON dl.doc_id = post.doc_id
      CROSS JOIN stats
      UNION ALL
      SELECT qt2.qid, post2.doc_id,
             ROUND(2e0 *
               ROUND(ROUND(ln(1e0 + (stats.n - dft2.df + 0.5e0) / (dft2.df + 0.5e0)), 9)
                 * (post2.tf * (1.2e0 + 1e0))
                 / (post2.tf + 1.2e0 * ((1e0 - 0.75e0)
                    + 0.75e0 * dl.dl / stats.avgdl)), 9), 9) AS s
      FROM qt2
      JOIN post2 ON post2.term = qt2.term
      JOIN dft2 ON dft2.term = qt2.term
      JOIN dl ON dl.doc_id = post2.doc_id
      CROSS JOIN stats),
    agg AS (
      SELECT qid, doc_id,
             ROUND(CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
      FROM sc GROUP BY qid, doc_id),
    ranked AS (
      SELECT qid, doc_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY score DESC, doc_id ASC) AS INT) AS rn
      FROM agg)
    SELECT qid, doc_id, score, rn FROM ranked WHERE rn <= 5
    ORDER BY qid ASC NULLS FIRST, rn ASC NULLS FIRST"""

  // q186 — host-graph PageRank (3 damped iterations with dangling-mass
  // redistribution), the host-authority quality prior of web curation.
  // The host graph derives from the corpus by plain modular arithmetic
  // (doc_id mod 12 links to (doc_id div 5) mod 12), so the oracle
  // rebuilds the SAME edge set and then restates every iteration —
  // per-edge 9-dp contributions summed in DECIMAL(38,12), dangling mass
  // as a scalar, ranks re-rounded per round — an exact unrolled-CTE
  // mirror of the whole fixed-point computation (the q156 BPE posture).
  private def q186(s: SparkSession, dir: String): DataFrame = {
    val e = docs(s, dir).select(
      concat(lit("h"), col("doc_id") % 12).as("src"),
      concat(lit("h"), expr("doc_id div 5") % 12).as("dst"))
      .filter(col("src") =!= col("dst"))
    graft.ops.Graph.pageRank(e, "src", "dst", iters = 3)
      .orderBy(col("node").asc_nulls_first)
  }
  private[queries] val prN = "(SELECT CAST(COUNT(*) AS DOUBLE) FROM nodes)"
  private[queries] def prIterSql(i: Int): String = {
    val prev = if (i == 1) "r0" else s"r${i - 1}"
    s""",
    c$i AS (
      SELECT e.dst,
             CAST(SUM(CAST(ROUND(r.r / od.od, 9) AS DECIMAL(38,12))) AS DOUBLE) AS c
      FROM e JOIN od ON od.src = e.src JOIN $prev r ON r.node = e.src
      GROUP BY e.dst),
    d$i AS (
      SELECT COALESCE(CAST(SUM(CAST(ROUND(r.r, 9) AS DECIMAL(38,12))) AS DOUBLE), 0e0) AS dm
      FROM $prev r LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL),
    r$i AS (
      SELECT n.node,
             ROUND((1e0 - 0.85e0) / $prN
               + 0.85e0 * (COALESCE(c$i.c, 0e0) + (SELECT dm FROM d$i) / $prN),
               9) AS r
      FROM nodes n LEFT JOIN c$i ON c$i.dst = n.node)"""
  }
  /** The full PageRank CTE chain over the modular-arithmetic host graph
    * (e → nodes → od → r0 → c/d/r per iteration) — shared with the
    * flagship q192. Ends with `r3(node, r)`. */
  private[queries] val prCtes = s"""e AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 12 AS VARCHAR) AS src,
                      'h' || CAST((doc_id // 5) % 12 AS VARCHAR) AS dst
      FROM documents
      WHERE doc_id % 12 <> (doc_id // 5) % 12),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS od FROM e GROUP BY src),
    r0 AS (SELECT node, ROUND(1e0 / $prN, 9) AS r FROM nodes)
    ${prIterSql(1)}${prIterSql(2)}${prIterSql(3)}"""
  private val q186Sql = s"""
    WITH $prCtes
    SELECT node, r AS rank FROM r3 ORDER BY node ASC NULLS FIRST"""

  // q187 — the same ranking from PURE JSON (page_rank node key over a
  // derived edge list).
  private def q187(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"src": "concat('h', doc_id % 12)",
                  "dst": "concat('h', (doc_id div 5) % 12)"},
       "filters": ["src != dst"],
       "keep_columns": ["src", "dst"],
       "page_rank": {"src_col": "src", "dst_col": "dst", "iters": 3},
       "order_by": ["node asc"]}""")
  }
}
