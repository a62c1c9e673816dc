package graft.functions

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registers graft's column functions in the session FunctionRegistry so
  * the CONFIG LANGUAGE reaches them: any expr-string site (`filters`,
  * `with_columns`, SQL sources) can call `lang_id(text)`,
  * `vector_dot(a, b)`, `simhash64(...)` etc. — the north-star operators
  * become first-class in the metadata surface, not just the Scala API.
  */
object Registry {

  private def fn(c: Column => Column): Seq[Expression] => Expression =
    es => GraftColumnBridge.expressionEager(c(GraftColumnBridge.column(es.head)))

  private def fn2(c: (Column, Column) => Column): Seq[Expression] => Expression =
    es => GraftColumnBridge.expressionEager(
      c(GraftColumnBridge.column(es.head), GraftColumnBridge.column(es(1))))

  /** Integer literal argument (kernel shape parameters like dim/numBits
    * must be plan-time constants — they size generated code and reference
    * objects, not per-row data). */
  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"$fn: '$arg' must be an integer literal, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "tokens" -> fn(TextAnalysis.tokens),
    "doc_fingerprint_portable" -> fn(TextAnalysis.fingerprintPortable),
    "token_count" -> fn(TextAnalysis.tokenCount),
    "bpeish_token_count" -> fn(TextAnalysis.bpeishTokenCount),
    "lang_id" -> fn(TextAnalysis.langId),
    "quality_score" -> fn(TextAnalysis.qualityScore),
    "stopword_ratio" -> fn(TextAnalysis.stopwordRatio),
    "punct_ratio" -> fn(TextAnalysis.punctRatio),
    "mean_token_length" -> fn(TextAnalysis.meanTokenLength),
    "doc_fingerprint" -> fn(TextAnalysis.fingerprint),
    "simhash" -> fn(Dedup.simhash),
    "vector_dot" -> fn2((a, b) => Similarity.dot(a, b)),
    "vector_cosine" -> fn2((a, b) => Similarity.cosine(a, b)),
    "vector_norm" -> fn(Similarity.l2Norm),
    "hamming_dist" -> fn2((a, b) => Dedup.hamming(a, b)),
    // LSH kernels for SQL/derive sites: hyperplane_sig(vec, dim, numBits),
    // minhash_sig(hashedShingles, numHashes)
    "hyperplane_sig" -> (es => HyperplaneSig(es.head,
      litInt(es(1), "hyperplane_sig", "dim"),
      litInt(es(2), "hyperplane_sig", "numBits"))),
    "minhash_sig" -> (es => MinHashSignature(es.head,
      litInt(es(1), "minhash_sig", "numHashes"))),
    "simhash64" -> (es => SimHash64(es.head)),
    // privacy + layout primitives: scrub_pii(text), pii_count(text),
    // zorder(c1, c2, ..., bits) — bits must be a literal (it sizes the
    // bit-interleave expression tree at plan time)
    "scrub_pii" -> fn(TextAnalysis.scrubPii),
    "normalize_text" -> (es => NormalizeText(es.head)),
    // compression_ratio(text) — deflate-ratio quality signal: repetition/
    // boilerplate compresses well (low), high-entropy noise badly (>1)
    "compression_ratio" -> (es => CompressionRatio(es.head)),
    "canonical_url" -> (es => CanonicalizeUrl(es.head)),
    // window_fingerprints(text, n) — n must be a literal (it sizes the
    // rolling-hash window at plan time)
    "window_fingerprints" -> (es => WindowFingerprints(es.head,
      litInt(es(1), "window_fingerprints", "n"))),
    // winnow_fingerprints(text, k, w) — the MOSS selection over the
    // rolling stream (see WinnowOps); k/w are plan-time literals
    "winnow_fingerprints" -> (es => WinnowFingerprints(es.head,
      litInt(es(1), "winnow_fingerprints", "k"),
      litInt(es(2), "winnow_fingerprints", "w"))),
    // ngram_buckets(text, dim) — the DSIR hashed unigram+bigram feature
    // space (see NgramBucketOps); dim is a plan-time literal
    "ngram_buckets" -> (es => HashedNgramBuckets(es.head,
      litInt(es(1), "ngram_buckets", "dim"))),
    // tar_members(bytes) → array<struct<name, size, data>> (ustar walk,
    // named damage errors); tar_pack(array<struct<name, data>>) →
    // deterministic ustar bytes (see TarOps)
    "tar_members" -> (es => TarMembers(es.head)),
    "tar_pack" -> (es => TarPack(es.head)),
    // robots_allowed(robots_txt, agent, path) → RFC 9309 verdict (the
    // crawl-compliance / takedown-audit gate; see RobotsOps)
    "robots_allowed" -> (es => RobotsAllowed(es.head, es(1), es(2))),
    // shard-payload serialization: ints_binary(array<int>) → big-endian
    // bytes; binary_ints inverts (named error on truncation)
    "ints_binary" -> (es => IntsToBinary(es.head)),
    "binary_ints" -> (es => BinaryToInts(es.head)),
    "pii_count" -> fn(TextAnalysis.piiCount),
    // line-tier curation heuristics (Gopher line-repetition metrics;
    // C4 line rules). line_stats(text) → struct(n_lines, dup_line_frac,
    // dup_line_char_frac, bullet_start_frac, ellipsis_end_frac);
    // c4_line_filter(text, minWords) → struct(clean_text, kept_lines,
    // dropped_lines, keep_doc) — minWords must be a literal (it shapes
    // the per-line predicate at plan time)
    "line_stats" -> fn(t => TextAnalysis.lineStats(t)),
    // line_dedup(text) → struct(clean_text, kept_lines, dropped_lines):
    // WITHIN-document duplicate-line removal (first occurrence of each
    // trimmed form survives, verbatim) — the intra-page dedup step; the
    // cross-corpus twin is the boilerplate node key
    "line_dedup" -> fn(t => TextAnalysis.lineDedup(t)),
    // gopher_quality(text) → struct(n_words, mean_word_len,
    // symbol_word_ratio, alpha_word_frac, stop_hits, keep) — the Gopher
    // word-tier document filters at their published default bounds
    "gopher_quality" -> fn(t => TextAnalysis.gopherQuality(t)),
    // url_host(url) → lowercased authority minus userinfo/port — the
    // domain-blocklist key; '' for scheme-less/malformed input
    "url_host" -> fn(TextAnalysis.urlHost),
    "c4_line_filter" -> (es => GraftColumnBridge.expressionEager(
      TextAnalysis.c4LineFilter(GraftColumnBridge.column(es.head),
        litInt(es(1), "c4_line_filter", "minWords")))),
    // html_extract(html) → struct(title, body_text, links): the web-crawl
    // text-extraction kernel (lenient, browser-like; see HtmlExtractOps)
    "html_extract" -> (es => HtmlExtract(es.head)),
    // pdf_extract(bytes) → struct(version, n_pages, text): the
    // application/pdf sibling (lenient object scan + page-tree walk +
    // BT/ET text ops; see PdfOps)
    "pdf_extract" -> (es => PdfExtract(es.head)),
    // warc_records(bytes) → array of record structs (ISO 28500 container
    // walk; structural damage is a named data error — see WarcOps)
    "warc_records" -> (es => WarcRecords(es.head)),
    // RFC 1952 member walk: gunzip (strict multi-member, named errors),
    // gunzip_auto (1f 8b sniff, non-gzip passthrough), gzip_compress
    // sniff_mime(bytes) → MIME label from magic bytes (never throws —
    // the router in front of the format-specific parsers; see SniffOps)
    "sniff_mime" -> (es => SniffMime(es.head)),
    // http_response(bytes) → struct(status, content_type, charset,
    // content_encoding, body) — the raw-HTTP layer between a WARC
    // response record and the content operators (chunked bodies decode;
    // non-HTTP payloads flow through with null status; see HttpOps)
    "http_response" -> (es => HttpResponse(es.head)),
    "gunzip" -> (es => Gunzip(es.head)),
    "gunzip_auto" -> (es => GunzipAuto(es.head)),
    "gzip_compress" -> (es => GzipCompress(es.head)),
    "zorder" -> (es => GraftColumnBridge.expressionEager(
      graft.ops.Layout.zorderValue(
        es.init.map(GraftColumnBridge.column),
        litInt(es.last, "zorder", "bits"))))
  )

  /** Idempotent registration into the active session. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      val reg = spark.sessionState.functionRegistry
      // skip-if-present: the query harness calls this before every query;
      // re-registering 40 functions 139× floods the bench/verify logs with
      // "replaced a previously registered function" warnings (round-9
      // advice) and buys nothing — the builders are stateless singletons.
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
