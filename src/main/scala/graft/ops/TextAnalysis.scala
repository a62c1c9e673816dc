package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY §2.2 NS): token
  * counting, language ID, quality scoring, fingerprinting. All are pure
  * `Column` combinators over built-in functions — whole-stage-codegen'd,
  * no UDFs, no shuffles: they run inside the scan stage at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization; empty string → empty array (a bare
    * split("") yields [""], which would poison token counts). Native
    * kernel — byte-exact twin of
    * `filter(split(trim(text), "\\s+"), t => length(t) > 0)`, one byte
    * pass instead of a regex split (~13× on a 500-char doc; equality
    * with the regex formulation pinned in PropertySpec). */
  def tokens(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.WhitespaceTokens(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** The regex formulation [[tokens]] replaced — kept as the reference
    * for the PropertySpec equivalence gate. */
  private[graft] def tokensReference(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Let-binding for an expensive sub-expression used several times inside
    * ONE Column: `withBound(e)(x => body)` evaluates `e` once per row and
    * passes it to `body` as a lambda variable. Without this, Catalyst
    * inlines the sub-expression at every use site — and a use inside a
    * higher-order-function lambda re-evaluates it PER ARRAY ELEMENT
    * (measured: O(tokens²) re-splitting made shingling 20× slower). */
  def withBound(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), x => body(x)), 1)

  /** Tokens bound once for multi-use bodies. */
  def withTokens(text: Column)(body: Column => Column): Column =
    withBound(tokens(text))(body)

  /** [[withBound]] an operator's INPUT column — but only when it is a
    * computed expression: a plain column reference is already a
    * per-row value, and wrapping it in the binding array costs ~50%
    * on direct-column callers (measured on q172) for zero benefit.
    * Computed inputs (another operator's struct field, a concat, …)
    * must bind, or CollapseProject inlines the upstream tree at every
    * reference inside the body. */
  private[ops] def bindInput(e: Column)(body: Column => Column): Column =
    org.apache.spark.sql.GraftColumnBridge.expression(e) match {
      case _: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute |
           _: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        body(e)
      case _ => withBound(e)(body)
    }

  /** Whitespace token count — the counting half of the [[tokens]]
    * kernel, no array materialization. */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.WhitespaceTokenCount(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** BPE-ish token count: counts maximal runs of letters, digits, and
    * non-alphanumeric symbols separately — the usual cheap proxy for
    * subword-tokenizer counts when the real tokenizer isn't on the
    * cluster. Pattern is RE2/Java-regex-portable. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: broadcast-free, inlined into codegen. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est")
  )

  /** Score for one language = number of its marker words present. */
  def langScore(toks: Column, markers: Seq[String]): Column =
    markers
      .map(m => when(array_contains(toks, m), 1).otherwise(0))
      .reduce(_ + _)

  /** Language-ID: argmax of marker scores, ties broken by list order
    * (en-first precedence), "und" (undetermined) when no marker hits. */
  def langId(text: Column): Column = withTokens(text) { toks =>
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(toks, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && s > 0, lang).otherwise(els)
    }
  }

  /** Stopword ratio against the combined marker set (deterministic exact
    * division of integer counts). */
  def stopwordRatio(text: Column): Column = withTokens(text) { toks =>
    val stop = langMarkers.flatMap(_._2).distinct
    val hits = size(filter(toks, t => t.isin(stop.map(lit): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", "")))
        .cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Mean token length (0.0 for empty docs). */
  def meanTokenLength(text: Column): Column = withTokens(text) { toks =>
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
      .otherwise(lit(0.0))
  }

  /** Heuristic document quality score in [0,1]: rewards mid-length docs and
    * word-like tokens, penalizes punctuation soup. Deterministic arithmetic
    * (exact integer-derived doubles, fixed expression order). */
  def qualityScore(text: Column): Column = withTokens(text) { toks =>
    val n = size(toks)
    val lengthTerm =
      least(n.cast("double") / lit(32.0), lit(1.0)) // saturates at 32 tokens
    val punctTerm = lit(1.0) - punctRatio(text)
    val wordTerm = when(n > 0,
      size(filter(toks, t => t.rlike("^[A-Za-z]+$"))).cast("double") /
        n).otherwise(lit(0.0))
    round((lengthTerm * lit(0.3)) + (punctTerm * lit(0.3)) + (wordTerm * lit(0.4)), 9)
  }

  /** Corpus term statistics — the vocabulary-build shape behind TF-IDF
    * weighting, stop-list mining, and rare-token quality signals:
    * one row per token with `tf` (total occurrences) and `df` (documents
    * containing it). Explode is corpus-shaped but map-side partial
    * aggregation collapses each partition to its distinct tokens before
    * the single shuffle; the distinct doc count is Spark's standard
    * two-phase distinct aggregate. At 100 TB this is THE way to build a
    * vocabulary — no driver-side counting, no collect. */
  def termStats(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col(idCol)).as("df"))

  /** Per-document characteristic tokens: tf-idf = tf(token, doc) ×
    * ln(N / df(token)), top `k` per document. The vocabulary join prunes
    * tokens with df > `maxDfRatio`·N FIRST — those are simultaneously the
    * join's skew keys (stop tokens fan out to most documents) and the
    * tokens with idf ≈ 0 that tf-idf exists to ignore, so the guard
    * removes the scale hazard and the noise in one move (same posture as
    * the stop-shingle guard in Dedup). N rides as a broadcast 1-row
    * scalar, not a driver-side count — the whole operator is action-free
    * plan composition. */
  def tfidfTopK(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxDfRatio: Double = 0.5
  ): org.apache.spark.sql.DataFrame = {
    val total = df.select(count(lit(1)).as("__N"))
    val vocab = termStats(df, idCol, textCol)
      .crossJoin(broadcast(total))
      .filter(col("df") <= col("__N") * maxDfRatio)
      .select(col("token"), log(col("__N").cast("double") / col("df")).as("idf"))
    val docTokens = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf_doc"))
    val scored = docTokens.join(vocab, Seq("token"))
      .select(col(idCol), col("token"),
        round(col("tf_doc") * col("idf"), 9).as("tfidf"))
    Relational.topKPerGroup(
      scored, Seq(idCol),
      Seq(col("tfidf").desc, col("token").asc), k, rankCol = "rank")
  }

  /** COLLOCATIONS: corpus-level bigram association mining by pointwise
    * mutual information — the vocabulary-analysis view next to
    * [[termStats]]: which adjacent word pairs co-occur far more than
    * chance ("new york", "machine learning") vs boilerplate glue. The
    * classic tokenizer-audit / phrase-lexicon / template-detection tool:
    * a high-PMI pair that BPE splits is a merge candidate, a
    * top-frequency low-PMI pair is template glue.
    *
    *   pmi(x,y) = ln( p(x,y) / (p(x)·p(y)) )
    *            = ln( (c_xy · N_tok · N_tok) / (N_pair · c_x · c_y) )
    *
    * with c_xy the adjacent-pair instance count, c_x/c_y token instance
    * counts, N_tok total tokens, N_pair total adjacent pairs — one
    * formula, spelled identically in any SQL mirror (IEEE double ops on
    * exact integer counts are deterministic; the q68 ln() precedent).
    * `minCount` floors c_xy first — PMI is top-heavy on hapax pairs
    * (c_xy = 1 with rare words maximizes it), so unfloored output is
    * noise by construction.
    *
    * Scale: bigram emission is a scan-stage slice/zip (no self-join);
    * both count tables are map-side-combined aggregates shuffling
    * VOCABULARY-shaped rows, never corpus-shaped; the two unigram joins
    * are vocab×vocab-bounded and AQE-broadcast when small; the final
    * top-k sorts only pairs that survived minCount. Totals ride as a
    * broadcast 1-row scalar (crossJoin(broadcast(...)) — action-free).
    *
    * Output: (w1, w2, n_pair, pmi) — pmi ROUND 6, ordered pmi desc then
    * (w1, w2), limited to `topK`. Batch-only (global corpus counts).
    *
    * `groupCols` scopes the whole statistic per group — per-LANGUAGE
    * phrase lexicons are the common case (unigram/pair counts, totals,
    * the PMI denominator, AND the top-k all become group-local). NULL
    * group values raise BY NAME (the snapshotDiff NULL-key posture:
    * they would otherwise silently vanish through the count joins,
    * where NULL never equals NULL — coalesce upstream). Empty (default)
    * = one global table. */
  def collocations(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      minCount: Int = 5,
      topK: Int = 100,
      groupCols: Seq[String] = Nil
  ): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, s"collocations: min_count must be >= 1, got $minCount")
    require(topK >= 1, s"collocations: top_k must be >= 1, got $topK")
    val missing = (textCol +: groupCols).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"collocations: no column(s) ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    require(!groupCols.contains(textCol),
      s"collocations: group_cols must not include text_col '$textCol'")
    val g = groupCols.map(col)
    // NULL group guard rides the scan (zero extra passes); NULL TEXT is
    // legal and must contribute nothing — tokens(NULL) is a NULL array,
    // so every size() below clamps through greatest(_, 0) (the session
    // keeps legacy sizeOfNull, where size(NULL) = -1).
    val gGuarded = groupCols.map(c0 =>
      when(col(c0).isNotNull, col(c0)).otherwise(raise_error(lit(
        s"collocations: NULL value in group column '$c0' — NULL groups " +
          "would silently drop through the count joins; coalesce upstream")))
        .as(c0))
    val toks = df.select(gGuarded :+ tokens(col(textCol)).as("__t"): _*)
    // ONE corpus scan for EVERYTHING, shared through EXCHANGE REUSE
    // rather than a persisted cache (r18 persisted a counts table and
    // regressed the sf0.1 gate ~3×: the cache is a materialization
    // BARRIER that serializes every downstream stage behind it, where
    // reused exchanges let all consumers' tiny vocab-shaped stages run
    // in parallel off one shuffle write). Three things make the four
    // consumer legs canonically identical so Spark's exchange-reuse
    // (plan-audited below, asserted in OpsSpec) actually fires:
    //
    //  1. The corpus-scale work is fully codegen and collapses through
    //     ONE plain (g,w1,w2) aggregate: posexplode the token array
    //     once, pairing each token with its successor (NULL at the last
    //     position; the `when` guard keeps ANSI element_at in bounds).
    //     The r18 transform+zip_with+concat struct build was a
    //     HigherOrderFunction chain — interpreted per row, never
    //     codegen'd. A GROUPING SETS pass keyed (g,w1,w2) ∪ (g,w1) then
    //     yields pair counts AND unigram counts; its Expand runs on the
    //     VOCABULARY-shaped first-level result, never on corpus rows.
    //  2. Every aggregate output is packed into ONE struct (c, gid,
    //     cw2), so consumer-specific filters reference only aggregate
    //     outputs (nothing pushable below the exchange) and column
    //     pruning cannot drop a partial-aggregate function from one leg
    //     but not another (which would de-identify the subtrees).
    //  3. The consumer joins use null-safe keys (<=>): inner-join `===`
    //     keys make InferFiltersFromConstraints plant isnotnull()
    //     filters below the shared aggregate on SOME legs only —
    //     plan-audited as the reason exchange reuse failed in r18. All
    //     keys are provably non-null here (g guarded above, tokens
    //     non-empty strings, pair rows filtered cw2 > 0), so <=> ≡ ===.
    //
    // Totals never touch the hapax pair tail: n_tok = Σ unigram counts,
    // and n_pairs_total = n_tok − (# docs with ≥1 token) — the
    // Σ max(n−1,0) identity, the nonempty-doc count riding as the
    // w2-NULL last-token rows of the pair set (cw2 = 0).
    // generator outputs aliased (__pos/__w) — bare pos/col would
    // collide with group columns of those names
    val exploded = toks
      .select(g ++ Seq(col("__t"),
        posexplode(col("__t")).as(Seq("__pos", "__w"))): _*)
      .select(g ++ Seq(col("__w").as("w1"),
        when(col("__pos") < size(col("__t")) - 1,
          element_at(col("__t"), col("__pos") + 2)).as("w2")): _*)
    val fullCounts = exploded
      .groupBy(g ++ Seq(col("w1"), col("w2")): _*)
      .agg(count(lit(1)).as("c0"))
    // grouping_id bit order follows the grouping columns (g…, w1, w2):
    // the full (g,w1,w2) set is 0, the unigram (g,w1) set is 1. cw2
    // (non-null w2 inputs per group) carries w2-nullness for set-0 rows
    // as an aggregate output: a set-0 group holds exactly one
    // first-level row, so cw2 is 1 for a real pair, 0 for a last-token
    // row. (For set-1 rows cw2 is the successor-vocabulary size —
    // unused.)
    val counts = fullCounts
      .groupingSets(Seq(g ++ Seq(col("w1"), col("w2")), g :+ col("w1")),
        g ++ Seq(col("w1"), col("w2")): _*)
      .agg(struct(
        sum(col("c0")).as("c"),
        max(grouping_id()).as("gid"),
        count(col("w2")).as("cw2")).as("__s"))
    val c = col("__s.c"); val gid = col("__s.gid"); val cw2 = col("__s.cw2")
    val unigrams = counts.filter(gid === 1)
      .select(g ++ Seq(col("w1").as("w"), c.as("cu")): _*)
    val pairCounts = counts.filter(gid === 0 && cw2 > 0 && c >= minCount)
      .select(g ++ Seq(col("w1"), col("w2"), c.as("n_pair")): _*)
    val totals = counts.groupBy(g: _*).agg(
      sum(when(gid === 1, c)).as("n_tok"),
      (sum(when(gid === 1, c)) -
        coalesce(sum(when(gid === 0 && cw2 === 0, c)), lit(0L))).as("n_pairs_total"))
    def renamed(d: org.apache.spark.sql.DataFrame, tag: String, keys: Seq[String]) =
      keys.foldLeft(d)((acc, k) => acc.withColumnRenamed(k, s"__${tag}_$k"))
    def nsJoin(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
        tag: String, keys: Seq[String]) = {
      val rr = renamed(r, tag, keys)
      val cond = keys.map(k => col(k) <=> col(s"__${tag}_$k")).reduce(_ && _)
      l.join(rr, cond).drop(keys.map(k => s"__${tag}_$k"): _*)
    }
    val uni1 = unigrams.withColumnRenamed("w", "w1").withColumnRenamed("cu", "c1")
    val uni2 = unigrams.withColumnRenamed("w", "w2").withColumnRenamed("cu", "c2")
    val joined = nsJoin(nsJoin(pairCounts, uni1, "u1", groupCols :+ "w1"),
      uni2, "u2", groupCols :+ "w2")
    val withTotals =
      if (groupCols.isEmpty) joined.crossJoin(broadcast(totals))
      else nsJoin(joined, totals, "t", groupCols)
    val scored = withTotals
      .select(g ++ Seq(col("w1"), col("w2"), col("n_pair"),
        round(log((col("n_pair").cast("double") * col("n_tok") * col("n_tok")) /
          (col("n_pairs_total").cast("double") * col("c1") * col("c2"))), 6)
          .as("pmi")): _*)
    val order = Seq(col("pmi").desc_nulls_last, col("w1").asc_nulls_first,
      col("w2").asc_nulls_first)
    if (groupCols.isEmpty) scored.orderBy(order: _*).limit(topK)
    else Relational.topKPerGroup(scored, groupCols, order, topK,
      rankCol = "__rank").drop("__rank")
  }

  /** Gram build over an already-bound token array — shared by [[ngramsAll]]
    * and [[repetitionStats]] (which binds tokens itself and must not
    * re-tokenize). */
  private def gramsOf(toks: Column, n: Int): Column =
    if (n == 1) toks
    else transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** All word n-grams of a document, NON-distinct and in order (unlike
    * `Dedup.shingles`, which dedups for set semantics) — the repetition
    * metrics below need multiplicities. Documents shorter than `n` tokens
    * yield their single truncated gram; empty documents yield [""] — a
    * caller that cares must filter empties first (repetitionStats maps
    * them to zeros). */
  def ngramsAll(text: Column, n: Int): Column =
    withTokens(text)(toks => gramsOf(toks, n))

  /** Repetition / boilerplate metrics (the Gopher-style quality rules for
    * machine-generated or templated text): over the document's n-grams,
    *   - `n_grams`:  gram instance count,
    *   - `top_frac`: instances of the single most frequent gram ÷ total —
    *                 high for "buy now buy now buy now",
    *   - `dup_frac`: instances whose gram occurs ≥ 2 times ÷ total.
    * Returned as one struct column. Counting is in-row SORT + ONE FOLD
    * over the gram array (m ≈ doc tokens, O(m log m)) — a gram's
    * multiplicity is its run length in the sorted array, so the fold
    * tracks (current run, longest run, instances in runs ≥ 2) in a
    * struct accumulator. This keeps the metric in the scan stage with
    * zero shuffles (the explode+groupBy alternative shuffles the whole
    * corpus to count per-document locals) and replaced a measured-2.7 s
    * O(m²) count-per-gram formulation at sf0.1. Empty docs → zeros.
    */
  def repetitionStats(text: Column, n: Int): Column =
    withTokens(text) { toks =>
      withBound(gramsOf(toks, n)) { grams =>
        val folded = aggregate(
          array_sort(grams),
          struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
            lit(0).as("maxr"), lit(0).as("dup")),
          (acc, x) => {
            val run = when(acc.getField("prev") === x, acc.getField("run") + 1)
              .otherwise(lit(1))
            struct(x.as("prev"), run.as("run"),
              greatest(acc.getField("maxr"), run).as("maxr"),
              (acc.getField("dup") +
                when(run === 2, 2).when(run > 2, 1).otherwise(0)).as("dup"))
          })
        withBound(folded) { f =>
          val m = size(grams)
          struct(
            when(size(toks) > 0, m).otherwise(lit(0)).as("n_grams"),
            when(size(toks) > 0,
              round(f.getField("maxr").cast("double") / m, 9))
              .otherwise(lit(0.0)).as("top_frac"),
            when(size(toks) > 0,
              round(f.getField("dup").cast("double") / m, 9))
              .otherwise(lit(0.0)).as("dup_frac"))
        }
      }
    }

  /** Document fingerprint: order-sensitive polynomial rolling hash over
    * token hashes (two docs with the same tokens in a different order
    * fingerprint differently — unlike a set-hash). xxhash64 per token, then
    * Horner's rule mod a 2^61-ish prime — modular instead of wrapping so it
    * can't trip Spark's default ANSI overflow check. */
  def fingerprint(text: Column): Column = {
    val m = 1000000007L // prime; keeps acc*31+h well inside Long range
    aggregate(
      transform(tokens(text), t => pmod(xxhash64(t), lit(m))),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(m)))
  }

  /** Engine-portable variant of [[fingerprint]]: per-token hash is a
    * character polynomial (Horner over Unicode code points, 131 base) —
    * defined entirely by arithmetic any SQL engine reproduces exactly, so
    * the whole column is oracle-comparable bit-for-bit. ~10× more per-row
    * work than the xxhash64 path (a HOF per character, not a native hash
    * kernel per token): use [[fingerprint]] at scale, this one where
    * cross-engine verifiability matters more than throughput. */
  def fingerprintPortable(text: Column): Column =
    graft.functions.TextKernels.portableFingerprint(text)

  /** Composable fold formulation of [[fingerprintPortable]] — a HOF per
    * CHARACTER (substr + ascii inside transform inside aggregate), ~10×
    * slower than the native kernel; kept as the reference implementation
    * for the bit-equality test. */
  def fingerprintPortableFold(text: Column): Column = {
    val m = 1000000007L
    def tokHash(t: Column): Column =
      aggregate(
        transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1))).cast("long")),
        lit(7L),
        (acc, c) => pmod(acc * lit(131L) + c, lit(m)))
    aggregate(
      transform(tokens(text), tokHash(_)),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(m)))
  }

  /** PII scrub patterns, applied in THIS order (emails before phones
    * before bare digit runs, so an address's digits are consumed by the
    * email redaction and never double-counted). Every pattern is written
    * in the common Java-regex ∩ RE2 dialect — no backreferences, no
    * lookaround — so an external SQL engine (DuckDB et al.) applying the
    * same strings with a global-replace flag produces byte-identical
    * output; that's what makes the scrub oracle-checkable. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email"  -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone"  -> "\\+?[0-9][0-9()\\- ]{6,}[0-9]",
    "digits" -> "[0-9]{2,}")

  /** HTML → visible text, title, links — the extraction step between a
    * raw web crawl and every text operator in the engine (dedup,
    * language-ID, quality, fingerprints all want tokens, not markup).
    * The frame becomes (idCol, title, body_text, links): script/style
    * content, comments, and tags are invisible (each contributing a
    * token separator), entities decode, `body_text` is whitespace-
    * normalized under the tokenizer kernels' separator class, `title` is
    * the first title element (NULL when absent), `links` the `<a href>`
    * values in document order. Lenient like a browser — malformed markup
    * degrades, never throws (see graft.functions.HtmlExtractOps for the
    * precise contract). One native kernel call per row inside
    * whole-stage codegen — scan-stage, zero shuffles, the only shape
    * that survives running over every byte of a 100 TB crawl. */
  def htmlExtract(df: org.apache.spark.sql.DataFrame, idCol: String,
      htmlCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        graft.functions.HtmlKernels.htmlExtract(col(htmlCol)).as("__h"))
      .select(col(idCol), col("__h.title").as("title"),
        col("__h.body_text").as("body_text"), col("__h.links").as("links"))

  /** PDF → text frame: `(id, version, n_pages, text)` per document —
    * the `application/pdf` branch behind `sniff_mime` routing, same
    * scan-stage/zero-shuffle posture as [[htmlExtract]]. Lenient like a
    * crawler must be: damaged structure degrades to empty text, never an
    * error (see graft.functions.PdfOps for the precise contract). The
    * frame contract is STABLE at these four columns; the kernel's image
    * inventory (`n_images`, `image_bytes`) is reachable through the
    * `pdf_extract(bytes)` function surface (derive a struct column and
    * project its fields) without widening every pipeline built on this
    * frame. */
  def pdfExtract(df: org.apache.spark.sql.DataFrame, idCol: String,
      pdfCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        graft.functions.PdfKernels.pdfExtract(col(pdfCol)).as("__p"))
      .select(col(idCol), col("__p.version").as("version"),
        col("__p.n_pages").as("n_pages"), col("__p.text").as("text"))

  /** Redact PII-shaped substrings: each [[piiPatterns]] entry is replaced
    * globally by `[PII]` (the token contains no digits or '@', so later
    * patterns cannot re-match inside an earlier redaction). Pure
    * codegen'd `regexp_replace` chain — scan-stage, zero shuffles; the
    * training-data privacy pass that must run over every byte of a 100 TB
    * corpus and therefore cannot afford to be anything else. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (_, p)) =>
      regexp_replace(acc, p, "[PII]")
    }

  /** Line-level repetition / boilerplate metrics — the LINE tier of the
    * Gopher repetition rules (cf. the word-n-gram tier in
    * [[repetitionStats]]; the rules are from the public Gopher paper's
    * repetition filters, see PAPERS.md). Lines are the `sep`-separated
    * segments of the document, trimmed, with whitespace-only segments
    * dropped (they carry no signal and would all count as mutual
    * duplicates). Over those lines:
    *   - `n_lines`:            line count,
    *   - `dup_line_frac`:      lines whose exact content occurs ≥ 2
    *                           times in the doc ÷ total — high for
    *                           templated/boilerplate pages,
    *   - `dup_line_char_frac`: characters inside those duplicated lines
    *                           ÷ total line characters (a doc whose one
    *                           long paragraph repeats scores high even
    *                           when short navigation lines dominate the
    *                           line COUNT),
    *   - `bullet_start_frac`:  lines starting with a bullet marker
    *                           (`-`, `*`, `•`, `·`),
    *   - `ellipsis_end_frac`:  lines ending in `...` or `…`.
    * Fractions are 9-dp-rounded (cross-engine float hygiene); empty docs
    * → zeros. In-row O(m²) duplicate counting over the line array, same
    * deliberate trade as [[repetitionStats]]: docs have tens of lines,
    * and keeping the metric in the scan stage costs zero shuffles where
    * the explode+groupBy formulation shuffles the corpus. */
  def lineStats(text: Column, sep: String = "\n"): Column =
    withBound(filter(
      transform(split(text, java.util.regex.Pattern.quote(sep)), l => trim(l)),
      l => length(l) > 0)) { lines =>
      withBound(transform(lines, l => size(filter(lines, x => x === l)))) { counts =>
        withBound(transform(lines, l => length(l))) { chars =>
          val n = size(lines)
          val totChars = aggregate(chars, lit(0), (a, b) => a + b)
          val dupChars = aggregate(
            zip_with(chars, counts, (ch, c) => when(c > 1, ch).otherwise(lit(0))),
            lit(0), (a, b) => a + b)
          def frac(cnt: Column): Column =
            when(n > 0, round(cnt.cast("double") / n, 9)).otherwise(lit(0.0))
          struct(
            n.as("n_lines"),
            frac(size(filter(counts, c => c > 1))).as("dup_line_frac"),
            when(totChars > 0, round(dupChars.cast("double") / totChars, 9))
              .otherwise(lit(0.0)).as("dup_line_char_frac"),
            frac(size(filter(lines, l =>
              substring(l, 1, 1).isin("-", "*", "•", "·"))))
              .as("bullet_start_frac"),
            frac(size(filter(lines, l =>
              endswith(l, lit("...")) || endswith(l, lit("…")))))
              .as("ellipsis_end_frac"))
        }
      }
    }

  /** URL host extraction — the key of every domain blocklist/allowlist
    * pass (the standard first filter of a web corpus): the authority
    * component lowercased, with userinfo and port stripped. Scheme-less
    * or malformed URLs yield '' (filterable, never an error). Pure
    * built-in regexps (codegen'd, scan-stage) and exactly mirrorable in
    * SQL — compose with `isin`/`filters` for the blocklist itself; no
    * dedicated node key needed. */
  def urlHost(url: Column): Column =
    lower(regexp_replace(regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
      "^[^@]*@", ""), ":[0-9]*$", ""))

  /** Gopher word-tier quality rules (the public Gopher paper's document
    * filters; the LINE tier lives in [[lineStats]]) as one struct:
    *   - `n_words`:           whitespace token count,
    *   - `mean_word_len`:     mean characters per token (9 dp),
    *   - `symbol_word_ratio`: (`#` + `...` + `…` occurrences) ÷ words —
    *                          high for markup/ellipsis spam,
    *   - `alpha_word_frac`:   words containing ≥ 1 ASCII letter ÷ words,
    *   - `stop_hits`:         how many of the eight required stop words
    *                          (the be to of and that have with) appear,
    *   - `keep`:              the composite verdict — word count within
    *                          [minWords, maxWords], mean length in
    *                          [3, 10], symbol ratio ≤ 0.1, alpha fraction
    *                          ≥ 0.8, and ≥ 2 stop-word hits.
    * Empty docs → zeros + keep=false. Scan-stage arithmetic, zero
    * shuffles; every term is exactly mirrorable in SQL. */
  def gopherQuality(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column =
    // input bound iff computed (see [[bindInput]]): the body references
    // it ~7×, and a fed-in struct field would otherwise re-inline its
    // upstream tree per reference (measured 2× on the q173 flagship)
    bindInput(text) { txt =>
    withTokens(txt) { toks =>
      withBound(size(toks)) { n =>
        val meanLen = round(
          aggregate(transform(toks, t => length(t)), lit(0), (a, b) => a + b)
            .cast("double") / n, 9)
        val symbols =
          (length(txt) - length(regexp_replace(txt, "#", ""))) +
          (length(txt) - length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3 +
          (length(txt) - length(regexp_replace(txt, "…", "")))
        val symbolRatio = round(symbols.cast("double") / n, 9)
        val alphaFrac = round(
          size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / n, 9)
        val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
          .map(w => when(array_contains(transform(toks, t => lower(t)), w), 1)
            .otherwise(0))
          .reduce(_ + _)
        def z(c: Column): Column = when(n > 0, c).otherwise(lit(0.0))
        struct(
          n.as("n_words"),
          z(meanLen).as("mean_word_len"),
          z(symbolRatio).as("symbol_word_ratio"),
          z(alphaFrac).as("alpha_word_frac"),
          when(n > 0, stopHits).otherwise(lit(0)).as("stop_hits"),
          (n >= minWords && n <= maxWords &&
            meanLen >= 3.0 && meanLen <= 10.0 &&
            symbolRatio <= 0.1 && alphaFrac >= 0.8 &&
            stopHits >= 2).as("keep"))
      }
    }
    }

  /** C4-style line filtering (the public C4 curation heuristics, Raffel
    * et al. — see PAPERS.md): keep a line iff, after trimming, it
    *   - has at least `minWords` whitespace tokens,
    *   - ends in terminal punctuation (`.` `!` `?` `"` `'`), and
    *   - does not mention "javascript" (case-insensitive) — the classic
    *     cookie/JS-warning boilerplate tell.
    * Returns one struct column:
    *   - `clean_text`:  the kept lines re-joined with `sep`, VERBATIM
    *                    (original spacing — trimming is for judging, not
    *                    rewriting),
    *   - `kept_lines` / `dropped_lines`: line counts (dropped includes
    *                    whitespace-only segments),
    *   - `keep_doc`:    the C4 PAGE-level verdict — false when the
    *                    document contains "lorem ipsum"
    *                    (case-insensitive) or a `{` (code/templating
    *                    tell); line cleaning cannot rescue such a page,
    *                    so route `keep_doc` into a filter.
    * Pure scan-stage HOFs — zero shuffles at any corpus size (unlike
    * [[Corpus.removeBoilerplateLines]], which needs corpus-wide line
    * counts; the two compose: C4 rules first, corpus-hot lines after). */
  def c4LineFilter(text: Column, minWords: Int = 3, sep: String = "\n"): Column =
    // input bound iff computed — same inlining guard as [[gopherQuality]]
    // (the body reads it for the split and twice for the page verdict)
    bindInput(text) { txt =>
    withBound(split(txt, java.util.regex.Pattern.quote(sep))) { raw =>
      def keepLine(l: Column): Column = withBound(trim(l)) { t =>
        (size(filter(split(t, "\\s+"), w => length(w) > 0)) >= minWords) &&
          substring(t, -1, 1).isin(".", "!", "?", "\"", "'") &&
          !contains(lower(t), lit("javascript"))
      }
      withBound(filter(raw, keepLine(_))) { kept =>
        struct(
          array_join(kept, sep).as("clean_text"),
          size(kept).as("kept_lines"),
          (size(raw) - size(kept)).as("dropped_lines"),
          (!contains(lower(txt), lit("lorem ipsum")) &&
            !contains(txt, lit("{"))).as("keep_doc"))
      }
    }
    }

  /** WITHIN-document duplicate-line removal — the intra-page dedup step
    * of web curation (nav menus, repeated footers, duplicated paragraphs
    * inside ONE page; the cross-corpus twin is
    * [[Corpus.removeBoilerplateLines]], and the two compose): a line
    * survives iff it is the FIRST occurrence of its TRIMMED form in the
    * document — comparison trims (SQL `trim`: leading/trailing SPACES,
    * the same rule DuckDB applies, so the oracles mirror exactly), output
    * stays verbatim (the c4LineFilter judging-vs-rewriting rule). Returns
    * one struct column:
    *   - `clean_text`: surviving lines re-joined with `sep`, verbatim
    *   - `kept_lines` / `dropped_lines`: line counts
    * Pure scan-stage HOFs — zero shuffles at any corpus size, no state,
    * streaming-admissible. Per-row cost O(lines²) worst case (each line
    * probes its prefix), bounded by lines-per-document, never corpus
    * size. */
  def lineDedup(text: Column, sep: String = "\n"): Column =
    withBound(split(text, java.util.regex.Pattern.quote(sep))) { raw =>
      withBound(transform(raw, l => trim(l))) { keys =>
        // first occurrence: no earlier line shares this line's trimmed
        // form (array_position is 1-based, 0 = absent — same convention
        // as DuckDB's list_position, which the oracles lean on)
        withBound(filter(raw, (_, i) =>
          array_position(slice(keys, lit(1), i), element_at(keys, i + 1)) === 0)) { kept =>
          struct(
            array_join(kept, sep).as("clean_text"),
            size(kept).as("kept_lines"),
            (size(raw) - size(kept)).as("dropped_lines"))
        }
      }
    }

  /** Number of PII-shaped substrings [[scrubPii]] would redact: matches
    * are counted pattern by pattern on the text as the scrub would see it
    * (i.e. after the previous patterns' redactions), so the total equals
    * the number of `[PII]` tokens the scrub inserts. */
  def piiCount(text: Column): Column = {
    val (total, _) = piiPatterns.foldLeft((lit(0), text)) {
      case ((cnt, cur), (_, p)) =>
        // coalesce: legacy sizeOfNull makes size(NULL) = -1 per pattern,
        // while DuckDB's len(regexp_extract_all(NULL)) is NULL — pin
        // both engines to 0 matches on null text
        (cnt + coalesce(size(regexp_extract_all(cur, lit(p), lit(0))), lit(0)),
          regexp_replace(cur, p, "[PII]"))
    }
    // a null document has no redactable substrings in either engine
    when(text.isNull, lit(null)).otherwise(total)
  }
}
