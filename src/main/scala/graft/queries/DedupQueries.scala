package graft.queries

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication pack (north-star): exact, n-gram Jaccard, MinHash-LSH,
  * SimHash over `documents`/`events`.
  */
object DedupQueries extends QueryPack {

  // q27 — exact dedup with a deterministic winner: one event kept per
  // (user_id, event_type), the one with the smallest event_id; other
  // columns follow via min_by. DuckDB oracle uses arg_min.
  private def q27(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(
        Tables.load(s, dir, "events").select("user_id", "event_type", "event_id", "value", "ts"),
        keyCols = Seq("user_id", "event_type"),
        idCol = "event_id")
      .orderBy(col("user_id").asc_nulls_first, col("event_type").asc_nulls_first)
  private val q27Sql = """
    SELECT user_id, event_type, MIN(event_id) AS event_id,
           ARG_MIN(value, event_id) AS value, ARG_MIN(ts, event_id) AS ts
    FROM events GROUP BY 1, 2
    ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST"""

  // q28 — exact 3-gram Jaccard near-dup pairs at τ=0.2 (the corpus has
  // planted near-dups ≥ 0.5). Explode-join-count: shuffle ∝ shared
  // shingles, verified exactly. The default stop-shingle skew guard
  // (df > max(1000, 0.1% of corpus)) is mirrored in the oracle; it never
  // fires at test SF, so the hash-compare still pins exact semantics.
  // EXACT-BASELINE tier: the low τ=0.2 makes this the all-shared-shingle
  // worst case (the production regime is q113/q53's banded path), so the
  // input is fixture-bounded to a third of the corpus (doc_id % 3 = 0) —
  // oracle cost stays constant as SF grows (round-9 verdict).
  private val sliceSql = "(SELECT * FROM documents WHERE doc_id % 3 = 0)"
  private def q28(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(
        Tables.load(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(3)) === 0),
        idCol = "doc_id", textCol = "text",
        shingleSize = 3, threshold = 0.2)
      .orderBy(col("idA").asc_nulls_first, col("idB").asc_nulls_first)
  /** Exact 3-gram Jaccard pair query, parameterized on the threshold and
    * the corpus expression — shared by q28's oracle (τ=0.2, third slice)
    * and q113's recall-gate oracle (τ=0.5, half slice). The stop-shingle
    * guard counts over the SAME corpus expression, mirroring how the
    * Spark side derives the guard from its input frame. */
  private def jaccardPairsSql(threshold: Double, corpus: String = "documents") = s"""
    WITH sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, greatest(len(t)-2, 1))]) AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM $corpus)),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
    ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sets),
    stop AS (SELECT shingle FROM ex GROUP BY shingle
             HAVING COUNT(*) > GREATEST(1000, (SELECT COUNT(*) FROM $corpus) // 1000)),
    exf AS (SELECT * FROM ex WHERE shingle NOT IN (SELECT shingle FROM stop)),
    common AS (
      SELECT a.doc_id AS idA, b.doc_id AS idB, COUNT(*) AS common
      FROM exf a JOIN exf b USING (shingle)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT idA, idB, common,
           ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 9) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = idA
    JOIN sizes sb ON sb.doc_id = idB
    WHERE ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 9) >= $threshold"""

  private val q28Sql = jaccardPairsSql(0.2, sliceSql) + """
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""

  // minhashCandidatePairs (64 hashes, 16 bands → catches Jaccard ≳ 0.3
  // with high probability) had a rows-only declared entry (q29) until
  // round 9: xxhash64 signatures have no DuckDB spelling, so the entry
  // added no verification signal beyond what q113 hash-pins per driver
  // run (recall vs the exact q28 pairs on the same code path) — retired;
  // ScalaTest keeps the recall bound. Likewise SimHash pairs (q30):
  // the identical path is now hash-gated three ways — q122 (set-equality
  // theorem), q140/q141 (planted-copy config gates) — so the rows-only
  // entry is folded into those.

  // q122 — SimHash pigeonhole THEOREM as a driver gate (the q113 pattern
  // for the Hamming tier): within radius d, a pair MUST collide on at
  // least one of d+1 signature chunks — so the banded+verified pair set
  // equals the brute-force Hamming pair set exactly, not probabilistically.
  // Spark computes both sets and emits their symmetric-difference count;
  // the oracle pins (0, TRUE). Signatures are xxhash64-derived (no DuckDB
  // spelling — why no per-pair oracle exists), but the SET EQUALITY is
  // engine-independent, which is what makes this gateable. Runs on the
  // doc_id % 8 slice (q113's rationale, one notch further: the
  // brute-force tier is quadratic and exists here only to verify, not to
  // bench — the theorem is checked over every pair of ~n/8 real docs,
  // still hundreds of documents and >10⁵ pairs at bench SF).
  private def q122(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(8)) === 0)
    // token hashes materialized ONCE, then the 64 bit-folds — the bulk
    // spelling; the convenience simhash(text) re-tokenizes per bit
    val sigs = docs
      .select(col("doc_id"),
        transform(graft.ops.TextAnalysis.tokens(col("text")),
          t => xxhash64(t)).as("__th"))
      .select(col("doc_id"), Dedup.simhashFromHashes(col("__th")).as("sig"))
    val exact = sigs.select(col("doc_id").as("idA"), col("sig").as("sigA"))
      .crossJoin(broadcast(sigs.select(col("doc_id").as("idB"), col("sig").as("sigB"))))
      .filter(col("idA") < col("idB") &&
        Dedup.hamming(col("sigA"), col("sigB")) <= 3)
      .select("idA", "idB")
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("idA", "idB")
    exact.join(banded, Seq("idA", "idB"), "left_anti")
      .agg(count(lit(1)).as("__m"))
      .crossJoin(banded.join(exact, Seq("idA", "idB"), "left_anti")
        .agg(count(lit(1)).as("__i")))
      .select((col("__m") + col("__i")).as("set_diff"),
        (col("__m") + col("__i") === 0).as("theorem_holds"))
  }
  private val q122Sql =
    "SELECT CAST(0 AS BIGINT) AS set_diff, TRUE AS theorem_holds"

  // q45 — the COMPLETE near-dedup pipeline: exact 3-gram Jaccard pairs at
  // τ=0.5 → connected components (min-label propagation) → keep one
  // representative per cluster. Oracle rebuilds the same pipeline in
  // DuckDB with a recursive CTE for the transitive closure. EXACT-
  // BASELINE tier like q28 (q53 is the production LSH twin of this
  // pipeline): runs on the doc_id % 3 = 0 slice so the explode-join
  // baseline stays fixture-bounded as SF grows (round-9 verdict).
  private def q45(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    Dedup.dedupByClusters(docs, pairs, "doc_id")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy(col("doc_id").asc_nulls_first)
  }
  /** One template for both dedup-pipeline oracles: q45 mirrors the
    * explode-join path WITH the stop-shingle guard; q53 mirrors the
    * verify-on-candidates path, which intersects full sets (no guard).
    * Shared so an edit to the shingle construction, Jaccard rounding, or
    * recursive closure can't desynchronize the two. */
  private def dedupPipelineSql(stopGuard: Boolean,
      corpus: String = "documents"): String = {
    val guardCtes =
      if (stopGuard) s"""
    stop AS (SELECT shingle FROM ex GROUP BY shingle
             HAVING COUNT(*) > GREATEST(1000, (SELECT COUNT(*) FROM $corpus) // 1000)),
    exf AS (SELECT * FROM ex WHERE shingle NOT IN (SELECT shingle FROM stop)),"""
      else ""
    val pairSrc = if (stopGuard) "exf" else "ex"
    s"""
    WITH sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, greatest(len(t)-2, 1))]) AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM $corpus)),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
    ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sets),$guardCtes
    pairs AS (
      SELECT idA, idB FROM (
        SELECT a.doc_id AS idA, b.doc_id AS idB, COUNT(*) AS common
        FROM $pairSrc a JOIN $pairSrc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2) c
      JOIN sizes sa ON sa.doc_id = idA
      JOIN sizes sb ON sb.doc_id = idB
      WHERE ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 9) >= 0.5),
    edges AS (SELECT idA AS src, idB AS dst FROM pairs
              UNION ALL SELECT idB, idA FROM pairs),
    reach AS (
      WITH RECURSIVE r(a, b) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        WHERE e.dst <> r.a)
      SELECT * FROM r),
    clusters AS (
      SELECT a AS id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a),
    losers AS (SELECT id FROM clusters WHERE id <> cluster)
    SELECT doc_id, lang, source, n_chars FROM $corpus
    WHERE doc_id NOT IN (SELECT id FROM losers)
    ORDER BY doc_id ASC NULLS FIRST"""
  }
  private val q45Sql = dedupPipelineSql(stopGuard = true, sliceSql)

  // q53 — the PRODUCTION near-dedup pipeline shape: MinHash-LSH candidates
  // → exact Jaccard verify on candidates only → connected components →
  // representatives. Its oracle is q45's recursive-CTE pipeline WITHOUT
  // the stop-shingle CTE: verify-on-candidates intersects the FULL shingle
  // sets (no guard is needed — fan-out is bounded by the candidate list),
  // so on a corpus where q45's guard fires the two pipelines legitimately
  // differ and each carries its own matching oracle. On this corpus LSH at
  // 64 hashes × 16 bands misses no pair ≥ 0.5 (the OpsSpec recall
  // invariant), so the hash-compare proves the approximate pipeline loses
  // nothing, while its shuffles are candidate-shaped, not corpus-shaped —
  // q45 stays as the exact explode-join baseline.
  private val q53Sql = dedupPipelineSql(stopGuard = false)

  private def q53(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val cands = Dedup.minhashCandidatePairs(docs, "doc_id", "text", 3, 64, 16)
    val pairs = Dedup.verifyJaccardPairs(docs, "doc_id", "text", cands, 3, 0.5)
    Dedup.dedupByClusters(docs, pairs, "doc_id")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy(col("doc_id").asc_nulls_first)
  }

  // q51 — exact dedup from the config language: the `dedup` node key with
  // a deterministic min-id winner, then a keep/order — same semantics the
  // Scala API exposes in q27, now reachable by a config author (and, with
  // within_watermark, by streaming compiles — see StreamingSpec).
  private def q51(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "keep_columns": ["user_id", "event_type", "event_id", "value", "ts"],
       "dedup": {"keys": ["user_id", "event_type"], "id_col": "event_id"},
       "order_by": ["user_id asc", "event_type asc"]}""")
  }
  private val q51Sql = """
    SELECT user_id, event_type, MIN(event_id) AS event_id,
           ARG_MIN(value, event_id) AS value, ARG_MIN(ts, event_id) AS ts
    FROM events GROUP BY 1, 2
    ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST"""

  // q212 — QUALITY-AWARE dedup retention from the config language:
  // dedup.order_col keeps the BEST-scoring row per key (here the
  // highest-value event; ties by min event_id) instead of the min-id
  // row — the "keep the duplicate class's best copy" recipe. Same single
  // min_by aggregate as q27/q51 (map-side combine intact; no window over
  // the corpus). The oracle restates the winner as a row_number window.
  private def q212(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "keep_columns": ["user_id", "event_type", "event_id", "value", "ts"],
       "dedup": {"keys": ["user_id", "event_type"], "id_col": "event_id",
                 "order_col": "value"},
       "order_by": ["user_id asc", "event_type asc"]}""")
  }
  private val q212Sql = """
    SELECT user_id, event_type, event_id, value, ts FROM (
      SELECT user_id, event_type, event_id, value, ts,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY value DESC, event_id ASC) AS rn
      FROM events) WHERE rn = 1
    ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST"""

  // q214 — SOFT dedup from the config language: count_col carries each
  // duplicate class's size on the kept row (here composed with the
  // best-copy order_col winner) — the down-weight-by-duplication signal
  // a trainer consumes instead of a hard drop. Still ONE aggregate; the
  // oracle restates winner and class size as two windows.
  private def q214(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "keep_columns": ["user_id", "event_type", "event_id", "value",
                        "dup_count"],
       "dedup": {"keys": ["user_id", "event_type"], "id_col": "event_id",
                 "order_col": "value", "count_col": "dup_count"},
       "order_by": ["user_id asc", "event_type asc"]}""")
  }
  private val q214Sql = """
    SELECT user_id, event_type, event_id, value, dup_count FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY value DESC, event_id ASC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY user_id, event_type)
               AS BIGINT) AS dup_count
      FROM events) WHERE rn = 1
    ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST"""

  // q88 — INCREMENTAL ingestion dedup: the daily-delta production shape.
  // docs with doc_id % 3 = 0 play the existing corpus (reduced to its
  // fingerprint index — at 100 TB you maintain this index, never re-scan
  // history); the rest play the incoming batch, deduped within itself
  // (min-id winner per content fingerprint) and against the index by
  // left-anti join. Both shuffles are incoming-batch-shaped. The portable
  // fingerprint makes the whole thing oracle hash-checkable (fpSql — the
  // q26/q60 shared generator).
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val fp = graft.ops.TextAnalysis.fingerprintPortable(col("text"))
    val incoming = d.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("lang"), fp.as("fp"))
    val seen = d.filter(col("doc_id") % 3 === 0).select(fp.as("fp"))
    Dedup.dedupAgainstCorpus(incoming, seen, Seq("fp"), "doc_id")
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q88Sql = s"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    fps AS (SELECT doc_id, lang, ${TextQueries.fpSql("t")} AS fp FROM toks),
    inc AS (SELECT fp, MIN(doc_id) AS doc_id, ARG_MIN(lang, doc_id) AS lang
            FROM fps WHERE doc_id % 3 <> 0 GROUP BY fp),
    seen AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 3 = 0)
    SELECT fp, doc_id, lang FROM inc
    WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.fp = inc.fp)
    ORDER BY doc_id ASC NULLS FIRST"""

  // q225 — EXACT seen filter against a PERSISTED key index (the at-rest
  // artifact q88's in-memory seen-frame becomes in production): the fp
  // index of the existing corpus (doc_id % 3 = 0) is written to parquet
  // — the layout an `exact_ingest` sink maintains — and a PURE-JSON
  // pipeline derives each document's portable fingerprint and flags it
  // against the index (`seen_filter` mode "flag"; mode "drop" is the
  // same join as left-anti). Flag mode keeps every row, so the oracle
  // gates the full decision vector: a doc flags iff its fp is among the
  // indexed fps — including cross-partition duplicate TEXT (an incoming
  // doc whose content matches an indexed doc flags even though its id
  // was never indexed; that is the point of content keys). The index
  // side reduces to distinct keys — the join is key-shaped, and AQE
  // broadcasts it when small.
  private def q225(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q225_seen"
    val d = Tables.load(s, dir, "documents")
    val fp = graft.ops.TextAnalysis.fingerprintPortable(col("text"))
    d.filter(col("doc_id") % 3 === 0).select(fp.as("fp"))
      .write.mode("overwrite").parquet(idxDir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "derive": {"fp": "doc_fingerprint_portable(text)"},
       "keep_columns": ["doc_id", "fp"],
       "seen_filter": {"key_col": "fp", "index_dir": "$idxDir", "mode": "flag"},
       "order_by": ["doc_id asc"]}""")
  }
  private val q225Sql = s"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    fps AS (SELECT doc_id, ${TextQueries.fpSql("t")} AS fp FROM toks),
    seenk AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 3 = 0)
    SELECT f.doc_id, f.fp,
           EXISTS (SELECT 1 FROM seenk WHERE seenk.fp = f.fp) AS seen
    FROM fps f
    ORDER BY f.doc_id ASC NULLS FIRST"""

  // q97 — INCREMENTAL near-dup ingestion: q88's daily-delta shape upgraded
  // from exact fingerprints to MinHash near-duplicates. Corpus = docs with
  // doc_id % 3 = 0, reduced to its PERSISTED band index
  // (Dedup.minhashBandIndex — the artifact a production ingest maintains);
  // incoming = the rest, deduped within itself (LSH → verify → clusters →
  // min-id rep) and against the corpus (index probe → exact-Jaccard verify
  // on candidates only). Same regime q53 proved lossless on this corpus
  // (3-shingles, 64 hashes × 16 bands, τ=0.5 — the OpsSpec recall
  // invariant is pairwise, so it holds on the split too), so the EXACT
  // DuckDB oracle applies: incoming minus in-batch closure losers minus
  // corpus-similar docs, with the same Jaccard construction and rounding
  // as the q45/q53 template.
  private def q97(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val corpus = d.filter(col("doc_id") % 3 === 0)
    val incoming = d.filter(col("doc_id") % 3 =!= 0)
    val index = Dedup.minhashBandIndex(corpus, "doc_id", "text", 3, 64, 16)
    Dedup.nearDupAgainstCorpus(
        incoming, index, corpus.select("doc_id", "text"),
        idCol = "doc_id", textCol = "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q97Sql = """
    WITH sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, greatest(len(t)-2, 1))]) AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
    ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sets),
    -- tier 1: in-batch pairs (both sides incoming) + transitive closure
    pairs AS (
      SELECT idA, idB FROM (
        SELECT a.doc_id AS idA, b.doc_id AS idB, COUNT(*) AS common
        FROM ex a JOIN ex b USING (shingle)
        WHERE a.doc_id < b.doc_id AND a.doc_id % 3 <> 0 AND b.doc_id % 3 <> 0
        GROUP BY 1, 2) c
      JOIN sizes sa ON sa.doc_id = idA
      JOIN sizes sb ON sb.doc_id = idB
      WHERE ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 9) >= 0.5),
    edges AS (SELECT idA AS src, idB AS dst FROM pairs
              UNION ALL SELECT idB, idA FROM pairs),
    reach AS (
      WITH RECURSIVE r(a, b) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        WHERE e.dst <> r.a)
      SELECT * FROM r),
    clusters AS (
      SELECT a AS id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a),
    losers AS (SELECT id FROM clusters WHERE id <> cluster),
    -- tier 2: incoming docs near-duplicate to ANY corpus doc
    crossdup AS (
      SELECT DISTINCT idA AS id FROM (
        SELECT a.doc_id AS idA, b.doc_id AS idB, COUNT(*) AS common
        FROM ex a JOIN ex b USING (shingle)
        WHERE a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0
        GROUP BY 1, 2) c
      JOIN sizes sa ON sa.doc_id = idA
      JOIN sizes sb ON sb.doc_id = idB
      WHERE ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 9) >= 0.5)
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id % 3 <> 0
      AND doc_id NOT IN (SELECT id FROM losers)
      AND doc_id NOT IN (SELECT id FROM crossdup)
    ORDER BY doc_id ASC NULLS FIRST"""

  // q101 — edit-distance verify on prefix-blocked candidates: docs sharing
  // a 24-char text prefix become candidates (classic record-linkage
  // blocking, one shuffle), then the Levenshtein verify tier keeps pairs
  // with normalized similarity ≥ 0.8. Both engines implement classic
  // unit-cost Levenshtein → exact oracle. The short-field near-dup path
  // that shingle Jaccard (q28/q53) is too coarse for. The default-on
  // hot-bucket auto cap (max(1000, 0.1%·N)) is inert at oracle scale —
  // no 24-char prefix bucket approaches 1000 docs in the fixtures — so
  // the uncapped oracle self-join is an exact mirror.
  private def q101(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val cands = Dedup.blockedCandidatePairs(
      docs, idCol = "doc_id", blockKey = substring(col("text"), 1, 24))
    Dedup.verifyEditDistancePairs(
        docs, idCol = "doc_id", textCol = "text", candidates = cands, threshold = 0.8)
      .orderBy(col("idA").asc_nulls_first, col("idB").asc_nulls_first)
  }
  private val q101Sql = """
    WITH c AS (
      SELECT a.doc_id AS idA, b.doc_id AS idB, a.text AS ta, b.text AS tb
      FROM documents a JOIN documents b
        ON substr(a.text, 1, 24) = substr(b.text, 1, 24) AND a.doc_id < b.doc_id)
    SELECT idA, idB, CAST(levenshtein(ta, tb) AS BIGINT) AS dist,
           ROUND(1.0 - CAST(levenshtein(ta, tb) AS DOUBLE)
                       / GREATEST(LENGTH(ta), LENGTH(tb), 1), 9) AS sim
    FROM c
    WHERE ROUND(1.0 - CAST(levenshtein(ta, tb) AS DOUBLE)
                      / GREATEST(LENGTH(ta), LENGTH(tb), 1), 9) >= 0.8
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""

  // q105 — q101 as PURE JSON: the `edit_dedup` node key (blocking
  // expression + normalized-Levenshtein verify) with the same exact
  // oracle. Proves the short-field near-dup tier is config-reachable.
  private def q105(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "edit_dedup": {"id_col": "doc_id", "text_col": "text",
                      "block_expr": "substring(text, 1, 24)",
                      "threshold": 0.8},
       "order_by": ["idA asc", "idB asc"]}""")

  // q113 — LSH recall as a DRIVER-VERIFIED gate (the bounded-estimate
  // pattern applied to the hash-based tier): Spark computes the exact
  // ≥0.5 Jaccard pair set AND how many of them the MinHash-LSH candidate
  // stage misses, and emits (n_exact, recall_ok = missed ≤ 10%). The
  // oracle pins n_exact exactly (the q28 machinery at τ=0.5) and TRUE.
  // Deterministic: fixed-seed signatures make recall a pure function of
  // the corpus; the 10% slack absorbs borderline pairs if the driver
  // regenerates data. A recall regression now FAILS the hash gate, not
  // just a ScalaTest. Runs on the doc_id-even HALF of the corpus: the
  // exact tier's shingle-join cost is superlinear in corpus size and q28
  // already pays it in full — the gate's verification value survives the
  // slice, the bench does not re-measure the baseline.
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 0)
    val exact = Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", shingleSize = 3, threshold = 0.5).select("idA", "idB")
    val cand = Dedup.minhashCandidatePairs(
      docs, "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16)
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val nMissed = exact.join(cand, Seq("idA", "idB"), "left_anti")
      .agg(count(lit(1)).as("__missed"))
    nExact.crossJoin(nMissed)
      .select(col("n_exact"),
        (col("__missed").cast("double") <= col("n_exact").cast("double") * 0.1)
          .as("recall_ok"))
  }
  private val q113Sql = s"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
    FROM (${jaccardPairsSql(0.5, "(SELECT * FROM documents WHERE doc_id % 2 = 0)")})"""

  // q131 — exact SUBSTRING-level dedup (the "dedup by 50-token windows"
  // corpus pass, here at window=8 so the test corpus' planted duplicate
  // docs surface interior spans): rolling-Horner window fingerprints →
  // one shuffle on fp ranks occurrences (global first survives) → spans
  // via gaps-and-islands. The oracle replays the identical modular
  // arithmetic in DuckDB (the q26 fingerprint mirror, windowed), so this
  // is a full hash-match gate on the kernel AND the span algebra.
  private val winTok = 8
  private def q131(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatePassageSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", winTok)
      .orderBy(col("doc_id").asc_nulls_first, col("span_start").asc_nulls_first)
  /** Shared CTE chain: window fingerprints → duplicate windows → merged
    * spans, DuckDB-side. Used by q131 (spans) and q132 (strip). */
  private def passageSpansSql(n: Int) = s"""
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    th AS (
      SELECT doc_id, list_transform(t, tok ->
        list_reduce(list_prepend(CAST(7 AS BIGINT),
          list_transform(range(1, len(tok) + 1), i -> CAST(ascii(tok[i]) AS BIGINT))),
          (a, c) -> (a * 131 + c) % 1000000007)) AS h
      FROM toks),
    wins AS (
      SELECT doc_id, unnest([{'pos': p, 'fp':
          list_reduce(list_prepend(CAST(0 AS BIGINT), h[p + 1 : p + $n]),
            (a, x) -> (a * 31 + x) % 1000000007)}
        for p in range(0, greatest(len(h) - ${n - 1}, 0))], recursive := true)
      FROM th),
    ranked AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
      FROM wins),
    dup AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $n
                  THEN 0 ELSE 1 END AS brk
      FROM dup),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl),
    spans AS (
      SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
             CAST(MAX(pos) + $n AS INT) AS span_end,
             COUNT(*) AS dup_windows
      FROM isl2 GROUP BY doc_id, island)"""
  private val q131Sql = s"""
    WITH ${passageSpansSql(winTok)}
    SELECT doc_id, span_start, span_end, dup_windows
    FROM spans
    ORDER BY doc_id ASC NULLS FIRST, span_start ASC NULLS FIRST"""

  // q132 — the spans APPLIED: clean_text with duplicate-passage tokens
  // removed (survivors re-joined with single spaces) + dropped_tokens.
  // Gates the Spark-side span application (filter-with-index + exists
  // over the doc's span list), not just span discovery.
  private def q132(s: SparkSession, dir: String): DataFrame =
    Dedup.stripDuplicatePassages(
        Tables.load(s, dir, "documents"), "doc_id", "text", winTok)
      .select("doc_id", "clean_text", "dropped_tokens")
      .orderBy(col("doc_id").asc_nulls_first)
  private val q132Sql = s"""
    WITH ${passageSpansSql(winTok)},
    sp AS (
      SELECT doc_id, list({'s': span_start, 'e': span_end}) AS drops
      FROM spans GROUP BY doc_id),
    applied AS (
      SELECT t.doc_id, t.t,
             CASE WHEN d.drops IS NULL THEN t.t
                  ELSE [t.t[i] for i in generate_series(1, len(t.t))
                        if len(list_filter(d.drops,
                             x -> i - 1 >= x.s AND i - 1 < x.e)) = 0]
             END AS kept
      FROM toks t LEFT JOIN sp d USING (doc_id))
    SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS clean_text,
           CAST(len(t) - len(kept) AS BIGINT) AS dropped_tokens
    FROM applied ORDER BY doc_id ASC NULLS FIRST"""

  // q139 — INCREMENTAL substring dedup: the corpus/incoming split of q97
  // at passage granularity. Corpus = doc_id % 3 != 0 (its persisted
  // window index is built in-query); incoming = doc_id % 3 = 0. A window
  // in the incoming batch is duplicate if seen earlier in the batch or
  // present in the index (then EVERY batch occurrence is, including the
  // first). Exact windowed-fingerprint oracle — order-independence is
  // what makes the incremental tier hash-checkable.
  private def q139(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val index = Dedup.passageWindowIndex(corpus, "doc_id", "text", winTok)
    Dedup.passageDedupAgainstCorpus(incoming, index, "doc_id", "text", winTok)
      .orderBy(col("doc_id").asc_nulls_first, col("span_start").asc_nulls_first)
  }
  private val q139Sql = s"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    th AS (
      SELECT doc_id, list_transform(t, tok ->
        list_reduce(list_prepend(CAST(7 AS BIGINT),
          list_transform(range(1, len(tok) + 1), i -> CAST(ascii(tok[i]) AS BIGINT))),
          (a, c) -> (a * 131 + c) % 1000000007)) AS h
      FROM toks),
    wins AS (
      SELECT doc_id, unnest([{'pos': p, 'fp':
          list_reduce(list_prepend(CAST(0 AS BIGINT), h[p + 1 : p + $winTok]),
            (a, x) -> (a * 31 + x) % 1000000007)}
        for p in range(0, greatest(len(h) - ${winTok - 1}, 0))], recursive := true)
      FROM th),
    corp AS (SELECT DISTINCT fp FROM wins WHERE doc_id % 3 <> 0),
    inc AS (SELECT doc_id, pos, fp FROM wins WHERE doc_id % 3 = 0),
    ranked AS (
      SELECT doc_id, pos, fp,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
      FROM inc),
    dup AS (
      SELECT doc_id, pos FROM ranked WHERE rn > 1
      UNION
      SELECT doc_id, pos FROM inc WHERE fp IN (SELECT fp FROM corp)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $winTok
                  THEN 0 ELSE 1 END AS brk
      FROM dup),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl)
    SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
           CAST(MAX(pos) + $winTok AS INT) AS span_end,
           COUNT(*) AS dup_windows
    FROM isl2 GROUP BY doc_id, island
    ORDER BY doc_id ASC NULLS FIRST, span_start ASC NULLS FIRST"""

  // q133 — q131 from PURE JSON: the `passage_dedup` node key end to end,
  // same oracle (config path == API path is the hash-checked claim).
  private def q133(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"id": "passdd",
       "source": {"table": "documents"},
       "passage_dedup": {"id_col": "doc_id", "text_col": "text",
                         "window_tokens": $winTok}}""")
      .orderBy(col("doc_id").asc_nulls_first, col("span_start").asc_nulls_first)
  }

  // q140/q141 — the simhash_dedup CONFIG key, gated like q130/q134:
  // plant exact-text copies (doc_id + 10⁷) of every doc_id % 20 = 0 doc
  // into a doc_id % 4 = 0 base corpus. Identical text ⇒ identical
  // SimHash, so the invariants hold EXACTLY no matter what background
  // near-dups exist between distinct docs:
  //  pairs (q140): every planted copy pairs with ITS base at dist 0, and
  //    (idB - idA = 10⁷) can only be such a pair (base ids < 10⁷) —
  //    count == planted count;
  //  clusters (q141): totality, every copy lands in a base-led cluster
  //    (its component contains the smaller base id), no copy-led
  //    clusters.
  private def simhashCorpus = """
    {"op": "union", "nodes": [
      {"id": "base", "source": {"table": "documents"},
       "filters": ["doc_id % 4 = 0"],
       "keep_columns": ["doc_id", "text"]},
      {"id": "planted", "source": {"table": "documents"},
       "filters": ["doc_id % 20 = 0"],
       "derive": {"doc_id2": "doc_id + 10000000"},
       "keep_columns": ["doc_id2", "text"],
       "rename": {"doc_id2": "doc_id"}}]}"""
  private def q140(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"id": "shpairs", "combine": $simhashCorpus,
       "simhash_dedup": {"id_col": "doc_id", "text_col": "text",
                         "max_dist": 3},
       "aggregate": {"aggregations": [
         {"col": "*", "func": "count",
          "filter": "idB - idA = 10000000 and dist = 0",
          "new_name": "planted_found"}]}}""")
  }
  private val q140Sql = """
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS planted_found"""
  private def q141(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"id": "shclusters", "combine": $simhashCorpus,
       "simhash_dedup": {"id_col": "doc_id", "text_col": "text",
                         "max_dist": 3, "output": "clusters"},
       "aggregate": {"aggregations": [
         {"col": "*", "func": "count", "new_name": "total_rows"},
         {"col": "*", "func": "count",
          "filter": "id >= 10000000 and cluster < 10000000",
          "new_name": "copies_merged"},
         {"col": "*", "func": "count", "filter": "cluster >= 10000000",
          "new_name": "copy_led_clusters"}]}}""")
  }
  private val q141Sql = """
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 4 = 0) +
                (SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS total_rows,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS copies_merged,
           CAST(0 AS BIGINT) AS copy_led_clusters"""

  // q217 — NEAR-dup best-copy retention as ONE config key (the r15
  // cookbook promoted to `retention` on the cluster tiers): three
  // versions of every doc_id % 5 = 0 doc — base (score 1), a re-crawl at
  // +10⁷ (score 3), and for % 10 = 0 a third at +2·10⁷ (score 2) — carry
  // IDENTICAL synthetic text per class ('cls<id> …'), so with max_dist 0
  // each class is exactly one cluster and the survivor set is fully
  // determined: the score-3 re-crawl wins every class (NOT the min id —
  // the exact-dedup rule would keep the base), labelled by the class's
  // min id. Row-level exact oracle: (cluster, winner id, text, score).
  private def q217(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"id": "retain", "combine": {"op": "union", "nodes": [
        {"id": "v0", "source": {"table": "documents"},
         "filters": ["doc_id % 5 = 0"],
         "derive": {"mtext": "concat('cls', doc_id, ' alpha beta gamma delta epsilon')",
                    "score": "cast(1.0 as double)"},
         "keep_columns": ["doc_id", "mtext", "score"]},
        {"id": "v1", "source": {"table": "documents"},
         "filters": ["doc_id % 5 = 0"],
         "derive": {"mtext": "concat('cls', doc_id, ' alpha beta gamma delta epsilon')",
                    "doc_id2": "doc_id + 10000000",
                    "score": "cast(3.0 as double)"},
         "keep_columns": ["doc_id2", "mtext", "score"],
         "rename": {"doc_id2": "doc_id"}},
        {"id": "v2", "source": {"table": "documents"},
         "filters": ["doc_id % 10 = 0"],
         "derive": {"mtext": "concat('cls', doc_id, ' alpha beta gamma delta epsilon')",
                    "doc_id3": "doc_id + 20000000",
                    "score": "cast(2.0 as double)"},
         "keep_columns": ["doc_id3", "mtext", "score"],
         "rename": {"doc_id3": "doc_id"}}]},
       "simhash_dedup": {"id_col": "doc_id", "text_col": "mtext",
                         "max_dist": 0, "output": "clusters",
                         "retention": {"order_col": "score"}},
       "order_by": ["cluster asc"]}""")
  }
  private val q217Sql = """
    SELECT doc_id AS cluster,
           doc_id + 10000000 AS doc_id,
           'cls' || CAST(doc_id AS VARCHAR) || ' alpha beta gamma delta epsilon' AS mtext,
           CAST(3.0 AS DOUBLE) AS score
    FROM documents WHERE doc_id % 5 = 0
    ORDER BY cluster ASC NULLS FIRST"""

  // q281 — CONTINUOUS exact-dedup ingest LIFECYCLE (`exact_ingest` +
  // `compact_every` + `ingest_compact`) under the driver hash — the
  // q275/q280 pattern for the area-layout ingests: the documents table
  // plus a re-keyed copy of its every-third doc (guaranteed cross-batch
  // content duplicates) streams through the fingerprint-keyed
  // exact_ingest sink one staged file per micro-batch, with in-stream
  // area folds every 2 batches; the final checkpoint-scoped
  // ingest_compact folds the tail, leaving ONE batch dir per area. The
  // gate is batching-invariant by construction — WHICH doc id wins a
  // fingerprint depends on file splits, but each fingerprint is
  // admitted EXACTLY ONCE — so the oracle asserts the full fp-level
  // decision vector: one corpus row and one index row per distinct
  // document fingerprint (a fold that duplicated rows → n=2; one that
  // lost rows → a missing fp; both hash-fail), plus the post-compact
  // dir count of both areas (the compaction actually completed).
  private val q281Base =
    s"${System.getProperty("java.io.tmpdir")}/graft_q281_ei"
  private def q281(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.functions.Registry.registerAll(s)
    rmrf(new java.io.File(q281Base))
    s.sql("""SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 1000000 AS doc_id, text FROM documents
             WHERE doc_id % 3 = 0""")
      .repartition(5).write.mode("overwrite").parquet(s"$q281Base/in")
    val q = graft.compile.Compiler.compileStreamJson(s, s"""
      {"source": {"path": "$q281Base/in",
                  "options": {"maxFilesPerTrigger": "1"}},
       "derive": {"fp": "doc_fingerprint_portable(text)"},
       "exact_ingest": {"id_col": "doc_id", "key_cols": ["fp"],
                        "corpus_dir": "$q281Base/corpus",
                        "index_dir": "$q281Base/index",
                        "checkpoint_dir": "$q281Base/ckpt",
                        "compact_every": 2}}""")
    try q.processAllAvailable() finally q.stop()
    val report = graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT 1 AS one"},
       "ingest_compact": {"dirs": ["$q281Base/corpus", "$q281Base/index"],
                          "checkpoint": "$q281Base/ckpt"},
       "order_by": ["area_ix asc"]}""")
      .collect().map(_.getLong(1))
    val corpus = s.read.parquet(s"$q281Base/corpus")
      .groupBy("fp").agg(count(lit(1)).as("n_corpus"))
    val index = s.read.parquet(s"$q281Base/index")
      .groupBy("fp").agg(count(lit(1)).as("n_index"))
    // full join: an fp on one side only surfaces as a NULL count —
    // hash-fails against the oracle's (1, 1) row
    corpus.join(index, Seq("fp"), "full")
      .withColumn("dirs_corpus", lit(report(0)))
      .withColumn("dirs_index", lit(report(1)))
      .orderBy(col("fp").asc_nulls_first)
  }
  private val q281Sql = s"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    fps AS (SELECT DISTINCT ${TextQueries.fpSql("t")} AS fp FROM toks)
    SELECT fp, CAST(1 AS BIGINT) AS n_corpus, CAST(1 AS BIGINT) AS n_index,
           CAST(1 AS BIGINT) AS dirs_corpus, CAST(1 AS BIGINT) AS dirs_index
    FROM fps ORDER BY fp ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q27_dedup_exact", q27, Some(q27Sql)),
    Q("q28_ngram_jaccard", q28, Some(q28Sql)),
    Q("q122_simhash_pigeonhole_gate", q122, Some(q122Sql)),
    Q("q45_dedup_pipeline", q45, Some(q45Sql)),
    Q("q51_config_dedup", q51, Some(q51Sql)),
    Q("q53_dedup_pipeline_lsh", q53, Some(q53Sql)),
    Q("q88_incremental_dedup", q88, Some(q88Sql)),
    Q("q225_seen_filter", q225, Some(q225Sql)),
    Q("q97_incremental_neardup", q97, Some(q97Sql)),
    Q("q101_edit_distance_verify", q101, Some(q101Sql)),
    Q("q105_config_edit_dedup", q105, Some(q101Sql)),
    Q("q113_lsh_recall_gate", q113, Some(q113Sql)),
    Q("q131_passage_dedup", q131, Some(q131Sql)),
    Q("q132_passage_strip", q132, Some(q132Sql)),
    Q("q133_config_passage_dedup", q133, Some(q131Sql)),
    Q("q139_incremental_passage_dedup", q139, Some(q139Sql)),
    Q("q140_config_simhash_pairs", q140, Some(q140Sql)),
    Q("q141_config_simhash_clusters", q141, Some(q141Sql)),
    Q("q194_winnow_index", q194, Some(q194Sql)),
    Q("q195_winnow_pairs", q195, Some(q195Sql)),
    Q("q198_winnow_probe", q198, Some(q198Sql)),
    Q("q212_dedup_best_copy", q212, Some(q212Sql)),
    Q("q214_dedup_soft_count", q214, Some(q214Sql)),
    Q("q217_neardup_retention", q217, Some(q217Sql)),
    Q("q281_exact_ingest_lifecycle", q281, Some(q281Sql))
  )

  // q198 — INCREMENTAL MOSS probe: the corpus/incoming split (q88/q97/
  // q139 convention) at the COMPACTED index's cost — corpus docs build a
  // winnowIndexFps, incoming docs are flagged by shared-selection count.
  // Planted 24-token blocks (corpus id%9=1, incoming id%9=0 share one
  // literal block ≥ 2·(w+k−1), so interior selections must collide on
  // both sides) make the flag provably fire; the oracle recomputes the
  // whole selection + probe arithmetic either way.
  private def q198(s: SparkSession, dir: String): DataFrame = {
    val block = (1 to 24).map("wq" + _).mkString(" ")
    val base = Tables.load(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 9 === 0 || col("doc_id") % 9 === 1,
        concat(col("text"), lit(" " + block))).otherwise(col("text")).as("mtext"))
    val corpus = base.filter(col("doc_id") % 3 =!= 0)
    val incoming = base.filter(col("doc_id") % 3 === 0)
    val idx = Dedup.winnowIndexFps(corpus, "doc_id", "mtext", wnK, wnW)
    Dedup.winnowProbeAgainstCorpus(incoming, idx, "doc_id", "mtext",
        wnK, wnW, minShared = 2)
      .select("doc_id", "matched_fps", "near_dup")
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q198Sql = s"""
    WITH wdocs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 IN (0, 1)
                  THEN text || ' ' || ${(1 to 24).map(i => s"'wq$i'").mkString(" || ' ' || ")}
                  ELSE text END AS text
      FROM documents),
    ${winnowSelCtes("wdocs")},
    corp AS (SELECT DISTINCT fp FROM sel WHERE doc_id % 3 <> 0),
    inc AS (SELECT DISTINCT doc_id, fp FROM sel WHERE doc_id % 3 = 0),
    m AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS matched_fps
      FROM inc WHERE fp IN (SELECT fp FROM corp) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(m.matched_fps, 0) AS matched_fps,
           COALESCE(m.matched_fps, 0) >= 2 AS near_dup
    FROM (SELECT doc_id FROM wdocs WHERE doc_id % 3 = 0) d
    LEFT JOIN m USING (doc_id)
    ORDER BY doc_id ASC NULLS FIRST"""

  // q194 — WINNOWED fingerprint selection (the MOSS algorithm): per doc,
  // only the rightmost minimum of every 4 consecutive 8-token window
  // hashes survives — the provable-floor index compaction of the passage
  // tier. The oracle restates the SELECTION itself (list-slice min +
  // rightmost argmin over the same rolling-hash stream), so both the
  // rolling hashes and the winnow rule are under the hash gate.
  private final val wnK = 8 // fingerprint granularity (tokens)
  private final val wnW = 4 // winnow window (detection floor wnW+wnK-1 tokens)
  private def q194(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowIndex(Tables.load(s, dir, "documents"),
        "doc_id", "text", windowTokens = wnK, winnowWindow = wnW)
      .orderBy(col("doc_id").asc_nulls_first, col("pos").asc_nulls_first)
  /** Shared CTE chain ending in `sel(doc_id, pos, fp)` — the winnowed
    * selection mirrored from WinnowOps — over a caller-supplied
    * `wdocs(doc_id, text)` CTE (q194/q198 share it). */
  private def winnowSelCtes(src: String): String = s"""
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM $src),
    th AS (
      SELECT doc_id, list_transform(t, tok ->
        list_reduce(list_prepend(CAST(7 AS BIGINT),
          list_transform(range(1, len(tok) + 1), i -> CAST(ascii(tok[i]) AS BIGINT))),
          (a, c) -> (a * 131 + c) % 1000000007)) AS h
      FROM toks),
    fl AS (
      SELECT doc_id,
             [list_reduce(list_prepend(CAST(0 AS BIGINT), h[p + 1 : p + $wnK]),
                (a, x) -> (a * 31 + x) % 1000000007)
              for p in range(0, greatest(len(h) - ${wnK - 1}, 0))] AS fs
      FROM th),
    win AS (
      SELECT doc_id, unnest([
          {'pos': CAST(i + len(fs[i + 1 : least(i + $wnW, len(fs))])
                   - list_position(list_reverse(fs[i + 1 : least(i + $wnW, len(fs))]),
                       list_min(fs[i + 1 : least(i + $wnW, len(fs))])) AS INT),
           'fp': list_min(fs[i + 1 : least(i + $wnW, len(fs))])}
          for i in range(0, greatest(len(fs) - $wnW, 0) + 1)],
        recursive := true)
      FROM fl WHERE len(fs) > 0),
    sel AS (SELECT DISTINCT doc_id, pos, fp FROM win)"""
  private val q194Sql = s"""
    WITH ${winnowSelCtes("documents")}
    SELECT doc_id, pos, fp FROM sel
    ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST"""

  // q195 — MOSS candidate pairs over the winnowed index, from PURE JSON:
  // docs sharing >= 2 selected fingerprints with the shared count. The
  // corpus gets PLANTED shared passages (docs with id % 10 = 1 append
  // the same 24-token block — 24 >= wnW+wnK-1 = 11, so the winnowing
  // GUARANTEE forces every such pair to collide); the oracle re-derives
  // the pairs from the same selection arithmetic over the modified text.
  // FIXTURE-BOUND to doc_id < 400 (the q28/q32 convention): natural
  // 8-token collisions on the synthetic corpus grow the pair list
  // quadratically in SF, and this is the verification tier — production
  // pair generation runs over the winnowed INDEX with real k (50),
  // where collisions are matches, not noise.
  private def q195(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "filters": ["doc_id < 400", "doc_id % 5 < 2"],
       "derive": {"mtext": "if(doc_id % 10 = 1, concat(text, ' ', ${
        (1 to 24).map(i => "'pp" + i + "'").mkString("concat_ws(' ', ", ", ", ")")}), text)"},
       "winnow": {"id_col": "doc_id", "text_col": "mtext",
                  "window_tokens": $wnK, "winnow_window": $wnW,
                  "output": "pairs", "min_shared": 2},
       "order_by": ["idA asc", "idB asc"]}""")
  }
  private val q195Sql = s"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 1
                  THEN text || ' ' || ${(1 to 24).map(i => s"'pp$i'").mkString(" || ' ' || ")}
                  ELSE text END AS text
      FROM documents WHERE doc_id < 400 AND doc_id % 5 < 2),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM base),
    th AS (
      SELECT doc_id, list_transform(t, tok ->
        list_reduce(list_prepend(CAST(7 AS BIGINT),
          list_transform(range(1, len(tok) + 1), i -> CAST(ascii(tok[i]) AS BIGINT))),
          (a, c) -> (a * 131 + c) % 1000000007)) AS h
      FROM toks),
    fl AS (
      SELECT doc_id,
             [list_reduce(list_prepend(CAST(0 AS BIGINT), h[p + 1 : p + $wnK]),
                (a, x) -> (a * 31 + x) % 1000000007)
              for p in range(0, greatest(len(h) - ${wnK - 1}, 0))] AS fs
      FROM th),
    win AS (
      SELECT doc_id, unnest([
          {'fp': list_min(fs[i + 1 : least(i + $wnW, len(fs))])}
          for i in range(0, greatest(len(fs) - $wnW, 0) + 1)],
        recursive := true)
      FROM fl WHERE len(fs) > 0),
    idx AS (SELECT DISTINCT doc_id, fp FROM win)
    SELECT a.doc_id AS idA, b.doc_id AS idB,
           COUNT(*) AS shared_fps
    FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""
}
