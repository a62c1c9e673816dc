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
           ROUND((LEAST(CAST(len(t) AS DOUBLE) / 32.0, 1.0) * 0.3)
               + ((1.0 - CASE WHEN len > 0
                              THEN CAST(len - LENGTH(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / len
                              ELSE 0.0 END) * 0.3)
               + (CASE WHEN len(t) > 0
                       THEN CAST(len(list_filter(t, x -> regexp_full_match(x, '[A-Za-z]+'))) AS DOUBLE) / len(t)
                       ELSE 0.0 END * 0.4), 9) AS quality
    FROM toks ORDER BY doc_id ASC NULLS FIRST"""
  }

  // q25 — language-ID confusion matrix: heuristic marker-score argmax vs
  // the generator's `lang` label.
  private def q25(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang").asc_nulls_first, col("lang_pred").asc_nulls_first)
  private val q25Sql = {
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      val terms = ms.map(m => s"CAST(list_contains(t, '$m') AS INT)").mkString(" + ")
      lang -> s"($terms)"
    }
    val best = s"GREATEST(${scores.map(_._2).mkString(", ")})"
    val cases = scores
      .map { case (lang, sc) => s"WHEN $sc = $best AND $sc > 0 THEN '$lang'" }
      .mkString(" ")
    s"""
    WITH toks AS (
      SELECT lang,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    pred AS (
      SELECT lang, CASE $cases ELSE 'und' END AS lang_pred FROM toks)
    SELECT lang, lang_pred, COUNT(*) AS n FROM pred
    GROUP BY 1, 2 ORDER BY lang ASC NULLS FIRST, lang_pred ASC NULLS FIRST"""
  }

  // q26 — order-sensitive rolling-hash fingerprint, the PORTABLE variant:
  // per-token Horner over code points, then Horner over token hashes —
  // pure modular arithmetic DuckDB reproduces bit-for-bit, so this gets a
  // full hash-match oracle. The xxhash64 fast path (TextAnalysis
  // .fingerprint, the one to use at 100 TB) stays covered by the OpsSpec
  // order-sensitivity invariant — xxhash64 itself has no DuckDB spelling.
  private def q26(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.fingerprintPortable(col("text")).as("fp"))
      .orderBy(col("doc_id").asc_nulls_first)
  private val q26Sql = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS t
      FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(t, tok ->
                 list_reduce(
                   list_prepend(CAST(7 AS BIGINT),
                     list_transform(range(1, len(tok) + 1),
                       i -> CAST(ascii(tok[i]) AS BIGINT))),
                   (a, c) -> (a * 131 + c) % 1000000007))),
             (a, h) -> (a * 31 + h) % 1000000007) AS fp
    FROM toks ORDER BY doc_id ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q24_text_stats", q24, Some(q24Sql)),
    Q("q25_lang_id", q25, Some(q25Sql)),
    Q("q26_fingerprint", q26, Some(q26Sql))
  )
}
