package graft.queries

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search pack (north-star): brute-force cosine top-k baseline,
  * embedding near-dup pairs, LSH-bucketed ANN scale path.
  */
object SimQueries extends QueryPack {
  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** DuckDB cosine between two list columns, element order preserved —
    * mirrors Similarity.dot's sequential fold. */
  private def duckCosine(a: String, b: String): String = {
    def norm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    val dot =
      s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    s"ROUND($dot / (${norm(a)} * ${norm(b)}), 9)"
  }

  // q31 — brute-force cosine top-5: query set = vec_id < 10 (broadcast),
  // scored against the full corpus map-side; only (query, score) rows
  // shuffle for the per-query top-k window.
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.cosineTopK(
        e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("embedding")),
        e.select(col("vec_id").as("match_id"), col("embedding")),
        queryId = "query_id", queryVec = "embedding",
        corpusId = "match_id", corpusVec = "embedding",
        k = 5)
      .select("query_id", "match_id", "score", "rank")
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }
  private val q31Sql = s"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT query_id, c.vec_id AS match_id,
             ${duckCosine("qe", "c.embedding")} AS score
      FROM q, embeddings c WHERE c.vec_id <> query_id),
    ranked AS (
      SELECT query_id, match_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, match_id ASC) AS INT) AS rank
      FROM scored)
    SELECT query_id, match_id, score, rank FROM ranked WHERE rank <= 5
    ORDER BY query_id ASC NULLS FIRST, rank ASC NULLS FIRST"""

  // q32 — embedding near-duplicate pairs at cosine ≥ 0.4 (corpus max is
  // ~0.51, so this returns the genuinely-closest pairs).
  private def q32(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(
        emb(s, dir), idCol = "vec_id", vecCol = "embedding", threshold = 0.4)
      .orderBy(col("idA").asc_nulls_first, col("idB").asc_nulls_first)
  private val q32Sql = s"""
    SELECT a.vec_id AS idA, b.vec_id AS idB,
           ${duckCosine("a.embedding", "b.embedding")} AS score
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND ${duckCosine("a.embedding", "b.embedding")} >= 0.4
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""

  // q33 — LSH-bucketed ANN top-3 (random-hyperplane signatures, banded):
  // the 100-TB path — shuffle ∝ bucket collisions, not |Q|·|C|.
  // Approximate by design → rows-only gate; recall vs q31 asserted in
  // ScalaTest.
  private def q33(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.annTopK(
        e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("embedding")),
        e.select(col("vec_id").as("match_id"), col("embedding")),
        queryId = "query_id", queryVec = "embedding",
        corpusId = "match_id", corpusVec = "embedding",
        dim = 64, k = 3, numBits = 32, bands = 8)
      .select("query_id", "match_id", "score", "rank")
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  // q46 — the SCALE path for corpus×corpus near-dup: pigeonhole-banded
  // hyperplane LSH (w=2 × 16 bands, sized for the fixture's low 0.4
  // threshold → theoretical recall 0.9997). On this deterministic corpus
  // the banded pair set equals the exact one at every SF, so it carries
  // the SAME exact DuckDB oracle as q32 — the hash-compare proves the
  // approximate plan loses nothing here; the ScalaTest recall bound
  // covers the general contract.
  private def q46(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBanded(
        emb(s, dir), idCol = "vec_id", vecCol = "embedding",
        threshold = 0.4, dim = 64, numBits = 32, bands = 16)
      .orderBy(col("idA").asc_nulls_first, col("idB").asc_nulls_first)

  // q52 — IVF-bucketed ANN top-3: the inverted-file shape next to q33's
  // hyperplane LSH. Deterministic sampled centroids, nprobe=8 of nlist=16
  // (the fixture corpus is near-random — the hard regime for IVF — so
  // probe half the lists; structured production embeddings prune far
  // harder). Approximate → rows-only gate; recall asserted in ScalaTest.
  private def q52(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.ivfTopK(
        e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("embedding")),
        e.select(col("vec_id").as("match_id"), col("embedding")),
        queryId = "query_id", queryVec = "embedding",
        corpusId = "match_id", corpusVec = "embedding",
        k = 3, nlist = 16, nprobe = 8)
      .select("query_id", "match_id", "score", "rank")
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  override def queries: Seq[Q] = Seq(
    Q("q31_cosine_topk", q31, Some(q31Sql)),
    Q("q32_embedding_neardup", q32, Some(q32Sql)),
    Q("q33_ann_topk", q33, None),
    Q("q46_embedding_neardup_banded", q46, Some(q32Sql)),
    Q("q52_ivf_topk", q52, None)
  )
}
