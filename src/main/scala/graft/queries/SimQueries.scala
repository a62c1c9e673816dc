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
  private[queries] def duckCosine(a: String, b: String): String = {
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
  /** Exact brute-force top-k oracle over the vec_id<10 query set — shared
    * by q31 (k=5) and the full-coverage ANN twins q92/q93 (k=3), whose
    * parameterizations provably reduce to exact top-k. */
  private def bruteTopKSql(k: Int) = s"""
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
    SELECT query_id, match_id, score, rank FROM ranked WHERE rank <= $k
    ORDER BY query_id ASC NULLS FIRST, rank ASC NULLS FIRST"""
  private val q31Sql = bruteTopKSql(5)

  // q32 — embedding near-duplicate pairs at cosine ≥ 0.4 (corpus max is
  // ~0.51, so this returns the genuinely-closest pairs). This is the
  // EXACT-BASELINE oracle twin of the banded production paths (q46/q64/
  // q66): its crossJoin is the documented all-pairs shape, so its input
  // is FIXTURE-BOUNDED to the q46 third (vec_id % 3 = 0) — the oracle
  // cost must stay constant as SF grows (round-9 verdict), and the two
  // paths hash-compare against the SAME DuckDB text, proving the banded
  // plan loses nothing vs the exact one on the identical slice.
  private def q32(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(
        emb(s, dir).filter(pmod(col("vec_id"), lit(3)) === 0),
        idCol = "vec_id", vecCol = "embedding", threshold = 0.4)
      .orderBy(col("idA").asc_nulls_first, col("idB").asc_nulls_first)
  private val q32Sql = s"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0)
    SELECT a.vec_id AS idA, b.vec_id AS idB,
           ${duckCosine("a.embedding", "b.embedding")} AS score
    FROM sub a, sub b
    WHERE a.vec_id < b.vec_id
      AND ${duckCosine("a.embedding", "b.embedding")} >= 0.4
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""

  // (q33, the rows-only partial-coverage LSH ANN entry, is retired: its
  // hash-green full-coverage twin q92 gates the same annTopK operator and
  // plan shape, and the partial regime's recall contract is asserted in
  // SimilaritySpec — a rows-only declared entry added no signal.)

  // q46 — the SCALE path for corpus×corpus near-dup: pigeonhole-banded
  // hyperplane LSH (w=2 × 16 bands, sized for the fixture's low 0.4
  // threshold → theoretical recall 0.9997). On this deterministic corpus
  // the banded pair set equals the exact one at every SF, so it carries
  // an exact q32-style DuckDB oracle — the hash-compare proves the
  // approximate plan loses nothing here; the ScalaTest recall bound
  // covers the general contract. The fixture is a THIRD of the corpus
  // (vec_id % 3 = 0): at τ=0.4 the S-curve gives near-zero pruning by
  // design (q64/q66 carry the production regime), so benching it on the
  // full corpus measured the worst-case knob, not the operator — the
  // low-τ plan shape is still fully exercised at n/3 (~1/9 the pairs).
  private def q46(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBanded(
        emb(s, dir).filter(pmod(col("vec_id"), lit(3)) === 0),
        idCol = "vec_id", vecCol = "embedding",
        threshold = 0.4, dim = 64, numBits = 32, bands = 16)
      .orderBy(col("idA").asc_nulls_first, col("idB").asc_nulls_first)
  private val q46Sql = s"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0)
    SELECT a.vec_id AS idA, b.vec_id AS idB,
           ${duckCosine("a.embedding", "b.embedding")} AS score
    FROM sub a, sub b
    WHERE a.vec_id < b.vec_id
      AND ${duckCosine("a.embedding", "b.embedding")} >= 0.4
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""

  // q138 — the embedding CLUSTER tier from PURE JSON ("output":
  // "clusters" on the `near_dup` node key — the shape consistency that
  // lets one config switch any dedup tier from pair lists to labels):
  // q46's regime (banded == exact at every SF on this corpus), then
  // connected components over the verified pairs. Oracle = the exact
  // cosine pair set + q45's recursive-CTE closure → min-id labels.
  private def q138(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "embeddings"},
       "filters": ["vec_id % 3 = 0"],
       "near_dup": {"id_col": "vec_id", "vec_col": "embedding",
                    "threshold": 0.4, "dim": 64, "num_bits": 32,
                    "bands": 16, "output": "clusters"},
       "order_by": ["id asc"]}""")
  }
  private val q138Sql = s"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0),
    pairs AS (
      SELECT a.vec_id AS idA, b.vec_id AS idB
      FROM sub a, sub b
      WHERE a.vec_id < b.vec_id
        AND ${duckCosine("a.embedding", "b.embedding")} >= 0.4),
    edges AS (SELECT idA AS src, idB AS dst FROM pairs
              UNION ALL SELECT idB, idA FROM pairs),
    reach AS (
      WITH RECURSIVE r(a, b) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        WHERE e.dst <> r.a)
      SELECT * FROM r)
    SELECT a AS id, LEAST(a, MIN(b)) AS cluster
    FROM reach GROUP BY a ORDER BY id ASC NULLS FIRST"""

  // --- q64: the PRODUCTION near-dup regime ------------------------------
  // The fixture corpus is near-random (max cosine ≈ 0.51), so a τ ≥ 0.8
  // query needs a planted high-similarity slice: every 10th vector gets a
  // copy (vec_id + 10⁷) perturbed by adding 0.1 × the circularly-next
  // element — cosine(original, copy) = (1+0.1r)/√(1+0.2r+0.01) ≈ 0.995
  // (r = normalized cross-correlation, ≈ 0 for random vectors), far above
  // τ, while all background pairs stay below 0.6. The perturbation is
  // exact float arithmetic mirrored verbatim in the oracle SQL (double
  // add/multiply, cast to float — IEEE-identical in both engines).
  private[graft] def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select("vec_id", "embedding")
    val planted = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(
        (col("vec_id") + lit(10000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") + lit(0.1) *
            element_at(col("embedding"), pmod(i + 1, lit(64)) + 1).cast("double"))
            .cast("float")).as("embedding"))
    e.unionByName(planted)
  }
  private val plantedSql = """
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 10000000 AS vec_id,
           list_transform(embedding, (x, i) -> CAST(CAST(x AS DOUBLE)
             + CAST(0.1 AS DOUBLE) * CAST(embedding[((i % 64) + 1)] AS DOUBLE)
             AS FLOAT)) AS embedding
    FROM embeddings WHERE vec_id % 10 = 0"""

  // q64 — corpus×corpus near-dup in the production regime: τ = 0.8,
  // numBits = 64, bands = 8 → band width 8 → 256-way buckets per band.
  // Unlike q46 (w=2, sized for the fixture's low τ = 0.4, where pruning is
  // impossible by the S-curve), this is the shape AND the parameters a
  // 100 TB user runs: per-pair collision for background pairs ≈
  // 8/256 ≈ 3% of n²/2 (the plan-invariant test asserts < 10%), while
  // planted pairs at cosine ≈ 0.995 collide with prob 1−(1−p⁸)⁸ ≈
  // 1−7e-6 (p = 1−acos(0.995)/π ≈ 0.968). On this deterministic corpus
  // the banded result equals the exact brute-force result, so it carries
  // an exact q32-style oracle — hash-compare proves zero loss.
  private def q64(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBanded(
        plantedCorpus(s, dir), idCol = "vec_id", vecCol = "embedding",
        threshold = 0.8, dim = 64, numBits = 64, bands = 8)
      .orderBy(col("idA").asc_nulls_first, col("idB").asc_nulls_first)
  private val q64Sql = s"""
    WITH corpus AS ($plantedSql)
    SELECT a.vec_id AS idA, b.vec_id AS idB,
           ${duckCosine("a.embedding", "b.embedding")} AS score
    FROM corpus a, corpus b
    WHERE a.vec_id < b.vec_id
      AND ${duckCosine("a.embedding", "b.embedding")} >= 0.8
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""

  // (q52, the rows-only nprobe=8 IVF ANN entry, is retired: the hash-green
  // full-coverage twin q93 gates the same ivfTopK operator, and the
  // partial-probe recall contract is asserted in SimilaritySpec.)

  // q66 — q64 declared ENTIRELY from JSON: the planted corpus is a
  // `combine` union (base ∪ perturbed copies via a SQL lambda `derive` —
  // the same float arithmetic as plantedCorpus, bit-for-bit) and the
  // production-regime banded near-dup is the `near_dup` node key. Carries
  // q64's exact oracle — the config path must be value-identical to the
  // Scala API path. Production parameters (τ=0.8, 64 bits, 8 bands), so
  // this ALSO benches as the pruning regime, not the q46 stress shape.
  private def q66(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"id": "nd",
       "combine": {"op": "union", "nodes": [
         {"id": "base", "source": {"table": "embeddings"},
          "keep_columns": ["vec_id", "embedding"]},
         {"id": "planted", "source": {"table": "embeddings"},
          "filters": ["vec_id % 10 = 0"],
          "derive": {"vec_id2": "vec_id + 10000000",
                     "embedding2": "transform(embedding, (x, i) -> cast(cast(x as double) + cast(0.1 as double) * cast(element_at(embedding, cast(pmod(i + 1, 64) + 1 as int)) as double) as float))"},
          "keep_columns": ["vec_id2", "embedding2"],
          "rename": {"vec_id2": "vec_id", "embedding2": "embedding"}}]},
       "near_dup": {"id_col": "vec_id", "vec_col": "embedding",
                    "threshold": 0.8, "dim": 64},
       "order_by": ["idA asc", "idB asc"]}""")

  // q70 — the QUANTIZED production near-dup: int8 data vectors (4× less
  // scan+shuffle IO at 100 TB — q43 demonstrates the storage, this closes
  // the loop by SEARCHING on the quantized bytes directly). Cosine is
  // scale-invariant, so the per-vector scale never ships: signatures and
  // scores run on the raw int8 arrays (kernels accept tinyint), and every
  // score is exact integer-derived arithmetic — which is why this carries
  // a full DuckDB hash oracle (quantize + integer cosine mirrored
  // verbatim). Planted pairs keep cosine ≈ 0.99 after quantization;
  // τ = 0.8 unchanged.
  private def q70(s: SparkSession, dir: String): DataFrame = {
    val q = plantedCorpus(s, dir).select(col("vec_id"),
      Similarity.quantizeInt8(col("embedding")).getField("data").as("qdata"))
    Similarity.cosineNearDupPairsBanded(
        q, idCol = "vec_id", vecCol = "qdata",
        threshold = 0.8, dim = 64, numBits = 64, bands = 8)
      .orderBy(col("idA").asc_nulls_first, col("idB").asc_nulls_first)
  }
  private val q70Sql = s"""
    WITH corpus AS ($plantedSql),
    quant AS (
      SELECT vec_id,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
               / CAST(127.0 AS DOUBLE) AS scale,
             embedding
      FROM corpus),
    qdata AS (
      SELECT vec_id,
             CASE WHEN scale > 0
                  THEN list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE) / scale) AS TINYINT))
                  ELSE list_transform(embedding, x -> CAST(0 AS TINYINT)) END AS data
      FROM quant)
    SELECT a.vec_id AS idA, b.vec_id AS idB,
           ${duckCosine("a.data", "b.data")} AS score
    FROM qdata a, qdata b
    WHERE a.vec_id < b.vec_id
      AND ${duckCosine("a.data", "b.data")} >= 0.8
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""

  // q92 — q33's hyperplane-LSH ANN at FULL COVERAGE: bands span all bits
  // (numBits=32, bands=32 → band width 1), so any query/corpus pair
  // agreeing on at least ONE sign bit collides. A pair missing entirely
  // would have to disagree on all 32 hyperplane signs — on this
  // deterministic corpus none does (the probability shape is
  // (acos(s)/π)^32 ≈ 2⁻³² per near-orthogonal pair) — so the banded plan
  // provably returns exact top-3 and carries the full brute-force hash
  // oracle. The plan is IDENTICAL in shape to q33's production
  // parameterization; only the knobs change — which is what makes this a
  // hard correctness gate on the approximate operator's machinery
  // (banding, first-collision dedup, scoring, ranking), not on its recall.
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.annTopK(
        e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("embedding")),
        e.select(col("vec_id").as("match_id"), col("embedding")),
        queryId = "query_id", queryVec = "embedding",
        corpusId = "match_id", corpusVec = "embedding",
        dim = 64, k = 3, numBits = 32, bands = 32)
      .select("query_id", "match_id", "score", "rank")
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  // q93 — q52's IVF ANN at FULL COVERAGE: nprobe = nlist (16), so every
  // query probes every inverted list and scores the entire corpus — by
  // construction byte-identical to exact brute-force top-3 (same dot,
  // same rounding, same tie-break), so it carries the full hash oracle.
  // Exercises the complete IVF machinery (centroid sample, list
  // assignment, probe join, rank) under a parameterization whose result
  // is provably exact.
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.ivfTopK(
        e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("embedding")),
        e.select(col("vec_id").as("match_id"), col("embedding")),
        queryId = "query_id", queryVec = "embedding",
        corpusId = "match_id", corpusVec = "embedding",
        k = 3, nlist = 16, nprobe = 16)
      .select("query_id", "match_id", "score", "rank")
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  // q167 — SemDeDup semantic dedup, EXACT verification tier: nlist=1
  // (one cluster — cluster-scoping degenerates away) and per-cluster
  // all-pairs, so the drop rule is pure arithmetic the oracle mirrors
  // directly: a vector is dropped iff some smaller-id vector has cosine
  // ≥ 0.4. Input fixture-bounded to the q32 third (vec_id % 3 = 0) —
  // the exact tier's all-pairs join stays constant-cost in SF.
  private def q167(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(
        emb(s, dir).filter(col("vec_id") % 3 === 0)
          .select("vec_id", "embedding"),
        idCol = "vec_id", vecCol = "embedding",
        threshold = 0.4, dim = 64, nlist = 1, exact = true, output = "labels")
      .orderBy(col("vec_id").asc_nulls_first)
  private val q167Sql = s"""
    WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0),
    drops AS (
      SELECT DISTINCT b.vec_id AS ib
      FROM c a, c b
      WHERE a.vec_id < b.vec_id
        AND ${duckCosine("a.embedding", "b.embedding")} >= 0.4)
    SELECT c.vec_id, CAST(0 AS INT) AS cluster, (drops.ib IS NULL) AS keep
    FROM c LEFT JOIN drops ON c.vec_id = drops.ib
    ORDER BY c.vec_id ASC NULLS FIRST"""

  // q168 — semantic dedup from PURE JSON, the SCALE tier (nlist=4 k-means
  // with one mini-batch refine round + cluster-scoped banded LSH), made
  // exactly oracle-checkable by a pattern-vector fixture: embedding =
  // e_a + e_b with (a, b) = (pat % 32, 32 + pat div 32), pat = id % 1024.
  // Cosine between DISTINCT patterns is ≤ 0.5 (< τ = 0.9); identical
  // patterns are identical VECTORS — same centroid (deterministic
  // assignment), same signature (collide in every band) — so the kept
  // set is provably id = min(id) per pattern group, independent of where
  // k-means draws cluster boundaries. Planted copies (+1e6, id % 10 = 0)
  // give every SF a guaranteed duplicate class on top of the natural
  // id ≡ id' (mod 1024) collisions.
  private def q168(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    // the union+derive input is a cache: true def — semantic_dedup's
    // centroid collect and candidate joins re-read their input (the
    // documented operator contract; q173 does the same)
    graft.compile.Compiler.compileJson(s, """
      {"id": "semdedup",
       "defs": [
         {"id": "pats", "cache": true,
          "combine": {"op": "union", "nodes": [
            {"id": "b", "source": {"table": "embeddings"},
             "derive": {"pat": "vec_id % 1024"},
             "keep_columns": ["vec_id", "pat"]},
            {"id": "p", "source": {"table": "embeddings"},
             "filters": ["vec_id % 10 = 0"],
             "derive": {"vid2": "vec_id + 1000000", "pat": "vec_id % 1024"},
             "keep_columns": ["vid2", "pat"],
             "rename": {"vid2": "vec_id"}}]},
          "derive": {"emb": "transform(sequence(0, 63), d -> CAST(CASE WHEN d = CAST(pat % 32 AS INT) OR d = 32 + CAST(pat DIV 32 AS INT) THEN 1.0 ELSE 0.0 END AS DOUBLE))"},
          "keep_columns": ["vec_id", "emb"]}],
       "source": {"ref": "pats"},
       "semantic_dedup": {"id_col": "vec_id", "vec_col": "emb",
                          "threshold": 0.9, "dim": 64, "nlist": 4,
                          "refine_rounds": 1},
       "drop": ["emb"],
       "order_by": ["vec_id asc"]}""")
  }
  private val q168Sql = """
    WITH a AS (
      SELECT vec_id, vec_id % 1024 AS pat FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, vec_id % 1024 AS pat
      FROM embeddings WHERE vec_id % 10 = 0)
    SELECT vec_id FROM (
      SELECT vec_id, MIN(vec_id) OVER (PARTITION BY pat) AS m FROM a)
    WHERE vec_id = m
    ORDER BY vec_id ASC NULLS FIRST"""

  // q176 — PRODUCT-QUANTIZED top-k, exactly oracle-checked: pattern
  // vectors e_a + e_b (a = pat % 32, b = 32 + pat div 32, pat = id %
  // 1024) are codebook points of the identity one-hot codebooks, so
  // encoding is PROVABLY lossless and PQ-ADC scoring ≡ exact cosine —
  // the oracle is plain brute-force top-5 over the same constructed
  // vectors. Corpus scored entirely from CODES (2 bytes of signal per
  // vector); queries stay exact (the asymmetric recipe).
  private def q176(s: SparkSession, dir: String): DataFrame = {
    val oneHot: Seq[Seq[Seq[Double]]] = (0 until 2).map(_ =>
      (0 until 32).map(c => (0 until 32).map(d => if (d == c) 1.0 else 0.0).toSeq).toSeq)
    val patVec = expr(
      "transform(sequence(0, 63), d -> CAST(CASE WHEN d = CAST(vec_id % 1024 % 32 AS INT) " +
        "OR d = 32 + CAST((vec_id % 1024) DIV 32 AS INT) THEN 1.0 ELSE 0.0 END AS DOUBLE))")
    val base = emb(s, dir).select(col("vec_id"), patVec.as("pv"))
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("pv"))
    val codes = base.select(col("vec_id").as("match_id"),
      Similarity.pqEncode(col("pv"), oneHot).as("codes"))
    Similarity.pqTopK(q, codes, "query_id", "pv", "match_id", "codes",
        oneHot, k = 5)
      .select("query_id", "match_id", "score", "rank")
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }
  private val q176Sql = s"""
    WITH v AS (
      SELECT vec_id,
             list_transform(range(64), d ->
               CASE WHEN d = vec_id % 1024 % 32
                      OR d = 32 + (vec_id % 1024) // 32
                    THEN 1.0 ELSE 0.0 END) AS pv
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, pv AS qe FROM v WHERE vec_id < 10),
    scored AS (
      SELECT query_id, c.vec_id AS match_id,
             ${duckCosine("qe", "c.pv")} AS score
      FROM q, v c WHERE c.vec_id <> query_id),
    ranked AS (
      SELECT query_id, match_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, match_id ASC) AS INT) AS rank
      FROM scored)
    SELECT query_id, match_id, score, rank FROM ranked WHERE rank <= 5
    ORDER BY query_id ASC NULLS FIRST, rank ASC NULLS FIRST"""

  // q177 — the COMPOSED IVF-PQ path (q93's full-coverage convention):
  // same lossless pattern fixture as q176, corpus reduced to its
  // at-rest (list, codes) index via ivfPqIndex, every list probed — so
  // pruning is a no-op and the result must hash-match the same
  // brute-force oracle. A regression anywhere in the composition
  // (assignment, code round-trip, probe join, scoring) breaks the hash.
  private def q177(s: SparkSession, dir: String): DataFrame = {
    val oneHot: Seq[Seq[Seq[Double]]] = (0 until 2).map(_ =>
      (0 until 32).map(c => (0 until 32).map(d => if (d == c) 1.0 else 0.0).toSeq).toSeq)
    val patVec = expr(
      "transform(sequence(0, 63), d -> CAST(CASE WHEN d = CAST(vec_id % 1024 % 32 AS INT) " +
        "OR d = 32 + CAST((vec_id % 1024) DIV 32 AS INT) THEN 1.0 ELSE 0.0 END AS DOUBLE))")
    val base = emb(s, dir).select(col("vec_id"), patVec.as("pv"))
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("pv"))
    val (cents, indexed) = Similarity.ivfPqIndex(base, "vec_id", "pv", oneHot, nlist = 8)
    Similarity.ivfPqTopK(q,
        indexed.select(col("vec_id").as("match_id"), col("list"), col("codes")),
        "query_id", "pv", "match_id", "codes", "list", cents, oneHot,
        k = 5, nprobe = 8)
      .select("query_id", "match_id", "score", "rank")
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  // q183 — INCREMENTAL semantic dedup, exactly oracle-checked via the
  // pattern-vector construction (q168's trick): the corpus index holds
  // the id % 3 = 0 slice's distinct patterns; the batch is everyone
  // else. A batch row survives iff its pattern is NOT indexed (history
  // wins, the q88/q97 convention) AND it is the batch's min id for its
  // pattern — both pure arithmetic at any SF.
  private def q183(s: SparkSession, dir: String): DataFrame = {
    val patVec = expr(
      "transform(sequence(0, 31), d -> CAST(CASE WHEN d = CAST(vec_id % 256 % 16 AS INT) " +
        "OR d = 16 + CAST((vec_id % 256) DIV 16 AS INT) THEN 1.0 ELSE 0.0 END AS DOUBLE))")
    val all = emb(s, dir).select(col("vec_id"), patVec.as("pv"))
    val idxDir = java.nio.file.Files.createTempDirectory("graft-q183").toString
    Similarity.saveSemanticIndex(s, all.filter(col("vec_id") % 3 === 0),
      "vec_id", "pv", dim = 32, path = s"$idxDir/idx", nlist = 4)
    Similarity.semanticDedupAgainstCorpus(
        all.filter(col("vec_id") % 3 =!= 0), "vec_id", "pv",
        threshold = 0.9, dim = 32, s"$idxDir/idx")
      .select("vec_id")
      .orderBy(col("vec_id").asc_nulls_first)
  }
  private val q183Sql = """
    WITH b AS (
      SELECT vec_id, vec_id % 256 AS pat FROM embeddings WHERE vec_id % 3 <> 0),
    survivors AS (
      SELECT vec_id FROM (
        SELECT vec_id, pat, MIN(vec_id) OVER (PARTITION BY pat) AS m FROM b)
      WHERE vec_id = m
        AND NOT EXISTS (SELECT 1 FROM embeddings e2
                        WHERE e2.vec_id % 3 = 0
                          AND e2.vec_id % 256 = pat))
    SELECT vec_id FROM survivors ORDER BY vec_id ASC NULLS FIRST"""

  // q218 — ANN search against a SAVED index (the artifact pattern applied
  // to vector retrieval), gated exactly: the index builds once in Scala
  // (Similarity.saveAnnIndex — centroids + list-partitioned assignment),
  // then PURE JSON searches it at FULL COVERAGE (nprobe = nlist = 16), so
  // every query probes every inverted list and the result is provably
  // byte-identical to exact brute-force top-3 (same dot, same rounding,
  // same tie-break) — the q92/q93 discipline extended through the at-rest
  // parquet round-trip and the compile-time centroid load.
  private def q218(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q218_index"
    Similarity.saveAnnIndex(
      s, emb(s, dir).select(col("vec_id").as("match_id"), col("embedding")),
      "match_id", "embedding", idxDir, nlist = 16)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10"},
       "ann_search": {"id_col": "query_id", "vec_col": "embedding",
                      "index_dir": "$idxDir", "k": 3, "nprobe": 16},
       "order_by": ["query_id asc", "rank asc"]}""")
  }

  // q219 — ANN index BUILD from pure JSON: the node writes the at-rest
  // index and becomes the (list, n_vectors) balance histogram. The gate
  // pins the invariants the histogram must satisfy regardless of where
  // the deterministic centroid sample lands: every corpus vector is
  // assigned to exactly one of the nlist lists (total conservation) and
  // list ids stay in [0, nlist).
  private def q219(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q219_index"
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "embeddings"},
       "keep_columns": ["vec_id", "embedding"],
       "ann_index": {"id_col": "vec_id", "vec_col": "embedding",
                     "dir": "$idxDir", "nlist": 8, "refine_rounds": 1}}""")
      .agg(
        (countDistinct(col("list")) <= 8 &&
          min(col("list")) >= 0 && max(col("list")) <= 7).as("lists_ok"),
        sum(col("n_vectors")).cast("long").as("total_vectors"))
  }
  private val q219Sql = """
    SELECT TRUE AS lists_ok,
           CAST(COUNT(*) AS BIGINT) AS total_vectors
    FROM embeddings"""

  // q220 — INCREMENTAL index maintenance, gated exactly: the index builds
  // over the EVEN half of the corpus (Scala), the odd half lands later
  // through a PURE-JSON `ann_index mode:"append"` (assign to the saved
  // centroids — no refit, history never re-read), and a full-coverage
  // search over the appended index must equal brute-force top-3 over the
  // WHOLE corpus — exactness at nprobe = nlist holds regardless of which
  // half fit the centroids, so the gate pins the append path end to end.
  private def q220(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q220_index"
    // a plain parquet append is not idempotent — reset the fixture dir so
    // repeated runs (bench batteries, verify reruns) stay deterministic
    rmrf(new java.io.File(idxDir))
    Similarity.saveAnnIndex(
      s, emb(s, dir).filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("match_id"), col("embedding")),
      "match_id", "embedding", idxDir, nlist = 16)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT vec_id AS match_id, embedding FROM embeddings WHERE vec_id % 2 = 1"},
       "ann_index": {"id_col": "match_id", "vec_col": "embedding",
                     "dir": "$idxDir", "mode": "append"}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10"},
       "ann_search": {"id_col": "query_id", "vec_col": "embedding",
                      "index_dir": "$idxDir", "k": 3, "nprobe": 16},
       "order_by": ["query_id asc", "rank asc"]}""")
  }

  // q253 — PQ-COMPRESSED at-rest ANN index (the FAISS IVF-PQ shape): the
  // index builds from PURE JSON with pq {m:8, k:16} — rows store 8 codes
  // instead of 64 floats (plus dir/codebooks), a ~16x shrink — and a
  // full-coverage JSON search must reproduce EXACTLY what the oracle
  // computes by READING THE ARTIFACT ITSELF: DuckDB reconstructs every
  // corpus vector from its codes + the codebooks parquet and restates
  // cosine top-3. This gates the whole at-rest round trip (train →
  // encode → persist → reconstruct → score), independent of the engine:
  // if codes, codebooks, norms or reconstruction drift, the hash breaks.
  private val q253IdxDir =
    s"${System.getProperty("java.io.tmpdir")}/graft_q253_index"
  private def q253(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "embeddings"},
       "keep_columns": ["vec_id", "embedding"],
       "ann_index": {"id_col": "vec_id", "vec_col": "embedding",
                     "dir": "$q253IdxDir", "nlist": 4,
                     "pq": {"m": 8, "k": 16}}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10"},
       "ann_search": {"id_col": "query_id", "vec_col": "embedding",
                      "index_dir": "$q253IdxDir", "k": 3, "nprobe": 4},
       "order_by": ["query_id asc", "rank asc"]}""")
  }
  private val q253Sql = s"""
    WITH cb AS (
      SELECT j, c, centroid
      FROM read_parquet('$q253IdxDir/codebooks/*.parquet')),
    cd AS (
      SELECT id, UNNEST(codes) AS code, UNNEST(range(len(codes))) AS j
      FROM read_parquet('$q253IdxDir/index/*/*.parquet')),
    rec AS (
      SELECT cd.id, flatten(list(cb.centroid ORDER BY cd.j)) AS vec
      FROM cd JOIN cb ON cb.j = cd.j AND cb.c = cd.code
      GROUP BY cd.id),
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, r.id AS match_id,
             ${duckCosine("q.qe", "r.vec")} AS score
      FROM q, rec r WHERE r.id <> q.query_id),
    ranked AS (
      SELECT query_id, match_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, match_id ASC) AS INT) AS rank
      FROM scored)
    SELECT query_id, match_id, score, rank FROM ranked WHERE rank <= 3
    ORDER BY query_id ASC NULLS FIRST, rank ASC NULLS FIRST"""

  // q250 — ANN index HEALTH from pure JSON (`ann_index mode:"stats"`):
  // the rebuild-vs-append gauge. The index builds once in Scala
  // (nlist = 8 over the whole corpus); the config's stats view must
  // report exact conservation (n_vectors = corpus count, n_lists = 8,
  // empty + non-empty = 8) and internally-consistent skew
  // (mean·n_lists = n_vectors; max within [ceil(mean), n_vectors];
  // skew = max/mean) — invariants that hold regardless of where the
  // deterministic centroid sample lands, so the oracle states them as
  // constants over the corpus count.
  private def q250(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q250_index"
    Similarity.saveAnnIndex(
      s, emb(s, dir).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", idxDir, nlist = 8)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "embeddings"},
       "ann_index": {"dir": "$idxDir", "mode": "stats"}}""")
      .select(
        col("n_lists"),
        col("n_vectors"),
        (col("n_empty_lists") >= 0 && col("n_empty_lists") < 8).as("empties_ok"),
        (abs(col("mean_list_n") * col("n_lists") - col("n_vectors")) < lit(1e-6))
          .as("mean_ok"),
        (col("max_list_n") >= ceil(col("mean_list_n")) &&
          col("max_list_n") <= col("n_vectors")).as("max_ok"),
        (abs(col("skew") - col("max_list_n") / col("mean_list_n")) < lit(1e-6))
          .as("skew_ok"))
  }
  private val q250Sql = """
    SELECT 8 AS n_lists, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS empties_ok, TRUE AS mean_ok, TRUE AS max_ok,
           TRUE AS skew_ok
    FROM embeddings"""

  // q256 — the FULL ANN index LIFECYCLE under one driver gate: build
  // (Scala, evens) → PURE-JSON append (odds) → PURE-JSON compact
  // (defragment the appended lists) → PURE-JSON full-coverage search,
  // which must STILL equal brute-force top-3 over the whole corpus —
  // proving the maintenance chain (append then compact) is completely
  // invisible to search results. q220 gates append; this adds the
  // compaction leg a long-running ingest actually performs.
  private def q256(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q256_index"
    rmrf(new java.io.File(idxDir))
    Similarity.saveAnnIndex(
      s, emb(s, dir).filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("match_id"), col("embedding")),
      "match_id", "embedding", idxDir, nlist = 16)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT vec_id AS match_id, embedding FROM embeddings WHERE vec_id % 2 = 1"},
       "ann_index": {"id_col": "match_id", "vec_col": "embedding",
                     "dir": "$idxDir", "mode": "append"}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "embeddings"},
       "ann_index": {"dir": "$idxDir", "mode": "compact"}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10"},
       "ann_search": {"id_col": "query_id", "vec_col": "embedding",
                      "index_dir": "$idxDir", "k": 3, "nprobe": 16},
       "order_by": ["query_id asc", "rank asc"]}""")
  }

  // q276 — CONTINUOUS vector ingest (`ann_ingest`) under the driver
  // hash: q256's lifecycle with the append leg replaced by the STREAM —
  // seed the index over the even half (saved centroids = the fixed
  // geometry), stream the odd half through the ann_ingest root sink
  // (each micro-batch assigns against the SAVED centroids and lands as
  // an overwritten batch=<id> delta partition — the idempotent-replay
  // layout), fold the delta in with mode:"compact", then a full-coverage
  // search must STILL equal brute-force top-3 over the whole corpus.
  private val q276Base =
    s"${System.getProperty("java.io.tmpdir")}/graft_q276_index"
  private def q276(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    rmrf(new java.io.File(q276Base))
    Similarity.saveAnnIndex(
      s, emb(s, dir).filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("match_id"), col("embedding")),
      "match_id", "embedding", s"$q276Base/idx", nlist = 16)
    emb(s, dir).filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("match_id"), col("embedding"))
      .coalesce(2).write.mode("overwrite").parquet(s"$q276Base/in")
    val q = graft.compile.Compiler.compileStreamJson(s, s"""
      {"source": {"path": "$q276Base/in"},
       "ann_ingest": {"id_col": "match_id", "vec_col": "embedding",
                      "index_dir": "$q276Base/idx",
                      "checkpoint_dir": "$q276Base/ckpt"}}""")
    try q.processAllAvailable() finally q.stop()
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "embeddings"},
       "ann_index": {"dir": "$q276Base/idx", "mode": "compact"}}""")
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"sql": "SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10"},
       "ann_search": {"id_col": "query_id", "vec_col": "embedding",
                      "index_dir": "$q276Base/idx", "k": 3, "nprobe": 16},
       "order_by": ["query_id asc", "rank asc"]}""")
  }

  // q259 — FILTERED ANN search (the vector-store "metadata filter"): the
  // allow-list def restricts candidates BEFORE scoring and top-k, so
  // every query gets its k best matches FROM THE ALLOWED SUBSET — a
  // post-filtered unfiltered top-k would under-return wherever a query's
  // neighborhood is disallowed. Full coverage (nprobe = nlist) makes the
  // gate exact: the oracle is brute force over exactly the allowed
  // third of the corpus.
  private def q259(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q259_index"
    Similarity.saveAnnIndex(
      s, emb(s, dir).select(col("vec_id").as("match_id"), col("embedding")),
      "match_id", "embedding", idxDir, nlist = 16)
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
         {"id": "allow",
          "source": {"sql": "SELECT vec_id AS id FROM embeddings WHERE vec_id % 3 = 0"}}],
       "source": {"sql": "SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10"},
       "ann_search": {"id_col": "query_id", "vec_col": "embedding",
                      "index_dir": "$idxDir", "k": 3, "nprobe": 16,
                      "allow_ref": "allow"},
       "order_by": ["query_id asc", "rank asc"]}""")
  }
  private val q259Sql = s"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    allowed AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0),
    scored AS (
      SELECT query_id, c.vec_id AS match_id,
             ${duckCosine("qe", "c.embedding")} AS score
      FROM q, allowed c WHERE c.vec_id <> query_id),
    ranked AS (
      SELECT query_id, match_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, match_id ASC) AS INT) AS rank
      FROM scored)
    SELECT query_id, match_id, score, rank FROM ranked WHERE rank <= 3
    ORDER BY query_id ASC NULLS FIRST, rank ASC NULLS FIRST"""

  // q222 — SCAN-STAGE semantic probe (the decontamination gate): index
  // the "benchmark" (vec_id < 20) in Scala, then PURE JSON flags every
  // corpus row whose max cosine against the benchmark reaches 0.35. The
  // probe is EXACT (the kernel scores every watchlist vector — no
  // banding, no recall loss), so the oracle is the plain cross-join max;
  // benchmark rows themselves score 1.0 via their self-match, pinning
  // the round-trip of the stored vectors through the parquet index.
  private def q222(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_q222_index"
    Similarity.saveAnnIndex(
      s, emb(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", idxDir, nlist = 4)
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "embeddings"},
       "keep_columns": ["vec_id", "embedding"],
       "ann_probe": {"vec_col": "embedding", "index_dir": "$idxDir",
                     "threshold": 0.35},
       "drop": ["embedding"],
       "order_by": ["vec_id asc"]}""")
  }
  private val q222Sql = s"""
    WITH b AS (SELECT embedding FROM embeddings WHERE vec_id < 20),
    s AS (
      SELECT e.vec_id,
             MAX(${duckCosine("e.embedding", "b.embedding")}) AS ann_score
      FROM embeddings e CROSS JOIN b GROUP BY e.vec_id)
    SELECT vec_id, ann_score, ann_score >= 0.35 AS ann_match
    FROM s ORDER BY vec_id ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q218_ann_index_search", q218, Some(bruteTopKSql(3))),
    Q("q220_ann_index_append", q220, Some(bruteTopKSql(3))),
    Q("q222_ann_probe", q222, Some(q222Sql)),
    Q("q219_config_ann_index", q219, Some(q219Sql)),
    Q("q250_ann_index_stats", q250, Some(q250Sql)),
    Q("q253_ann_index_pq", q253, Some(q253Sql)),
    Q("q256_ann_index_lifecycle", q256, Some(bruteTopKSql(3))),
    Q("q276_ann_ingest_lifecycle", q276, Some(bruteTopKSql(3))),
    Q("q259_ann_filtered_search", q259, Some(q259Sql)),
    Q("q31_cosine_topk", q31, Some(q31Sql)),
    Q("q32_embedding_neardup", q32, Some(q32Sql)),
    Q("q46_embedding_neardup_banded", q46, Some(q46Sql)),
    Q("q64_embedding_neardup_prod", q64, Some(q64Sql)),
    Q("q66_config_neardup", q66, Some(q64Sql)),
    Q("q70_quantized_neardup", q70, Some(q70Sql)),
    Q("q92_ann_topk_full", q92, Some(bruteTopKSql(3))),
    Q("q93_ivf_topk_full", q93, Some(bruteTopKSql(3))),
    Q("q138_config_embedding_clusters", q138, Some(q138Sql)),
    Q("q167_semantic_dedup_exact", q167, Some(q167Sql)),
    Q("q168_config_semantic_dedup", q168, Some(q168Sql)),
    Q("q176_pq_topk", q176, Some(q176Sql)),
    Q("q177_ivfpq_topk_full", q177, Some(q176Sql)),
    Q("q183_incremental_semantic", q183, Some(q183Sql))
  )
}
