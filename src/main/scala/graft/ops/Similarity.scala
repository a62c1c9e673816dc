package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — SURVEY §2.2
  * NS pillar. Two tiers:
  *
  *   - brute-force cosine top-k: correctness baseline. Broadcast the query
  *     set (queries ≪ corpus), score every corpus row in the scan stage,
  *     per-query top-k via window. Cost O(|Q|·|C|) but |Q| is small and the
  *     corpus is never shuffled — only (query, score) pairs are.
  *   - LSH-bucketed (random hyperplane signatures): the scale path. Corpus
  *     and queries hash to sign-pattern buckets; only same-bucket pairs are
  *     scored. Equi-join on the bucket key → shuffle ∝ matches, not |Q|·|C|.
  *
  * All arithmetic is fixed-order (zip_with then ordered aggregate), so
  * scores are bit-reproducible run to run.
  */
object Similarity {

  /** Dot product of two numeric-array columns in element order, via the
    * native codegen expression (graft.functions.VectorDot): a primitive
    * double loop, no per-pair array allocation. Bit-identical to the
    * higher-order-function fold (same left-to-right summation), ~4× faster
    * in the all-pairs loops. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorDot.dot(a, b)

  /** The composable higher-order-function formulation (kept as the
    * reference implementation; tests assert it matches VectorDot). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, p) => acc + p)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na > 0 && nb > 0, dot(a, b) / (na * nb)).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k: for each row of `queries`, the `k` most
    * similar rows of `corpus`. `queries` is broadcast — the corpus-side
    * scan computes scores map-side; the only shuffle is the per-query
    * window over candidate scores. Scores rounded to 9 dp so downstream
    * ordering is reproducible; ties broken by corpus id. */
  def cosineTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      queryVec: String,
      corpusId: String,
      corpusVec: String,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    // Norms are computed ONCE per side below the join (corpus-side in the
    // scan projection, query-side inside the broadcast), not per pair —
    // per-pair cost is a single dot product.
    val q = broadcast(queries.select(
      col(queryId), col(queryVec).as("__qv"), l2Norm(col(queryVec)).as("__qn")))
    var scored = corpus
      .select(col(corpusId), col(corpusVec).as("__cv"), l2Norm(col(corpusVec)).as("__cn"))
      .crossJoin(q)
    if (excludeSelf) scored = scored.filter(col(queryId) =!= col(corpusId))
    val withScore = scored.select(
      col(queryId), col(corpusId),
      round(
        when(col("__qn") > 0 && col("__cn") > 0,
          dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
          .otherwise(lit(0.0)),
        9).as("score"))
    Relational.topKPerGroup(
      withScore, Seq(queryId),
      Seq(col("score").desc, col(corpusId).asc), k, rankCol = "rank")
  }

  /** Random-hyperplane LSH signature: bit i = sign(v · hᵢ) where hᵢ is a
    * deterministic pseudo-random hyperplane (components seeded from (i,d)
    * by splitmix-style mixing, uniform in [-1,1)). Cosine-similar vectors
    * agree on most signs. `numBits` ≤ 64.
    *
    * Computed by the native one-pass kernel
    * (graft.functions.HyperplaneSig): the vector is read once, all
    * numBits projections accumulate against a plane matrix held as a
    * single reference object — no plan literals at any dim, no per-bit
    * array re-traversal. Bit-identical to [[hyperplaneSignatureComposed]]
    * (same plane constants, same summation order; asserted in OpsSpec). */
  def hyperplaneSignature(vec: Column, dim: Int, numBits: Int): Column =
    graft.functions.Hyperplane.signature(vec, dim, numBits)

  /** The composable formulation — numBits VectorDot calls against plane
    * LITERALS + a CASE/OR tree — kept as the reference implementation for
    * the bit-equality test. numBits × dim doubles of literals (32 KB at
    * 64 × 64) and numBits traversals per row make it the slower twin. */
  def hyperplaneSignatureComposed(vec: Column, dim: Int, numBits: Int): Column = {
    require(numBits <= 64)
    val bitCols = (0 until numBits).map { i =>
      val plane: Seq[Double] =
        (0 until dim).map(d => graft.functions.Hyperplane.component(i, d))
      val proj = dot(vec, typedLit(plane))
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** One row per (band, band_key) bucket membership: the hyperplane
    * signature split into `bands` chunks of numBits/bands sign bits each
    * (pigeonhole banding). Norms and the full signature ride along so the
    * join output can score (one dot) and detect first-collision (bitwise)
    * without touching the source again. */
  private def explodeBands(
      df: DataFrame, id: String, vec: String,
      idAs: String, vecAs: String, nAs: String, sigAs: String,
      dim: Int, numBits: Int, bands: Int): DataFrame = {
    require(numBits % bands == 0, "bands must divide numBits")
    require(numBits / bands < 64,
      s"band width ${numBits / bands} would overflow the chunk mask (1L<<64 wraps); use more bands")
    val width = numBits / bands
    df.select(col(id).as(idAs), col(vec).as(vecAs),
        l2Norm(col(vec)).as(nAs),
        hyperplaneSignature(col(vec), dim, numBits).as(sigAs))
      .select(col(idAs), col(vecAs), col(nAs), col(sigAs),
        posexplode(array((0 until bands).map(c =>
          shiftright(col(sigAs), c * width)
            .bitwiseAND(lit((1L << width) - 1L))): _*)).as(Seq("band", "band_key")))
  }

  /** True iff `band` is the FIRST band in which the two signatures agree —
    * i.e. every earlier chunk of sigA XOR sigB is nonzero. A pair colliding
    * in m bands would otherwise be scored m times and need a dedup shuffle;
    * this predicate is a few bitwise ops evaluated BEFORE the dot product,
    * so each candidate pair costs exactly one dot and the join output needs
    * no distinct/groupBy afterwards. */
  private def firstCollision(sigA: Column, sigB: Column, width: Int, bands: Int): Column = {
    // Flat boolean over LITERAL shifts — no sequence()/forall(): a HOF here
    // allocates an array per join row and runs interpreted, which costs
    // more than the dot products it saves (measured). This form is plain
    // bitwise arithmetic inside whole-stage codegen.
    val x = sigA.bitwiseXOR(sigB)
    val earlierZero = (0 until bands - 1).map { j =>
      val chunkMask = lit(((1L << width) - 1L) << (j * width))
      (col("band") > j) && (x.bitwiseAND(chunkMask) === 0)
    }.reduceOption(_ || _).getOrElse(lit(false))
    !earlierZero
  }

  /** IVF-style bucketed ANN: band the hyperplane signature into `bands`
    * chunks (pigeonhole: vectors agreeing on any whole chunk meet), score
    * only in-bucket pairs, keep top-k per query. Recall < 1 by design;
    * raise `bands` (more, shorter chunks) for higher recall, fewer for
    * less shuffle. */
  def annTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      queryVec: String,
      corpusId: String,
      corpusVec: String,
      dim: Int,
      k: Int,
      numBits: Int = 32,
      bands: Int = 4
  ): DataFrame = {
    val qb = explodeBands(queries, queryId, queryVec, "__qid", "__qv", "__qn", "__qsig", dim, numBits, bands)
    val cb = explodeBands(corpus, corpusId, corpusVec, "__cid", "__cv", "__cn", "__csig", dim, numBits, bands)
    // Each colliding pair is scored exactly once — in its first shared
    // band (cheap bitwise predicate, checked before the dot product) — so
    // no dedup shuffle is needed afterwards.
    val scored = qb.join(cb, Seq("band", "band_key"))
      .filter(col("__qid") =!= col("__cid") &&
        firstCollision(col("__qsig"), col("__csig"), numBits / bands, bands))
      .select(
        col("__qid").as(queryId), col("__cid").as(corpusId),
        round(
          when(col("__qn") > 0 && col("__cn") > 0,
            dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
            .otherwise(lit(0.0)),
          9).as("score"))
    Relational.topKPerGroup(
      scored, Seq(queryId),
      Seq(col("score").desc, col(corpusId).asc), k, rankCol = "rank")
  }

  /** Indices of the `nprobe` centroids nearest to `vec` by dot product
    * against pre-normalized centroids (the row vector's own norm is a
    * common factor, so it can't change the ranking). One codegen kernel
    * call holding the centroid matrix as a REFERENCE OBJECT
    * ([[graft.functions.CentroidKernels]]) — the composed
    * array_sort-over-(−dot, idx)-structs form embedded one typedLit per
    * centroid, megabytes of plan constants at production nlist·dim;
    * ordering (dot desc, idx asc, null-dot first) is bit-identical
    * (OpsSpec asserts against the composed form). */
  private def nearestLists(vec: Column, cNorm: Seq[Seq[Double]], nprobe: Int): Column =
    graft.functions.CentroidKernels.nearestCentroids(vec, cNorm, nprobe)

  /** IVF-style ANN top-k — the second standard ANN shape next to the
    * hyperplane-LSH [[annTopK]]: corpus vectors are bucketed by nearest
    * centroid (the "inverted lists"); each query probes its `nprobe`
    * nearest lists and scores only those vectors. Candidates per query
    * ≈ |corpus|·nprobe/nlist; raise `nprobe` for recall, `nlist` for
    * pruning.
    *
    * Centroids are a deterministic lowest-hash sample of `nlist` corpus
    * vectors (FULL k-means would cost a 100 TB pass per round);
    * `refineRounds` > 0 adds mini-batch Lloyd rounds over a
    * metadata-sized sample — see [[ivfCentroids]] — which improves list
    * balance without a corpus pass. The `.collect()`s are bounded by
    * nlist·dim doubles and the nlist·64 mini-batch — centroid METADATA,
    * independent of corpus size, embedded as literals so both assignment
    * passes run scan-side with no shuffle (same posture as a broadcast,
    * minus the join). */
  /** IVF centroids: deterministic lowest-hash sample of `nlist` corpus
    * vectors, optionally refined by `refineRounds` MINI-BATCH Lloyd
    * rounds — each round reassigns a deterministic hash-bounded sample
    * (nlist·64 vectors, metadata-sized like the centroids themselves)
    * and recenters, materially improving list balance at a bounded cost
    * (a FULL Lloyd pass would rescan 100 TB per round; the mini-batch is
    * the standard compromise). Deterministic bit-for-bit: the sample is
    * hash-ordered with an id tiebreak, and per-(list, dim) means use the
    * dsum posture (9-dp-rounded terms, decimal sum) so shuffle order
    * cannot leak in. Lists that capture no sample vectors keep their
    * previous centroid. Centroids stay L2-normalized (cosine space). */
  private def ivfCentroids(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      nlist: Int,
      refineRounds: Int
  ): Seq[Seq[Double]] = {
    def normalize(v: Seq[Double], fallback: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else fallback
    }
    var cents: Seq[Seq[Double]] = corpus
      .select(col(corpusId).cast("string").as("__cid"), col(corpusVec).as("__v"))
      .orderBy(xxhash64(col("__cid")), col("__cid"))
      .limit(nlist)
      .collect()
      .map { r =>
        val v = r.getSeq[Number](1).map(_.doubleValue())
        normalize(v, v)
      }.toSeq
    require(cents.nonEmpty, "ivfTopK: empty corpus")
    if (refineRounds > 0) {
      val dec = org.apache.spark.sql.types.DecimalType(25, 9)
      val mb = corpus
        .select(col(corpusId).cast("string").as("__cid"), col(corpusVec).as("__v"))
        .orderBy(xxhash64(col("__cid")), col("__cid"))
        .limit(math.max(nlist * 64, 256))
        .persist()
      var rd = 0
      while (rd < refineRounds) {
        val means = mb
          .select(element_at(nearestLists(col("__v"), cents, 1), 1).as("__l"),
            posexplode(col("__v")).as(Seq("__d", "__x")))
          .groupBy(col("__l"), col("__d"))
          .agg((sum(round(col("__x").cast("double"), 9).cast(dec)).cast("double") /
            count(lit(1))).as("__m"))
          .collect()
        val byList = means.groupBy(_.getInt(0))
        cents = cents.zipWithIndex.map { case (old, li) =>
          byList.get(li) match {
            case Some(rows) =>
              normalize(rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq, old)
            case None => old
          }
        }
        rd += 1
      }
      mb.unpersist()
    }
    cents
  }

  /** Per-list corpus assignment counts under the (optionally refined)
    * IVF centroids — the tuning view for nlist/refineRounds: a skewed
    * histogram means one list absorbs the scan cost pruning was meant to
    * save. */
  def ivfListSizes(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      nlist: Int = 16,
      refineRounds: Int = 0
  ): DataFrame = {
    val cents = ivfCentroids(corpus, corpusId, corpusVec, nlist, refineRounds)
    corpus
      .select(element_at(nearestLists(col(corpusVec), cents, 1), 1).as("list"))
      .groupBy("list").agg(count(lit(1)).as("n"))
  }

  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      queryVec: String,
      corpusId: String,
      corpusVec: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      refineRounds: Int = 0
  ): DataFrame = {
    val cents = ivfCentroids(corpus, corpusId, corpusVec, nlist, refineRounds)
    val cb = corpus.select(
      col(corpusId).as("__cid2"), col(corpusVec).as("__cv"),
      l2Norm(col(corpusVec)).as("__cn"),
      element_at(nearestLists(col(corpusVec), cents, 1), 1).as("__list"))
    val qb = queries.select(
      col(queryId).as("__qid2"), col(queryVec).as("__qv"),
      l2Norm(col(queryVec)).as("__qn"),
      explode(nearestLists(col(queryVec), cents, math.min(nprobe, cents.size))).as("__list"))
    val scored = qb.join(cb, Seq("__list"))
      .filter(col("__qid2") =!= col("__cid2"))
      .select(
        col("__qid2").as(queryId), col("__cid2").as(corpusId),
        round(
          when(col("__qn") > 0 && col("__cn") > 0,
            dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
            .otherwise(lit(0.0)),
          9).as("score"))
    Relational.topKPerGroup(
      scored, Seq(queryId),
      Seq(col("score").desc, col(corpusId).asc), k, rankCol = "rank")
  }

  /** Persist an AT-REST IVF index for [[annSearchIndex]] — the artifact
    * pattern (train once, search many) applied to vector retrieval:
    * `dir/centroids` holds the (list, centroid) metadata (nlist rows —
    * bounded, loads at compile time like a score_model weight table) and
    * `dir/index` the corpus assignment (id, vec, norm, list), PARTITIONED
    * BY LIST so a search touching nprobe of nlist lists prunes the scan
    * to nprobe/nlist of the files (dynamic partition pruning through the
    * probe join). Norms are precomputed once here instead of per search.
    * Centroids are [[ivfCentroids]]' deterministic sample (+ optional
    * mini-batch Lloyd refinement), so rebuilding over the same corpus is
    * bit-identical. One corpus pass; the centroid fit collects only
    * nlist·dim + nlist·64 metadata. */
  def saveAnnIndex(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nlist: Int = 16,
      refineRounds: Int = 0,
      pq: Option[(Int, Int)] = None,
      pqIters: Int = 5
  ): Unit = {
    require(nlist >= 1 && nlist <= 65536,
      s"saveAnnIndex: nlist must be in [1, 65536], got $nlist")
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist, refineRounds)
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    pq match {
      case None =>
        corpus.select(
            col(idCol).as("id"),
            col(vecCol).as("vec"),
            l2Norm(col(vecCol)).as("norm"),
            element_at(nearestLists(col(vecCol), cents, 1), 1).as("list"))
          .write.mode("overwrite").partitionBy("list").parquet(s"$dir/index")
      case Some((m, k)) =>
        // PQ tier — the FAISS IVF-PQ at-rest shape: rows store m small
        // CODES (m bytes at k <= 256) instead of dim floats, a 32-64x
        // shrink; `dir/codebooks` persists the trained sub-centroid
        // matrix (bounded metadata: m*k*(dim/m) = k*dim doubles).
        // Search reconstructs per candidate (asymmetric distance) —
        // lossy by design; raise m for accuracy, lower it for size.
        // The stored norm is the RECONSTRUCTED vector's norm, so search
        // never recomputes it.
        val dim = corpus
          .select(size(col(vecCol)).as("d")).filter(col("d") > 0)
          .limit(1).collect().headOption.map(_.getInt(0))
          .getOrElse(throw new IllegalArgumentException(
            "saveAnnIndex: no non-empty vectors to train PQ codebooks on"))
        val cbs = pqTrain(corpus, idCol, vecCol, dim, m, k, pqIters)
        cbs.zipWithIndex.flatMap { case (sub, j) =>
            sub.zipWithIndex.map { case (cent, c) => (j, c, cent) } }
          .toDF("j", "c", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
        corpus.select(
            col(idCol).as("id"),
            graft.functions.PqKernels.pqEncode(col(vecCol), cbs).as("codes"),
            element_at(nearestLists(col(vecCol), cents, 1), 1).as("list"))
          .withColumn("norm", l2Norm(
            graft.functions.PqKernels.pqDecode(col("codes"), cbs)))
          .select("id", "codes", "norm", "list")
          .write.mode("overwrite").partitionBy("list").parquet(s"$dir/index")
    }
    // A REBUILD invalidates any streaming-ingest delta area — leftover
    // batch dirs would silently union stale vectors (assigned against
    // the OLD centroids) into every later search. The rebuild is NOT
    // crash-atomic: the overwrites above replace centroids/index in
    // place, and the stale delta is swept here, last — a crash anywhere
    // mid-rebuild can leave a part-written index and/or an un-swept
    // delta, so a crashed rebuild must simply be RE-RUN (idempotent
    // over the same input).
    Artifacts.deleteDir(spark, s"$dir/index_inc")
  }

  /** The saved PQ codebooks as kernel-ready metadata ((j, c)-ordered).
    * Loud by name when the index stores codes but the codebooks are
    * missing/damaged — a silent fallback would score garbage. */
  private[graft] def loadCodebooks(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Seq[Seq[Seq[Double]]] = {
    val rows =
      try spark.read.parquet(s"$indexDir/codebooks").collect()
      catch { case e: Exception => throw new IllegalArgumentException(
        s"ann index: the index under $indexDir stores PQ codes but its " +
          s"codebooks cannot be read from $indexDir/codebooks — rebuild " +
          s"the index: ${e.getMessage}") }
    require(rows.nonEmpty, s"ann index: empty codebooks under $indexDir/codebooks")
    require(rows.length <= (1 << 16),
      s"ann index: ${rows.length} codebook rows exceed the 65536 metadata bound")
    val grouped = rows
      .map(r => (r.getAs[Int]("j"), r.getAs[Int]("c"),
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, sub) => sub.sortBy(_._2).map(_._3).toSeq }
    val k = grouped.head.size
    require(grouped.forall(_.size == k),
      s"ann index: ragged codebooks under $indexDir/codebooks — rebuild the index")
    grouped
  }

  /** The saved centroid table as kernel-ready metadata (list-ordered). */
  private[graft] def loadCentroids(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): Seq[Seq[Double]] = {
    val cRows =
      try spark.read.parquet(s"$indexDir/centroids").collect()
      catch { case e: Exception => throw new IllegalArgumentException(
        s"ann index: cannot read centroids under $indexDir/centroids — " +
          s"build the index first (ann_index / saveAnnIndex): ${e.getMessage}") }
    require(cRows.nonEmpty, s"ann index: no centroids under $indexDir/centroids")
    require(cRows.length <= 65536,
      s"ann index: ${cRows.length} centroids exceed the 65536 metadata bound")
    cRows.sortBy(_.getAs[Int]("list"))
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toSeq).toSeq
  }

  /** Read the index rows as base ∪ streaming-ingest DELTA:
    * [[graft.streaming.Streaming.annIngest]] lands each micro-batch as
    * an OVERWRITTEN `batch=<id>` child of `index_inc` (idempotent
    * replays — an in-place append would double-land a replayed batch),
    * and every reader unions the two areas. The delta's `batch`
    * partition column is bookkeeping, never data; `list` is a partition
    * column in BOTH layouts, so probe pruning applies on both sides. */
  private def readIndexRows(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Artifacts.readWithInc(spark, s"$dir/index", s"$dir/index_inc")

  /** APPEND new vectors to a [[saveAnnIndex]] artifact: assign each row to
    * its nearest SAVED centroid (the centroids do not refit — shipped
    * search results for old vectors never change, the append is one
    * scan-stage pass over the new rows only) and append the (id, vec,
    * norm, list) rows into the existing list partitions. The incremental
    * maintenance path a growing corpus needs — history is never re-read,
    * never re-assigned. Caller contracts: ids should be fresh (duplicate
    * ids are kept verbatim, like tar members without a batch column), and
    * one append per landed batch (the write is a plain parquet append).
    * Centroid drift under heavy growth is the documented trade — rebuild
    * with [[saveAnnIndex]] when the balance histogram degrades. */
  def appendAnnIndex(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String
  ): Unit = {
    val cents = loadCentroids(spark, dir)
    // PQ indexes append PQ rows: new vectors encode against the SAVED
    // codebooks (like the saved centroids — no refit, shipped search
    // results never change). Detection is by the artifact's own schema,
    // footers only.
    val isPq = spark.read.parquet(s"$dir/index").schema
      .fieldNames.contains("codes")
    encodeIndexRows(corpus, idCol, vecCol, cents,
        if (isPq) Some(loadCodebooks(spark, dir)) else None)
      .write.mode("append").partitionBy("list").parquet(s"$dir/index")
  }

  /** The (id, vec|codes, norm, list) index-row encoding over FIXED
    * geometry (saved centroids, and saved codebooks for a PQ index) —
    * shared by [[appendAnnIndex]] and the streaming
    * [[graft.streaming.Streaming.annIngest]] so the two append paths can
    * never drift. */
  private[graft] def encodeIndexRows(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[Seq[Double]],
      cbs: Option[Seq[Seq[Seq[Double]]]]): DataFrame =
    cbs match {
      case Some(cb) =>
        corpus.select(
            col(idCol).as("id"),
            graft.functions.PqKernels.pqEncode(col(vecCol), cb).as("codes"),
            element_at(nearestLists(col(vecCol), cents, 1), 1).as("list"))
          .withColumn("norm", l2Norm(
            graft.functions.PqKernels.pqDecode(col("codes"), cb)))
          .select("id", "codes", "norm", "list")
      case None =>
        corpus.select(
            col(idCol).as("id"),
            col(vecCol).as("vec"),
            l2Norm(col(vecCol)).as("norm"),
            element_at(nearestLists(col(vecCol), cents, 1), 1).as("list"))
    }

  /** COMPACT a [[saveAnnIndex]] artifact: every [[appendAnnIndex]] lands
    * one more file set per touched list directory — after many appends
    * the footer reads dominate the pruned scan. Rewrites each list to
    * ONE file; rows/values/layout unchanged (searches bit-identical —
    * gated), centroids and codebooks untouched. Pair with
    * [[annIndexStats]]: compact for fragmentation, rebuild for skew. */
  def compactAnnIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      maxBatchId: Option[Long] = None,
      defragWhenEmpty: Boolean = true,
      strict: Boolean = true): Int =
    Artifacts.foldIncInto(spark, s"$dir/index", s"$dir/index_inc",
      Some("list"), maxBatchId, defragWhenEmpty, strict)

  /** Index HEALTH view over a [[saveAnnIndex]] artifact — the
    * rebuild-vs-append decision input ([[appendAnnIndex]]'s documented
    * trade is centroid drift under heavy growth; this is the gauge that
    * says when the trade went bad). One row:
    * (n_lists, n_empty_lists, n_vectors, max_list_n, mean_list_n, skew)
    * where mean is over ALL nlist lists (empty ones included) and
    * skew = max/mean — 1.0 is perfectly balanced, n_lists is the
    * worst case (every vector in one hot list; searches probing it
    * degrade toward brute force). Rebuild when skew drifts well past
    * its post-build value.
    *
    * Scale: centroids load as bounded metadata (n_lists without reading
    * the corpus); the index side is ONE count-by-list aggregate whose
    * scan prunes to the `list` PARTITION column — no vector data moves,
    * and the per-list counts are an nlist-bounded frame. */
  def annIndexStats(
      spark: org.apache.spark.sql.SparkSession,
      dir: String
  ): DataFrame = {
    val nl = loadCentroids(spark, dir).size
    val counts = readIndexRows(spark, dir)
      .groupBy(col("list")).agg(count(lit(1)).as("__n"))
    counts.agg(
        lit(nl).as("n_lists"),
        (lit(nl.toLong) - count(lit(1))).cast("long").as("n_empty_lists"),
        coalesce(sum(col("__n")), lit(0L)).cast("long").as("n_vectors"),
        coalesce(max(col("__n")), lit(0L)).cast("long").as("max_list_n"),
        round(coalesce(sum(col("__n")), lit(0L)) / lit(nl.toDouble), 9)
          .as("mean_list_n"))
      .withColumn("skew", round(
        when(col("n_vectors") > 0,
          col("max_list_n") * lit(nl.toDouble) / col("n_vectors"))
          .otherwise(lit(0.0)), 9))
  }

  /** SCAN-STAGE semantic probe against a [[saveAnnIndex]] artifact — the
    * embedding sibling of `near_dup_probe`/`winnow_probe` and the
    * semantic-decontamination gate: every row gains `scoreCol` = its MAX
    * cosine against the indexed vectors (exact — the brute-force verify
    * tier, no recall loss) and boolean `flagCol` = score ≥ threshold.
    * The index side is a WATCHLIST/BENCHMARK (bounded: ≤ 65536 vectors,
    * ≤ 2²² doubles — the reference-object budget, enforced by name): its
    * vectors load once at compile and ride as ONE codegen reference
    * object, so the probed frame never joins, shuffles, or aggregates —
    * which is what makes it streaming-admissible. Per-row cost is
    * refs·dim multiplies inside whole-stage codegen. For corpus-scale
    * indexes use the batch [[annSearchIndex]] instead. Null/invalid
    * vectors flag false with a null score. */
  def annProbeIndex(
      df: DataFrame,
      vecCol: String,
      indexDir: String,
      threshold: Double,
      scoreCol: String = "ann_score",
      flagCol: String = "ann_match"
  ): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"annProbeIndex: threshold must be in [-1, 1], got $threshold")
    Seq(scoreCol, flagCol).foreach(c => require(!df.columns.contains(c),
      s"annProbeIndex: output column '$c' already exists — rename it first"))
    val spark = df.sparkSession
    val idxDf = readIndexRows(spark, indexDir)
    require(idxDf.columns.contains("vec"),
      "annProbeIndex: this index stores PQ codes — the probe tier " +
        "scores EXACT watchlist vectors (a watchlist is bounded; build " +
        "its index without pq)")
    val idx = idxDf.select(col("vec"))
    // ONE action: collect with a 65537-row probe limit (the index side is
    // watchlist-sized by contract, so an over-budget artifact costs at
    // most one extra row before the named error) and derive n from the
    // array — a separate count() would re-scan the index parquet.
    val rows = idx.limit(65537).collect()
    val n = rows.length
    require(n >= 1, s"annProbeIndex: empty index under $indexDir/index")
    require(n <= 65536,
      s"annProbeIndex: the index holds >= $n vectors — the probe side " +
        "must be a watchlist/benchmark (<= 65536 vectors; the kernel " +
        "broadcasts them as a reference object). For corpus-scale " +
        "indexes use ann_search in batch")
    val refs = rows
      .map(r => r.getSeq[Number](0).map(_.doubleValue()).toSeq).toSeq
    require(refs.map(_.length.toLong).sum <= (1L << 22),
      s"annProbeIndex: ${refs.map(_.length.toLong).sum} reference doubles " +
        s"exceed the ${1L << 22} kernel budget — shrink the watchlist or " +
        "its dimension")
    df.withColumn(scoreCol,
        graft.functions.CentroidKernels.maxCosine(col(vecCol), refs))
      .withColumn(flagCol, coalesce(col(scoreCol) >= threshold, lit(false)))
  }

  /** ANN top-k against a [[saveAnnIndex]] artifact: each query row probes
    * its `nprobe` nearest lists (centroids load once — bounded metadata,
    * embedded as a kernel reference object) and scores only those lists'
    * vectors; output (queryId, match_id, score, rank), bit-identical to
    * [[ivfTopK]] at the same (nlist, nprobe, refineRounds) over the same
    * corpus. Scale: the probe join equi-joins on the index's PARTITION
    * column, so with the (usually small) query side broadcast, dynamic
    * partition pruning reads only the probed lists' files — the search
    * cost is nprobe/nlist of the corpus, and the index is never rebuilt
    * per query batch. Batch-shaped (per-query top-k is a rank window). */
  def annSearchIndex(
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      indexDir: String,
      k: Int,
      nprobe: Int = 4,
      allowed: Option[DataFrame] = None,
      allowedIdCol: String = "id"
  ): DataFrame = {
    require(k >= 1, s"annSearchIndex: k must be >= 1, got $k")
    require(nprobe >= 1, s"annSearchIndex: nprobe must be >= 1, got $nprobe")
    require(queryId != "match_id",
      "annSearchIndex: rename the query id column — 'match_id' names the index side")
    val spark = queries.sparkSession
    val cents = loadCentroids(spark, indexDir)
    // FILTERED search (the vector-store "metadata filter"): restrict the
    // candidate set to the allowed ids BEFORE scoring and top-k, so each
    // query still gets its k best matches FROM THE ALLOWED SUBSET —
    // post-filtering an unfiltered top-k would silently return fewer
    // (or zero) rows for queries whose neighborhoods are disallowed.
    // One LEFT SEMI equi-join on the index id (AQE broadcasts a small
    // allow-list; a corpus-scale one shuffles id-shaped rows, never
    // vectors from the disallowed side).
    val idx = allowed match {
      case None => readIndexRows(spark, indexDir)
      case Some(a) =>
        require(a.columns.contains(allowedIdCol),
          s"annSearchIndex: the allowed frame has no id column " +
            s"'$allowedIdCol' (has: ${a.columns.mkString(", ")})")
        readIndexRows(spark, indexDir)
          .join(a.select(col(allowedIdCol).as("id")), Seq("id"), "left_semi")
    }
    // PQ artifact: candidates reconstruct from their codes (asymmetric
    // distance — queries stay exact); the stored norm is already the
    // reconstructed vector's. Same plan shape, same pruning.
    val corpusVec =
      if (idx.columns.contains("codes"))
        graft.functions.PqKernels.pqDecode(col("codes"),
          loadCodebooks(spark, indexDir))
      else col("vec")
    val qb = queries.select(
      col(queryId).as("__qid2"), col(queryVec).as("__qv"),
      l2Norm(col(queryVec)).as("__qn"),
      explode(nearestLists(col(queryVec), cents, math.min(nprobe, cents.size))).as("list"))
    val scored = qb.join(idx, Seq("list"))
      .filter(col("__qid2") =!= col("id"))
      .select(
        col("__qid2").as(queryId), col("id").as("match_id"),
        round(
          when(col("__qn") > 0 && col("norm") > 0,
            dot(col("__qv"), corpusVec) / (col("__qn") * col("norm")))
            .otherwise(lit(0.0)),
          9).as("score"))
    Relational.topKPerGroup(
      scored, Seq(queryId),
      Seq(col("score").desc, col("match_id").asc), k, rankCol = "rank")
  }

  /** The full FAISS IVF-PQ composition: corpus rows carry only their
    * LIST assignment and PQ CODES (the m-bytes-at-rest shape), queries
    * probe `nprobe` nearest lists, and only in-list candidates pay a
    * reconstruct+dot — list pruning bounds candidates, PQ bounds memory.
    * Centroids and codebooks are both bounded driver metadata riding as
    * codegen reference objects. With nprobe = nlist and codebook-aligned
    * vectors this provably equals [[pqTopK]] (OpsSpec asserts it); at
    * production parameters recall follows the usual IVF×PQ S-curves. */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      queryVec: String,
      corpusId: String,
      corpusCodes: String,
      corpusList: String,
      cents: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]],
      k: Int,
      nprobe: Int = 4
  ): DataFrame = {
    val cb = corpus.select(
      col(corpusId).as("__cid2"),
      pqReconstruct(col(corpusCodes), codebooks).as("__cv"),
      col(corpusList).as("__list"))
      .select(col("__cid2"), col("__cv"), l2Norm(col("__cv")).as("__cn"), col("__list"))
    val qb = queries.select(
      col(queryId).as("__qid2"), col(queryVec).as("__qv"),
      l2Norm(col(queryVec)).as("__qn"),
      explode(nearestLists(col(queryVec), cents, math.min(nprobe, cents.size))).as("__list"))
    val scored = qb.join(cb, Seq("__list"))
      .filter(col("__qid2") =!= col("__cid2"))
      .select(
        col("__qid2").as(queryId), col("__cid2").as(corpusId),
        round(
          when(col("__qn") > 0 && col("__cn") > 0,
            dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
            .otherwise(lit(0.0)),
          9).as("score"))
    Relational.topKPerGroup(
      scored, Seq(queryId),
      Seq(col("score").desc, col(corpusId).asc), k, rankCol = "rank")
  }

  /** Deterministic IVF list assignment + centroids for external use —
    * the build side of [[ivfPqTopK]]: returns the centroid metadata and
    * a frame of (id, list, codes) ready to persist as the at-rest index. */
  def ivfPqIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]],
      nlist: Int = 16,
      refineRounds: Int = 0
  ): (Seq[Seq[Double]], DataFrame) = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist, refineRounds)
    val indexed = corpus.select(col(idCol),
      element_at(nearestLists(col(vecCol), cents, 1), 1).as("list"),
      pqEncode(col(vecCol), codebooks).as("codes"))
    (cents, indexed)
  }

  /** L2-normalize a vector (unit length; zero vectors pass through as
    * zeros). Norm is let-bound so it's computed once per row, not per
    * element. */
  def normalize(vec: Column): Column =
    TextAnalysis.withBound(vec) { v =>
      TextAnalysis.withBound(l2Norm(v)) { n =>
        transform(v, x =>
          when(n > 0, (x.cast("double") / n).cast("float")).otherwise(lit(0.0f)))
      }
    }

  /** Symmetric int8 quantization: struct(scale, data) where data[i] =
    * round(x[i] / scale) ∈ [-127, 127] and scale = max|x| / 127. Cuts
    * embedding storage 4× (float32 → int8 + one float per vector) — at
    * 100 TB of embeddings that's the difference between one cluster and
    * four. Recall loss is bounded by the quantization error (see test). */
  def quantizeInt8(vec: Column): Column =
    TextAnalysis.withBound(vec) { v =>
      TextAnalysis.withBound(array_max(transform(v, x => abs(x))).cast("double") / 127.0) { scale =>
        struct(
          scale.cast("float").as("scale"),
          transform(v, x =>
            when(lit(scale) > 0, round(x.cast("double") / scale).cast("byte"))
              .otherwise(lit(0).cast("byte"))).as("data"))
      }
    }

  /** Inverse of quantizeInt8 (up to quantization error). */
  def dequantizeInt8(q: Column): Column =
    TextAnalysis.withBound(q) { qq =>
      transform(qq.getField("data"),
        b => (b.cast("double") * qq.getField("scale").cast("double")).cast("float"))
    }

  /** Embedding near-duplicate pairs: all (a,b) with cosine ≥ `threshold`.
    * Brute-force within-corpus variant for verification; the scale path is
    * the same banding as `annTopK` applied corpus×corpus. */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    // Precompute each vector's norm once (2n norms instead of 2·n²/2).
    val a = corpus.select(col(idCol).as("idA"), col(vecCol).as("__va"),
      l2Norm(col(vecCol)).as("__na"))
    val b = corpus.select(col(idCol).as("idB"), col(vecCol).as("__vb"),
      l2Norm(col(vecCol)).as("__nb"))
    a.crossJoin(broadcast(b))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        round(
          when(col("__na") > 0 && col("__nb") > 0,
            dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
            .otherwise(lit(0.0)),
          9).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Scale path for corpus×corpus embedding near-dup: pigeonhole-banded
    * hyperplane signatures — only same-bucket pairs are scored, so
    * candidate volume ∝ bucket collisions instead of n²/2 and the corpus
    * is shuffled by band key, never broadcast. This is the 100 TB
    * replacement for `cosineNearDupPairs` (kept as the exact, oracle-
    * checked baseline).
    *
    * Recall math (random hyperplanes): a pair at cosine s agrees per bit
    * with p = 1 − acos(s)/π, collides in one band of width w with p^w and
    * is found with 1 − (1 − p^w)^bands. At production thresholds (s ≥ 0.9,
    * p ≥ 0.93) use wide bands — numBits=64, bands=8 (w=8) gives recall
    * ≈ 0.99 with strong pruning (256-way buckets/band). The defaults here
    * (w=2, 16 bands) are sized for LOW thresholds like the q32 fixture's
    * 0.4, where recall ≈ 0.9997 but pruning is necessarily weak — the
    * S-curve math, not the plan shape, is the knob. A pair colliding in
    * several bands is scored once, in its FIRST shared band (bitwise
    * predicate on the XOR'd signatures, checked before the dot product), so
    * no dedup shuffle exists in the plan at all. */
  def cosineNearDupPairsBanded(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      numBits: Int = 32,
      bands: Int = 16
  ): DataFrame =
    bandedCandidateRows(corpus, idCol, vecCol, dim, numBits, bands)
      .select(col("idA"), col("idB"),
        round(
          when(col("__na") > 0 && col("__nb") > 0,
            dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
            .otherwise(lit(0.0)),
          9).as("score"))
      .filter(col("score") >= threshold)

  /** Candidate pairs of the banded near-dup plan — (idA, idB), each pair
    * exactly once (first-collision) — exposed as the measurable PRUNING
    * surface: in the production regime (τ ≥ 0.8, numBits=64, bands=8 →
    * 256-way buckets) `count()` of this frame must be a small fraction of
    * n²/2, which is what the plan-invariant test asserts (a recall bound
    * alone can't distinguish real pruning from scoring every pair). */
  def bandedCandidatePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numBits: Int,
      bands: Int
  ): DataFrame =
    bandedCandidateRows(corpus, idCol, vecCol, dim, numBits, bands)
      .select("idA", "idB")

  /** The shared candidate stage: band-key equi-join, idA < idB, scored-once
    * guarantee via [[firstCollision]]; vectors and norms ride along so the
    * scoring tier costs one dot per pair. */
  private def bandedCandidateRows(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numBits: Int,
      bands: Int
  ): DataFrame = {
    val banded = explodeBands(corpus, idCol, vecCol, "__id", "__v", "__n", "__sig", dim, numBits, bands)
    val a = banded.select(col("band"), col("band_key"),
      col("__id").as("idA"), col("__v").as("__va"), col("__n").as("__na"),
      col("__sig").as("__siga"))
    val b = banded.select(col("band"), col("band_key"),
      col("__id").as("idB"), col("__v").as("__vb"), col("__n").as("__nb"),
      col("__sig").as("__sigb"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("idA") < col("idB") &&
        firstCollision(col("__siga"), col("__sigb"), numBits / bands, bands))
  }

  /** Product-quantization codebooks (the public FAISS PQ design — the
    * memory-compression tier of billion-vector ANN): the vector space is
    * split into `m` subspaces of dim/m dimensions; each subspace gets
    * `k` sub-centroids (k ≤ 256 → one byte per code at rest); a vector
    * stores as its m nearest-sub-centroid indices — dim·4 bytes → m
    * bytes, the 32–64× shrink that fits a 100 TB corpus's vectors in
    * cluster memory.
    *
    * Training is DETERMINISTIC and sample-bounded: a lowest-hash sample
    * of max(k·16, 256) corpus vectors (id-keyed — retry/partition
    * stable) collects to the driver (bounded metadata, the IVF-centroid
    * trust model), then per-subspace Lloyd iterations run locally on
    * that sample — lowest-hash init, L2 assignment with lowest-index
    * tie-break, empty clusters keep their centroid. Bit-identical on
    * every rerun. Returns m × k × (dim/m) codebooks for the kernels
    * ([[graft.functions.PqKernels]]) — which hold them as ONE codegen
    * reference object, zero plan literals at any m·k·dim. */
  def pqTrain(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      k: Int = 256,
      iters: Int = 5
  ): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && dim % m == 0, s"pqTrain: m=$m must divide dim=$dim")
    require(k >= 1 && k <= 256, s"pqTrain: k must be in [1, 256], got $k")
    val sub = dim / m
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol).cast("string").as("__cid"), col(vecCol).as("__v"))
      .filter(size(col("__v")) === dim)
      .orderBy(xxhash64(col("__cid")), col("__cid"))
      .limit(math.max(k * 16, 256))
      .collect()
      .map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    require(sample.nonEmpty, s"pqTrain: no vectors of length $dim in corpus")
    (0 until m).map { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      // lowest-hash-order init: first k distinct sample points (pad by
      // cycling when the sample has fewer distinct points than k)
      var cents: Array[Array[Double]] =
        (0 until k).map(i => pts(i % pts.length).clone()).toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Long](k)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var acc = 0.0; var e = 0
            while (e < sub) { val d0 = p(e) - cents(c)(e); acc += d0 * d0; e += 1 }
            if (acc < bestD) { bestD = acc; best = c }
            c += 1
          }
          counts(best) += 1
          var e = 0
          while (e < sub) { sums(best)(e) += p(e); e += 1 }
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else sums(c).map(_ / counts(c))
        }
        it += 1
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** Vector → m sub-centroid codes (see [[pqTrain]]); scan-stage codegen
    * kernel, codebooks as a reference object. */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.PqKernels.pqEncode(vec, codebooks)

  /** Codes → reconstructed vector (sub-centroids concatenated). Scoring
    * composes with [[dot]]/[[cosine]] — `cosine(q, pqReconstruct(codes))`
    * IS asymmetric-distance scoring, stated composably. */
  def pqReconstruct(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.PqKernels.pqDecode(codes, codebooks)

  /** PQ-compressed brute-force top-k: corpus rows are scored from their
    * CODES (the at-rest representation — the corpus vectors themselves
    * need not exist anymore), queries stay exact — the standard
    * asymmetric recipe. Same plan shape as [[cosineTopK]]: broadcast
    * queries, one reconstruct+dot per pair in the scan stage, per-query
    * top-k window. Compose with IVF list pruning for the full FAISS
    * IVF-PQ shape (assign codes per list with [[ivfTopK]]'s centroids). */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      queryVec: String,
      corpusId: String,
      corpusCodes: String,
      codebooks: Seq[Seq[Seq[Double]]],
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val q = broadcast(queries.select(
      col(queryId), col(queryVec).as("__qv"), l2Norm(col(queryVec)).as("__qn")))
    var scored = corpus
      .select(col(corpusId),
        pqReconstruct(col(corpusCodes), codebooks).as("__cv"))
      .select(col(corpusId), col("__cv"), l2Norm(col("__cv")).as("__cn"))
      .crossJoin(q)
    if (excludeSelf) scored = scored.filter(col(queryId) =!= col(corpusId))
    val withScore = scored.select(
      col(queryId), col(corpusId),
      round(
        when(col("__qn") > 0 && col("__cn") > 0,
          dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
          .otherwise(lit(0.0)),
        9).as("score"))
    Relational.topKPerGroup(
      withScore, Seq(queryId),
      Seq(col("score").desc, col(corpusId).asc), k, rankCol = "rank")
  }

  /** Persistable semantic-dedup corpus state — the incremental tier's
    * index (the minhashBandIndex convention for embeddings): the IVF
    * centroids plus the DISTINCT identical-embedding classes
    * (cluster, sig, rep, vec). History is probed by cluster-scoped band
    * equi-join against these classes — one row per distinct embedding,
    * never the full corpus. */
  def saveSemanticIndex(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      path: String,
      nlist: Int = 16,
      refineRounds: Int = 0,
      numBits: Int = 64
  ): Unit = {
    import spark.implicits._
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist, refineRounds)
    cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("list_id", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val assigned = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      element_at(graft.functions.CentroidKernels.nearestCentroids(
        col(vecCol), cents, 1), 1).as("__cl"))
    assigned.groupBy(col("__cl"), col("__v")).agg(min(col("__id")).as("__rep"))
      .select(col("__cl").as("cluster"), col("__v").as("vec"),
        col("__rep").as("rep"),
        hyperplaneSignature(col("__v"), dim, numBits).as("sig"))
      .write.mode("overwrite").parquet(s"$path/classes/batch=seed")
    // (classes live under a batch= partition so streaming ingestion can
    // append per-micro-batch class directories next to the seed)
  }

  /** The distinct-class frame of `df` under FIXED centroids — what
    * streaming ingestion appends to a semantic index per admitted
    * batch. */
  private[graft] def semanticClassesOf(df: DataFrame, idCol: String,
      vecCol: String, dim: Int, cents: Seq[Seq[Double]],
      numBits: Int): DataFrame =
    df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        element_at(graft.functions.CentroidKernels.nearestCentroids(
          col(vecCol), cents, 1), 1).as("__cl"))
      .groupBy(col("__cl"), col("__v")).agg(min(col("__id")).as("__rep"))
      .select(col("__cl").as("cluster"), col("__v").as("vec"),
        col("__rep").as("rep"),
        hyperplaneSignature(col("__v"), dim, numBits).as("sig"))

  /** Load a [[saveSemanticIndex]] centroid table. */
  private[graft] def loadSemanticCentroids(
      spark: org.apache.spark.sql.SparkSession, path: String): Seq[Seq[Double]] = {
    val centsDf = spark.read.parquet(s"$path/centroids")
    require(centsDf.columns.toSeq.sorted == Seq("centroid", "list_id"),
      s"$path is not a semantic index (no centroids table)")
    centsDf.orderBy("list_id").collect().map(_.getSeq[Double](1).toSeq).toSeq
  }

  /** Dedup a new batch against a [[saveSemanticIndex]] corpus index PLUS
    * itself — the embedding sibling of `nearDupAgainstCorpus` /
    * `passageDedupAgainstCorpus`: history wins (a batch row semantically
    * near ANY indexed class drops, regardless of id), and within the
    * batch the [[semanticDedup]] min-id rule applies. The index is
    * probed by (cluster, band, band_key) equi-join over DISTINCT
    * classes — ingest cost tracks the batch, the corpus is never
    * re-scanned. Returns the surviving batch rows (original schema).
    * Batch rows whose cluster assignment (under the SAVED centroids)
    * differs from a near-duplicate's indexed cluster are missed — the
    * cluster-scoping approximation semanticDedup already documents. */
  def semanticDedupAgainstCorpus(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      indexPath: String,
      numBits: Int = 64,
      bands: Int = 8
  ): DataFrame = {
    val spark = batch.sparkSession
    val cents = loadSemanticCentroids(spark, indexPath)
    val idxClasses = spark.read.parquet(s"$indexPath/classes")
    semanticDedupAgainstClasses(batch, idCol, vecCol, threshold, dim,
      cents, idxClasses, numBits, bands)
  }

  /** [[semanticDedupAgainstCorpus]] with the index state already in hand
    * — the streaming-ingest entry point (each micro-batch must exclude
    * its own replayed classes before probing). */
  /** `register` receives every frame this call persists (the class/member/
    * candidate-pair internals, each with 3-4 consumers downstream —
    * unpersisted they re-ran the assignment kernel and the band join per
    * consumer, measured 15 scans in one q183 plan). The default routes
    * them to the compiler's operator-cache sweep (batch callers); the
    * STREAMING ingest passes its own collector and unpersists per
    * micro-batch — an unattended stream must not grow the global cache
    * registry one entry per batch. */
  private[graft] def semanticDedupAgainstClasses(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      cents: Seq[Seq[Double]],
      idxClasses: DataFrame,
      numBits: Int,
      bands: Int,
      register: DataFrame => Unit =
        graft.compile.Compiler.trackOperatorCache
  ): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"semanticDedupAgainstCorpus: threshold must be in (0, 1], got $threshold")
    require(numBits % bands == 0, "bands must divide numBits")
    def cached(df: DataFrame): DataFrame = {
      val c = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      register(c); c
    }
    val width = numBits / bands
    def bandKeys(sig: Column): Column =
      posexplode(array((0 until bands).map(c =>
        shiftright(sig, c * width)
          .bitwiseAND(lit((1L << width) - 1L))): _*))
    val assigned = batch.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      element_at(graft.functions.CentroidKernels.nearestCentroids(
        col(vecCol), cents, 1), 1).as("__cl"))
    def score(va: Column, na: Column, vb: Column, nb: Column): Column =
      round(when(na > 0 && nb > 0, dot(va, vb) / (na * nb)).otherwise(lit(0.0)), 9)
    val classes = cached(assigned
      .groupBy(col("__cl"), col("__v")).agg(min(col("__id")).as("__rep"))
      .select(col("__cl"), col("__v"), col("__rep"),
        l2Norm(col("__v")).as("__n"),
        hyperplaneSignature(col("__v"), dim, numBits).as("__sig")))
    val selfScore = score(col("__v"), col("__n"), col("__v"), col("__n"))
    val members = cached(assigned
      .join(classes.select(col("__cl"), col("__v"), col("__rep"),
        selfScore.as("__self")), Seq("__cl", "__v"))
      .select(col("__id"), col("__cl"), col("__rep"), col("__self")))
    // ---- in-batch drops: the semanticDedup rule
    val bandedB = classes
      .select(col("__cl"), col("__rep"), col("__v"), col("__n"), col("__sig"),
        bandKeys(col("__sig")).as(Seq("band", "band_key")))
    val a = bandedB.select(col("__cl"), col("band"), col("band_key"),
      col("__rep").as("__repA"), col("__v").as("__va"), col("__n").as("__na"),
      col("__sig").as("__siga"))
    val b = bandedB.select(col("__cl"), col("band"), col("band_key"),
      col("__rep").as("__repB"), col("__v").as("__vb"), col("__n").as("__nb"),
      col("__sig").as("__sigb"))
    val classPairs = cached(a.join(b, Seq("__cl", "band", "band_key"))
      .filter(col("__repA") < col("__repB") &&
        firstCollision(col("__siga"), col("__sigb"), width, bands))
      .select(col("__repA"), col("__repB"),
        score(col("__va"), col("__na"), col("__vb"), col("__nb")).as("score"))
      .filter(col("score") >= threshold))
    val inClass = members
      .filter(col("__id") =!= col("__rep") && col("__self") >= threshold)
      .select(col("__id"))
    val crossB = classPairs
      .join(members.select(col("__rep").as("__repB"), col("__id")), Seq("__repB"))
      .select(col("__id"))
    val crossA = classPairs
      .join(members.select(col("__rep").as("__repA"), col("__id")), Seq("__repA"))
      .filter(col("__id") > col("__repB"))
      .select(col("__id"))
    // ---- corpus probe: batch classes vs indexed classes — HISTORY WINS
    // (any verified hit drops the WHOLE batch class, its min included)
    val bandedIdx = idxClasses
      .select(col("cluster").as("__cl"), col("vec").as("__iv"),
        l2Norm(col("vec")).as("__in"), col("sig").as("__isig"),
        bandKeys(col("sig")).as(Seq("band", "band_key")))
    val corpusHits = bandedB
      .join(bandedIdx, Seq("__cl", "band", "band_key"))
      .filter(firstCollision(col("__sig"), col("__isig"), width, bands))
      .select(col("__rep"),
        score(col("__v"), col("__n"), col("__iv"), col("__in")).as("score"))
      .filter(col("score") >= threshold)
      .select(col("__rep")).distinct()
    val corpusDrops = corpusHits
      .join(members.select(col("__rep"), col("__id")), Seq("__rep"))
      .select(col("__id"))
    val dropped = inClass.unionByName(crossB).unionByName(crossA)
      .unionByName(corpusDrops).distinct()
    batch.join(dropped.select(col("__id").as(idCol)), Seq(idCol), "left_anti")
  }

  /** SemDeDup-style semantic deduplication (the public SemDeDup recipe —
    * k-means cluster the embeddings, then near-dup only WITHIN each
    * cluster; see PAPERS.md): documents whose embeddings are
    * semantically redundant are pruned so the surviving corpus carries
    * more information per token.
    *
    * Clustering reuses the IVF centroid machinery ([[ivfCentroids]]:
    * deterministic lowest-hash seed + optional mini-batch Lloyd rounds;
    * assignment is the [[graft.functions.CentroidKernels]] reference-
    * object kernel — scan-stage, zero plan literals at any nlist·dim).
    * The DROP RULE is deterministic: a document is dropped iff SOME
    * smaller-id document in ITS OWN cluster has cosine ≥ `threshold`
    * against it — i.e. each within-cluster near-dup neighborhood keeps
    * exactly its min-id members (no iterative clustering pass; one
    * semi-join decides every row, and the verdict never depends on
    * whether the smaller neighbor itself survived).
    *
    * Within-cluster pair generation has the same two tiers as corpus
    * near-dup:
    *  - `exact = true`: per-cluster all-pairs (broadcast cross join) —
    *    the verification tier; fixture-bound use only.
    *  - `exact = false` (default): pigeonhole-banded hyperplane
    *    signatures SCOPED BY CLUSTER — candidates collide on
    *    (cluster, band, band_key), so candidate volume tracks in-cluster
    *    signature collisions, never cluster size². Identical embeddings
    *    always share cluster, signature, and every band, so true
    *    duplicate classes are found with recall 1; near-identical pairs
    *    follow the banded recall S-curve (see
    *    [[cosineNearDupPairsBanded]]). Defaults are the HIGH-threshold
    *    production regime (numBits 64, bands 8 → 256-way band keys):
    *    semantic dedup runs at τ ≥ 0.9, where per-bit agreement is high
    *    and wide bands keep recall ≈ 0.99 with real pruning — 2-bit
    *    band keys (the low-τ near-dup default) would put a quarter of
    *    each cluster in every bucket and go quadratic.
    *
    * The centroid collect and the two band-join sides each re-read the
    * input plan — persist (or `cache: true` in a config def) an
    * EXPENSIVE upstream before deduping it, or those stages recompute
    * it (the q173 flagship does exactly this).
    *
    * `output`: "keep" (default) = the surviving rows of `df`, original
    * schema; "labels" = (id, cluster, keep) for every row; "pairs" =
    * the within-cluster near-dup pair list (idA, idB, cluster, score).
    *
    * 100 TB posture: centroids are bounded metadata (nlist·dim doubles);
    * assignment is scan-stage; the only shuffles are the band-key join
    * and the final semi-join on id. Raise nlist with corpus size so
    * clusters stay bounded — the SemDeDup contract. */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      nlist: Int = 16,
      refineRounds: Int = 0,
      exact: Boolean = false,
      numBits: Int = 64,
      bands: Int = 8,
      output: String = "keep"
  ): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"semanticDedup: threshold must be in (0, 1], got $threshold")
    require(Seq("keep", "labels", "pairs").contains(output),
      s"semanticDedup: output must be keep|labels|pairs, got '$output'")
    val cents = ivfCentroids(df, idCol, vecCol, nlist, refineRounds)
    val assigned = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      element_at(graft.functions.CentroidKernels.nearestCentroids(
        col(vecCol), cents, 1), 1).as("__cl"))
    def score(va: Column, na: Column, vb: Column, nb: Column): Column =
      round(when(na > 0 && nb > 0, dot(va, vb) / (na * nb)).otherwise(lit(0.0)), 9)
    // (pairsFrame, droppedIds): the banded path computes drops from the
    // CLASS-collapsed representation and only reconstructs member pairs
    // when the caller asked for them.
    val (pairs, dropped) =
      if (exact) {
        val a = assigned.select(col("__cl"), col("__id").as("idA"),
          col("__v").as("__va"), l2Norm(col("__v")).as("__na"))
        val b = assigned.select(col("__cl"), col("__id").as("idB"),
          col("__v").as("__vb"), l2Norm(col("__v")).as("__nb"))
        val p = a.join(b, Seq("__cl")).filter(col("idA") < col("idB"))
          .select(col("idA"), col("idB"), col("__cl").as("cluster"),
            score(col("__va"), col("__na"), col("__vb"), col("__nb")).as("score"))
          .filter(col("score") >= threshold)
        (p, p.select(col("idB").as("__id")).distinct())
      } else {
        require(numBits % bands == 0, "bands must divide numBits")
        val width = numBits / bands
        // IDENTICAL embeddings are collapsed to classes BEFORE banding
        // (the hammingPairs theorem, applied to vectors): at web scale
        // the dominant duplicate shape is a massive identical-embedding
        // class (the same boilerplate doc embedded millions of times),
        // which banded naively collides with itself in EVERY band —
        // bands·m²/2 candidate rows from one bucket. Classes band once;
        // the drop rule factors exactly through class minima:
        //   x dropped ⟺ (x ≠ min of its class ∧ self-sim ≥ τ)
        //             ∨ (∃ neighbor class C' in x's cluster with
        //                sim ≥ τ ∧ min(C') < x).
        // Self-sim guards the null/zero-vector classes (their pair
        // score is 0 by definition, so they never drop each other).
        // classes/members/classPairs each feed several consumers below —
        // persisted (class-/id-/pair-shaped) so the assignment kernel and
        // the band join run once, not once per consumer (r21 opt).
        def cached(df0: DataFrame): DataFrame = {
          val c = df0.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          graft.compile.Compiler.trackOperatorCache(c); c
        }
        val classes = cached(assigned
          .groupBy(col("__cl"), col("__v")).agg(min(col("__id")).as("__rep"))
          .select(col("__cl"), col("__v"), col("__rep"),
            l2Norm(col("__v")).as("__n"),
            hyperplaneSignature(col("__v"), dim, numBits).as("__sig")))
        val selfScore = score(col("__v"), col("__n"), col("__v"), col("__n"))
        val members = cached(assigned
          .join(classes.select(col("__cl"), col("__v"), col("__rep"),
            selfScore.as("__self")), Seq("__cl", "__v"))
          .select(col("__id"), col("__cl"), col("__rep"), col("__self")))
        val banded = classes
          .select(col("__cl"), col("__rep"), col("__v"), col("__n"), col("__sig"),
            posexplode(array((0 until bands).map(c =>
              shiftright(col("__sig"), c * width)
                .bitwiseAND(lit((1L << width) - 1L))): _*)).as(Seq("band", "band_key")))
        val a = banded.select(col("__cl"), col("band"), col("band_key"),
          col("__rep").as("__repA"), col("__v").as("__va"), col("__n").as("__na"),
          col("__sig").as("__siga"))
        val b = banded.select(col("__cl"), col("band"), col("band_key"),
          col("__rep").as("__repB"), col("__v").as("__vb"), col("__n").as("__nb"),
          col("__sig").as("__sigb"))
        val classPairs = cached(a.join(b, Seq("__cl", "band", "band_key"))
          .filter(col("__repA") < col("__repB") &&
            firstCollision(col("__siga"), col("__sigb"), width, bands))
          .select(col("__cl"), col("__repA"), col("__repB"),
            score(col("__va"), col("__na"), col("__vb"), col("__nb")).as("score"))
          .filter(col("score") >= threshold))
        // drops: in-class non-minima; every member of the larger-rep
        // class of a verified pair; members of the smaller-rep class
        // beyond the other class's minimum
        val inClass = members
          .filter(col("__id") =!= col("__rep") && col("__self") >= threshold)
          .select(col("__id"))
        val crossB = classPairs
          .join(members.select(col("__rep").as("__repB"), col("__id")), Seq("__repB"))
          .select(col("__id"))
        val crossA = classPairs
          .join(members.select(col("__rep").as("__repA"), col("__id")), Seq("__repA"))
          .filter(col("__id") > col("__repB"))
          .select(col("__id"))
        val droppedIds = inClass.unionByName(crossB).unionByName(crossA).distinct()
        // member pairs, reconstructed output-proportionally (pairs mode
        // only — keep/labels never materialize in-class pair lists)
        lazy val memberPairs = {
          val inPairs = members.filter(col("__self") >= threshold).alias("x")
            .join(members.alias("y"),
              col("x.__rep") === col("y.__rep") && col("x.__id") < col("y.__id"))
            .select(col("x.__id").as("idA"), col("y.__id").as("idB"),
              col("x.__cl").as("cluster"), col("x.__self").as("score"))
          val crossPairs = classPairs
            .join(members.select(col("__rep").as("__repA"), col("__id").as("__ia")),
              Seq("__repA"))
            .join(members.select(col("__rep").as("__repB"), col("__id").as("__ib")),
              Seq("__repB"))
            .select(least(col("__ia"), col("__ib")).as("idA"),
              greatest(col("__ia"), col("__ib")).as("idB"),
              col("__cl").as("cluster"), col("score"))
          inPairs.unionByName(crossPairs)
        }
        (if (output == "pairs") memberPairs else null, droppedIds)
      }
    output match {
      case "pairs" => pairs
      case "labels" =>
        assigned
          .join(dropped.select(col("__id"), lit(false).as("__drop")),
            Seq("__id"), "left")
          .select(col("__id").as(idCol), col("__cl").as("cluster"),
            coalesce(col("__drop"), lit(true)).as("keep"))
      case _ =>
        df.join(dropped.select(col("__id").as(idCol)), Seq(idCol), "left_anti")
    }
  }
}
