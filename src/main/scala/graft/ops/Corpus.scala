package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for LLM training-data pipelines (north-star
  * scope beyond the reference): document chunking, training-sequence
  * packing, and train/eval decontamination. All three are the scale-safe
  * shape — pure plan composition, no driver-side state:
  *
  *   - chunking:        per-row array build + one generator (posexplode);
  *                      runs in the scan stage, no shuffle at all.
  *   - packing:         one window per SHARD (the parallelism unit) — the
  *                      global greedy pack is inherently sequential, so the
  *                      scalable formulation shards first and packs within
  *                      shards independently.
  *   - decontamination: shingle semi-join against the eval pool — the eval
  *                      side is benchmark-sized by nature, so its distinct
  *                      shingle set broadcasts; the train corpus is never
  *                      shuffled, only scanned.
  */
object Corpus {

  /** Split each document into token chunks of `chunkSize` with `overlap`
    * tokens shared between consecutive chunks (stride = chunkSize −
    * overlap) — the standard context-window prep for embedding/training
    * pipelines. Chunk k covers tokens [k·stride, k·stride + chunkSize);
    * the number of chunks is ⌈(n − overlap) / stride⌉ (min 1), so the
    * final chunk may be short but every token lands in ≥ 1 chunk and no
    * chunk is fully contained in its predecessor. Empty documents produce
    * zero chunks.
    *
    * Output: (idCol, chunk_id, chunk_text, n_tokens). Scale: the chunk
    * array is built per-row inside whole-stage codegen and exploded by a
    * generator — no shuffle; output size ≈ input tokens × (1 + overlap /
    * stride).
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int
  ): DataFrame = {
    val chunks = TextAnalysis.withTokens(col(textCol)) { toks =>
      slidingChunks(toks, chunkSize, overlap)
    }
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "__ct")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", col("__ct")).as("chunk_text"),
        size(col("__ct")).as("n_tokens"))
  }

  /** [[chunkByTokens]] over an ALREADY-TOKENIZED id array (the
    * `bpe_apply with_ids` output) — same window rule, but the chunks stay
    * token-id arrays instead of re-joined text: the context-window prep
    * for pipelines whose unit is model tokens, and the no-truncation
    * companion to whole-document sequence packing (chunk first, then
    * `sequence_pack mode:"whole"` — a doc longer than one window arrives
    * pre-split instead of truncated).
    *
    * Output: (idCol, chunk_id, chunk_ids, n_tokens). Same scale shape as
    * [[chunkByTokens]]: per-row array build + one generator, no shuffle.
    * Compose a derived chunk key downstream when a later op needs one id
    * per row (e.g. `derive: {"cid": "id * 1000000 + chunk_id"}`). */
  def chunkIds(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      chunkSize: Int,
      overlap: Int
  ): DataFrame = {
    val chunks = slidingChunks(col(idsCol), chunkSize, overlap)
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "__ct")))
      .select(col(idCol), col("chunk_id"),
        col("__ct").as("chunk_ids"),
        size(col("__ct")).as("n_tokens"))
  }

  /** STRUCTURE-AWARE chunking — the RAG/embedding-prep recipe proper:
    * documents split into `sep`-separated SEGMENTS (paragraphs with the
    * "\n\n" default), and consecutive segments pack greedily into chunks
    * of at most `size` tokens. A segment never splits across chunks; a
    * single segment longer than `size` becomes its own (oversized) chunk
    * — compose [[chunkByTokens]] downstream to hard-split those.
    * Whitespace-only segments drop (they carry no tokens; the joined
    * chunk text re-separates surviving segments with `sep`).
    *
    * Greedy rule (next-fit, the splitter standard): a segment joins the
    * open chunk unless that would push its token total past `size`, in
    * which case the chunk closes and the segment opens the next one.
    *
    * Output: (idCol, chunk_id, chunk_text, n_tokens, n_segments) —
    * `n_tokens` is the exact token sum of the chunk's segments (NOT
    * recomputed from the joined text: a non-whitespace `sep` could merge
    * boundary tokens). Scale: the fold, the zip, and the explode all run
    * per-row inside the scan stage — no shuffle, streaming-admissible,
    * same posture as [[chunkByTokens]]. */
  def chunkBySegments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      size: Int,
      sep: String = "\n\n"
  ): DataFrame = {
    require(size >= 1, s"need size >= 1, got $size")
    require(sep.nonEmpty, "sep must be non-empty")
    import TextAnalysis.{tokens, withBound}
    val sepQ = java.util.regex.Pattern.quote(sep)
    // tokenize each raw segment ONCE: pair (segment, token count), then
    // drop empties — the count drives both the empty filter and the fold
    val chunks =
      withBound(filter(
        transform(split(col(textCol), sepQ), s =>
          struct(s.as("s"),
            org.apache.spark.sql.functions.size(tokens(s)).as("c"))),
        p => p.getField("c") > 0)) { pairs =>
      withBound(transform(pairs, p => p.getField("s"))) { segs =>
      withBound(transform(pairs, p => p.getField("c"))) { counts =>
        // greedy next-fit fold over segment token counts: acc carries the
        // open chunk index, its fill, and one chunk index per seen segment
        val zero = struct(lit(-1).as("last"), lit(0).as("fill"),
          array().cast("array<int>").as("idxs"))
        val folded = aggregate(counts, zero, (acc, c) => {
          val last = acc.getField("last")
          val fill = acc.getField("fill")
          val idxs = acc.getField("idxs")
          when(last < 0,
            struct(lit(0).as("last"), c.as("fill"),
              array(lit(0)).as("idxs")))
          .when(fill + c > size,
            struct((last + 1).as("last"), c.as("fill"),
              concat(idxs, array(last + 1)).as("idxs")))
          .otherwise(
            struct(last.as("last"), (fill + c).as("fill"),
              concat(idxs, array(last)).as("idxs")))
        })
        withBound(folded.getField("idxs")) { idxs =>
          val n = org.apache.spark.sql.functions.size(idxs)
          val nChunks = when(n > 0, element_at(idxs, -1) + 1).otherwise(lit(0))
          when(nChunks > 0,
            transform(sequence(lit(0), nChunks - 1), k => struct(
              array_join(
                transform(
                  filter(zip_with(segs, idxs,
                    (s, i) => struct(s.as("s"), i.as("i"))),
                    p => p.getField("i") === k),
                  p => p.getField("s")),
                sep).as("txt"),
              aggregate(zip_with(counts, idxs,
                  (c, i) => when(i === k, c).otherwise(lit(0))),
                lit(0), (a, x) => a + x).as("nt"),
              aggregate(transform(idxs,
                  i => when(i === k, 1).otherwise(lit(0))),
                lit(0), (a, x) => a + x).as("ns"))))
        }
      }
      }
    }
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "__cs")))
      .select(col(idCol), col("chunk_id"),
        col("__cs").getField("txt").as("chunk_text"),
        col("__cs").getField("nt").as("n_tokens"),
        col("__cs").getField("ns").as("n_segments"))
  }

  /** The shared window rule of [[chunkByTokens]] / [[chunkIds]]: chunk k
    * covers elements [k·stride, k·stride + chunkSize), stride = chunkSize
    * − overlap, ⌈(n − overlap) / stride⌉ chunks (min 1) — the final chunk
    * may be short but every element lands in ≥ 1 chunk and no chunk is
    * fully contained in its predecessor. NULL (not empty array) for empty
    * inputs: posexplode emits no rows for null, and the typed empty-array
    * literal is noisier than the null it's equivalent to under a
    * generator. */
  private def slidingChunks(arr: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val n = size(arr)
    val k = greatest(lit(1),
      ceil((n - lit(overlap)).cast("double") / lit(stride)).cast("int"))
    when(n > 0,
      transform(sequence(lit(0), k - 1), i => slice(arr, i * stride + 1, lit(chunkSize))))
  }

  /** Assign documents to fixed-budget training-sequence bins ("sequence
    * packing"): documents are sharded by id, ordered deterministically
    * within each shard, and laid end-to-end; a document starting at token
    * offset o goes to bin ⌊o / budget⌋ of its shard. A document longer
    * than the remaining budget starts in the bin its offset falls in and
    * overflows it — the streaming-pack semantics (bins are filled left to
    * right; no backtracking), which is the only formulation that needs ONE
    * window pass instead of a sequential global scan.
    *
    * Scale: the window partitions by shard — shards are the parallelism
    * unit. Packing is embarrassingly shardable (bins never span shards),
    * so at 100 TB you raise `numShards` until each shard's documents fit a
    * single task comfortably; the assignment stays deterministic because
    * shard and order derive from the id, not from partitioning.
    *
    * Output: input columns + (shard, start_off, bin).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCountCol: String,
      budget: Long,
      numShards: Int
  ): DataFrame = {
    require(budget > 0 && numShards > 0, "budget and numShards must be positive")
    val clash = df.columns.toSet.intersect(Set("shard", "start_off", "bin"))
    require(clash.isEmpty,
      s"packSequences outputs columns ${clash.mkString(", ")} which already " +
        "exist in the input — rename them first")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(col(idCol), lit(numShards)).cast("int"))
      .withColumn("start_off",
        coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("start_off") / lit(budget)).cast("int"))
  }

  /** Per-row UPSAMPLING — the other half of mixture rebalancing
    * (downsampling is [[temperatureSample]]/[[tokenBudgetSample]]): emit
    * `factorCol` copies of each row, tagged 0..factor−1 in `copyCol` —
    * the "repeat high-quality sources k epochs" recipe (e.g. wiki ×4,
    * books ×2, web ×1 in one mixed corpus). Factor 0 DROPS the row
    * (a mix can zero a source), factor 1 passes it through with copy 0.
    * Derive the factor upstream (a CASE over the source/lang column, or
    * a join of a weights table); the copy index is the deterministic
    * per-copy seed downstream shuffling/augmentation keys on (id, copy).
    *
    * Scan-stage generator (explode of a sequence literal) — ZERO
    * shuffles, streaming-admissible, and the output is factor-weighted
    * row counts exactly (no probabilistic rounding). Guards by name:
    * `factorCol` must be integral (a fractional repeat is ambiguous —
    * temperature-sample instead); NULL, negative, or > 2²⁰ factors
    * raise (a 10⁶+ repeat would quietly explode one row into a
    * partition-sized array — state the intent with a join, not a
    * factor). `copyCol` must not already exist. */
  def upsample(
      df: DataFrame,
      factorCol: String,
      copyCol: String = "copy"
  ): DataFrame = {
    require(!df.columns.contains(copyCol),
      s"upsample: copy column '$copyCol' already exists in the input")
    import org.apache.spark.sql.types._
    df.schema(factorCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"upsample: factor column '$factorCol' has type ${t.simpleString}; " +
          "repeat factors must be integral (for fractional rates use " +
          "temperature_sample / token_budget_sample)")
    }
    val maxFactor = 1L << 20
    val f = when(col(factorCol).isNotNull && col(factorCol) >= 0 &&
        col(factorCol) <= maxFactor, col(factorCol).cast("long"))
      .otherwise(raise_error(lit(
        s"upsample: factor in '$factorCol' is NULL, negative, or > 2^20 — " +
          "filter or impute first")))
    df.withColumn(copyCol, explode(
      when(f > 0, sequence(lit(0L), f - 1))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Stratified deterministic sample: keep (up to) `k` rows per stratum,
    * chosen by rank over a caller-supplied deterministic hash expression —
    * the corpus-curation primitive for balancing a training mix across
    * languages/sources without a global shuffle-and-count pass. Unlike
    * fraction-based sampling, the quota is exact per stratum; unlike
    * rand(), the hash rank is reproducible across runs, retries, and
    * repartitioning (pass e.g. a Knuth multiplicative hash of the id for
    * cross-engine verifiability, or xxhash64 for better mixing).
    *
    * `tiebreak` must make the order total within a stratum (a unique id).
    * Cost: ONE shuffle on `strata`; rank + `rn <= k` plans
    * WindowGroupLimit, so map tasks forward at most k candidate rows per
    * stratum each — the shuffle is quota-shaped at the margin, never
    * corpus-shaped. */
  def stratifiedSample(
      df: DataFrame,
      strata: Seq[String],
      k: Int,
      hashRank: Column,
      tiebreak: Seq[Column]
  ): DataFrame = {
    require(k > 0, s"sample quota must be positive, got $k")
    Relational.topKPerGroup(
      df, strata, hashRank.asc +: tiebreak, k, rankCol = "__ss_rn")
      .drop("__ss_rn")
  }

  /** Per-training-document overlap with an evaluation pool: the number of
    * distinct `shingleSize`-gram shingles of the train doc that appear
    * ANYWHERE in `holdout` — the standard contamination signal for
    * benchmark decontamination. Join is on 64-bit shingle hashes (cheap
    * keys; collisions need ~2^32 distinct shingles to matter).
    *
    * Scale: the eval pool is benchmark-sized by nature (thousands of docs,
    * not billions), so its distinct shingle-hash set is broadcast — the
    * train side is scanned, exploded, and hash-joined map-side with NO
    * shuffle of the corpus; the aggregate back to one row per train doc is
    * partial+final. Docs with zero overlap are absent from the output
    * (semi-join shape).
    *
    * Output: (idCol, n_common).
    */
  def contaminationReport(
      train: DataFrame,
      holdout: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int
  ): DataFrame = {
    val trainSh = train.select(col(idCol),
      explode(Dedup.hashedNgrams(col(textCol), shingleSize)).as("__shingle"))
    val evalSh = holdout
      .select(explode(Dedup.hashedNgrams(col(textCol), shingleSize)).as("__shingle"))
      .distinct()
    trainSh.join(broadcast(evalSh), Seq("__shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_common"))
  }

  /** Bloom-filter variant of [[decontaminate]] for when the eval pool's
    * distinct shingle set outgrows an exact broadcast (10⁹ shingles ≈
    * 8 GB of longs exactly vs ~1.2 GB as a 1%-fpp Bloom filter): the
    * filter is built in one aggregation (`DataFrameStatFunctions
    * .bloomFilter` — driver holds only the bit array, same bounded-
    * metadata trust model as IVF centroids), broadcast once, and each
    * train doc counts its shingle hits in the scan stage — the train
    * corpus is never shuffled at all, not even the explode of
    * [[contaminationReport]]'s semi-join.
    *
    * Semantics are CONSERVATIVE versus the exact operator: false
    * positives can only ADD to a doc's overlap count, so every doc the
    * exact `decontaminate` drops is dropped here too (no contamination
    * ever slips through — asserted in OpsSpec); the price is an
    * `fpp`-bounded sliver of clean docs dropped with it, the right
    * direction to err for benchmark hygiene. */
  def decontaminateBloom(
      train: DataFrame,
      holdout: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      minOverlap: Long,
      expectedShingles: Long = 1L << 22,
      fpp: Double = 0.01
  ): DataFrame = {
    val bloom = holdout
      .select(explode(Dedup.hashedNgrams(col(textCol), shingleSize)).as("__s"))
      .stat.bloomFilter("__s", expectedShingles, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bloom)
    val hits = udf((shingles: Seq[Long]) =>
      if (shingles == null) 0L
      else shingles.count(bc.value.mightContainLong).toLong)
    train.filter(
      hits(Dedup.hashedNgrams(col(textCol), shingleSize)) < minOverlap)
  }

  /** Remove contaminated documents: drops every train doc sharing ≥
    * `minOverlap` distinct shingles with the eval pool (left-anti join on
    * the [[contaminationReport]] ids — candidates-shaped, never
    * corpus-shaped). */
  def decontaminate(
      train: DataFrame,
      holdout: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      minOverlap: Long
  ): DataFrame = {
    val bad = contaminationReport(train, holdout, idCol, textCol, shingleSize)
      .filter(col("n_common") >= minOverlap)
      .select(idCol)
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** Boilerplate line removal (the CCNet / RefinedWeb curation step):
    * split each document into lines, drop every line that occurs in more
    * than `maxDocs` DISTINCT documents (navigation chrome, cookie
    * banners, per-site footers), and reassemble the surviving lines in
    * their original order.
    *
    * Scale shape: two shuffles, both bounded. (1) The line-frequency
    * aggregate is a partial+final count-distinct whose group key is the
    * 64-bit line hash when `byHash` (8 bytes shuffled per distinct line
    * per partition, never the line text); (2) the reassembly groups by
    * document id. The hot set itself is broadcast: a line must occur in
    * > `maxDocs` documents to enter it, so it holds at most
    * total_lines / maxDocs entries by construction — the knob that makes
    * it broadcastable is the same knob that defines boilerplate. The
    * drop itself is a broadcast left join, i.e. scan-stage on the corpus.
    *
    * `byHash = true` keys the frequency count and the hot-set join on
    * `xxhash64(line)` instead of the line text (the production setting —
    * a 64-bit collision mislabeling a rare line as boilerplate is
    * vanishingly unlikely and the penalty is one dropped line);
    * `byHash = false` is the exact twin for oracle comparison.
    *
    * Documents with null text produce no lines and drop out (a null list
    * explodes to nothing in both Spark and DuckDB); a document whose
    * every line is boilerplate survives with `clean_text = ""`.
    *
    * Output: (idCol, clean_text, kept_lines, dropped_lines).
    */
  def removeBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocs: Long,
      sep: String = "\n",
      byHash: Boolean = true
  ): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val reserved = Seq("__ln", "__line", "__k", "__hot")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input already has a $c column"))
    val lines = df.select(
      col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__ln", "__line")))
      .withColumn("__k", if (byHash) xxhash64(col("__line")) else col("__line"))
    val hot = lines
      .groupBy("__k")
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > maxDocs)
      .select(col("__k"), lit(true).as("__hot"))
    lines
      .join(broadcast(hot), Seq("__k"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__hot").isNull, struct(col("__ln"), col("__line"))))),
            x => x.getField("__line")),
          sep).as("clean_text"),
        count(when(col("__hot").isNull, lit(1))).as("kept_lines"),
        count(when(col("__hot").isNotNull, lit(1))).as("dropped_lines"))
  }

  /** Deterministic train/val/test split: each row lands in exactly one
    * named bucket by a portable multiplicative hash of its id (q61's
    * spelling — plain BIGINT arithmetic both engines compute identically,
    * so the assignment is oracle-checkable), with bucket widths
    * proportional to `weights`. Reproducible across runs/retries/
    * repartitioning and STABLE UNDER CORPUS GROWTH — a doc's bucket never
    * changes when other docs are added or removed, which is the property
    * that keeps eval sets fixed while the training corpus evolves
    * (a rand()-based randomSplit loses both). Scan-stage, zero shuffles.
    *
    * Id handling — assignment correctness is this operator's whole
    * purpose, so no silent path exists:
    *  - integral ids hash as `pmod(pmod(id, 1e6) * 2654435761, 1e6)`.
    *    Reducing BEFORE the multiply keeps every intermediate below
    *    2.65e15 — the result equals the mathematical (id*K) mod 1e6 for
    *    ALL longs (an unreduced wrapping i64 multiply does not, and the
    *    unreduced form overflows engines with checked arithmetic, e.g.
    *    DuckDB BIGINT, for |id| ≳ 3.5e9), and negative ids land
    *    identically under pmod in both engines.
    *  - string ids (UUIDs, URLs — the common doc-id shape) route through
    *    the portable fingerprint kernel first: still engine-portable
    *    arithmetic, so string-keyed splits stay exactly oracle-checkable
    *    (q114). A plain cast would yield NULL and mis-bucket every row.
    *  - any other id type is rejected at plan time, and a NULL id fails
    *    the job loudly rather than defaulting to a bucket.
    *
    * Weights are normalized; bucket boundaries are cumulative fractions
    * of the 1e6-wide hash space, assigned in the given order. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)],
      splitCol: String = "split"
  ): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    val total = weights.map(_._2).sum
    val bounds = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * HashSpace)
    }.tail.dropRight(1) :+ HashSpace // last bucket absorbs rounding differences
    val checked = stableIdHash(df, idCol, "hashSplit", SplitMultiplier)
    val assign = weights.map(_._1).zip(bounds).foldRight(lit(weights.last._1)) {
      case ((name, bound), rest) => when(checked < bound, lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, assign)
  }

  private val HashSpace = 1000000L
  // Knuth's multiplicative constant (2^32/φ) for splits, the Java LCG
  // multiplier for sampling: two public constants, two independent hash
  // families. Sharing one would correlate the operators — a temperature
  // sample keeps h < k, and under the SAME hash those rows all fall in
  // the lowest split buckets, so sample∘split would send every sampled
  // row to "train" and starve val/test.
  private val SplitMultiplier = 2654435761L
  private val SampleMultiplier = 25214903917L
  // token_budget_sample's ORDER hash: a third public LCG constant (the
  // POSIX/glibc rand multiplier) so budget-prefix order is independent of
  // both the split buckets and the temperature-sample threshold — a
  // budget sample takes a PREFIX in its hash order, and under a shared
  // hash that prefix would be exactly the survivors of an upstream
  // h < k sample, collapsing the two operators' randomness into one.
  private val BudgetMultiplier = 1103515245L
  // globalShuffle's hash space: fine-grained (1e9+7 vs the split ops'
  // 1e6 buckets) so position ties are rare, and small enough that
  // (P-1)·SplitMultiplier stays inside checked BIGINT in both engines
  private val ShufflePrime = 1000000007L

  /** Engine-portable per-row hash of a stable id column in
    * [0, HashSpace): integral ids reduce-BEFORE-multiply (the overflow-
    * proof q109 spelling — equal to the mathematical (id·K) mod 1e6 over
    * the full long range), string ids route through the portable
    * fingerprint kernel, any other type is rejected at plan time, and a
    * NULL id fails the job loudly rather than taking a silent default. */
  private def stableIdHash(
      df: DataFrame, idCol: String, opName: String, multiplier: Long): Column = {
    import org.apache.spark.sql.types._
    val base: Column = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(idCol).cast("long")
      case StringType =>
        graft.functions.TextKernels.portableFingerprint(col(idCol))
      case t => throw new IllegalArgumentException(
        s"$opName: id column '$idCol' has type ${t.simpleString}; " +
          "only integral and string ids hash deterministically — cast or " +
          "derive a stable id first")
    }
    val h = pmod(pmod(base, lit(HashSpace)) * lit(multiplier), lit(HashSpace))
    when(col(idCol).isNotNull, h).otherwise(raise_error(
      lit(s"$opName: NULL id in column '$idCol' — every row needs a " +
        "stable id for deterministic bucket assignment")))
  }

  /** Deterministic global shuffle + sharding — the training-output pass:
    * a corpus fed to an LLM trainer must be read in an order decorrelated
    * from its storage layout (crawl order, source grouping), reproducibly
    * (re-runs, spot retries, and resumptions must see THE SAME order),
    * and in shards a loader can stream independently. `rand()`-based
    * shuffles lose all three.
    *
    * Each row gets `h = ((id mod P) · A + seed) mod P` over the portable
    * space P = 1e9+7 (A = 2654435761, the Knuth multiplier the split/
    * sample ops use; string ids route through the portable fingerprint
    * kernel first, NULL ids fail loudly, other types are rejected at
    * plan time — [[hashSplit]]'s contract). Then `shard = h mod shards`
    * and `shuffle_pos` = the row's rank within its shard (h asc, id
    * tiebreak). Every term is plain BIGINT arithmetic both engines
    * compute identically, so the full (shard, position) assignment is
    * exactly oracle-checkable — and STABLE UNDER RETRY: nothing depends
    * on partitioning, task order, or time. Different `seed`s give
    * independent permutations (epoch reshuffling).
    *
    * Scale: ONE shuffle — the per-shard window; h-collisions are broken
    * by id, so ordering is total. Size `shards` so a shard's rows fit an
    * executor's sort spill budget (at 100 TB: thousands of shards, which
    * is also what the downstream loader wants); the deployment shape is
    * `.write.partitionBy(shardCol)` with files sorted by `shuffle_pos`. */
  def globalShuffle(
      df: DataFrame,
      idCol: String,
      shards: Int,
      seed: Long = 0L,
      shardCol: String = "shard",
      posCol: String = "shuffle_pos"
  ): DataFrame = {
    require(shards >= 1, s"globalShuffle: shards must be >= 1, got $shards")
    require(seed >= 0 && seed < ShufflePrime,
      s"globalShuffle: seed must be in [0, $ShufflePrime), got $seed")
    Seq(shardCol, posCol, "__gsh").foreach(c =>
      require(!df.columns.contains(c), s"input already has a $c column"))
    import org.apache.spark.sql.types._
    val base: Column = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(idCol).cast("long")
      case StringType =>
        graft.functions.TextKernels.portableFingerprint(col(idCol))
      case t => throw new IllegalArgumentException(
        s"globalShuffle: id column '$idCol' has type ${t.simpleString}; " +
          "only integral and string ids hash deterministically")
    }
    val p = lit(ShufflePrime)
    val h = pmod(pmod(base, p) * lit(SplitMultiplier) + lit(seed), p)
    val hh = when(col(idCol).isNotNull, h).otherwise(raise_error(
      lit(s"globalShuffle: NULL id in column '$idCol' — every row needs " +
        "a stable id for a deterministic position")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol))
      .orderBy(col("__gsh").asc, col(idCol).asc)
    df.withColumn("__gsh", hh)
      .withColumn(shardCol, pmod(col("__gsh"), lit(shards.toLong)).cast("int"))
      .withColumn(posCol, row_number().over(w).cast("long"))
      .drop("__gsh")
  }

  /** Temperature-based mixture resampling — the multilingual-corpus
    * data-mixing pass (the p_l^α schedule of the mT5/XLM-R line of work):
    * resample so group l's share of the output follows its natural share
    * p_l raised to `alpha` and renormalized, with the output sized to
    * `targetFraction` of the input. alpha = 1 is a plain proportional
    * sample; alpha < 1 flattens the mixture, raising tail groups
    * (low-resource languages, rare sources) that a proportional sample
    * would starve; the per-group rate caps at 1.0 — no replacement, a
    * group is never oversampled past its population.
    *
    * Selection is deterministic: row kept iff
    * `hash(id) < floor(rate_g · 1e6)` under the portable multiplicative
    * hash — reproducible across runs/retries/repartitioning, and
    * MONOTONE in `targetFraction` (a 20% sample is an exact subset of a
    * 40% sample with the same alpha: the reproducible scaling-law-subset
    * property). The sampling hash uses a different public multiplicative
    * constant than [[hashSplit]], so sample∘split compositions stay
    * unbiased (see [[SampleMultiplier]]).
    *
    * Rates are computed driver-side from one count aggregate: the
    * collected list is mixture-dimension metadata (languages, sources —
    * the bounded-metadata precedent of the IVF centroid collect), and the
    * driver folds the p^α normalizer SEQUENTIALLY over groups in
    * deterministic key order (strings by UTF-8 bytes, integrals
    * numerically), which makes the double accumulation retry-stable and
    * exactly mirrorable by an oracle engine's ORDER BY — a distributed
    * double sum would make the rates run-dependent in the last ulp.
    * alpha = 0.5 and 1.0 use `sqrt`/identity (correctly rounded per
    * IEEE-754, hence bit-identical across engines — the oracle-gated
    * endpoints); other alphas go through `pow`, which libm does not
    * guarantee to the last ulp.
    *
    * Scale: one partial+final count aggregate (bytes ∝ #groups), a
    * broadcast join of #groups micro-rates, then a scan-stage integer
    * threshold — the corpus itself never shuffles. Needs an action for
    * the counts, so batch-only. NULL group keys are rejected loudly (the
    * inner join would otherwise drop those rows silently); group-key
    * types beyond string/integral are rejected at plan time because
    * their sort order is not engine-portable.
    */
  def temperatureSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      targetFraction: Double,
      alpha: Double = 0.5
  ): DataFrame = {
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"temperatureSample: target_fraction must be in (0, 1], got $targetFraction")
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureSample: alpha must be in (0, 1] (1 = proportional, " +
        s"smaller = flatter mixture), got $alpha")
    import org.apache.spark.sql.types._
    val groupType = df.schema(groupCol).dataType
    val rows = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__ts_n")).collect()
    if (rows.exists(_.isNullAt(0))) throw new IllegalArgumentException(
      s"temperatureSample: NULL group in column '$groupCol' — rows without " +
        "a mixture group would be dropped silently; filter or impute first")
    def utf8Less(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        if ((x(i) & 0xff) != (y(i) & 0xff)) return (x(i) & 0xff) < (y(i) & 0xff)
        i += 1
      }
      x.length < y.length
    }
    val counts: Seq[(Any, Long)] = groupType match {
      case StringType =>
        rows.map(r => (r.getString(0), r.getLong(1))).toSeq
          .sortWith((a, b) => utf8Less(a._1, b._1))
      case ByteType | ShortType | IntegerType | LongType =>
        rows.map(r => (r.get(0), r.getLong(1))).toSeq
          .sortBy { case (k, _) => k.asInstanceOf[Number].longValue() }
      case t => throw new IllegalArgumentException(
        s"temperatureSample: group column '$groupCol' has type " +
          s"${t.simpleString}; only string and integral group keys order " +
          "deterministically across engines")
    }
    def powA(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble)
      else if (alpha == 1.0) n.toDouble
      else math.pow(n.toDouble, alpha)
    val nTotal = counts.map(_._2).sum
    var s = 0.0
    counts.foreach { case (_, n) => s += powA(n) } // sequential, sorted order
    val budget = math.floor(targetFraction * nTotal).toLong
    val micro = counts.map { case (k, n) =>
      val r = math.min(1.0, budget.toDouble * (powA(n) / s) / n.toDouble)
      org.apache.spark.sql.Row(k, math.floor(r * HashSpace).toLong)
    }
    val spark = df.sparkSession
    val rates = spark.createDataFrame(
      spark.sparkContext.parallelize(micro, 1),
      StructType(Seq(
        df.schema(groupCol).copy(nullable = false),
        StructField("__ts_k", LongType, nullable = false))))
    val h = stableIdHash(df, idCol, "temperatureSample", SampleMultiplier)
    df.join(broadcast(rates), Seq(groupCol), "inner")
      .filter(h < col("__ts_k"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Token-budget mixture sampling — the data-mixing last mile (the
    * DoReMi/mT5 recipe's deployment step, cf. PAPERS.md): given a per-
    * domain TOKEN budget, keep documents per group in deterministic
    * pseudo-random order until the group's budget fills. Where
    * [[temperatureSample]] targets a document FRACTION, training mixtures
    * are specified in tokens — "50 B tokens of web, 5 B of code" — and a
    * doc-fraction sample hits a token target only if doc lengths are
    * equal across groups, which they never are.
    *
    * Contract (the oracle semantics): within each group, order docs by
    * `(h, id)` ascending — `h` the engine-portable budget-family hash of
    * the id (its own public LCG constant, see [[BudgetMultiplier]]) — and
    * keep each doc whose EXCLUSIVE running token sum `C` satisfies the
    * policy: `overshoot = true` (default) keeps while `C < budget` (the
    * boundary-crossing doc is kept, so a non-empty group reaches ≥ its
    * budget — a trainer wants the budget FILLED); `overshoot = false`
    * keeps while `C + tokens <= budget` (never exceed; `C` still counts
    * the blocked boundary doc, so the kept set is a prefix either way —
    * monotone, no knapsack re-entry). Groups absent from `budgets` are
    * dropped (a mixture spec is exhaustive by definition); budget 0 is an
    * explicit drop. The kept set is a pure function of (ids, token
    * counts, budgets) — retry- and engine-stable.
    *
    * `budgets` keys match `groupCol` CAST TO STRING (JSON object keys are
    * strings; integral groups match their decimal spelling).
    * Alternatively derive budgets from mixture `weights` via
    * [[budgetsFromWeights]].
    *
    * `orderCol` switches the selection order from the sampling hash to a
    * SCORE column — "the top-scoring docs per domain until the budget
    * fills", the quality-first mixture recipe: within each group docs
    * order by (`orderCol` desc — or asc with `descending = false` — then
    * id), same prefix rule. The score must be numeric; NULL and NaN
    * scores fail loudly (NaN orders inconsistently across engines). The
    * scale path quantizes the score into 64 quantile-sketch-derived
    * range buckets — the bucketing is an internal split and CANNOT
    * change the kept set (the boundary bucket is always resolved by the
    * exact window); a degenerate all-one-score group degrades to a
    * whole-group window, correct but serial.
    *
    * Scale (the [[dsirResampleThreshold]] posture — never a whole-group
    * window): one (group × 1024-bucket) token-sum aggregate — bounded
    * metadata, the [[temperatureSample]] collect precedent — locates each
    * group's BOUNDARY bucket driver-side with exact integer prefix sums;
    * buckets below it keep by a scan-stage broadcast-join filter, buckets
    * above drop, and only the boundary bucket (~1/1024 of the group)
    * pays a window cumsum. The corpus never shuffles; a 30 TB group
    * costs one aggregate plus a window over ~30 GB. Needs an action for
    * the bucket sums, so batch-only. NULL groups, NULL/non-positive
    * token counts, and non-integral token columns are rejected loudly.
    */
  def tokenBudgetSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      budgets: Seq[(String, Long)],
      overshoot: Boolean = true,
      orderCol: Option[String] = None,
      descending: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.types._
    require(budgets.nonEmpty, "tokenBudgetSample: budgets must be non-empty")
    require(budgets.map(_._1).distinct.size == budgets.size,
      "tokenBudgetSample: duplicate group key in budgets")
    budgets.foreach { case (g, b) => require(b >= 0,
      s"tokenBudgetSample: budget for group '$g' must be >= 0, got $b") }
    df.schema(tokensCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"tokenBudgetSample: token column '$tokensCol' has type " +
          s"${t.simpleString}; budgets are exact integer arithmetic — " +
          "count tokens upstream (token_count / with_columns) first")
    }
    // the selection ORDER: score (desc by default) with id tiebreak, or
    // the budget-family hash — plus an order-monotone integer bucket for
    // the scan-stage/boundary split. ANY monotone bucketing yields the
    // same kept set (the boundary bucket is resolved by the exact
    // window); the bucketing only sizes that window.
    val (orderKeys, bucket): (Seq[Column], Column) = orderCol match {
      case None =>
        val nBuckets = 1024
        val bucketWidth = (HashSpace + nBuckets - 1) / nBuckets
        val h = stableIdHash(df, idCol, "tokenBudgetSample", BudgetMultiplier)
        (Seq(col("__tb_k").asc, col(idCol).asc),
          ((h - pmod(h, lit(bucketWidth))) / lit(bucketWidth)).cast("int"))
      case Some(oc) =>
        df.schema(oc).dataType match {
          case ByteType | ShortType | IntegerType | LongType |
               FloatType | DoubleType => ()
          case t => throw new IllegalArgumentException(
            s"tokenBudgetSample: order column '$oc' has type " +
              s"${t.simpleString}; the selection order needs a numeric " +
              "score")
        }
        // 63 sketch quantiles → 64 order-monotone range buckets; equal
        // scores land in one bucket (the bucket is a function of the
        // value), so the id tiebreak always resolves inside the window
        val probs = (1 to 63).map(_ / 64.0).toArray
        val bounds = df.select(col(oc).cast("double").as("__o"))
          .stat.approxQuantile("__o", probs, 1e-3).distinct.sorted
        val b =
          if (bounds.isEmpty) lit(0)
          else {
            val arr = array(bounds.toIndexedSeq.map(x => lit(x)): _*)
            if (descending) size(filter(arr, x => x > col("__tb_k")))
            else size(filter(arr, x => x < col("__tb_k")))
          }
        val ord = if (descending) col("__tb_k").desc else col("__tb_k").asc
        (Seq(ord, col(idCol).asc), b)
    }
    // the per-row selection key feeding both the bucket and the window:
    // hash order → the budget-family hash; score order → the validated
    // score (NULL/NaN fail loudly — they order inconsistently across
    // engines)
    val key: Column = orderCol match {
      case None => stableIdHash(df, idCol, "tokenBudgetSample",
        BudgetMultiplier).cast("double")
      case Some(oc) =>
        when(col(oc).isNotNull && !isnan(col(oc).cast("double")),
          col(oc).cast("double")).otherwise(raise_error(
          lit(s"tokenBudgetSample: NULL or NaN score in '$oc' — filter " +
            "or impute first")))
    }
    val toks = when(col(tokensCol).isNotNull && col(tokensCol) >= 1,
      col(tokensCol).cast("long")).otherwise(raise_error(
      lit(s"tokenBudgetSample: NULL or non-positive token count in " +
        s"'$tokensCol' — a doc without tokens has no budget cost; filter " +
        "or impute first")))
    val keyed = df
      .withColumn("__tb_g", col(groupCol).cast("string"))
      .withColumn("__tb_k", key)
      .withColumn("__tb_b", bucket)
      .withColumn("__tb_t", toks)
    // bounded metadata BY CONSTRUCTION: only the budgeted groups (plus
    // any NULL group, kept so it still fails loudly below) feed the
    // bucket-sum collect — ≤ (budgets.size + 1) × 1024 rows no matter
    // what cardinality `groupCol` turns out to have. Unbudgeted groups
    // were always discarded by the cuts join anyway; without this filter
    // an accidental doc-level group_col turned the collect into an
    // unbounded driver transfer instead of a no-op (r15 advice).
    val budgetedOrNull =
      col("__tb_g").isNull ||
        col("__tb_g").isin(budgets.map(_._1): _*)
    val stats = keyed.filter(budgetedOrNull).groupBy("__tb_g", "__tb_b")
      .agg(sum("__tb_t").as("__tb_s")).collect()
    if (stats.exists(_.isNullAt(0))) throw new IllegalArgumentException(
      s"tokenBudgetSample: NULL group in column '$groupCol' — rows " +
        "without a mixture group would be dropped silently; filter or " +
        "impute first")
    val byGroup = stats.map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    // per budgeted group: the boundary bucket (first whose inclusive
    // prefix reaches the budget) and the exact token prefix before it
    val cuts = budgets.flatMap { case (g, budget) =>
      byGroup.get(g).map { rows =>
        val sums = rows.map(r => (r._2, r._3)).sortBy(_._1)
        var pre = 0L
        var bstar = Int.MaxValue // sentinel: budget never reached → keep all
        var i = 0
        while (i < sums.length && bstar == Int.MaxValue) {
          if (pre + sums(i)._2 >= budget) bstar = sums(i)._1
          else { pre += sums(i)._2; i += 1 }
        }
        org.apache.spark.sql.Row(g, bstar, pre, budget)
      }
    }
    val spark = df.sparkSession
    val cutsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cuts, 1),
      StructType(Seq(
        StructField("__tb_g", StringType, nullable = false),
        StructField("__tb_bstar", IntegerType, nullable = false),
        StructField("__tb_pre", LongType, nullable = false),
        StructField("__tb_budget", LongType, nullable = false))))
    val joined = keyed.join(broadcast(cutsDf), Seq("__tb_g"), "inner")
    val out = df.columns.map(col).toIndexedSeq
    // below the boundary bucket: scan-stage keep, no shuffle
    val below = joined.filter(col("__tb_b") < col("__tb_bstar")).select(out: _*)
    // the boundary bucket (a 1/64..1/1024 slice of its group): exact
    // window resolve in the selection order
    val w = Window.partitionBy(col("__tb_g"))
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = col("__tb_pre") + coalesce(sum(col("__tb_t")).over(w), lit(0L))
    val rule = if (overshoot) c < col("__tb_budget")
               else c + col("__tb_t") <= col("__tb_budget")
    val boundary = joined.filter(col("__tb_b") === col("__tb_bstar"))
      .withColumn("__tb_keep", rule).filter(col("__tb_keep")).select(out: _*)
    below.unionByName(boundary)
  }

  /** Derive [[tokenBudgetSample]] budgets from mixture WEIGHTS — the
    * DoReMi artifact is a weight vector, not token counts: budget_g =
    * ⌊totalBudget · w_g / Σw⌋, the normalizer folded sequentially in the
    * given key order (deterministic, retry-stable — the
    * [[temperatureSample]] rate posture). */
  def budgetsFromWeights(
      weights: Seq[(String, Double)],
      totalBudget: Long
  ): Seq[(String, Long)] = {
    require(weights.nonEmpty, "budgetsFromWeights: weights must be non-empty")
    require(totalBudget >= 1,
      s"budgetsFromWeights: total_budget must be >= 1, got $totalBudget")
    weights.foreach { case (g, x) => require(x >= 0 && !x.isNaN,
      s"budgetsFromWeights: weight for group '$g' must be >= 0, got $x") }
    var s = 0.0
    weights.foreach { case (_, x) => s += x } // sequential, given order
    require(s > 0, "budgetsFromWeights: weights sum to 0")
    weights.map { case (g, x) =>
      (g, math.floor(totalBudget.toDouble * (x / s)).toLong)
    }
  }

  /** Corpus-LM perplexity scoring — the CCNet-style quality signal: train
    * a word-bigram language model on the corpus ITSELF (add-k smoothed)
    * and score every document by its mean negative log-probability under
    * that model. Repetitive/templated text scores low (predictable),
    * gibberish scores high; the middle band is the human-looking text a
    * curation pipeline keeps. Self-training means no external model
    * artifact — the operator is closed over its input, which is what
    * makes it exactly mirrorable in oracle SQL.
    *
    *   P(w2|w1) = (c(w1 w2) + k) / (c(w1·) + k·V)
    *
    * with c(w1·) the count of w1 as a bigram left-context and V the
    * corpus' distinct-unigram count. Per-occurrence log-probs round to
    * 6 dp BEFORE the decimal-exact sum (order-independent under shuffle
    * retries; ln is the only libm call and a 1-ulp divergence survives
    * the rounding only within ~1e-16 of a boundary). Documents with
    * fewer than two tokens have no bigrams and are absent — left-join
    * the result back when every doc needs a row.
    *
    * Output: (idCol, n_bigrams, nll); nll = −mean log P, rounded 6 dp.
    *
    * Docs with fewer than two tokens have no bigrams and cannot be
    * scored. Whether they should survive a downstream `nll` filter is a
    * POLICY choice, not an implementation detail, so it's explicit:
    * `keepUnscored = true` left-joins the scores back onto the input ids
    * — unscored docs come out with n_bigrams = 0 and nll = NULL (a
    * curation cascade can then route them deliberately); the default
    * `false` keeps the original drop-absent shape.
    *
    * Scale: two vocabulary-shaped aggregates (c12, c1), a scalar V, and
    * two equi-joins of the exploded bigram stream against the count
    * tables — shuffles ∝ corpus tokens, the op's inherent cost. At 100 TB
    * pre-bucket the vocab tables by their join key; the scalar V rides a
    * 1-row cross join. The keepUnscored join is id-keyed — batch-shaped,
    * no new skew surface.
    *
    * `smoothing = "kn"` swaps add-k for INTERPOLATED KNESER-NEY with
    * absolute discount `discount` (the KenLM/CCNet-production family —
    * what "LM quality filter" means in the published pipelines):
    *
    *   P(w2|w1) = (max(c12 − D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1·)
    *   Pcont(w2) = N1+(·w2) / |distinct bigram types|
    *
    * where N1+(w1·) counts w1's distinct continuations and N1+(·w2) the
    * distinct left-contexts of w2. KN's continuation probability fixes
    * add-k's best-known bias: a word that appears often but only in ONE
    * context ("Francisco") no longer looks as probable everywhere as a
    * word with many contexts. Self-scored bigrams are always seen, so
    * the interpolation term needs no unseen-mass special case. Same
    * aggregate shapes (two extra vocabulary-shaped distinct counts). */
  def lmPerplexity(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5,
      keepUnscored: Boolean = false,
      smoothing: String = "addk",
      discount: Double = 0.75
  ): DataFrame = {
    require(smoothing == "addk" || smoothing == "kn",
      s"""lmPerplexity: smoothing must be "addk" or "kn", got "$smoothing"""")
    require(discount > 0.0 && discount < 1.0,
      s"lmPerplexity: discount must be in (0, 1), got $discount")
    val toks = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
    val bigrams = toks.select(col(idCol),
      explode(when(size(col("__t")) >= 2,
          transform(sequence(lit(1), size(col("__t")) - 1),
            i => concat_ws(" ", slice(col("__t"), i, lit(2)))))
        .otherwise(array().cast("array<string>"))).as("__bg"))
    val c12Raw = bigrams.groupBy(col("__bg")).agg(count(lit(1)).as("__c12"))
    val perOcc: DataFrame = smoothing match {
      case "addk" =>
        // 4 corpus-scale passes (c12, c1, V, probe) — measured cheaper
        // than persisting the type table here (r21 ABBA A/B: the persist
        // cost the addk path ~0.15 s at sf0.1 for one saved pass; kn
        // below saves three passes and wins)
        val c1 = bigrams.groupBy(substring_index(col("__bg"), " ", 1).as("__w1"))
          .agg(count(lit(1)).as("__c1"))
        val v = toks.select(explode(col("__t")).as("__w"))
          .agg(count_distinct(col("__w")).as("__v"))
        bigrams
          .join(c12Raw, Seq("__bg"))
          .join(c1, substring_index(col("__bg"), " ", 1) === col("__w1"))
          .crossJoin(v)
          .select(col(idCol),
            round(log((col("__c12") + lit(k)) /
              (col("__c1") + lit(k) * col("__v"))), 6).as("__lp"))
      case "kn" =>
        // The TYPE table (one row per distinct bigram) is the whole KN
        // model: c1 and every continuation count derive from it, so it
        // is built ONCE over the corpus-scale bigram stream and
        // persisted (vocabulary-shaped — the collocations counts-table
        // posture). Without the persist each derived table's broadcast
        // build re-ran the full scan→tokenize→explode→aggregate
        // subtree: 6 corpus passes, measured as 5× ~1.2 s single-task
        // broadcast-build jobs at sf0.1 under load (r21 opt round).
        val c12 = c12Raw
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.compile.Compiler.trackOperatorCache(c12)
        // left-context OCCURRENCE counts: Σ over w1's bigram types of
        // their counts — integer-identical to counting the bigram
        // stream by w1, without a second corpus-scale aggregate
        val c1 = c12.groupBy(substring_index(col("__bg"), " ", 1).as("__w1"))
          .agg(sum(col("__c12")).as("__c1"))
        // continuation structure from the cached TYPE table: distinct
        // continuations per w1, distinct left-contexts per w2, total
        // bigram types — all vocabulary-shaped aggregates over c12
        val n1l = c12.groupBy(substring_index(col("__bg"), " ", 1).as("__kw1"))
          .agg(count(lit(1)).as("__n1l"))
        val n1r = c12.groupBy(substring_index(col("__bg"), " ", -1).as("__kw2"))
          .agg(count(lit(1)).as("__n1r"))
        val tt = c12.agg(count(lit(1)).as("__tt"))
        bigrams
          .join(c12, Seq("__bg"))
          .join(c1, substring_index(col("__bg"), " ", 1) === col("__w1"))
          .join(n1l, substring_index(col("__bg"), " ", 1) === col("__kw1"))
          .join(n1r, substring_index(col("__bg"), " ", -1) === col("__kw2"))
          .crossJoin(tt)
          .select(col(idCol),
            round(log((greatest(col("__c12") - lit(discount), lit(0.0)) +
              lit(discount) * col("__n1l") * (col("__n1r") / col("__tt"))) /
              col("__c1")), 6).as("__lp"))
    }
    val scored = perOcc
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(-(sum(col("__lp").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
          .cast("double") / count(lit(1))), 6).as("nll"))
    if (!keepUnscored) scored
    else df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("nll"))
  }

  /** A trained hashed-n-gram logistic model (see [[trainTextClassifier]]).
    * `weights(b)` is the coefficient of token bucket `b`; `losses` is the
    * per-epoch mean log-loss trace (strictly decreasing on separable
    * planted fixtures — the CorpusSpec training invariant). */
  final case class TextClassifierModel(
      dim: Int,
      intercept: Double,
      weights: Array[Double],
      losses: Seq[Double])

  /** Trainable quality classifier — the supervised curation tier between
    * the heuristic scorers (qualityScore/langId) and lmPerplexity:
    * logistic regression over hashed token buckets
    * (`hashed_buckets(text, dim)` — the portable Horner token hash mod
    * dim, term-frequency features), trained fastText-style but as
    * DETERMINISTIC full-batch aggregate passes:
    *
    *  1. Naive-Bayes log-odds initialization (the NBSVM trick, Wang &
    *     Manning 2012): w_b = ln((c⁺_b+α)/(T⁺+αD)) − ln((c⁻_b+α)/(T⁻+αD))
    *     with α = 0.5, b₀ = ln((N⁺+α)/(N⁻+α)) — ONE aggregate pass that
    *     already separates any class-discriminative token.
    *  2. `epochs` of gradient refinement with the CURVATURE-BOUNDED step
    *     η = lr / (¼·(maxᵢ‖xᵢ‖² + 1)): the logistic Hessian satisfies
    *     λmax ≤ ¼·maxᵢ‖xᵢ‖², so for lr ≤ 1 every step provably
    *     decreases the loss (no line search, no oscillation — the
    *     descent-lemma step for an L-smooth convex objective).
    *
    * Plain GD from zero needs hundreds of epochs before a one-token
    * planted signal's weight is visible, and second-order diagonal steps
    * overshoot on co-occurring features; NB-init + bounded refinement
    * gets both: immediate separation, then monotone convergence.
    *
    * Determinism (the property that makes the trained model gateable):
    * feature counts are integers (maxᵢ‖xᵢ‖² included); every floating
    * aggregate rounds its per-item term to 9 dp and sums in DECIMAL
    * (order-insensitive under shuffle retries — the dsum posture); ln is
    * the only libm call. Same input → bit-identical weights, every run.
    *
    * Semi-supervised shape: rows with NULL label are excluded from the
    * gradient (they still score at inference). Labels are 0/1 doubles.
    *
    * Scale: one feature-extraction pass builds (id, bucket, cnt) —
    * shuffle ∝ corpus tokens, cached across epochs; each epoch is a
    * margin aggregate (groupBy id), an id-keyed join of the errors back
    * onto the cached features, and a VOCABULARY-shaped gradient
    * aggregate (groupBy bucket, ≤ dim rows) — gradient, loss, and
    * intercept gradient unioned into ONE action per epoch. The weight vector itself is
    * bounded driver metadata (dim doubles, ≤ 2²⁰ by the IVF-centroid
    * argument) and ships to executors as a plan constant. Inference
    * never shuffles: [[graft.functions.ClassifierKernels.textScore]] is
    * one codegen kernel call per row.
    */
  def trainTextClassifier(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int = 1024,
      epochs: Int = 8,
      lr: Double = 0.8
  ): TextClassifierModel = {
    require(dim >= 1 && dim <= (1 << 20),
      s"classifier dim must be in [1, 2^20] (driver-bounded weights), got $dim")
    require(epochs >= 1, s"classifier epochs must be >= 1, got $epochs")
    // (id, y, n, bucket, cnt): integer token-bucket counts per labeled doc.
    // explode_outer keeps token-free docs — the intercept still trains on
    // them (their margin is the intercept alone).
    val feats = df
      .filter(col(labelCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).cast("double").as("__y"),
        graft.functions.ClassifierKernels
          .hashedTokenBuckets(col(textCol), dim).as("__bs"))
      .select(col("__id"), col("__y"), size(col("__bs")).as("__n"),
        explode_outer(col("__bs")).as("__bk"))
      .groupBy("__id", "__y", "__n", "__bk")
      .agg(count(lit(1)).cast("double").as("__cnt"))
      .persist()
    try trainOnFeats(feats, dim, epochs, lr)
    finally { feats.unpersist(); () }
  }

  /** The training core over an already-built (and cached) feature frame
    * `(__id, __y, __n, __bk, __cnt)` — shared by [[trainTextClassifier]]
    * and the one-vs-rest loop of [[trainMulticlassClassifier]], which
    * derives each class's `__y` from ONE cached label-tagged feature
    * frame instead of re-tokenizing the corpus per class. */
  private def trainOnFeats(
      feats: DataFrame,
      dim: Int,
      epochs: Int,
      lr: Double
  ): TextClassifierModel = {
    require(dim >= 1 && dim <= (1 << 20),
      s"classifier dim must be in [1, 2^20] (driver-bounded weights), got $dim")
    require(epochs >= 1, s"classifier epochs must be >= 1, got $epochs")
    val dec = org.apache.spark.sql.types.DecimalType(25, 9)
    def dsum9(c: Column): Column = sum(round(c, 9).cast(dec)).cast("double")

    // ---- per-doc stats, ONE job: N, N⁺, and max‖x‖² for the step bound
    val docStats = feats.groupBy(col("__id"), col("__y"))
      .agg(sum(col("__cnt") * col("__cnt")).as("__sq"))
      .agg(count(lit(1)).as("n"),
        count(when(col("__y") === 1.0, 1)).as("np"),
        max(col("__sq")).as("msq")).head
    val nDocs = docStats.getLong(0)
    require(nDocs > 0, "classifier training needs at least one labeled row")
    val nPos = docStats.getLong(1)
    val maxSq = if (docStats.isNullAt(2)) 0.0 else docStats.getDouble(2)

    // ---- NB log-odds initialization (one aggregate over the features)
    val alpha = 0.5
    val nbAgg = feats.filter(col("__bk").isNotNull).groupBy(col("__bk"))
      .agg(sum(when(col("__y") === 1.0, col("__cnt")).otherwise(0.0)).as("cp"),
        sum(when(col("__y") === 0.0, col("__cnt")).otherwise(0.0)).as("cn"))
      .collect()
    val totPos = nbAgg.map(_.getDouble(1)).sum
    val totNeg = nbAgg.map(_.getDouble(2)).sum
    val w = new Array[Double](dim)
    nbAgg.foreach { r =>
      w(r.getInt(0)) =
        math.log((r.getDouble(1) + alpha) / (totPos + alpha * dim)) -
          math.log((r.getDouble(2) + alpha) / (totNeg + alpha * dim))
    }
    var b0 = math.log((nPos + alpha) / (nDocs - nPos + alpha))

    // ---- curvature-bounded refinement: η = lr / (¼·(max‖x‖² + 1))
    val step = lr / (0.25 * (maxSq + 1.0))
    val losses = Seq.newBuilder[Double]
    var ep = 1
    while (ep <= epochs) {
      // term-frequency margin: intercept + Σ_b w[b]·cnt_b. The epoch's
      // weight snapshot rides as a codegen REFERENCE OBJECT
      // (BucketWeight, the LinearBucketScore pattern), not a typedLit
      // array — at production dim a literal would be megabytes of plan
      // constants per epoch (constant-pool + plan-serialization
      // pressure); the reference object is zero plan text at any dim.
      val contrib = when(col("__bk").isNull, lit(0.0))
        .otherwise(graft.functions.ClassifierKernels
          .bucketWeight(col("__bk"), w.clone()) * col("__cnt"))
      val scored = feats
        .groupBy("__id", "__y")
        .agg(dsum9(contrib).as("__mf"))
        .select(col("__id"), col("__y"),
          (lit(1.0) / (lit(1.0) + exp(-(lit(b0) + col("__mf"))))).as("__p"))
        .select(col("__id"), col("__y"), col("__p"),
          (col("__p") - col("__y")).as("__err"))
        .persist()
      // ONE action per epoch: the vocabulary-shaped gradient rows and the
      // (loss, intercept-gradient) aggregate ride the SAME job as a
      // union — the loss lands on sentinel bucket −1 and the intercept
      // gradient on −2 (both outside the [0, dim) feature space). Two
      // separate actions here doubled the per-epoch job count (2 × epochs
      // × k classes for one-vs-rest) and with it the bench harness-state
      // surface; `scored` is persisted so both union branches read one
      // materialization inside the single collect.
      val eps = 1e-12
      val lossRows = scored.agg(
          (dsum9(-(col("__y") * log(greatest(col("__p"), lit(eps))) +
            (lit(1.0) - col("__y")) *
              log(greatest(lit(1.0) - col("__p"), lit(eps))))) / nDocs).as("__l"),
          dsum9(col("__err")).as("__gb"))
        .select(explode(array(
          struct(lit(-1).as("__bk"), col("__l").as("__g")),
          struct(lit(-2).as("__bk"), col("__gb").as("__g")))).as("__s"))
        .select(col("__s.__bk").as("__bk"), col("__s.__g").as("__g"))
      // vocabulary-shaped gradient: g_b = Σ err·cnt / N
      val gradRows = feats.filter(col("__bk").isNotNull)
        .join(scored.select(col("__id"), col("__err")), Seq("__id"))
        .groupBy(col("__bk"))
        .agg(dsum9(col("__err") * col("__cnt")).as("__g"))
        .select(col("__bk"), col("__g"))
      val merged = gradRows.unionAll(lossRows).collect()
      scored.unpersist()
      var gb = 0.0
      merged.foreach { r =>
        r.getInt(0) match {
          case -1 => losses += r.getDouble(1)
          case -2 => gb = r.getDouble(1)
          case b => w(b) -= step * r.getDouble(1) / nDocs
        }
      }
      b0 -= step * gb / nDocs
      ep += 1
    }
    TextClassifierModel(dim, b0, w.clone(), losses.result())
  }

  /** Persist a trained classifier as a parquet weight table —
    * (bucket, weight) rows with bucket −1 carrying the intercept and
    * bucket −2 the dim. The artifact is what lets a BATCH-trained model
    * score a STREAM: load it in the streaming job and apply
    * [[graft.functions.ClassifierKernels.textScore]] (stateless
    * scan-stage kernel — no training aggregate ever touches the
    * stream). Zero weights are skipped (sparse store: a dim-2²⁰ model
    * over a small vocabulary is KBs, not MBs). */
  def saveTextClassifier(spark: org.apache.spark.sql.SparkSession,
      model: TextClassifierModel, path: String): Unit = {
    import spark.implicits._
    val rows = Seq((-1, model.intercept), (-2, model.dim.toDouble)) ++
      model.weights.zipWithIndex.collect {
        case (w, b) if w != 0.0 => (b, w)
      }
    rows.toDF("bucket", "weight").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveTextClassifier]] artifact (losses are not persisted —
    * they are a training trace, not part of the model). */
  def loadTextClassifier(spark: org.apache.spark.sql.SparkSession,
      path: String): TextClassifierModel = {
    val rows = spark.read.parquet(path)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val dim = rows.getOrElse(-2,
      throw new IllegalArgumentException(
        s"$path is not a classifier artifact (no dim row)")).toInt
    val w = new Array[Double](dim)
    rows.foreach { case (b, v) => if (b >= 0 && b < dim) w(b) = v }
    TextClassifierModel(dim, rows.getOrElse(-1, 0.0), w, Nil)
  }

  /** Persist a [[trainMulticlassClassifier]] model set as ONE parquet
    * table `(label, bucket, weight)` — the per-label rows use the
    * [[saveTextClassifier]] sparse convention (bucket −1 intercept,
    * −2 dim). The batch-train → stream-predict contract, multiclass. */
  def saveMulticlassClassifier(spark: org.apache.spark.sql.SparkSession,
      models: Seq[(String, TextClassifierModel)], path: String): Unit = {
    import spark.implicits._
    require(models.nonEmpty, "saveMulticlassClassifier: empty model list")
    models.flatMap { case (l, m) =>
      Seq((l, -1, m.intercept), (l, -2, m.dim.toDouble)) ++
        m.weights.zipWithIndex.collect { case (w, b) if w != 0.0 => (l, b, w) }
    }.toDF("label", "bucket", "weight").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveMulticlassClassifier]] artifact; labels come back
    * sorted (the training order), so [[predictMulticlass]] ties break
    * identically before and after the round trip. */
  def loadMulticlassClassifier(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, TextClassifierModel)] = {
    val raw = spark.read.parquet(path)
    require(Seq("label", "bucket", "weight").forall(raw.columns.contains),
      s"$path is not a multiclass classifier artifact (needs label/bucket/weight)")
    val rows = raw
      .select(col("label").cast("string"), col("bucket").cast("int"),
        col("weight").cast("double"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    require(rows.nonEmpty && rows.exists(_._2 == -2),
      s"$path is not a multiclass classifier artifact (no dim rows)")
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, rs) =>
      val m = rs.map(r => r._2 -> r._3).toMap
      val dim = m.getOrElse(-2,
        throw new IllegalArgumentException(
          s"$path: label '$l' has no dim row")).toInt
      val w = new Array[Double](dim)
      m.foreach { case (b, v) => if (b >= 0 && b < dim) w(b) = v }
      l -> TextClassifierModel(dim, m.getOrElse(-1, 0.0), w, Nil)
    }
  }

  /** Score with an already-trained (typically [[loadTextClassifier]]-
    * loaded) model — the streaming-admissible inference half of
    * [[qualityClassifier]] and the operator behind the `score_model`
    * config key. Adds (`scoreCol` [6 dp], `predCol`) to the frame via
    * ONE scan-stage codegen kernel call per row (weights ride as a
    * codegen reference object — no training aggregate, no shuffle, no
    * plan-literal array): batch-train, save, then score batches and
    * streams with identical decisions. */
  def scoreWithModel(
      df: DataFrame,
      textCol: String,
      model: TextClassifierModel,
      scoreCol: String = "score",
      predCol: String = "pred",
      threshold: Double = 0.5
  ): DataFrame =
    df.withColumn(scoreCol,
        round(graft.functions.ClassifierKernels
          .textScore(col(textCol), model.weights, model.intercept), 6))
      .withColumn(predCol, col(scoreCol) >= threshold)

  /** One-vs-rest MULTICLASS text classification over the same
    * deterministic machinery as [[trainTextClassifier]] — the trainable
    * language-ID / domain-ID / source-ID tier (the fastText supervised
    * shape): one binary hashed-bucket logistic model per distinct label,
    * each trained by the NB-init + curvature-bounded-GD aggregate passes
    * (bit-identical retrain). Labels collect to the driver once
    * (class-dimension metadata, sorted for determinism).
    *
    * The k classes train TOGETHER, column-wise: the corpus tokenizes and
    * shuffles exactly ONCE into a cached label-tagged feature frame
    * `(id, label, n, bucket, cnt)`, and every training aggregate carries
    * one column PER CLASS — per-doc stats and per-bucket NB counts are
    * one job each, and each refinement epoch is ONE job computing all k
    * margin/loss/gradient sets (the per-class arithmetic is identical to
    * the binary trainer's, just side by side). Job count is
    * 3 + epochs regardless of k — not k·(2 + 2·epochs) — which is what
    * keeps a 1000-language ID model from issuing forty thousand
    * cluster jobs. Expression width is 2k aggregate columns, bounded by
    * the k ≤ 1024 class-dimension budget; the k epoch-weight snapshots
    * ride as codegen reference objects (k·dim doubles — the same driver
    * budget as the returned model list itself). */
  def trainMulticlassClassifier(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int = 1024,
      epochs: Int = 8,
      lr: Double = 0.8
  ): Seq[(String, TextClassifierModel)] = {
    require(dim >= 1 && dim <= (1 << 20),
      s"classifier dim must be in [1, 2^20] (driver-bounded weights), got $dim")
    require(epochs >= 1, s"classifier epochs must be >= 1, got $epochs")
    val feats = df
      .filter(col(labelCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).cast("string").as("__lbl"),
        graft.functions.ClassifierKernels
          .hashedTokenBuckets(col(textCol), dim).as("__bs"))
      .select(col("__id"), col("__lbl"), size(col("__bs")).as("__n"),
        explode_outer(col("__bs")).as("__bk"))
      .groupBy("__id", "__lbl", "__n", "__bk")
      .agg(count(lit(1)).cast("double").as("__cnt"))
      .persist()
    try {
      val labels = feats.select(col("__lbl")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      require(labels.size >= 2,
        s"trainMulticlassClassifier: need >= 2 distinct labels, got ${labels.size}")
      require(labels.size <= 1024,
        s"trainMulticlassClassifier: ${labels.size} labels — the class " +
          "dimension is driver metadata, bounded at 1024")
      val k = labels.size
      val ks = labels.indices
      val dec = org.apache.spark.sql.types.DecimalType(25, 9)
      def dsum9(c: Column): Column = sum(round(c, 9).cast(dec)).cast("double")
      def y(i: Int): Column = (col("__lbl") === labels(i)).cast("double")

      // ---- per-doc stats, ONE job for all classes: N, max‖x‖², k × N⁺
      val stCols = Seq(max(col("__sq")).as("__msq")) ++
        ks.map(i => count(when(col("__lbl") === labels(i), 1)).as(s"__np_$i"))
      val st = feats.groupBy(col("__id"), col("__lbl"))
        .agg(sum(col("__cnt") * col("__cnt")).as("__sq"))
        .agg(count(lit(1)).as("__nn"), stCols: _*)
        .head
      val nDocs = st.getLong(0)
      require(nDocs > 0, "classifier training needs at least one labeled row")
      val maxSq = if (st.isNullAt(1)) 0.0 else st.getDouble(1)
      val nPos = ks.map(i => st.getLong(2 + i))

      // ---- NB log-odds initialization, ONE job: per-bucket (c⁺, c⁻)
      // column pairs for every class (class i's negatives are simply the
      // other labels — the one-vs-rest complement)
      val alpha = 0.5
      val nbCols = ks.flatMap(i => Seq(
        sum(when(col("__lbl") === labels(i), col("__cnt")).otherwise(0.0))
          .as(s"__cp_$i"),
        sum(when(col("__lbl") =!= labels(i), col("__cnt")).otherwise(0.0))
          .as(s"__cn_$i")))
      val nbAgg = feats.filter(col("__bk").isNotNull).groupBy(col("__bk"))
        .agg(nbCols.head, nbCols.tail: _*).collect()
      val ws = Array.fill(k)(new Array[Double](dim))
      val b0s = new Array[Double](k)
      ks.foreach { i =>
        val totPos = nbAgg.map(_.getDouble(1 + 2 * i)).sum
        val totNeg = nbAgg.map(_.getDouble(2 + 2 * i)).sum
        nbAgg.foreach { r =>
          ws(i)(r.getInt(0)) =
            math.log((r.getDouble(1 + 2 * i) + alpha) / (totPos + alpha * dim)) -
              math.log((r.getDouble(2 + 2 * i) + alpha) / (totNeg + alpha * dim))
        }
        b0s(i) = math.log((nPos(i) + alpha) / (nDocs - nPos(i) + alpha))
      }

      // ---- refinement: ONE job per epoch carrying all k classes —
      // k margin folds in one groupBy(id) aggregate, k error columns,
      // then the (k+… ) gradient/loss union exactly as the binary core,
      // with k value columns instead of one
      val step = lr / (0.25 * (maxSq + 1.0))
      val losses = Array.fill(k)(Seq.newBuilder[Double])
      val eps = 1e-12
      var ep = 1
      while (ep <= epochs) {
        val contribs = ks.map { i =>
          dsum9(when(col("__bk").isNull, lit(0.0))
            .otherwise(graft.functions.ClassifierKernels
              .bucketWeight(col("__bk"), ws(i).clone()) * col("__cnt")))
            .as(s"__mf_$i")
        }
        val scored = feats
          .groupBy(col("__id"), col("__lbl"))
          .agg(contribs.head, contribs.tail: _*)
          .select(col("__id") +: col("__lbl") +: ks.map(i =>
            (lit(1.0) / (lit(1.0) + exp(-(lit(b0s(i)) + col(s"__mf_$i")))))
              .as(s"__p_$i")): _*)
          .select(col("__id") +: col("__lbl") +:
            (ks.map(i => col(s"__p_$i")) ++
              ks.map(i => (col(s"__p_$i") - y(i)).as(s"__e_$i"))): _*)
          .persist()
        val lossCols = ks.map(i =>
          (dsum9(-(y(i) * log(greatest(col(s"__p_$i"), lit(eps))) +
            (lit(1.0) - y(i)) *
              log(greatest(lit(1.0) - col(s"__p_$i"), lit(eps))))) / nDocs)
            .as(s"__l_$i")) ++
          ks.map(i => dsum9(col(s"__e_$i")).as(s"__gb_$i"))
        val lossRows = scored.agg(lossCols.head, lossCols.tail: _*)
          .select(explode(array(
            struct(lit(-1).as("__bk") +: ks.map(i =>
              col(s"__l_$i").as(s"__g_$i")): _*),
            struct(lit(-2).as("__bk") +: ks.map(i =>
              col(s"__gb_$i").as(s"__g_$i")): _*))).as("__s"))
          .select(col("__s.__bk").as("__bk") +:
            ks.map(i => col(s"__s.__g_$i").as(s"__g_$i")): _*)
        val gradRows = feats.filter(col("__bk").isNotNull)
          .join(scored.select(col("__id") +:
            ks.map(i => col(s"__e_$i")): _*), Seq("__id"))
          .groupBy(col("__bk"))
          .agg(dsum9(col("__e_0") * col("__cnt")).as("__g_0"),
            ks.tail.map(i => dsum9(col(s"__e_$i") * col("__cnt"))
              .as(s"__g_$i")): _*)
        val merged = gradRows.unionAll(lossRows).collect()
        scored.unpersist()
        merged.foreach { r =>
          r.getInt(0) match {
            case -1 => ks.foreach(i => losses(i) += r.getDouble(1 + i))
            case -2 => ks.foreach(i => b0s(i) -= step * r.getDouble(1 + i) / nDocs)
            case b => ks.foreach { i =>
              ws(i)(b) -= step * r.getDouble(1 + i) / nDocs
            }
          }
        }
        ep += 1
      }
      ks.map(i => labels(i) ->
        TextClassifierModel(dim, b0s(i), ws(i).clone(), losses(i).result())).toSeq
    } finally { feats.unpersist(); () }
  }

  /** Scan-stage multiclass prediction: one [[ClassifierKernels]] kernel
    * call per class (weights as reference objects — zero plan literals),
    * scores rounded to 6 dp (the [[scoreWithModel]] convention, which
    * also makes the argmax engine-portable), argmax with ties broken by
    * label order. Adds `predCol`; `keepScores` also adds
    * `score_<label>` per class. Streaming-admissible — the batch-train →
    * stream-predict contract of the binary tier, multiclass. */
  def predictMulticlass(
      df: DataFrame,
      textCol: String,
      models: Seq[(String, TextClassifierModel)],
      predCol: String = "pred_label",
      keepScores: Boolean = false
  ): DataFrame = {
    require(models.nonEmpty, "predictMulticlass: empty model list")
    val scores = models.map { case (l, m) =>
      l -> round(graft.functions.ClassifierKernels
        .textScore(col(textCol), m.weights, m.intercept), 6)
    }
    // the argmax is ONE column with the k scores let-bound — each kernel
    // call runs once per row, not once per comparison
    val pred = TextAnalysis.withBound(
      struct(scores.map { case (l, s) => s.as(s"s_$l") }: _*)) { sc =>
      val vals = models.map { case (l, _) => sc.getField(s"s_$l") }
      val best = vals.reduce((a, b) => greatest(a, b))
      models.map(_._1).zip(vals).foldRight(lit(null).cast("string")) {
        case ((l, s), els) => when(s === best, lit(l)).otherwise(els)
      }
    }
    val withPred = df.withColumn(predCol, pred)
    if (!keepScores) withPred
    else scores.foldLeft(withPred) {
      case (d, (l, s)) => d.withColumn(s"score_$l", s)
    }
  }

  /** Train-and-score in one call — the operator behind the
    * `quality_classifier` config key: fit on the labeled rows, then
    * score EVERY row (labeled or not) with the scan-stage kernel.
    * Output: (idCol, score [6 dp], pred). Batch-only (training is a
    * global aggregate); inference alone is streaming-admissible via
    * [[graft.functions.ClassifierKernels.textScore]]. */
  def qualityClassifier(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int = 1024,
      epochs: Int = 8,
      lr: Double = 0.8,
      threshold: Double = 0.5
  ): DataFrame = {
    val m = trainTextClassifier(df, idCol, textCol, labelCol, dim, epochs, lr)
    df.select(col(idCol),
        round(graft.functions.ClassifierKernels
          .textScore(col(textCol), m.weights, m.intercept), 6).as("score"))
      .select(col(idCol), col("score"),
        (col("score") >= threshold).as("pred"))
  }

  // --------------------------------------------------------------------
  // DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  // pick raw-corpus documents whose hashed-n-gram distribution looks
  // like a TARGET corpus. The missing tier between the heuristic
  // filters (gopher/C4/quality) and full model-based scoring: no labels
  // needed, just an exemplar corpus of "data like this, please".
  // --------------------------------------------------------------------

  /** A fitted DSIR importance model: per-bucket log-likelihood ratios
    * ln p_target(b) − ln p_raw(b) over the hashed unigram+bigram feature
    * space (see [[graft.functions.NgramBucketOps]]), Laplace-smoothed
    * (+1 per bucket) so unseen buckets stay finite. `logRatios` is
    * bounded metadata (≤ 2²⁰ doubles — the classifier-weights budget),
    * each entry rounded to 9 dp so both the fit and every downstream
    * score are engine-reproducible (the lmPerplexity libm posture). */
  final case class DsirModel(
      buckets: Int,
      logRatios: Array[Double],
      targetFeats: Long,
      rawFeats: Long)

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Fit the DSIR bag-of-hashed-ngrams importance model: one
    * explode+count aggregate per corpus (map-side combine collapses each
    * partition to ≤ `buckets` rows, so shuffle bytes are
    * vocabulary-shaped regardless of corpus size), counts collected as
    * bounded metadata, log-ratios computed driver-side from exact
    * integer counts. Two corpus scans total; nothing else moves. */
  def dsirFit(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 8192
  ): DsirModel = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"dsirFit: buckets must be in [2, 2^20], got $buckets")
    def bucketCounts(df: DataFrame): Array[Long] = {
      val rows = df
        .select(explode(graft.functions.ClassifierKernels
          .hashedNgramBuckets(col(textCol), buckets)).as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
        .collect()
      val a = new Array[Long](buckets)
      rows.foreach(r => a(r.getInt(0)) = r.getLong(1))
      a
    }
    val ct = bucketCounts(target)
    val cr = bucketCounts(raw)
    val tt = ct.sum
    val tr = cr.sum
    val lr = Array.tabulate(buckets) { b =>
      round9(math.log((ct(b) + 1.0) / (tt + buckets.toDouble)) -
        math.log((cr(b) + 1.0) / (tr + buckets.toDouble)))
    }
    DsirModel(buckets, lr, tt, tr)
  }

  /** Score a frame with a fitted model: per-doc log importance weight
    * logw = Σ_features lr[bucket], folded IN FEATURE ORDER by one
    * codegen kernel call per row (weights ride as a codegen reference
    * object — zero plan literals at any dim, zero shuffles, streaming-
    * admissible). Adds (nFeatsCol, logwCol [6 dp]); a doc with no
    * tokens scores 0. */
  def dsirScore(
      df: DataFrame,
      textCol: String,
      model: DsirModel,
      logwCol: String = "dsir_logw",
      nFeatsCol: String = "n_feats"
  ): DataFrame = {
    val feats = graft.functions.ClassifierKernels
      .hashedNgramBuckets(col(textCol), model.buckets)
    df.withColumn(nFeatsCol, size(feats))
      .withColumn(logwCol, round(graft.functions.ClassifierKernels
        .bucketWeightSum(feats, model.logRatios), 6))
  }

  /** Fit-and-score: importance weights for every `raw` row against the
    * `target` exemplar corpus. Batch-only (the fit needs two count
    * actions); the returned frame adds (n_feats, dsir_logw). */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 8192
  ): DataFrame =
    dsirScore(raw, textCol, dsirFit(raw, target, textCol, buckets))

  /** Gumbel-top-k importance RESAMPLING — the selection half of DSIR:
    * keep the `n` rows with the largest `logw + Gumbel(0,1)` key, which
    * samples WITHOUT replacement with probability ∝ exp(logw) (the
    * Gumbel-max trick), so selection is diverse rather than a hard
    * argmax of near-duplicate top-weight docs. `gumbel = false` degrades
    * to deterministic top-n by weight.
    *
    * The noise is a deterministic function of (id, seed): u = (h+1)/(P+1)
    * with h the portable multiplicative hash over the 1e9+7 space
    * (globalShuffle's arithmetic — string ids via the fingerprint
    * kernel), g = −ln(−ln u). Replay-stable, retry-stable, and exactly
    * oracle-checkable; different seeds give independent draws.
    *
    * Scale: the key is scan-stage arithmetic; selection is
    * `orderBy(key).limit(n)` → TakeOrdered (per-partition top-n, driver
    * merge of n·partitions keys — right up to n ~ 10⁶; for larger n use
    * [[dsirResampleThreshold]] with [[dsirThresholdForN]]: a scan-stage
    * threshold filter on the same key, no ranking anywhere). */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      buckets: Int = 8192,
      seed: Long = 0L,
      gumbel: Boolean = true
  ): DataFrame = {
    dsirResample(dsirWeights(raw, target, textCol, buckets),
      idCol, n, seed, gumbel)
  }

  /** The selection half of [[dsirSelect]] over an ALREADY-scored frame
    * (a `dsir_logw` column from [[dsirScore]]) — what the `dsir` config
    * key's select mode composes after its fit. */
  /** The shared selection key of [[dsirResample]] /
    * [[dsirResampleThreshold]]: `logw + Gumbel(0,1)` with deterministic
    * (id, seed)-hash noise (6 dp), or the raw weight when `gumbel` is
    * off. Adds `__dsk`. */
  private def dsirKeyed(
      scored: DataFrame,
      idCol: String,
      seed: Long,
      gumbel: Boolean,
      logwCol: String,
      caller: String
  ): DataFrame = {
    require(seed >= 0 && seed < ShufflePrime,
      s"$caller: seed must be in [0, $ShufflePrime), got $seed")
    require(scored.columns.contains(logwCol),
      s"$caller: log-weight column '$logwCol' not found — score with " +
        s"dsirScore first (columns: ${scored.columns.mkString(", ")})")
    if (!gumbel) scored.withColumn("__dsk", col(logwCol))
    else {
      import org.apache.spark.sql.types._
      val base: Column = scored.schema(idCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          col(idCol).cast("long")
        case StringType =>
          graft.functions.TextKernels.portableFingerprint(col(idCol))
        case t => throw new IllegalArgumentException(
          s"$caller: id column '$idCol' has type ${t.simpleString}; " +
            "only integral and string ids hash deterministically")
      }
      val p = lit(ShufflePrime)
      // seed ADDS BEFORE the multiplicative scramble: (id·A + seed)
      // would only translate every hash by a constant, leaving the
      // Gumbel-key ORDER (what top-k reads) essentially unchanged
      // across seeds; ((id + seed)·A) mod P re-scrambles it
      val h = pmod(pmod(base + lit(seed), p) * lit(SplitMultiplier), p)
      val u = (h.cast("double") + lit(1.0)) / lit(ShufflePrime + 1.0)
      scored.withColumn("__dsk",
        round(col(logwCol) + -log(-log(u)), 6))
    }
  }

  def dsirResample(
      scored: DataFrame,
      idCol: String,
      n: Int,
      seed: Long = 0L,
      gumbel: Boolean = true,
      logwCol: String = "dsir_logw"
  ): DataFrame = {
    require(n >= 1, s"dsirResample: n must be >= 1, got $n")
    dsirKeyed(scored, idCol, seed, gumbel, logwCol, "dsirResample")
      .orderBy(col("__dsk").desc, col(idCol).asc).limit(n).drop("__dsk")
  }

  /** THRESHOLD selection — the scale path of DSIR resampling for n
    * beyond the TakeOrdered budget (n ≳ 10⁶, where rank-select's driver
    * merge of n·partitions keys stops being free): keep every row whose
    * selection key (`logw + Gumbel(0,1)`, the [[dsirResample]] key
    * verbatim) is >= `threshold`. A pure SCAN-STAGE filter — no sort, no
    * shuffle, no driver state — so it composes into any plan at any n;
    * a 100 TB resample of billions of rows is one pushed-down predicate.
    *
    * Pick the threshold either from the statistics you already know
    * (importance weights are log-ratios — a fixed cut is often the
    * policy anyway) or with [[dsirThresholdForN]], which derives the cut
    * for a target sample size from a one-pass quantile sketch. Rows AT
    * the threshold all pass (>=), so the selected count is
    * approximately n — by the tie mass and the sketch's relative error
    * — rather than exactly n; that is the documented trade against
    * rank-select's exactness. */
  def dsirResampleThreshold(
      scored: DataFrame,
      idCol: String,
      threshold: Double,
      seed: Long = 0L,
      gumbel: Boolean = true,
      logwCol: String = "dsir_logw"
  ): DataFrame = {
    require(!threshold.isNaN, "dsirResampleThreshold: threshold is NaN")
    dsirKeyed(scored, idCol, seed, gumbel, logwCol, "dsirResampleThreshold")
      .filter(col("__dsk") >= lit(threshold)).drop("__dsk")
  }

  /** Derive the [[dsirResampleThreshold]] cut that keeps ~`n` rows: the
    * (1 − n/N) quantile of the selection key via Spark's
    * Greenwald-Khanna sketch ([[org.apache.spark.sql.catalyst.util.QuantileSummaries]],
    * the approxQuantile kernel) — driven directly so the row COUNT rides
    * the same sketch (a GK summary carries its insert count), making
    * this ONE pass over the keys instead of persist + count + quantile.
    * Executor memory bounded by 1/relativeError, driver traffic one
    * merged summary (treeAggregate). With `relativeError = 0` the
    * quantile is exact (the sketch degrades to keeping all samples —
    * only for tests/small frames). Returns −Infinity when n >= N (keep
    * everything). */
  def dsirThresholdForN(
      scored: DataFrame,
      idCol: String,
      n: Long,
      seed: Long = 0L,
      gumbel: Boolean = true,
      logwCol: String = "dsir_logw",
      relativeError: Double = 1e-4
  ): Double = {
    require(n >= 1, s"dsirThresholdForN: n must be >= 1, got $n")
    require(relativeError >= 0 && relativeError < 1,
      s"dsirThresholdForN: relative_error must be in [0, 1), got $relativeError")
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val keyed = dsirKeyed(scored, idCol, seed, gumbel, logwCol,
      "dsirThresholdForN").select(col("__dsk").cast("double"))
    // The same seqOp/combOp shape as StatFunctions.multipleApproxQuantiles
    // (approxQuantile's engine): per-partition inserts, compress-then-merge
    // up a tree — the merged summary answers BOTH count() and query(p).
    val zero = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)
    val merged = keyed.rdd.treeAggregate(zero)(
      (qs, row) => if (row.isNullAt(0)) qs else qs.insert(row.getDouble(0)),
      (a, b) => a.compress().merge(b.compress()))
    val total = merged.count
    if (n >= total) Double.NegativeInfinity
    else merged.compress().query(1.0 - n.toDouble / total).getOrElse(
      Double.NegativeInfinity)
  }

  /** GENERIC scan-stage top-n selection by any numeric score — the
    * [[dsirThresholdForN]] machinery applied to an arbitrary column
    * (quality scores, PageRank, perplexity): derive the cut that keeps
    * ~`n` rows from ONE Greenwald-Khanna pass over the scores (the count
    * rides the sketch), then keep via a pushed-down `>= cut` predicate
    * (`descending = false`: the LOWEST scores, `<= cut` — the
    * perplexity direction). No global sort, no rank window, no driver
    * merge of n keys — selecting the best billion of a 100 TB corpus is
    * one sketch pass plus one scan-stage filter.
    *
    * Rows AT the cut all keep, so the kept count is ~n: exactly n when
    * scores are distinct and `relativeError = 0` (the exact sketch —
    * tests/small frames), approximately n by the tie mass and the
    * sketch error otherwise — the documented trade against rank-select's
    * exactness (use a TakeOrdered-budget orderBy/limit when n is small
    * and exactness matters). NULL/NaN scores raise by name. n >= N
    * keeps everything. */
  def quantileFilter(
      df: DataFrame,
      valueCol: String,
      n: Long,
      descending: Boolean = true,
      relativeError: Double = 1e-4
  ): DataFrame = {
    val cut = quantileCut(df, valueCol, n, descending, relativeError)
    val score = qfScore(df, valueCol)
    if (descending) df.filter(score >= lit(cut))
    else df.filter(score <= lit(cut))
  }

  /** The [[quantileFilter]] CUT alone — derive it from a batch frame and
    * apply it as a plain `score >= cut` filter anywhere, including on a
    * STREAM (the sketch pass is an action, so the node key is batch-only;
    * the cut itself is just a number). Returns ∓Infinity (keep
    * everything) when n >= N. */
  def quantileCut(
      df: DataFrame,
      valueCol: String,
      n: Long,
      descending: Boolean = true,
      relativeError: Double = 1e-4
  ): Double = {
    require(n >= 1, s"quantileFilter: n must be >= 1, got $n")
    require(relativeError >= 0 && relativeError < 1,
      s"quantileFilter: relative_error must be in [0, 1), got $relativeError")
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val keyed = df.select(qfScore(df, valueCol).as("__qf"))
    val zero = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)
    val merged = keyed.rdd.treeAggregate(zero)(
      (qs, row) => qs.insert(row.getDouble(0)),
      (a, b) => a.compress().merge(b.compress()))
    val total = merged.count
    val keepAll = if (descending) Double.NegativeInfinity else Double.PositiveInfinity
    if (n >= total) keepAll
    else {
      val p = if (descending) 1.0 - n.toDouble / total else n.toDouble / total
      merged.compress().query(p).getOrElse(keepAll)
    }
  }

  /** Numeric-typed, NULL/NaN-raising view of a score column — the shared
    * [[quantileFilter]]/[[quantileCut]] input contract. */
  private def qfScore(df: DataFrame, valueCol: String): Column = {
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType => ()
      case t => throw new IllegalArgumentException(
        s"quantileFilter: column '$valueCol' has type ${t.simpleString}; " +
          "quantile selection needs a numeric score")
    }
    when(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")),
      col(valueCol).cast("double")).otherwise(raise_error(
      lit(s"quantileFilter: NULL or NaN score in '$valueCol' — filter " +
        "or impute first")))
  }

  /** Persist a fitted DSIR model as a sparse parquet weight table —
    * (bucket, weight) rows plus bucket −2 carrying the dim (the
    * saveTextClassifier artifact convention). Batch-fit → stream-score:
    * load in the streaming job and apply [[dsirScore]] (stateless
    * kernel, no aggregate ever touches the stream). */
  def saveDsirModel(spark: org.apache.spark.sql.SparkSession,
      model: DsirModel, path: String): Unit = {
    import spark.implicits._
    val rows = Seq((-2, model.buckets.toDouble)) ++
      model.logRatios.zipWithIndex.collect {
        case (w, b) if w != 0.0 => (b, w)
      }
    rows.toDF("bucket", "weight").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveDsirModel]] artifact (feature totals are a fit trace,
    * not part of the scoring model — restored as 0). */
  def loadDsirModel(spark: org.apache.spark.sql.SparkSession,
      path: String): DsirModel = {
    val rows = spark.read.parquet(path)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val dim = rows.getOrElse(-2,
      throw new IllegalArgumentException(
        s"$path is not a DSIR artifact (no dim row)")).toInt
    val w = new Array[Double](dim)
    rows.foreach { case (b, v) => if (b >= 0 && b < dim) w(b) = v }
    DsirModel(dim, w, 0L, 0L)
  }
}
