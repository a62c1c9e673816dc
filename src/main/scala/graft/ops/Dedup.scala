package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (SURVEY §2.2 NS,
  * north-star pillar). Every variant is join/aggregate-shaped — no
  * driver-side state, no O(n²) comparisons except inside an LSH bucket —
  * so each scales to 100 TB:
  *
  *   - exact:      one hash-aggregate on the dedup key.
  *   - MinHash-LSH: shingle → H minhashes → B band keys → equi-join on
  *                  band key. Candidate pairs ∝ collisions, not n².
  *   - SimHash:    64-bit signature, banded for Hamming-radius search.
  *   - n-gram Jaccard: exact verification join on shared shingles.
  */
object Dedup {

  /** Exact dedup on `keyCols`, keeping the row with the smallest `idCol`
    * per key — ONE deterministic winner (dropDuplicates keeps an arbitrary
    * row, which can't be oracle-checked and is nondeterministic across
    * retries at scale; min_by gives a stable result for the same cost:
    * one partial+final hash aggregate). */
  def exactDedup(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    exactDedup(df, keyCols, idCol, None)

  /** [[exactDedup]] with an optional `countCol`: the kept row also carries
    * its duplicate-class SIZE — the soft-dedup signal (down-weight or
    * temperature-sample by duplication instead of just dropping copies;
    * a dup_count of 1 marks unique docs). Same single aggregate: the
    * count rides the existing partial+final combine for free. */
  def exactDedup(
      df: DataFrame, keyCols: Seq[String], idCol: String,
      countCol: Option[String]
  ): DataFrame = {
    countCol.foreach(c => require(!df.columns.contains(c),
      s"exactDedup: count column '$c' already exists in the input"))
    val others = df.columns.filterNot(c => keyCols.contains(c) || c == idCol)
    df.groupBy(keyCols.map(col): _*)
      .agg(
        min(col(idCol)).as(idCol),
        others.map(c => min_by(col(c), col(idCol)).as(c)) ++
          countCol.map(c => count(lit(1)).as(c)): _*)
  }

  /** [[exactDedup]] with QUALITY-AWARE retention: per key, keep the row
    * with the BEST `orderCol` score — the highest with `descending`
    * (default; e.g. a quality-classifier score) or the lowest without
    * (e.g. perplexity) — ties broken by the minimum `idCol`, so the
    * winner is still ONE deterministic row. The pipeline shape this
    * serves: exact/URL dedup where the duplicate class should keep its
    * best copy (longest extraction, highest quality score), not its
    * numerically-smallest id.
    *
    * Same cost and scale shape as [[exactDedup]]: ONE partial+final hash
    * aggregate (min_by over a (score, id) sort-key struct — map-side
    * combine intact, no window over the corpus, hot duplicate keys
    * partial-aggregate before the shuffle). `orderCol` must be numeric;
    * NULL/NaN scores fail loudly (they order inconsistently across
    * engines — same policy as tokenBudgetSample). The score compares as
    * DOUBLE (descending negates), exact for every float/int score up to
    * 2^53 — an integral score beyond that should dedup on min-id and
    * re-rank downstream instead. */
  def exactDedupBest(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      orderCol: String,
      descending: Boolean = true,
      countCol: Option[String] = None
  ): DataFrame = {
    countCol.foreach(c => require(!df.columns.contains(c),
      s"exactDedupBest: count column '$c' already exists in the input"))
    import org.apache.spark.sql.types._
    df.schema(orderCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => ()
      case t => throw new IllegalArgumentException(
        s"exactDedupBest: order column '$orderCol' has type " +
          s"${t.simpleString}; the retention order needs a numeric score")
    }
    val score = when(col(orderCol).isNotNull && !isnan(col(orderCol).cast("double")),
      col(orderCol).cast("double")).otherwise(raise_error(
      lit(s"exactDedupBest: NULL or NaN score in '$orderCol' — filter " +
        "or impute first")))
    val sortKey = struct(
      (if (descending) -score else score).as("s"),
      col(idCol).as("i"))
    val others = df.columns.filterNot(keyCols.contains)
    require(others.nonEmpty,
      s"exactDedupBest: id column '$idCol' and order column '$orderCol' " +
        "cannot both be dedup keys")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        min_by(col(others.head), sortKey).as(others.head),
        others.tail.map(c => min_by(col(c), sortKey).as(c)) ++
          countCol.map(c => count(lit(1)).as(c)): _*)
  }

  /** Incremental ingestion dedup — the production shape for a corpus that
    * grows daily: dedup the INCOMING batch within itself (deterministic
    * min-id winner per key) and against the EXISTING corpus via a
    * left-anti join on the dedup key. The existing side is its key
    * columns only (at 100 TB: the maintained fingerprint index, not the
    * corpus — a re-scan of history per ingest is exactly what this op
    * avoids). Two shuffles, both incoming-batch-shaped: the corpus index
    * is only probed, never re-aggregated.
    *
    * Use a content fingerprint as the key at scale (64-bit probe keys,
    * 100× smaller than text); any column set works. */
  def dedupAgainstCorpus(
      incoming: DataFrame,
      seenKeys: DataFrame,
      keyCols: Seq[String],
      idCol: String
  ): DataFrame =
    exactDedup(incoming, keyCols, idCol)
      .join(seenKeys.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")

  /** EXACT seen filter against a persisted key set — the join tier of
    * the "have we got this already?" gate (cf. [[seenProbeBloom]], the
    * scan-stage tier): `mode = "drop"` removes rows whose `keyCol`
    * appears in `seenKeys` (left-anti — schema unchanged), `mode =
    * "flag"` keeps every row and adds boolean `flagCol` instead (left
    * join on the distinct keys + a marker). The seen side reduces to
    * DISTINCT keys before the join, so the shuffle is key-shaped on the
    * index side and incoming-shaped on the probe side (AQE broadcasts a
    * small index). NULL keys are never-seen under both modes (equi-join
    * null semantics; the flag is explicitly false, not null). Unlike
    * [[dedupAgainstCorpus]] the incoming side is NOT deduped within
    * itself — compose with `dedup`/[[exactDedup]] when in-batch dups
    * matter. */
  def seenFilter(
      df: DataFrame,
      keyCol: String,
      seenKeys: DataFrame,
      mode: String = "drop",
      flagCol: String = "seen"
  ): DataFrame = {
    require(seenKeys.columns.contains(keyCol),
      s"seenFilter: seen-key frame has no column '$keyCol' " +
        s"(has: ${seenKeys.columns.mkString(", ")})")
    val keys = seenKeys.select(col(keyCol)).distinct()
    // a using-column join moves the key to position 0 — restore the
    // input's column order so the op keeps its schema contract
    val inOrder = df.columns.map(col).toSeq
    mode match {
      case "drop" =>
        df.join(keys, Seq(keyCol), "left_anti").select(inOrder: _*)
      case "flag" =>
        require(!df.columns.contains(flagCol),
          s"seenFilter: flag column '$flagCol' already exists in the input")
        val marked = keys.withColumn("__seen_mark", lit(true))
        df.join(marked, Seq(keyCol), "left")
          .select(inOrder :+
            coalesce(col("__seen_mark"), lit(false)).as(flagCol): _*)
      case other => throw new IllegalArgumentException(
        s"""seenFilter: mode must be "drop" or "flag", got "$other"""")
    }
  }

  /** Scan-stage SEEN probe — the Bloom tier of [[seenFilter]], the
    * crawl-frontier gate ("have we fetched this URL / seen this content
    * fingerprint?") that runs with ZERO joins or shuffles: a Bloom
    * filter over xxhash64 of the seen keys is built ONCE (one
    * aggregation over the key frame; the driver holds only the bit
    * array — the [[nearDupProbeBloom]] trust model), broadcast, and
    * every probed row tests its own xxhash64 in the scan stage — which
    * is what makes the probe STREAMING-admissible.
    *
    * Semantics are CONSERVATIVE: every indexed key flags (no false
    * negatives), Bloom false positives over-flag an `fpp`-bounded
    * sliver (plus the 2⁻⁶⁴ xxhash64 collision mass — the hashing is
    * what makes the probe type-generic: any orderable key type works,
    * string urls and long fingerprints alike). Route flagged rows to
    * the exact tier ([[seenFilter]] or the `exact_ingest` sink) when
    * over-dropping matters. NULL keys never flag and are never indexed
    * (a NULL is not a key). */
  def seenProbeBloom(
      df: DataFrame,
      keyCol: String,
      seenKeys: DataFrame,
      flagCol: String = "seen",
      expectedKeys: Long = 1L << 22,
      fpp: Double = 0.01
  ): DataFrame = {
    require(seenKeys.columns.contains(keyCol),
      s"seenProbeBloom: seen-key frame has no column '$keyCol' " +
        s"(has: ${seenKeys.columns.mkString(", ")})")
    require(!df.columns.contains(flagCol),
      s"seenProbeBloom: flag column '$flagCol' already exists in the input")
    require(expectedKeys > 0, "seenProbeBloom: expected_keys must be > 0")
    require(fpp > 0 && fpp < 1, s"seenProbeBloom: fpp must be in (0, 1), got $fpp")
    val hashed = seenKeys.filter(col(keyCol).isNotNull)
      .select(xxhash64(col(keyCol)).as("__k"))
    val bloom = hashed.stat.bloomFilter("__k", expectedKeys, fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bloom)
    val hit = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    df.withColumn(flagCol,
      when(col(keyCol).isNull, lit(false))
        .otherwise(hit(xxhash64(col(keyCol)))))
  }

  /** Incremental NEAR-dup ingestion — [[dedupAgainstCorpus]] extended
    * from exact fingerprints to MinHash near-duplicates, the production
    * shape for a corpus that grows daily:
    *
    *   1. the incoming batch dedups WITHIN itself: LSH candidates →
    *      exact-Jaccard verify → connected components → min-id
    *      representative per cluster;
    *   2. the batch's band index probes `corpusIndex` — the PERSISTED
    *      [[minhashBandIndex]] of the existing corpus — by equi-join on
    *      (band, band_key); candidate (incoming, corpus) pairs verify by
    *      exact Jaccard against only the candidate corpus docs, and any
    *      incoming doc at or above `threshold` to a corpus doc is
    *      dropped.
    *
    * The result set is order-independent: incoming minus in-batch
    * cluster losers minus corpus-similar docs (a doc similar to both is
    * dropped once, whichever tier sees it first) — which is what makes
    * it exactly mirrorable in oracle SQL.
    *
    * Scale posture: every shuffle is batch-shaped. The corpus index is
    * probed, never rebuilt (16 longs/doc at the defaults); `corpusDocs`
    * supplies (idCol, textCol) to the verify tier, and only CANDIDATE
    * corpus ids are ever joined against it — history is not re-read.
    * `corpusIndex` must have been built with the same (shingleSize,
    * numHashes, bands): the index rows carry no parameter metadata, so a
    * mismatch is NOT detectable here — mismatched banding silently probes
    * nothing and admits every cross-corpus duplicate. Persist the
    * parameters alongside the index (a one-row JSON next to the parquet)
    * and validate them at load time in the ingest job; only the index
    * SCHEMA is checked below. */
  def nearDupAgainstCorpus(
      incoming: DataFrame,
      corpusIndex: DataFrame,
      corpusDocs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    require(corpusIndex.columns.toSet == Set(idCol, "band", "band_key"),
      s"corpusIndex must be minhashBandIndex output ($idCol, band, band_key), " +
        s"got ${corpusIndex.columns.mkString(", ")}")
    val inIdx = minhashBandIndex(incoming, idCol, textCol, shingleSize, numHashes, bands)
    // tier 1: in-batch near-dedup (candidates → verify → clusters)
    val inA = inIdx.select(col("band"), col("band_key"), col(idCol).as("idA"))
    val inB = inIdx.select(col("band"), col("band_key"), col(idCol).as("idB"))
    val inCands = inA.join(inB, Seq("band", "band_key"))
      .filter(col("idA") < col("idB")).select("idA", "idB").distinct()
    val inPairs = verifyJaccardPairs(incoming, idCol, textCol, inCands, shingleSize, threshold)
    val batchKept = dedupByClusters(incoming, inPairs, idCol)
    // tier 2: probe the persisted corpus index (batch-shaped equi-join)
    val crossCands = inIdx.select(col("band"), col("band_key"), col(idCol).as("__inc"))
      .join(corpusIndex.select(col("band"), col("band_key"), col(idCol).as("__corp")),
        Seq("band", "band_key"))
      .select("__inc", "__corp").distinct()
    val incSets = incoming.select(col(idCol).as("__inc"),
      hashedNgrams(col(textCol), shingleSize).as("__shA"))
    val corpSets = corpusDocs.select(col(idCol).as("__corp"),
      hashedNgrams(col(textCol), shingleSize).as("__shB"))
    val dupOfCorpus = crossCands
      .join(incSets, Seq("__inc"))
      .join(corpSets, Seq("__corp"))
      .select(col("__inc"),
        size(array_intersect(col("__shA"), col("__shB"))).cast("long").as("common"),
        size(col("__shA")).as("szA"), size(col("__shB")).as("szB"))
      .filter(
        round(col("common").cast("double") / (col("szA") + col("szB") - col("common")), 9)
          >= threshold)
      .select(col("__inc").as(idCol)).distinct()
    batchKept.join(dupOfCorpus, Seq(idCol), "left_anti")
  }

  /** Word-level shingles (n-grams) as an array column. n=1 → unigram set.
    * Tokens are let-bound (TextAnalysis.withTokens) so the split runs once
    * per row — referencing the token expression inside the position lambda
    * would re-split the text once per shingle position (O(tokens²)). */
  def shingles(text: Column, n: Int): Column =
    if (n == 1) array_distinct(TextAnalysis.tokens(text))
    else TextAnalysis.withTokens(text) { toks =>
      array_distinct(
        transform(
          sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }

  /** MinHash signature from PRE-HASHED shingles (an array<long> column):
    * element s = min over base hashes h of XXH64(h, seed=s), computed in
    * ONE pass by the native kernel (graft.functions.MinHashSignature) —
    * the fold formulation traverses the array numHashes times. The
    * base-hash array must still be materialized in its own projection
    * (see `minhashCandidatePairs`) so string hashing runs once per row. */
  def minhashSignature(hashedShingles: Column, numHashes: Int): Column =
    graft.functions.Sketches.minhashSignature(hashedShingles, numHashes)

  /** Composable fold formulation of the signature (numHashes array
    * traversals) — kept as the reference implementation for tests. */
  def minhashSignatureFold(hashedShingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(hashedShingles, h => xxhash64(lit(seed), h)))
    }: _*)

  /** xxhash64 of each shingle string, once. */
  def hashedShingles(shingleCol: Column): Column =
    transform(shingleCol, sh => xxhash64(sh))

  /** Distinct 64-bit n-gram shingle hashes computed DIRECTLY from token
    * hashes — no shingle strings are ever built (the concat_ws + string
    * xxhash64 per position was the dominant cost of pair generation).
    * Each token is hashed once; a shingle hash is xxhash64 over its n
    * token hashes (fixed-width longs). Tokens contain no whitespace, so
    * this induces exactly the same equivalence on token sequences as the
    * `shingles` string form — identical shingle SETS, sizes and Jaccard
    * counts, modulo 64-bit collisions. Short docs (< n tokens) hash their
    * full token list (`try_element_at` past the end → null → skipped by
    * xxhash64), mirroring the string form's truncated slice; empty docs
    * yield the constant seed hash, mirroring the "" shingle. */
  def hashedNgrams(text: Column, n: Int): Column =
    if (n == 1)
      array_distinct(transform(TextAnalysis.tokens(text), t => xxhash64(t)))
    else
      TextAnalysis.withBound(transform(TextAnalysis.tokens(text), t => xxhash64(t))) { th =>
        array_distinct(
          transform(
            sequence(lit(0), greatest(size(th) - n, lit(0))),
            i => xxhash64((0 until n).map(k => try_element_at(th, i + k + 1)): _*)))
      }

  /** MinHash band index: one row per (band, band_key) bucket membership
    * of each doc — the banding stage of [[minhashCandidatePairs]] exposed
    * as a standalone frame because PERSISTED it is the production ingest
    * artifact: write it once per corpus (16 longs per doc at the
    * defaults), and every daily batch probes it by equi-join instead of
    * re-signaturing history ([[nearDupAgainstCorpus]]). Probes only match
    * an index built with the SAME (shingleSize, numHashes, bands). */
  def minhashBandIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // Two separate projections on purpose: shingle hashes → 64 minhashes.
    // CollapseProject won't merge them (each alias is expensive and
    // referenced many times downstream), so the shingle work runs once
    // per row instead of once per hash function.
    val sig = df
      .select(col(idCol), hashedNgrams(col(textCol), shingleSize).as("__hs"))
      .select(col(idCol), minhashSignature(col("__hs"), numHashes).as("sig"))
    sig.select(
      col(idCol),
      posexplode(
        array((0 until bands).map(b =>
          xxhash64(lit(b) +: (0 until r).map(i => element_at(col("sig"), b * r + i + 1)): _*)): _*))
        .as(Seq("band", "band_key")))
  }

  /** Scan-stage near-duplicate PROBE against a persisted
    * [[minhashBandIndex]]: adds boolean `flagCol` — true when the row's
    * LSH band signature collides with the indexed corpus.
    *
    * Shape: a Bloom filter over the index's `band_key` longs is built
    * ONCE (one aggregation over the index, driver holds only the bit
    * array — the [[graft.ops.Corpus.decontaminateBloom]] trust model),
    * broadcast, and each probed row computes its `bands` keys and tests
    * them in the scan stage. The probed frame is never shuffled, joined,
    * or aggregated — which is what makes the probe STREAMING-admissible
    * (the `near_dup_probe` config key works under compileStream, where a
    * per-doc collapse of an index equi-join would be an illegal
    * streaming aggregation).
    *
    * Semantics are CONSERVATIVE: a band key present in the index always
    * tests true (no false negatives — every indexed collision flags),
    * while Bloom false positives over-flag an `fpp`-bounded sliver.
    * Route flagged rows to the exact tier ([[nearDupAgainstCorpus]] or a
    * `near_dup_ingest` sink) when over-dropping matters. The probe must
    * use the SAME (shingleSize, numHashes, bands) as the index build —
    * band keys fold the band number, so mismatched geometry silently
    * never collides (same contract as [[nearDupAgainstCorpus]]). */
  def nearDupProbeBloom(
      df: DataFrame,
      textCol: String,
      index: DataFrame,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      flagCol: String = "near_dup",
      expectedKeys: Long = 1L << 22,
      fpp: Double = 0.01
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(index.columns.contains("band_key"),
      s"index must be minhashBandIndex output (id, band, band_key), got ${index.columns.mkString(", ")}")
    val r = numHashes / bands
    val bloom = index.stat.bloomFilter("band_key", expectedKeys, fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bloom)
    val hit = udf((keys: Seq[Long]) =>
      keys != null && keys.exists(k => bc.value.mightContainLong(k)))
    // same two-projection split as minhashBandIndex: shingle work must
    // run once per row, not once per hash function
    df.withColumn("__hs", hashedNgrams(col(textCol), shingleSize))
      .withColumn("__sig", minhashSignature(col("__hs"), numHashes))
      .withColumn(flagCol, hit(array((0 until bands).map(b =>
        xxhash64(lit(b) +: (0 until r).map(i =>
          element_at(col("__sig"), b * r + i + 1)): _*)): _*)))
      .drop("__hs", "__sig")
  }

  /** LSH candidate pairs from MinHash signatures.
    * Bands the `numHashes`-long signature into `bands` groups of
    * rows-per-band r = numHashes/bands; docs colliding on ANY full band are
    * candidates. Probability a pair with Jaccard j collides:
    * 1-(1-j^r)^bands (the standard S-curve). One explode (×bands) + one
    * shuffle on the band key + an in-bucket self-join.
    *
    * `maxBucketSize` stays OPT-IN here, deliberately asymmetric with
    * [[blockedCandidatePairs]]'s default-on auto cap: a hot BLOCKING
    * bucket is boilerplate (a shared prefix carries no linkage signal),
    * but a hot LSH band bucket is usually a real duplicate CLUSTER — the
    * thing the operator exists to find — and capping it silently costs
    * recall (the q113 driver gate would catch exactly that). Cap only to
    * survive degenerate corpora (e.g. millions of empty docs sharing the
    * all-empty signature), and prefer filtering those upstream.
    * Returns (idA, idB) with idA < idB, distinct. */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucketSize: Option[Int] = None
  ): DataFrame = {
    var banded = minhashBandIndex(df, idCol, textCol, shingleSize, numHashes, bands)
    // Degenerate-corpus guard: a bucket of m docs yields m²/2 candidate
    // pairs — cap bucket size so one pathological band key (e.g. the
    // all-empty-docs signature) can't produce a quadratic blowup.
    maxBucketSize.foreach { cap =>
      val ok = banded.groupBy("band", "band_key")
        .agg(count(lit(1)).as("__n")).filter(col("__n") <= cap)
        .select("band", "band_key")
      banded = banded.join(ok, Seq("band", "band_key"))
    }
    val a = banded.select(col("band"), col("band_key"), col(idCol).as("idA"))
    val b = banded.select(col("band"), col("band_key"), col(idCol).as("idB"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
      .distinct()
  }

  /** Exact n-gram Jaccard verification restricted to CANDIDATE pairs: join
    * each candidate to both sides' distinct shingle-hash sets and intersect
    * in-row. Shuffle ∝ |candidates| (near-dup density), never the
    * corpus-wide shingle explode-join — at 100 TB this is the verify tier
    * that runs on `minhashCandidatePairs` output, replacing
    * [[ngramJaccardPairs]] whose cost is corpus-shaped. No stop-shingle
    * guard is needed here: fan-out is bounded by the candidate list, and
    * the in-row intersection makes ubiquitous shingles a per-row cost, not
    * a join blowup. Returns the [[ngramJaccardPairs]] schema; on any
    * candidate pair the jaccard values are identical (same hashed shingle
    * sets, un-pruned). */
  def verifyJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleSize: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    val sets = df.select(col(idCol), hashedNgrams(col(textCol), shingleSize).as("__sh"))
    candidates
      .join(sets.select(col(idCol).as("idA"), col("__sh").as("__shA")), Seq("idA"))
      .join(sets.select(col(idCol).as("idB"), col("__sh").as("__shB")), Seq("idB"))
      .select(col("idA"), col("idB"),
        size(array_intersect(col("__shA"), col("__shB"))).cast("long").as("common"),
        col("__shA"), col("__shB"))
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (size(col("__shA")) + size(col("__shB")) - col("common")), 9))
      .filter(col("jaccard") >= threshold)
      .select("idA", "idB", "common", "jaccard")
  }

  /** Blocking-key candidate pairs — classic record-linkage blocking: docs
    * sharing `blockKey` (a cheap deterministic expression: a text prefix,
    * a normalized title, a phonetic code, a length bucket) become
    * candidates for an exact verify tier. One shuffle on the block key +
    * an in-bucket self-join — candidate count ∝ bucket sizes, never n².
    *
    * The hot-bucket cap is DEFAULT-ON ([[BucketCap.Auto]]): blocking keys
    * are precisely where real corpora skew — one boilerplate prefix
    * ("Terms of Service…") puts millions of docs in a single bucket and
    * hands the verify tier m²/2 pairs. Auto drops buckets larger than
    * max(1000, 0.1% of corpus), the same skew-guard formula as
    * [[ngramJaccardPairs]]'s default-on stop-shingle pass; a bucket that
    * hot is boilerplate by construction, not linkage signal. Opt out
    * explicitly with [[BucketCap.Off]] when the key is known-unique-ish,
    * or pin a user cap with [[BucketCap.Max]]. Returns (idA, idB),
    * idA < idB, distinct. */
  def blockedCandidatePairs(
      df: DataFrame,
      idCol: String,
      blockKey: Column,
      cap: BucketCap = BucketCap.Auto
  ): DataFrame = {
    var keyed = df.select(blockKey.as("__bk"), col(idCol))
    if (cap != BucketCap.Off) {
      val sizes = keyed.groupBy("__bk").agg(count(lit(1)).as("__n"))
      keyed = cap match {
        case BucketCap.Max(m) =>
          // a user cap has no hot-set size bound (cap=2 on a skewed corpus
          // flags most buckets), so the anti-join stays shuffled
          keyed.join(sizes.filter(col("__n") > m).select("__bk"),
            Seq("__bk"), "left_anti")
        case _ =>
          // auto: the hot set holds at most min(N/1000, 1000) keys by
          // construction (each exceeds max(1000, N/1000) members), so
          // broadcasting it is always safe — same reasoning as the
          // auto stop-shingle set
          val hot = sizes
            .crossJoin(broadcast(df.select(count(lit(1)).as("__total"))))
            .filter(col("__n") >
              greatest(lit(1000L), floor(col("__total") / 1000).cast("long")))
            .select("__bk")
          keyed.join(broadcast(hot), Seq("__bk"), "left_anti")
      }
    }
    // no .distinct(): unlike the banded LSH tiers (where several bands
    // re-emit the same pair), each doc carries exactly ONE block key, so
    // the self-join already yields each pair once — a dedup here would
    // add a candidate-shaped shuffle for nothing
    keyed.select(col("__bk"), col(idCol).as("idA"))
      .join(keyed.select(col("__bk"), col(idCol).as("idB")), Seq("__bk"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
  }

  /** Edit-distance verify tier restricted to CANDIDATE pairs: join each
    * candidate to both texts and keep pairs whose normalized similarity
    * 1 - lev/(max length) ≥ `threshold`. The complement to
    * [[verifyJaccardPairs]] for SHORT fields (titles, URLs, names) where
    * character-level edits matter and shingle sets are too coarse.
    * Shuffle ∝ |candidates|; the per-pair cost is the O(|a|·|b|) DP, so
    * the scale contract is: candidates come from a blocking/LSH tier
    * ([[blockedCandidatePairs]], [[minhashCandidatePairs]]) and the field
    * is short — never run it corpus×corpus or on book-length text.
    * `maxDistance` switches to Spark's early-exit kernel (the DP row
    * aborts once the running minimum exceeds the cap — O(maxDistance·|a|)
    * on rejected pairs) and additionally drops pairs beyond the cap;
    * leave it None when the normalized `threshold` alone defines the
    * tier. Whole-stage codegen throughout (levenshtein is a codegen'd
    * built-in). Returns (idA, idB, dist, sim), sim rounded to 9 dp for
    * cross-engine comparability. */
  def verifyEditDistancePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      threshold: Double = 0.8,
      maxDistance: Option[Int] = None
  ): DataFrame = {
    val texts = df.select(col(idCol), col(textCol))
    val dist = maxDistance match {
      case Some(m) => levenshtein(col("__tA"), col("__tB"), m)
      case None    => levenshtein(col("__tA"), col("__tB"))
    }
    candidates
      .join(texts.select(col(idCol).as("idA"), col(textCol).as("__tA")), Seq("idA"))
      .join(texts.select(col(idCol).as("idB"), col(textCol).as("__tB")), Seq("idB"))
      .select(col("idA"), col("idB"), dist.cast("long").as("dist"),
        length(col("__tA")).as("__la"), length(col("__tB")).as("__lb"))
      .filter(col("dist") >= 0) // early-exit kernel returns -1 past the cap
      // the lit(1) floor keeps an empty-vs-empty pair (dist 0 — an exact
      // duplicate) at sim 1.0 instead of a silently-dropped NULL from 0/0
      .withColumn("sim",
        round(lit(1.0) - col("dist").cast("double") /
          greatest(col("__la"), col("__lb"), lit(1)), 9))
      .filter(col("sim") >= threshold)
      .select("idA", "idB", "dist", "sim")
  }

  /** 64-bit SimHash from a PRE-MATERIALIZED array<long> of token hashes:
    * per bit position, sum +1/-1 over token hashes; the sign becomes the
    * bit. Near-duplicates differ in few bits (small Hamming distance).
    * Columnar — no explode. Like minhash, the token-hash array must live in
    * its own projection or the string hashing re-runs 64×. */
  def simhashFromHashes(hashes: Column): Column = {
    val bitCols = (0 until 64).map { i =>
      // sum over tokens of (bit_i ? 1 : -1); bit set in result iff sum > 0
      val bitSum = aggregate(
        hashes,
        lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(bitSum > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** Convenience single-Column simhash (small inputs / tests). For bulk
    * paths use simhashFromHashes over a materialized hash array. */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(TextAnalysis.tokens(text), t => xxhash64(t)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within Hamming radius ≤ `maxDist`, using the
    * pigeonhole band trick: split 64 bits into `maxDist+1` chunks — any
    * pair within radius collides on at least one whole chunk → equi-join on
    * (chunk index, chunk value), then verify exact Hamming distance. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3
  ): DataFrame = {
    val sigs = df
      .select(col(idCol),
        transform(TextAnalysis.tokens(col(textCol)), t => xxhash64(t)).as("__th"))
      .select(col(idCol), graft.functions.Sketches.simhash64(col("__th")).as("sig"))
    hammingPairs(sigs, idCol, "sig", maxDist)
  }

  /** Hamming near-dup pairs over ANY 64-bit signature column via the
    * pigeonhole band trick (the [[simhashPairs]] machinery, factored so
    * perceptual image hashes — [[Multimodal.imageDHash]] — and any future
    * 64-bit sketch reuse it): split into `maxDist+1` chunks, equi-join on
    * (chunk index, chunk value), verify exact Hamming distance. Within
    * radius maxDist a pair MUST collide on at least one whole chunk —
    * a theorem, not a probability (q122 driver-gates it). Returns
    * (idA, idB, dist), idA < idB.
    *
    * IDENTICAL signatures are collapsed BEFORE banding: at web scale the
    * common skew case is a massive duplicate class (a spacer GIF or blank
    * thumbnail re-encoded millions of times decodes to one dHash), and an
    * m-member class banded naively collides with itself on ALL maxDist+1
    * chunks — one hot (chunk, chunk_val) bucket hands the join
    * (maxDist+1)·m²/2 candidate rows that a `distinct` then has to
    * re-shuffle. Here the band join runs over DISTINCT signatures only
    * (a duplicate class contributes ONE row per chunk, hot buckets are
    * impossible by construction), and member pairs are re-expanded
    * afterwards by output-proportional equi-joins: in-class pairs
    * (dist 0) from one self-join on the signature, cross-class pairs
    * from joining the verified signature-pair list back to membership.
    * The pair LIST is still ∝ true duplicates — that is the contract;
    * callers that only need representatives should use
    * [[hammingClusters]], which never materializes in-class pairs. */
  def hammingPairs(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      maxDist: Int
  ): DataFrame = {
    val members = sigs.select(col(idCol).as("__id"), col(sigCol).as("__sig"))
    val classes = members.groupBy("__sig").agg(min("__id").as("__rep"))
    val sigPairs = bandedSigPairs(classes, maxDist)
    // In-class pairs: identical signatures, Hamming distance 0. ONE
    // equi-join on the signature — output-sized, no band amplification,
    // no distinct (unique ids → unique pairs).
    val within = members.join(
        members.select(col("__sig"), col("__id").as("__idB")), "__sig")
      .filter(col("__id") < col("__idB"))
      .select(col("__id").as("idA"), col("__idB").as("idB"),
        lit(0).cast("int").as("dist"))
    // Cross-class pairs: expand each verified signature pair to its
    // members. Rep order does not fix member order → least/greatest.
    val cross = sigPairs
      .join(members.select(col("__sig").as("__sigA"), col("__id").as("__ia")), "__sigA")
      .join(members.select(col("__sig").as("__sigB"), col("__id").as("__ib")), "__sigB")
      .select(least(col("__ia"), col("__ib")).as("idA"),
        greatest(col("__ia"), col("__ib")).as("idB"), col("dist"))
    within.unionByName(cross)
  }

  /** The pigeonhole band join over a DISTINCT-signature frame
    * `(__sig, __rep)`: returns verified signature pairs
    * (__sigA, __sigB, __repA, __repB, dist) with 1 ≤ dist ≤ `maxDist`,
    * each unordered pair once (repA < repB — reps are unique because
    * classes partition the id space). The collapse invariant callers rely
    * on: every row here is between two DIFFERENT signatures, so bucket
    * sizes track distinct-signature collisions, never duplicate-class
    * sizes. */
  private[graft] def bandedSigPairs(classes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist must be in [0, 64), got $maxDist")
    val chunks = maxDist + 1
    val width = 64 / chunks
    val banded = classes.select(
      col("__rep"), col("__sig"),
      posexplode(array((0 until chunks).map { c =>
        // chunk c = bits [c*width, (c+1)*width) (last chunk takes the rest)
        val w = if (c == chunks - 1) 64 - c * width else width
        shiftright(col("__sig"), c * width)
          .bitwiseAND(lit(if (w == 64) -1L else (1L << w) - 1L))
      }: _*)).as(Seq("chunk", "chunk_val")))
    val a = banded.select(col("chunk"), col("chunk_val"),
      col("__rep").as("__repA"), col("__sig").as("__sigA"))
    val b = banded.select(col("chunk"), col("chunk_val"),
      col("__rep").as("__repB"), col("__sig").as("__sigB"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("__repA") < col("__repB"))
      .select(col("__sigA"), col("__sigB"), col("__repA"), col("__repB"),
        hamming(col("__sigA"), col("__sigB")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** Cluster labels for Hamming near-duplicates WITHOUT materializing the
    * pair list: collapse identical signatures (min-id representative per
    * class), band only distinct signatures, run connected components over
    * the REPRESENTATIVE graph, then label every member through its class.
    * Returns (id, cluster) where cluster is the minimum id reachable
    * through the Hamming-≤`maxDist` graph — provably identical to
    * `dedupClusters(hammingPairs(...))` (every member id ≥ its class rep,
    * and reps carry min-label CC), at cost ∝ distinct signatures + one
    * membership join instead of ∝ pairs. The scale-native tier for
    * duplicate-heavy corpora: a 10M-copy spacer GIF costs one CC node and
    * 10M membership rows, not 5·10¹³ pairs. Unlike the pair tier it also
    * labels SINGLETONS (cluster = own id), so the output is a total
    * keep/drop verdict; NULL signatures (an upstream OnError.Null decode)
    * are excluded rather than falsely merged into one "null class" —
    * mirroring the pair tier, where null equi-join keys match nothing. */
  def hammingClusters(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      maxDist: Int,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val members = sigs.select(col(idCol).as("__id"), col(sigCol).as("__sig"))
      .filter(col("__sig").isNotNull)
    val classes = members.groupBy("__sig").agg(min("__id").as("__rep"))
    val repPairs = bandedSigPairs(classes, maxDist)
      .select(col("__repA").as("idA"), col("__repB").as("idB"))
    val repLabels = dedupClusters(repPairs, checkpointDir = checkpointDir)
      .select(col("id").as("__rep"), col("cluster").as("__cc"))
    members.join(classes, "__sig")
      .join(repLabels, Seq("__rep"), "left")
      // A rep absent from every cross-class pair heads its own cluster.
      .select(col("__id").as("id"),
        coalesce(col("__cc"), col("__rep")).as("cluster"))
  }

  /** Exact SUBSTRING-level dedup: duplicated `windowTokens`-token
    * passages across the corpus, as per-doc token spans to drop — the
    * "dedup training data by 50-token windows" pass (cf. the dedup
    * literature in PAPERS.md), at document-interior granularity where the
    * fingerprint/MinHash tiers only see whole docs.
    *
    * Shape: one scan-stage pass per doc computes ALL window fingerprints
    * (rolling Horner, O(1) per window — [[graft.functions.WindowFingerprints]]),
    * posexplode to (id, pos, fp), a min-struct aggregate + fp join marks
    * every occurrence that is not the (id, pos)-first of its fingerprint
    * (the globally-first occurrence of each passage survives — see
    * [[laterOccurrences]] for why this is an aggregate, not a window
    * rank), one shuffle on id merges surviving duplicate windows into
    * maximal spans (gaps-and-islands: windows at pos p and
    * p' ≤ p+windowTokens overlap or touch, so they fuse). Shuffles ∝
    * token count, no suffix array, no all-pairs stage — the 100 TB shape.
    *
    * Returns (idCol, span_start, span_end, dup_windows): token index
    * span [span_start, span_end) duplicates a passage seen earlier in
    * (id, pos) order, covered by `dup_windows` duplicate windows. Docs
    * with fewer than `windowTokens` tokens contribute nothing; a doc
    * repeating a passage of ITSELF reports the later occurrence. */
  def duplicatePassageSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50
  ): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    val wins = windowOccurrences(df, idCol, textCol, windowTokens)
    mergeDupWindowSpans(laterOccurrences(wins), idCol, windowTokens)
  }

  /** (__id, pos, fp) for every `windowTokens`-token window of every doc. */
  private def windowOccurrences(
      df: DataFrame, idCol: String, textCol: String, windowTokens: Int): DataFrame =
    df.select(col(idCol).as("__id"),
      posexplode(graft.functions.TextKernels.windowFingerprints(col(textCol), windowTokens))
        .as(Seq("pos", "fp")))

  /** Occurrences that are NOT the (id, pos)-first of their fingerprint —
    * the "duplicate" mark of the batch tier. Deliberately an aggregate +
    * join, not `row_number over (partition by fp)`: a passage duplicated
    * 10M times (a boilerplate header) would make one window partition
    * hold all 10M occurrence rows — a hot sort AQE cannot split. The
    * min-struct aggregate collapses map-side (one row per fp per task)
    * and the join back on fp is AQE-skew-splittable, so the hottest
    * passage class costs a split join, never a single-task sort. */
  private def laterOccurrences(wins: DataFrame): DataFrame = {
    val firstPerFp = wins.groupBy("fp")
      .agg(min(struct(col("__id"), col("pos"))).as("__first"))
    wins.join(firstPerFp, "fp")
      .filter(struct(col("__id"), col("pos")) =!= col("__first"))
      .select("__id", "pos")
  }

  /** Gaps-and-islands merge of duplicate window positions (__id, pos)
    * into maximal spans — shared by the batch and incremental tiers. */
  private def mergeDupWindowSpans(
      dups: DataFrame, idCol: String, windowTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("__id").orderBy("pos")
    dups
      .withColumn("__brk",
        when(col("pos") - lag("pos", 1).over(byDoc) <= windowTokens, 0).otherwise(1))
      .withColumn("__island", sum("__brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__id"), col("__island"))
      .agg(min("pos").as("span_start"),
        (max("pos") + windowTokens).as("span_end"),
        count(lit(1)).as("dup_windows"))
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        col("dup_windows"))
  }

  /** The persistable corpus index for INCREMENTAL substring dedup: the
    * DISTINCT window fingerprints of a corpus — 8 bytes per distinct
    * passage, the substring-granularity sibling of [[minhashBandIndex]].
    * Append each admitted batch's index rows and keep probing; duplicate
    * fp rows across appends are harmless (the probe is a semi-join) —
    * compact with `DISTINCT` when the file count grows. Must be built
    * with the SAME `windowTokens` as the probe (fps carry no parameter
    * metadata — persist the window size alongside, the
    * [[nearDupAgainstCorpus]] convention). */
  def passageWindowIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50
  ): DataFrame =
    windowOccurrences(df, idCol, textCol, windowTokens)
      .select("fp").distinct()

  /** Incremental SUBSTRING-level dedup — [[duplicatePassageSpans]] for a
    * corpus that grows batch by batch: a window occurrence in the
    * INCOMING batch is duplicate if the same passage occurred earlier in
    * the batch ((id, pos) order) OR exists in `corpusWindows` (the
    * persisted [[passageWindowIndex]] — in which case EVERY batch
    * occurrence is duplicate, including the batch-first). Returns the
    * merged spans, (idCol, span_start, span_end, dup_windows).
    *
    * Order-independent given the index (history membership is a set
    * test), hence exactly oracle-mirrorable. Scale posture: both tiers
    * are batch-shaped — one window shuffle on fp ranks in-batch
    * occurrences, one semi-join probes the index; history text is never
    * re-read (the index IS 8-byte fps). */
  def passageDedupAgainstCorpus(
      incoming: DataFrame,
      corpusWindows: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50
  ): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    require(corpusWindows.columns.toSet == Set("fp"),
      s"corpusWindows must be passageWindowIndex output (fp), " +
        s"got ${corpusWindows.columns.mkString(", ")}")
    val wins = windowOccurrences(incoming, idCol, textCol, windowTokens)
    val inBatch = laterOccurrences(wins)
    val seen = wins.join(corpusWindows, Seq("fp"), "left_semi")
      .select("__id", "pos")
    mergeDupWindowSpans(inBatch.union(seen).distinct(), idCol, windowTokens)
  }

  /** Winnowed fingerprint index — the MOSS-style COMPACTION of
    * [[passageWindowIndex]] (Schleimer, Wilkerson & Aiken 2003): per doc,
    * only the rightmost minimum of every `w` consecutive window hashes
    * is kept, shrinking the index ~(w+1)/2× while GUARANTEEING that any
    * shared substring of ≥ w+k−1 tokens still collides on a selected
    * fingerprint. The selection is a scan-stage kernel
    * ([[graft.functions.WinnowOps]]); the output (idCol, pos, fp) is
    * what a 100 TB substring-dedup index should actually store.
    * k = `windowTokens` (the match granularity), `w` = the winnow
    * window (detection floor w+k−1 tokens). */
  def winnowIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50,
      winnowWindow: Int = 8
  ): DataFrame = {
    require(windowTokens >= 1 && winnowWindow >= 1,
      s"winnowIndex: need windowTokens >= 1 and winnowWindow >= 1, " +
        s"got $windowTokens/$winnowWindow")
    df.select(col(idCol),
        explode(graft.functions.TextKernels.winnowFingerprints(
          col(textCol), windowTokens, winnowWindow)).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }

  /** The PERSISTABLE side of the winnowed tier: the distinct selected
    * fingerprints of a corpus — what a growing corpus stores instead of
    * the full window index ([[passageWindowIndex]]'s compacted sibling;
    * ~2/(w+1) the rows at the same detection floor). */
  def winnowIndexFps(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50,
      winnowWindow: Int = 8
  ): DataFrame =
    winnowIndex(df, idCol, textCol, windowTokens, winnowWindow)
      .select("fp").distinct()

  /** Incremental MOSS probe: flag incoming docs that share ≥ `minShared`
    * winnowed fingerprints with a persisted [[winnowIndexFps]] corpus
    * index — the candidate gate in front of the exact verification tier
    * (`passageDedupAgainstCorpus` / edit-distance), at the compacted
    * index's storage cost. Selection is scan-stage; the probe is one
    * fp-keyed semi-join + an id-keyed count — batch-shaped, the corpus
    * never re-scans. Adds (matchedCol, flagCol) to the input. */
  def winnowProbeAgainstCorpus(
      incoming: DataFrame,
      corpusFps: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50,
      winnowWindow: Int = 8,
      minShared: Int = 2,
      matchedCol: String = "matched_fps",
      flagCol: String = "near_dup"
  ): DataFrame = {
    require(minShared >= 1, s"winnowProbeAgainstCorpus: minShared >= 1, got $minShared")
    require(corpusFps.columns.toSet == Set("fp"),
      s"corpusFps must be winnowIndexFps output (fp), " +
        s"got ${corpusFps.columns.mkString(", ")}")
    val sel = winnowIndex(incoming, idCol, textCol, windowTokens, winnowWindow)
      .select(col(idCol), col("fp")).distinct()
    val matched = sel.join(corpusFps, Seq("fp"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as(matchedCol))
    incoming.join(matched, Seq(idCol), "left")
      .withColumn(matchedCol, coalesce(col(matchedCol), lit(0L)))
      .withColumn(flagCol, col(matchedCol) >= minShared)
  }

  /** Scan-stage Bloom tier of [[winnowProbeAgainstCorpus]] — the
    * STREAMING-admissible shape (the [[nearDupProbeBloom]] contract at
    * passage granularity): a Bloom filter over the persisted
    * [[winnowIndexFps]] builds ONCE at compile and broadcasts; each row
    * counts its distinct winnowed selections that might be indexed and
    * flags at `minShared` — the probed frame never shuffles, joins, or
    * aggregates. CONSERVATIVE: Bloom has no false negatives, so the
    * count only over-estimates — everything the exact probe flags is
    * flagged here, plus an fpp-bounded sliver to route to the exact
    * tier. Must use the index's (windowTokens, winnowWindow). */
  def winnowProbeBloom(
      df: DataFrame,
      textCol: String,
      corpusFps: DataFrame,
      windowTokens: Int = 50,
      winnowWindow: Int = 8,
      minShared: Int = 2,
      matchedCol: String = "matched_fps",
      flagCol: String = "near_dup",
      expectedKeys: Long = 1L << 22,
      fpp: Double = 0.01
  ): DataFrame = {
    require(minShared >= 1, s"winnowProbeBloom: minShared >= 1, got $minShared")
    require(corpusFps.columns.toSet == Set("fp"),
      s"corpusFps must be winnowIndexFps output (fp), " +
        s"got ${corpusFps.columns.mkString(", ")}")
    val bloom = corpusFps.stat.bloomFilter("fp", expectedKeys, fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bloom)
    val cnt = udf((fps: Seq[Long]) =>
      if (fps == null) 0L
      else fps.distinct.count(k => bc.value.mightContainLong(k)).toLong)
    df.withColumn(matchedCol, cnt(transform(
        graft.functions.TextKernels.winnowFingerprints(
          col(textCol), windowTokens, winnowWindow),
        s => s.getField("fp"))))
      .withColumn(flagCol, col(matchedCol) >= minShared)
  }

  /** Candidate document pairs from the winnowed index: docs sharing ≥
    * `minShared` selected fingerprints, with the shared count — the
    * MOSS similarity-report shape, feeding the exact verification tiers.
    * One fp-keyed equi-join over the COMPACTED index (≈ 2/(w+1) of the
    * full window stream), identical-fp fan-out bounded by the usual
    * min-id pairing. */
  def winnowCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50,
      winnowWindow: Int = 8,
      minShared: Int = 1
  ): DataFrame = {
    require(minShared >= 1, s"winnowCandidatePairs: minShared >= 1, got $minShared")
    val idx = winnowIndex(df, idCol, textCol, windowTokens, winnowWindow)
      .select(col(idCol).as("__wid"), col("fp")).distinct()
    val a = idx.select(col("__wid").as("idA"), col("fp"))
    val b = idx.select(col("__wid").as("idB"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("idA") < col("idB"))
      .groupBy("idA", "idB")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** [[duplicatePassageSpans]] applied: returns the input plus
    * `clean_text` (tokens inside duplicate spans removed, survivors
    * re-joined with single spaces) and `dropped_tokens`. The span join is
    * per-doc metadata (a doc's own span list), never a pair list. */
  def stripDuplicatePassages(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50
  ): DataFrame =
    applyPassageSpans(df, idCol, textCol,
      duplicatePassageSpans(df, idCol, textCol, windowTokens))

  /** [[stripDuplicatePassages]] against a persisted
    * [[passageWindowIndex]]: spans come from [[passageDedupAgainstCorpus]]
    * (in-batch AND history duplicates), applied the same way. A doc whose
    * every token is duplicated comes out with empty `clean_text` —
    * filter on `dropped_tokens < token count` (or non-empty clean_text)
    * to drop full duplicates. */
  def stripPassagesAgainstCorpus(
      incoming: DataFrame,
      corpusWindows: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50
  ): DataFrame =
    applyPassageSpans(incoming, idCol, textCol,
      passageDedupAgainstCorpus(incoming, corpusWindows, idCol, textCol, windowTokens))

  /** Apply a duplicate-span frame (idCol, span_start, span_end, …) to the
    * docs: tokens inside any span removed, survivors re-joined with
    * single spaces. The span join is per-doc metadata, never a pair
    * list. */
  private def applyPassageSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spanFrame: DataFrame
  ): DataFrame = {
    val spans = spanFrame
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__drops"))
    df.join(spans, Seq(idCol), "left")
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__kept", filter(col("__toks"), (t, i) =>
        !exists(coalesce(col("__drops"),
            array().cast("array<struct<span_start:int,span_end:int>>")),
          d => i >= d("span_start") && i < d("span_end"))))
      .withColumn("clean_text", concat_ws(" ", col("__kept")))
      .withColumn("dropped_tokens", (size(col("__toks")) - size(col("__kept"))).cast("long"))
      .drop("__drops", "__toks", "__kept")
  }

  /** [[simhashPairs]]' cluster-output sibling: SimHash signatures →
    * [[hammingClusters]]. Returns (id, cluster). */
  def simhashClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val sigs = df
      .select(col(idCol),
        transform(TextAnalysis.tokens(col(textCol)), t => xxhash64(t)).as("__th"))
      .select(col(idCol), graft.functions.Sketches.simhash64(col("__th")).as("sig"))
    hammingClusters(sigs, idCol, "sig", maxDist, checkpointDir)
  }

  /** Connected components over a near-dup pair list (idA, idB): every doc
    * gets the MINIMUM id reachable through the pair graph as its cluster
    * label. Iterative min-label propagation with POINTER-JUMP shortcutting
    * (each round a node also adopts its current label's label, so chain
    * depth halves per round → O(log diameter) rounds, not O(diameter)).
    *
    * Scale posture: ONE Spark job per iteration on the default path — the
    * convergence flag is computed from the `old`-label column carried
    * inside the same materializing action, not a separate join. Iteration
    * state is `persist(MEMORY_AND_DISK)` + explicit unpersist of the
    * previous round (graceful lineage replay on executor loss — a lost
    * `localCheckpoint` partition would fail the job outright, and
    * memory-backed state pins the working set). With a reliable
    * checkpoint location (`checkpointDir` param, falling back to the
    * session's `sparkContext.setCheckpointDir`), each round is instead
    * written to `<dir>/graft-cc-<uuid>/r<i>` as parquet and read back —
    * truncating the iterative lineage for very deep graphs (the
    * recommended 100 TB production setting; one extra read-back job per
    * round). Round i−1's files are DELETED as soon as round i is on disk,
    * so a deep run holds at most two rounds of labels in the store; only
    * the final round's directory outlives the call (the returned
    * DataFrame's lineage reads it — drop the graft-cc dir when done with
    * the result).
    *
    * Throws IllegalStateException if not converged after `maxIter` rounds
    * (with jumps, `maxIter`=20 covers component diameters up to ~2^20 —
    * silently returning partial labels would split clusters). Returns
    * (id, cluster).
    */
  def dedupClusters(
      pairs: DataFrame,
      idA: String = "idA",
      idB: String = "idB",
      maxIter: Int = 20,
      smallGraphEdges: Long = 1L << 20,
      checkpointDir: Option[String] = None
  ): DataFrame =
    dedupClustersDetailed(pairs, idA, idB, maxIter, smallGraphEdges, checkpointDir).labels

  /** [[dedupClusters]] plus convergence diagnostics: how many propagation
    * rounds ran (0 on the driver union-find cutover) and which path was
    * taken. Production monitoring wants the round count (a growing number
    * flags a pathological component); the plan-invariant test uses it to
    * assert exactly one materializing action per round. */
  def dedupClustersDetailed(
      pairs: DataFrame,
      idA: String = "idA",
      idB: String = "idB",
      maxIter: Int = 20,
      smallGraphEdges: Long = 1L << 20,
      checkpointDir: Option[String] = None
  ): CCResult = {
    import org.apache.spark.storage.StorageLevel
    // The driver cutover collects `smallGraphEdges` edges — cap it so a
    // misconfigured caller can't turn the bounded-metadata trust model
    // into an unbounded driver collect (2^24 edges ≈ 256 MB is already
    // generous; the distributed loop handles anything larger).
    require(smallGraphEdges <= (1L << 24),
      s"smallGraphEdges=$smallGraphEdges exceeds the driver-collect safety " +
        s"cap ${1L << 24}; larger graphs must take the distributed path")
    val spark = pairs.sparkSession
    val ckptBase = checkpointDir.orElse(spark.sparkContext.getCheckpointDir)
      .map(d => s"$d/graft-cc-${java.util.UUID.randomUUID()}")
    def delete(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    }
    var ckptRound = -1
    // Returns (usable frame, unpersist handle). BOTH paths truncate the
    // LOGICAL plan to a leaf each round — the round plan references the
    // previous round's three times (neighbor join + jump join), so without
    // truncation the analyzed tree grows ~3^rounds and the DRIVER becomes
    // the bottleneck around round 10 (analysis plus the per-action plan-
    // description event each walk the whole tree; measured OOM at 8 GB on
    // a 7-round chain). The persist path wraps the cached result as a
    // LogicalRDD leaf: plan size stays constant per round while the RDD
    // chain (linear, compact) still replays gracefully on executor loss —
    // unlike localCheckpoint, which trades replay away.
    def materialize(df: DataFrame): (DataFrame, Option[DataFrame]) = ckptBase match {
      case Some(base) =>
        ckptRound += 1
        val path = s"$base/r$ckptRound"
        df.write.parquet(path) // eager; the read-back truncates lineage
        if (ckptRound > 0) delete(s"$base/r${ckptRound - 1}")
        (spark.read.parquet(path), None)
      case None =>
        val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        (org.apache.spark.sql.GraftColumnBridge.truncateLineage(cached), Some(cached))
    }
    // Materialize the (small) pair list ONCE, before mirroring it into the
    // undirected edge list — a union of two selects over un-cached `pairs`
    // would embed the expensive pair-generation lineage (shingling + joins)
    // twice in one plan, and every iteration would reference it. Always a
    // persist, never a reliable checkpoint: the size cutover below hasn't
    // run yet, and a tiny graph would turn the checkpoint write into pure
    // wasted distributed-storage I/O. Null endpoints identify nothing —
    // drop those edges up front (the driver path would NPE on them; the
    // distributed joins would silently never match them).
    val p = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .na.drop()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = p.count()
    // Size-adaptive cutover: near-dup edge lists are USUALLY tiny relative
    // to the corpus (duplicate density, not data size). Below the threshold
    // (default 2^20 edges ≈ 16 MB — same bounded-metadata trust model as a
    // broadcast), solve on the driver with union-find in milliseconds
    // instead of paying ~2 shuffles + a materializing action PER ITERATION
    // of the distributed loop. Long ids only — anything else takes the
    // distributed path, which is type-generic.
    if (edgeCount <= smallGraphEdges &&
        p.schema.fields.forall(_.dataType ==
          org.apache.spark.sql.types.LongType)) {
      val es = p.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // union by MIN root, so every component's root is its minimum id —
        // the same label the distributed min-propagation converges to
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = es.flatMap(e => Seq(e._1, e._2)).distinct
        .sorted.map(n => (n, find(n))).toSeq
      p.unpersist(blocking = false)
      import spark.implicits._
      return CCResult(labels.toDF("id", "cluster"), rounds = 0, driverPath = true)
    }
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = edges.select(col("src").as("id")).distinct()
    // AQE is OFF for the loop's queries (restored after): its runtime
    // re-planning buys nothing on a fixed iterative shape whose state only
    // shrinks, and its eager stage materialization inside `Dataset.rdd`
    // would split each round into two executions — the loop's contract is
    // ONE materializing action per round.
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = spark.conf.get(aqeKey, "true")
    spark.conf.set(aqeKey, "false")
    // Size the loop's shuffles to the GRAPH, not the session: a small
    // graph forced down the distributed path (cutover off, or non-long
    // ids) otherwise pays session-partition-count empty tasks per stage
    // per round — measured 5.1 s for a 450-edge fixture at 32 partitions,
    // almost all scheduler overhead. ~50k edges per partition, floor 2,
    // capped at the session value so corpus-scale graphs keep it. Labels
    // are partitioning-invariant (min propagation); restored in finally.
    // Skipped when the session value is non-numeric ("auto").
    val shufKey = "spark.sql.shuffle.partitions"
    val shufPrev = spark.conf.get(shufKey, "200")
    val shufOverride = scala.util.Try(shufPrev.toInt).toOption.collect {
      case sessionParts =>
        // arithmetic in Long BEFORE narrowing: (edgeCount/50000L).toInt
        // wraps negative above ~1.07e14 edges and the max() would clamp
        // a colossal graph to 2 partitions
        math.min(sessionParts.toLong,
          math.max(2L, edgeCount / 50000L + 1L)).toInt
    }.filter(_ < scala.util.Try(shufPrev.toInt).getOrElse(0))
    shufOverride.foreach(p0 => spark.conf.set(shufKey, p0.toString))
    try {
    var (labels, labelsCache) = materialize(nodes.select(col("id"), col("id").as("cluster")))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // 1) propagate: candidate = min(own label, neighbors' labels)
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("cluster").as("nb")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nb")).as("nbMin"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("old"),
          least(col("cluster"), coalesce(col("nbMin"), col("cluster"))).as("cluster"))
      // 2) shortcut: adopt the label's own label (labels map id→cluster with
      //    cluster ≤ id, and every cluster value is a node id, so the lookup
      //    is total; the result stays within the component and only shrinks)
      val (next, nextCache) = materialize(
        propagated
          .join(labels.select(col("id").as("cluster"), col("cluster").as("jump")),
            Seq("cluster"), "left")
          .select(col("id"), col("old"),
            least(col("cluster"), coalesce(col("jump"), col("cluster"))).as("cluster")))
      // single action: materializes `next` into the cache/checkpoint AND
      // computes the convergence flag from the carried old-label column
      val changed = next.filter(col("cluster") =!= col("old")).count()
      converged = changed == 0
      labelsCache.foreach(_.unpersist(blocking = false))
      labels = next
      labelsCache = nextCache
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dedupClusters did not converge after $maxIter rounds — component " +
          "diameter exceeds 2^" + maxIter + "; raise maxIter")
    p.unpersist(blocking = false)
    CCResult(labels.select("id", "cluster"), rounds = iter, driverPath = false)
    } finally {
      spark.conf.set(aqeKey, aqePrev)
      shufOverride.foreach(_ => spark.conf.set(shufKey, shufPrev))
    }
  }

  /** Dedup a corpus given near-dup pairs: one representative per cluster —
    * the minimum id (deterministic) — plus every unpaired doc. */
  def dedupByClusters(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      idA: String = "idA",
      idB: String = "idB"
  ): DataFrame = {
    val clusters = dedupClusters(pairs, idA, idB)
    val losers = clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle:
    * explode shingle sets, equi-join on the shingle, count shared, compute
    * |A∩B| / (|A|+|B|-|A∩B|). Over-frequent shingles are dropped from the
    * JOIN per the explicit `guard` policy — the standard skew guard: a
    * stop-shingle appearing in 1M docs would otherwise generate 10¹² join
    * rows. [[ShingleGuard.Auto]] (the default; cap = max(1000, 0.1% of
    * corpus), which never fires on small corpora) prunes only the Jaccard
    * NUMERATOR: similarity mass on ubiquitous shingles is lost by design
    * (near-dup detection wants to ignore them; set sizes in the
    * denominator stay un-pruned, and the oracle SQL mirrors the same
    * cap). [[ShingleGuard.Off]] gives the textbook-exact values with no
    * frequency pass — and no skew protection. The policy is an ADT, not
    * an Option sentinel, so call sites read as the contract they chose. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      guard: ShingleGuard = ShingleGuard.Auto
  ): DataFrame = {
    // One pass: explode carries the set size alongside each shingle, so no
    // second scan for sizes and no post-aggregation size joins — sizes ride
    // through the shingle join and come out via any_value. The join key is
    // the 64-bit shingle hash, not the string: smaller shuffle/broadcast
    // and cheaper comparisons; a cross-shingle hash collision would need
    // ~2^32 distinct shingles to become likely.
    var exploded = df
      .select(col(idCol), hashedNgrams(col(textCol), shingleSize).as("__hs"))
      .select(col(idCol), size(col("__hs")).as("__sz"),
        explode(col("__hs")).as("shingle"))
    // Skew guard: anti-join against the over-frequent shingles.
    // The AUTO stop list is small by construction — at cap = 0.1% of corpus
    // it holds at most (total shingle instances)/(0.001·N) ≈ 1000 × avg
    // shingles/doc entries of 8 bytes — so broadcasting it is always safe.
    // A USER cap has no such bound (cap=10 on a web corpus stops most
    // shared shingles), so that path anti-joins shuffled, not broadcast.
    if (guard != ShingleGuard.Off) {
      val freq = exploded.groupBy("shingle").agg(count(lit(1)).as("docFreq"))
      exploded = guard match {
        case ShingleGuard.MaxFreq(cap) =>
          exploded.join(freq.filter(col("docFreq") > cap).select("shingle"),
            Seq("shingle"), "left_anti")
        case _ => // auto: max(1000, 0.1% of corpus) via a 1-row scalar join
          val stop = freq.crossJoin(broadcast(df.select(count(lit(1)).as("__total"))))
            .filter(col("docFreq") >
              greatest(lit(1000L), floor(col("__total") / 1000).cast("long")))
            .select("shingle")
          exploded.join(broadcast(stop), Seq("shingle"), "left_anti")
      }
    }
    val a = exploded.select(col("shingle"), col(idCol).as("idA"), col("__sz").as("sizeA"))
    val b = exploded.select(col("shingle"), col(idCol).as("idB"), col("__sz").as("sizeB"))
    a.join(b, Seq("shingle"))
      .filter(col("idA") < col("idB"))
      .groupBy("idA", "idB")
      .agg(
        count(lit(1)).as("common"),
        any_value(col("sizeA")).as("sizeA"),
        any_value(col("sizeB")).as("sizeB"))
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("sizeA") + col("sizeB") - col("common")), 9))
      .filter(col("jaccard") >= threshold)
      .select("idA", "idB", "common", "jaccard")
  }
}

/** Connected-components result: labels (id, cluster) + convergence
  * diagnostics (see [[Dedup.dedupClustersDetailed]]). */
final case class CCResult(labels: DataFrame, rounds: Int, driverPath: Boolean)

/** Hot-bucket cap policy for [[Dedup.blockedCandidatePairs]] — the
  * blocking-tier twin of [[ShingleGuard]] (round-7 advice: the cap was
  * `Option[Int] = None`, i.e. uncapped in-bucket n² BY DEFAULT, exactly
  * where real corpora skew hardest). */
sealed trait BucketCap
object BucketCap {
  /** Drop buckets larger than max(1000, 0.1% of corpus) — the skew-safe
    * default; the hot set is ≤ min(N/1000, 1000) keys by construction,
    * so it broadcasts. */
  case object Auto extends BucketCap
  /** No size pass: every bucket self-joins in full. Explicit opt-out for
    * keys that are unique-ish by construction. */
  case object Off extends BucketCap
  /** Drop buckets larger than `cap` (caller-tuned). */
  final case class Max(cap: Int) extends BucketCap
}

/** Stop-shingle guard policy for [[Dedup.ngramJaccardPairs]] — an explicit
  * ADT (round-2 advice: the old `Option[Int]` overloaded `None` to mean
  * "auto guard", silently changing exact-by-default semantics). */
sealed trait ShingleGuard
object ShingleGuard {
  /** Drop shingles in more than max(1000, 0.1% of corpus) docs — the
    * skew-safe default, mirrored in the oracle SQL. */
  case object Auto extends ShingleGuard
  /** No frequency pass: textbook-exact Jaccard, quadratic blowup risk on
    * corpora with ubiquitous shingles. */
  case object Off extends ShingleGuard
  /** Drop shingles in more than `maxDocFreq` docs (caller-tuned). */
  final case class MaxFreq(maxDocFreq: Int) extends ShingleGuard
}
