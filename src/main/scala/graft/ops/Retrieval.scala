package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lexical retrieval over the corpus — BM25, the ranking function behind
  * every serious keyword search and the retrieval step of
  * retrieval-based decontamination ("which training documents would
  * answer this benchmark question?") and targeted corpus audits.
  */
object Retrieval {

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** BM25 top-k: score every (query, document) pair that shares a term
    * and keep each query's `topK` best. The Lucene BM25 variant:
    *
    *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))   (never negative)
    *   score(q, d) = Σ_{t∈q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Determinism: avgdl and every per-term contribution round to 9 dp
    * and sum in DECIMAL; the final score rounds to 6 dp (ln is the only
    * libm call — the lmPerplexity posture), and ranking ties break by
    * doc id, so the exact (query, doc, score, rank) table has a full
    * SQL oracle.
    *
    * `proxWeight` > 0 adds a POSITIONAL term: the same BM25 formula
    * over adjacent-token BIGRAM postings, weighted by `proxWeight` —
    * a doc containing the query's words in order (a verbatim benchmark
    * string) now outranks one containing them scattered, which is
    * exactly what bag-of-words decontamination misses. Bigrams are the
    * positions' adjacency structure, so the postings stay
    * (doc, term, tf)-shaped: shuffle ∝ tokens again, no per-position
    * rows, no positional join. `proxWeight = 0` (default) skips the
    * bigram plan entirely — byte-identical to plain BM25.
    *
    * Scale: the corpus tokenizes once into postings (shuffle ∝ tokens,
    * map-side combined); the QUERY term set broadcasts (a benchmark /
    * audit query set is small by nature), so only postings matching a
    * query term continue past the broadcast join; document frequencies
    * are a vocabulary-shaped aggregate; top-k per query is one window →
    * WindowGroupLimit, never a global sort. Batch-only (the N/avgdl
    * stats need an action).
    *
    * Returns (qidCol, idCol, score, rn).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qidCol: String,
      qtextCol: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      proxWeight: Double = 0.0
  ): DataFrame = {
    require(topK >= 1, s"bm25TopK: topK must be >= 1, got $topK")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"bm25TopK: need k1 >= 0 and b in [0, 1], got k1=$k1 b=$b")
    require(proxWeight >= 0, s"bm25TopK: prox_weight must be >= 0, got $proxWeight")

    // ONE tokenize pass (the saveBm25Index persist posture): stats, the
    // postings build per term granularity, and the dl attach each walk
    // the tokenized corpus — unpersisted, that was 3 (4 with prox)
    // scan→tokenize passes per call, and the stats action below
    // materializes the cache so every later pass reuses it. Released by
    // the harness cache sweep; at 100 TB prefer the at-rest index
    // (saveBm25Index + bm25SearchIndex) for repeated query batches.
    val toks = docs.select(col(idCol).as("__doc"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.compile.Compiler.trackOperatorCache(toks)
    val dl = toks.select(col("__doc"), size(col("__t")).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)), coalesce(sum("__dl"), lit(0L))).head
    val n = stats.getLong(0)
    require(n > 0, "bm25TopK: empty corpus")
    val avgdl = round9(stats.getLong(1).toDouble / n)
    def postingsOver(docTerms: Column): DataFrame =
      toks.select(col("__doc"), explode(docTerms).as("__term"))
        .groupBy("__doc", "__term").agg(count(lit(1)).as("__tf"))
    val biP =
      if (proxWeight == 0.0) None
      else Some(postingsOver(bigrams(col("__t"))))
    bm25Rank(postingsOver(col("__t")), biP, dl, n, avgdl,
      queries, qidCol, qtextCol, k1, b, topK, proxWeight, idCol)
  }

  /** Adjacent-token bigrams of a token array (empty below 2 tokens) —
    * the positional term granularity of [[bm25TopK]]'s proxWeight. */
  private[graft] def bigrams(t: Column): Column = when(size(t) >= 2,
    zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, bb) => concat(a, lit(" "), bb)))
    .otherwise(array().cast("array<string>"))

  /** The shared BM25 ranking core over prepared postings — one code path
    * for the in-memory [[bm25TopK]] and the at-rest [[bm25SearchIndex]],
    * so their scores are bit-identical by construction. Posting frames
    * are (__doc, __term, __tf); document frequencies are computed over
    * the postings RESTRICTED to the query terms (per-term doc counts are
    * unaffected by dropping other terms — and at corpus scale this is
    * what keeps the vocabulary aggregate query-shaped). */
  private def bm25Rank(
      uniP: DataFrame,
      biP: Option[DataFrame],
      dl: DataFrame,
      n: Long,
      avgdl: Double,
      queries: DataFrame,
      qidCol: String,
      qtextCol: String,
      k1: Double,
      b: Double,
      topK: Int,
      proxWeight: Double,
      idColName: String
  ): DataFrame = {
    val dec = DecimalType(38, 12)
    val idf = round(log(lit(1.0) +
      (lit(n) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))), 9)
    val termScore = round(idf * (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgdl))), 9)

    // (qid, doc, 9-dp decimal contribution) over one term granularity:
    // unigrams and bigrams share every downstream shape (matched
    // postings, df, broadcast join, dl normalization)
    def contribsOver(p: DataFrame, queryTerms: Column,
        weight: Double): DataFrame = {
      val qt = queries.select(col(qidCol).as("__qid"),
          explode(queryTerms).as("__term"))
        .distinct()
      // matched postings are QUERY-shaped (only postings on query terms
      // survive the broadcast semi-join) and feed TWO consumers — the df
      // aggregate and the contribution join. Persist so the corpus-side
      // postings pass (in-memory path) / pruned index scan (at-rest
      // path) runs once, not once per consumer.
      val matched = p.join(
        broadcast(qt.select(col("__term")).distinct()), Seq("__term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.compile.Compiler.trackOperatorCache(matched)
      val dfT = matched.groupBy("__term").agg(count(lit(1)).as("__df"))
      val s =
        if (weight == 1.0) termScore
        else round(lit(weight) * termScore, 9)
      broadcast(qt)
        .join(matched, Seq("__term"))
        .join(dfT, Seq("__term"))
        .join(dl, Seq("__doc"))
        .select(col("__qid"), col("__doc"), s.cast(dec).as("__s"))
    }
    val qToks = TextAnalysis.tokens(col(qtextCol))
    val uni = contribsOver(uniP, qToks, 1.0)
    val contribs = biP match {
      case None => uni
      case Some(bp) => uni.unionAll(contribsOver(bp, bigrams(qToks), proxWeight))
    }

    val scored = contribs
      .groupBy(col("__qid"), col("__doc"))
      .agg(round(sum(col("__s")).cast("double"), 6).as("score"))

    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__doc").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("__qid").as(qidCol), col("__doc").as(idColName),
        col("score"), col("rn"))
  }

  /** (doc, term, tf, bucket) postings over an already-tokenized
    * (doc, __t) frame — the one posting build the batch build/append
    * and the streaming ingest all share (term-hash bucketing must be
    * bit-identical across the three, or searches prune to the wrong
    * partitions). */
  private[graft] def postingsOf(
      toks: DataFrame, docTerms: Column, buckets: Int): DataFrame =
    toks.select(col("doc"), explode(docTerms).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))

  /** Persist an AT-REST BM25 index — the `ann_index` artifact pattern
    * applied to lexical retrieval (tokenize once, search many): at
    * 100 TB the postings build is the expensive pass (a full corpus
    * tokenize + shuffle), and re-paying it for every audit query batch
    * is the cost this artifact amortizes. Layout under `dir`:
    *
    *   - `postings`  (doc, term, tf) PARTITIONED BY a stable term-hash
    *     `bucket` (pmod(xxhash64(term), buckets)) — a search maps its
    *     terms to their buckets and prunes the scan to those partition
    *     directories (the ann_search list-pruning posture; a handful of
    *     audit terms touch a handful of buckets)
    *   - `postings2` the bigram postings, only with `prox = true` —
    *     proximity search needs them at search time
    *   - `dl`        (doc, dl) — document lengths (doc-shaped)
    *   - `stats`     ONE row (n_docs, sum_dl, buckets, prox, id_col) —
    *     avgdl derives from the exact sums, id_col names the output
    *   - `postings_inc` / `postings2_inc` / `dl_inc` — OPTIONAL
    *     streaming-ingest DELTA areas ([[graft.streaming.Streaming
    *     .bm25Ingest]] writes one overwritten `batch=<id>` child per
    *     micro-batch for idempotent replays); every reader unions them
    *     with the base, [[compactBm25Index]] folds them in
    *
    * Document frequencies are NOT persisted: they are computed at
    * search time over the postings restricted to the query terms
    * (query-shaped, exact) — which is also what makes APPENDS exact:
    * [[appendBm25Index]] appends postings/dl and refreshes stats, and
    * df/idf/avgdl all reflect the union corpus with no merge step. */
  def saveBm25Index(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      prox: Boolean = false,
      buckets: Int = 64
  ): Unit = {
    require(buckets >= 1 && buckets <= 65536,
      s"saveBm25Index: buckets must be in [1, 65536], got $buckets")
    // ONE tokenize pass: the 2-3 writes below (postings, bigram
    // postings, dl) each trigger an action, and without the persist
    // each would re-scan and re-tokenize the corpus — the very cost
    // this artifact exists to amortize. Spill-safe cache for the build
    // duration only.
    val toks = docs.select(col(idCol).as("doc"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      postingsOf(toks, col("__t"), buckets)
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
      if (prox)
        postingsOf(toks, bigrams(col("__t")), buckets)
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings2")
      else if (Artifacts.dirExists(spark, s"$dir/postings2")) {
        // a prox=true artifact previously lived here — a stale bigram
        // posting set would silently persist (and compaction would keep
        // rewriting dead data); this is a REBUILD, drop it
        val p = new org.apache.hadoop.fs.Path(s"$dir/postings2")
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
        ()
      }
      val dl = toks.select(col("doc"), size(col("__t")).cast("long").as("dl"))
      dl.write.mode("overwrite").parquet(s"$dir/dl")
      // A REBUILD also invalidates any streaming-ingest delta areas —
      // leftover batch dirs would silently union stale docs into every
      // later search. The rebuild is NOT crash-atomic: the overwrites
      // above replace the base in place, and the stale deltas are swept
      // here, after the base writes and BEFORE the stats refresh (stats
      // must never count stale deltas against the new base) — a crash
      // anywhere mid-rebuild can leave a part-written base and/or
      // un-swept deltas, so a crashed rebuild must simply be RE-RUN
      // (it is idempotent over the same input).
      Seq("postings_inc", "postings2_inc", "dl_inc")
        .foreach(sub => Artifacts.deleteDir(spark, s"$dir/$sub"))
      // stats from the cached toks, not a re-read of the dl parquet just
      // written from them: the deltas were swept above, so the landed dl
      // IS this frame — same exact sums, one less listing+scan job
      val st = toks.agg(count(lit(1)),
        coalesce(sum(size(col("__t")).cast("long")), lit(0L))).head
      require(st.getLong(0) > 0, "saveBm25Index: empty corpus")
      require(st.getLong(1) > 0,
        "saveBm25Index: the corpus tokenizes to ZERO tokens (every text " +
          "empty/whitespace) — there is nothing to index")
      writeBm25StatsRow(spark, dir, st.getLong(0), st.getLong(1),
        buckets, prox, idCol)
    } finally {
      toks.unpersist()
      ()
    }
  }

  /** Read one of the index's tables as base ∪ streaming-ingest DELTA:
    * [[graft.streaming.Streaming.bm25Ingest]] lands each micro-batch as
    * an OVERWRITTEN `batch=<id>` child of `<sub>_inc` (idempotent
    * replays — appending into the base layout could double-land a
    * replayed batch), and every reader unions the two areas. The delta's
    * `batch` partition column is bookkeeping, never data. Bucket
    * partition pruning applies on BOTH sides of the union (bucket is a
    * partition column in each layout). */
  private def readIndexTable(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, sub: String): DataFrame =
    Artifacts.readWithInc(spark, s"$dir/$sub", s"$dir/${sub}_inc")

  /** Refresh `dir/stats` from the landed `dir/dl` (∪ delta) — exact at
    * any append count (one aggregate over the doc-shaped dl table). */
  private[graft] def writeBm25Stats(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      buckets: Int, prox: Boolean, idCol: String): Unit = {
    val st = readIndexTable(spark, dir, "dl")
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head
    require(st.getLong(0) > 0, "saveBm25Index: empty corpus")
    // zero tokens corpus-wide = zero postings = a FILELESS postings dir
    // that later search/stats/compact would die on with an unnamed
    // parquet schema error — reject the contract violation by name
    require(st.getLong(1) > 0,
      "saveBm25Index: the corpus tokenizes to ZERO tokens (every text " +
        "empty/whitespace) — there is nothing to index")
    writeBm25StatsRow(spark, dir, st.getLong(0), st.getLong(1),
      buckets, prox, idCol)
  }

  /** Write the one-row stats table from ALREADY-COMPUTED exact sums —
    * the O(delta) path [[graft.streaming.Streaming.bm25Ingest]] uses
    * (base sums cached per stream + one aggregate over the small delta;
    * re-aggregating the full doc-shaped dl per micro-batch would make
    * ingest cost O(corpus) per batch). */
  private[graft] def writeBm25StatsRow(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      nDocs: Long, sumDl: Long, buckets: Int, prox: Boolean,
      idCol: String): Unit = {
    import spark.implicits._
    Seq((nDocs, sumDl, buckets, prox, idCol))
      .toDF("n_docs", "sum_dl", "buckets", "prox", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  private[graft] def readBm25Stats(
      spark: org.apache.spark.sql.SparkSession, indexDir: String) = {
    val st =
      try spark.read.parquet(s"$indexDir/stats").collect()
      catch { case e: Exception => throw new IllegalArgumentException(
        s"bm25 index: cannot read stats under $indexDir/stats — build " +
          s"the index first (bm25_index / saveBm25Index): ${e.getMessage}") }
    require(st.length == 1, s"bm25 index: damaged stats under $indexDir/stats")
    st.head
  }

  /** APPEND documents to a [[saveBm25Index]] artifact: new postings and
    * lengths land in place (bucket partitions for postings), stats
    * refresh exactly from the full dl table. Because df computes at
    * search time, a search after an append reflects the UNION corpus
    * exactly — bit-identical to a fresh [[bm25TopK]] over everything.
    * Caller contract: doc ids should be fresh (a re-landed id keeps
    * both copies, like tar members without a batch column). */
  def appendBm25Index(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String
  ): Unit = {
    val st = readBm25Stats(spark, dir)
    // A batch append beside a LIVE bm25_ingest stream would corrupt the
    // stream's cached base stats (it adds base docs the stream cannot
    // see) — a silent idf/avgdl drift. Deltas present = a stream owns
    // this index: reject by name; compact first (folds the deltas, and
    // the stream re-reads the base on its next batch) or route the rows
    // through the stream.
    require(!Artifacts.incHasData(spark, s"$dir/dl_inc"),
      s"appendBm25Index: $dir has live streaming deltas (dl_inc) — a " +
        "batch append beside a bm25_ingest stream silently corrupts the " +
        "stream's cached stats; run bm25_index mode:\"compact\" first " +
        "or feed the rows through the stream")
    val buckets = st.getAs[Int]("buckets")
    val prox = st.getAs[Boolean]("prox")
    // one tokenize pass across the 2-3 appends (see saveBm25Index)
    val toks = docs.select(col(idCol).as("doc"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      postingsOf(toks, col("__t"), buckets)
        .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
      if (prox)
        postingsOf(toks, bigrams(col("__t")), buckets)
          .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings2")
      toks.select(col("doc"), size(col("__t")).cast("long").as("dl"))
        .write.mode("append").parquet(s"$dir/dl")
      writeBm25Stats(spark, dir, buckets, prox, st.getAs[String]("id_col"))
    } finally {
      toks.unpersist()
      ()
    }
  }

  /** COMPACT a [[saveBm25Index]] artifact: every [[appendBm25Index]]
    * lands one more file set per touched bucket (and one more dl file
    * set) — after many appends the footer reads dominate the
    * bucket-pruned scan. Rewrites postings (and prox postings, when
    * present) to ONE file per bucket, and `dl` — which EVERY search
    * reads for the doc-length attach, so its per-append file sets
    * dominate search-side footer reads just like postings — to
    * size-targeted files, FOLDING IN any streaming-ingest delta areas
    * (`*_inc` — see [[graft.streaming.Streaming.bm25Ingest]]) along the
    * way. stats stays as-is (1 file by construction). Searches
    * before/after are bit-identical (gated). */
  def compactBm25Index(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      maxBatchId: Option[Long] = None,
      defragWhenEmpty: Boolean = true,
      strict: Boolean = true): Int = {
    val p = Artifacts.foldIncInto(spark, s"$dir/postings",
      s"$dir/postings_inc", Some("bucket"), maxBatchId, defragWhenEmpty,
      strict)
    val p2 =
      if (Artifacts.dirExists(spark, s"$dir/postings2"))
        Artifacts.foldIncInto(spark, s"$dir/postings2",
          s"$dir/postings2_inc", Some("bucket"), maxBatchId, defragWhenEmpty,
          strict)
      else 0
    val dl = Artifacts.foldIncInto(spark, s"$dir/dl", s"$dir/dl_inc", None,
      maxBatchId, defragWhenEmpty, strict)
    p + p2 + dl // retired delta dirs, the observability count
  }

  /** Health view over a [[saveBm25Index]] artifact — the
    * [[graft.ops.Similarity.annIndexStats]] gauge for the lexical
    * family: one row (n_docs, sum_dl, buckets, prox, n_postings,
    * max_bucket_n, mean_bucket_n, skew) where the bucket stats are over
    * ALL buckets (empty ones included) and skew = max/mean — the
    * term-hash is content-addressed, so a drifting skew means a few
    * pathological terms (boilerplate tokens) dominate their buckets and
    * searches touching them re-read those heavy partitions. Scale: one
    * count-by-bucket aggregate whose scan prunes to the partition
    * column; no posting data moves. */
  def bm25IndexStats(
      spark: org.apache.spark.sql.SparkSession, indexDir: String): DataFrame = {
    val st = readBm25Stats(spark, indexDir)
    val nb = st.getAs[Int]("buckets")
    readIndexTable(spark, indexDir, "postings")
      .groupBy(col("bucket")).agg(count(lit(1)).as("__n"))
      .agg(
        lit(st.getAs[Long]("n_docs")).as("n_docs"),
        lit(st.getAs[Long]("sum_dl")).as("sum_dl"),
        lit(nb).as("buckets"),
        lit(st.getAs[Boolean]("prox")).as("prox"),
        coalesce(sum(col("__n")), lit(0L)).cast("long").as("n_postings"),
        coalesce(max(col("__n")), lit(0L)).cast("long").as("max_bucket_n"),
        round(coalesce(sum(col("__n")), lit(0L)) / lit(nb.toDouble), 9)
          .as("mean_bucket_n"))
      .withColumn("skew", round(
        when(col("n_postings") > 0,
          col("max_bucket_n") * lit(nb.toDouble) / col("n_postings"))
          .otherwise(lit(0.0)), 9))
  }

  /** BM25 top-k against a [[saveBm25Index]] artifact — bit-identical to
    * [[bm25TopK]] over the same corpus at the same parameters (the
    * shared [[bm25Rank]] core; RetrievalSpec asserts it), without
    * re-tokenizing the corpus: the query terms' buckets prune the
    * postings scan (broadcast equi-join on the partition column), df is
    * a query-shaped aggregate over the matched postings, avgdl derives
    * from the stats row. `proxWeight > 0` needs an index built with
    * `prox = true` (rejected by name otherwise). Returns
    * (qidCol, <the index's id_col>, score, rn). Batch-shaped. */
  def bm25SearchIndex(
      queries: DataFrame,
      qidCol: String,
      qtextCol: String,
      indexDir: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      proxWeight: Double = 0.0
  ): DataFrame = {
    require(topK >= 1, s"bm25SearchIndex: topK must be >= 1, got $topK")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"bm25SearchIndex: need k1 >= 0 and b in [0, 1], got k1=$k1 b=$b")
    require(proxWeight >= 0,
      s"bm25SearchIndex: prox_weight must be >= 0, got $proxWeight")
    val spark = queries.sparkSession
    val st = readBm25Stats(spark, indexDir)
    val n = st.getAs[Long]("n_docs")
    val buckets = st.getAs[Int]("buckets")
    require(qidCol != st.getAs[String]("id_col"),
      s"bm25SearchIndex: the query id column '$qidCol' collides with " +
        s"the index's stored id_col — the output would carry two " +
        s"'$qidCol' columns; rename the query id (the ann_search " +
        "'match_id' rule)")
    require(proxWeight == 0.0 || st.getAs[Boolean]("prox"),
      s"bm25SearchIndex: prox_weight > 0 but the index under $indexDir " +
        "was built without prox postings — rebuild with prox: true")
    val avgdl = round9(st.getAs[Long]("sum_dl").toDouble / n)
    val dl = readIndexTable(spark, indexDir, "dl")
      .select(col("doc").as("__doc"), col("dl").as("__dl"))
    // bucket-pruned postings: the query terms' DISTINCT buckets are
    // bounded metadata (<= `buckets` ints — never row data), so they
    // collect once and prune the scan as a LITERAL isin on the
    // partition column — STATIC partition pruning, planned before any
    // file is listed. (Dynamic partition pruning does not fire for
    // this broadcast-join shape — verified by plan audit — hence the
    // explicit literal; the cost is one query-shaped action per term
    // granularity.) The broadcast equi-join then matches exact terms
    // within the surviving buckets.
    def matchedP(sub: String, queryTerms: Column): DataFrame = {
      val qt = queries.select(explode(queryTerms).as("term")).distinct()
        .withColumn("bucket",
          pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      val bucketIds = qt.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toSeq
      readIndexTable(spark, indexDir, sub)
        .filter(col("bucket").isInCollection(bucketIds))
        .join(broadcast(qt), Seq("bucket", "term"))
        .select(col("doc").as("__doc"), col("term").as("__term"),
          col("tf").as("__tf"))
    }
    val qToks = TextAnalysis.tokens(col(qtextCol))
    val uniP = matchedP("postings", qToks)
    val biP =
      if (proxWeight == 0.0) None
      else Some(matchedP("postings2", bigrams(qToks)))
    bm25Rank(uniP, biP, dl, n, avgdl, queries, qidCol, qtextCol,
      k1, b, topK, proxWeight, st.getAs[String]("id_col"))
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (Cormack/Clarke/Büttcher, SIGIR'09): fuse ranked lists that have NO
    * comparable scores (lexical BM25 vs dense ANN cosine — the hybrid
    * search every modern retrieval stack runs) purely by rank:
    *
    *   rrf(q, d) = Σ_lists 1 / (rrfK + rank_list(q, d))
    *
    * summed over the lists the doc appears in. Input is the UNION of the
    * ranked lists as (queryCol, docCol, rankCol) rows — e.g.
    * [[bm25TopK]]'s (qid, doc, rn) unioned with
    * [[Similarity.cosineTopK]]/annSearchIndex's (query, match, rank),
    * columns renamed to a shared shape (the config spelling: `combine`
    * two children, then `rrf_fuse`). A doc may appear once per list;
    * duplicate (query, doc) rows from the SAME list simply add their
    * reciprocal weights (garbage in, garbage out — dedup lists first).
    *
    * Determinism: each reciprocal weight rounds to 9 dp and sums in
    * DECIMAL (order-free), the fused score rounds to 9 dp, ranking ties
    * break by doc id — the exact output table has a full SQL oracle.
    * NULL or < 1 ranks raise by name (a NULL rank would silently drop
    * the list's contribution). `weightCol` makes it WEIGHTED RRF
    * (per-list weights derived upstream; w/(k+rank), NULL/negative
    * weights raise, 0 is a legitimate ablation).
    *
    * Scale: ONE (query, doc)-keyed aggregate + one per-query rank window
    * (WindowGroupLimit under the topK filter). The input is top-k-shaped
    * (Σ list sizes), never corpus-shaped — fusing a million queries × a
    * handful of lists is a small job regardless of corpus size.
    * Batch-only by name (the rank window). Returns
    * (queryCol, docCol, rrf_score, rn). */
  def rrfFuse(
      rankings: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      topK: Int = 10,
      rrfK: Int = 60,
      weightCol: Option[String] = None
  ): DataFrame = {
    require(topK >= 1, s"rrfFuse: topK must be >= 1, got $topK")
    require(rrfK >= 0, s"rrfFuse: rrfK must be >= 0, got $rrfK")
    weightCol.foreach(w => require(rankings.columns.contains(w),
      s"rrfFuse: weight column '$w' is not in the frame " +
        s"(has: ${rankings.columns.mkString(", ")})"))
    val dec = DecimalType(38, 12)
    val rank = when(col(rankCol).isNotNull && col(rankCol) >= 1,
      col(rankCol).cast("double")).otherwise(raise_error(
      lit(s"rrfFuse: NULL or < 1 rank in '$rankCol' — every ranked-list " +
        "row needs a 1-based rank")))
    // WEIGHTED RRF (the hybrid-search tuning knob every stack exposes —
    // "dense x0.7 + lexical x0.3"): each row's reciprocal contribution
    // scales by its list's weight, derived upstream (a CASE over the
    // list tag). NULL/negative weights raise by name — a NULL would
    // silently drop the list's contribution; weight 0 is a legitimate
    // ablation (the list contributes nothing but its docs still rank).
    val listW = weightCol match {
      case None => lit(1.0)
      case Some(w) => when(col(w).isNotNull && col(w) >= 0,
        col(w).cast("double")).otherwise(raise_error(
        lit(s"rrfFuse: NULL or negative weight in '$w' — every ranked " +
          "row needs a weight >= 0 (or drop weight_col for plain RRF)")))
    }
    val wgt = round(listW / (lit(rrfK.toDouble) + rank), 9)
    val scored = rankings
      .select(col(queryCol).as("__q"), col(docCol).as("__d"), wgt.cast(dec).as("__w"))
      .groupBy("__q", "__d")
      .agg(round(sum(col("__w")).cast("double"), 9).as("rrf_score"))
    val w = Window.partitionBy(col("__q"))
      .orderBy(col("rrf_score").desc, col("__d").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("__q").as(queryCol), col("__d").as(docCol),
        col("rrf_score"), col("rn"))
  }

  /** Ranking-quality evaluation — the tuning loop for every retrieval
    * knob in this engine (bm25 k1/b/prox_weight, ann nprobe/nlist,
    * rrf_k): join a ranked result table against relevance judgments and
    * emit the standard per-query metrics at cutoff `k`:
    *
    *   - `n_rel`           relevant docs judged for the query
    *   - `hits_at_k`       relevant docs retrieved in the top k
    *   - `rr_at_k`         1/rank of the first relevant doc (0 if none
    *                       in the top k) — mean over queries = MRR@k
    *   - `recall_at_k`     hits / n_rel
    *   - `precision_at_k`  hits / k
    *
    * The evaluation universe is the QRELS queries (one output row per
    * distinct qrels query — a query with results but no judgments has
    * undefined relevance and is excluded; a judged query with no hits
    * scores 0). Ratios round to 9 dp (exact for these small rationals);
    * macro-average downstream with `davg` for the corpus-level number.
    *
    * Scale: BOTH sides dedupe on (query, doc) — results additionally
    * filter to rank ≤ k (keeping min rank per doc) — BEFORE the join — both sides are judgment/top-k-shaped, the joins
    * are equi-joins, the aggregate is query-keyed with map-side combine.
    * Corpus size never enters. Batch-only by name (metric aggregates).
    * Returns (queryCol, n_rel, hits_at_k, rr_at_k, recall_at_k,
    * precision_at_k). */
  def rankingEval(
      results: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      qrels: DataFrame,
      k: Int = 10
  ): DataFrame = {
    require(k >= 1, s"rankingEval: k must be >= 1, got $k")
    require(qrels.columns.contains(queryCol) && qrels.columns.contains(docCol),
      s"rankingEval: qrels must carry '$queryCol' and '$docCol' " +
        s"(has: ${qrels.columns.mkString(", ")})")
    val rank = when(col(rankCol).isNotNull && col(rankCol) >= 1,
      col(rankCol).cast("long")).otherwise(raise_error(
      lit(s"rankingEval: NULL or < 1 rank in '$rankCol'")))
    // one row per (query, doc): a doc listed twice inside the top k (a
    // fused or concatenated result table) must count as ONE hit — raw
    // duplicate rows would each match a judgment, letting hits_at_k
    // exceed n_rel and recall_at_k exceed 1.0. min(rank) keeps rr exact.
    val topk = results.select(col(queryCol).as("__q"), col(docCol).as("__d"),
        rank.as("__r"))
      .filter(col("__r") <= k)
      .groupBy("__q", "__d").agg(min(col("__r")).as("__r"))
    val judged = qrels.select(col(queryCol).as("__q"), col(docCol).as("__d"))
      .distinct()
    val perQ = judged.groupBy("__q").agg(count(lit(1)).as("n_rel"))
    val hitAgg = judged.join(topk, Seq("__q", "__d"))
      .groupBy("__q")
      .agg(count(lit(1)).as("__hits"), min(col("__r")).as("__first"))
    perQ.join(hitAgg, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol),
        col("n_rel"),
        coalesce(col("__hits"), lit(0L)).as("hits_at_k"),
        round(when(col("__first").isNotNull,
          lit(1.0) / col("__first")).otherwise(lit(0.0)), 9).as("rr_at_k"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") /
          col("n_rel"), 9).as("recall_at_k"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") /
          lit(k.toDouble), 9).as("precision_at_k"))
  }
}
