package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale BPE vocabulary training (north-star: the real-tokenizer
  * tier for token counting and sequence packing — `bpeishTokenCount`
  * approximates a tokenizer; this BUILDS one from the corpus).
  *
  * The classic Sennrich formulation, shaped for Spark:
  *
  *  1. ONE corpus-shaped aggregate builds the word-frequency table
  *     (word → count) — after this, everything is VOCABULARY-shaped:
  *     merge rounds never rescan the corpus, which is the property that
  *     makes BPE trainable at 100 TB (the vocab table is millions of
  *     rows when the corpus is billions of documents).
  *  2. Each round: count adjacent symbol pairs over the vocab table
  *     weighted by word count (adjacent-INDEX counts, overlap-inclusive
  *     — "aaa" contributes (a,a) twice), pick the winner by
  *     (count DESC, left ASC, right ASC) — a total order, so training
  *     is deterministic bit-for-bit — and rewrite the symbol column
  *     with one greedy left-to-right `merge_pair` pass.
  *  3. The merge list (numMerges rows) is the ONLY driver-side state —
  *     bounded metadata by construction, like the IVF centroids.
  *
  * Each round re-persists the vocab table and unpersists the previous
  * round (the lineage would otherwise deepen by one kernel per round).
  * Cost: numMerges vocabulary-shaped aggregates + one argmax collect
  * each — the op's inherent cost, same as any BPE trainer.
  *
  * Ties and applications are defined exactly as in
  * [[graft.functions.BpeOps]] so the trained merges and the tokenizer
  * agree, and so a DuckDB oracle can restate round N as N unrolled
  * scalar-subquery CTEs over string replaces (q156/q157).
  */
object Bpe {

  /** Trained merge list, rank order: (left, right, pairCount). */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int
  ): Seq[(String, String, Long)] = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges must be in [1, 65536], got $numMerges")
    // corpus-shaped once: word frequencies
    val words0 = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cnt"))
      // code-point symbolization = the tokenize kernel under ZERO merges —
      // one code path for trainer and tokenizer, no drift possible
      .select(col("__cnt"),
        graft.functions.BpeKernels.bpeTokenize(col("__w"), Nil).as("__syms"))
      .persist() // materialized by round 1's pair aggregate

    val merges = Seq.newBuilder[(String, String, Long)]
    var words = words0
    var prev: DataFrame = null
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // this aggregate is ALSO the action that materializes `words`'
      // persist — only after it may the previous round's cache go (a
      // premature unpersist would make round N recompute the whole
      // kernel chain back to the corpus aggregate)
      val best = words
        .select(col("__cnt"), col("__syms"),
          posexplode(col("__syms")).as(Seq("__i", "__l")))
        .withColumn("__r",
          try_element_at(col("__syms"), col("__i") + 2)) // 1-based; null at end
        .filter(col("__r").isNotNull)
        .groupBy(col("__l"), col("__r"))
        .agg(sum(col("__cnt")).as("__pc"))
        .orderBy(col("__pc").desc, col("__l").asc, col("__r").asc)
        .limit(1)
        .collect()
      if (prev != null) { prev.unpersist(); prev = null }
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((l, r, c))
        val next = words
          .withColumn("__syms",
            graft.functions.BpeKernels.mergePair(col("__syms"), l, r))
          .persist()
        prev = words
        words = next
        round += 1
      }
    }
    words.unpersist()
    if (prev != null) prev.unpersist()
    merges.result()
  }

  /** Train and return the merge table as a frame:
    * (rank, left, right, pair_count) — the q156 gate shape. */
  def trainDF(spark: SparkSession, df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    import spark.implicits._
    train(df, textCol, numMerges).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c) }
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Load a persisted merge table (a [[trainDF]] frame written anywhere
    * — e.g. via the `bpe` node key's `save` sink) back into the ordered
    * list [[graft.functions.BpeKernels.bpeTokenize]] takes: the artifact
    * contract that lets a BATCH-trained vocabulary tokenize a STREAM
    * (the tokenizer kernel is stateless scan-stage). */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .select(col("rank"), col("left"), col("right"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq

  /** Apply a trained merge list to a frame: adds `bpe_tokens` (the
    * tokenizer output) and `n_bpe` (its length) — the same columns the
    * `bpe` output=tokens config path adds, but from an ARTIFACT instead
    * of an in-plan training pass. Scan-stage, streaming-admissible (the
    * `bpe_apply` config key). */
  def addTokens(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.withColumn("bpe_tokens",
        graft.functions.BpeKernels.bpeTokenize(col(textCol), merges))
      .withColumn("n_bpe", size(col("bpe_tokens")))

  /** [[addTokens]]' ID sibling: adds `bpe_ids` — the STABLE integer id
    * sequence a training shard actually carries (single code points id
    * as themselves, merge k's symbol as 0x110000+k−1 — growing the
    * merge list only appends ids, so re-training never invalidates old
    * shards; see [[graft.functions.BpeEncodeOps]]). Scan-stage,
    * streaming-admissible (the `bpe_apply` key's `with_ids`). */
  def addIds(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], idsCol: String = "bpe_ids"): DataFrame =
    df.withColumn(idsCol,
      graft.functions.BpeKernels.bpeEncode(col(textCol), merges))

  /** [[addIds]]' INVERSE: adds `bpe_decoded` — each stable id mapped
    * back to its subword string under the same artifact (see
    * [[graft.functions.BpeDecodeOps]]) — the shard-inspection path
    * (tar source → `binary_ints` → decode). Token array, not text:
    * whitespace is not in the ids; `concat_ws('', bpe_decoded)` is the
    * whitespace-stripped character stream of the original (the q233
    * round-trip invariant). Scan-stage, streaming-admissible (the
    * `bpe_apply` key's `decode_col`). */
  def addDecoded(df: DataFrame, idsCol: String,
      merges: Seq[(String, String)],
      decodedCol: String = "bpe_decoded"): DataFrame =
    df.withColumn(decodedCol,
      graft.functions.BpeKernels.bpeDecode(col(idsCol), merges))
}
