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
      topK: Int = 10
  ): DataFrame = {
    require(topK >= 1, s"bm25TopK: topK must be >= 1, got $topK")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"bm25TopK: need k1 >= 0 and b in [0, 1], got k1=$k1 b=$b")
    val dec = DecimalType(38, 12)

    val toks = docs.select(col(idCol).as("__doc"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
    val dl = toks.select(col("__doc"), size(col("__t")).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)), coalesce(sum("__dl"), lit(0L))).head
    val n = stats.getLong(0)
    require(n > 0, "bm25TopK: empty corpus")
    val avgdl = round9(stats.getLong(1).toDouble / n)

    val post = toks.select(col("__doc"), explode(col("__t")).as("__term"))
      .groupBy("__doc", "__term").agg(count(lit(1)).as("__tf"))
    val dfT = post.groupBy("__term").agg(count(lit(1)).as("__df"))
    val qt = queries.select(col(qidCol).as("__qid"),
        explode(TextAnalysis.tokens(col(qtextCol))).as("__term"))
      .distinct()

    val idf = round(log(lit(1.0) +
      (lit(n) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))), 9)
    val termScore = round(idf * (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgdl))), 9)

    val scored = broadcast(qt)
      .join(post, Seq("__term"))
      .join(dfT, Seq("__term"))
      .join(dl, Seq("__doc"))
      .groupBy(col("__qid"), col("__doc"))
      .agg(round(sum(termScore.cast(dec)).cast("double"), 6).as("score"))

    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__doc").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("__qid").as(qidCol), col("__doc").as(idCol),
        col("score"), col("rn"))
  }
}
