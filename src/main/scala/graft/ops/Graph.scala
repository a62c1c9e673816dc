package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link-graph operators for web-corpus curation.
  *
  * A crawl is a graph before it is a corpus: pages link to pages, and a
  * host's position in that graph is one of the strongest
  * no-model-required quality priors there is (the classic web-curation
  * recipe: rank hosts by centrality, keep documents from well-linked
  * hosts, down-weight link farms that heuristic text filters can't see).
  * The edge list comes straight from the existing pipeline —
  * `html_extract` emits hrefs, `url_host` reduces them to authorities —
  * so `pageRank` composes behind the extractors the way the blocklist
  * filter does.
  */
object Graph {

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Driver-side PageRank mirroring the distributed loop's arithmetic
    * EXACTLY: per-edge contributions round to 9 dp and sum as exact
    * BigDecimals (what `sum(round(c,9).cast(decimal(38,12)))` computes —
    * decimal addition is order-insensitive, so both paths agree
    * bit-for-bit), every other op is the same double-IEEE sequence as
    * the Column expressions. Ranks returned in `nodeArr` order. */
  private def pageRankLocal(
      nodeArr: Array[Any],
      edges: Array[(Any, Any)],
      iters: Int,
      damping: Double,
      tol: Double,
      n: Long
  ): Array[Double] = {
    import java.math.BigDecimal
    val idx = new java.util.HashMap[Any, Int](nodeArr.length * 2)
    nodeArr.indices.foreach(i => idx.put(nodeArr(i), i))
    val outdeg = new Array[Long](nodeArr.length)
    val eSrc = new Array[Int](edges.length)
    val eDst = new Array[Int](edges.length)
    var k = 0
    while (k < edges.length) {
      val s = idx.get(edges(k)._1); val d = idx.get(edges(k)._2)
      eSrc(k) = s; eDst(k) = d; outdeg(s) += 1L
      k += 1
    }
    val teleport = (1.0 - damping) / n
    var ranks = Array.fill(nodeArr.length)(round9(1.0 / n))
    var it = 1
    var converged = false
    while (it <= iters && !converged) {
      // contrib[dst] = dsum9(r(src) / outdeg(src)) — exact decimal sum
      // of 9-dp-rounded doubles, cast to double at the end (the Decimal
      // aggregate's value and cast, order-free either way)
      val contrib = new Array[BigDecimal](nodeArr.length)
      k = 0
      while (k < edges.length) {
        val t = BigDecimal.valueOf(round9(ranks(eSrc(k)) / outdeg(eSrc(k)).toDouble))
        val d = eDst(k)
        contrib(d) = if (contrib(d) == null) t else contrib(d).add(t)
        k += 1
      }
      // dangling mass: dsum9 over the ranks of out-degree-0 nodes
      // (round9 is idempotent on already-rounded ranks), 0.0 when none
      var dmSum: BigDecimal = null
      var i = 0
      while (i < nodeArr.length) {
        if (outdeg(i) == 0L) {
          val t = BigDecimal.valueOf(round9(ranks(i)))
          dmSum = if (dmSum == null) t else dmSum.add(t)
        }
        i += 1
      }
      val dm = if (dmSum == null) 0.0 else dmSum.doubleValue()
      val next = new Array[Double](nodeArr.length)
      i = 0
      while (i < nodeArr.length) {
        val c = if (contrib(i) == null) 0.0 else contrib(i).doubleValue()
        next(i) = round9(teleport + damping * (c + dm / n.toDouble))
        i += 1
      }
      if (tol > 0.0) {
        var delta = 0.0
        i = 0
        while (i < nodeArr.length) {
          val d = math.abs(next(i) - ranks(i))
          if (d > delta) delta = d
          i += 1
        }
        if (delta < tol) converged = true
      }
      ranks = next
      it += 1
    }
    ranks
  }

  /** Damped PageRank over an edge list — the host-authority prior.
    *
    * Semantics (the standard uniform-teleport formulation with dangling
    * redistribution): every node starts at 1/N; each iteration
    *   r'(v) = (1−d)/N + d·( Σ_{u→v} r(u)/outdeg(u) + D/N )
    * where D is the total rank sitting on dangling nodes (no out-edges)
    * — redistributed uniformly so rank mass is conserved. Edges are
    * DISTINCT (src, dst) pairs; multi-links don't double-vote. NULL
    * endpoints are dropped.
    *
    * Determinism (what makes the result oracle-gateable): every per-edge
    * contribution rounds to 9 dp and sums in DECIMAL(38,12) (order-
    * insensitive under shuffle retries), every iteration's ranks round
    * to 9 dp, and the dangling mass rides the plan as a broadcast
    * one-row aggregate — bit-identical ranks on every run and engine.
    *
    * Scale: per iteration ONE materializing action — a join of the
    * (persisted, iteration-invariant) edge⋈outdeg frame with the
    * previous ranks, a groupBy(dst) decimal aggregate, and the rank
    * update; iteration state is persisted with lineage TRUNCATED each
    * round (the dedupClusters posture — an un-truncated k-iteration
    * plan re-embeds the whole graph subtree k times and the driver
    * becomes the bottleneck, not the cluster). Ranks are node-shaped
    * (hosts, not documents), edges shuffle on src/dst only — at 100 TB
    * the host graph is orders of magnitude smaller than the corpus that
    * produced it. Batch-only (iterative actions).
    *
    * `tol` > 0 adds a convergence stop: iteration ends early once
    * max |Δrank| < tol (checked with one extra node-shaped aggregate per
    * round over the already-persisted rank frames); `iters` remains the
    * hard cap either way, and tol = 0 (default) keeps the fixed-iteration
    * behavior bit-for-bit.
    *
    * Returns (nodeCol, rankCol) with one row per distinct endpoint.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      damping: Double = 0.85,
      tol: Double = 0.0,
      nodeCol: String = "node",
      rankCol: String = "rank",
      smallGraphEdges: Long = 1L << 20
  ): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"pageRank: iters must be in [1, 50], got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"pageRank: damping must be in (0, 1), got $damping")
    require(tol >= 0.0, s"pageRank: tol must be >= 0, got $tol")
    // The driver cutover collects edges — cap it (the dedupClusters
    // trust-model bound) so a misconfigured caller can't turn bounded
    // metadata into an unbounded collect.
    require(smallGraphEdges <= (1L << 24),
      s"pageRank: smallGraphEdges=$smallGraphEdges exceeds the " +
        s"driver-collect safety cap ${1L << 24}")
    import org.apache.spark.storage.StorageLevel

    val dec = DecimalType(38, 12)
    def dsum9(c: Column): Column = sum(round(c, 9).cast(dec)).cast("double")

    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .na.drop().distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("__src").as("__n"))
      .union(e.select(col("__dst").as("__n"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRank: the edge list has no non-null edges")

    // SMALL-GRAPH CUTOVER (the dedupClusters posture): a host graph is
    // node-shaped — even a 100 TB corpus reduces to maybe millions of
    // hosts — and the iterative plan pays ~1 job with 3-4 shuffles PER
    // ROUND in pure scheduling overhead to move kilobytes. When the
    // whole graph fits the bounded-metadata budget, collect it once and
    // run the SAME arithmetic on the driver: round-to-9dp per-edge
    // contributions summed as exact BigDecimals (the dsum9 decimal sum,
    // order-insensitive both ways), doubles elsewhere in the identical
    // IEEE op order — bit-for-bit the distributed result (GraphSpec
    // gates equality). Graphs above the cap take the distributed loop.
    if (n <= smallGraphEdges && e.count() <= smallGraphEdges) {
      val edgeArr = e.collect().map(r => (r.get(0), r.get(1)))
      val nodeArr = nodes.collect().map(_.get(0))
      val nodeType = nodes.schema.head.dataType
      Seq(e, nodes).foreach(_.unpersist(blocking = false))
      val ranks = pageRankLocal(nodeArr, edgeArr, iters, damping, tol, n)
      val spark = edges.sparkSession
      val rows = nodeArr.indices.map(i =>
        org.apache.spark.sql.Row(nodeArr(i), ranks(i)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(nodeCol, nodeType, nullable = true),
          org.apache.spark.sql.types.StructField(rankCol,
            org.apache.spark.sql.types.DoubleType, nullable = false))))
    }

    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__od"))
    // iteration-invariant: per-edge (src, dst, outdeg(src))
    val eo = e.join(outdeg, Seq("__src")).persist(StorageLevel.MEMORY_AND_DISK)
    val dang = nodes.join(outdeg, nodes("__n") === outdeg("__src"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val teleport = (1.0 - damping) / n // driver doubles; oracle spells the same IEEE ops
    // r0 is a literal over the persisted node set — no cache of its own
    var ranks: DataFrame =
      nodes.select(col("__n"), lit(round9(1.0 / n)).as("__r"))
    var prevCache: Option[DataFrame] = None

    var it = 1
    var converged = false
    while (it <= iters && !converged) {
      val contrib = eo.join(ranks, eo("__src") === ranks("__n"))
        .groupBy(col("__dst"))
        .agg(dsum9(col("__r") / col("__od")).as("__c"))
      val dm = ranks.join(dang, Seq("__n"), "left_semi")
        .agg(coalesce(dsum9(col("__r")), lit(0.0)).as("__dm"))
      val next = nodes.join(contrib, nodes("__n") === contrib("__dst"), "left")
        .crossJoin(broadcast(dm))
        .select(col("__n"),
          round(lit(teleport) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) + col("__dm") / lit(n.toDouble)),
            9).as("__r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // one materializing action per round
      // Convergence stop (tol > 0): max |Δrank| over the two PERSISTED
      // rank frames — one node-shaped aggregate per round, no rescans of
      // the edge list. `iters` stays the hard cap, so a cyclic rank
      // oscillation can never spin unbounded.
      if (tol > 0.0) {
        val delta = next
          .join(ranks.select(col("__n"), col("__r").as("__rp")), Seq("__n"))
          .agg(max(abs(col("__r") - col("__rp"))).as("__d"))
          .head.getDouble(0)
        if (delta < tol) converged = true
      }
      prevCache.foreach(_.unpersist(blocking = false))
      prevCache = Some(next)
      ranks = org.apache.spark.sql.GraftColumnBridge.truncateLineage(next)
      it += 1
    }
    Seq(e, nodes, eo, dang).foreach(_.unpersist(blocking = false))
    ranks.select(col("__n").as(nodeCol), col("__r").as(rankCol))
  }
}
