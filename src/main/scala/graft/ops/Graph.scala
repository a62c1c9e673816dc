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
      rankCol: String = "rank"
  ): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"pageRank: iters must be in [1, 50], got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"pageRank: damping must be in (0, 1), got $damping")
    require(tol >= 0.0, s"pageRank: tol must be >= 0, got $tol")
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
