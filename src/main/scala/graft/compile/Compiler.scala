package graft.compile

import graft.spec._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spec ⇒ DataFrame compiler.
  *
  * Pure plan composition: NO actions are taken while compiling — unlike the
  * reference, which runs `df.rdd.isEmpty()` per recursion level
  * (`sparks/optimus.py:8`, an executor round-trip per node) and materializes
  * each child before joining. Here the whole config tree becomes one lazy
  * logical plan; Catalyst then pushes filters into the parquet scans, prunes
  * columns across node boundaries, and (with AQE) picks broadcast vs
  * shuffled joins per child — which is what makes the recursive tree viable
  * at 100 TB: a small aggregated child side is broadcast automatically
  * instead of shuffling the parent fact table.
  */
object Compiler {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Detects the O(partition²) window-frame shape in a derive
    * expression string (see the derive-site warning): ANY frame whose
    * upper bound is UNBOUNDED FOLLOWING re-scans the partition
    * remainder per output row (UnboundedFollowingWindowFunctionFrame) —
    * CURRENT ROW AND ..., N PRECEDING AND ..., N FOLLOWING AND ... are
    * all the same trap. The ONE exception is the whole-partition
    * [unboundedPreceding, unboundedFollowing] frame, computed once per
    * partition (UnboundedWindowFunctionFrame, O(n)) — it must NOT warn,
    * since rewriting it to a running frame would also change its
    * semantics. */
  private val anyUnboundedFollowingRe =
    """(?is)and\s+unbounded\s+following""".r
  private val wholePartitionRe =
    """(?is)unbounded\s+preceding\s+and\s+unbounded\s+following""".r
  private[graft] def hasQuadraticFrame(e: String): Boolean =
    anyUnboundedFollowingRe.findAllIn(e).size >
      wholePartitionRe.findAllIn(e).size

  /** Compile warnings (scale lints, ignored-key notes) accumulate per
    * THREAD alongside log.warn, because log.warn alone is invisible to
    * a config author running through the driver or a notebook — the
    * O(n²) window-frame trap the engine's own operators were purged of
    * stays silently reinventable through `derive` config otherwise.
    * [[drainCompileWarnings]] returns-and-clears them; `graft.Explain`
    * prints them above each plan (the place plans are reviewed), and
    * tests assert on them. */
  private val threadWarnings =
    new ThreadLocal[scala.collection.mutable.ListBuffer[String]] {
      override def initialValue() = scala.collection.mutable.ListBuffer[String]()
    }

  private def warn(msg: String): Unit = {
    log.warn(msg)
    val b = threadWarnings.get()
    // bounded: a long-lived driver compiling warning-producing specs in
    // a loop without ever draining must not grow this without limit —
    // keep the newest 256 (Explain pre-drains, so staleness is its own
    // concern, not capacity's)
    if (b.size >= 256) { b.remove(0); () }
    b += msg
    ()
  }

  /** The compile warnings accumulated on this thread since the last
    * drain (cleared by the call). */
  def drainCompileWarnings(): Seq[String] = {
    val b = threadWarnings.get()
    val out = b.toList
    b.clear()
    out
  }

  /** Persisted `cache: true` def stages, keyed by the compiled root
    * DataFrame they back (identity — DataFrame has reference equality).
    * A compile that persists defs REGISTERS them here; nothing in Spark
    * would otherwise ever release them, so a long-lived driver compiling
    * many configs (or a bench loop) accumulates dead cache entries in
    * the block manager until memory pressure evicts useful blocks. Weak
    * keys let an abandoned-before-release result be re-released by
    * [[releaseAllCaches]]; the companion strong set makes that sweep
    * complete even after key collection. */
  private val persistedByResult =
    new java.util.WeakHashMap[DataFrame, Seq[DataFrame]]()
  private val allPersisted =
    java.util.Collections.newSetFromMap(new java.util.WeakHashMap[DataFrame, java.lang.Boolean]())

  /** Does ANY node in this subtree (the node, its combine legs, its
    * children) carry cache: true? Shared by the batch and streaming defs
    * guards — a nested cache must be rejected identically in both. */
  private def anyCached(n: NodeSpec): Boolean =
    n.cache || n.combine.exists(_.nodes.exists(anyCached)) ||
      n.children.exists(c => anyCached(c.node))

  private def trackPersisted(result: DataFrame, cached: Seq[DataFrame]): Unit =
    if (cached.nonEmpty) persistedByResult.synchronized {
      // merge — a compile registers def caches and operator-internal
      // caches separately against the same root
      val prior = Option(persistedByResult.get(result)).getOrElse(Nil)
      persistedByResult.put(result, prior ++ cached)
      cached.foreach(allPersisted.add)
    }

  /** OPERATOR-INTERNAL persists (e.g. collocations' vocabulary-shaped
    * counts table) — swept by [[releaseAllCaches]], the bench/test
    * hygiene hammer. STRONG references on purpose, unlike the def-cache
    * registry above: the operator's result is usually an intermediate
    * frame nobody retains, so a weak entry could be collected while
    * Spark's CacheManager still pins the cached blocks — the registry
    * would forget a cache it can no longer release (an operator
    * returning a lazy frame has no safe point to unpersist itself). */
  private val operatorCaches =
    scala.collection.mutable.ListBuffer[DataFrame]()

  /** Inside a [[compile]], operator-internal caches ALSO register
    * against the compiled root (thread-local collector), so the normal
    * per-query [[releaseCache]](result) frees them — without this, a
    * long-lived session compiling cache-bearing operators accumulated
    * pinned blocks until the global [[releaseAllCaches]] sweep. The
    * strong global list stays as the backstop (double-unpersist is a
    * no-op). */
  private val operatorCacheCollector =
    new scala.util.DynamicVariable[
      Option[scala.collection.mutable.ListBuffer[DataFrame]]](None)

  private[graft] def trackOperatorCache(cached: DataFrame): Unit = {
    operatorCaches.synchronized { operatorCaches += cached; () }
    operatorCacheCollector.value.foreach(_ += cached)
  }

  /** Release the `cache: true` def stages behind a [[compile]] result —
    * call after the root sink action completes. Idempotent; a result
    * with no cached defs is a no-op. */
  def releaseCache(result: DataFrame): Unit = persistedByResult.synchronized {
    Option(persistedByResult.remove(result)).getOrElse(Nil).foreach { df =>
      df.unpersist(blocking = false); allPersisted.remove(df)
      // drop the strong backstop reference too — released per-result
      // caches must not pin DataFrames until the next global sweep
      operatorCaches.synchronized { operatorCaches -= df; () }
    }
  }

  /** Release EVERY def stage any compile has persisted and not yet
    * released — the bench-loop / test-teardown hammer. */
  def releaseAllCaches(): Unit = {
    persistedByResult.synchronized {
      val it = allPersisted.iterator()
      while (it.hasNext) { it.next().unpersist(blocking = false); it.remove() }
      persistedByResult.clear()
    }
    operatorCaches.synchronized {
      operatorCaches.foreach(_.unpersist(blocking = false))
      operatorCaches.clear()
    }
  }

  /** Optional validation: resolve referenced columns up front (the reference
    * fails lazily at execution — SURVEY §1.3). Returns error strings. */
  def validate(df: DataFrame, node: NodeSpec): Seq[String] = {
    // derive-created columns (and the dedup count_col) exist by the time
    // keep/aggregate run; their own expression references are checked by
    // the analyzer tier of validatePipeline
    val have = df.columns.toSet ++ node.derive.map(_._1) ++
      node.dedup.flatMap(_.countCol)
    val wanted =
      node.keepColumns ++
        node.aggregate.toSeq.flatMap(a =>
          a.groupBy ++ a.keep ++ a.sets.flatten ++ a.pivot.map(_.col) ++
            a.aggs.filterNot(_.col == "*").map(_.col)) ++
        node.filters.collect { case ColFilter(c, _, _, _) => c } ++
        node.watermark.map(_.col) ++
        node.dedup.toSeq.flatMap(d => d.keys ++ d.idCol ++ d.orderCol) ++
        // chunk is NOT here: its ids_col is usually bpe_apply-created in
        // the same node (bpe_ids) — the analyzer tier checks it
        node.chunk.toSeq.map(_.idCol) ++
        node.nearDup.toSeq.flatMap(d => Seq(d.idCol, d.vecCol) ++ d.retention.map(_.orderCol)) ++
        node.semanticDedup.toSeq.flatMap(d => Seq(d.idCol, d.vecCol)) ++
        node.editDedup.toSeq.flatMap(e => Seq(e.idCol, e.textCol)) ++
        node.imageDedup.toSeq.flatMap(i => Seq(i.idCol, i.payloadCol) ++ i.retention.map(_.orderCol)) ++
        node.simhashDedup.toSeq.flatMap(sh => Seq(sh.idCol, sh.textCol) ++ sh.retention.map(_.orderCol)) ++
        node.audioDedup.toSeq.flatMap(a => Seq(a.idCol, a.payloadCol) ++ a.retention.map(_.orderCol)) ++
        node.passageDedup.toSeq.flatMap(p => Seq(p.idCol, p.textCol)) ++
        node.lmPerplexity.toSeq.flatMap(l => Seq(l.idCol, l.textCol)) ++
        node.qualityClassifier.toSeq.flatMap(q => Seq(q.idCol, q.textCol, q.labelCol)) ++
        node.multiclassClassifier.toSeq.flatMap(m => Seq(m.idCol, m.textCol, m.labelCol)) ++
        node.predictModel.toSeq.map(_.textCol) ++
        node.bpe.toSeq.map(_.textCol) ++
        node.cmsProbe.toSeq.map(_.keyCol) ++
        node.seenProbe.toSeq.map(_.keyCol) ++
        node.seenFilter.toSeq.map(_.keyCol) ++
        node.dsir.toSeq.flatMap(d =>
          Seq(d.textCol) ++ (if (d.idCol.nonEmpty) Seq(d.idCol) else Nil)) ++
        node.dsirScore.toSeq.map(_.textCol) ++
        node.pageRank.toSeq.flatMap(p => Seq(p.srcCol, p.dstCol)) ++
        node.tarPack.toSeq.flatMap(t => Seq(t.nameCol, t.payloadCol)) ++
        node.tarCompact.toSeq.flatMap(t => t.tarCol +: t.batchCol.toSeq) ++
        // stats/compact modes read only the artifact — no frame columns
        node.annIndex.toSeq
          .filterNot(a => a.mode == "stats" || a.mode == "compact")
          .flatMap(a => Seq(a.idCol, a.vecCol)) ++
        node.applyDiff.toSeq.flatMap(_.on) ++
        node.annSearch.toSeq.flatMap(a => Seq(a.idCol, a.vecCol)) ++
        node.annProbe.toSeq.map(_.vecCol) ++
        node.quantileFilter.toSeq.map(_.col) ++
        node.bm25.toSeq.flatMap(bq => Seq(bq.idCol, bq.textCol)) ++
        node.bm25Index.toSeq
          .filterNot(bi => bi.mode == "compact" || bi.mode == "stats")
          .flatMap(bi => Seq(bi.idCol, bi.textCol)) ++
        node.bm25Search.toSeq.flatMap(bs => Seq(bs.qidCol, bs.qtextCol)) ++
        node.rrfFuse.toSeq.flatMap(rf =>
          Seq(rf.queryCol, rf.docCol, rf.rankCol) ++ rf.weightCol) ++
        node.rankingEval.toSeq.flatMap(re => Seq(re.queryCol, re.docCol, re.rankCol)) ++
        node.upsample.toSeq.map(_.factorCol) ++
        node.funnel.toSeq.flatMap(fu => Seq(fu.keyCol, fu.tsCol, fu.eventCol)) ++
        node.rangeJoin.toSeq.flatMap(rj => rj.pointCol +: rj.on) ++
        node.overlapJoin.toSeq.flatMap(oj => Seq(oj.loCol, oj.hiCol) ++ oj.on) ++
        node.collocations.toSeq.flatMap(cs => cs.textCol +: cs.groupCols) ++
        node.connectedComponents.toSeq.flatMap(cc => Seq(cc.srcCol, cc.dstCol)) ++
        node.unpivot.toSeq.flatMap(u => u.ids ++ u.values) ++
        node.approxTopK.toSeq.map(_.keyCol) ++
        node.resample.toSeq.flatMap(rs =>
          rs.keyCols ++ Seq(rs.tsCol) ++
            rs.aggs.filterNot(_.col == "*").map(_.col)) ++
        node.wdsSamples.toSeq.flatMap(ws => Seq(ws.nameCol, ws.dataCol)) ++
        node.winnow.toSeq.flatMap(wn => Seq(wn.idCol, wn.textCol)) ++
        node.winnowProbe.toSeq.map(_.textCol) ++
        node.split.toSeq.map(_.idCol) ++
        node.temperatureSample.toSeq.flatMap(t => Seq(t.groupCol, t.idCol)) ++
        node.tokenBudgetSample.toSeq.flatMap(t =>
          Seq(t.groupCol, t.idCol, t.tokensCol) ++ t.orderCol) ++
        node.globalShuffle.toSeq.map(_.idCol) ++
        node.htmlExtract.toSeq.flatMap(h => Seq(h.idCol, h.htmlCol)) ++
        node.pdfExtract.toSeq.flatMap(p => Seq(p.idCol, p.pdfCol)) ++
        node.profile.toSeq.flatMap(_.columns) ++
        node.boilerplate.toSeq.flatMap(b => Seq(b.idCol, b.textCol)) ++
        node.featurize.toSeq.flatMap(f => Seq(f.idCol, f.payloadCol))
    // compact/running_totals/top_k run AFTER children (joins may add or
    // prefix columns), so their references are checked by the analyzer
    // tier, not here — a source-schema check would false-positive on
    // joined columns.
    wanted.filterNot(have.contains).map(c => s"node ${node.id}: unknown column '$c' (have: ${have.mkString(", ")})")
  }

  /** Whole-pipeline validation without running a job (SURVEY §1.3: the
    * reference surfaces schema errors lazily at execution; we resolve them
    * up front). Two tiers: a friendly per-node unknown-column check against
    * each concrete source's schema, then a full Catalyst analysis of the
    * composed plan (compilation is lazy — no data is read beyond parquet
    * footers). Returns error strings; empty = valid. */
  def validatePipeline(spark: SparkSession, spec: PipelineSpec): Seq[String] = {
    def walk(node: NodeSpec): Seq[String] = {
      // ref sources resolve only inside compile — the analyzer pass below
      // still covers their column references
      val own = node.source.toSeq.filter(_.ref.isEmpty).flatMap { s =>
        try validate(readSource(spark, s), node)
        catch { case e: Throwable => Seq(s"node ${node.id}: source unreadable: ${e.getMessage}") }
      }
      own ++ node.combine.toSeq.flatMap(_.nodes.flatMap(walk)) ++
        node.children.flatMap(c => walk(c.node))
    }
    val friendly = spec match {
      case TreePipeline(root, defs, tee) =>
        defs.flatMap(walk) ++ tee.flatMap(walk) ++ walk(root)
      case CascadePipeline(c) =>
        // only level 1 sees the raw source schema; later levels are
        // checked by the analyzer below
        c.iterations.flatMap(_.levels.headOption.toSeq.flatMap { l =>
          try validate(readSource(spark, c.source), l)
          catch { case e: Throwable => Seq(s"cascade source unreadable: ${e.getMessage}") }
        })
    }
    if (friendly.nonEmpty) friendly
    else
      try { compile(spark, spec, executeSinks = false); Nil }
      catch { case e: Throwable => Seq(e.getMessage) }
  }

  /** Compile a full pipeline. `input` overrides the root node's source
    * (used by tests and the streaming compiler, which passes a streaming
    * DataFrame through the same batch-authored spec). */
  def compile(spark: SparkSession, spec: PipelineSpec, input: Option[DataFrame] = None,
      executeSinks: Boolean = true): DataFrame = {
    val opCaches = scala.collection.mutable.ListBuffer[DataFrame]()
    val result = operatorCacheCollector.withValue(Some(opCaches))(spec match {
      case TreePipeline(root, defs, tee) =>
        // Defs compile ONCE, in order (later defs may reference earlier
        // ones); every ref then shares the same DataFrame — one plan
        // subtree, reused exchanges, and with cache: true one
        // materialization. They are definitions, not pipelines: sinks
        // stay on the root tree.
        defs.foreach { d =>
          if (d.save.isDefined) throw new IllegalArgumentException(
            s"def ${d.id}: defs are definitions — sinks live on the root tree")
          if (d.combine.exists(_.nodes.exists(anyCached)) ||
              d.children.exists(c => anyCached(c.node)))
            throw new IllegalArgumentException(
              s"def ${d.id}: cache applies to the def itself — " +
                "hoist the nested stage into its own def")
        }
        if (anyCached(root)) throw new IllegalArgumentException(
          "cache is a defs-only key — name the stage in defs and ref it")
        val cachedDefs = Vector.newBuilder[DataFrame]
        val refs = defs.foldLeft(Map.empty[String, DataFrame]) { (acc, d) =>
          val df = compileNode(spark, d, None, executeSinks = false, refs = acc)
          acc + (d.id -> (if (d.cache) { val p = df.persist(); cachedDefs += p; p } else df))
        }
        // side-output trees: compiled for their sinks (in declaration
        // order, before the root result returns), discarded afterwards.
        // With executeSinks = false this still builds every tee plan, so
        // --validate checks them too.
        if (tee.nonEmpty) {
          // the whole point of tee is ONE read fanning out — a def that
          // several tee/root trees consume UNCACHED re-scans per sink.
          // Warn loudly (not an error: a cheap def may not be worth the
          // materialization).
          val consumed = (tee ++ Seq(root))
            .flatMap(_.source.flatMap(_.ref))
          val hot = consumed.groupBy(identity).collect {
            case (r, xs) if xs.size > 1 => r
          }
          defs.filter(d => hot.exists(_ == d.id)).filterNot(_.cache)
            .foreach { d =>
              warn(s"tee fan-out reads def '${d.id}' " +
                "multiple times WITHOUT cache: true — each sink re-scans " +
                "it; set cache: true on the def to pay the read once")
            }
        }
        tee.foreach { t =>
          compileNode(spark, t, None, executeSinks, refs = refs)
        }
        val result = compileNode(spark, root, input, executeSinks, refs = refs)
        trackPersisted(result, cachedDefs.result())
        result
      case CascadePipeline(c) => compileCascade(spark, c, executeSinks)
    })
    trackPersisted(result, opCaches.toSeq)
    result
  }

  def compileJson(spark: SparkSession, json: String): DataFrame =
    compile(spark, JsonCodec.parse(json))

  /** Node pipeline order mirrors the reference's interpreter
    * (`pandas/optimus.py:7-40`): derive → filters → keep_columns →
    * aggregate → rename → withColumns → bitemporal → children joins →
    * orderBy/limit. `derive` runs FIRST so filters may reference derived
    * columns (documented in USAGE.md and admitted by `validate`); a filter
    * on a source column still reaches the scan — Catalyst pushes it below
    * the derive projection. Note the reference quirk kept intentionally:
    * the parent aggregates BEFORE joining children, so joins run on
    * aggregated-parent × aggregated-child (SURVEY §3 EP2 step 6). */
  def compileNode(spark: SparkSession, node: NodeSpec, input: Option[DataFrame] = None,
      executeSinks: Boolean = true, streaming: Boolean = false,
      refs: Map[String, DataFrame] = Map.empty): DataFrame = {
    if (node.combine.isDefined && node.source.isDefined)
      throw new IllegalArgumentException(
        s"node ${node.id}: source and combine are mutually exclusive")
    // compileStream handles the ingest sink at the root and strips it
    // before the node walk — any spec reaching here with it set is a batch
    // compile or a non-root stream node, both invalid by construction
    if (node.nearDupIngest.isDefined)
      throw new IllegalArgumentException(
        s"node ${node.id}: near_dup_ingest is a STREAMING ROOT sink — " +
          "compile with compileStreamJson and declare it on the root node " +
          "(for the batch shape, use the dedup/near-dup pipeline operators)")
    if (node.passageIngest.isDefined)
      throw new IllegalArgumentException(
        s"node ${node.id}: passage_ingest is a STREAMING ROOT sink — " +
          "compile with compileStreamJson and declare it on the root node " +
          "(for the batch shape, use passage_dedup / stripPassagesAgainstCorpus)")
    if (node.tarPackIngest.isDefined)
      throw new IllegalArgumentException(
        s"node ${node.id}: tar_pack_ingest is a STREAMING ROOT sink — " +
          "compile with compileStreamJson and declare it on the root node " +
          "(for the batch shape, use tar_pack)")
    if (node.exactIngest.isDefined)
      throw new IllegalArgumentException(
        s"node ${node.id}: exact_ingest is a STREAMING ROOT sink — " +
          "compile with compileStreamJson and declare it on the root node " +
          "(for the batch shape, use derive + dedup, or seen_filter " +
          "against the persisted index)")
    if (node.sketchIngest.isDefined)
      throw new IllegalArgumentException(
        s"node ${node.id}: sketch_ingest is a STREAMING ROOT sink — " +
          "compile with compileStreamJson and declare it on the root node " +
          "(for the batch shape, aggregate approx_top_k_accumulate / " +
          "hll_sketch_agg and save — the q237/q238 pattern)")
    if (node.bm25Ingest.isDefined)
      throw new IllegalArgumentException(
        s"node ${node.id}: bm25_ingest is a STREAMING ROOT sink — " +
          "compile with compileStreamJson and declare it on the root node " +
          "(for the batch shape, use bm25_index mode: \"append\")")
    if (node.annIngest.isDefined)
      throw new IllegalArgumentException(
        s"node ${node.id}: ann_ingest is a STREAMING ROOT sink — " +
          "compile with compileStreamJson and declare it on the root node " +
          "(for the batch shape, use ann_index mode: \"append\")")
    var df = input.getOrElse(node.combine match {
      case Some(c) =>
        val parts = c.nodes.map(n => compileNode(spark, n, None, executeSinks, streaming, refs))
        if (parts.isEmpty)
          throw new IllegalArgumentException(s"node ${node.id}: combine needs nodes")
        c.op match {
          case "union" | "union_all" => parts.reduce(_.unionByName(_))
          case "union_distinct"      => parts.reduce(_.unionByName(_)).distinct()
          case "intersect"           => parts.reduce(_.intersect(_))
          case "except"              => parts.reduce(_.except(_))
          case other => throw new IllegalArgumentException(
            s"node ${node.id}: unknown combine op '$other' " +
              "(one of: union, union_distinct, intersect, except)")
        }
      case None =>
        val src = node.source.getOrElse(
          throw new IllegalArgumentException(s"node ${node.id}: no source and no input DataFrame"))
        src.ref match {
          // A ref IS a compiled def's frame — shared, not re-inlined.
          case Some(r) => refs.getOrElse(r, throw new IllegalArgumentException(
            s"node ${node.id}: unknown ref '$r'" +
              (if (refs.isEmpty) " — declare it under top-level defs"
               else s" (defined: ${refs.keys.mkString(", ")})")))
          case None =>
            // `stream: true` sources become readStreams ONLY under a
            // streaming compile — the identical spec stays batch-runnable
            // for the oracle.
            if (streaming && src.stream) readStreamSource(spark, src)
            else readSource(spark, src)
        }
    })

    node.derive.foreach { case (c, e) =>
      // Scale audit, not a rejection: Spark's [currentRow,
      // unboundedFollowing] aggregate frame re-scans the partition
      // remainder per output row — O(n²) on a hot key. Every engine
      // operator avoids it (as-of forward/nearest and funnel "every"
      // use the reversed running frame); a config window expression can
      // reintroduce it, so warn by name with the fix (docs/USAGE.md
      // "Window-frame scale note").
      if (hasQuadraticFrame(e))
        warn(s"node ${node.id}: derive '$c' uses an UNBOUNDED " +
          "FOLLOWING aggregate window frame — O(partition²) per key in " +
          "Spark; reverse the ORDER BY and use ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND CURRENT ROW instead (see docs/USAGE.md)")
      df = df.withColumn(c, expr(e))
    }

    // After derive (the watermark column may be derived), before any
    // stateful op. No-op on batch frames.
    node.watermark.foreach(w => df = df.withWatermark(w.col, w.delay))

    node.filters.foreach(f => df = df.filter(filterColumn(f)))

    // Dedup after filters (dropping rows first shrinks the dedup shuffle),
    // before projection/aggregation so min_by can carry all columns.
    node.dedup.foreach { d =>
      // one deterministic winner per key: best score (order_col set),
      // else min id (id_col set), else plain dropDuplicates; count_col
      // rides the winner aggregate with the duplicate-class size
      if (d.countCol.nonEmpty)
        requireBatch("dedup (count_col)", "a class-size aggregate",
          "drop count_col (streaming state dedup cannot count a class)")
      def winner(): DataFrame = (d.idCol, d.orderCol) match {
        case (Some(id), Some(oc)) =>
          requireBatch("dedup (order_col)", "a score-ranked aggregate",
            "drop order_col (streams keep the first arrival per key)")
          graft.ops.Dedup.exactDedupBest(df, d.keys, id, oc, d.descending,
            d.countCol)
        case (Some(id), None) =>
          graft.ops.Dedup.exactDedup(df, d.keys, id, d.countCol)
        case _ => df.dropDuplicates(d.keys)
      }
      df =
        if (d.withinWatermark) {
          if (node.watermark.isEmpty)
            throw new IllegalArgumentException(
              s"node ${node.id}: dedup.within_watermark requires a node watermark")
          if (d.idCol.nonEmpty && df.isStreaming)
            // streaming state dedup keeps the FIRST arrival per key — a
            // min-id winner isn't expressible there; refusing beats
            // silently returning arrival-order winners
            throw new IllegalArgumentException(
              s"node ${node.id}: dedup.id_col is not supported with " +
                "within_watermark on streams (state keeps the first arrival)")
          // Batch compile of the same spec: the input is finite, so the
          // watermark horizon covers all of it — plain (or min-id/best-
          // score) dedup is the exact batch semantics (and Spark rejects
          // dropDuplicatesWithinWatermark on batch frames outright).
          if (df.isStreaming) df.dropDuplicatesWithinWatermark(d.keys)
          else winner()
        } else winner()
    }

    if (node.keepColumns.nonEmpty)
      df = df.select(node.keepColumns.map(col): _*)

    // Near-dup pair detection: the frame becomes (idA, idB, score). Pure
    // plan composition (banded signatures + equi-join — no actions), so it
    // is config-admissible; downstream keys run over the pair frame.
    // Cluster-output dedup tiers run ITERATIVE connected components
    // (bounded per-round actions) — batch-only semantics. Refusing by
    // name beats the confusing analysis error a streaming frame would
    // throw mid-CC.
    def requireBatch(key: String,
        reason: String = "iterative connected components",
        hint: String = "streaming ingestion dedups via near_dup_ingest " +
          "(the persisted-index path) instead"): Unit =
      if (streaming) throw new IllegalArgumentException(
        s"node ${node.id}: $key runs $reason — batch-only; $hint")

    // Best-copy retention over a cluster tier's (id, cluster) labels:
    // join the labels back onto the FULL input frame (left — a row no
    // near-dup touched heads its own singleton class) and keep each
    // class's best row via the exactDedupBest aggregate. One label join
    // + one partial+final aggregate over the cluster op's own cost; the
    // corpus row data never widens beyond (row + cluster).
    def retainBest(input: DataFrame, labels: DataFrame, idCol: String,
        r: graft.spec.RetentionSpec): DataFrame = {
      require(!input.columns.contains("cluster"),
        s"node ${node.id}: retention adds a 'cluster' column but the " +
          "input already has one — rename it first")
      val lab = labels.select(col("id").as("__rcid"), col("cluster"))
      val joined = input.join(lab, input(idCol) === col("__rcid"), "left")
        .drop("__rcid")
        .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      graft.ops.Dedup.exactDedupBest(
        joined, Seq("cluster"), idCol, r.orderCol, r.descending)
    }

    node.nearDup.foreach { d =>
      val input = df
      df = graft.ops.Similarity.cosineNearDupPairsBanded(
        df, d.idCol, d.vecCol, d.threshold, d.dim, d.numBits, d.bands)
      // "clusters": connected components over the verified pairs — the
      // frame becomes (id, cluster) labels, matching the perceptual
      // tiers' cluster output shape.
      if (d.output == "clusters") {
        requireBatch("near_dup (clusters)")
        df = graft.ops.Dedup.dedupClusters(df)
        d.retention.foreach { r => df = retainBest(input, df, d.idCol, r) }
      }
    }

    // Semantic dedup: centroid training collects bounded metadata at
    // compile and the within-cluster join needs the whole corpus —
    // batch-only by name.
    node.semanticDedup.foreach { d =>
      if (streaming) throw new IllegalArgumentException(
        s"node ${node.id}: semantic_dedup trains centroids over the whole " +
          "corpus — batch-only; dedup a stream against a batch-built " +
          "index via near_dup_ingest/near_dup_probe instead")
      df = graft.ops.Similarity.semanticDedup(
        df, d.idCol, d.vecCol, d.threshold, d.dim, d.nlist, d.refineRounds,
        d.exact, d.numBits, d.bands, d.output)
    }

    // Edit-distance near-dup: the frame becomes (idA, idB, dist, sim) —
    // blocking-key candidates verified by normalized Levenshtein. Pure
    // plan composition (one block-key shuffle + candidate-shaped verify),
    // so config-admissible; downstream keys run over the pair frame.
    node.editDedup.foreach { e =>
      val cands = graft.ops.Dedup.blockedCandidatePairs(
        df, e.idCol, expr(e.blockExpr), e.bucketCap)
      df = graft.ops.Dedup.verifyEditDistancePairs(
        df, e.idCol, e.textCol, cands, e.threshold, e.maxDistance)
    }

    // Perceptual image dedup: the frame becomes (idA, idB, dist) pairs,
    // or (id, cluster) labels when output="clusters" — both plan-only
    // (partition-batched dHash + identical-signature-collapsed banding).
    node.imageDedup.foreach { im =>
      val input = df
      df =
        if (im.output == "clusters") {
          requireBatch("image_dedup (clusters)")
          val labels = graft.ops.Multimodal.imageNearDupClusters(
            df, im.idCol, im.payloadCol, im.maxDist)
          im.retention.fold(labels)(r => retainBest(input, labels, im.idCol, r))
        } else
          graft.ops.Multimodal.imageNearDupPairs(
            df, im.idCol, im.payloadCol, im.maxDist)
    }

    // Text SimHash near-dup: same shapes over the token-hash SimHash.
    node.simhashDedup.foreach { sh =>
      val input = df
      df =
        if (sh.output == "clusters") {
          requireBatch("simhash_dedup (clusters)")
          val labels =
            graft.ops.Dedup.simhashClusters(df, sh.idCol, sh.textCol, sh.maxDist)
          sh.retention.fold(labels)(r => retainBest(input, labels, sh.idCol, r))
        } else
          graft.ops.Dedup.simhashPairs(df, sh.idCol, sh.textCol, sh.maxDist)
    }

    // Perceptual audio dedup: same shapes over the envelope hash.
    node.audioDedup.foreach { au =>
      val input = df
      df =
        if (au.output == "clusters") {
          requireBatch("audio_dedup (clusters)")
          val labels = graft.ops.Multimodal.audioNearDupClusters(
            df, au.idCol, au.payloadCol, au.maxDist)
          au.retention.fold(labels)(r => retainBest(input, labels, au.idCol, r))
        } else
          graft.ops.Multimodal.audioNearDupPairs(
            df, au.idCol, au.payloadCol, au.maxDist)
    }

    // Exact substring-level dedup: "spans" rewrites the frame to
    // duplicate-passage token spans; "strip" keeps it and adds
    // clean_text + dropped_tokens. Plan-only composition.
    node.passageDedup.foreach { pd =>
      // Occurrence ranking needs a global order over the whole corpus —
      // illegal on streams; name the refusal instead of leaking Spark's
      // analysis error.
      if (streaming) throw new IllegalArgumentException(
        s"node ${node.id}: passage_dedup ranks occurrences against the " +
          "whole corpus — batch-only (streaming corpora use the " +
          "passage_ingest root sink)")
      df =
        if (pd.output == "strip")
          graft.ops.Dedup.stripDuplicatePassages(
            df, pd.idCol, pd.textCol, pd.windowTokens)
        else
          graft.ops.Dedup.duplicatePassageSpans(
            df, pd.idCol, pd.textCol, pd.windowTokens)
    }

    // LM-perplexity quality scoring: the frame becomes (id, n_bigrams,
    // nll). Plan-only (vocabulary aggregates + equi-joins), so
    // config-admissible; downstream keys filter/sort on the score.
    node.lmPerplexity.foreach { l =>
      df = graft.ops.Corpus.lmPerplexity(df, l.idCol, l.textCol, l.k,
        l.keepUnscored, l.smoothing, l.discount)
    }

    // Artifact-inference keys — the STREAMING-admissible halves of the
    // batch-only trainers: each loads a persisted artifact ONCE at
    // compile time (bounded driver metadata — weights / merge list /
    // Bloom bit array) and applies a scan-stage kernel. A config can
    // batch-train + save in one pipeline, then score/tokenize/probe a
    // stream with another — identical decisions by construction.
    node.nearDupProbe.foreach { p =>
      val index = spark.read.parquet(p.indexDir)
      df = graft.ops.Dedup.nearDupProbeBloom(df, p.textCol, index,
        p.shingleSize, p.numHashes, p.bands, p.flagCol, p.expectedKeys, p.fpp)
    }
    // Scan-stage seen probe: the Bloom over the persisted key index
    // (an exact_ingest index dir, or any parquet with the key column)
    // builds ONCE at compile — zero joins/shuffles on the probed frame,
    // streaming-admissible (the crawl-frontier gate).
    node.seenProbe.foreach { sp =>
      val index = spark.read.parquet(sp.indexDir)
      df = graft.ops.Dedup.seenProbeBloom(df, sp.keyCol, index,
        sp.flagCol, sp.expectedKeys, sp.fpp)
    }
    // Exact seen filter: drop (left-anti) or flag (left join + marker)
    // against the persisted key index's distinct keys. Stream-static
    // join under compileStream — NOTE the index is read at stream
    // START; a growing index needs the exact_ingest sink (re-reads per
    // batch) or a stream restart.
    node.seenFilter.foreach { sf =>
      val index = spark.read.parquet(sf.indexDir)
      df = graft.ops.Dedup.seenFilter(df, sf.keyCol, index, sf.mode, sf.flagCol)
    }
    node.scoreModel.foreach { m =>
      val model = graft.ops.Corpus.loadTextClassifier(spark, m.modelDir)
      df = graft.ops.Corpus.scoreWithModel(df, m.textCol, model,
        m.scoreCol, m.predCol, m.threshold)
    }
    node.bpeApply.foreach { b =>
      val merges = graft.ops.Bpe.loadMerges(spark, b.mergesDir)
      b.textCol.foreach { tc =>
        df = graft.ops.Bpe.addTokens(df, tc, merges)
        if (b.withIds) df = graft.ops.Bpe.addIds(df, tc, merges)
      }
      // decode side: ids → subword strings under the SAME artifact (the
      // shard-inspection path: tar source → binary_ints → decode)
      b.decodeCol.foreach { dc =>
        df = graft.ops.Bpe.addDecoded(df, dc, merges)
      }
    }

    // Sliding-window chunking: the frame becomes one row per chunk —
    // (id, chunk_id, chunk_text | chunk_ids, n_tokens). Scan-stage
    // generator (no shuffle, no state) — streaming-admissible. Sits
    // after bpe_apply so the ids tier composes bpe → chunk →
    // sequence_pack (whole-doc packing without truncation).
    node.chunk.foreach { c =>
      df = (c.textCol, c.sep) match {
        case (Some(t), Some(sp)) =>
          graft.ops.Corpus.chunkBySegments(df, c.idCol, t, c.size, sp)
        case (Some(t), None) =>
          graft.ops.Corpus.chunkByTokens(df, c.idCol, t, c.size, c.overlap)
        case _ =>
          graft.ops.Corpus.chunkIds(df, c.idCol, c.idsCol.get, c.size, c.overlap)
      }
    }

    // BPE: train merges on the frame (iterative global aggregates —
    // batch-only by name); output=merges replaces the frame with the
    // merge table, output=tokens adds the trained tokenizer's columns.
    node.bpe.foreach { b =>
      if (streaming) throw new IllegalArgumentException(
        s"node ${node.id}: bpe training is an iterative global aggregate " +
          "— batch-only; train in batch and tokenize the stream with the " +
          "trained merges (BpeKernels.bpeTokenize)")
      if (b.output == "merges")
        df = graft.ops.Bpe.trainDF(spark, df, b.textCol, b.numMerges)
      else {
        val merges = graft.ops.Bpe.train(df, b.textCol, b.numMerges)
          .map(t => (t._1, t._2))
        df = df
          .withColumn("bpe_tokens",
            graft.functions.BpeKernels.bpeTokenize(col(b.textCol), merges))
          .withColumn("n_bpe", size(col("bpe_tokens")))
      }
    }

    // Count–Min watchlist probe: the frame becomes (key, est). The
    // sketch aggregate collects to the driver — batch-only by name.
    node.cmsProbe.foreach { c =>
      if (streaming) throw new IllegalArgumentException(
        s"node ${node.id}: cms_probe collects a sketch (an action) — " +
          "batch-only; monitor a stream by probing per batch in " +
          "foreachBatch instead")
      df = graft.ops.Relational.cmsProbeCounts(
        df, c.keyCol, c.probes, c.eps, c.confidence, c.seed)
    }

    // Trainable quality classifier: fit on labeled rows (global
    // aggregates — batch-only by name), score every row scan-stage.
    node.qualityClassifier.foreach { q =>
      requireBatch("quality_classifier", "training-pass global aggregates",
        "train in batch, persist the artifact, and score the stream with " +
          "score_model instead")
      df = graft.ops.Corpus.qualityClassifier(
        df, q.idCol, q.textCol, q.labelCol, q.dim, q.epochs, q.lr, q.threshold)
    }

    // Multiclass classifier: one-vs-rest training (batch-only by name —
    // k sets of global aggregates) + scan-stage argmax prediction; the
    // frame gains pred_col (and per-class scores with keep_scores).
    node.multiclassClassifier.foreach { m =>
      if (streaming) throw new IllegalArgumentException(
        s"node ${node.id}: multiclass_classifier trains one-vs-rest " +
          "models over the whole corpus — batch-only; train in batch, " +
          "persist per-class artifacts, and score the stream with " +
          "score_model columns instead")
      val models = graft.ops.Corpus.trainMulticlassClassifier(
        df, m.idCol, m.textCol, m.labelCol, m.dim, m.epochs, m.lr)
      df = graft.ops.Corpus.predictMulticlass(
        df, m.textCol, models, m.predCol, m.keepScores)
    }

    // Predict with a persisted multiclass artifact: models load ONCE at
    // compile (bounded metadata), prediction is scan-stage — the
    // streaming-admissible inference half of multiclass_classifier.
    node.predictModel.foreach { pmSpec =>
      val models = graft.ops.Corpus.loadMulticlassClassifier(spark, pmSpec.modelDir)
      df = graft.ops.Corpus.predictMulticlass(
        df, pmSpec.textCol, models, pmSpec.predCol, pmSpec.keepScores)
    }

    // DSIR importance weighting/resampling: the fit joins this frame
    // against the exemplar corpus named by target_ref (two count
    // aggregates — batch-only by name); scoring is scan-stage kernel
    // arithmetic over the fitted log-ratio table.
    node.dsir.foreach { d =>
      requireBatch("dsir", "exemplar-corpus count aggregates (the fit)",
        "fit in batch, persist via save_model, and score the stream with " +
          "dsir_score instead")
      val target = refs.getOrElse(d.targetRef, throw new IllegalArgumentException(
        s"node ${node.id}: dsir.target_ref '${d.targetRef}' is not a def — " +
          "declare the exemplar corpus under top-level defs" +
          (if (refs.isEmpty) "" else s" (defined: ${refs.keys.mkString(", ")})")))
      val model = graft.ops.Corpus.dsirFit(df, target, d.textCol, d.buckets)
      if (d.saveModel.nonEmpty)
        graft.ops.Corpus.saveDsirModel(spark, model, d.saveModel)
      val scored = graft.ops.Corpus.dsirScore(df, d.textCol, model)
      df = d.mode match {
        case "select" =>
          graft.ops.Corpus.dsirResample(scored, d.idCol, d.n, d.seed, d.gumbel)
        case "select_threshold" =>
          // the scan-stage selection path: explicit key cut, or derived
          // once from the quantile sketch when only n is given
          val t = d.threshold.getOrElse(
            graft.ops.Corpus.dsirThresholdForN(scored, d.idCol, d.n.toLong,
              d.seed, d.gumbel, relativeError = d.relativeError))
          graft.ops.Corpus.dsirResampleThreshold(
            scored, d.idCol, t, d.seed, d.gumbel)
        case _ => scored
      }
    }

    // PageRank over the frame as an edge list: the frame becomes
    // (node, rank) — iterative actions, batch-only by name.
    node.pageRank.foreach { pr =>
      requireBatch("page_rank", "iterative rank-update actions",
        "compute host ranks in batch and join them onto the stream instead")
      df = graft.ops.Graph.pageRank(df, pr.srcCol, pr.dstCol, pr.iters,
        pr.damping, pr.tol)
    }

    // Generic connected components: the frame is an edge table and
    // becomes (id, cluster) min-reachable-id labels — the dedup tiers'
    // CC engine exposed for entity resolution / graph communities.
    node.connectedComponents.foreach { cc =>
      requireBatch("connected_components",
        "iterative label-propagation actions",
        "label the landed graph in batch and join the labels onto the " +
          "stream instead")
      df = graft.ops.Dedup.dedupClusters(
        df.select(col(cc.srcCol).as("idA"), col(cc.dstCol).as("idB")),
        maxIter = cc.maxIter, smallGraphEdges = cc.smallGraphEdges,
        checkpointDir = cc.checkpointDir)
    }

    // Collocation mining: the frame becomes its top-k PMI bigram table.
    // Batch-only (global corpus counts have no streaming plan).
    node.collocations.foreach { cs =>
      requireBatch("collocations", "global corpus token/pair counts",
        "mine collocations in batch over the landed corpus instead")
      df = graft.ops.TextAnalysis.collocations(df, cs.textCol, cs.minCount,
        cs.topK, cs.groupCols)
    }

    // BM25 retrieval: rank the frame (the corpus) against the query
    // def; the frame becomes (qid, id, score, rn). Batch-only (corpus
    // stats action).
    node.bm25.foreach { bq =>
      requireBatch("bm25", "corpus-statistics actions (N, avgdl)",
        "run retrieval in batch over the materialized corpus instead")
      val queries = refs.getOrElse(bq.queriesRef, throw new IllegalArgumentException(
        s"node ${node.id}: bm25.queries_ref '${bq.queriesRef}' is not a def — " +
          "declare the query table under top-level defs" +
          (if (refs.isEmpty) "" else s" (defined: ${refs.keys.mkString(", ")})")))
      df = graft.ops.Retrieval.bm25TopK(df, bq.idCol, bq.textCol,
        queries, bq.qidCol, bq.qtextCol, bq.k1, bq.b, bq.topK, bq.proxWeight)
    }

    // At-rest BM25 index build/append: the frame (the corpus) persists
    // bucket-partitioned postings + lengths + stats, then becomes the
    // (bucket, n_postings) balance histogram. Batch-only (writes).
    node.bm25Index.foreach { bi =>
      requireBatch("bm25_index", "a postings build and an index write",
        "build the index in batch; search query streams in batch against it")
      if (bi.mode == "stats") {
        // health view only — no write, the frame is discarded
        df = graft.ops.Retrieval.bm25IndexStats(df.sparkSession, bi.dir)
      } else {
        if (bi.mode == "compact")
          // checkpoint (when given) scopes the fold to the ingest
          // stream's COMMITTED batches — live-stream-safe compaction
          graft.ops.Retrieval.compactBm25Index(df.sparkSession, bi.dir,
            graft.ops.Artifacts.committedFoldCeiling(
              df.sparkSession, bi.checkpoint))
        else if (bi.mode == "append")
          graft.ops.Retrieval.appendBm25Index(
            df.sparkSession, df, bi.idCol, bi.textCol, bi.dir)
        else
          graft.ops.Retrieval.saveBm25Index(
            df.sparkSession, df, bi.idCol, bi.textCol, bi.dir, bi.prox, bi.buckets)
        df = df.sparkSession.read.parquet(s"${bi.dir}/postings")
          .groupBy(col("bucket")).agg(count(lit(1)).as("n_postings"))
      }
    }

    // Ingest-area compaction: fold each area's committed batch= dirs
    // into one compacted dir (the exact/near_dup/passage/semantic
    // small-files defense — the operator-issued half beside the
    // ingests' compact_every). The frame becomes one row per area:
    // (area_ix, n_dirs). Batch-only (filesystem rewrite).
    node.ingestCompact.foreach { ic =>
      requireBatch("ingest_compact", "a filesystem rewrite",
        "run compaction as a periodic batch job; the ingest stream's " +
          "compact_every key is the in-stream half")
      val s = df.sparkSession
      // checkpoint (when given) scopes the fold to the ingest stream's
      // COMMITTED batches — live-stream-safe compaction
      val ceiling = graft.ops.Artifacts.committedFoldCeiling(s, ic.checkpoint)
      val rows = ic.dirs.zipWithIndex.map { case (dir, i) =>
        graft.ops.Artifacts.foldBatchArea(s, dir, ceiling)
        (i, graft.ops.Artifacts.areaBatchDirCount(s, dir))
      }
      import s.implicits._
      df = rows.toDF("area_ix", "n_dirs")
    }

    // BM25 search against a saved index: the frame (the QUERY set)
    // becomes (qid, <index id_col>, score, rn) without re-tokenizing
    // the corpus. Batch-only by name (stats read + rank window).
    node.bm25Search.foreach { bs =>
      requireBatch("bm25_search", "a per-query top-k rank window",
        "search in batch; the index itself is the at-rest artifact")
      df = graft.ops.Retrieval.bm25SearchIndex(df, bs.qidCol, bs.qtextCol,
        bs.indexDir, bs.k1, bs.b, bs.topK, bs.proxWeight)
    }

    // Funnel analysis: the frame (an event log) becomes one row per
    // step — chained key-shaped min aggregates, batch-only by name.
    node.funnel.foreach { fu =>
      requireBatch("funnel", "chained per-step global counts",
        "run the funnel as a periodic batch job over the landed events")
      df = graft.ops.Relational.funnel(df, fu.keyCol, fu.tsCol,
        fu.eventCol, fu.steps, fu.window, fu.anchor)
    }

    // Range (point-in-interval) join against an intervals def: bucketed
    // equi-join, never a nested loop. Streaming-admissible on the point
    // side (stream-static join; the def is a batch frame by contract).
    node.rangeJoin.foreach { rj =>
      val iv = refs.getOrElse(rj.intervalsRef, throw new IllegalArgumentException(
        s"node ${node.id}: range_join.intervals_ref '${rj.intervalsRef}' is " +
          "not a def — declare the interval table under top-level defs" +
          (if (refs.isEmpty) "" else s" (defined: ${refs.keys.mkString(", ")})")))
      df = graft.ops.Relational.rangeJoinKeyed(df, iv, rj.pointCol, rj.loCol,
        rj.hiCol, rj.bucket, rj.on, rj.payload, rj.how, rj.inclusiveHi,
        rj.broadcast, rj.maxBucketsPerInterval)
    }

    // Interval-overlap join against a def: both sides explode to covering
    // cells, plain equi-join, exactly-once pair emission (later-start-cell
    // rule). Streaming-admissible on the frame side (stream-static join).
    node.overlapJoin.foreach { oj =>
      val other = refs.getOrElse(oj.otherRef, throw new IllegalArgumentException(
        s"node ${node.id}: overlap_join.other_ref '${oj.otherRef}' is " +
          "not a def — declare the other interval table under top-level defs" +
          (if (refs.isEmpty) "" else s" (defined: ${refs.keys.mkString(", ")})")))
      if (oj.how == "left")
        requireBatch("overlap_join how:\"left\"",
          "the NULL-payload pad side anti-joins over the matched output",
          "run the inner overlap over the stream and anti-screen the " +
            "landed batch instead")
      df = graft.ops.Relational.overlapJoin(df, other, oj.loCol, oj.hiCol,
        oj.bucket, oj.otherLoCol.orNull, oj.otherHiCol.orNull, oj.on,
        oj.payload, oj.inclusive, oj.broadcast, oj.maxBucketsPerInterval,
        oj.how)
    }

    // Snapshot diff against an OLD-corpus def: one full-outer equi-join
    // on the keys. Batch-only by name — a full-outer join (and the notion
    // of a complete "previous snapshot") has no streaming plan; diff the
    // landed batch instead.
    node.diff.foreach { ds =>
      requireBatch("diff", "a full-outer join of two complete snapshots",
        "diff landed batches instead (the old snapshot is a def — " +
          "batch by contract)")
      val old = refs.getOrElse(ds.otherRef, throw new IllegalArgumentException(
        s"node ${node.id}: diff.other_ref '${ds.otherRef}' is not a def — " +
          "declare the old snapshot under top-level defs" +
          (if (refs.isEmpty) "" else s" (defined: ${refs.keys.mkString(", ")})")))
      df = graft.ops.Relational.snapshotDiff(df, old, ds.on, ds.compare,
        ds.statusCol, ds.changedCol, ds.includeUnchanged,
        carryNew = ds.carry == "new")
    }

    // Apply a snapshot diff: the frame (the BASE snapshot) patches with a
    // delta def and becomes the NEW snapshot — ship the delta, never
    // re-copy the corpus. Batch-only by name (a complete delta).
    node.applyDiff.foreach { ad =>
      requireBatch("apply_diff", "a key-shaped anti-join against a complete delta",
        "apply deltas to the landed snapshot in batch")
      val delta = refs.getOrElse(ad.deltaRef, throw new IllegalArgumentException(
        s"node ${node.id}: apply_diff.delta_ref '${ad.deltaRef}' is not a " +
          "def — declare the delta under top-level defs" +
          (if (refs.isEmpty) "" else s" (defined: ${refs.keys.mkString(", ")})")))
      df = graft.ops.Relational.applyDiff(df, delta, ad.on,
        ad.statusCol, ad.changedCol)
    }

    // Resample / gap-fill: per key, re-grid the event series onto a
    // regular step grid; empty buckets fill per policy. Batch-only by
    // name (per-key global bounds).
    node.resample.foreach { rs =>
      requireBatch("resample", "per-key global [min, max] bounds",
        "on streams, use a windowed aggregate with watermark instead " +
          "and gap-fill the landed batch")
      val aggPairs = rs.aggs.map { a =>
        (aggColumn(a): Column,
          a.newName.getOrElse(
            s"${a.func}_${if (a.col == "*") "all" else a.col}"))
      }
      df = graft.ops.Relational.resample(df, rs.keyCols, rs.tsCol, rs.step,
        aggPairs, rs.fill, rs.maxBucketsPerKey)
    }

    // Heavy hitters: the frame becomes its top-k most frequent keys
    // from one shuffle-free mergeable-sketch aggregate.
    node.approxTopK.foreach { tk =>
      requireBatch("approx_top_k", "a global sketch aggregate",
        "sketch per window on streams, or run over the landed batch")
      df = graft.ops.Relational.approxTopK(df, tk.keyCol, tk.k,
        tk.maxItemsTracked)
    }

    // Unpivot (melt): wide → long via one Expand over the scan — zero
    // shuffles, streaming-admissible; the inverse of aggregate.pivot.
    node.unpivot.foreach { u =>
      df = graft.ops.Relational.unpivot(df, u.ids, u.values, u.varCol, u.valCol)
    }

    // Per-row upsampling: scan-stage sequence explode — zero shuffles,
    // streaming-admissible (the repeat-k-epochs mixing half).
    node.upsample.foreach { up =>
      df = graft.ops.Corpus.upsample(df, up.factorCol, up.copyCol)
    }

    // Ranking evaluation: the frame (a ranked result table) joins the
    // qrels def and becomes per-query quality metrics at cutoff k.
    node.rankingEval.foreach { re =>
      requireBatch("ranking_eval", "metric joins + aggregates",
        "evaluate in batch over the materialized result table")
      val qrels = refs.getOrElse(re.qrelsRef, throw new IllegalArgumentException(
        s"node ${node.id}: ranking_eval.qrels_ref '${re.qrelsRef}' is not " +
          "a def — declare the judgment table under top-level defs" +
          (if (refs.isEmpty) "" else s" (defined: ${refs.keys.mkString(", ")})")))
      df = graft.ops.Retrieval.rankingEval(df, re.queryCol, re.docCol,
        re.rankCol, qrels, re.k)
    }

    // Reciprocal-rank fusion: the frame (a combine union of ranked
    // lists) becomes each query's fused top-k. One (query, doc)
    // aggregate + one rank window over top-k-shaped input.
    node.rrfFuse.foreach { rf =>
      requireBatch("rrf_fuse", "a per-query top-k rank window",
        "fuse in batch over the materialized ranked lists")
      df = graft.ops.Retrieval.rrfFuse(df, rf.queryCol, rf.docCol,
        rf.rankCol, rf.topK, rf.rrfK, rf.weightCol)
    }

    // At-rest ANN index build: writes dir/centroids + dir/index
    // (partitioned by list) and the frame becomes the (list, n_vectors)
    // balance histogram — the tuning view for nlist/refine_rounds.
    node.annIndex.foreach { ai =>
      requireBatch("ann_index", "centroid-fit actions and an index write",
        "build the index in batch; search streams of queries instead")
      if (ai.mode == "stats") {
        // health view only — no write, the frame is discarded: the one-row
        // (n_lists, n_empty_lists, n_vectors, max_list_n, mean_list_n,
        // skew) gauge that decides rebuild-vs-append without reading the
        // index parquet by hand
        df = graft.ops.Similarity.annIndexStats(df.sparkSession, ai.dir)
      } else if (ai.mode == "compact") {
        // defragment the appended artifact (one file per list); the
        // frame is discarded and becomes the post-compact histogram
        graft.ops.Similarity.compactAnnIndex(df.sparkSession, ai.dir,
          graft.ops.Artifacts.committedFoldCeiling(
            df.sparkSession, ai.checkpoint))
        df = df.sparkSession.read.parquet(s"${ai.dir}/index")
          .groupBy(col("list")).agg(count(lit(1)).as("n_vectors"))
      } else {
        if (ai.mode == "append")
          graft.ops.Similarity.appendAnnIndex(
            df.sparkSession, df, ai.idCol, ai.vecCol, ai.dir)
        else
          graft.ops.Similarity.saveAnnIndex(
            df.sparkSession, df, ai.idCol, ai.vecCol, ai.dir, ai.nlist,
            ai.refineRounds, ai.pqM.map(m => (m, ai.pqK)), ai.pqIters)
        df = df.sparkSession.read.parquet(s"${ai.dir}/index")
          .groupBy(col("list")).agg(count(lit(1)).as("n_vectors"))
      }
    }

    // Generic quantile-threshold selection: keep the ~keep_n best rows
    // by any numeric column — one sketch pass derives the cut, the keep
    // is a pushed-down predicate. Batch-only by name (the sketch pass is
    // an action over the frame).
    node.quantileFilter.foreach { qf =>
      requireBatch("quantile_filter", "a quantile-sketch pass over the frame",
        "derive the cut in batch and apply it as a plain filter on the stream")
      df = graft.ops.Corpus.quantileFilter(
        df, qf.col, qf.keepN, qf.descending, qf.relativeError)
    }

    // Scan-stage semantic probe against a saved index: each row gains
    // (score_col, flag_col) from one codegen kernel call — zero joins,
    // zero shuffles, so it compiles under streams too (the
    // semantic-decontamination gate on a live ingest).
    node.annProbe.foreach { ap =>
      df = graft.ops.Similarity.annProbeIndex(
        df, ap.vecCol, ap.indexDir, ap.threshold, ap.scoreCol, ap.flagCol)
    }

    // ANN search against a saved index: the frame (the query set)
    // becomes (id_col, match_id, score, rank). Batch-only by name —
    // per-query top-k is a rank window.
    node.annSearch.foreach { as =>
      requireBatch("ann_search", "a per-query top-k rank window",
        "search in batch; the index itself is the at-rest artifact")
      val allowed = as.allowRef.map(r => refs.getOrElse(r,
        throw new IllegalArgumentException(
          s"node ${node.id}: ann_search.allow_ref '$r' is not a def — " +
            "declare the allow-list under top-level defs" +
            (if (refs.isEmpty) "" else s" (defined: ${refs.keys.mkString(", ")})"))))
      df = graft.ops.Similarity.annSearchIndex(
        df, as.idCol, as.vecCol, as.indexDir, as.k, as.nprobe,
        allowed, as.allowIdCol)
    }

    // Tar sharding: the frame becomes (shard, tar, n_members,
    // tar_bytes). One grouped aggregate — batch or stream (a streaming
    // compile needs an aggregate-admitting output mode downstream).
    node.tarPack.foreach { tp =>
      df = graft.ops.Tar.tarShards(df, tp.nameCol, tp.payloadCol, tp.shards)
    }

    // Shard-set compaction: the frame (one row per landed archive, e.g.
    // a tar_pack_ingest output dir) becomes the re-packed (shard, tar,
    // n_members, tar_bytes). Batch-only: a maintenance pass over landed
    // data, not a per-batch stream transform.
    node.tarCompact.foreach { tc =>
      requireBatch("tar_compact", "a whole-history member re-pack",
        "run it as a batch maintenance pass over the landed ingest dir")
      df = graft.ops.Tar.tarCompact(df, tc.tarCol, tc.shards, tc.batchCol)
    }

    // Training-sequence packing: the frame becomes (shard, seq, ids,
    // n_tokens) — per-shard EOS-separated concatenation sliced every
    // seq_len tokens. Batch-only (per-shard running-offset window).
    node.sequencePack.foreach { sp =>
      requireBatch("sequence_pack", "a per-shard running-offset window",
        "pack in batch over landed micro-batch output instead")
      df = graft.ops.Pack.sequencePack(df, sp.idCol, sp.idsCol,
        sp.seqLen, sp.eosId, sp.shards, sp.dropLast, sp.mode,
        sp.withBounds, sp.padId)
    }

    // Winnowed fingerprinting: the frame becomes the compacted index
    // (scan-stage selection) or the shared-fingerprint pair list.
    node.winnow.foreach { wn =>
      df = wn.output match {
        case "pairs" =>
          // self-join + aggregate: not streaming-admissible — reject by
          // name rather than letting Spark fail the plan later
          requireBatch("winnow (pairs)", "a self-join + aggregate",
            "use output=index in batch and probe the stream with " +
              "winnow_probe instead")
          graft.ops.Dedup.winnowCandidatePairs(
            df, wn.idCol, wn.textCol, wn.windowTokens, wn.winnowWindow, wn.minShared)
        case _ => graft.ops.Dedup.winnowIndex(
          df, wn.idCol, wn.textCol, wn.windowTokens, wn.winnowWindow)
      }
    }

    // Scan-stage winnow probe: the Bloom over the persisted compacted
    // index builds ONCE at compile (batch read) — the probed frame
    // never shuffles, so the key is streaming-admissible.
    node.winnowProbe.foreach { wp =>
      val idx = spark.read.parquet(wp.indexDir)
      df = graft.ops.Dedup.winnowProbeBloom(df, wp.textCol, idx,
        wp.windowTokens, wp.winnowWindow, wp.minShared,
        wp.matchedCol, wp.flagCol, wp.expectedKeys, wp.fpp)
    }

    // WebDataset sample grouping: the frame becomes (sample_key,
    // n_files, exts, payload_bytes). One grouped aggregate.
    node.wdsSamples.foreach { ws =>
      df = graft.ops.Tar.wdsSamples(df, ws.nameCol, ws.dataCol)
    }

    // Artifact-loaded DSIR scoring: the log-ratio table loads ONCE at
    // compile (bounded metadata) — scan-stage, streaming-admissible.
    node.dsirScore.foreach { m =>
      val model = graft.ops.Corpus.loadDsirModel(spark, m.modelDir)
      df = graft.ops.Corpus.dsirScore(df, m.textCol, model)
    }

    // Deterministic split: adds the bucket-name column (scan-stage
    // arithmetic, no shuffle); downstream keys filter/aggregate on it.
    node.split.foreach { sp =>
      df = graft.ops.Corpus.hashSplit(df, sp.idCol, sp.buckets, sp.splitCol)
    }

    // HTML extraction: the frame becomes (id, title, body_text, links).
    // Pure per-row kernel — scan-stage, streaming-admissible.
    node.htmlExtract.foreach { he =>
      df = graft.ops.TextAnalysis.htmlExtract(df, he.idCol, he.htmlCol)
    }

    // PDF extraction: the frame becomes (id, version, n_pages, text).
    // Pure per-row kernel — scan-stage, streaming-admissible.
    node.pdfExtract.foreach { pe =>
      df = graft.ops.TextAnalysis.pdfExtract(df, pe.idCol, pe.pdfCol)
    }

    // Per-column profile: the frame becomes the stats rows. A global
    // aggregate (and count_distinct) in batch; under compileStream the
    // ROOT node's profile becomes the per-batch drift monitor instead
    // (stripped before this walk — see compileStream), so any profile
    // REACHING here on a streaming compile is mid-pipeline → named error.
    node.profile.foreach { pr =>
      if (streaming) throw new IllegalArgumentException(
        s"node ${node.id}: profile under a streaming compile must sit on " +
          "the ROOT node, where foreachBatch appends one stats row set " +
          "per micro-batch (the ingest drift monitor); a mid-pipeline " +
          "streaming profile would need a global aggregate")
      df = graft.ops.Relational.profile(df, pr.columns, pr.approx,
        pr.groupCols)
    }

    // Temperature resampling: the frame becomes the sampled subset
    // (schema unchanged). The per-group rates need a count action, so
    // batch-only by name.
    node.temperatureSample.foreach { ts =>
      requireBatch("temperature_sample")
      df = graft.ops.Corpus.temperatureSample(
        df, ts.groupCol, ts.idCol, ts.targetFraction, ts.alpha)
    }

    // Token-budget mixture sampling: the frame becomes the budget-prefix
    // subset (schema unchanged). The per-(group, bucket) sums need an
    // action, so batch-only by name.
    node.tokenBudgetSample.foreach { tb =>
      requireBatch("token_budget_sample", "a bucket-sum action per group",
        "land the stream and budget-sample in batch instead")
      val budgets =
        if (tb.budgets.nonEmpty) tb.budgets
        else graft.ops.Corpus.budgetsFromWeights(tb.weights, tb.totalBudget)
      df = graft.ops.Corpus.tokenBudgetSample(
        df, tb.groupCol, tb.idCol, tb.tokensCol, budgets, tb.overshoot,
        tb.orderCol, tb.descending)
    }

    // Global shuffle: the frame gains (shard, shuffle_pos). The
    // per-shard rank window has no streaming semantics — batch-only by
    // name (a stream's training order is its arrival order).
    node.globalShuffle.foreach { g =>
      if (streaming) throw new IllegalArgumentException(
        s"node ${node.id}: global_shuffle ranks the whole corpus per " +
          "shard — batch-only; a stream has no global permutation")
      df = graft.ops.Corpus.globalShuffle(df, g.idCol, g.shards, g.seed)
    }

    // Boilerplate line removal: the frame becomes (id, clean_text,
    // kept_lines, dropped_lines). Plan-only composition (two bounded
    // aggregates + a broadcast hot-set join), so config-admissible.
    node.boilerplate.foreach { b =>
      df = graft.ops.Corpus.removeBoilerplateLines(
        df, b.idCol, b.textCol, b.maxDocs, b.sep, b.byHash)
    }

    // Multimodal featurize: the frame becomes (media_id, format, width,
    // height, n_bytes, features). Decoders are NAMED (a JSON config can't
    // carry a closure); the registry below is the config-side injection
    // seam — the Scala API takes arbitrary functions.
    node.featurize.foreach { f =>
      val decoder: Array[Byte] => Array[Float] = f.decoder match {
        case "media" => graft.ops.Codecs.mediaFeatures
        case "stub"  => graft.ops.Multimodal.decodeStub
        case other => throw new IllegalArgumentException(
          s"node ${node.id}: unknown featurize decoder '$other' " +
            "(one of: media, stub)")
      }
      // one sweep: header parse + decode from the same bytes — no
      // self-join (which would execute the payload subtree twice and
      // shuffle both sides for row-aligned outputs)
      df = graft.ops.Multimodal.parseAndFeaturize(df, f.idCol, f.payloadCol, decoder)
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_bytes").as("n_bytes"), col("features"))
    }

    node.aggregate.foreach(a => df = applyAggregate(df, a))

    node.rename.foreach { case (o, n) => df = df.withColumnRenamed(o, n) }

    node.withColumns.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }

    // post_filters: the curation slot — unlike `filters` (pre-operator),
    // these see every operator/with_columns output (score, near_dup,
    // n_bpe, …), so one config can score-then-drop. Plain row filters:
    // batch AND streaming admissible.
    node.postFilters.foreach(f => df = df.filter(filterColumn(f)))

    // expect: row-level data contracts (the CHECK-constraint shape every
    // lakehouse engine uses): each rule compiles to a filter that is
    // TRUE for passing rows and raise_error for violations — the check
    // rides the scan/projection stages (zero extra passes over 100 TB;
    // batch AND streaming admissible), unlike an action-based validator
    // which would double-scan. A violation fails the job loudly with
    // the rule name. Plan-dependence caveat (documented in USAGE):
    // Catalyst may evaluate a pushed-down contract on rows a later join
    // would have dropped — express join-dependent contracts on the
    // parent node after its children.
    //
    // NULL semantics — STRICTER than SQL CHECK, deliberately: a rule
    // that evaluates to NULL (e.g. `score > 0` on a NULL score) is a
    // VIOLATION, not a pass. SQL CHECK's pass-on-UNKNOWN is the wrong
    // default for a data contract — the rows it silently waves through
    // are exactly the damaged ones. A contract that should tolerate
    // NULLs says so explicitly: `score IS NULL OR score > 0`.
    // Documented in USAGE.md's `expect` row; tested in CompilerSpec.
    node.expect.foreach { case (name, e) =>
      df = df.filter(when(expr(e), lit(true)).otherwise(raise_error(
        lit(s"expectation '$name' violated: $e"))))
    }

    // expect_report: the AUDIT twin of `expect` — instead of failing on
    // the first violation, the frame becomes one row per rule with its
    // violation count: (rule, n_violations, n_rows). Same deliberate
    // NULL-is-violation semantics (violation ⇔ NOT coalesce(rule, false)
    // — the fail mode's contrapositive), so the two modes always agree
    // on WHICH rows are bad. ONE map-side-combined aggregate pass over
    // the frame, then a rules-sized in-row explode — no per-rule scans.
    // Batch-only by name (a global aggregate has no append-mode plan).
    if (node.expectReportGroups.nonEmpty && node.expectReport.isEmpty)
      throw new IllegalArgumentException(
        s"node ${node.id}: expect_report has group_cols but no rules — " +
          "declare at least one rule_name: \"expr\" entry")
    if (node.expectReport.nonEmpty) {
      requireBatch("expect_report", "a global violation-count aggregate",
        "declare expect_report on the streaming ROOT instead — it becomes " +
          "the per-batch contract monitor (batch_id-stamped scorecard " +
          "rows appended to the path sink)")
      df = graft.ops.Relational.expectReport(df, node.expectReport,
        node.expectReportGroups)
    }

    if (node.drop.nonEmpty) {
      // DataFrame.drop silently ignores unknown names — a typo'd drop would
      // leave the column in the sink with no diagnostic; fail loud instead
      val missing = node.drop.filterNot(df.columns.contains)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"node ${node.id}: drop references unknown columns: ${missing.mkString(", ")}")
      df = df.drop(node.drop: _*)
    }

    node.bitemporal.foreach { b =>
      df = df.withColumn(b.fromCol, lit(b.validFrom)).withColumn(b.toCol, lit(b.validTo))
    }

    node.children.foreach { ch =>
      var childDf = compileNode(spark, ch.node, None, executeSinks, streaming, refs)
      // Join-strategy hint on the child side ("broadcast", "merge",
      // "shuffle_hash", ...). Catalyst resolves it to the matching physical
      // strategy; unknown hint names would be silently ignored by Spark, so
      // reject them here.
      ch.hint.foreach { h =>
        val known = Set("broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl")
        if (!known.contains(h))
          throw new IllegalArgumentException(
            s"node ${node.id}: unknown join hint '$h' (one of: ${known.mkString(", ")})")
        childDf = childDf.hint(h)
      }
      if (ch.prefix) {
        val linkSet = ch.join.link.toSet
        childDf.columns.filterNot(linkSet.contains).foreach { c =>
          childDf = childDf.withColumnRenamed(c, s"${ch.node.id}_$c")
        }
      }
      df = ch.join match {
        case j if j.how == "asof" =>
          val (lts, rts0) = (j.leftTs, j.rightTs) match {
            case (Some(l), Some(r)) => (l, r)
            case _ => throw new IllegalArgumentException(
              s"node ${node.id}: asof join requires left_ts and right_ts")
          }
          // prefix namespacing above renamed every non-link child column,
          // including the as-of timestamp — follow it
          val rts = if (ch.prefix && !j.link.contains(rts0)) s"${ch.node.id}_$rts0" else rts0
          val payload = childDf.columns.filterNot(c => j.link.contains(c) || c == rts)
          graft.ops.Relational.asofJoin(df, childDf, j.link, lts, rts,
            payload.toSeq, direction = j.direction, tolerance = j.tolerance)
        case j if j.how == "interval" =>
          // Lookback/interval join (config surface of Streaming.intervalJoin):
          // right rows within [left_ts − lookback, left_ts] per link key. On
          // a streaming compile with a `stream: true` child this is a
          // stream-stream join; the delays become the two state-eviction
          // watermarks. Batch compiles run the identical equi-join + range
          // filter (the oracle path).
          val (lts, rts0, lb) = (j.leftTs, j.rightTs, j.lookback) match {
            case (Some(l), Some(r), Some(b)) => (l, r, b)
            case _ => throw new IllegalArgumentException(
              s"node ${node.id}: interval join requires left_ts, right_ts and lookback")
          }
          val rts = if (ch.prefix && !j.link.contains(rts0)) s"${ch.node.id}_$rts0" else rts0
          val wm = (j.leftDelay, j.rightDelay) match {
            case (Some(l), Some(r)) => Some((l, r))
            case (None, None)       => None
            case _ => throw new IllegalArgumentException(
              s"node ${node.id}: interval join needs both left_delay and " +
                "right_delay, or neither")
          }
          graft.streaming.Streaming.intervalJoin(df, childDf, j.link, lts, rts, lb, wm)
        case j if j.salt.isDefined =>
          // Skew-salted equi-join (Relational.saltedJoin): parent = the
          // large/skewed side, child = the replicated side — the same
          // parent-fact / child-dimension orientation every other join in
          // the tree uses. A broadcast hint alongside salt is contradictory
          // (a broadcastable child never needs salting; the other hints
          // would pin the strategy Spark should pick for the salted keys),
          // so the combination is rejected by name.
          if (ch.hint.isDefined) throw new IllegalArgumentException(
            s"node ${node.id}: join.salt and a join hint are mutually " +
              "exclusive — salting rewrites the join keys; let Catalyst " +
              "pick the strategy for the salted shuffle")
          graft.ops.Relational.saltedJoin(
            df, childDf, j.link, j.salt.get, j.how)
        case j =>
          j.onExpr match {
            case Some(cond)              => df.join(childDf, expr(cond), j.how)
            case None if j.link.nonEmpty => df.join(childDf, j.link, j.how)
            case None if j.how == "cross" => df.crossJoin(childDf)
            case None =>
              // A link-less, expr-less child used to fall through to a
              // silent crossJoin — so a typo'd join key ("onn" instead of
              // "on") became an n×m cartesian, the worst possible plan at
              // scale. Cartesians must now be asked for by name.
              throw new IllegalArgumentException(
                s"node ${node.id}: child '${ch.node.id}' has no join 'on' " +
                  "keys and no 'on_expr'; a cartesian product must be " +
                  "explicit — set join.how to \"cross\" (check the join " +
                  "spec for a misspelled 'on' key)")
          }
      }
    }

    node.compact.foreach { c =>
      if (c.versionOrder.isEmpty) throw new IllegalArgumentException(
        s"node ${node.id}: compact needs version_order (recency first, " +
          "e.g. [\"ts desc\", \"seq desc\"])")
      if (df.isStreaming) {
        // rank windows don't compile to a streaming plan — the streaming
        // spelling of the same snapshot is a max_by aggregation
        // (Streaming.latestPerKey, one state row per key). max_by's
        // struct comparison is lexicographic-ascending, so it expresses
        // exactly the all-DESC version orders ("latest wins"); reject
        // mixed directions instead of silently mis-ordering.
        val versionCols = c.versionOrder.map { s =>
          val parts = s.trim.split("\\s+").toSeq
          // a bare column defaults to ASC in the batch path (sortColumn),
          // which would pick the OLDEST row while max_by picks the
          // LATEST — same JSON, divergent snapshots. Demand an explicit
          // 'desc'. Likewise 'nulls first': batch would rank null
          // versions first, but max_by's struct comparison ranks nulls
          // last — reject rather than silently diverge.
          if (!parts.tail.exists(_.equalsIgnoreCase("desc")))
            throw new IllegalArgumentException(
              s"node ${node.id}: streaming compact needs all-DESC " +
                s"version_order with explicit desc on every entry " +
                s"(latest wins; bare columns default asc in batch), got '$s'")
          if (parts.tail.exists(_.equalsIgnoreCase("first")))
            throw new IllegalArgumentException(
              s"node ${node.id}: streaming compact cannot honor 'nulls " +
                s"first' (max_by ranks nulls last), got '$s'")
          parts.head
        }
        val originalOrder = df.columns.toSeq
        val payload = originalOrder.filterNot(c.keys.contains)
        df = graft.streaming.Streaming.latestPerKey(
          df, c.keys, versionCols, payload)
        // latestPerKey emits keys ++ payload; restore the node's input
        // column order so batch and stream compiles of one spec agree
        // on schema, not just values
        df = df.select(originalOrder.map(col): _*)
        // tombstone filter on the emitted latest row (update-mode
        // semantics: the sink must upsert by key — see latestPerKey doc)
        c.deleteWhen.foreach(d => df = df.filter(!coalesce(expr(d), lit(false))))
      } else {
        df = graft.ops.Relational.compactChangelog(
          df, c.keys, c.versionOrder.map(sortColumn),
          c.deleteWhen.map(expr).getOrElse(lit(false)))
      }
    }

    // Running totals after compact (totals over the compacted snapshot,
    // if both are set), before topK/orderBy. The same node key streams:
    // flatMapGroupsWithState compiles under readStream inputs with two
    // longs of state per key, and the batch compile of one spec equals
    // the window formulation exactly (StreamingSpec).
    node.runningTotals.foreach { r =>
      df = graft.streaming.Streaming.runningTotals(
        df, r.keyCol, r.seqCol, r.tsCol, r.valueCol)
    }

    node.topK.foreach { t =>
      df = graft.ops.Relational.topKPerGroup(
        df, t.partitionBy, t.orderBy.map(sortColumn), t.k, t.rankCol)
    }

    if (node.orderBy.nonEmpty) df = df.orderBy(node.orderBy.map(sortColumn): _*)
    node.limit.foreach(l => df = df.limit(l))
    if (executeSinks) node.save.foreach(s => writeSink(df, s, s"node ${node.id}"))
    df
  }

  /** Batch sink execution, shared by node and cascade saves. A sink with
    * `layout` directives delegates to the [[graft.ops.Layout]] writers —
    * the config surface of physical data layout; misuse (two modes, a
    * non-parquet format, append mode, a pathless range write, a table-less
    * bucket write) throws with the offending site named rather than
    * silently writing a different layout. */
  private[graft] def writeSink(df: DataFrame, s: SinkSpec, ctx: String): Unit =
    s.layout match {
      case Some(l) =>
        val modes = Seq(
          "partition_by" -> l.partitionBy, "bucket_by" -> l.bucketBy,
          "range_by" -> l.rangeBy, "zorder_by" -> l.zorderBy
        ).filter(_._2.nonEmpty)
        if (modes.size != 1)
          throw new IllegalArgumentException(
            s"$ctx: a layout sink needs exactly ONE of partition_by / " +
              s"bucket_by / range_by / zorder_by, got ${modes.map(_._1).mkString(", ")}")
        if (s.mode != "overwrite")
          throw new IllegalArgumentException(
            s"$ctx: layout sinks are overwrite-only (got mode '${s.mode}')")
        if (s.format != "parquet")
          throw new IllegalArgumentException(
            s"$ctx: layout sinks write parquet (got format '${s.format}')")
        if (l.sortBy.nonEmpty && l.bucketBy.isEmpty)
          throw new IllegalArgumentException(
            s"$ctx: sort_by applies only to bucket_by sinks " +
              "(range_by/zorder_by sort on their own keys)")
        def path: String =
          if (s.path.nonEmpty) s.path
          else throw new IllegalArgumentException(s"$ctx: layout sink needs a path")
        def ranges: Int =
          if (l.ranges > 0) l.ranges
          else throw new IllegalArgumentException(
            s"$ctx: range_by/zorder_by sinks need 'ranges' > 0 (file count " +
              "is a deliberate knob at scale, not a default)")
        if (l.partitionBy.nonEmpty)
          graft.ops.Layout.writePartitioned(df, path, l.partitionBy, l.maxRecordsPerFile)
        else if (l.bucketBy.nonEmpty) {
          val table = s.table.getOrElse(throw new IllegalArgumentException(
            s"$ctx: bucketed sinks are catalog-backed — set 'table', not 'path' " +
              "(bucket metadata lives in the table definition)"))
          if (l.buckets <= 0)
            throw new IllegalArgumentException(s"$ctx: bucket_by needs 'buckets' > 0")
          graft.ops.Layout.writeBucketed(df, table, l.bucketBy, l.buckets, l.sortBy)
        } else if (l.rangeBy.nonEmpty)
          graft.ops.Layout.writeRangeSorted(df, path, l.rangeBy, ranges, l.maxRecordsPerFile)
        else
          graft.ops.Layout.writeZOrdered(df, path, l.zorderBy, l.zorderBits, ranges, l.maxRecordsPerFile)
      case None =>
        val w = df.write.mode(s.mode).options(s.options)
        s.format match {
          case "csv" => w.option("header", "true").csv(s.path)
          case f     => w.format(f).save(s.path)
        }
    }

  /** Iteration×level cascade (`Optimus/optimus.py:40-51`): the source is
    * read once and each iteration's levels chain lazily — output of level k
    * is the input of level k+1. Returns the last iteration's result. */
  def compileCascade(spark: SparkSession, c: CascadeSpec,
      executeSinks: Boolean = true): DataFrame = {
    val src = readSource(spark, c.source)
    // One source feeding >1 iteration: each iteration restarts from `src`.
    // Spark re-uses the scan via plan-level reuse; no .cache() needed for
    // parquet (and caching 100 TB would be wrong).
    val results = c.iterations.map { it =>
      var df = src
      it.levels.foreach(l => df = compileNode(spark, l, Some(df), executeSinks))
      if (executeSinks) it.save.foreach(s => writeSink(df, s, s"iteration ${it.id}"))
      df
    }
    results.last
  }

  // ---- streaming ---------------------------------------------------------

  /** Compile a spec as a Structured Streaming pipeline: the root source
    * becomes a `readStream`, the same node transforms apply (child nodes
    * still read batch — a stream-static join, i.e. free dimension
    * enrichment of the stream), and the root `save` starts a `writeStream`.
    * Returns the running query. Cascades are batch-only (level k+1 would
    * need level k's completed output). */
  def compileStream(spark: SparkSession,
      spec: PipelineSpec): org.apache.spark.sql.streaming.StreamingQuery =
    spec match {
      case TreePipeline(root, defs, tee) =>
        // Defs compile as BATCH frames under a streaming compile too —
        // static dimension tables the stream may JOIN or PROBE
        // (stream-static: range_join/overlap_join intervals, seen-list
        // joins, child equi-joins), never SOURCE from (readStreamSource
        // rejects ref sources by name; a batch frame cannot feed a
        // stream). `cache: true` is rejected by name: a stream outlives
        // the compile and nothing would ever unpersist the pin — rely on
        // Spark re-reading the (small, static) def per micro-batch, or
        // materialize it to parquet first.
        // cache is rejected ANYWHERE in a def's tree (top-level or nested
        // in children/combine — the shared anyCached walk): a nested
        // cache the batch path rejects by name must not silently no-op
        // under streaming.
        defs.foreach { d =>
          if (d.save.isDefined) throw new IllegalArgumentException(
            s"def ${d.id}: defs are definitions — sinks live on the root tree")
          if (anyCached(d)) throw new IllegalArgumentException(
            s"def ${d.id}: cache: true is batch-only — a streaming query " +
              "outlives the compile and the pin would never release; " +
              "materialize the def to parquet and source it by path instead")
        }
        val refs = defs.foldLeft(Map.empty[String, org.apache.spark.sql.DataFrame]) {
          (acc, d) => acc + (d.id ->
            compileNode(spark, d, None, executeSinks = false, refs = acc))
        }
        if (tee.nonEmpty) throw new IllegalArgumentException(
          "tee is batch-only — a streaming query has exactly ONE sink; " +
            "fan out with several streaming queries over the same source " +
            "(each with its own checkpoint) instead")
        val src = root.source.getOrElse(
          throw new IllegalArgumentException("streaming pipeline needs a root source"))
        // A non-root `save` is a batch-only feature (executeSinks=false in
        // the tree walk below): the identical spec writes it under a batch
        // compile but a stream has exactly ONE sink — warn loudly instead
        // of silently diverging from batch behavior.
        def warnIgnored(n: NodeSpec, isRoot: Boolean): Unit = {
          if (!isRoot && n.save.isDefined)
            warn(s"node ${n.id}: 'save' is IGNORED under a streaming " +
              "compile (only the root sink becomes the writeStream); drop " +
              "it or run this node as its own stream")
          (n.children.map(_.node) ++ n.combine.toSeq.flatMap(_.nodes))
            .foreach(warnIgnored(_, isRoot = false))
        }
        warnIgnored(root, isRoot = true)
        val ingestCount = Seq(root.nearDupIngest.isDefined,
          root.passageIngest.isDefined, root.tarPackIngest.isDefined,
          root.exactIngest.isDefined, root.sketchIngest.isDefined,
          root.bm25Ingest.isDefined, root.annIngest.isDefined)
          .count(identity)
        if (ingestCount > 1) throw new IllegalArgumentException(
          "near_dup_ingest, passage_ingest, tar_pack_ingest, " +
            "exact_ingest, sketch_ingest, bm25_ingest, and ann_ingest " +
            "are each a root sink — a stream has ONE; declare one per stream")
        val out = compileNode(spark,
          root.copy(nearDupIngest = None, passageIngest = None,
            tarPackIngest = None, exactIngest = None, sketchIngest = None,
            bm25Ingest = None, annIngest = None,
            profile = None, expectReport = Nil, expectReportGroups = Nil),
          Some(readStreamSource(spark, src)),
          executeSinks = false, streaming = true, refs = refs)
        // The two per-batch MONITOR sinks (profile = drift stats,
        // expect_report = contract scorecard) share the same plumbing:
        // root-only, path sink, batch_id-stamped appends. A stream has
        // ONE sink, so either beside an ingest — or both together —
        // rejects by name.
        def monitorSink(kind: String): graft.spec.SinkSpec = {
          if (root.nearDupIngest.isDefined || root.passageIngest.isDefined ||
              root.tarPackIngest.isDefined || root.exactIngest.isDefined ||
              root.sketchIngest.isDefined || root.bm25Ingest.isDefined ||
              root.annIngest.isDefined)
            throw new IllegalArgumentException(
              s"$kind beside an ingest sink: a stream has ONE sink — " +
                "monitor the ingest's corpus directory with a second stream")
          val sink = root.save.getOrElse(throw new IllegalArgumentException(
            s"streaming $kind needs a root save sink (a parquet/csv " +
              "path the per-batch rows append to)"))
          if (sink.format == "memory" || sink.format == "console")
            throw new IllegalArgumentException(
              s"streaming $kind appends files per batch — use a " +
                "parquet/csv path sink, not memory/console")
          sink
        }
        if (root.profile.isDefined && root.expectReport.nonEmpty)
          throw new IllegalArgumentException(
            "profile and expect_report are both per-batch monitor sinks — " +
              "a stream has ONE; run two streams over the same source")
        // the strip above hides the root's expect_report fields from
        // compileNode's guards — re-assert the two that would otherwise
        // silently no-op or die mid-stream: groups need rules, and group
        // columns must exist on the frame the monitor will observe
        if (root.expectReportGroups.nonEmpty && root.expectReport.isEmpty)
          throw new IllegalArgumentException(
            "expect_report has group_cols but no rules — declare at least " +
              "one rule_name: \"expr\" entry")
        root.expectReportGroups.filterNot(out.columns.contains) match {
          case Nil => ()
          case miss => throw new IllegalArgumentException(
            s"expect_report: group column(s) not on the streaming frame: " +
              s"${miss.mkString(", ")} (have: ${out.columns.mkString(", ")})")
        }
        // Root profile: the per-batch drift monitor — each micro-batch's
        // q149 aggregate appends (batch_id-stamped) to the save sink.
        if (root.profile.isDefined) {
          val pr = root.profile.get
          // same posture as expect_report above: a typo'd column must
          // fail HERE by name, not inside the first micro-batch
          (pr.columns ++ pr.groupCols).filterNot(out.columns.contains) match {
            case Nil => ()
            case miss => throw new IllegalArgumentException(
              s"profile: column(s) not on the streaming frame: " +
                s"${miss.mkString(", ")} (have: ${out.columns.mkString(", ")})")
          }
          graft.streaming.Streaming.profileStream(
            out, pr.columns, pr.approx, monitorSink("profile"), pr.groupCols)
        } else if (root.expectReport.nonEmpty) {
          // Root expect_report: the per-batch contract scorecard.
          graft.streaming.Streaming.expectReportStream(
            out, root.expectReport, root.expectReportGroups,
            monitorSink("expect_report"))
        } else {
          // The ingest ROOT SINKS, name → builder. At most one is
          // present (the ingestCount guard above rejects pairs by
          // name); each one's foreachBatch IS the sink, so a root
          // `save` beside it would silently lose one of the two —
          // reject loudly.
          val ingestSinks = Seq(
            root.nearDupIngest.map(ing => "near_dup_ingest" -> (() =>
              graft.streaming.Streaming.nearDupIngest(
                out, ing.idCol, ing.textCol, ing.corpusDir, ing.indexDir,
                ing.checkpointDir, ing.shingleSize, ing.numHashes,
                ing.bands, ing.threshold, ing.compactEvery))),
            root.passageIngest.map(ing => "passage_ingest" -> (() =>
              graft.streaming.Streaming.passageIngest(
                out, ing.idCol, ing.textCol, ing.corpusDir, ing.indexDir,
                ing.checkpointDir, ing.windowTokens, ing.compactEvery))),
            root.tarPackIngest.map(tp => "tar_pack_ingest" -> (() =>
              graft.streaming.Streaming.shardPackStream(
                out, tp.nameCol, tp.payloadCol, tp.shards, tp.outDir,
                tp.checkpointDir, tp.trigger))),
            root.exactIngest.map(ei => "exact_ingest" -> (() =>
              graft.streaming.Streaming.exactIngest(
                out, ei.idCol, ei.keyCols, ei.corpusDir, ei.indexDir,
                ei.checkpointDir, ei.compactEvery))),
            root.sketchIngest.map(sk => "sketch_ingest" -> (() =>
              graft.streaming.Streaming.sketchIngest(
                out, sk.keyCol, sk.outDir, sk.checkpointDir,
                sk.maxItemsTracked, sk.lgK, sk.groupCols))),
            root.bm25Ingest.map(bi => "bm25_ingest" -> (() =>
              graft.streaming.Streaming.bm25Ingest(
                out, bi.idCol, bi.textCol, bi.indexDir, bi.checkpointDir,
                bi.compactEvery))),
            root.annIngest.map(ai => "ann_ingest" -> (() =>
              graft.streaming.Streaming.annIngest(
                out, ai.idCol, ai.vecCol, ai.indexDir, ai.checkpointDir,
                ai.compactEvery)))
          ).flatten
          ingestSinks match {
            case Seq((name, start)) =>
              if (root.save.isDefined)
                throw new IllegalArgumentException(
                  s"$name replaces the root save sink — declare one or the other")
              start()
            case _ =>
              val sink = root.save.getOrElse(
                throw new IllegalArgumentException(
                  "streaming pipeline needs a root save sink"))
              startStreamSink(out, sink)
          }
        }
      case _: CascadePipeline =>
        throw new IllegalArgumentException("cascade pipelines are batch-only")
    }

  def compileStreamJson(spark: SparkSession,
      json: String): org.apache.spark.sql.streaming.StreamingQuery =
    compileStream(spark, JsonCodec.parse(json))

  /** Streaming read of a source spec. File sources need a schema before
    * the stream starts: inferred once from a batch read of the same path
    * (parquet: footers only; csv with inferSchema: one extra pass —
    * declare `options.schema` DDL to skip it). */
  def readStreamSource(spark: SparkSession, s: SourceSpec): DataFrame =
    (s.sql, s.table, s.path) match {
      case _ if s.ref.isDefined =>
        throw new IllegalArgumentException(
          "a def is a batch frame — it cannot feed a stream; streams " +
            "source from table or path (defs remain joinable/probeable " +
            "as static sides)")
      case (Some(_), _, _) =>
        throw new IllegalArgumentException(
          "sql sources are batch-only; streams need table or path")
      case (_, Some(t), _) => spark.readStream.table(t)
      case (_, _, Some(p)) =>
        // Spark file streams watch a DIRECTORY; a single-file path fails
        // later with a cryptic 'basePath must be a directory' — catch it
        // here with an actionable message.
        val f = new java.io.File(p)
        if (f.isFile)
          throw new IllegalArgumentException(
            s"streaming file source must be a directory, got file: $p " +
              "(stage the file into a directory and point the source there)")
        val r = spark.readStream.options(s.options)
        if (s.format == "warc" || s.format == "tar") {
          // stream the crawl/shard directory file-by-file; the record
          // explode is the same plan as the batch path
          val binSchema = spark.read.format("binaryFile").load(p).schema
          val files = r.schema(binSchema).format("binaryFile").load(p)
          if (s.format == "warc") warcRows(files) else tarRows(files)
        } else {
          val schema = s.options.get("schema") match {
            case Some(ddl) => org.apache.spark.sql.types.StructType.fromDDL(ddl)
            case None      => readSource(spark, s).schema
          }
          r.schema(schema).format(s.format).load(p)
        }
      case _ => throw new IllegalArgumentException(s"source needs table or path: $s")
    }

  /** Start a `writeStream` for a sink spec. Defaults are deliberately
    * conservative: no trigger key = continuous micro-batches;
    * "available_now"/"once" = drain what exists then stop (backfill /
    * catch-up runs); an interval = Trigger.ProcessingTime. */
  def startStreamSink(df: DataFrame,
      s: SinkSpec): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    s.layout.foreach { l =>
      // hive partitioning streams fine (each micro-batch lands in its
      // partition directories); the other three need a global pass —
      // range sampling, catalog bucketing, quantile cutpoints — that a
      // micro-batch writer can't do. Re-layout landed data in batch.
      if (l.bucketBy.nonEmpty || l.rangeBy.nonEmpty || l.zorderBy.nonEmpty)
        throw new IllegalArgumentException(
          "bucket_by/range_by/zorder_by sinks are batch-only (they need a " +
            "global pass over the data); streams support partition_by only")
    }
    var w = df.writeStream.options(s.options)
    s.layout.map(_.partitionBy).filter(_.nonEmpty)
      .foreach(p => w = w.partitionBy(p: _*))
    s.outputMode.foreach(m => w = w.outputMode(m))
    s.checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    s.trigger.foreach {
      case "available_now" | "availableNow" | "once" =>
        w = w.trigger(Trigger.AvailableNow())
      case interval => w = w.trigger(Trigger.ProcessingTime(interval))
    }
    s.format match {
      case "memory" =>
        w.format("memory").queryName(s.queryName.getOrElse("graft_stream")).start()
      case "console" => w.format("console").start()
      case "csv"     => w.format("csv").option("header", "true").start(s.path)
      case f         => w.format(f).start(s.path)
    }
  }

  // ---- pieces ------------------------------------------------------------

  def readSource(spark: SparkSession, s: SourceSpec): DataFrame =
    (s.sql, s.table, s.path) match {
      case (Some(q), _, _) => spark.sql(q)
      case (_, Some(t), _) => spark.table(t)
      case (_, _, Some(p)) =>
        val r = spark.read.options(s.options)
        s.format match {
          case "csv" =>
            // ref default: header + inferSchema (`Optimus/optimus.py:38`)
            r.option("header", s.options.getOrElse("header", "true"))
              .option("inferSchema", s.options.getOrElse("inferSchema", "true"))
              .csv(p)
          case "json" => r.json(p)
          case "warc" => warcRows(r.format("binaryFile").load(p))
          case "tar"  => tarRows(r.format("binaryFile").load(p))
          case f      => r.format(f).load(p)
        }
      case _ if s.ref.isDefined => throw new IllegalArgumentException(
        s"source ref '${s.ref.get}' resolves only inside Compiler.compile " +
          "(refs address pipeline-level defs)")
      case _ => throw new IllegalArgumentException(s"source needs sql, table or path: $s")
    }

  /** binaryFile rows (path, ..., content) → one row per WARC record:
    * (warc_file, url, warc_type, warc_date, content_length, payload).
    * Parallelism is the file dimension — the standard many-file crawl
    * layout; payload stays binary for the media kernels downstream. */
  private def warcRows(files: DataFrame): DataFrame =
    files.select(col("path").as("warc_file"),
        explode(graft.functions.WarcKernels.warcRecords(
          // 1f 8b sniff: .warc and .warc.gz (member-per-record) files
          // read from one directory with one plan
          graft.functions.GzipKernels.gunzipAuto(col("content")))).as("__r"))
      .select(col("warc_file"), col("__r.url").as("url"),
        col("__r.warc_type").as("warc_type"),
        col("__r.warc_date").as("warc_date"),
        col("__r.content_length").as("content_length"),
        col("__r.payload").as("payload"))

  /** binaryFile rows → one row per tar member: (tar_file, name, size,
    * data) — the WebDataset shard reader (gzip-wrapped .tar.gz shards
    * inflate first via the 1f 8b sniff, like the WARC path). */
  private def tarRows(files: DataFrame): DataFrame =
    files.select(col("path").as("tar_file"),
        explode(graft.functions.TarKernels.tarMembers(
          graft.functions.GzipKernels.gunzipAuto(col("content")))).as("__m"))
      .select(col("tar_file"), col("__m.name").as("name"),
        col("__m.size").as("size"), col("__m.data").as("data"))

  def filterColumn(f: FilterSpec): Column = f match {
    case ExprFilter(e) => expr(e)
    case ColFilter(c, op, v, nullSafe) =>
      val l = col(c)
      op match {
        case "==" | "=" | "eq" => if (nullSafe) l <=> litOf(v) else l === litOf(v)
        case "!=" | "<>"       => l =!= litOf(v)
        case ">"               => l > litOf(v)
        case "<"               => l < litOf(v)
        case ">="              => l >= litOf(v)
        case "<="              => l <= litOf(v)
        case "isin" | "in" =>
          val vs = v match { case JArr(xs) => xs.map(anyOf); case x => Seq(anyOf(x)) }
          l.isin(vs: _*)
        case "not_isin" | "not_in" =>
          val vs = v match { case JArr(xs) => xs.map(anyOf); case x => Seq(anyOf(x)) }
          !l.isin(vs: _*)
        case "is_null"            => l.isNull
        case "is_not_null"        => l.isNotNull
        case "contains"           => l.contains(anyOf(v))
        case "starts_with"        => l.startsWith(anyOf(v).toString)
        case "ends_with"          => l.endsWith(anyOf(v).toString)
        case other => throw new IllegalArgumentException(s"unknown filter op '$other'")
      }
  }

  private def litOf(v: JValue): Column = lit(anyOf(v))
  private def anyOf(v: JValue): Any = v match {
    case JStr(s)  => s
    case JInt(i)  => i
    case JNum(d)  => d
    case JBool(b) => b
    case JNull    => null
    case JArr(xs) => xs.map(anyOf)
  }

  /** One aggregation expression. Filtered aggregates compile to
    * `func(when(pred, col))` ≡ SQL `func(x) FILTER (WHERE pred)` — plain
    * Catalyst, codegen-friendly, partial+final map-side combine intact. */
  def aggColumn(a: AggSpec): Column = {
    val in: Column =
      if (a.col == "*") lit(1)
      else a.filter match {
        case Some(p) => when(expr(p), col(a.col))
        case None    => col(a.col)
      }
    val agg = a.func match {
      case "sum"                   => sum(in)
      // Deterministic double sum/avg for oracle-compared outputs: decimal
      // addition is exact + associative, so partial/final aggregation order
      // can't change the result (see graft.Tables.dsum).
      case "dsum" =>
        sum(in.cast(org.apache.spark.sql.types.DecimalType(25, 6))).cast("double")
      case "davg" =>
        sum(in.cast(org.apache.spark.sql.types.DecimalType(25, 6))).cast("double") / count(in)
      case "min"                   => min(in)
      case "max"                   => max(in)
      case "avg" | "mean"          => avg(in)
      case "count" if a.col == "*" => a.filter.map(p => count(when(expr(p), lit(1)))).getOrElse(count(lit(1)))
      case "count"                 => count(in)
      case "count_distinct"        => count_distinct(in)
      case "approx_count_distinct" => approx_count_distinct(in)
      case "sum_distinct"          => sum_distinct(in)
      case "first"                 => first(in, ignoreNulls = true)
      case "last"                  => last(in, ignoreNulls = true)
      case "any_value"             => any_value(in, lit(true))
      case "collect_set"           => array_sort(collect_set(in))
      case "collect_list"          => collect_list(in)
      case "stddev"                => stddev(in)
      case "variance"              => variance(in)
      case "median"                => median(in)
      // Exact percentile sorts values within each group — fine per-group,
      // but for GLOBAL quantiles at 100 TB use approx_percentile: a
      // mergeable sketch with partial+final combine, no sort (SURVEY §2.2).
      case "percentile"            => percentile(in, lit(a.param.getOrElse(0.5)))
      case "approx_percentile" | "percentile_approx" =>
        percentile_approx(in, lit(a.param.getOrElse(0.5)), lit(10000))
      case other                   =>
        // Pass-through for any other Spark SQL aggregate. col="*" has no
        // SQL spelling here, and the filter must be compiled in (silently
        // dropping it would return unfiltered results).
        if (a.col == "*")
          throw new IllegalArgumentException(
            s"aggregate function '$other' requires a concrete column, not '*'")
        val inner = a.filter
          .map(p => s"CASE WHEN ($p) THEN ${a.col} END")
          .getOrElse(a.col)
        // `param` rides as the second argument (integral values render as
        // INT — sketch capacities like approx_top_k_accumulate's
        // maxItemsTracked are int-typed); silently dropping it would
        // aggregate at the wrong precision.
        val arg = a.param.map(p =>
          if (p.isWhole) s", ${p.toLong}" else s", $p").getOrElse("")
        expr(s"$other($inner$arg)")
    }
    agg.as(a.newName.getOrElse(s"${a.func}_${if (a.col == "*") "all" else a.col}"))
  }

  def applyAggregate(df: DataFrame, a: AggregateSpec): DataFrame = {
    a.salt.filter(_ > 1).foreach { buckets =>
      // Salted two-phase aggregation: strictly for decomposable functions
      // on a plain groupBy (phase-2 merge semantics exist only for those).
      if (a.mode != "groupBy" || a.keep.nonEmpty || a.groupBy.isEmpty || a.pivot.nonEmpty)
        throw new IllegalArgumentException(
          "salt requires a plain groupBy with group keys, no keep columns, no pivot")
      val aggs3 = a.aggs.map { g =>
        if (g.filter.nonEmpty)
          throw new IllegalArgumentException("salt does not support per-agg filters")
        (g.col, g.func,
          g.newName.getOrElse(s"${g.func}_${if (g.col == "*") "all" else g.col}"))
      }
      return graft.ops.Relational.saltedAggregate(df, a.groupBy, aggs3, buckets)
    }
    // keep_columns that aren't group keys: reference selects them verbatim
    // post-agg (`Optimus/optimus.py:31`) which is invalid under ANSI —
    // resolve to any_value(c) (SURVEY §2.1 P2).
    val keepExprs = a.keep.filterNot(a.groupBy.contains)
      .map(c => any_value(col(c), lit(true)).as(c))
    val aggExprs = a.aggs.map(aggColumn) ++ keepExprs
    if (a.groupBy.isEmpty && a.mode == "groupBy") {
      df.agg(aggExprs.head, aggExprs.tail: _*)
    } else {
      val keys = a.groupBy.map(col)
      val grouped = a.mode match {
        case "rollup" => df.rollup(keys: _*)
        case "cube"   => df.cube(keys: _*)
        case "grouping_sets" | "groupingSets" =>
          // Arbitrary GROUPING SETS ((a),(b,c),()): `sets` lists the
          // subsets; `groupBy` stays the full output column list.
          df.groupingSets(a.sets.map(_.map(col)), keys: _*)
        case _        => df.groupBy(keys: _*)
      }
      a.pivot match {
        case Some(p) =>
          if (a.mode != "groupBy")
            throw new IllegalArgumentException("pivot requires plain groupBy mode")
          if (p.values.isEmpty)
            throw new IllegalArgumentException(
              "pivot needs explicit values (an implicit pivot costs a distinct pass)")
          grouped.pivot(p.col, p.values.map(anyOf)).agg(aggExprs.head, aggExprs.tail: _*)
        case None => grouped.agg(aggExprs.head, aggExprs.tail: _*)
      }
    }
  }

  /** "col", "col asc", "col desc", with optional "nulls first"/"nulls
    * last". Default: asc nulls first (Spark's default), stated explicitly
    * so oracle SQL can mirror it. */
  def sortColumn(s: String): Column = {
    val parts = s.trim.split("\\s+").toSeq
    val c = col(parts.head)
    parts.tail.map(_.toLowerCase).mkString(" ") match {
      case "" | "asc" | "asc nulls first" => c.asc_nulls_first
      case "asc nulls last"               => c.asc_nulls_last
      case "desc" | "desc nulls last"     => c.desc_nulls_last
      case "desc nulls first"             => c.desc_nulls_first
      case other => throw new IllegalArgumentException(s"bad sort spec '$other'")
    }
  }
}
