package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON → PipelineSpec decoder.
  *
  * Accepts the engine's canonical config schema AND the reference's
  * observed key spellings (`group_by`, `keep_columns`,
  * `aggregations[{agg_col, agg_func, new_name}]`,
  * `filters[{filter_col, filter_op, filter_value}]` —
  * `Optimus/optimus.py:58-75`; `aggregation{group_by, aggregations
  * {col:[funcs]}, rename{}}` — `sparks/optimus.py:52-76`;
  * `aggregate{col: func | {filter, function}}` — `Optimus/hotrod.py:83-113`;
  * `iterations[{id, level_*}]` — `Optimus/optimus.py:54-80`), so a user of
  * the reference can feed their existing configs in unchanged.
  *
  * Uses the jackson-databind that ships in /opt/spark/jars (no new deps).
  */
object JsonCodec {
  private val mapper = new ObjectMapper()

  def parse(json: String): PipelineSpec = {
    val root = mapper.readTree(json)
    if (root.has("iterations")) CascadePipeline(cascade(root))
    else {
      val defs = opt(root, "defs").map { d =>
        if (!d.isArray)
          throw new IllegalArgumentException("defs must be an array of nodes")
        elems(d).zipWithIndex.map { case (dn, i) =>
          val nd = node(dn, s"def$i")
          if (!dn.has("id") && !dn.has("unique_id"))
            throw new IllegalArgumentException(
              s"defs[$i]: every def needs an explicit id — refs address it")
          nd
        }
      }.getOrElse(Nil)
      val dupIds = defs.groupBy(_.id).collect { case (k, vs) if vs.size > 1 => k }
      if (dupIds.nonEmpty)
        throw new IllegalArgumentException(
          s"duplicate def ids: ${dupIds.mkString(", ")}")
      val tee = opt(root, "tee").map { t =>
        if (!t.isArray)
          throw new IllegalArgumentException("tee must be an array of nodes")
        elems(t).zipWithIndex.map { case (tn, i) =>
          val nd = node(tn, s"tee$i")
          // a tee is a side-OUTPUT: its whole purpose is the sink
          if (nd.save.isEmpty)
            throw new IllegalArgumentException(
              s"tee ${nd.id}: every tee needs a 'save' sink — a tee " +
                "without output is dead work (put shared computation in " +
                "a cached def instead)")
          if (nd.source.isEmpty && nd.combine.isEmpty)
            throw new IllegalArgumentException(
              s"tee ${nd.id}: a tee needs a source — typically " +
                """{"ref": "<cached def>"} so the scan is paid once""")
          nd
        }
      }.getOrElse(Nil)
      val rootNode = node(root, "root", extraAllowed = Set("defs", "tee"))
      // two tees (or a tee and the root) writing one path would silently
      // clobber each other — overwrite mode makes the last writer win
      val sinkPaths = (tee ++ Seq(rootNode)).flatMap(_.save)
        .map(_.path).filter(_.nonEmpty)
      val dupPaths = sinkPaths.groupBy(identity)
        .collect { case (p, xs) if xs.size > 1 => p }
      if (dupPaths.nonEmpty && tee.nonEmpty)
        throw new IllegalArgumentException(
          s"tee: several sinks write the same path(s): " +
            s"${dupPaths.mkString(", ")} — overwrite mode means the last " +
            "writer silently wins; give each side output its own path")
      TreePipeline(rootNode, defs, tee)
    }
  }

  def parseNode(json: String): NodeSpec = node(mapper.readTree(json), "root")

  // ---- helpers -----------------------------------------------------------

  private def fields(n: JsonNode): Seq[(String, JsonNode)] =
    n.fields().asScala.map(e => (e.getKey, e.getValue)).toSeq

  private def elems(n: JsonNode): Seq[JsonNode] = n.elements().asScala.toSeq

  /** `checkpoint` scopes a delta fold to the ingest stream's COMMITTED
    * batches — it only means something under mode "compact"; shared by
    * the bm25_index and ann_index decoders so the wording cannot
    * drift. */
  private def requireCompactOnlyCheckpoint(
      ctx: String, mode: String, checkpoint: Option[String]): Unit =
    require(checkpoint.isEmpty || mode == "compact",
      s"""$ctx: "checkpoint" is a compact-only key (it scopes the """ +
        "delta fold to the ingest stream's committed batches) — " +
        s"""remove it, or use mode "compact"""")

  /** `compact_every: N` on an ingest sink — fold the ingest's grown
    * areas every N batches inside foreachBatch; shared by the three
    * area-layout ingest decoders wired at the config surface
    * (near_dup/passage/exact — semantic_ingest exposes compactEvery at
    * the Streaming API only) and validated once so the wording cannot
    * drift. */
  private def ingestCompactEvery(d: JsonNode, ctx: String): Option[Int] = {
    val ce = opt(d, "compact_every", "compactEvery").map(_.asInt)
    ce.foreach(n => require(n >= 1,
      s"$ctx: compact_every must be >= 1, got $n"))
    ce
  }

  private def strSeq(n: JsonNode): Seq[String] =
    if (n == null) Nil
    else if (n.isTextual) Seq(n.asText)
    else elems(n).map(_.asText)

  private def opt(n: JsonNode, keys: String*): Option[JsonNode] =
    keys.collectFirst { case k if n.has(k) && !n.get(k).isNull => n.get(k) }

  /** Required sub-key with a parse-time diagnostic naming the site — a
    * bare `.get` would surface a malformed config as a
    * NoSuchElementException with no hint of where (round-2 advice). */
  private def req(n: JsonNode, ctx: String, keys: String*): JsonNode =
    opt(n, keys: _*).getOrElse(throw new IllegalArgumentException(
      s"$ctx requires '${keys.head}' (got: ${n.toString.take(200)})"))

  def jvalue(n: JsonNode): JValue =
    if (n == null || n.isNull) JNull
    else if (n.isTextual) JStr(n.asText)
    else if (n.isIntegralNumber) JInt(n.asLong)
    else if (n.isNumber) JNum(n.asDouble)
    else if (n.isBoolean) JBool(n.asBoolean)
    else if (n.isArray) JArr(elems(n).map(jvalue))
    else JStr(n.toString)

  // ---- node --------------------------------------------------------------

  private[spec] def node(n: JsonNode, defaultId: String,
      extraAllowed: Set[String] = Set.empty): NodeSpec = {
    // Every node-level key access routes through optN/reqN so the set of
    // KNOWN keys is recorded mechanically; unknown keys fail loudly at
    // parse time — a typo'd operator key ("semantic_dedpu") silently
    // no-opping is the worst possible config-language failure mode.
    val accessed = scala.collection.mutable.HashSet.empty[String]
    def optN(keys: String*): Option[JsonNode] = { accessed ++= keys; opt(n, keys: _*) }
    val id = optN("id", "unique_id").map(_.asText).getOrElse(defaultId)

    val source = optN("source", "data_path").map { s =>
      if (s.isTextual) {
        val p = s.asText
        val fmt =
          if (p.endsWith(".csv")) "csv"
          else if (p.endsWith(".json") || p.endsWith(".jsonl")) "json"
          else "parquet"
        SourceSpec(format = fmt, path = Some(p))
      } else {
        val src = SourceSpec(
          format = opt(s, "format").map(_.asText).getOrElse("parquet"),
          path = opt(s, "path").map(_.asText),
          table = opt(s, "table").map(_.asText),
          sql = opt(s, "sql", "sql_query").map(_.asText),
          options = opt(s, "options")
            .map(o => fields(o).map { case (k, v) => k -> v.asText }.toMap)
            .getOrElse(Map.empty),
          stream = opt(s, "stream").exists(_.asBoolean(false)),
          ref = opt(s, "ref").map(_.asText)
        )
        if (src.ref.isDefined &&
            (src.path.isDefined || src.table.isDefined || src.sql.isDefined))
          throw new IllegalArgumentException(
            s"node $id: source ref is exclusive with path/table/sql — " +
              "a ref IS the frame")
        src
      }
    }

    def filterItems(f: JsonNode): Seq[FilterSpec] = {
        val items = if (f.isArray) elems(f) else Seq(f)
        items.map {
          case t if t.isTextual => ExprFilter(t.asText)
          case o =>
            ColFilter(
              col = req(o, s"node $id: filter", "col", "filter_col", "column").asText,
              op = opt(o, "op", "filter_op").map(_.asText).getOrElse("=="),
              value = jvalue(opt(o, "value", "filter_value").orNull),
              nullSafe =
                opt(o, "null_safe", "nullSafe").exists(_.asBoolean(false))
            )
        }
    }

    val filters: Seq[FilterSpec] =
      optN("filters", "filter").toSeq.flatMap(filterItems)
    // post_filters run AFTER the operator keys + with_columns, so they can
    // reference computed outputs (score, near_dup, n_bpe, …)
    val postFilters: Seq[FilterSpec] =
      optN("post_filters", "postFilters").toSeq.flatMap(filterItems)

    val keep = optN("keep_columns", "keep").map(strSeq).getOrElse(Nil)

    // Aggregation: canonical {"group_by":[...], "aggregations":[{col,func,
    // new_name,filter}]} or any of the reference spellings.
    val aggNode = optN("aggregate", "aggregation")
    val aggregate: Option[AggregateSpec] = aggNode match {
      case Some(a) if a.isObject && (a.has("group_by") || a.has("aggregations")) =>
        Some(
          AggregateSpec(
            groupBy = opt(a, "group_by", "groupBy").map(strSeq).getOrElse(Nil),
            aggs = aggList(opt(a, "aggregations", "aggs").orNull),
            keep = opt(a, "keep_columns", "keep").map(strSeq).getOrElse(Nil),
            mode = opt(a, "mode").map(_.asText)
              .getOrElse(if (a.has("sets") || a.has("grouping_sets")) "grouping_sets" else "groupBy"),
            sets = opt(a, "sets", "grouping_sets").toSeq
              .flatMap(ss => elems(ss).map(strSeq)),
            salt = opt(a, "salt").map(_.asInt),
            pivot = opt(a, "pivot").map(p =>
              PivotSpec(
                col = req(p, s"node $id: aggregate.pivot", "col", "column").asText,
                values = opt(p, "values").toSeq.flatMap(elems).map(jvalue)))
          )
        )
      case Some(a) if a.isObject =>
        // hotrod spelling: "aggregate": {col: "func" | {"filter","function"}}
        // with sibling "group_by"/"link" keys on the node.
        val aggs = fields(a).map {
          case (c, v) if v.isTextual => AggSpec(c, v.asText)
          case (c, v) =>
            AggSpec(
              c,
              opt(v, "function", "func").map(_.asText).getOrElse("sum"),
              newName = opt(v, "new_name", "as").map(_.asText),
              filter = opt(v, "filter").map(_.asText)
            )
        }
        Some(
          AggregateSpec(
            groupBy = optN("group_by").map(strSeq).getOrElse(Nil),
            aggs = aggs
          )
        )
      case None if n.has("group_by") || n.has("aggregations") =>
        // optimus.py flat spelling: group_by/keep_columns/aggregations
        // directly on the node
        Some(
          AggregateSpec(
            groupBy = optN("group_by").map(strSeq).getOrElse(Nil),
            aggs = aggList(optN("aggregations").orNull),
            keep = keep
          )
        )
      case _ => None
    }

    val rename: Seq[(String, String)] = optN("rename").toSeq.flatMap(r =>
      fields(r).map { case (o2, n2) => o2 -> n2.asText }
    )

    val withCols: Seq[(String, String)] =
      optN("with_columns", "withColumns").toSeq.flatMap(w =>
        fields(w).map { case (c, e) => c -> e.asText }
      )

    // derive = computed columns applied BEFORE keep/aggregate (usable as
    // group keys / agg inputs); with_columns applies after aggregation
    val derive: Seq[(String, String)] =
      optN("derive").toSeq.flatMap(w =>
        fields(w).map { case (c, e) => c -> e.asText }
      )

    val dd = optN("dedup", "drop_duplicates").map { d =>
      if (d.isArray || d.isTextual) DedupSpec(keys = strSeq(d))
      else {
        val ds = DedupSpec(
          keys = opt(d, "keys", "on").map(strSeq).getOrElse(Nil),
          idCol = opt(d, "id_col", "idCol").map(_.asText),
          withinWatermark =
            opt(d, "within_watermark", "withinWatermark").exists(_.asBoolean(false)),
          orderCol = opt(d, "order_col", "orderCol").map(_.asText),
          descending = opt(d, "descending").forall(_.asBoolean(true)),
          countCol = opt(d, "count_col", "countCol").map(_.asText))
        require(ds.orderCol.isEmpty || ds.idCol.nonEmpty,
          s"node $id: dedup.order_col needs id_col for the tie-break — " +
            "a score-only winner is nondeterministic on tied scores")
        require(ds.countCol.isEmpty || ds.idCol.nonEmpty,
          s"node $id: dedup.count_col needs id_col — class size is " +
            "aggregated alongside the deterministic winner")
        ds
      }
    }

    // Best-copy retention for cluster-output tiers — validated at decode
    // time: the key only makes sense over clusters, and a silent no-op
    // on pairs output is the config-language failure mode this codec
    // exists to prevent.
    def retentionOf(d: JsonNode, key: String, output: String): Option[RetentionSpec] =
      opt(d, "retention").map { r =>
        require(output == "clusters",
          s"""node $id: $key.retention needs output: "clusters" — """ +
            s"""best-copy retention has no meaning over "$output" output""")
        RetentionSpec(
          orderCol = req(r, s"node $id: $key.retention", "order_col", "orderCol").asText,
          descending = opt(r, "descending").forall(_.asBoolean(true)))
      }

    val nd = optN("near_dup", "nearDup").map { d =>
      val out = opt(d, "output").map(_.asText).map {
        case s @ ("pairs" | "clusters") => s
        case other => throw new IllegalArgumentException(
          s"""node $id: near_dup output must be "pairs" or "clusters" — got "$other"""")
      }.getOrElse("pairs")
      NearDupSpec(
        idCol = req(d, s"node $id: near_dup", "id_col", "idCol").asText,
        vecCol = req(d, s"node $id: near_dup", "vec_col", "vecCol").asText,
        threshold = req(d, s"node $id: near_dup", "threshold").asDouble,
        dim = req(d, s"node $id: near_dup", "dim").asInt,
        numBits = opt(d, "num_bits", "numBits").map(_.asInt).getOrElse(64),
        bands = opt(d, "bands").map(_.asInt).getOrElse(8),
        output = out,
        retention = retentionOf(d, "near_dup", out))
    }

    val smd = optN("semantic_dedup", "semanticDedup").map { d =>
      SemanticDedupSpec(
        idCol = req(d, s"node $id: semantic_dedup", "id_col", "idCol").asText,
        vecCol = req(d, s"node $id: semantic_dedup", "vec_col", "vecCol").asText,
        threshold = req(d, s"node $id: semantic_dedup", "threshold").asDouble,
        dim = req(d, s"node $id: semantic_dedup", "dim").asInt,
        nlist = opt(d, "nlist").map(_.asInt).getOrElse(16),
        refineRounds = opt(d, "refine_rounds", "refineRounds").map(_.asInt).getOrElse(0),
        exact = opt(d, "exact").exists(_.asBoolean),
        // HIGH-threshold production regime (τ ≥ 0.9): wide bands prune;
        // the low-τ near_dup default (2-bit keys) would go quadratic here
        numBits = opt(d, "num_bits", "numBits").map(_.asInt).getOrElse(64),
        bands = opt(d, "bands").map(_.asInt).getOrElse(8),
        output = opt(d, "output").map(_.asText).map {
          case s @ ("keep" | "labels" | "pairs") => s
          case other => throw new IllegalArgumentException(
            s"""node $id: semantic_dedup output must be "keep", "labels" or "pairs" — got "$other"""")
        }.getOrElse("keep"))
    }

    val ed = optN("edit_dedup", "editDedup").map { d =>
      EditDedupSpec(
        idCol = req(d, s"node $id: edit_dedup", "id_col", "idCol").asText,
        textCol = req(d, s"node $id: edit_dedup", "text_col", "textCol").asText,
        blockExpr = req(d, s"node $id: edit_dedup", "block_expr", "blockExpr").asText,
        threshold = opt(d, "threshold").map(_.asDouble).getOrElse(0.8),
        maxDistance = opt(d, "max_distance", "maxDistance").map(_.asInt),
        // default-on skew guard; an int pins a user cap, "off" opts out
        bucketCap = opt(d, "max_bucket_size", "maxBucketSize").map { v =>
          if (v.isNumber) graft.ops.BucketCap.Max(v.asInt)
          else v.asText match {
            case "auto" => graft.ops.BucketCap.Auto
            case "off"  => graft.ops.BucketCap.Off
            case other => throw new IllegalArgumentException(
              s"node $id: edit_dedup.max_bucket_size must be an int, " +
                s""""auto" or "off" — got "$other"""")
          }
        }.getOrElse(graft.ops.BucketCap.Auto))
    }

    // Perceptual dedup output shape — validated HERE at decode time so a
    // typo'd shape is a spec error, not a runtime surprise mid-pipeline.
    def dedupOutput(d: JsonNode, key: String): String =
      opt(d, "output").map(_.asText).map {
        case s @ ("pairs" | "clusters") => s
        case other => throw new IllegalArgumentException(
          s"""node $id: $key output must be "pairs" or "clusters" — got "$other"""")
      }.getOrElse("pairs")

    val imd = optN("image_dedup", "imageDedup").map { d =>
      ImageDedupSpec(
        idCol = req(d, s"node $id: image_dedup", "id_col", "idCol").asText,
        payloadCol = req(d, s"node $id: image_dedup", "payload_col", "payloadCol").asText,
        maxDist = opt(d, "max_dist", "maxDist").map(_.asInt).getOrElse(6),
        output = dedupOutput(d, "image_dedup"),
        retention = retentionOf(d, "image_dedup", dedupOutput(d, "image_dedup")))
    }

    val shd = optN("simhash_dedup", "simhashDedup").map { d =>
      SimhashDedupSpec(
        idCol = req(d, s"node $id: simhash_dedup", "id_col", "idCol").asText,
        textCol = req(d, s"node $id: simhash_dedup", "text_col", "textCol").asText,
        maxDist = opt(d, "max_dist", "maxDist").map(_.asInt).getOrElse(3),
        output = dedupOutput(d, "simhash_dedup"),
        retention = retentionOf(d, "simhash_dedup", dedupOutput(d, "simhash_dedup")))
    }

    val aud = optN("audio_dedup", "audioDedup").map { d =>
      AudioDedupSpec(
        idCol = req(d, s"node $id: audio_dedup", "id_col", "idCol").asText,
        payloadCol = req(d, s"node $id: audio_dedup", "payload_col", "payloadCol").asText,
        maxDist = opt(d, "max_dist", "maxDist").map(_.asInt).getOrElse(6),
        output = dedupOutput(d, "audio_dedup"),
        retention = retentionOf(d, "audio_dedup", dedupOutput(d, "audio_dedup")))
    }

    val pd = optN("passage_dedup", "passageDedup").map { d =>
      PassageDedupSpec(
        idCol = req(d, s"node $id: passage_dedup", "id_col", "idCol").asText,
        textCol = req(d, s"node $id: passage_dedup", "text_col", "textCol").asText,
        windowTokens = opt(d, "window_tokens", "windowTokens").map(_.asInt).getOrElse(50),
        output = opt(d, "output").map(_.asText).map {
          case s @ ("spans" | "strip") => s
          case other => throw new IllegalArgumentException(
            s"""node $id: passage_dedup output must be "spans" or "strip" — got "$other"""")
        }.getOrElse("spans"))
    }

    val lm = optN("lm_perplexity", "lmPerplexity").map { d =>
      LmPerplexitySpec(
        idCol = req(d, s"node $id: lm_perplexity", "id_col", "idCol").asText,
        textCol = req(d, s"node $id: lm_perplexity", "text_col", "textCol").asText,
        k = opt(d, "k").map(_.asDouble).getOrElse(0.5),
        keepUnscored = opt(d, "keep_unscored", "keepUnscored")
          .exists(_.asBoolean(false)),
        smoothing = opt(d, "smoothing").map(_.asText).map {
          case s @ ("addk" | "kn") => s
          case other => throw new IllegalArgumentException(
            s"""node $id: lm_perplexity smoothing must be "addk" or "kn" — got "$other"""")
        }.getOrElse("addk"),
        discount = opt(d, "discount").map(_.asDouble).getOrElse(0.75))
    }

    val qc = optN("quality_classifier", "qualityClassifier").map { d =>
      QualityClassifierSpec(
        idCol = req(d, s"node $id: quality_classifier", "id_col", "idCol").asText,
        textCol = req(d, s"node $id: quality_classifier", "text_col", "textCol").asText,
        labelCol = req(d, s"node $id: quality_classifier", "label_col", "labelCol").asText,
        dim = opt(d, "dim").map(_.asInt).getOrElse(1024),
        epochs = opt(d, "epochs").map(_.asInt).getOrElse(8),
        lr = opt(d, "lr").map(_.asDouble).getOrElse(0.8),
        threshold = opt(d, "threshold").map(_.asDouble).getOrElse(0.5))
    }

    val mcc = optN("multiclass_classifier", "multiclassClassifier").map { d =>
      MulticlassClassifierSpec(
        idCol = req(d, s"node $id: multiclass_classifier", "id_col", "idCol").asText,
        textCol = req(d, s"node $id: multiclass_classifier", "text_col", "textCol").asText,
        labelCol = req(d, s"node $id: multiclass_classifier", "label_col", "labelCol").asText,
        dim = opt(d, "dim").map(_.asInt).getOrElse(1024),
        epochs = opt(d, "epochs").map(_.asInt).getOrElse(8),
        lr = opt(d, "lr").map(_.asDouble).getOrElse(0.8),
        predCol = opt(d, "pred_col", "predCol").map(_.asText).getOrElse("pred_label"),
        keepScores = opt(d, "keep_scores", "keepScores").exists(_.asBoolean(false)))
    }

    val pm = optN("predict_model", "predictModel").map { d =>
      PredictModelSpec(
        textCol = req(d, s"node $id: predict_model", "text_col", "textCol").asText,
        modelDir = req(d, s"node $id: predict_model", "model_dir", "modelDir").asText,
        predCol = opt(d, "pred_col", "predCol").map(_.asText).getOrElse("pred_label"),
        keepScores = opt(d, "keep_scores", "keepScores").exists(_.asBoolean(false)))
    }

    val sm = optN("score_model", "scoreModel").map { d =>
      ScoreModelSpec(
        textCol = req(d, s"node $id: score_model", "text_col", "textCol").asText,
        modelDir = req(d, s"node $id: score_model", "model_dir", "modelDir").asText,
        scoreCol = opt(d, "score_col", "scoreCol").map(_.asText).getOrElse("score"),
        predCol = opt(d, "pred_col", "predCol").map(_.asText).getOrElse("pred"),
        threshold = opt(d, "threshold").map(_.asDouble).getOrElse(0.5))
    }

    val ba = optN("bpe_apply", "bpeApply").map { d =>
      val ctx = s"node $id: bpe_apply"
      val s = BpeApplySpec(
        textCol = opt(d, "text_col", "textCol").map(_.asText),
        mergesDir = req(d, ctx, "merges_dir", "mergesDir").asText,
        withIds = opt(d, "with_ids", "withIds").exists(_.asBoolean(false)),
        decodeCol = opt(d, "decode_col", "decodeCol").map(_.asText))
      require(s.textCol.nonEmpty || s.decodeCol.nonEmpty,
        s"$ctx: need text_col (encode: bpe_tokens/bpe_ids) and/or " +
          "decode_col (an ids column to decode into bpe_decoded)")
      require(!(s.withIds && s.textCol.isEmpty),
        s"$ctx: with_ids encodes text_col — declare text_col, or drop with_ids")
      s
    }

    val chk = optN("chunk").map { d =>
      val ctx = s"node $id: chunk"
      val cs = ChunkSpec(
        idCol = req(d, ctx, "id_col", "idCol").asText,
        size = req(d, ctx, "size").asInt,
        overlap = opt(d, "overlap").map(_.asInt).getOrElse(0),
        textCol = opt(d, "text_col", "textCol").map(_.asText),
        idsCol = opt(d, "ids_col", "idsCol").map(_.asText),
        sep = opt(d, "sep").map(_.asText))
      require(cs.size >= 1, s"$ctx: size must be >= 1, got ${cs.size}")
      require(cs.overlap >= 0 && cs.overlap < cs.size,
        s"$ctx: need 0 <= overlap < size, got overlap=${cs.overlap} size=${cs.size}")
      require(cs.textCol.isDefined != cs.idsCol.isDefined,
        s"$ctx: exactly one of text_col (whitespace-token tier) or " +
          "ids_col (token-id tier) must be set")
      cs.sep.foreach { s =>
        require(s.nonEmpty, s"$ctx: sep must be non-empty")
        require(cs.textCol.isDefined,
          s"$ctx: sep (structure-aware segment chunking) needs text_col " +
            "— token-id arrays carry no separators")
        require(cs.overlap == 0,
          s"$ctx: sep excludes overlap — segments pack whole, " +
            "they never overlap")
      }
      cs
    }

    val ndp = optN("near_dup_probe", "nearDupProbe").map { d =>
      NearDupProbeSpec(
        textCol = req(d, s"node $id: near_dup_probe", "text_col", "textCol").asText,
        indexDir = req(d, s"node $id: near_dup_probe", "index_dir", "indexDir").asText,
        shingleSize = opt(d, "shingle_size", "shingleSize").map(_.asInt).getOrElse(3),
        numHashes = opt(d, "num_hashes", "numHashes").map(_.asInt).getOrElse(64),
        bands = opt(d, "bands").map(_.asInt).getOrElse(16),
        flagCol = opt(d, "flag_col", "flagCol").map(_.asText).getOrElse("near_dup"),
        expectedKeys = opt(d, "expected_keys", "expectedKeys").map(_.asLong).getOrElse(1L << 22),
        fpp = opt(d, "fpp").map(_.asDouble).getOrElse(0.01))
    }

    val seenProbeSpec = optN("seen_probe", "seenProbe").map { d =>
      val ctx = s"node $id: seen_probe"
      val s = SeenProbeSpec(
        keyCol = req(d, ctx, "key_col", "keyCol").asText,
        indexDir = req(d, ctx, "index_dir", "indexDir").asText,
        flagCol = opt(d, "flag_col", "flagCol").map(_.asText).getOrElse("seen"),
        expectedKeys = opt(d, "expected_keys", "expectedKeys").map(_.asLong).getOrElse(1L << 22),
        fpp = opt(d, "fpp").map(_.asDouble).getOrElse(0.01))
      require(s.expectedKeys > 0, s"$ctx: expected_keys must be > 0")
      require(s.fpp > 0 && s.fpp < 1, s"$ctx: fpp must be in (0, 1), got ${s.fpp}")
      s
    }

    val seenFilterSpec = optN("seen_filter", "seenFilter").map { d =>
      val ctx = s"node $id: seen_filter"
      val s = SeenFilterSpec(
        keyCol = req(d, ctx, "key_col", "keyCol").asText,
        indexDir = req(d, ctx, "index_dir", "indexDir").asText,
        mode = opt(d, "mode").map(_.asText).getOrElse("drop"),
        flagCol = opt(d, "flag_col", "flagCol").map(_.asText).getOrElse("seen"))
      require(s.mode == "drop" || s.mode == "flag",
        s"""$ctx: mode must be "drop" or "flag", got "${s.mode}"""")
      s
    }

    val bpeSpec = optN("bpe").map { d =>
      BpeSpec(
        textCol = req(d, s"node $id: bpe", "text_col", "textCol").asText,
        numMerges = opt(d, "num_merges", "numMerges").map(_.asInt).getOrElse(16),
        output = opt(d, "output").map(_.asText).map {
          case o @ ("merges" | "tokens") => o
          case other => throw new IllegalArgumentException(
            s"""node $id: bpe output must be "merges" or "tokens" — got "$other"""")
        }.getOrElse("merges"))
    }

    val cms = optN("cms_probe", "cmsProbe").map { d =>
      val probesNode = req(d, s"node $id: cms_probe", "probes")
      require(probesNode.isArray && probesNode.size() > 0,
        s"node $id: cms_probe.probes must be a non-empty ARRAY of keys")
      CmsProbeSpec(
        keyCol = req(d, s"node $id: cms_probe", "key_col", "keyCol").asText,
        probes = (0 until probesNode.size()).map(i => probesNode.get(i).asText),
        eps = opt(d, "eps").map(_.asDouble).getOrElse(1e-4),
        confidence = opt(d, "confidence").map(_.asDouble).getOrElse(0.99),
        seed = opt(d, "seed").map(_.asInt).getOrElse(42))
    }

    val dsirSpec = optN("dsir").map { d =>
      val ctx = s"node $id: dsir"
      val mode = opt(d, "mode").map(_.asText).map {
        case m @ ("weights" | "select" | "select_threshold") => m
        case other => throw new IllegalArgumentException(
          s"""$ctx: mode must be "weights", "select", or """ +
            s""""select_threshold" — got "$other"""")
      }.getOrElse("weights")
      val spec = DsirSpec(
        targetRef = req(d, ctx, "target_ref", "targetRef").asText,
        textCol = req(d, ctx, "text_col", "textCol").asText,
        idCol = opt(d, "id_col", "idCol").map(_.asText).getOrElse(""),
        buckets = opt(d, "buckets").map(_.asInt).getOrElse(8192),
        mode = mode,
        n = opt(d, "n").map(_.asInt).getOrElse(0),
        seed = opt(d, "seed").map(_.asLong).getOrElse(0L),
        gumbel = opt(d, "gumbel").forall(_.asBoolean(true)),
        saveModel = opt(d, "save_model", "saveModel").map(_.asText).getOrElse(""),
        threshold = opt(d, "threshold").map(_.asDouble),
        relativeError = opt(d, "relative_error", "relativeError")
          .map(_.asDouble).getOrElse(1e-4))
      if (spec.mode == "select") {
        require(spec.n >= 1, s"$ctx: select mode needs n >= 1")
        require(spec.idCol.nonEmpty, s"$ctx: select mode needs id_col")
      }
      if (spec.mode == "select_threshold") {
        require(spec.threshold.nonEmpty || spec.n >= 1,
          s"$ctx: select_threshold mode needs an explicit threshold or n >= 1")
        require(!spec.gumbel || spec.idCol.nonEmpty,
          s"$ctx: select_threshold with gumbel noise needs id_col")
      }
      spec
    }

    val prSpec = optN("page_rank", "pageRank").map { d =>
      val ctx = s"node $id: page_rank"
      PageRankSpec(
        srcCol = req(d, ctx, "src_col", "srcCol").asText,
        dstCol = req(d, ctx, "dst_col", "dstCol").asText,
        iters = opt(d, "iters").map(_.asInt).getOrElse(3),
        damping = opt(d, "damping").map(_.asDouble).getOrElse(0.85),
        tol = opt(d, "tol").map(_.asDouble).getOrElse(0.0))
    }

    val winnowSpec = optN("winnow").map { d =>
      val ctx = s"node $id: winnow"
      WinnowSpec(
        idCol = req(d, ctx, "id_col", "idCol").asText,
        textCol = req(d, ctx, "text_col", "textCol").asText,
        windowTokens = opt(d, "window_tokens", "windowTokens").map(_.asInt).getOrElse(50),
        winnowWindow = opt(d, "winnow_window", "winnowWindow").map(_.asInt).getOrElse(8),
        output = opt(d, "output").map(_.asText).map {
          case o @ ("index" | "pairs") => o
          case other => throw new IllegalArgumentException(
            s"""$ctx: output must be "index" or "pairs" — got "$other"""")
        }.getOrElse("index"),
        minShared = opt(d, "min_shared", "minShared").map(_.asInt).getOrElse(1))
    }

    val winnowProbeSpec = optN("winnow_probe", "winnowProbe").map { d =>
      val ctx = s"node $id: winnow_probe"
      WinnowProbeSpec(
        textCol = req(d, ctx, "text_col", "textCol").asText,
        indexDir = req(d, ctx, "index_dir", "indexDir").asText,
        windowTokens = opt(d, "window_tokens", "windowTokens").map(_.asInt).getOrElse(50),
        winnowWindow = opt(d, "winnow_window", "winnowWindow").map(_.asInt).getOrElse(8),
        minShared = opt(d, "min_shared", "minShared").map(_.asInt).getOrElse(2),
        matchedCol = opt(d, "matched_col", "matchedCol").map(_.asText).getOrElse("matched_fps"),
        flagCol = opt(d, "flag_col", "flagCol").map(_.asText).getOrElse("near_dup"),
        expectedKeys = opt(d, "expected_keys", "expectedKeys").map(_.asLong).getOrElse(1L << 22),
        fpp = opt(d, "fpp").map(_.asDouble).getOrElse(0.01))
    }

    val wdsSpec = optN("wds_samples", "wdsSamples").map { d =>
      WdsSamplesSpec(
        nameCol = req(d, s"node $id: wds_samples", "name_col", "nameCol").asText,
        dataCol = req(d, s"node $id: wds_samples", "data_col", "dataCol").asText)
    }

    val collocationsSpec = optN("collocations").map { d =>
      val ctx = s"node $id: collocations"
      val s = CollocationsSpec(
        textCol = req(d, ctx, "text_col", "textCol").asText,
        minCount = opt(d, "min_count", "minCount").map(_.asInt).getOrElse(5),
        topK = opt(d, "top_k", "topK").map(_.asInt).getOrElse(100),
        groupCols = opt(d, "group_cols", "groupCols").map(strSeq).getOrElse(Nil))
      require(s.minCount >= 1, s"$ctx: min_count must be >= 1, got ${s.minCount}")
      require(s.topK >= 1, s"$ctx: top_k must be >= 1, got ${s.topK}")
      s
    }

    val bm25Spec = optN("bm25").map { d =>
      val ctx = s"node $id: bm25"
      Bm25Spec(
        queriesRef = req(d, ctx, "queries_ref", "queriesRef").asText,
        idCol = req(d, ctx, "id_col", "idCol").asText,
        textCol = req(d, ctx, "text_col", "textCol").asText,
        qidCol = opt(d, "qid_col", "qidCol").map(_.asText).getOrElse("qid"),
        qtextCol = opt(d, "qtext_col", "qtextCol").map(_.asText).getOrElse("qtext"),
        k1 = opt(d, "k1").map(_.asDouble).getOrElse(1.2),
        b = opt(d, "b").map(_.asDouble).getOrElse(0.75),
        topK = opt(d, "top_k", "topK").map(_.asInt).getOrElse(10),
        proxWeight = opt(d, "prox_weight", "proxWeight")
          .map(_.asDouble).getOrElse(0.0))
    }

    val bm25IndexSpec = optN("bm25_index", "bm25Index").map { d =>
      val ctx = s"node $id: bm25_index"
      val mode = opt(d, "mode").map(_.asText).getOrElse("build")
      require(mode == "build" || mode == "append" || mode == "compact" ||
          mode == "stats",
        s"""$ctx: mode must be "build", "append", "compact" or "stats", got "$mode"""")
      // compact/stats only touch the artifact — frame columns never enter
      val artifactOnly = mode == "compact" || mode == "stats"
      if (artifactOnly)
        Seq("id_col", "idCol", "text_col", "textCol").foreach { k =>
          require(opt(d, k).isEmpty,
            s"""$ctx: "$k" has no effect under mode "$mode" (it """ +
              "touches only the saved artifact) — remove it")
        }
      val s = Bm25IndexSpec(
        idCol = if (artifactOnly) ""
          else req(d, ctx, "id_col", "idCol").asText,
        textCol = if (artifactOnly) ""
          else req(d, ctx, "text_col", "textCol").asText,
        dir = req(d, ctx, "dir").asText,
        prox = opt(d, "prox").exists(_.asBoolean(false)),
        buckets = opt(d, "buckets").map(_.asInt).getOrElse(64),
        mode = mode,
        checkpoint = opt(d, "checkpoint").map(_.asText))
      requireCompactOnlyCheckpoint(ctx, s.mode, s.checkpoint)
      // append/compact work against the SAVED layout — stated layout
      // params would silently not re-shard/re-shape; reject by name
      require(s.mode == "build" ||
          (opt(d, "prox").isEmpty && opt(d, "buckets").isEmpty),
        s"""$ctx: prox/buckets have no effect under mode "${s.mode}" """ +
          "(the saved layout is reused) — remove them, or rebuild with " +
          """mode "build"""")
      require(s.buckets >= 1 && s.buckets <= 65536,
        s"$ctx: buckets must be in [1, 65536], got ${s.buckets}")
      s
    }

    val bm25SearchSpec = optN("bm25_search", "bm25Search").map { d =>
      val ctx = s"node $id: bm25_search"
      val s = Bm25SearchSpec(
        qidCol = req(d, ctx, "qid_col", "qidCol").asText,
        qtextCol = req(d, ctx, "qtext_col", "qtextCol").asText,
        indexDir = req(d, ctx, "index_dir", "indexDir").asText,
        k1 = opt(d, "k1").map(_.asDouble).getOrElse(1.2),
        b = opt(d, "b").map(_.asDouble).getOrElse(0.75),
        topK = opt(d, "top_k", "topK").map(_.asInt).getOrElse(10),
        proxWeight = opt(d, "prox_weight", "proxWeight")
          .map(_.asDouble).getOrElse(0.0))
      require(s.topK >= 1, s"$ctx: top_k must be >= 1, got ${s.topK}")
      require(s.k1 >= 0 && s.b >= 0 && s.b <= 1,
        s"$ctx: need k1 >= 0 and b in [0, 1], got k1=${s.k1} b=${s.b}")
      require(s.proxWeight >= 0,
        s"$ctx: prox_weight must be >= 0, got ${s.proxWeight}")
      s
    }

    val rrfSpec = optN("rrf_fuse", "rrfFuse").map { d =>
      val ctx = s"node $id: rrf_fuse"
      val s = RrfFuseSpec(
        queryCol = req(d, ctx, "query_col", "queryCol").asText,
        docCol = req(d, ctx, "doc_col", "docCol").asText,
        rankCol = req(d, ctx, "rank_col", "rankCol").asText,
        topK = opt(d, "top_k", "topK").map(_.asInt).getOrElse(10),
        rrfK = opt(d, "rrf_k", "rrfK").map(_.asInt).getOrElse(60),
        weightCol = opt(d, "weight_col", "weightCol").map(_.asText))
      require(s.topK >= 1, s"$ctx: top_k must be >= 1, got ${s.topK}")
      require(s.rrfK >= 0, s"$ctx: rrf_k must be >= 0, got ${s.rrfK}")
      s
    }

    val funnelSpec = optN("funnel").map { d =>
      val ctx = s"node $id: funnel"
      val stepsNode = req(d, ctx, "steps")
      require(stepsNode.isArray && stepsNode.size() > 0,
        s"$ctx: steps must be a non-empty ARRAY of event names")
      val s = FunnelSpec(
        keyCol = req(d, ctx, "key_col", "keyCol").asText,
        tsCol = req(d, ctx, "ts_col", "tsCol").asText,
        eventCol = req(d, ctx, "event_col", "eventCol").asText,
        steps = strSeq(stepsNode),
        window = opt(d, "window").map(_.asText),
        anchor = opt(d, "anchor").map(_.asText).getOrElse("first"))
      require(s.steps.distinct.size == s.steps.size,
        s"$ctx: steps must be distinct, got ${s.steps.mkString(", ")}")
      require(s.anchor == "first" || s.anchor == "every",
        s"$ctx: anchor must be 'first' or 'every', got '${s.anchor}'")
      s
    }

    val rangeJoinSpec = optN("range_join", "rangeJoin").map { d =>
      val ctx = s"node $id: range_join"
      val s = RangeJoinSpec(
        intervalsRef = req(d, ctx, "intervals_ref", "intervalsRef").asText,
        pointCol = req(d, ctx, "point_col", "pointCol").asText,
        loCol = req(d, ctx, "lo_col", "loCol").asText,
        hiCol = req(d, ctx, "hi_col", "hiCol").asText,
        bucket = req(d, ctx, "bucket").asDouble,
        on = opt(d, "on").map(strSeq).getOrElse(Nil),
        payload = opt(d, "payload").map(strSeq).getOrElse(Nil),
        how = opt(d, "how").map(_.asText).getOrElse("inner"),
        inclusiveHi = opt(d, "inclusive_hi", "inclusiveHi")
          .exists(_.asBoolean(false)),
        broadcast = opt(d, "broadcast").exists(_.asBoolean(false)),
        maxBucketsPerInterval = opt(d, "max_buckets_per_interval",
          "maxBucketsPerInterval").map(_.asInt).getOrElse(1 << 16))
      require(s.bucket > 0, s"$ctx: bucket must be > 0, got ${s.bucket}")
      require(s.how == "inner" || s.how == "left",
        s"$ctx: how must be 'inner' or 'left', got '${s.how}'")
      require(s.maxBucketsPerInterval >= 1,
        s"$ctx: max_buckets_per_interval must be >= 1, got ${s.maxBucketsPerInterval}")
      s
    }

    val connectedComponentsSpec =
      optN("connected_components", "connectedComponents").map { d =>
        val ctx = s"node $id: connected_components"
        val s = ConnectedComponentsSpec(
          srcCol = req(d, ctx, "src_col", "srcCol").asText,
          dstCol = req(d, ctx, "dst_col", "dstCol").asText,
          maxIter = opt(d, "max_iter", "maxIter").map(_.asInt).getOrElse(20),
          smallGraphEdges = opt(d, "small_graph_edges", "smallGraphEdges")
            .map(_.asLong).getOrElse(1L << 20),
          checkpointDir = opt(d, "checkpoint_dir", "checkpointDir")
            .map(_.asText))
        require(s.srcCol != s.dstCol,
          s"$ctx: src_col and dst_col must differ (self-loops are rows " +
            "with equal VALUES, not equal columns)")
        require(s.maxIter >= 1, s"$ctx: max_iter must be >= 1, got ${s.maxIter}")
        require(s.smallGraphEdges >= 0 && s.smallGraphEdges <= (1L << 24),
          s"$ctx: small_graph_edges must be in [0, 2^24], got " +
            s"${s.smallGraphEdges} (the driver-collect safety cap)")
        s
      }

    val overlapJoinSpec = optN("overlap_join", "overlapJoin").map { d =>
      val ctx = s"node $id: overlap_join"
      val s = OverlapJoinSpec(
        otherRef = req(d, ctx, "other_ref", "otherRef", "ref").asText,
        loCol = req(d, ctx, "lo_col", "loCol").asText,
        hiCol = req(d, ctx, "hi_col", "hiCol").asText,
        bucket = req(d, ctx, "bucket").asDouble,
        otherLoCol = opt(d, "other_lo_col", "otherLoCol").map(_.asText),
        otherHiCol = opt(d, "other_hi_col", "otherHiCol").map(_.asText),
        on = opt(d, "on").map(strSeq).getOrElse(Nil),
        payload = opt(d, "payload").map(strSeq).getOrElse(Nil),
        inclusive = opt(d, "inclusive").exists(_.asBoolean(false)),
        broadcast = opt(d, "broadcast").exists(_.asBoolean(false)),
        maxBucketsPerInterval = opt(d, "max_buckets_per_interval",
          "maxBucketsPerInterval").map(_.asInt).getOrElse(1 << 16),
        how = opt(d, "how").map(_.asText).getOrElse("inner"))
      require(s.bucket > 0, s"$ctx: bucket must be > 0, got ${s.bucket}")
      require(s.maxBucketsPerInterval >= 1,
        s"$ctx: max_buckets_per_interval must be >= 1, got ${s.maxBucketsPerInterval}")
      require(s.how == "inner" || s.how == "left",
        s"""$ctx: how must be "inner" or "left", got '${s.how}'""")
      s
    }

    val diffSpec = optN("diff").map { d =>
      val ctx = s"node $id: diff"
      val s = DiffSpec(
        on = strSeq(req(d, ctx, "on")),
        otherRef = req(d, ctx, "other_ref", "otherRef", "ref").asText,
        compare = opt(d, "compare").map(strSeq).getOrElse(Nil),
        statusCol = opt(d, "status_col", "statusCol").map(_.asText)
          .getOrElse("diff_status"),
        changedCol = opt(d, "changed_col", "changedCol").map(_.asText)
          .getOrElse("changed_cols"),
        includeUnchanged = opt(d, "include_unchanged", "includeUnchanged")
          .exists(_.asBoolean(false)),
        carry = opt(d, "carry").map(_.asText).getOrElse("none"))
      require(s.on.nonEmpty, s"$ctx: 'on' needs at least one key column")
      require(s.carry == "none" || s.carry == "new",
        s"""$ctx: carry must be "none" or "new", got '${s.carry}' — the """ +
          "old side's values are reachable by diffing in the other " +
          "direction")
      require(s.statusCol != s.changedCol,
        s"$ctx: status_col and changed_col must differ")
      s
    }

    val applyDiffSpec = optN("apply_diff", "applyDiff").map { d =>
      val ctx = s"node $id: apply_diff"
      val s = ApplyDiffSpec(
        on = strSeq(req(d, ctx, "on")),
        deltaRef = req(d, ctx, "delta_ref", "deltaRef", "ref").asText,
        statusCol = opt(d, "status_col", "statusCol").map(_.asText)
          .getOrElse("diff_status"),
        changedCol = opt(d, "changed_col", "changedCol").map(_.asText)
          .getOrElse("changed_cols"))
      require(s.on.nonEmpty, s"$ctx: 'on' needs at least one key column")
      require(s.statusCol != s.changedCol,
        s"$ctx: status_col and changed_col must differ")
      s
    }

    val resampleSpec = optN("resample").map { d =>
      val ctx = s"node $id: resample"
      val keysNode = req(d, ctx, "key_cols", "keyCols", "keys")
      require(keysNode.isArray && keysNode.size() > 0,
        s"$ctx: key_cols must be a non-empty ARRAY of key columns")
      val s = ResampleSpec(
        keyCols = strSeq(keysNode),
        tsCol = req(d, ctx, "ts_col", "tsCol").asText,
        step = req(d, ctx, "step").asText,
        aggs = aggList(req(d, ctx, "aggregations", "aggs")),
        fill = opt(d, "fill").map(_.asText).getOrElse("none"),
        maxBucketsPerKey = opt(d, "max_buckets_per_key", "maxBucketsPerKey")
          .map(_.asLong).getOrElse(1L << 20))
      require(s.aggs.nonEmpty,
        s"$ctx: aggregations must be a non-empty list")
      require(Seq("none", "zero", "ffill").contains(s.fill),
        s"$ctx: fill must be none/zero/ffill, got '${s.fill}'")
      require(s.maxBucketsPerKey >= 1,
        s"$ctx: max_buckets_per_key must be >= 1, got ${s.maxBucketsPerKey}")
      s
    }

    val approxTopKSpec = optN("approx_top_k", "approxTopK").map { d =>
      val ctx = s"node $id: approx_top_k"
      val s = ApproxTopKSpec(
        keyCol = req(d, ctx, "key_col", "keyCol").asText,
        k = opt(d, "k").map(_.asInt).getOrElse(10),
        maxItemsTracked = opt(d, "max_items_tracked", "maxItemsTracked")
          .map(_.asInt).getOrElse(10000))
      require(s.k >= 1, s"$ctx: k must be >= 1, got ${s.k}")
      require(s.maxItemsTracked >= s.k,
        s"$ctx: max_items_tracked (${s.maxItemsTracked}) must be >= k (${s.k})")
      s
    }

    val unpivotSpec = optN("unpivot").map { d =>
      val ctx = s"node $id: unpivot"
      val idsNode = req(d, ctx, "ids", "id_cols")
      require(idsNode.isArray && idsNode.size() > 0,
        s"$ctx: ids must be a non-empty ARRAY of id columns")
      val s = UnpivotSpec(
        ids = strSeq(idsNode),
        values = opt(d, "values", "value_cols").map(strSeq).getOrElse(Nil),
        varCol = opt(d, "var_col", "varCol").map(_.asText).getOrElse("variable"),
        valCol = opt(d, "value_col", "valueCol").map(_.asText).getOrElse("value"))
      require(s.varCol != s.valCol,
        s"$ctx: var_col and value_col are both '${s.varCol}'")
      s
    }

    val upsampleSpec = optN("upsample").map { d =>
      val ctx = s"node $id: upsample"
      UpsampleSpec(
        factorCol = req(d, ctx, "factor_col", "factorCol").asText,
        copyCol = opt(d, "copy_col", "copyCol").map(_.asText).getOrElse("copy"))
    }

    val rankingEvalSpec = optN("ranking_eval", "rankingEval").map { d =>
      val ctx = s"node $id: ranking_eval"
      val s = RankingEvalSpec(
        queryCol = req(d, ctx, "query_col", "queryCol").asText,
        docCol = req(d, ctx, "doc_col", "docCol").asText,
        rankCol = req(d, ctx, "rank_col", "rankCol").asText,
        qrelsRef = req(d, ctx, "qrels_ref", "qrelsRef").asText,
        k = opt(d, "k").map(_.asInt).getOrElse(10))
      require(s.k >= 1, s"$ctx: k must be >= 1, got ${s.k}")
      s
    }

    val aiSpec = optN("ann_index", "annIndex").map { d =>
      val ctx = s"node $id: ann_index"
      val mode = opt(d, "mode").map(_.asText).getOrElse("build")
      require(mode == "build" || mode == "append" || mode == "stats" ||
          mode == "compact",
        s"""$ctx: mode must be "build", "append", "stats" or "compact", got "$mode"""")
      // stats/compact only touch the artifact — the frame's columns never
      // enter, so a stated id_col/vec_col is a misunderstanding; reject
      if (mode == "stats" || mode == "compact")
        Seq("id_col", "idCol", "vec_col", "vecCol").foreach { k =>
          require(opt(d, k).isEmpty,
            s"""$ctx: "$k" has no effect under mode "$mode" (it reads """ +
              "only the saved artifact) — remove it")
        }
      val pqNode = opt(d, "pq")
      val artifactOnly = mode == "stats" || mode == "compact"
      val s = AnnIndexSpec(
        idCol = if (artifactOnly) ""
          else req(d, ctx, "id_col", "idCol").asText,
        vecCol = if (artifactOnly) ""
          else req(d, ctx, "vec_col", "vecCol").asText,
        dir = req(d, ctx, "dir").asText,
        nlist = opt(d, "nlist").map(_.asInt).getOrElse(16),
        refineRounds = opt(d, "refine_rounds", "refineRounds").map(_.asInt).getOrElse(0),
        mode = mode,
        pqM = pqNode.map(p => req(p, s"$ctx.pq", "m").asInt),
        pqK = pqNode.flatMap(p => opt(p, "k")).map(_.asInt).getOrElse(256),
        pqIters = pqNode.flatMap(p => opt(p, "iters")).map(_.asInt).getOrElse(5),
        checkpoint = opt(d, "checkpoint").map(_.asText))
      requireCompactOnlyCheckpoint(ctx, s.mode, s.checkpoint)
      // append assigns to the SAVED centroids — a stated fit parameter
      // would silently not refit; reject the contradiction by name. The
      // same applies to pq: appends encode with the SAVED codebooks.
      require(s.mode == "build" ||
          (opt(d, "nlist").isEmpty && opt(d, "refine_rounds", "refineRounds").isEmpty &&
            pqNode.isEmpty),
        s"""$ctx: nlist/refine_rounds/pq have no effect under mode "${s.mode}" """ +
          "(the saved centroids and codebooks are not refit) — remove " +
          """them, or rebuild with mode "build"""")
      require(s.nlist >= 1 && s.nlist <= 65536,
        s"$ctx: nlist must be in [1, 65536], got ${s.nlist}")
      require(s.refineRounds >= 0 && s.refineRounds <= 64,
        s"$ctx: refine_rounds must be in [0, 64], got ${s.refineRounds}")
      s.pqM.foreach { m =>
        require(m >= 1 && m <= 256, s"$ctx.pq: m must be in [1, 256], got $m")
        require(s.pqK >= 1 && s.pqK <= 256,
          s"$ctx.pq: k must be in [1, 256], got ${s.pqK}")
        require(s.pqIters >= 0 && s.pqIters <= 64,
          s"$ctx.pq: iters must be in [0, 64], got ${s.pqIters}")
      }
      s
    }

    val asSpec = optN("ann_search", "annSearch").map { d =>
      val ctx = s"node $id: ann_search"
      val s = AnnSearchSpec(
        idCol = req(d, ctx, "id_col", "idCol").asText,
        vecCol = req(d, ctx, "vec_col", "vecCol").asText,
        indexDir = req(d, ctx, "index_dir", "indexDir").asText,
        k = opt(d, "k").map(_.asInt).getOrElse(10),
        nprobe = opt(d, "nprobe").map(_.asInt).getOrElse(4),
        allowRef = opt(d, "allow_ref", "allowRef").map(_.asText),
        allowIdCol = opt(d, "allow_id_col", "allowIdCol").map(_.asText)
          .getOrElse("id"))
      require(s.k >= 1, s"$ctx: k must be >= 1, got ${s.k}")
      require(s.nprobe >= 1, s"$ctx: nprobe must be >= 1, got ${s.nprobe}")
      require(s.idCol != "match_id",
        s"$ctx: rename the query id column — 'match_id' names the index side")
      require(s.allowRef.nonEmpty || opt(d, "allow_id_col", "allowIdCol").isEmpty,
        s"$ctx: allow_id_col has no effect without allow_ref — remove it " +
          "or name the allow-list def")
      s
    }

    val apSpec = optN("ann_probe", "annProbe").map { d =>
      val ctx = s"node $id: ann_probe"
      val s = AnnProbeSpec(
        vecCol = req(d, ctx, "vec_col", "vecCol").asText,
        indexDir = req(d, ctx, "index_dir", "indexDir").asText,
        threshold = req(d, ctx, "threshold").asDouble,
        scoreCol = opt(d, "score_col", "scoreCol").map(_.asText).getOrElse("ann_score"),
        flagCol = opt(d, "flag_col", "flagCol").map(_.asText).getOrElse("ann_match"))
      require(s.threshold >= -1.0 && s.threshold <= 1.0,
        s"$ctx: threshold must be in [-1, 1], got ${s.threshold}")
      require(s.scoreCol != s.flagCol,
        s"$ctx: score_col and flag_col must differ, both are '${s.scoreCol}'")
      s
    }

    val qfSpec = optN("quantile_filter", "quantileFilter").map { d =>
      val ctx = s"node $id: quantile_filter"
      val s = QuantileFilterSpec(
        col = req(d, ctx, "col").asText,
        keepN = req(d, ctx, "keep_n", "keepN").asLong,
        descending = opt(d, "descending").forall(_.asBoolean(true)),
        relativeError = opt(d, "relative_error", "relativeError")
          .map(_.asDouble).getOrElse(1e-4))
      require(s.keepN >= 1, s"$ctx: keep_n must be >= 1, got ${s.keepN}")
      require(s.relativeError >= 0 && s.relativeError < 1,
        s"$ctx: relative_error must be in [0, 1), got ${s.relativeError}")
      s
    }

    val tpSpec = optN("tar_pack", "tarPack").map { d =>
      val ctx = s"node $id: tar_pack"
      TarPackSpec(
        nameCol = req(d, ctx, "name_col", "nameCol").asText,
        payloadCol = req(d, ctx, "payload_col", "payloadCol").asText,
        shards = req(d, ctx, "shards").asInt)
    }

    val tcSpec = optN("tar_compact", "tarCompact").map { d =>
      val ctx = s"node $id: tar_compact"
      TarCompactSpec(
        tarCol = opt(d, "tar_col", "tarCol").map(_.asText).getOrElse("tar"),
        shards = req(d, ctx, "shards").asInt,
        batchCol = opt(d, "batch_col", "batchCol").map(_.asText))
    }

    val dsirScoreSpec = optN("dsir_score", "dsirScore").map { d =>
      DsirScoreSpec(
        modelDir = req(d, s"node $id: dsir_score", "model_dir", "modelDir").asText,
        textCol = req(d, s"node $id: dsir_score", "text_col", "textCol").asText)
    }

    val sp = optN("split").map { d =>
      val bucketsNode = req(d, s"node $id: split", "buckets")
      require(bucketsNode.isArray && bucketsNode.size() > 0,
        s"node $id: split.buckets must be a non-empty ARRAY of " +
          """{"name": ..., "weight": ...} (order defines the boundaries)""")
      val buckets = (0 until bucketsNode.size()).map { i =>
        val b = bucketsNode.get(i)
        (req(b, s"node $id: split.buckets[$i]", "name").asText,
          req(b, s"node $id: split.buckets[$i]", "weight").asDouble)
      }
      SplitSpec(
        idCol = req(d, s"node $id: split", "id_col", "idCol").asText,
        buckets = buckets,
        splitCol = opt(d, "split_col", "splitCol").map(_.asText).getOrElse("split"))
    }

    val ts = optN("temperature_sample", "temperatureSample").map { d =>
      TemperatureSampleSpec(
        groupCol = req(d, s"node $id: temperature_sample", "group_col", "groupCol").asText,
        idCol = req(d, s"node $id: temperature_sample", "id_col", "idCol").asText,
        targetFraction =
          req(d, s"node $id: temperature_sample", "target_fraction", "targetFraction").asDouble,
        alpha = opt(d, "alpha").map(_.asDouble).getOrElse(0.5))
    }

    val tbs = optN("token_budget_sample", "tokenBudgetSample").map { d =>
      val ctx = s"node $id: token_budget_sample"
      val budgetsNode = opt(d, "budgets")
      val weightsNode = opt(d, "weights")
      require(budgetsNode.isDefined != weightsNode.isDefined,
        s"$ctx: exactly one of budgets (group -> tokens) or weights " +
          "(+ total_budget) must be given")
      budgetsNode.foreach(b => require(b.isObject && b.size() > 0,
        s"$ctx: budgets must be a non-empty OBJECT of group -> token count"))
      weightsNode.foreach(w => require(w.isObject && w.size() > 0,
        s"$ctx: weights must be a non-empty OBJECT of group -> weight"))
      val spec = TokenBudgetSampleSpec(
        groupCol = req(d, ctx, "group_col", "groupCol").asText,
        idCol = req(d, ctx, "id_col", "idCol").asText,
        tokensCol = req(d, ctx, "tokens_col", "tokensCol").asText,
        budgets = budgetsNode.map(b =>
          fields(b).map { case (k, v) => (k, v.asLong) }).getOrElse(Seq.empty),
        weights = weightsNode.map(w =>
          fields(w).map { case (k, v) => (k, v.asDouble) }).getOrElse(Seq.empty),
        totalBudget = opt(d, "total_budget", "totalBudget")
          .map(_.asLong).getOrElse(0L),
        overshoot = opt(d, "overshoot").forall(_.asBoolean(true)),
        orderCol = opt(d, "order_col", "orderCol").map(_.asText),
        descending = opt(d, "descending").forall(_.asBoolean(true)))
      if (spec.weights.nonEmpty) require(spec.totalBudget >= 1,
        s"$ctx: weights need a total_budget >= 1 (tokens to split across " +
          "the mixture)")
      spec
    }

    val gs = optN("global_shuffle", "globalShuffle").map { d =>
      GlobalShuffleSpec(
        idCol = req(d, s"node $id: global_shuffle", "id_col", "idCol").asText,
        shards = req(d, s"node $id: global_shuffle", "shards").asInt,
        seed = opt(d, "seed").map(_.asLong).getOrElse(0L))
    }

    val he = optN("html_extract", "htmlExtract").map { d =>
      HtmlExtractSpec(
        idCol = req(d, s"node $id: html_extract", "id_col", "idCol").asText,
        htmlCol = req(d, s"node $id: html_extract", "html_col", "htmlCol").asText)
    }

    val pe = optN("pdf_extract", "pdfExtract").map { d =>
      PdfExtractSpec(
        idCol = req(d, s"node $id: pdf_extract", "id_col", "idCol").asText,
        pdfCol = req(d, s"node $id: pdf_extract", "pdf_col", "pdfCol").asText)
    }

    val pr = optN("profile").map { d =>
      val colsNode = req(d, s"node $id: profile", "columns")
      require(colsNode.isArray && colsNode.size() > 0,
        s"node $id: profile.columns must be a non-empty ARRAY of column names")
      ProfileSpec(
        columns = (0 until colsNode.size()).map(i => colsNode.get(i).asText),
        approx = opt(d, "approx").exists(_.asBoolean(false)),
        groupCols = opt(d, "group_cols", "groupCols").map(strSeq).getOrElse(Nil))
    }

    val bp = optN("boilerplate").map { d =>
      BoilerplateSpec(
        idCol = req(d, s"node $id: boilerplate", "id_col", "idCol").asText,
        textCol = req(d, s"node $id: boilerplate", "text_col", "textCol").asText,
        maxDocs = req(d, s"node $id: boilerplate", "max_docs", "maxDocs").asLong,
        sep = opt(d, "sep").map(_.asText).getOrElse("\n"),
        byHash = opt(d, "by_hash", "byHash").forall(_.asBoolean(true)))
    }

    val fz = optN("featurize").map { f =>
      FeaturizeSpec(
        idCol = req(f, s"node $id: featurize", "id_col", "idCol").asText,
        payloadCol = req(f, s"node $id: featurize", "payload_col", "payloadCol").asText,
        decoder = opt(f, "decoder").map(_.asText).getOrElse("media"))
    }

    val wm = optN("watermark").map { w =>
      WatermarkSpec(
        col = req(w, s"node $id: watermark", "col", "column").asText,
        delay = req(w, s"node $id: watermark", "delay", "threshold").asText)
    }

    val bt = optN("bitemporal").map { b =>
      if (b.isBoolean) BitemporalSpec()
      else
        BitemporalSpec(
          validFrom =
            opt(b, "valid_from").map(_.asText).getOrElse("2024-01-01"),
          validTo = opt(b, "valid_to").map(_.asText).getOrElse("9999-12-31"),
          fromCol = opt(b, "from_col", "fromCol").map(_.asText).getOrElse("valid_from"),
          toCol = opt(b, "to_col", "toCol").map(_.asText).getOrElse("valid_to")
        )
    }

    val children: Seq[ChildSpec] = optN("children").toSeq.flatMap(elems).map {
      c =>
        val link = opt(c, "link")
          .map(strSeq)
          .orElse(opt(c, "join").flatMap(j => opt(j, "on").map(strSeq)))
          .getOrElse(Nil)
        val how = opt(c, "join")
          .flatMap(j => opt(j, "how").map(_.asText))
          .orElse(opt(c, "how").map(_.asText))
          .getOrElse("left")
        val onExpr = opt(c, "join")
          .flatMap(j => opt(j, "on_expr", "onExpr").map(_.asText))
          .orElse(opt(c, "on_expr").map(_.asText))
        val leftTs = opt(c, "join").flatMap(j => opt(j, "left_ts", "leftTs").map(_.asText))
        val rightTs = opt(c, "join").flatMap(j => opt(j, "right_ts", "rightTs").map(_.asText))
        val lookback = opt(c, "join").flatMap(j => opt(j, "lookback").map(_.asText))
        val leftDelay = opt(c, "join").flatMap(j => opt(j, "left_delay", "leftDelay").map(_.asText))
        val rightDelay = opt(c, "join").flatMap(j => opt(j, "right_delay", "rightDelay").map(_.asText))
        // the join object's own keys get the same typo protection as node
        // keys — "tolerence" silently no-opping is the failure mode the
        // whole codec exists to prevent
        opt(c, "join").foreach { j =>
          val known = Set("on", "how", "on_expr", "onExpr", "left_ts",
            "leftTs", "right_ts", "rightTs", "lookback", "left_delay",
            "leftDelay", "right_delay", "rightDelay", "direction",
            "tolerance", "hint", "join_hint", "salt", "skew_salt")
          val unk = fields(j).map(_._1).filterNot(known.contains)
          require(unk.isEmpty,
            s"node $id: unknown join key(s): ${unk.mkString(", ")} " +
              s"(known: ${known.toSeq.sorted.mkString(", ")})")
        }
        val direction = opt(c, "join")
          .flatMap(j => opt(j, "direction").map(_.asText)).getOrElse("backward")
        require(Seq("backward", "forward", "nearest").contains(direction),
          s"node $id: join.direction must be backward/forward/nearest, " +
            s"got '$direction'")
        val tolerance = opt(c, "join").flatMap(j => opt(j, "tolerance").map(_.asText))
        require((direction == "backward" && tolerance.isEmpty) || how == "asof",
          s"node $id: join.direction/tolerance apply only to how='asof', " +
            s"got how='$how'")
        // Skew-salted join (config surface of Relational.saltedJoin): the
        // parent side gets a content-derived salt, the child replicates
        // once per salt value, the join runs on (link, salt). Guards live
        // HERE so a bad combination fails at decode, not mid-plan: the
        // replication is only semantics-preserving for inner/left equi
        // joins, and salt ≤ 1 means "you didn't want this".
        val salt = opt(c, "join")
          .flatMap(j => opt(j, "salt", "skew_salt").map(_.asInt))
        salt.foreach { n =>
          require(n > 1,
            s"node $id: join.salt must be > 1 (got $n) — 1 bucket is a " +
              "plain join; drop the key instead")
          require(how == "inner" || how == "left",
            s"node $id: join.salt preserves semantics only for " +
              s"how='inner'/'left' (the child side is replicated ${n}×, " +
              s"so an unmatched child row under '$how' would surface $n " +
              "times)")
          require(onExpr.isEmpty,
            s"node $id: join.salt needs equi 'on' keys; it cannot salt an " +
              "on_expr condition")
          require(link.nonEmpty,
            s"node $id: join.salt needs equi 'on' keys (none given)")
        }
        ChildSpec(
          node = node(c, defaultId = id + "_child",
            // the child object carries its join wiring next to node keys
            extraAllowed = Set("join", "link", "how", "on_expr", "onExpr",
              "prefix", "hint", "join_hint")),
          join = JoinSpec(link, how, onExpr, leftTs, rightTs, lookback,
            leftDelay, rightDelay, direction, tolerance, salt),
          prefix = opt(c, "prefix").exists(_.asBoolean(false)),
          // hint is accepted at the child level and inside the join object
          // (both natural spellings; the latter was silently dropped before
          // the join-key whitelist exposed it)
          hint = opt(c, "hint", "join_hint").map(_.asText)
            .orElse(opt(c, "join").flatMap(j =>
              opt(j, "hint", "join_hint").map(_.asText)))
        )
    }

    val combine = optN("combine").map { c =>
      CombineSpec(
        op = opt(c, "op").map(_.asText).getOrElse("union"),
        nodes = opt(c, "nodes").toSeq.flatMap(elems).zipWithIndex
          .map { case (cn, i) => node(cn, s"${id}_part$i") })
    }

    val expectReportNode = optN("expect_report", "expectReport")

    val spec = NodeSpec(
      id = id,
      source = source,
      combine = combine,
      filters = filters,
      derive = derive,
      watermark = wm,
      dedup = dd,
      keepColumns = if (aggregate.isDefined) Nil else keep,
      nearDup = nd,
      semanticDedup = smd,
      editDedup = ed,
      imageDedup = imd,
      simhashDedup = shd,
      audioDedup = aud,
      passageDedup = pd,
      lmPerplexity = lm,
      qualityClassifier = qc,
      multiclassClassifier = mcc,
      predictModel = pm,
      scoreModel = sm,
      bpe = bpeSpec,
      bpeApply = ba,
      chunk = chk,
      nearDupProbe = ndp,
      seenProbe = seenProbeSpec,
      seenFilter = seenFilterSpec,
      cmsProbe = cms,
      dsir = dsirSpec,
      pageRank = prSpec,
      tarPack = tpSpec,
      tarCompact = tcSpec,
      annIndex = aiSpec,
      annSearch = asSpec,
      annProbe = apSpec,
      quantileFilter = qfSpec,
      wdsSamples = wdsSpec,
      winnow = winnowSpec,
      winnowProbe = winnowProbeSpec,
      bm25 = bm25Spec,
      bm25Index = bm25IndexSpec,
      bm25Search = bm25SearchSpec,
      rrfFuse = rrfSpec,
      rankingEval = rankingEvalSpec,
      upsample = upsampleSpec,
      funnel = funnelSpec,
      rangeJoin = rangeJoinSpec,
      overlapJoin = overlapJoinSpec,
      collocations = collocationsSpec,
      connectedComponents = connectedComponentsSpec,
      diff = diffSpec,
      applyDiff = applyDiffSpec,
      unpivot = unpivotSpec,
      approxTopK = approxTopKSpec,
      resample = resampleSpec,
      dsirScore = dsirScoreSpec,
      split = sp,
      temperatureSample = ts,
      tokenBudgetSample = tbs,
      globalShuffle = gs,
      htmlExtract = he,
      pdfExtract = pe,
      profile = pr,
      boilerplate = bp,
      featurize = fz,
      aggregate = aggregate,
      rename = rename,
      withColumns = withCols,
      postFilters = postFilters,
      expect = optN("expect").toSeq.flatMap(w =>
        fields(w).map { case (name, e) =>
          require(e.isTextual && e.asText.nonEmpty,
            s"node $id: expect rule '$name' must map to a non-empty " +
              "expression string")
          name -> e.asText
        }),
      // "group_cols" is RESERVED inside expect_report (a rule cannot take
      // that name): per-slice scorecards — counts per group value
      expectReport = expectReportNode.toSeq.flatMap(w =>
        fields(w).filterNot(f => f._1 == "group_cols" || f._1 == "groupCols")
          .map { case (name, e) =>
          require(e.isTextual && e.asText.nonEmpty,
            s"node $id: expect_report rule '$name' must map to a " +
              "non-empty expression string")
          name -> e.asText
        }),
      expectReportGroups = expectReportNode.toSeq
        .flatMap { w =>
          val gs = fields(w).collect {
            case (k @ ("group_cols" | "groupCols"), v) =>
              require(v.isArray,
                s"node $id: expect_report.$k must be an ARRAY of columns")
              strSeq(v)
          }
          require(gs.size <= 1,
            s"node $id: expect_report: give group_cols OR groupCols, not both")
          gs.flatten
        },
      drop = optN("drop").map(strSeq).getOrElse(Nil),
      bitemporal = bt,
      children = children,
      compact = optN("compact").map { c =>
        CompactSpec(
          keys = strSeq(req(c, s"node $id: compact", "keys")),
          versionOrder =
            opt(c, "version_order", "versionOrder").map(strSeq).getOrElse(Nil),
          deleteWhen = opt(c, "delete_when", "deleteWhen").map(_.asText))
      },
      runningTotals = optN("running_totals", "runningTotals").map { r =>
        RunningTotalsSpec(
          keyCol = req(r, s"node $id: running_totals", "key_col", "keyCol").asText,
          seqCol = req(r, s"node $id: running_totals", "seq_col", "seqCol").asText,
          tsCol = req(r, s"node $id: running_totals", "ts_col", "tsCol").asText,
          valueCol = req(r, s"node $id: running_totals", "value_col", "valueCol").asText)
      },
      topK = optN("top_k", "topK").map { t =>
        TopKSpec(
          partitionBy = opt(t, "partition_by", "partitionBy").map(strSeq).getOrElse(Nil),
          orderBy = opt(t, "order_by", "orderBy").map(strSeq).getOrElse(Nil),
          k = req(t, s"node $id: top_k", "k").asInt,
          rankCol = opt(t, "rank_col", "rankCol").map(_.asText).getOrElse("rn"))
      },
      orderBy = optN("order_by", "orderBy").map(strSeq).getOrElse(Nil),
      limit = optN("limit").map(_.asInt),
      save = optN("save").map(sink),
      nearDupIngest = optN("near_dup_ingest", "nearDupIngest").map { d =>
        val ctx = s"node $id: near_dup_ingest"
        NearDupIngestSpec(
          idCol = req(d, ctx, "id_col", "idCol").asText,
          textCol = req(d, ctx, "text_col", "textCol").asText,
          corpusDir = req(d, ctx, "corpus_dir", "corpusDir").asText,
          indexDir = req(d, ctx, "index_dir", "indexDir").asText,
          checkpointDir = req(d, ctx, "checkpoint_dir", "checkpointDir").asText,
          shingleSize = opt(d, "shingle_size", "shingleSize").map(_.asInt).getOrElse(3),
          numHashes = opt(d, "num_hashes", "numHashes").map(_.asInt).getOrElse(64),
          bands = opt(d, "bands").map(_.asInt).getOrElse(16),
          threshold = opt(d, "threshold").map(_.asDouble).getOrElse(0.5),
          compactEvery = ingestCompactEvery(d, s"node $id: near_dup_ingest"))
      },
      passageIngest = optN("passage_ingest", "passageIngest").map { d =>
        val ctx = s"node $id: passage_ingest"
        PassageIngestSpec(
          idCol = req(d, ctx, "id_col", "idCol").asText,
          textCol = req(d, ctx, "text_col", "textCol").asText,
          corpusDir = req(d, ctx, "corpus_dir", "corpusDir").asText,
          indexDir = req(d, ctx, "index_dir", "indexDir").asText,
          checkpointDir = req(d, ctx, "checkpoint_dir", "checkpointDir").asText,
          windowTokens = opt(d, "window_tokens", "windowTokens").map(_.asInt).getOrElse(50),
          compactEvery = ingestCompactEvery(d, ctx))
      },
      exactIngest = optN("exact_ingest", "exactIngest").map { d =>
        val ctx = s"node $id: exact_ingest"
        val s = ExactIngestSpec(
          idCol = req(d, ctx, "id_col", "idCol").asText,
          keyCols = strSeq(req(d, ctx, "key_cols", "keyCols")),
          corpusDir = req(d, ctx, "corpus_dir", "corpusDir").asText,
          indexDir = req(d, ctx, "index_dir", "indexDir").asText,
          checkpointDir = req(d, ctx, "checkpoint_dir", "checkpointDir").asText,
          compactEvery = ingestCompactEvery(d, ctx))
        require(s.keyCols.nonEmpty, s"$ctx: key_cols must be non-empty")
        s
      },
      ingestCompact = optN("ingest_compact", "ingestCompact").map { d =>
        val ctx = s"node $id: ingest_compact"
        val s = IngestCompactSpec(
          dirs = strSeq(req(d, ctx, "dirs")),
          checkpoint = opt(d, "checkpoint").map(_.asText))
        require(s.dirs.nonEmpty, s"$ctx: dirs must be non-empty")
        s
      },
      sketchIngest = optN("sketch_ingest", "sketchIngest").map { d =>
        val ctx = s"node $id: sketch_ingest"
        val s = SketchIngestSpec(
          keyCol = req(d, ctx, "key_col", "keyCol").asText,
          outDir = req(d, ctx, "out_dir", "outDir").asText,
          checkpointDir = req(d, ctx, "checkpoint_dir", "checkpointDir").asText,
          maxItemsTracked = opt(d, "max_items_tracked", "maxItemsTracked")
            .map(_.asInt).getOrElse(10000),
          lgK = opt(d, "lg_k", "lgK").map(_.asInt).getOrElse(12),
          groupCols = opt(d, "group_cols", "groupCols").map(strSeq).getOrElse(Nil))
        require(s.maxItemsTracked >= 1,
          s"$ctx: max_items_tracked must be >= 1, got ${s.maxItemsTracked}")
        require(s.lgK >= 4 && s.lgK <= 21,
          s"$ctx: lg_k must be in [4, 21], got ${s.lgK}")
        require(!s.groupCols.contains(s.keyCol),
          s"$ctx: key_col '${s.keyCol}' cannot also be a group column")
        s
      },
      bm25Ingest = optN("bm25_ingest", "bm25Ingest").map { d =>
        val ctx = s"node $id: bm25_ingest"
        val s = Bm25IngestSpec(
          idCol = req(d, ctx, "id_col", "idCol").asText,
          textCol = req(d, ctx, "text_col", "textCol").asText,
          indexDir = req(d, ctx, "index_dir", "indexDir").asText,
          checkpointDir = req(d, ctx, "checkpoint_dir", "checkpointDir").asText,
          compactEvery = opt(d, "compact_every", "compactEvery").map(_.asInt))
        s.compactEvery.foreach(n => require(n >= 1,
          s"$ctx: compact_every must be >= 1, got $n"))
        s
      },
      annIngest = optN("ann_ingest", "annIngest").map { d =>
        val ctx = s"node $id: ann_ingest"
        val s = AnnIngestSpec(
          idCol = req(d, ctx, "id_col", "idCol").asText,
          vecCol = req(d, ctx, "vec_col", "vecCol").asText,
          indexDir = req(d, ctx, "index_dir", "indexDir").asText,
          checkpointDir = req(d, ctx, "checkpoint_dir", "checkpointDir").asText,
          compactEvery = opt(d, "compact_every", "compactEvery").map(_.asInt))
        s.compactEvery.foreach(n => require(n >= 1,
          s"$ctx: compact_every must be >= 1, got $n"))
        s
      },
      sequencePack = optN("sequence_pack", "sequencePack").map { d =>
        val ctx = s"node $id: sequence_pack"
        val sp = SequencePackSpec(
          idCol = req(d, ctx, "id_col", "idCol").asText,
          idsCol = req(d, ctx, "ids_col", "idsCol").asText,
          seqLen = req(d, ctx, "seq_len", "seqLen").asInt,
          eosId = opt(d, "eos_id", "eosId").map(_.asInt).getOrElse(0),
          shards = opt(d, "shards").map(_.asInt).getOrElse(1),
          dropLast = opt(d, "drop_last", "dropLast").forall(_.asBoolean(true)),
          mode = opt(d, "mode").map(_.asText).getOrElse("split"),
          withBounds = opt(d, "with_bounds", "withBounds")
            .exists(_.asBoolean(false)),
          padId = opt(d, "pad_id", "padId").map(_.asInt).getOrElse(-1))
        require(sp.seqLen >= 2, s"$ctx: seq_len must be >= 2")
        require(sp.mode == "split" || sp.mode == "whole"
            || sp.mode == "best_fit",
          s"""$ctx: mode must be "split", "whole" or "best_fit", """ +
            s"""got "${sp.mode}"""")
        // best_fit always keeps every (short) window — an explicit
        // drop_last: false is the only detectable reliance on the key,
        // and silently honoring the DEFAULT true would be worse: reject
        // the stated contradiction by name instead of no-opping it.
        require(!(sp.mode == "best_fit" &&
            opt(d, "drop_last", "dropLast").exists(!_.asBoolean(true))),
          s"""$ctx: drop_last has no effect under mode "best_fit" """ +
            "(best-fit-decreasing keeps every window and pads instead) — " +
            "remove the key, or use mode \"split\"/\"whole\" to drop tails")
        sp
      },
      tarPackIngest = optN("tar_pack_ingest", "tarPackIngest").map { d =>
        val ctx = s"node $id: tar_pack_ingest"
        TarPackIngestSpec(
          nameCol = req(d, ctx, "name_col", "nameCol").asText,
          payloadCol = req(d, ctx, "payload_col", "payloadCol").asText,
          shards = req(d, ctx, "shards").asInt,
          outDir = req(d, ctx, "out_dir", "outDir").asText,
          checkpointDir = req(d, ctx, "checkpoint_dir", "checkpointDir").asText,
          trigger = opt(d, "trigger").map(_.asText))
      },
      cache = optN("cache").exists(_.asBoolean(false))
    )
    // unknown-key rejection: whatever this parse did not read is a typo
    // or an unsupported key — failing here beats a silent no-op operator
    val unknown = fields(n).map(_._1)
      .filterNot(k => accessed.contains(k) || extraAllowed.contains(k))
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"node $id: unknown key(s): ${unknown.mkString(", ")} — " +
          "the node-key table in docs/USAGE.md lists the config surface")
    spec
  }

  private def aggList(n: JsonNode): Seq[AggSpec] =
    if (n == null) Nil
    else if (n.isArray)
      elems(n).map { a =>
        AggSpec(
          col = req(a, "aggregation entry", "col", "agg_col", "column").asText,
          func = opt(a, "func", "agg_func", "function")
            .map(_.asText)
            .getOrElse("sum"),
          newName = opt(a, "new_name", "as", "alias").map(_.asText),
          filter = opt(a, "filter").map(_.asText),
          param = opt(a, "param", "percentage", "p").map(_.asDouble)
        )
      }
    else // sparks/optimus.py:62-68 spelling {col: "func" | ["sum","max"]}
      fields(n).flatMap {
        case (c, v) if v.isTextual => Seq(AggSpec(c, v.asText))
        case (c, v) if v.isArray =>
          elems(v).map(f => AggSpec(c, f.asText, Some(s"${f.asText}_$c")))
        case (c, v) =>
          Seq(
            AggSpec(
              c,
              opt(v, "function", "func").map(_.asText).getOrElse("sum"),
              newName = opt(v, "new_name").map(_.asText),
              filter = opt(v, "filter").map(_.asText)
            )
          )
      }

  private def sink(s: JsonNode): SinkSpec =
    if (s.isTextual) SinkSpec(path = s.asText)
    else {
      val format = opt(s, "format").map(_.asText).getOrElse("parquet")
      val table = opt(s, "table").map(_.asText)
      // layout keys, flat on the sink: partition_by / bucket_by / range_by
      // / zorder_by (+ their knobs) — see SinkLayoutSpec
      val layoutKeys = Seq(
        "partition_by", "partitionBy", "bucket_by", "bucketBy",
        "range_by", "rangeBy", "zorder_by", "zorderBy")
      val layout =
        if (layoutKeys.exists(k => opt(s, k).isDefined))
          Some(SinkLayoutSpec(
            partitionBy = opt(s, "partition_by", "partitionBy").map(strSeq).getOrElse(Nil),
            bucketBy = opt(s, "bucket_by", "bucketBy").map(strSeq).getOrElse(Nil),
            buckets = opt(s, "buckets").map(_.asInt).getOrElse(0),
            sortBy = opt(s, "sort_by", "sortBy").map(strSeq).getOrElse(Nil),
            rangeBy = opt(s, "range_by", "rangeBy").map(strSeq).getOrElse(Nil),
            ranges = opt(s, "ranges").map(_.asInt).getOrElse(0),
            zorderBy = opt(s, "zorder_by", "zorderBy").map(strSeq).getOrElse(Nil),
            zorderBits = opt(s, "zorder_bits", "zorderBits").map(_.asInt).getOrElse(4),
            maxRecordsPerFile =
              opt(s, "max_records_per_file", "maxRecordsPerFile").map(_.asLong).getOrElse(0L)))
        else None
      // only the KNOWN file formats hard-require a path — option-driven
      // sinks (kafka, jdbc, memory, console, ...) are legitimately
      // pathless, and catalog-backed (table) sinks carry a name instead
      val pathRequired = Set("parquet", "csv", "json", "orc", "text", "avro")
      SinkSpec(
        path = opt(s, "path").map(_.asText).getOrElse {
          // fail at parse time, not at the end of the job with Hadoop's
          // cryptic empty-path error. A table NAME substitutes for a path
          // only on the catalog-backed bucketed write (saveAsTable) — a
          // plain file sink with just {"table": ...} would still
          // save("") at the end of the job
          val bucketed = table.isDefined && layout.exists(_.bucketBy.nonEmpty)
          if (pathRequired(format) && !bucketed)
            throw new IllegalArgumentException(
              s"sink format '$format' requires a path " +
                "(or a bucketed layout with a catalog table name)")
          else ""
        },
        format = format,
        mode = opt(s, "mode").map(_.asText).getOrElse("overwrite"),
        options = opt(s, "options")
          .map(o => fields(o).map { case (k, v) => k -> v.asText }.toMap)
          .getOrElse(Map.empty),
        trigger = opt(s, "trigger").map(_.asText),
        checkpoint = opt(s, "checkpoint", "checkpoint_location").map(_.asText),
        outputMode = opt(s, "output_mode", "outputMode").map(_.asText),
        queryName = opt(s, "query_name", "queryName").map(_.asText),
        table = table,
        layout = layout
      )
    }

  private def cascade(n: JsonNode): CascadeSpec = {
    val src = opt(n, "source", "file_path", "data_path").map { s =>
      if (s.isTextual) {
        val p = s.asText
        val fmt = if (p.endsWith(".csv")) "csv" else "parquet"
        SourceSpec(format = fmt, path = Some(p))
      } else
        SourceSpec(
          format = opt(s, "format").map(_.asText).getOrElse("parquet"),
          path = opt(s, "path").map(_.asText),
          table = opt(s, "table").map(_.asText),
          sql = opt(s, "sql").map(_.asText)
        )
    }.getOrElse(SourceSpec())
    val iters = opt(n, "iterations").toSeq.flatMap(elems).map { it =>
      val id = opt(it, "id").map(_.asText).getOrElse("iteration")
      // reference: keys named level_1..level_n, dict order
      // (`Optimus/optimus.py:43-44`); canonical: "levels": [...]
      val levels: Seq[NodeSpec] = opt(it, "levels") match {
        case Some(ls) =>
          elems(ls).zipWithIndex.map { case (l, i) => node(l, s"${id}_l$i") }
        case None =>
          fields(it)
            .filter(_._1.startsWith("level"))
            .map { case (k, l) => node(l, s"${id}_$k") }
      }
      IterationSpec(id, levels, opt(it, "save").map(sink))
    }
    CascadeSpec(src, iters)
  }
}
