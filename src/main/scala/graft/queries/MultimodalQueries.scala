package graft.queries

import graft.Tables
import graft.ops.{Codecs, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pack: binary payload + metadata struct + partition-batched
  * featurize. Decode is REAL (pure-JVM BMP codec — graft.ops.Codecs): the
  * fixture synthesizes a deterministic BMP per document, metadata is
  * header-parsed (true pixel dimensions, not placeholders), and the
  * features are channel statistics of the decoded pixels. Rows-only gate
  * (DuckDB can't decode BMP); decode bit-exactness and round-trip
  * invariants live in ScalaTest (OpsSpec).
  */
object MultimodalQueries extends QueryPack {

  /** Deterministic text→BMP fixture synthesis: image dims derive from the
    * text length (so widths/heights vary across the corpus) and pixels
    * cycle through the UTF-8 bytes. A UDF is fine HERE — this is fixture
    * construction, not the scored path; featurize stays partition-batched. */
  private[graft] val textToBmp = udf { (t: String) =>
    val b = Option(t).getOrElse("").getBytes("UTF-8")
    val w = 4 + (b.length % 9)
    val h = 3 + (b.length % 7)
    val px = Array.tabulate(w * h * 3)(i => if (b.isEmpty) 0.toByte else b(i % b.length))
    Codecs.encodeBmp(w, h, px)
  }

  // q37 — full media pipeline, real decode end-to-end: rebalance the
  // (id, text) frame to the cluster width, synthesize BMP payloads,
  // header-parse metadata (real width/height) and featurize in ONE
  // partition sweep (parseAndFeaturize — no self-join, payloads decoded
  // once and never shuffled).
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val pf = Multimodal.parseAndFeaturize(
      Multimodal.rebalanceForCodec(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), textToBmp(col("text")).as("payload")),
      idCol = "doc_id", payloadCol = "payload", decoder = Codecs.mediaFeatures)
    pf.select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_bytes").as("n_bytes"),
        round(element_at(col("features"), 3).cast("double"), 9).as("mean_r"),
        round(element_at(col("features"), 6).cast("double"), 9).as("mean_luma"),
        size(col("features")).as("n_features"))
      .orderBy(col("media_id").asc_nulls_first)
  }

  /** Deterministic text→WAV fixture: PCM16 samples from consecutive UTF-8
    * byte pairs, mono, rate varying with length. */
  private[graft] val textToWav = udf { (t: String) =>
    val b = Option(t).getOrElse("").getBytes("UTF-8")
    val samples = Array.tabulate(math.max(b.length / 2, 1)) { i =>
      if (b.isEmpty) 0.toShort
      else ((b(2 * i % b.length) & 0xff) << 8 | (b((2 * i + 1) % b.length) & 0xff)).toShort
    }
    Codecs.encodeWav(8000 + (b.length % 5) * 1000, 1, samples)
  }

  // q69 — the audio path end-to-end, decode→transform→decode: synthesize
  // WAV payloads, frame-sample through the REAL resampler (decode, keep
  // every 4th frame, re-encode — transformPayload's production shape),
  // then featurize the downsampled audio and emit parsed frame counts +
  // amplitude stats. Rows-only gate (DuckDB can't parse RIFF); codec
  // round-trip exactness lives in OpsSpec/PropertySpec.
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaParsed(
      Multimodal.rebalanceForCodec(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), textToWav(col("text")).as("payload")),
      idCol = "doc_id", payloadCol = "payload")
    val sampled = Multimodal.transformPayload(media, "wav", Codecs.downsampleWav(4))
    // one sweep over the transformed payload: header re-parse (meta must
    // reflect the DOWNSAMPLED audio, not the input) + featurize
    val pf = Multimodal.parseAndFeaturize(
      sampled, "media_id", "payload", Codecs.mediaFeatures)
    pf.select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("frames"), col("meta.n_bytes").as("n_bytes"),
        round(element_at(col("features"), 4).cast("double"), 9).as("mean_abs"),
        round(element_at(col("features"), 5).cast("double"), 9).as("rms"),
        size(col("features")).as("n_features"))
      .orderBy(col("media_id").asc_nulls_first)
  }

  /** Deterministic text→AVI fixture: 4-8 frames of 8×6 whose pixels cycle
    * the UTF-8 bytes with a per-frame shift (so consecutive frames differ
    * — the temporal-delta feature has signal). */
  private[graft] val textToAvi = udf { (t: String) =>
    val b = Option(t).getOrElse("").getBytes("UTF-8")
    val (w, h) = (8, 6)
    val nf = 4 + (b.length % 5)
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h * 3)(i => if (b.isEmpty) 0.toByte else b((i + f * 7) % b.length))
    }
    Codecs.encodeAvi(w, h, 10, frames)
  }

  // q71 — the VIDEO path end-to-end: synthesize AVI payloads, frame-sample
  // through the real container codec (decode DIB frames, keep every 2nd,
  // re-encode at half fps), re-parse metadata from the transformed bytes,
  // featurize (per-frame luma stats + temporal delta). Rows-only gate
  // (DuckDB can't parse RIFF/AVI); codec exactness lives in OpsSpec.
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaParsed(
      Multimodal.rebalanceForCodec(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), textToAvi(col("text")).as("payload")),
      idCol = "doc_id", payloadCol = "payload")
    val sampled = Multimodal.transformPayload(media, "avi", Codecs.frameSampleAvi(2))
    val pf = Multimodal.parseAndFeaturize(
      sampled, "media_id", "payload", Codecs.mediaFeatures)
    pf.select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        element_at(col("features"), 3).cast("int").as("n_frames"),
        element_at(col("features"), 4).cast("int").as("fps"),
        round(element_at(col("features"), 5).cast("double"), 9).as("mean_luma"),
        round(element_at(col("features"), 8).cast("double"), 9).as("temporal_delta"))
      .orderBy(col("media_id").asc_nulls_first)
  }

  // q89 — the IMAGE transform path end-to-end: synthesize variable-sized
  // BMPs, normalize every payload to a fixed 16×12 thumbnail through the
  // real nearest-neighbor resizer (decode → sample → re-encode —
  // transformPayload's production shape, the standard pre-embedding
  // normalization step), re-parse metadata from the resized bytes (must
  // show the UNIFORM target dims, not the input's), featurize the resized
  // pixels. Rows-only gate (DuckDB can't decode BMP); resize exactness
  // lives in OpsSpec (block-replication + center-sample identities).
  private def q89(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaParsed(
      Multimodal.rebalanceForCodec(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), textToBmp(col("text")).as("payload")),
      idCol = "doc_id", payloadCol = "payload")
    val resized = Multimodal.transformPayload(media, "bmp", Codecs.resizeBmp(16, 12))
    val pf = Multimodal.parseAndFeaturize(
      resized, "media_id", "payload", Codecs.mediaFeatures)
    pf.select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_bytes").as("n_bytes"),
        round(element_at(col("features"), 3).cast("double"), 9).as("mean_r"),
        round(element_at(col("features"), 6).cast("double"), 9).as("mean_luma"))
      .orderBy(col("media_id").asc_nulls_first)
  }

  /** Deterministic text→PNG fixture: same dim/pixel derivation as
    * [[textToBmp]] but encoded as a real compressed PNG with CYCLING row
    * filters (row % 5), so every decode reconstruction path (None/Sub/Up/
    * Average/Paeth) runs on corpus data, not just unit fixtures. */
  private[graft] val textToPng = udf { (t: String) =>
    val b = Option(t).getOrElse("").getBytes("UTF-8")
    val w = 4 + (b.length % 9)
    val h = 3 + (b.length % 7)
    val px = Array.tabulate(w * h * 3)(i => if (b.isEmpty) 0.toByte else b(i % b.length))
    Codecs.encodePng(w, h, px)
  }

  // q94 — the COMPRESSED image path end-to-end: synthesize real PNGs
  // (DEFLATE + per-row filter mix), thumbnail through the PNG
  // decode→resize→re-encode transform, re-parse metadata from the resized
  // bytes (header-only, big-endian IHDR), featurize the decoded pixels.
  // The pixel content matches q89's BMP fixture by construction; OpsSpec
  // asserts the cross-codec invariant (equal pixels → equal resize output
  // and features in both codecs). Rows-only gate (DuckDB can't inflate
  // PNG); decode bit-exactness lives in the OpsSpec golden test.
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaParsed(
      Multimodal.rebalanceForCodec(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), textToPng(col("text")).as("payload")),
      idCol = "doc_id", payloadCol = "payload")
    val resized = Multimodal.transformPayload(media, "png", Codecs.resizePng(16, 12))
    val pf = Multimodal.parseAndFeaturize(
      resized, "media_id", "payload", Codecs.mediaFeatures)
    pf.select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        round(element_at(col("features"), 3).cast("double"), 9).as("mean_r"),
        round(element_at(col("features"), 6).cast("double"), 9).as("mean_luma"))
      .orderBy(col("media_id").asc_nulls_first)
  }

  /** Deterministic text→JPEG fixture: same dim/pixel derivation as
    * [[textToBmp]], baseline-encoded at quality 90 (real DCT + Huffman +
    * quantization — the dominant real-corpus image format). */
  private[graft] val textToJpeg = udf { (t: String) =>
    val b = Option(t).getOrElse("").getBytes("UTF-8")
    val w = 4 + (b.length % 9)
    val h = 3 + (b.length % 7)
    val px = Array.tabulate(w * h * 3)(i => if (b.isEmpty) 0.toByte else b(i % b.length))
    graft.ops.Jpeg.encode(w, h, px, quality = 90)
  }

  // q99 — the LOSSY-compressed image path end-to-end: synthesize baseline
  // JPEGs (real DCT/quant/Huffman), thumbnail through the JPEG
  // decode→resize→re-encode transform, re-parse metadata from the resized
  // bytes (SOF header), featurize the decoded pixels. Rows-only gate
  // (DuckDB has no JPEG); decode EXACTNESS is pinned by the OpsSpec
  // golden test against the independent python reference (shared-basis
  // IDCT contract — byte equality, not tolerance).
  private def q99(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaParsed(
      Multimodal.rebalanceForCodec(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), textToJpeg(col("text")).as("payload")),
      idCol = "doc_id", payloadCol = "payload")
    val resized = Multimodal.transformPayload(media, "jpeg", Codecs.resizeJpeg(16, 12))
    val pf = Multimodal.parseAndFeaturize(
      resized, "media_id", "payload", Codecs.mediaFeatures)
    pf.select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        round(element_at(col("features"), 3).cast("double"), 9).as("mean_r"),
        round(element_at(col("features"), 6).cast("double"), 9).as("mean_luma"))
      .orderBy(col("media_id").asc_nulls_first)
  }

  // q100 — q37's media pipeline declared from JSON: the `featurize` node
  // key (header-parsed meta + partition-batched real decode through the
  // NAMED "media" decoder registry — a config can't carry a closure), fed
  // by a registered fixture UDF in a `derive`. Downstream keys run over
  // the feature frame. Rows-only gate (media); CompilerSpec asserts the
  // config path equals the Scala API path value-for-value.
  private def q100(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    s.udf.register("text_to_bmp", textToBmp)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"payload": "text_to_bmp(text)"},
       "keep_columns": ["doc_id", "payload"],
       "featurize": {"id_col": "doc_id", "payload_col": "payload",
                     "decoder": "media"},
       "with_columns": {"mean_r": "round(cast(element_at(features, 3) as double), 9)",
                        "mean_luma": "round(cast(element_at(features, 6) as double), 9)"},
       "drop": ["features"],
       "order_by": ["media_id asc"]}""")
  }

  /** Deterministic text→GIF fixture: 2-5 frames of 8×6 over a fixed
    * 16-color palette (GIF is indexed color — the fixture honors the
    * format's contract), pixels cycling the text bytes with a per-frame
    * shift so temporal deltas have signal. */
  private[graft] val textToGif = udf { (t: String) =>
    val b = Option(t).getOrElse("").getBytes("UTF-8")
    val (w, h) = (8, 6)
    val nf = 2 + (b.length % 4)
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h * 3) { i =>
        val p = i / 3
        val c = if (b.isEmpty) 0 else b((p + f * 7) % b.length) & 0x0f
        (i % 3 match {
          case 0 => c * 16
          case 1 => 255 - c * 16
          case _ => (c * c) % 256
        }).toByte
      }
    }
    graft.ops.Gif.encode(w, h, frames, delayCs = 10)
  }

  // q107 — the INDEXED-COLOR animation path end-to-end: synthesize real
  // GIF89a payloads (palette + LZW), frame-sample through the container
  // codec (decode → keep every 2nd frame → re-encode), then one-sweep
  // meta parse + featurize. Rows-only gate (DuckDB has no LZW); decode
  // exactness is pinned by the OpsSpec goldens from the independent
  // python reference (tools/gif_ref.py).
  private def q107(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaParsed(
      Multimodal.rebalanceForCodec(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), textToGif(col("text")).as("payload")),
      idCol = "doc_id", payloadCol = "payload")
    val sampled = Multimodal.transformPayload(media, "gif", graft.ops.Gif.frameSample(2))
    val pf = Multimodal.parseAndFeaturize(
      sampled, "media_id", "payload", Codecs.mediaFeatures)
    pf.select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        element_at(col("features"), 3).cast("int").as("n_frames"),
        element_at(col("features"), 4).cast("int").as("fps"),
        round(element_at(col("features"), 5).cast("double"), 9).as("mean_luma"),
        round(element_at(col("features"), 8).cast("double"), 9).as("temporal_delta"))
      .orderBy(col("media_id").asc_nulls_first)
  }

  // q112 — corrupt-payload policy end-to-end: every 7th document's BMP is
  // truncated to 60 bytes (magic + header intact, pixel data gone — the
  // realistic "truncated upload" shape), and the one-sweep featurize runs
  // with OnError.Skip. Survivors and their header-parsed dims are exactly
  // predictable → oracle-checked: a corrupt payload must neither kill the
  // job nor leak into the output.
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.rebalanceForCodec(
        Tables.load(s, dir, "documents").select("doc_id", "text"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0,
            substring(textToBmp(col("text")), 1, 60))
          .otherwise(textToBmp(col("text"))).as("payload"))
    Multimodal.parseAndFeaturize(
        media, "doc_id", "payload", Codecs.mediaFeatures,
        onError = Multimodal.OnError.Skip)
      .select(col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .orderBy(col("media_id").asc_nulls_first)
  }
  // strlen = BYTES (mirrors getBytes("UTF-8").length in textToBmp)
  private val q112Sql = """
    SELECT doc_id AS media_id, 'bmp' AS format,
           CAST(4 + strlen(text) % 9 AS INT) AS width,
           CAST(3 + strlen(text) % 7 AS INT) AS height
    FROM documents WHERE doc_id % 7 <> 0
    ORDER BY media_id ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q37_multimodal_featurize", q37, None),
    Q("q69_audio_featurize", q69, None),
    Q("q71_video_featurize", q71, None),
    Q("q89_image_resize", q89, None),
    Q("q94_png_resize", q94, None),
    Q("q99_jpeg_resize", q99, None),
    Q("q100_config_featurize", q100, None),
    Q("q107_gif_featurize", q107, None),
    Q("q112_corrupt_policy", q112, Some(q112Sql))
  )
}
