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

  /** Fixture images whose dHash EQUALS a chosen 64-bit key by
    * construction: 9×8 grayscale (r=g=b=v → integer luma exactly v), each
    * row walked left→right stepping ±14 so gray(y,x) < gray(y,x+1) iff
    * bit (y·8+x) of the key — `dHash64(decode(keyToBmp(k))) == k` is a
    * THEOREM (OpsSpec), not a corpus property. Values stay in
    * [128−8·14, 128+8·14] = [16, 240]. Lets an oracle reason about
    * perceptual-dedup outcomes in pure SQL: the q137 flagship plants
    * cross-codec copies by giving two payloads the same key. */
  private[graft] def keyPixels(k: Long): Array[Byte] = {
    val px = new Array[Byte](9 * 8 * 3)
    var y = 0
    while (y < 8) {
      var v = 128
      var i = (y * 9) * 3
      px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
      var x = 0
      while (x < 8) {
        v = if (((k >>> (y * 8 + x)) & 1L) == 1L) v + 14 else v - 14
        i = (y * 9 + x + 1) * 3
        px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    px
  }
  private[graft] val keyToBmp = udf { (k: Long) => Codecs.encodeBmp(9, 8, keyPixels(k)) }
  private[graft] val keyToPng = udf { (k: Long) => Codecs.encodePng(9, 8, keyPixels(k)) }

  /** Shared strlen-arithmetic mirrors for the BMP/PNG fixture family:
    * the fixtures derive dims from the byte length (w = 4+len%9,
    * h = 3+len%7) and cycle text bytes into pixels, and the corpus is
    * pure ASCII at every SF (asserted by the len == strlen equality the
    * oracles implicitly rely on — ascii(text[i]) IS byte i-1). Feature
    * means mirror [[Codecs]]' exact arithmetic: integer channel/luma
    * sums, one double division, ONE float32 truncation (CAST AS FLOAT),
    * back to double, round 9dp — the q115 float-checksum technique at
    * per-row granularity. */
  private def bmpBaseSql = """
    base AS (
      SELECT doc_id, text, strlen(text) AS len,
             4 + strlen(text) % 9 AS w, 3 + strlen(text) % 7 AS h
      FROM documents)"""
  /** Channel/luma sums over the ORIGINAL w×h pixel grid. */
  private def bmpOrigSumsSql = s"""
    $bmpBaseSql,
    f AS (
      SELECT doc_id, w, h,
        list_sum([ascii(text[1 + (3 * p) % len])
                  for p in generate_series(0, w * h - 1)]) AS sr,
        list_sum([299 * ascii(text[1 + (3 * p) % len])
                  + 587 * ascii(text[1 + (3 * p + 1) % len])
                  + 114 * ascii(text[1 + (3 * p + 2) % len])
                  for p in generate_series(0, w * h - 1)]) AS sl
      FROM base)"""
  /** Channel/luma sums over the 16×12 nearest-neighbor resize: source
    * pixel = floor((out+0.5)·in/out) center sample, exactly
    * [[Codecs.resizeImage]]'s truncation (FLOOR == toInt on positives;
    * the double division cannot round across an integer boundary at
    * these magnitudes). */
  private def bmpResizedSumsSql = s"""
    $bmpBaseSql,
    rz AS (
      SELECT doc_id, len, w, h,
        [ (LEAST(CAST(FLOOR(((q // 16) + 0.5) * h / 12.0) AS INT), h - 1) * w +
           LEAST(CAST(FLOOR(((q % 16) + 0.5) * w / 16.0) AS INT), w - 1))
          for q in generate_series(0, 191)] AS src
      FROM base),
    f AS (
      SELECT doc_id, w, h,
        list_sum([ascii(text[1 + (3 * s) % len]) for s in src]) AS sr,
        list_sum([299 * ascii(text[1 + (3 * s) % len])
                  + 587 * ascii(text[1 + (3 * s + 1) % len])
                  + 114 * ascii(text[1 + (3 * s + 2) % len])
                  for s in src]) AS sl
      FROM rz JOIN base USING (doc_id, len, w, h))"""

  // q37 — full media pipeline, real decode end-to-end: rebalance the
  // (id, text) frame to the cluster width, synthesize BMP payloads,
  // header-parse metadata (real width/height) and featurize in ONE
  // partition sweep (parseAndFeaturize — no self-join, payloads decoded
  // once and never shuffled). Exact oracle (round 9): every emitted
  // value is strlen arithmetic + one float32 truncation.
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
  private val q37Sql = s"""
    WITH ${bmpOrigSumsSql}
    SELECT doc_id AS media_id, 'bmp' AS format,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(54 + (3 * w + (4 - (3 * w) % 4) % 4) * h AS BIGINT) AS n_bytes,
           ROUND(CAST(CAST(sr / (255.0 * w * h) AS FLOAT) AS DOUBLE), 9) AS mean_r,
           ROUND(CAST(CAST(sl / (255.0 * w * h * 1000.0) AS FLOAT) AS DOUBLE), 9) AS mean_luma,
           CAST(8 AS INT) AS n_features
    FROM f ORDER BY media_id ASC NULLS FIRST"""
  private val q100Sql = s"""
    WITH ${bmpOrigSumsSql}
    SELECT doc_id AS media_id, 'bmp' AS format,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(54 + (3 * w + (4 - (3 * w) % 4) % 4) * h AS BIGINT) AS n_bytes,
           ROUND(CAST(CAST(sr / (255.0 * w * h) AS FLOAT) AS DOUBLE), 9) AS mean_r,
           ROUND(CAST(CAST(sl / (255.0 * w * h * 1000.0) AS FLOAT) AS DOUBLE), 9) AS mean_luma
    FROM f ORDER BY media_id ASC NULLS FIRST"""

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

  // q69 (WAV downsample+featurize) retired round 9: q124 drives the
  // IDENTICAL path — textToWav → transformPayload(downsampleWav(4)) →
  // parseAndFeaturize — under pinned independent-reference checksums
  // (original AND downsampled), so the rows-only entry added no coverage
  // the hash gate doesn't already fail on. docs/COVERAGE.md ledger row
  // updated; one-row-per-operator invariant kept by q124.

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

  // q71 (AVI frame-sample+featurize) retired round 9: q125 drives the
  // identical textToAvi → frameSampleAvi(2) → parseAndFeaturize path
  // under pinned checksums (original and sampled luma/motion stats) —
  // q124's retirement rationale.

  // q89 — the IMAGE transform path end-to-end: synthesize variable-sized
  // BMPs, normalize every payload to a fixed 16×12 thumbnail through the
  // real nearest-neighbor resizer (decode → sample → re-encode —
  // transformPayload's production shape, the standard pre-embedding
  // normalization step), re-parse metadata from the resized bytes (must
  // show the UNIFORM target dims, not the input's), featurize the resized
  // pixels. Exact oracle (round 9): BMP is lossless and the
  // nearest-neighbor source indices are integer arithmetic, so the
  // resized pixel grid — and its feature sums — replay in SQL.
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
  private val q89Sql = s"""
    WITH ${bmpResizedSumsSql}
    SELECT doc_id AS media_id, 'bmp' AS format,
           CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
           CAST(630 AS BIGINT) AS n_bytes,
           ROUND(CAST(CAST(sr / (255.0 * 192) AS FLOAT) AS DOUBLE), 9) AS mean_r,
           ROUND(CAST(CAST(sl / (255.0 * 192 * 1000.0) AS FLOAT) AS DOUBLE), 9) AS mean_luma
    FROM f ORDER BY media_id ASC NULLS FIRST"""

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
  // and features in both codecs). Exact oracle (round 9): PNG is
  // lossless, so the q89 resized-grid mirror applies unchanged — the
  // DEFLATE layer only has to reproduce the pixels, which the OpsSpec
  // golden pins byte-exactly.
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
  private val q94Sql = s"""
    WITH ${bmpResizedSumsSql}
    SELECT doc_id AS media_id, 'png' AS format,
           CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
           ROUND(CAST(CAST(sr / (255.0 * 192) AS FLOAT) AS DOUBLE), 9) AS mean_r,
           ROUND(CAST(CAST(sl / (255.0 * 192 * 1000.0) AS FLOAT) AS DOUBLE), 9) AS mean_luma
    FROM f ORDER BY media_id ASC NULLS FIRST"""

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

  // q99 (JPEG resize+featurize) retired round 9: lossy DCT output has no
  // SQL spelling, and q116 drives the identical textToJpeg →
  // resizeJpeg(16,12) path — with DOUBLE compression — under checksums
  // pinned from the independent tools/jpeg_ref.py mirror. q124's
  // retirement rationale.

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

  // q107 (GIF frame-sample+featurize) retired round 9: q117 drives the
  // identical textToGif → Gif.frameSample(2) → parseAndFeaturize path
  // (incl. the animation/disposal semantics) under pinned checksums from
  // the independent tools/gif_ref.py mirror. q124's retirement rationale.

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

  // ---- media DRIVER-HASH gates (q115-q117) --------------------------------
  //
  // Round-7 verdict: the media pipeline was the last pillar outside the
  // driver's hash gate — byte-exact ScalaTest goldens, but a decode
  // regression could not fail CORRECTNESS. These three queries close that:
  // each runs the PRODUCTION path (encode → transform → one-sweep parse +
  // featurize) over a fixture corpus generated IN the query — 60 ASCII
  // texts of 5 cycling lengths, so dims/frame-counts sweep the full
  // derivation range and the pinned literals are SCALE-FACTOR-INVARIANT
  // (no dependence on testdata contents). The oracle literals are computed
  // by tools/media_gate_ref.py — an INDEPENDENT python mirror (pixel
  // derivation from text bytes; jpeg_ref.py's exact codec for the lossy
  // path), not a dump of Spark's own output — so the gate pins decode
  // correctness, not current behavior.
  //
  // Checksum arithmetic is the repo's standard retry-deterministic shape:
  // per-row feature → round 9 dp → DECIMAL(25,9) exact sum → round 6 dp →
  // double. Spark's round() on doubles goes through Double.toString
  // (shortest repr) + HALF_UP, which the python mirror reproduces via
  // Decimal(repr(x)).
  private def gateFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    // the "!" tail de-correlates byte length from the base-string multiple,
    // so len%4 (GIF frame count), len%9 (width) and len%7 (height) all sweep
    (1 to 60).map { i =>
      (i.toLong, "graft media gate %02d ".format(i) * (1 + i % 5) + "!" * (i % 7))
    }.toDF("media_id", "text")
  }

  private def chk9(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c.cast("double"), 9).cast(org.apache.spark.sql.types.DecimalType(25, 9))

  // q115 — PNG decode+resize gate: lossless codec, so the expected pixel
  // stats derive straight from the fixture text bytes (no codec needed on
  // the reference side — the strongest possible independence).
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.rebalanceForCodec(gateFixture(s))
      .select(col("media_id"), textToPng(col("text")).as("payload"))
    val orig = Multimodal.parseAndFeaturize(
      media, "media_id", "payload", Codecs.mediaFeatures)
    val rz = Multimodal.parseAndFeaturize(
      Multimodal.transformPayload(
        Multimodal.asMediaParsed(media, "media_id", "payload"),
        "png", Codecs.resizePng(16, 12)),
      "media_id", "payload", Codecs.mediaFeatures)
    orig.agg(
        count(lit(1)).as("n_media"),
        sum(col("meta.width").cast("long")).as("sum_w"),
        sum(col("meta.height").cast("long")).as("sum_h"),
        round(sum(chk9(element_at(col("features"), 3))), 6).cast("double").as("mean_r_chk"),
        round(sum(chk9(element_at(col("features"), 6))), 6).cast("double").as("mean_luma_chk"))
      .crossJoin(rz.agg(
        round(sum(chk9(element_at(col("features"), 6))), 6).cast("double").as("rz_luma_chk")))
  }

  // q116 — JPEG gate: the lossy path. Expected stats come from
  // tools/jpeg_ref.py's exact-arithmetic codec (the same independent
  // reference the byte-equality goldens use), run through encode(q90) →
  // decode → nearest-resize → encode(q90) → decode — double compression,
  // exactly what the pipeline does.
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.rebalanceForCodec(gateFixture(s))
      .select(col("media_id"), textToJpeg(col("text")).as("payload"))
    val orig = Multimodal.parseAndFeaturize(
      media, "media_id", "payload", Codecs.mediaFeatures)
    val rz = Multimodal.parseAndFeaturize(
      Multimodal.transformPayload(
        Multimodal.asMediaParsed(media, "media_id", "payload"),
        "jpeg", Codecs.resizeJpeg(16, 12)),
      "media_id", "payload", Codecs.mediaFeatures)
    orig.agg(
        count(lit(1)).as("n_media"),
        sum(col("meta.width").cast("long")).as("sum_w"),
        sum(col("meta.height").cast("long")).as("sum_h"),
        round(sum(chk9(element_at(col("features"), 3))), 6).cast("double").as("mean_r_chk"),
        round(sum(chk9(element_at(col("features"), 6))), 6).cast("double").as("mean_luma_chk"))
      .crossJoin(rz.agg(
        round(sum(chk9(element_at(col("features"), 6))), 6).cast("double").as("rz_luma_chk")))
  }

  // q117 — GIF animation gate: indexed color is lossless on the 16-color
  // fixture, so original AND frame-sampled stats (mean luma, temporal
  // delta, frame counts) derive from the text bytes on the reference side.
  private def q117(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.rebalanceForCodec(gateFixture(s))
      .select(col("media_id"), textToGif(col("text")).as("payload"))
    val orig = Multimodal.parseAndFeaturize(
      media, "media_id", "payload", Codecs.mediaFeatures)
    val sampled = Multimodal.parseAndFeaturize(
      Multimodal.transformPayload(
        Multimodal.asMediaParsed(media, "media_id", "payload"),
        "gif", graft.ops.Gif.frameSample(2)),
      "media_id", "payload", Codecs.mediaFeatures)
    orig.agg(
        count(lit(1)).as("n_media"),
        sum(element_at(col("features"), 3).cast("long")).as("sum_frames"),
        round(sum(chk9(element_at(col("features"), 5))), 6).cast("double").as("luma_chk"),
        round(sum(chk9(element_at(col("features"), 8))), 6).cast("double").as("delta_chk"))
      .crossJoin(sampled.agg(
        sum(element_at(col("features"), 3).cast("long")).as("s_sum_frames"),
        round(sum(chk9(element_at(col("features"), 5))), 6).cast("double").as("s_luma_chk")))
  }

  /** Deterministic text→MP3 fixture: 4-10 Layer-III frames at 44100,
    * channel count and bitrate schedule from the byte length — docs with
    * len%3==0 are CBR, the rest cycle four bitrates (VBR). An ID3v2 tag
    * of varying size exercises the skip path on every row. */
  private[graft] val textToMp3 = udf { (t: String) =>
    val b = Option(t).getOrElse("").getBytes("UTF-8")
    val n = 4 + b.length % 7
    val table = Array(96, 128, 160, 192)
    val frames =
      if (b.length % 3 == 0) Seq.fill(n)(table(b.length % 4))
      else (0 until n).map(f => table((b.length + f) % 4))
    graft.ops.Mp3.encode(44100, 1 + b.length % 2, frames, id3v2Bytes = b.length % 19)
  }

  // q119 — MP3 STREAM-layer stats end-to-end: synthesize real Layer-III
  // frame chains (VBR and CBR mixed, ID3v2 tags skipped), one-sweep parse
  // + featurize. Every emitted column is integer-derived from the
  // frame-header walk (sample counts, floor-mean kbps, frame-size sums),
  // so the oracle recomputes them EXACTLY from strlen arithmetic — the
  // container tier gets a full hash gate even though sample decode stays
  // behind the codec seam.
  private def q119(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.rebalanceForCodec(
        Tables.load(s, dir, "documents").select("doc_id", "text"))
      .select(col("doc_id"), textToMp3(col("text")).as("payload"))
    Multimodal.parseAndFeaturize(media, "doc_id", "payload", Codecs.mediaFeatures)
      .select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").cast("long").as("total_samples"),
        col("meta.height").as("channels"),
        element_at(col("features"), 3).cast("long").as("n_frames"),
        element_at(col("features"), 6).cast("long").as("mean_kbps"),
        element_at(col("features"), 7).cast("int").as("vbr"),
        element_at(col("features"), 8).cast("long").as("stream_bytes"))
      .orderBy(col("media_id").asc_nulls_first)
  }
  // strlen = BYTES (mirrors getBytes("UTF-8")); [96,128,160,192] 1-indexed
  private val q119Sql = """
    WITH base AS (
      SELECT doc_id, strlen(text) AS len, 4 + strlen(text) % 7 AS n
      FROM documents),
    k AS (
      SELECT doc_id, len, n,
             CASE WHEN len % 3 = 0
                  THEN [([96,128,160,192])[len % 4 + 1] for f in generate_series(0, n-1)]
                  ELSE [([96,128,160,192])[(len + f) % 4 + 1] for f in generate_series(0, n-1)]
             END AS kbps
      FROM base)
    SELECT doc_id AS media_id, 'mp3' AS format,
           CAST(n * 1152 AS BIGINT) AS total_samples,
           CAST(1 + len % 2 AS INT) AS channels,
           CAST(n AS BIGINT) AS n_frames,
           CAST(list_sum(kbps) // n AS BIGINT) AS mean_kbps,
           CAST(CASE WHEN list_min(kbps) <> list_max(kbps) THEN 1 ELSE 0 END AS INT) AS vbr,
           CAST(list_sum([144 * kk * 1000 // 44100 for kk in kbps]) AS BIGINT) AS stream_bytes
    FROM k ORDER BY media_id ASC NULLS FIRST"""

  /** Deterministic text→MP4 fixture: single video track, dims/sample
    * count/sizes from the byte length, keyframe every 3rd sample. */
  private[graft] val textToMp4 = udf { (t: String) =>
    val b = Option(t).getOrElse("").getBytes("UTF-8")
    val n = 5 + b.length % 9
    val sizes = (0 until n).map(i => 50 + (b.length * 7 + i * 13) % 100)
    graft.ops.Mp4.encode(
      16 * (4 + b.length % 5), 16 * (3 + b.length % 4),
      timescale = 1000, sampleDurations = 40, sampleSizes = sizes)
  }

  // q120 — MP4 CONTAINER-layer stats end-to-end: synthesize real BMFF box
  // trees (ftyp/moov/trak/stbl sample tables + mdat), one-sweep parse +
  // featurize. Integer-only emitted columns (dims, sample counts,
  // floor-mean sample bytes, mdat size) → exact strlen-arithmetic oracle.
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.rebalanceForCodec(
        Tables.load(s, dir, "documents").select("doc_id", "text"))
      .select(col("doc_id"), textToMp4(col("text")).as("payload"))
    Multimodal.parseAndFeaturize(media, "doc_id", "payload", Codecs.mediaFeatures)
      .select(
        col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        element_at(col("features"), 4).cast("long").as("n_samples"),
        element_at(col("features"), 5).cast("long").as("mean_sample_bytes"),
        element_at(col("features"), 7).cast("int").as("n_tracks"),
        element_at(col("features"), 8).cast("long").as("mdat_bytes"))
      .orderBy(col("media_id").asc_nulls_first)
  }
  private val q120Sql = """
    WITH base AS (
      SELECT doc_id, strlen(text) AS len, 5 + strlen(text) % 9 AS n
      FROM documents),
    sz AS (
      SELECT doc_id, len, n,
             list_sum([50 + (len * 7 + i * 13) % 100
                       for i in generate_series(0, n-1)]) AS total
      FROM base)
    SELECT doc_id AS media_id, 'mp4' AS format,
           CAST(16 * (4 + len % 5) AS INT) AS width,
           CAST(16 * (3 + len % 4) AS INT) AS height,
           CAST(n AS BIGINT) AS n_samples,
           CAST(total // n AS BIGINT) AS mean_sample_bytes,
           CAST(1 AS INT) AS n_tracks,
           CAST(total AS BIGINT) AS mdat_bytes
    FROM sz ORDER BY media_id ASC NULLS FIRST"""

  // q121 — the MIXED media lake, the shape a real corpus column actually
  // has: one binary column carrying SEVEN formats (BMP/PNG/JPEG/GIF/WAV/
  // MP3/MP4 by doc_id mod 7), one sniffing parse sweep, per-row format +
  // header dims out. Every value is exactly derivable from (doc_id,
  // strlen) arithmetic, so the dispatch itself — the right parser chosen
  // per row, no format bleeding into another — is driver-hash-gated.
  private def q121(s: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(7))
    val media = Multimodal.rebalanceForCodec(
        Tables.load(s, dir, "documents").select("doc_id", "text"))
      .select(col("doc_id"),
        when(m === 0, textToBmp(col("text")))
          .when(m === 1, textToPng(col("text")))
          .when(m === 2, textToJpeg(col("text")))
          .when(m === 3, textToGif(col("text")))
          .when(m === 4, textToWav(col("text")))
          .when(m === 5, textToMp3(col("text")))
          .otherwise(textToMp4(col("text"))).as("payload"))
    Multimodal.parseAndFeaturize(media, "doc_id", "payload", Codecs.mediaFeatures)
      .select(col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .orderBy(col("media_id").asc_nulls_first)
  }
  // strlen = BYTES; width/height mirror each fixture's dim derivation
  // (WAV: PCM frames × channels; MP3: PCM samples × channels)
  private val q121Sql = """
    WITH base AS (SELECT doc_id, strlen(text) AS len FROM documents)
    SELECT doc_id AS media_id,
           CASE doc_id % 7 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
                WHEN 2 THEN 'jpeg' WHEN 3 THEN 'gif' WHEN 4 THEN 'wav'
                WHEN 5 THEN 'mp3' ELSE 'mp4' END AS format,
           CAST(CASE doc_id % 7
                WHEN 0 THEN 4 + len % 9 WHEN 1 THEN 4 + len % 9
                WHEN 2 THEN 4 + len % 9 WHEN 3 THEN 8
                WHEN 4 THEN greatest(len // 2, 1)
                WHEN 5 THEN (4 + len % 7) * 1152
                ELSE 16 * (4 + len % 5) END AS INT) AS width,
           CAST(CASE doc_id % 7
                WHEN 0 THEN 3 + len % 7 WHEN 1 THEN 3 + len % 7
                WHEN 2 THEN 3 + len % 7 WHEN 3 THEN 6
                WHEN 4 THEN 1
                WHEN 5 THEN 1 + len % 2
                ELSE 16 * (3 + len % 4) END AS INT) AS height
    FROM base ORDER BY media_id ASC NULLS FIRST"""

  // q126 — perceptual IMAGE dedup gate: BMP corpus with cross-codec
  // planted duplicates (every 5th doc gets a PNG re-encode of the same
  // pixels at id+10⁷ — the real-corpus shape: the same image uploaded
  // twice through different pipelines). Three driver-checked columns:
  // the pigeonhole theorem (banded dHash pairs == brute-force Hamming
  // pairs, symmetric-diff 0), and planted recall (every cross-codec copy
  // found at distance 0 — count pinned exactly by the oracle). Background
  // near-dup-text pairs may legitimately appear in the pair set (similar
  // text → similar pixels → close dHash); neither column depends on
  // them, which is what keeps the oracle exact. doc_id % 4 slice —
  // q122's brute-force-tier rationale.
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val slice = Multimodal.rebalanceForCodec(
      Tables.load(s, dir, "documents").select("doc_id", "text")
        .filter(pmod(col("doc_id"), lit(4)) === 0))
    val corpus = slice
      .select(col("doc_id").as("media_id"), textToBmp(col("text")).as("payload"))
      .unionByName(slice.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + lit(10000000L)).as("media_id"),
          textToPng(col("text")).as("payload")))
    val sigs = Multimodal.imageDHash(corpus, "media_id", "payload")
    val banded = graft.ops.Dedup.hammingPairs(sigs, "media_id", "dhash", maxDist = 6)
      .select("idA", "idB")
    val exact = sigs.select(col("media_id").as("idA"), col("dhash").as("hA"))
      .crossJoin(broadcast(sigs.select(col("media_id").as("idB"), col("dhash").as("hB"))))
      .filter(col("idA") < col("idB") &&
        graft.ops.Dedup.hamming(col("hA"), col("hB")) <= 6)
      .select("idA", "idB")
    // ONE full-outer comparison: each decode subtree is referenced once
    // (Spark has no cross-reference reuse — three anti-join legs would
    // re-decode the corpus five times)
    exact.withColumn("__e", lit(1))
      .join(banded.withColumn("__b", lit(1)), Seq("idA", "idB"), "full_outer")
      .agg(
        count(when(col("__e").isNull || col("__b").isNull, 1)).as("set_diff"),
        count(when(col("__b") === 1 && col("idB") - col("idA") === 10000000L, 1))
          .as("planted_found"))
      .select(col("set_diff"), (col("set_diff") === 0).as("theorem_holds"),
        col("planted_found"))
  }
  private val q126Sql = """
    SELECT CAST(0 AS BIGINT) AS set_diff, TRUE AS theorem_holds,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS planted_found"""

  // q127 — perceptual image dedup from PURE JSON: the `image_dedup` node
  // key over a combine-union corpus (BMP base + cross-codec PNG copies
  // built with registered fixture UDFs — the q66 pattern for media), the
  // pair frame aggregated down to exactly-pinnable planted-recall counts
  // (filtered aggregates keep the oracle independent of legitimate
  // background near-dup-text pairs). Proves the image tier is
  // config-reachable end to end.
  private def q127(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    s.udf.register("text_to_bmp", textToBmp)
    s.udf.register("text_to_png", textToPng)
    graft.compile.Compiler.compileJson(s, """
      {"id": "imgdd",
       "combine": {"op": "union", "nodes": [
         {"id": "base", "source": {"table": "documents"},
          "filters": ["doc_id % 4 = 0"],
          "derive": {"payload": "text_to_bmp(text)"},
          "keep_columns": ["doc_id", "payload"]},
         {"id": "planted", "source": {"table": "documents"},
          "filters": ["doc_id % 20 = 0"],
          "derive": {"doc_id2": "doc_id + 10000000",
                     "payload": "text_to_png(text)"},
          "keep_columns": ["doc_id2", "payload"],
          "rename": {"doc_id2": "doc_id"}}]},
       "image_dedup": {"id_col": "doc_id", "payload_col": "payload",
                       "max_dist": 6},
       "aggregate": {"aggregations": [
         {"col": "*", "func": "count",
          "filter": "idB - idA = 10000000", "new_name": "planted_found"},
         {"col": "*", "func": "count",
          "filter": "dist = 0 and idB - idA = 10000000",
          "new_name": "planted_exact"}]}}""")
  }
  private val q127Sql = """
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS planted_found,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS planted_exact"""

  /** Audio-dedup fixture: ≥80 PCM16 samples whose magnitudes stay ≤ 8160,
    * so the planted 2×-gain twin never clips — gain invariance holds
    * EXACTLY ([[graft.ops.Codecs.audioHash64]]). `gain` scales every
    * sample; 1 = the original clip. */
  private[graft] def textToClip(gain: Int) = udf { (t: String) =>
    val b = Option(t).getOrElse(" ").getBytes("UTF-8")
    val n = 80 + b.length % 64
    val samples = Array.tabulate(n)(i =>
      (((b(i % b.length) & 0xff) * 64 - 8160) * gain).toShort)
    Codecs.encodeWav(16000, 1, samples)
  }

  // q129 — perceptual AUDIO dedup gate (the q126 pattern on the envelope
  // hash): WAV corpus with planted 2×-GAIN copies at id+10⁷ — the
  // real-corpus shape: the same clip uploaded at different volumes. The
  // pigeonhole theorem (banded == brute-force Hamming pairs) and planted
  // recall (every gain twin found at distance 0 — gain scales both sides
  // of every envelope comparison) are driver-checked; counts pinned
  // exactly by the oracle. doc_id % 4 slice, q122's rationale.
  private def q129(s: SparkSession, dir: String): DataFrame = {
    val slice = Multimodal.rebalanceForCodec(
      Tables.load(s, dir, "documents").select("doc_id", "text")
        .filter(pmod(col("doc_id"), lit(4)) === 0))
    val corpus = slice
      .select(col("doc_id").as("media_id"), textToClip(1)(col("text")).as("payload"))
      .unionByName(slice.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + lit(10000000L)).as("media_id"),
          textToClip(2)(col("text")).as("payload")))
    val sigs = Multimodal.audioDHash(corpus, "media_id", "payload")
    val banded = graft.ops.Dedup.hammingPairs(sigs, "media_id", "ahash", maxDist = 6)
      .select("idA", "idB")
    val exact = sigs.select(col("media_id").as("idA"), col("ahash").as("hA"))
      .crossJoin(broadcast(sigs.select(col("media_id").as("idB"), col("ahash").as("hB"))))
      .filter(col("idA") < col("idB") &&
        graft.ops.Dedup.hamming(col("hA"), col("hB")) <= 6)
      .select("idA", "idB")
    exact.withColumn("__e", lit(1))
      .join(banded.withColumn("__b", lit(1)), Seq("idA", "idB"), "full_outer")
      .agg(
        count(when(col("__e").isNull || col("__b").isNull, 1)).as("set_diff"),
        count(when(col("__b") === 1 && col("idB") - col("idA") === 10000000L, 1))
          .as("planted_found"))
      .select(col("set_diff"), (col("set_diff") === 0).as("theorem_holds"),
        col("planted_found"))
  }
  private val q129Sql = """
    SELECT CAST(0 AS BIGINT) AS set_diff, TRUE AS theorem_holds,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS planted_found"""

  // q130 — q129's audio dedup from PURE JSON (the q127 pattern): the
  // `audio_dedup` node key over a combine-union corpus of original +
  // gain-doubled clips, aggregated to the exactly-pinnable planted
  // recall. Proves the audio tier is config-reachable end to end.
  private def q130(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    s.udf.register("text_to_clip1", textToClip(1))
    s.udf.register("text_to_clip2", textToClip(2))
    graft.compile.Compiler.compileJson(s, """
      {"id": "auddd",
       "combine": {"op": "union", "nodes": [
         {"id": "base", "source": {"table": "documents"},
          "filters": ["doc_id % 4 = 0"],
          "derive": {"payload": "text_to_clip1(text)"},
          "keep_columns": ["doc_id", "payload"]},
         {"id": "planted", "source": {"table": "documents"},
          "filters": ["doc_id % 20 = 0"],
          "derive": {"doc_id2": "doc_id + 10000000",
                     "payload": "text_to_clip2(text)"},
          "keep_columns": ["doc_id2", "payload"],
          "rename": {"doc_id2": "doc_id"}}]},
       "audio_dedup": {"id_col": "doc_id", "payload_col": "payload",
                       "max_dist": 6},
       "aggregate": {"aggregations": [
         {"col": "*", "func": "count",
          "filter": "idB - idA = 10000000", "new_name": "planted_found"},
         {"col": "*", "func": "count",
          "filter": "dist = 0 and idB - idA = 10000000",
          "new_name": "planted_exact"}]}}""")
  }
  private val q130Sql = """
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS planted_found,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS planted_exact"""

  // q134 — the image CLUSTER tier from PURE JSON ("output": "clusters"):
  // q127's cross-codec corpus, labels instead of pairs. Three invariants
  // hold EXACTLY no matter what background near-dups exist: every row is
  // labeled (totality), every planted copy lands in a base-corpus
  // cluster (its dHash is identical to its base's, so they share a
  // component whose min id is < 10⁷), and no cluster is led by a copy
  // (every copy's component contains its smaller base id). Gates the
  // identical-signature-collapse path end to end from config.
  private def q134(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    s.udf.register("text_to_bmp", textToBmp)
    s.udf.register("text_to_png", textToPng)
    graft.compile.Compiler.compileJson(s, """
      {"id": "imgcl",
       "combine": {"op": "union", "nodes": [
         {"id": "base", "source": {"table": "documents"},
          "filters": ["doc_id % 4 = 0"],
          "derive": {"payload": "text_to_bmp(text)"},
          "keep_columns": ["doc_id", "payload"]},
         {"id": "planted", "source": {"table": "documents"},
          "filters": ["doc_id % 20 = 0"],
          "derive": {"doc_id2": "doc_id + 10000000",
                     "payload": "text_to_png(text)"},
          "keep_columns": ["doc_id2", "payload"],
          "rename": {"doc_id2": "doc_id"}}]},
       "image_dedup": {"id_col": "doc_id", "payload_col": "payload",
                       "max_dist": 6, "output": "clusters"},
       "aggregate": {"aggregations": [
         {"col": "*", "func": "count", "new_name": "total_rows"},
         {"col": "*", "func": "count",
          "filter": "id >= 10000000 and cluster < 10000000",
          "new_name": "copies_merged"},
         {"col": "*", "func": "count", "filter": "cluster >= 10000000",
          "new_name": "copy_led_clusters"}]}}""")
  }
  private val clusterGateSql = """
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 4 = 0) +
                (SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS total_rows,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 20 = 0)
                AS BIGINT) AS copies_merged,
           CAST(0 AS BIGINT) AS copy_led_clusters"""

  // q135 — the audio cluster tier from PURE JSON: q130's gain-twin
  // corpus with "output": "clusters", same three exact invariants
  // (gain-doubling never moves the envelope hash, so every twin shares
  // its base's component).
  private def q135(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    s.udf.register("text_to_clip1", textToClip(1))
    s.udf.register("text_to_clip2", textToClip(2))
    graft.compile.Compiler.compileJson(s, """
      {"id": "audcl",
       "combine": {"op": "union", "nodes": [
         {"id": "base", "source": {"table": "documents"},
          "filters": ["doc_id % 4 = 0"],
          "derive": {"payload": "text_to_clip1(text)"},
          "keep_columns": ["doc_id", "payload"]},
         {"id": "planted", "source": {"table": "documents"},
          "filters": ["doc_id % 20 = 0"],
          "derive": {"doc_id2": "doc_id + 10000000",
                     "payload": "text_to_clip2(text)"},
          "keep_columns": ["doc_id2", "payload"],
          "rename": {"doc_id2": "doc_id"}}]},
       "audio_dedup": {"id_col": "doc_id", "payload_col": "payload",
                       "max_dist": 6, "output": "clusters"},
       "aggregate": {"aggregations": [
         {"col": "*", "func": "count", "new_name": "total_rows"},
         {"col": "*", "func": "count",
          "filter": "id >= 10000000 and cluster < 10000000",
          "new_name": "copies_merged"},
         {"col": "*", "func": "count", "filter": "cluster >= 10000000",
          "new_name": "copy_led_clusters"}]}}""")
  }

  // q137 — the FLAGSHIP MULTIMODAL curation pipeline, ONE pure-JSON
  // config chaining every new pillar end to end: messy-crawl corpus
  // (re-crawled URLs + a media mirror hosting cross-codec image copies +
  // exact-content re-crawls under fresh URLs) → canonical_url dedup →
  // normalize_text + portable-fingerprint content dedup → corpus-LM
  // perplexity filter (child-join score) → perceptual image dedup on the
  // media column (clusters, keep = representative) → stratified top-k
  // sample per language. EVERY stage is mirrored exactly in the oracle:
  // URL canonicalization by hand-derivation (q128), fingerprints by the
  // q26 Horner mirror, the bigram LM by the q106 count-arithmetic mirror,
  // and the image stage via key-encoded fixtures ([[keyPixels]]:
  // dHash == mkey by THEOREM, so cluster membership is pure arithmetic —
  // no reliance on corpus-specific hash behavior). Stage wiring uses
  // top-level defs + ref sources — each stage compiles once and is
  // SHARED by its two consumers (next stage + self-join scorer child),
  // with the twice-read stages cached. Each stage demonstrably bites at
  // sf0.01: 545 → 165 (url) → 160 (fp) → 145 (lm) → 139 (image) →
  // 10/lang sampled.
  private val flagNll = "3.42"
  private def q137(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    s.udf.register("key_to_bmp", keyToBmp)
    s.udf.register("key_to_png", keyToPng)
    val union = """{"id": "u", "combine": {"op": "union", "nodes": [
      {"id": "b", "source": {"table": "documents"},
       "derive": {"mkey": "doc_id",
                  "url": "concat('HTTP://News.Example.COM:80/', source, '/item/', cast(doc_id % 40 as string), '/?utm_source=feed&z=9&a=', cast(doc_id % 3 as string), '&fbclid=track#sec')",
                  "curl": "canonical_url(url)", "fmt": "'bmp'"},
       "keep_columns": ["doc_id", "lang", "text", "mkey", "fmt", "curl"]},
      {"id": "p", "source": {"table": "documents"}, "filters": ["doc_id % 20 = 0"],
       "derive": {"doc_id2": "doc_id + 10000000", "mkey": "doc_id",
                  "url": "concat('https://Media.Mirror.NET/media/', cast(doc_id as string), '/?utm_campaign=x')",
                  "curl": "canonical_url(url)",
                  "text2": "concat(text, ' the')", "fmt": "'png'"},
       "keep_columns": ["doc_id2", "lang", "text2", "mkey", "fmt", "curl"],
       "rename": {"doc_id2": "doc_id", "text2": "text"}},
      {"id": "r", "source": {"table": "documents"}, "filters": ["doc_id % 25 = 0"],
       "derive": {"doc_id3": "doc_id + 20000000", "mkey": "doc_id + 20000000",
                  "url": "concat('http://Cache.Example.ORG:80/copy/', cast(doc_id as string), '#cached')",
                  "curl": "canonical_url(url)", "fmt": "'bmp'"},
       "keep_columns": ["doc_id3", "lang", "text", "mkey", "fmt", "curl"],
       "rename": {"doc_id3": "doc_id"}}]},
     "dedup": {"keys": ["curl"], "id_col": "doc_id"}}"""
    // Each stage is a top-level def compiled ONCE and ref'd — the cd and
    // fl stages are each consumed twice (as the next stage's source AND
    // by that stage's self-join scorer child); inlining them would
    // recompute the whole upstream per mention. cache: true materializes
    // the twice-read stages, so the corpus scans + LM train run once.
    graft.compile.Compiler.compileJson(s, s"""
      {"id": "flagship",
       "defs": [
         {"id": "cd", "cache": true, "combine": {"op": "union", "nodes": [$union]},
          "derive": {"norm": "normalize_text(text)", "fp": "doc_fingerprint_portable(norm)"},
          "dedup": {"keys": ["fp"], "id_col": "doc_id"}},
         {"id": "sc", "source": {"ref": "cd"},
          "children": [{"id": "lmn", "source": {"ref": "cd"},
                        "lm_perplexity": {"id_col": "doc_id", "text_col": "norm"},
                        "join": {"on": ["doc_id"], "how": "inner"}}]},
         {"id": "fl", "cache": true, "source": {"ref": "sc"},
          "filters": ["nll <= $flagNll"]},
         {"id": "im", "source": {"ref": "fl"},
          "children": [{"id": "imc", "source": {"ref": "fl"},
                        "derive": {"payload": "if(fmt = 'bmp', key_to_bmp(mkey), key_to_png(mkey))"},
                        "image_dedup": {"id_col": "doc_id", "payload_col": "payload",
                                        "max_dist": 0, "output": "clusters"},
                        "rename": {"id": "doc_id"},
                        "join": {"on": ["doc_id"], "how": "inner"}}]}],
       "source": {"ref": "im"},
       "filters": ["doc_id = cluster"],
       "derive": {"h": "(doc_id * 2654435761) % 1000000007"},
       "keep_columns": ["doc_id", "lang", "curl", "nll", "h"],
       "top_k": {"partition_by": ["lang"], "order_by": ["h asc", "doc_id asc"], "k": 10},
       "order_by": ["lang asc", "doc_id asc"]}""")
  }
  private val q137Sql = s"""
    WITH raw AS (
      SELECT doc_id, lang, text, doc_id AS mkey,
             'http://news.example.com/' || source || '/item/' || CAST(doc_id % 40 AS VARCHAR)
               || '?a=' || CAST(doc_id % 3 AS VARCHAR) || '&z=9' AS curl
      FROM documents
      UNION ALL
      SELECT doc_id + 10000000, lang, text || ' the', doc_id,
             'https://media.mirror.net/media/' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT doc_id + 20000000, lang, text, doc_id + 20000000,
             'http://cache.example.org/copy/' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id % 25 = 0),
    ud AS (SELECT * FROM raw
           QUALIFY ROW_NUMBER() OVER (PARTITION BY curl ORDER BY doc_id) = 1),
    nrm AS (SELECT *, trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
                       '[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g'), ' ') AS norm
            FROM ud),
    tk AS (SELECT *, list_filter(string_split_regex(trim(norm), '\\s+'),
                                 x -> len(x) > 0) AS t
           FROM nrm),
    fps AS (SELECT *, ${TextQueries.fpSql("t")} AS fp FROM tk),
    cd AS (SELECT * FROM fps
           QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
    bg AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                                  for i in generate_series(1, len(t)-1)]) AS bg
           FROM cd WHERE len(t) >= 2),
    c12 AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY 1),
    c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM cd)),
    lp AS (SELECT doc_id, ROUND(LN((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)), 6) AS lp
           FROM bg JOIN c12 USING (bg)
           JOIN c1 ON split_part(bg.bg, ' ', 1) = c1.w1 CROSS JOIN v),
    lm AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                  ROUND(-(CAST(SUM(CAST(lp AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)), 6) AS nll
           FROM lp GROUP BY 1),
    fl AS (SELECT cd.*, lm.nll FROM cd JOIN lm USING (doc_id)
           WHERE lm.nll <= $flagNll),
    keep AS (SELECT * FROM fl
             QUALIFY ROW_NUMBER() OVER (PARTITION BY mkey ORDER BY doc_id) = 1),
    smp AS (SELECT doc_id, lang, curl, nll,
                   (doc_id * 2654435761) % 1000000007 AS h,
                   ROW_NUMBER() OVER (PARTITION BY lang
                     ORDER BY (doc_id * 2654435761) % 1000000007 ASC, doc_id ASC) AS rn
            FROM keep)
    SELECT doc_id, lang, curl, nll, h, CAST(rn AS INT) AS rn
    FROM smp WHERE rn <= 10
    ORDER BY lang ASC NULLS FIRST, doc_id ASC NULLS FIRST"""

  // q124 — WAV gate: PCM16 is lossless, so original AND downsampled
  // (every 4th frame, rate floored to rate/4) amplitude stats derive
  // from the text bytes on the reference side. Closes the audio family
  // into the same q115-q117 hash-gate tier.
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.rebalanceForCodec(gateFixture(s))
      .select(col("media_id"), textToWav(col("text")).as("payload"))
    val orig = Multimodal.parseAndFeaturize(
      media, "media_id", "payload", Codecs.mediaFeatures)
    val ds = Multimodal.parseAndFeaturize(
      Multimodal.transformPayload(
        Multimodal.asMediaParsed(media, "media_id", "payload"),
        "wav", Codecs.downsampleWav(4)),
      "media_id", "payload", Codecs.mediaFeatures)
    orig.agg(
        count(lit(1)).as("n_media"),
        sum(element_at(col("features"), 3).cast("long")).as("sum_frames"),
        round(sum(chk9(element_at(col("features"), 4))), 6).cast("double").as("mean_abs_chk"),
        round(sum(chk9(element_at(col("features"), 5))), 6).cast("double").as("rms_chk"))
      .crossJoin(ds.agg(
        sum(element_at(col("features"), 3).cast("long")).as("ds_sum_frames"),
        round(sum(chk9(element_at(col("features"), 4))), 6).cast("double").as("ds_mean_abs_chk")))
  }

  // q125 — AVI gate: uncompressed DIB frames are lossless; original and
  // frame-sampled (every 2nd, fps 10 → 5) luma/motion stats derive from
  // the text bytes. Closes the video-container family into the gate tier.
  private def q125(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.rebalanceForCodec(gateFixture(s))
      .select(col("media_id"), textToAvi(col("text")).as("payload"))
    val orig = Multimodal.parseAndFeaturize(
      media, "media_id", "payload", Codecs.mediaFeatures)
    val sampled = Multimodal.parseAndFeaturize(
      Multimodal.transformPayload(
        Multimodal.asMediaParsed(media, "media_id", "payload"),
        "avi", Codecs.frameSampleAvi(2)),
      "media_id", "payload", Codecs.mediaFeatures)
    orig.agg(
        count(lit(1)).as("n_media"),
        sum(element_at(col("features"), 3).cast("long")).as("sum_frames"),
        round(sum(chk9(element_at(col("features"), 5))), 6).cast("double").as("luma_chk"),
        round(sum(chk9(element_at(col("features"), 8))), 6).cast("double").as("delta_chk"))
      .crossJoin(sampled.agg(
        sum(element_at(col("features"), 3).cast("long")).as("s_sum_frames"),
        round(sum(chk9(element_at(col("features"), 5))), 6).cast("double").as("s_luma_chk")))
  }

  // Pinned literals from `python3 tools/media_gate_ref.py` (independent
  // mirror — see the gate block comment above). Regenerate there if the
  // fixture or feature definitions ever change.
  private val q115Sql = """
    SELECT CAST(60 AS BIGINT) AS n_media,
           CAST(490 AS BIGINT) AS sum_w,
           CAST(367 AS BIGINT) AS sum_h,
           CAST(20.08923 AS DOUBLE) AS mean_r_chk,
           CAST(19.53111 AS DOUBLE) AS mean_luma_chk,
           CAST(19.448168 AS DOUBLE) AS rz_luma_chk"""
  private val q116Sql = """
    SELECT CAST(60 AS BIGINT) AS n_media,
           CAST(490 AS BIGINT) AS sum_w,
           CAST(367 AS BIGINT) AS sum_h,
           CAST(20.079825 AS DOUBLE) AS mean_r_chk,
           CAST(19.543751 AS DOUBLE) AS mean_luma_chk,
           CAST(19.454346 AS DOUBLE) AS rz_luma_chk"""
  private val q117Sql = """
    SELECT CAST(60 AS BIGINT) AS n_media,
           CAST(198 AS BIGINT) AS sum_frames,
           CAST(31.870294 AS DOUBLE) AS luma_chk,
           CAST(0.101556 AS DOUBLE) AS delta_chk,
           CAST(112 AS BIGINT) AS s_sum_frames,
           CAST(31.86052 AS DOUBLE) AS s_luma_chk"""
  private val q124Sql = """
    SELECT CAST(60 AS BIGINT) AS n_media,
           CAST(1876 AS BIGINT) AS sum_frames,
           CAST(42.053996 AS DOUBLE) AS mean_abs_chk,
           CAST(44.17707 AS DOUBLE) AS rms_chk,
           CAST(489 AS BIGINT) AS ds_sum_frames,
           CAST(39.608103 AS DOUBLE) AS ds_mean_abs_chk"""
  private val q125Sql = """
    SELECT CAST(60 AS BIGINT) AS n_media,
           CAST(338 AS BIGINT) AS sum_frames,
           CAST(19.25402 AS DOUBLE) AS luma_chk,
           CAST(0.420754 AS DOUBLE) AS delta_chk,
           CAST(182 AS BIGINT) AS s_sum_frames,
           CAST(19.324924 AS DOUBLE) AS s_luma_chk"""

  // q151 — content-type ROUTING over a crawl-shaped payload column: ten
  // formats by doc_id mod 10 (seven real media fixtures + gzip + an HTML
  // page + plain text), one sniff sweep, exact dispatch oracle. The
  // label set is what a post-WARC router branches on; media labels come
  // from the codecs' own readiness predicates, so "image/png" implies
  // the PNG decoder accepts the header.
  private def q151(s: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(10))
    graft.Tables.load(s, dir, "documents").select("doc_id", "text")
      .select(col("doc_id"),
        when(m === 0, textToBmp(col("text")))
          .when(m === 1, textToPng(col("text")))
          .when(m === 2, textToJpeg(col("text")))
          .when(m === 3, textToGif(col("text")))
          .when(m === 4, textToWav(col("text")))
          .when(m === 5, textToMp3(col("text")))
          .when(m === 6, textToMp4(col("text")))
          .when(m === 7, graft.functions.GzipKernels.gzipCompress(
            col("text").cast("binary")))
          .when(m === 8, concat(lit("<html><body><p>"), col("text"),
            lit("</p></body></html>")).cast("binary"))
          .otherwise(col("text").cast("binary")).as("payload"))
      .select(col("doc_id"),
        graft.functions.SniffKernels.sniffMime(col("payload")).as("mime"))
      .orderBy(col("doc_id").asc_nulls_first)
  }
  private val q151Sql = """
    SELECT doc_id,
           CASE doc_id % 10
             WHEN 0 THEN 'image/bmp'    WHEN 1 THEN 'image/png'
             WHEN 2 THEN 'image/jpeg'   WHEN 3 THEN 'image/gif'
             WHEN 4 THEN 'audio/wav'    WHEN 5 THEN 'audio/mpeg'
             WHEN 6 THEN 'video/mp4'    WHEN 7 THEN 'application/gzip'
             WHEN 8 THEN 'text/html'    ELSE 'text/plain' END AS mime
    FROM documents ORDER BY doc_id ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q37_multimodal_featurize", q37, Some(q37Sql)),
    Q("q89_image_resize", q89, Some(q89Sql)),
    Q("q94_png_resize", q94, Some(q94Sql)),
    Q("q100_config_featurize", q100, Some(q100Sql)),
    Q("q112_corrupt_policy", q112, Some(q112Sql)),
    Q("q115_png_feature_gate", q115, Some(q115Sql)),
    Q("q116_jpeg_feature_gate", q116, Some(q116Sql)),
    Q("q117_gif_feature_gate", q117, Some(q117Sql)),
    Q("q119_mp3_stream_stats", q119, Some(q119Sql)),
    Q("q120_mp4_container_stats", q120, Some(q120Sql)),
    Q("q121_mixed_media_lake", q121, Some(q121Sql)),
    Q("q124_wav_feature_gate", q124, Some(q124Sql)),
    Q("q125_avi_feature_gate", q125, Some(q125Sql)),
    Q("q126_image_dedup_gate", q126, Some(q126Sql)),
    Q("q127_config_image_dedup", q127, Some(q127Sql)),
    Q("q129_audio_dedup_gate", q129, Some(q129Sql)),
    Q("q130_config_audio_dedup", q130, Some(q130Sql)),
    Q("q134_config_image_clusters", q134, Some(clusterGateSql)),
    Q("q135_config_audio_clusters", q135, Some(clusterGateSql)),
    Q("q137_multimodal_flagship", q137, Some(q137Sql)),
    Q("q151_sniff_mime_routing", q151, Some(q151Sql)),
    Q("q188_tar_shard_roundtrip", q188, Some(q188Sql)),
    Q("q189_config_wds_samples", q189, Some(q189Sql)),
    Q("q216_tar_compact", q216, Some(q216Sql))
  )

  // q188 — WebDataset tar sharding, gated end to end THROUGH THE BYTES:
  // pack every document into 4 deterministic tar shards, REPARSE the
  // archives, and report per shard the member count, payload bytes, and
  // fingerprint sums of the reparsed names AND text — so the builder,
  // the parser, the shard assignment, and the content round-trip are
  // all under one exact oracle (which recomputes everything from
  // arithmetic: shard = portable fp of the sample key mod 4, tar size =
  // Σ(512 + ⌈size/512⌉·512) + 1024 rounded up to the 10240 record).
  /** Single-token Horner fingerprint of a no-whitespace string expr. */
  private def hornerSql(x: String): String = s"""
    list_reduce(
      list_prepend(CAST(7 AS BIGINT),
        list_transform(range(1, len($x) + 1),
          i -> CAST(ascii($x[i]) AS BIGINT))),
      (a, c) -> (a * 131 + c) % 1000000007)"""
  private def q188(s: SparkSession, dir: String): DataFrame = {
    val named = Tables.load(s, dir, "documents").select(
      concat(lit("doc-"), col("doc_id"), lit(".txt")).as("name"),
      col("text").cast("binary").as("payload"))
    graft.ops.Tar.tarShards(named, "name", "payload", shards = 4)
      .select(col("shard"), col("n_members"), col("tar_bytes"),
        explode(graft.functions.TarKernels.tarMembers(col("tar"))).as("__m"))
      .groupBy("shard", "n_members", "tar_bytes")
      .agg(
        count(lit(1)).cast("int").as("n_reparsed"),
        sum(octet_length(col("__m.data"))).as("payload_bytes"),
        sum(graft.functions.TextKernels
          .portableFingerprint(col("__m.name"))).as("name_fp_sum"),
        sum(graft.functions.TextKernels
          .portableFingerprint(col("__m.data").cast("string"))).as("text_fp_sum"))
      .orderBy(col("shard").asc_nulls_first)
  }
  private val q188Sql = s"""
    WITH m AS (
      SELECT doc_id, text,
             'doc-' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
             'doc-' || CAST(doc_id AS VARCHAR) AS skey,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    f AS (
      SELECT CAST(${hornerSql("skey")} % 4 AS INT) AS shard,
             name, strlen(text) AS sz,
             ${hornerSql("name")} AS name_fp,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(t, tok -> ${hornerSql("tok")})),
               (a, h) -> (a * 31 + h) % 1000000007) AS text_fp
      FROM m)
    SELECT shard,
           CAST(COUNT(*) AS INT) AS n_members,
           CAST(((1024 + SUM(512 + CAST(CEIL(sz / 512.0) * 512 AS BIGINT))
                  + 10239) // 10240) * 10240 AS BIGINT) AS tar_bytes,
           CAST(COUNT(*) AS INT) AS n_reparsed,
           CAST(SUM(sz) AS BIGINT) AS payload_bytes,
           CAST(SUM(name_fp) AS BIGINT) AS name_fp_sum,
           CAST(SUM(text_fp) AS BIGINT) AS text_fp_sum
    FROM f GROUP BY shard ORDER BY shard ASC NULLS FIRST"""

  // q189 — WebDataset SAMPLE grouping from PURE JSON: every doc
  // contributes a .txt and a .cls member (two source branches unioned by
  // the combine key), wds grouping must reunite them per sample with
  // both extensions and the summed payload bytes. Exact arithmetic
  // oracle.
  private def q189(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"combine": {"op": "union", "nodes": [
         {"id": "txt", "source": {"table": "documents"},
          "derive": {"name": "concat('s', doc_id, '.txt')",
                     "data": "cast(text as binary)"},
          "keep_columns": ["name", "data"]},
         {"id": "cls", "source": {"table": "documents"},
          "derive": {"name": "concat('s', doc_id, '.cls')",
                     "data": "cast(lang as binary)"},
          "keep_columns": ["name", "data"]}]},
       "wds_samples": {"name_col": "name", "data_col": "data"},
       "order_by": ["sample_key asc"]}""")
  }
  private val q189Sql = """
    SELECT 's' || CAST(doc_id AS VARCHAR) AS sample_key,
           CAST(2 AS INT) AS n_files,
           'cls,txt' AS exts,
           CAST(strlen(text) + strlen(lang) AS BIGINT) AS payload_bytes
    FROM documents ORDER BY sample_key ASC NULLS FIRST"""

  // q216 — SHARD-SET COMPACTION from PURE JSON, gated through the bytes:
  // a simulated two-batch tar_pack_ingest history (batch 0 packs the
  // even docs; batch 1 packs the odds PLUS a corrected re-emit of every
  // doc_id % 10 = 0 with ' v2' appended) is unioned and re-packed by the
  // root `tar_compact` key into 4 archives with batch_id last-writer-
  // wins. The reparse aggregate then proves, per compacted shard, that
  // (a) every doc appears exactly once, (b) the % 10 = 0 docs carry the
  // BATCH-1 payload, and (c) archive sizes match the tar arithmetic —
  // builder, member dedup, and re-pack all under one exact oracle.
  private def q216(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "b0", "source": {"table": "documents"},
          "filters": ["doc_id % 2 = 0"],
          "derive": {"name": "concat('doc-', doc_id, '.txt')",
                     "payload": "cast(text as binary)"},
          "keep_columns": ["name", "payload"],
          "tar_pack": {"name_col": "name", "payload_col": "payload", "shards": 3},
          "with_columns": {"batch_id": "0"}},
         {"id": "b1", "source": {"table": "documents"},
          "filters": ["doc_id % 2 = 1 or doc_id % 10 = 0"],
          "derive": {"name": "concat('doc-', doc_id, '.txt')",
                     "payload": "cast(case when doc_id % 10 = 0 then concat(text, ' v2') else text end as binary)"},
          "keep_columns": ["name", "payload"],
          "tar_pack": {"name_col": "name", "payload_col": "payload", "shards": 3},
          "with_columns": {"batch_id": "1"}}],
       "combine": {"op": "union", "nodes": [
         {"id": "h0", "source": {"ref": "b0"}},
         {"id": "h1", "source": {"ref": "b1"}}]},
       "tar_compact": {"tar_col": "tar", "shards": 4, "batch_col": "batch_id"}}""")
      .select(col("shard"), col("n_members"), col("tar_bytes"),
        explode(graft.functions.TarKernels.tarMembers(col("tar"))).as("__m"))
      .groupBy("shard", "n_members", "tar_bytes")
      .agg(
        count(lit(1)).cast("int").as("n_reparsed"),
        sum(octet_length(col("__m.data"))).as("payload_bytes"),
        sum(graft.functions.TextKernels
          .portableFingerprint(col("__m.name"))).as("name_fp_sum"),
        sum(graft.functions.TextKernels
          .portableFingerprint(col("__m.data").cast("string"))).as("text_fp_sum"))
      .orderBy(col("shard").asc_nulls_first)
  }
  private val q216Sql = s"""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END AS payload,
             'doc-' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
             'doc-' || CAST(doc_id AS VARCHAR) AS skey
      FROM documents),
    tok AS (
      SELECT doc_id, name, skey, payload,
             list_filter(string_split_regex(trim(payload), '\\s+'),
                         x -> len(x) > 0) AS t
      FROM m),
    f AS (
      SELECT CAST(${hornerSql("skey")} % 4 AS INT) AS shard,
             strlen(payload) AS sz,
             ${hornerSql("name")} AS name_fp,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(t, tok -> ${hornerSql("tok")})),
               (a, h) -> (a * 31 + h) % 1000000007) AS text_fp
      FROM tok)
    SELECT shard,
           CAST(COUNT(*) AS INT) AS n_members,
           CAST(((1024 + SUM(512 + CAST(CEIL(sz / 512.0) * 512 AS BIGINT))
                  + 10239) // 10240) * 10240 AS BIGINT) AS tar_bytes,
           CAST(COUNT(*) AS INT) AS n_reparsed,
           CAST(SUM(sz) AS BIGINT) AS payload_bytes,
           CAST(SUM(name_fp) AS BIGINT) AS name_fp_sum,
           CAST(SUM(text_fp) AS BIGINT) AS text_fp_sum
    FROM f GROUP BY shard ORDER BY shard ASC NULLS FIRST"""
}
