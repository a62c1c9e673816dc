package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star): image/audio/video payloads are
  * opaque `BinaryType` columns plus a typed metadata struct; decode /
  * feature-extract runs batch-wise per partition.
  *
  * Decode is REAL for BMP (24-bit), PNG (8-bit, DEFLATE + row filters),
  * JPEG (baseline DCT — [[Jpeg]]), WAV (PCM16) and AVI (DIB frames) via
  * the pure-JVM [[Codecs]] — header-parsed metadata, pixel/sample
  * feature extraction, bit-reproducible outputs. Formats needing native
  * libraries (MP3, MP4 — not present in this environment) plug into the
  * same `decoder` seam; until then they fall back to `decodeStub`, a
  * deterministic fake keyed on the payload bytes.
  *
  * Scale notes: payload bytes never shuffle (all derivations are
  * narrow/map-side); metadata-only queries prune the binary column at the
  * parquet scan, so "SELECT width, height" never reads pixels.
  */
object Multimodal {

  /** Metadata schema carried next to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a table into the media shape: (id, meta struct, payload binary).
    * In production the payload column comes straight from parquet/blob
    * storage; here any string column stands in as bytes. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      struct(
        lit("bin").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        length(col(payloadCol)).cast("long").as("n_bytes")).as("meta"),
      col(payloadCol).cast("binary").as("payload"))

  /** Media wrap with REAL header-parsed metadata: format sniffed from the
    * payload signature and width/height decoded from the header (BMP:
    * pixel dims; WAV: frames × channels) via [[Codecs.parseMeta]]. The
    * parse is a scalar UDF — justified here because it reads a fixed
    * ~54-byte prefix per row (no per-row codec init to amortize, unlike
    * [[featurize]]'s partition batching) and runs once in the same scan
    * projection that already holds the payload bytes. */
  def asMediaParsed(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val metaUdf = udf { (p: Array[Byte]) =>
      val (fmt, w, h) = Codecs.parseMeta(if (p == null) Array.emptyByteArray else p)
      MediaMeta(fmt, w, h, if (p == null) 0L else p.length.toLong)
    }
    df.select(
      col(idCol).as("media_id"),
      metaUdf(col(payloadCol).cast("binary")).as("meta"),
      col(payloadCol).cast("binary").as("payload"))
  }

  /** STUB for the real decoder (???): a deterministic fake "feature
    * extractor" — 8 floats derived from evenly-spaced payload bytes.
    * The default `decoder` for [[featurize]]; swap in the actual codec
    * (JNI/lib) call via the injection seam — the partition batching,
    * signature, and output schema are the production shape. As of round
    * 8 this is the fallback for OPAQUE formats only: BMP/PNG/JPEG/GIF/
    * WAV/AVI decode for real, and MP4/MP3 get real container/stream-layer
    * parsing ([[Mp4]]/[[Mp3]]) — the remaining seam is compressed SAMPLE
    * decode (H.264/AAC/Layer-III audio), which needs a codec library. */
  def decodeStub(payload: Array[Byte]): Array[Float] =
    if (payload == null || payload.isEmpty) Array.fill(8)(0.0f)
    else {
      val n = payload.length
      Array.tabulate(8)(i => (payload(math.min((i * n) / 8, n - 1)) & 0xff) / 255.0f)
    }

  /** Partition-wise featurize: iterates each partition once (the iterator
    * is where a real implementation amortizes codec/model init per batch,
    * exactly like a pandas-UDF batch), emitting (media_id, features).
    * Narrow — no shuffle; parallelism = input partitions.
    *
    * `decoder` is the injection seam: any serializable
    * `Array[Byte] => Array[Float]` (the real codec in production, the
    * deterministic [[decodeStub]] by default). `init` runs ONCE per
    * partition before the first row — codec/model warm-up whose cost is
    * amortized over the whole batch, the reason this is mapPartitions and
    * not a per-row expression. */
  def featurize(media: DataFrame,
      decoder: Array[Byte] => Array[Float] = decodeStub,
      init: () => Unit = () => ()): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out: Dataset[(Long, Array[Float])] = media
      .select(col("media_id").cast("long"), col("payload"))
      .as(enc)
      .mapPartitions { it =>
        init() // once per partition, before any payload is touched
        // same null contract as transformPayload: injected codecs see a
        // (possibly empty) byte array, never null
        it.map { case (id, payload) =>
          (id, decoder(if (payload == null) Array.emptyByteArray else payload))
        }
      }(Encoders.tuple(Encoders.scalaLong, ExpressionEncoder[Array[Float]]()))
    out.toDF("media_id", "features")
  }

  /** Corrupt-payload policy for the decode stages. At 100 TB a real
    * corpus always contains truncated/mislabeled payloads; one of them
    * must not kill a thousand-executor job, and silently mis-decoding is
    * worse. `Fail` rethrows (the default — right for curated fixtures),
    * `Null` emits the row with format "err" and null features so the
    * damage is countable downstream, `Skip` drops the row. */
  sealed trait OnError
  object OnError {
    case object Fail extends OnError
    case object Null extends OnError
    case object Skip extends OnError
  }

  /** One-pass header parse + featurize: (media_id, meta, features) from a
    * SINGLE sweep over the payload column. The parse→featurize→equi-join
    * composition this replaces executes the payload-producing subtree
    * TWICE (the join's two inputs are separate plans — Spark has no
    * common-subexpression reuse across join sides) and then shuffles both
    * — for outputs that are row-aligned by construction. Zero shuffles,
    * one decode, meta and features from the same bytes. Same injection
    * seam and per-partition `init` amortization as [[featurize]];
    * `onError` picks the corrupt-payload policy (decoder exceptions are
    * data errors, not bugs — a truncated JPEG throws). */
  def parseAndFeaturize(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      decoder: Array[Byte] => Array[Float] = decodeStub,
      init: () => Unit = () => (),
      onError: OnError = OnError.Fail
  ): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(enc)
      .mapPartitions { it =>
        init()
        val rows = it.map { case (id, p0) =>
          val p = if (p0 == null) Array.emptyByteArray else p0
          try {
            val (fmt, w, h) = Codecs.parseMeta(p)
            (id, MediaMeta(fmt, w, h, p.length.toLong), decoder(p))
          } catch {
            case scala.util.control.NonFatal(e) => onError match {
              case OnError.Fail =>
                throw new IllegalArgumentException(
                  s"media_id $id: undecodable payload (${e.getMessage})", e)
              case OnError.Null =>
                (id, MediaMeta("err", 0, 0, p.length.toLong), null)
              case OnError.Skip => null
            }
          }
        }
        if (onError == OnError.Skip) rows.filter(_ != null) else rows
      }(Encoders.tuple(Encoders.scalaLong,
        ExpressionEncoder[MediaMeta](), ExpressionEncoder[Array[Float]]()))
      .toDF("media_id", "meta", "features")
  }

  /** Perceptual image fingerprints: (media_id, dhash) — a 64-bit
    * difference hash ([[Codecs.dHash64]]) from the decoded pixels of each
    * payload (BMP/PNG/JPEG/GIF sniffed; non-images are data errors under
    * `onError`). Partition-batched like [[featurize]] — decode is the
    * cost, the hash is 72 integer lumas. Run it after a parse/policy pass
    * when the corpus may carry corrupt payloads, or pick `OnError.Skip`
    * here. */
  def imageDHash(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      onError: OnError = OnError.Fail
  ): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(enc)
      .mapPartitions { it =>
        val rows = it.map { case (id, p0) =>
          val p = if (p0 == null) Array.emptyByteArray else p0
          try (id, java.lang.Long.valueOf(Codecs.dHash64(Codecs.decodeImage(p))))
          catch {
            case scala.util.control.NonFatal(e) => onError match {
              case OnError.Fail =>
                throw new IllegalArgumentException(
                  s"media_id $id: undecodable image payload (${e.getMessage})", e)
              case OnError.Null => (id, null: java.lang.Long)
              case OnError.Skip => null
            }
          }
        }
        if (onError == OnError.Skip) rows.filter(_ != null) else rows
      }(Encoders.tuple(Encoders.scalaLong, Encoders.LONG))
      .toDF("media_id", "dhash")
  }

  /** Perceptual near-duplicate image pairs: dHash each payload, then
    * pigeonhole-banded Hamming pairs within `maxDist`
    * ([[Dedup.hammingPairs]] — candidates ∝ chunk collisions, never n²).
    * The pixel-level sibling of embedding near-dup: catches re-encodes,
    * brightness shifts and thumbnails of the same image without a model
    * in the loop. Returns (idA, idB, dist). */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxDist: Int = 6,
      onError: OnError = OnError.Fail
  ): DataFrame =
    Dedup.hammingPairs(
      imageDHash(df, idCol, payloadCol, onError), "media_id", "dhash", maxDist)

  /** Cluster-output tier of [[imageNearDupPairs]]: dHash each payload,
    * collapse identical fingerprints, connected components over the
    * distinct-signature Hamming graph ([[Dedup.hammingClusters]]).
    * Returns (id, cluster), cluster = min media_id in the near-dup class —
    * the scale-native shape for duplicate-heavy image corpora (a spacer
    * GIF re-encoded 10M times is one CC node, never 5·10¹³ pairs). Keep =
    * rows where id == cluster, mirroring the text pipeline's q45/q53
    * min-id representative convention. */
  def imageNearDupClusters(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxDist: Int = 6,
      onError: OnError = OnError.Fail,
      checkpointDir: Option[String] = None
  ): DataFrame =
    Dedup.hammingClusters(
      imageDHash(df, idCol, payloadCol, onError), "media_id", "dhash",
      maxDist, checkpointDir)

  /** Perceptual audio fingerprints: (media_id, ahash) — the 64-bit
    * envelope hash ([[Codecs.audioHash64]]) of each WAV payload's decoded
    * PCM. Same batching/policy contract as [[imageDHash]]. */
  def audioDHash(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      onError: OnError = OnError.Fail
  ): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(enc)
      .mapPartitions { it =>
        val rows = it.map { case (id, p0) =>
          val p = if (p0 == null) Array.emptyByteArray else p0
          try (id, java.lang.Long.valueOf(Codecs.audioHash64(Codecs.decodeWav(p))))
          catch {
            case scala.util.control.NonFatal(e) => onError match {
              case OnError.Fail =>
                throw new IllegalArgumentException(
                  s"media_id $id: undecodable audio payload (${e.getMessage})", e)
              case OnError.Null => (id, null: java.lang.Long)
              case OnError.Skip => null
            }
          }
        }
        if (onError == OnError.Skip) rows.filter(_ != null) else rows
      }(Encoders.tuple(Encoders.scalaLong, Encoders.LONG))
      .toDF("media_id", "ahash")
  }

  /** Perceptual near-duplicate audio pairs: envelope-hash each payload,
    * then pigeonhole-banded Hamming pairs within `maxDist` — catches
    * re-encodes and gain-adjusted copies of the same clip. Returns
    * (idA, idB, dist). */
  def audioNearDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxDist: Int = 6,
      onError: OnError = OnError.Fail
  ): DataFrame =
    Dedup.hammingPairs(
      audioDHash(df, idCol, payloadCol, onError), "media_id", "ahash", maxDist)

  /** Cluster-output tier of [[audioNearDupPairs]] — see
    * [[imageNearDupClusters]]. Returns (id, cluster). */
  def audioNearDupClusters(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxDist: Int = 6,
      onError: OnError = OnError.Fail,
      checkpointDir: Option[String] = None
  ): DataFrame =
    Dedup.hammingClusters(
      audioDHash(df, idCol, payloadCol, onError), "media_id", "ahash",
      maxDist, checkpointDir)

  /** Round-robin rebalance ahead of a CPU-bound codec stage. Partition
    * count follows `spark.sql.shuffle.partitions` — the cluster's chosen
    * width — NOT the input's file layout: a handful of large parquet
    * files otherwise serializes decode onto a handful of tasks while the
    * rest of the cluster idles. Call it on the SMALL frame (ids + source
    * column, pre-synthesis/pre-decode) so the shuffle moves references,
    * not pixels; skip it when the scan already has ≥ width partitions. */
  def rebalanceForCodec(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)

  /** Payload→payload transform (resize, transcode, frame-sample…): same
    * partition-batching shape as [[featurize]] but emits a new media row
    * with updated metadata. `op` is the injectable codec step — stubbed
    * here (no media libs in this environment); the identity default keeps
    * the plumbing testable. Narrow: payloads never shuffle. */
  def transformPayload(
      media: DataFrame,
      format: String,
      op: Array[Byte] => Array[Byte] = identity,
      init: () => Unit = () => (),
      onError: OnError = OnError.Fail
  ): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id").cast("long"), col("payload"))
      .as(enc)
      .mapPartitions { it =>
        init()
        val rows = it.map { case (id, p0) =>
          val p = if (p0 == null) Array.emptyByteArray else p0
          try (id, op(p))
          catch {
            case scala.util.control.NonFatal(e) => onError match {
              case OnError.Fail =>
                throw new IllegalArgumentException(
                  s"media_id $id: payload transform failed (${e.getMessage})", e)
              case OnError.Null => (id, Array.emptyByteArray) // countable: n_bytes 0
              case OnError.Skip => null
            }
          }
        }
        if (onError == OnError.Skip) rows.filter(_ != null) else rows
      }(enc)
    out.toDF("media_id", "payload")
      .select(
        col("media_id"),
        struct(
          lit(format).as("format"),
          lit(0).as("width"),
          lit(0).as("height"),
          length(col("payload")).cast("long").as("n_bytes")).as("meta"),
        col("payload"))
  }

  /** STUB frame-sampler (???): every `stride`-th byte stands in for every
    * N-th video frame — the real implementation plugs a demuxer into the
    * same `transformPayload` seam. */
  def frameSampleStub(stride: Int)(payload: Array[Byte]): Array[Byte] =
    payload.grouped(stride).map(_.head).toArray

  private def ExpressionEncoder[T: scala.reflect.runtime.universe.TypeTag]() =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[T]()
}

/** Parsed header metadata row (mirrors [[Multimodal.mediaMetaSchema]]). */
final case class MediaMeta(format: String, width: Int, height: Int, n_bytes: Long)
