package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WebDataset-style tar sharding — the training-output container layer
  * (see [[graft.functions.TarOps]] for the byte-level kernels).
  *
  * The loader-side convention these shards feed: a shard is one tar, a
  * sample is every member sharing a name up to its last extension
  * (`000123.jpg` + `000123.txt` + `000123.json` = one sample), and
  * dataloaders stream shards sequentially in parallel. The packing side
  * must therefore be DETERMINISTIC (retry-stable shard bytes), keep a
  * sample's members adjacent, and spread samples evenly across shards.
  */
object Tar {

  /** Pack (name, payload) rows into per-shard tar blobs. Shard
    * assignment is the portable fingerprint of the SAMPLE KEY (name up
    * to the last '.'), so all of a sample's members land in one shard —
    * and the assignment is engine-reproducible arithmetic, not
    * partition-dependent. Members sort by name within a shard (unique
    * names assumed — the WebDataset contract), so the archive bytes are
    * a pure function of the member set.
    *
    * Returns (shard, tar, n_members, tar_bytes). Scale: one shuffle
    * (the groupBy); a shard's members must fit an executor (the same
    * contract as a WebDataset shard itself — size `shards` so shards
    * land at the usual 100 MB–1 GB). The kernel builds each archive in
    * one pass; `.write.partitionBy("shard")` is the deployment shape.
    */
  def tarShards(
      df: DataFrame,
      nameCol: String,
      payloadCol: String,
      shards: Int
  ): DataFrame = {
    require(shards >= 1, s"tarShards: shards must be >= 1, got $shards")
    val key = sampleKey(col(nameCol))
    df.select(
        pmod(graft.functions.TextKernels.portableFingerprint(key),
          lit(shards.toLong)).cast("int").as("shard"),
        struct(col(nameCol).cast("string").as("name"),
          col(payloadCol).cast("binary").as("data")).as("__m"))
      .groupBy(col("shard"))
      .agg(sort_array(collect_list(col("__m"))).as("__ms"))
      .select(col("shard"),
        graft.functions.TarKernels.tarPack(col("__ms")).as("tar"),
        size(col("__ms")).as("n_members"))
      .withColumn("tar_bytes", octet_length(col("tar")).cast("long"))
  }

  /** COMPACT a landed shard set: explode every archive in `packed`
    * (e.g. a `tar_pack_ingest` output dir — one small shard set per
    * micro-batch forever) back into members and re-pack to `shards`
    * archives with the same sample-key cohesion as [[tarShards]]. The
    * offline maintenance pass a long-running ingest needs so the
    * training loader reads N big archives instead of thousands of
    * per-batch slivers.
    *
    * `batchCol` (e.g. the ingest's `batch_id`) turns duplicate member
    * NAMES across batches into last-writer-wins: the copy from the
    * highest batch survives — a corrected re-emit supersedes the
    * original, and re-compaction over an already-compacted set is
    * idempotent. Without it, duplicate names are kept verbatim (the
    * WebDataset unique-name contract is the caller's).
    *
    * Scale: the explode is archive-shaped (each tar inflates in one
    * task — the same fits-an-executor contract the packer had); the
    * optional dedup is ONE member-shaped max-aggregate (map-side
    * combine); re-packing is [[tarShards]]'s one shuffle. History is
    * read once, never per batch. */
  def tarCompact(
      packed: DataFrame,
      tarCol: String,
      shards: Int,
      batchCol: Option[String] = None
  ): DataFrame = {
    require(shards >= 1, s"tarCompact: shards must be >= 1, got $shards")
    batchCol.foreach { b =>
      require(packed.columns.contains(b),
        s"tarCompact: batch column '$b' not found " +
          s"(columns: ${packed.columns.mkString(", ")})")
    }
    val members = packed
      .select(
        batchCol.map(col(_).cast("long")).getOrElse(lit(0L)).as("__b"),
        explode(graft.functions.TarKernels.tarMembers(
          col(tarCol).cast("binary"))).as("__m"))
      .select(col("__b"), col("__m.name").as("name"),
        col("__m.data").as("data"))
    val latest = batchCol match {
      case Some(_) =>
        // max over (batch, data) structs: highest batch wins; a same-batch
        // name collision resolves by payload bytes — deterministic either
        // way, so the compacted archive bytes are replay-stable.
        members.groupBy(col("name"))
          .agg(max(struct(col("__b"), col("data"))).as("__w"))
          .select(col("name"), col("__w.data").as("data"))
      case None => members.select(col("name"), col("data"))
    }
    tarShards(latest, "name", "data", shards)
  }

  /** `name` up to its last '.' (the WebDataset sample key); names
    * without an extension are their own key. */
  def sampleKey(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(name.contains("."),
      regexp_replace(name, "\\.[^.]*$", "")).otherwise(name)

  /** Extension after the last '.' ('' when there is none). */
  def sampleExt(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(name.contains("."),
      regexp_extract(name, "\\.([^.]*)$", 1)).otherwise(lit(""))

  /** Group member rows (name, data) into WebDataset SAMPLES: one row
    * per key with the member extensions (sorted), file count, and total
    * payload bytes — the loader-side view of a shard, and the
    * completeness check a packing pipeline runs (every sample must
    * carry the same extension set). One shuffle, keyed by sample. */
  def wdsSamples(
      members: DataFrame,
      nameCol: String,
      dataCol: String
  ): DataFrame =
    members.select(
        sampleKey(col(nameCol)).as("sample_key"),
        sampleExt(col(nameCol)).as("__ext"),
        octet_length(col(dataCol)).cast("long").as("__sz"))
      .groupBy(col("sample_key"))
      .agg(
        count(lit(1)).cast("int").as("n_files"),
        array_join(sort_array(collect_list(col("__ext"))), ",").as("exts"),
        sum(col("__sz")).as("payload_bytes"))
}
