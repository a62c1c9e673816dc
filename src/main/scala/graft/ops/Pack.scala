package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence assembly — the last mile between tokenized
  * documents and what a language-model trainer actually consumes.
  *
  * A training batch is not a document: it is a FIXED-LENGTH row of token
  * ids, assembled by concatenating documents (separated by an EOS token)
  * and slicing the stream every `seqLen` tokens, so no step wastes pad
  * positions. The reference stops at per-document id files
  * (`Optimus/megatron.py`'s consumers do this step outside the engine);
  * here it is a declarative operator, so the whole path — corpus →
  * curation → tokenizer → PACKED SEQUENCES — is one plan.
  */
object Pack {

  /** Pack per-document id arrays into fixed-length training sequences.
    *
    * Semantics: within each shard (deterministic assignment — integral
    * ids by `pmod(id, shards)`, strings by the portable fingerprint mod
    * `shards`, the tarShards arithmetic), documents concatenate in
    * ascending `idCol` order, each followed by one `eosId`; the stream
    * slices into consecutive `seqLen`-token windows. `dropLast` (default)
    * discards each shard's final partial window — a trainer wants only
    * full rows; `dropLast = false` keeps it (shorter `ids`).
    *
    * Output: `(shard, seq, ids, n_tokens)` — `seq` is the 0-based window
    * index within the shard, `ids` the `array<int>` row.
    *
    * Determinism: the concatenation order is (shard, id) — total given
    * distinct ids — and every arithmetic step is integer, so shard
    * bytes replay exactly under retries (the tarShards posture).
    *
    * Scale: one shuffle to the shard (the window partition), one
    * token-shaped shuffle to (shard, seq) for window assembly — the
    * postings-table budget. The running offset is a per-shard window
    * scan: each shard's token stream passes ONE task, so size `shards`
    * the way you size WebDataset shards (a few hundred MB of tokens
    * each) and the pack parallelizes shard-wide; there is no global
    * sort and no driver state. Batch-only (the offset window needs the
    * shard's full extent).
    */
  def sequencePack(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      seqLen: Int,
      eosId: Int = 0,
      shards: Int = 1,
      dropLast: Boolean = true
  ): DataFrame = {
    require(seqLen >= 2, s"sequencePack: seq_len must be >= 2, got $seqLen")
    require(shards >= 1, s"sequencePack: shards must be >= 1, got $shards")
    require(eosId >= 0, s"sequencePack: eos_id must be >= 0, got $eosId")
    import org.apache.spark.sql.types._
    val shard: Column = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        pmod(col(idCol).cast("long"), lit(shards.toLong)).cast("int")
      case StringType =>
        pmod(graft.functions.TextKernels.portableFingerprint(col(idCol)),
          lit(shards.toLong)).cast("int")
      case t => throw new IllegalArgumentException(
        s"sequencePack: id column '$idCol' has type ${t.simpleString}; " +
          "only integral and string ids shard deterministically")
    }
    val withEos = df.select(shard.as("__sh"), col(idCol).as("__id"),
      concat(col(idsCol).cast("array<int>"), array(lit(eosId))).as("__ids"))
    // running token offset of each doc within its shard: window scan in
    // (shard, id) order — the only stage that sees a shard serially
    val w = Window.partitionBy(col("__sh")).orderBy(col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = withEos
      .withColumn("__off", coalesce(sum(size(col("__ids")).cast("long")).over(w), lit(0L)))
    // token rows → (shard, window, slot): exact integer arithmetic
    val gpos = col("__off") + col("__p")
    val slot = pmod(gpos, lit(seqLen.toLong))
    val seq = ((gpos - slot) / lit(seqLen.toLong)).cast("long")
    val packed = off
      .select(col("__sh"), col("__off"),
        posexplode(col("__ids")).as(Seq("__p", "__t")))
      .select(col("__sh"), seq.as("__seq"), slot.as("__slot"), col("__t"))
      .groupBy(col("__sh"), col("__seq"))
      .agg(sort_array(collect_list(struct(col("__slot"), col("__t")))).as("__st"))
      .select(col("__sh").as("shard"), col("__seq").as("seq"),
        transform(col("__st"), s => s.getField("__t")).as("ids"))
      .withColumn("n_tokens", size(col("ids")))
    if (dropLast) packed.filter(col("n_tokens") === seqLen) else packed
  }
}
