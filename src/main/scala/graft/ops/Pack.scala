package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
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
/** One packed window: `seq` is the 0-based window index within the
  * shard, `ids` the token row (padded to seqLen when a pad id is set),
  * `n_tokens` the PRE-pad count, `doc_starts` the slots where a new
  * document begins (position-id reset points / attention-mask block
  * boundaries — dropped from the output unless `withBounds`). Public
  * because Spark's generated code instantiates it. */
case class PackedRow(
    shard: Int, seq: Long, ids: Seq[Int], n_tokens: Int,
    doc_starts: Seq[Int])

object Pack {

  /** Pack per-document id arrays into fixed-length training sequences.
    *
    * Semantics: within each shard (deterministic assignment — integral
    * ids by `pmod(id, shards)`, strings by the portable fingerprint mod
    * `shards`, the tarShards arithmetic), documents concatenate in
    * ascending `idCol` order, each followed by one `eosId`, under one of
    * two packing disciplines:
    *
    *   - `mode = "split"` (default): the token stream slices into
    *     consecutive `seqLen`-token windows — ZERO pad waste, documents
    *     may straddle window boundaries (train with cross-doc attention
    *     masking or accept the contamination).
    *   - `mode = "whole"`: next-fit whole-document packing — a document
    *     NEVER splits across windows (the fewer-truncations recipe): each
    *     doc lands in the current window if it fits, else the window
    *     closes (short — that is the waste this mode trades for intact
    *     docs) and a new one starts. Documents longer than `seqLen − 1`
    *     tokens truncate to fit one window (compose `chunk` upstream to
    *     split instead of truncate). Preserves doc order within shards.
    *   - `mode = "best_fit"`: best-fit-decreasing whole-document packing
    *     (the published fewer-truncations recipe proper) — docs place in
    *     DESCENDING length order (ties by ascending id), each into the
    *     open window with the LEAST remaining capacity that still fits
    *     (ties by lowest window index), a new window opening only when
    *     none fits. Near-minimal pad waste at the cost of doc order;
    *     same truncation rule. `drop_last` does not apply (windows are
    *     not a stream — there is no "last"; every window keeps, pad with
    *     `padId`).
    *
    * `dropLast` (default) discards each shard's final window unless it is
    * exactly full — a trainer wants only full rows; `dropLast = false`
    * keeps it. In whole mode, intermediate windows close short by nature
    * and are always kept (set `padId >= 0` to pad them to `seqLen`;
    * `n_tokens` stays the pre-pad count). `withBounds` adds `doc_starts`
    * — the window slots where a new document begins, what a trainer needs
    * to reset position ids / build block-diagonal attention masks.
    *
    * Output: `(shard, seq, ids, n_tokens[, doc_starts])` — `seq` is the
    * 0-based window index within the shard, `ids` the `array<int>` row.
    *
    * Determinism: the concatenation order is (shard, id) — total given
    * distinct ids — and every arithmetic step is integer, so shard
    * bytes replay exactly under retries (the tarShards posture).
    *
    * Scale, split mode: one shuffle to the shard (the window partition),
    * one token-shaped shuffle to (shard, seq) for window assembly — the
    * postings-table budget. The running offset is a per-shard window
    * scan: each shard's token stream passes ONE task, so size `shards`
    * the way you size WebDataset shards (a few hundred MB of tokens
    * each) and the pack parallelizes shard-wide; there is no global
    * sort and no driver state.
    *
    * Scale, whole mode: next-fit is a sequential fold (each window's
    * close depends on every prior doc's placement — no prefix-sum closed
    * form), so the shard IS the parallelism unit: one shuffle to the
    * shard, a spill-safe in-task sort by id, and a streaming O(seqLen)-
    * memory fold per shard (mapPartitions — the genuine per-partition-
    * imperative case). Same budget as split mode minus the window
    * shuffle.
    *
    * Batch-only (both modes need the shard's full extent).
    */
  def sequencePack(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      seqLen: Int,
      eosId: Int = 0,
      shards: Int = 1,
      dropLast: Boolean = true,
      mode: String = "split",
      withBounds: Boolean = false,
      padId: Int = -1
  ): DataFrame = {
    require(seqLen >= 2, s"sequencePack: seq_len must be >= 2, got $seqLen")
    require(shards >= 1, s"sequencePack: shards must be >= 1, got $shards")
    require(eosId >= 0, s"sequencePack: eos_id must be >= 0, got $eosId")
    require(padId >= -1,
      s"sequencePack: pad_id must be >= 0 (or -1 = no padding), got $padId")
    require(mode == "split" || mode == "whole" || mode == "best_fit",
      s"""sequencePack: mode must be "split" (slice the token stream — """ +
        """zero pad waste, docs may straddle windows), "whole" """ +
        """(next-fit — docs never split, doc order kept) or "best_fit" """ +
        s"""(best-fit-decreasing — minimal pad waste), got "$mode"""")
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
    val packed = mode match {
      case "whole" => packWhole(df, shard, idCol, idsCol, seqLen, eosId, dropLast)
      case "best_fit" => packBestFit(df, shard, idCol, idsCol, seqLen, eosId)
      case _ => packSplit(df, shard, idCol, idsCol, seqLen, eosId, dropLast)
    }
    val padded =
      if (padId < 0) packed
      else packed.withColumn("ids", concat(col("ids"),
        array_repeat(lit(padId), lit(seqLen) - col("n_tokens"))))
    if (withBounds) padded else padded.drop("doc_starts")
  }

  /** Split-mode pack: slice the per-shard EOS-separated token stream
    * every `seqLen` tokens (see [[sequencePack]]). */
  private def packSplit(
      df: DataFrame, shard: Column, idCol: String, idsCol: String,
      seqLen: Int, eosId: Int, dropLast: Boolean): DataFrame = {
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
    val windows = off
      .select(col("__sh"), col("__off"),
        posexplode(col("__ids")).as(Seq("__p", "__t")))
      .select(col("__sh"), seq.as("__seq"), slot.as("__slot"), col("__t"))
      .groupBy(col("__sh"), col("__seq"))
      .agg(sort_array(collect_list(struct(col("__slot"), col("__t")))).as("__st"))
      .select(col("__sh").as("shard"), col("__seq").as("seq"),
        transform(col("__st"), s => s.getField("__t")).as("ids"))
      .withColumn("n_tokens", size(col("ids")))
    // doc-start slots per window: one doc-shaped aggregate on the same
    // offsets (a doc starts where its first token — offset __off — lands)
    val startSlot = pmod(col("__off"), lit(seqLen.toLong))
    val bounds = off.select(col("__sh").as("shard"),
        (((col("__off") - startSlot) / lit(seqLen.toLong)).cast("long")).as("seq"),
        startSlot.cast("int").as("__s0"))
      .groupBy("shard", "seq")
      .agg(sort_array(collect_list(col("__s0"))).as("doc_starts"))
    val packed = windows.join(bounds, Seq("shard", "seq"), "left")
      .withColumn("doc_starts",
        coalesce(col("doc_starts"), array().cast("array<int>")))
    if (dropLast) packed.filter(col("n_tokens") === seqLen) else packed
  }

  /** Best-fit-decreasing mode: docs in descending length order, each
    * into the tightest open window that fits (see [[sequencePack]]).
    *
    * Two phases so the sequential fold only ever touches LENGTHS: (1) a
    * doc-shaped (shard, id, len) frame sorts per shard by (len desc, id)
    * and streams through a TreeMap of remaining-capacity → window
    * indexes (O(log windows) per doc, O(windows) task memory — a few MB
    * for a WebDataset-sized shard); (2) the emitted (id → window,
    * offset) assignment joins back to the token arrays and one
    * window-keyed aggregate assembles the rows. Token bytes cross the
    * wire twice (the split-mode budget); the fold itself never holds
    * token data. */
  private def packBestFit(
      df: DataFrame, shard: Column, idCol: String, idsCol: String,
      seqLen: Int, eosId: Int): DataFrame = {
    val prepped = df.select(shard.as("__sh"), col(idCol).as("__id"),
      concat(slice(col(idsCol).cast("array<int>"), 1, seqLen - 1),
        array(lit(eosId))).as("__ids"))
    // phase 1: assignment over lengths only — ids travel as strings so
    // one encoder covers integral and string keys; the SORT still runs
    // on the original column (numeric "10" < "9" as text)
    val lens = prepped
      .select(col("__sh"), col("__id"),
        col("__id").cast("string").as("__key"),
        size(col("__ids")).as("__l"))
      .repartition(col("__sh"))
      .sortWithinPartitions(col("__sh").asc, col("__l").desc, col("__id").asc)
      .select(col("__sh"), col("__key"), col("__l"))
      .as(Encoders.tuple(Encoders.scalaInt, Encoders.STRING,
        Encoders.scalaInt))
    val assigned = lens.mapPartitions { it =>
      var curSh = Int.MinValue
      var nBins = 0L
      // remaining capacity → open-window indexes; best fit = the
      // smallest remaining that still admits the doc (ceilingEntry),
      // ties to the lowest window index (TreeSet.first)
      val open = new java.util.TreeMap[Int, java.util.TreeSet[java.lang.Long]]()
      it.map { case (sh, key, l) =>
        if (sh != curSh) { curSh = sh; nBins = 0L; open.clear() }
        val e = open.ceilingEntry(l)
        if (e == null) {
          val idx = nBins; nBins += 1
          open.computeIfAbsent(seqLen - l,
            _ => new java.util.TreeSet[java.lang.Long]()).add(idx)
          (sh, key, idx, 0)
        } else {
          val rem = e.getKey
          val idx: Long = e.getValue.first()
          e.getValue.remove(idx)
          if (e.getValue.isEmpty) open.remove(rem)
          open.computeIfAbsent(rem - l,
            _ => new java.util.TreeSet[java.lang.Long]()).add(idx)
          (sh, key, idx, seqLen - rem)
        }
      }
    }(Encoders.tuple(Encoders.scalaInt, Encoders.STRING,
      Encoders.scalaLong, Encoders.scalaInt))
      .toDF("__sh", "__key", "__seq", "__off")
    // phase 2: join the assignment back and assemble windows
    prepped.withColumn("__key", col("__id").cast("string"))
      .join(assigned, Seq("__sh", "__key"))
      .groupBy(col("__sh"), col("__seq"))
      .agg(sort_array(collect_list(struct(col("__off"), col("__ids"))))
        .as("__ws"))
      .select(col("__sh").as("shard"), col("__seq").as("seq"),
        flatten(transform(col("__ws"), w => w.getField("__ids"))).as("ids"),
        transform(col("__ws"), w => w.getField("__off")).as("doc_starts"))
      .withColumn("n_tokens", size(col("ids")))
      .select(col("shard"), col("seq"), col("ids"), col("n_tokens"),
        col("doc_starts"))
  }

  private def packWhole(
      df: DataFrame, shard: Column, idCol: String, idsCol: String,
      seqLen: Int, eosId: Int, dropLast: Boolean): DataFrame = {
    import scala.collection.mutable.ArrayBuffer
    // truncate to seqLen − 1 tokens + EOS, so every doc fits one window
    val prepped = df.select(shard.as("__sh"), col(idCol).as("__id"),
      concat(slice(col(idsCol).cast("array<int>"), 1, seqLen - 1),
        array(lit(eosId))).as("__ids"))
    val sorted = prepped
      .repartition(col("__sh"))
      .sortWithinPartitions(col("__sh"), col("__id"))
      .select(col("__sh"), col("__ids"))
      .as(Encoders.tuple(Encoders.scalaInt,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()))
    val out = sorted.mapPartitions { it =>
      new Iterator[PackedRow] {
        private val in = it.buffered
        private var started = false
        private var curSh = 0
        private var seqNo = 0L
        private val buf = new ArrayBuffer[Int](seqLen)
        private val starts = new ArrayBuffer[Int]()
        private var pending: PackedRow = null
        private var exhausted = false
        advance()

        private def close(): PackedRow = {
          val r = PackedRow(curSh, seqNo, buf.toSeq, buf.length, starts.toSeq)
          seqNo += 1; buf.clear(); starts.clear(); r
        }
        // flush at shard end: a full window always keeps; a short one
        // only without dropLast
        private def flush(): Unit =
          if (buf.nonEmpty && (!dropLast || buf.length == seqLen))
            pending = close()
          else { buf.clear(); starts.clear() }

        private def advance(): Unit = {
          pending = null
          while (pending == null && !exhausted) {
            if (!in.hasNext) { flush(); exhausted = true }
            else {
              val (sh, ids) = in.head
              if (!started) { started = true; curSh = sh }
              if (sh != curSh) { flush(); curSh = sh; seqNo = 0L }
              else if (buf.length + ids.length > seqLen) pending = close()
              else { starts += buf.length; buf ++= ids; in.next() }
            }
          }
        }
        def hasNext: Boolean = pending != null
        def next(): PackedRow = { val r = pending; advance(); r }
      }
    }(Encoders.product[PackedRow])
    out.toDF()
  }
}
