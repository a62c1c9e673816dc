package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for partitioned parquet ARTIFACTS (the ann_index /
  * bm25_index at-rest layouts): every `mode: "append"` lands one more
  * file set into each touched partition directory, so a long-running
  * ingest fragments the artifact — hundreds of small files per
  * partition whose footer reads eventually dominate the pruned-scan
  * cost the layout exists to provide. Compaction rewrites each
  * partition to ONE file (the tar_compact posture applied to parquet):
  * a deliberate, explicit re-read of history — the amortized cost of
  * keeping every future search fast.
  */
object Artifacts {

  /** Rewrite a `partitionBy(partCol)` parquet directory to one file per
    * partition value: `repartition(partCol)` puts each value wholly in
    * one task, so the partitioned write emits exactly one file per
    * directory; rows, values and partition layout are unchanged
    * (searches before and after are bit-identical — gated in tests).
    *
    * The swap is write-to-sibling then two renames (dest → dest.old,
    * tmp → dest, delete dest.old) — never an in-place overwrite of a
    * path being read. Not atomic: a crash between the renames leaves
    * `dest.old` (the intact pre-compact artifact) — move it back or
    * re-run the compaction; the tmp write itself is all-or-nothing
    * (Spark commits via _temporary). */
  def compactPartitionedDir(
      spark: SparkSession, dir: String, partCol: String): Unit = {
    val df =
      try spark.read.parquet(dir)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"compact: cannot read the artifact under $dir — build it " +
          s"first: ${e.getMessage}") }
    require(df.columns.contains(partCol),
      s"compact: $dir is not partitioned by '$partCol' " +
        s"(columns: ${df.columns.mkString(", ")})")
    val tmp = s"$dir.compact"
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    swapDir(spark, tmp, dir)
  }

  /** Rewrite an UNPARTITIONED parquet directory (the bm25 `dl` table —
    * read by EVERY search for the doc-length attach) to size-targeted
    * files: after thousands of micro-appends the footer reads dominate
    * exactly like the postings case, so the compactor must cover it
    * too. File count targets ~128 MB of on-disk bytes per file (never
    * one giant file on a billion-doc corpus); same write-sibling +
    * rename swap, rows and values unchanged. */
  def compactFlatDir(spark: SparkSession, dir: String): Unit = {
    val df =
      try spark.read.parquet(dir)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"compact: cannot read the artifact under $dir — build it " +
          s"first: ${e.getMessage}") }
    val p = new org.apache.hadoop.fs.Path(dir)
    val bytes = p.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(p).getLength
    val nFiles = math.max(1L, bytes / (128L << 20) + 1L).toInt
    val tmp = s"$dir.compact"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    swapDir(spark, tmp, dir)
  }

  /** True when the delta dir exists AND holds at least one DATA file:
    * an all-empty micro-batch write can leave a fileless `batch=` dir
    * (just _SUCCESS), and a bare parquet read of it dies on schema
    * inference — readers must treat such a delta as absent. */
  def incHasData(spark: SparkSession, inc: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(inc)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(d: org.apache.hadoop.fs.Path): Boolean = {
      val st = fs.listStatus(d)
      st.exists(f => f.isFile && f.getLen > 0 &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".")) ||
        st.exists(f => f.isDirectory && walk(f.getPath))
    }
    fs.exists(p) && walk(p)
  }

  /** Read an artifact table as base ∪ streaming-ingest DELTA — the ONE
    * reader the bm25 and ann index artifacts share (a drifted copy of
    * this contract is how fileless-delta and schema-mismatch bugs creep
    * in). The delta's `batch` partition column is bookkeeping, never
    * data; a fileless delta reads as absent. */
  def readWithInc(spark: SparkSession, base: String, inc: String)
      : org.apache.spark.sql.DataFrame = {
    val b = spark.read.parquet(base)
    if (incHasData(spark, inc))
      b.unionByName(spark.read.parquet(inc).drop("batch"))
    else b
  }

  /** Fold a streaming-ingest DELTA area (`$base` sibling written as
    * one `batch=<id>` child dir per micro-batch — the idempotent-replay
    * layout) into the base table, then drop it: read base ∪ inc (the
    * inc side's `batch` partition column stripped), rewrite compacted,
    * swap, delete inc. With no delta present this is plain compaction.
    *
    * Crash discipline (same family as [[compactPartitionedDir]], one
    * more window): the folded rewrite lands at `$base.compact` FIRST,
    * then inc renames aside to `$inc.old` (readers see base-only — a
    * briefly stale but never-duplicated view), then the base swap, then
    * `$inc.old` drops. A leftover `$inc.old` therefore means a crashed
    * fold and REJECTS BY NAME on the next run instead of silently
    * compacting without the delta rows: recover by renaming it back to
    * `$inc` (pre-swap crash — `$base.compact` may be stale, delete it)
    * or deleting it (post-swap crash — base already contains the
    * delta iff `$base.compact` is gone). */
  def foldIncInto(
      spark: SparkSession, base: String, inc: String,
      partCol: Option[String]): Unit = {
    val oldInc = new org.apache.hadoop.fs.Path(s"$inc.old")
    val fs = oldInc.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(oldInc),
      s"compact: $inc.old exists — a prior delta fold crashed mid-swap. " +
        s"Recover: if $base itself is MISSING, first restore it from " +
        s"$base.old (the swap died between its two renames); then, if " +
        s"$base.compact still exists the folded rewrite completed — " +
        s"finish by renaming $base.compact over $base and deleting " +
        s"$inc.old; otherwise rename $inc.old back to $inc and re-run")
    if (!incHasData(spark, inc)) {
      // a fileless delta (all-empty micro-batches) is junk — drop it so
      // it cannot linger past the compaction that should retire it
      deleteDir(spark, inc)
      partCol match {
        case Some(pc) => compactPartitionedDir(spark, base, pc)
        case None     => compactFlatDir(spark, base)
      }
      return
    }
    val baseDf =
      try spark.read.parquet(base)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"compact: cannot read the artifact under $base — build it " +
          s"first: ${e.getMessage}") }
    val df = baseDf.unionByName(spark.read.parquet(inc).drop("batch"))
    val tmp = s"$base.compact"
    partCol match {
      case Some(pc) =>
        require(baseDf.columns.contains(pc),
          s"compact: $base is not partitioned by '$pc' " +
            s"(columns: ${baseDf.columns.mkString(", ")})")
        df.repartition(col(pc)).write.mode("overwrite").partitionBy(pc)
          .parquet(tmp)
      case None =>
        val p = new org.apache.hadoop.fs.Path(base)
        val bytes = fs.getContentSummary(p).getLength +
          fs.getContentSummary(new org.apache.hadoop.fs.Path(inc)).getLength
        df.repartition(math.max(1L, bytes / (128L << 20) + 1L).toInt)
          .write.mode("overwrite").parquet(tmp)
    }
    require(fs.rename(new org.apache.hadoop.fs.Path(inc), oldInc),
      s"compact: cannot stage the delta area aside ($inc -> $inc.old)")
    swapDir(spark, tmp, base)
    fs.delete(oldInc, true)
    ()
  }

  /** dest → dest.old, tmp → dest, drop dest.old (see caveat above). */
  private def swapDir(spark: SparkSession, tmp: String, dest: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(conf)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val oldPath = new org.apache.hadoop.fs.Path(dest + ".old")
    if (fs.exists(oldPath)) fs.delete(oldPath, true)
    require(fs.rename(destPath, oldPath),
      s"compact: cannot stage $dest aside (rename to $oldPath failed)")
    require(fs.rename(tmpPath, destPath),
      s"compact: cannot land $tmp at $dest — the pre-compact artifact " +
        s"is intact at $oldPath")
    fs.delete(oldPath, true)
    ()
  }

  /** Recursive delete, no-op when absent — the rebuild paths' stale-
    * delta cleanup. */
  private[ops] def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  private[ops] def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
