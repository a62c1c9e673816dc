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

  private[ops] def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
