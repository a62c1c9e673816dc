package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data-layout operators — the write-side half of 100 TB
  * performance. Query operators decide how data is processed; these decide
  * how it is LAID OUT so the next thousand queries scan less:
  *
  *   - hive partitioning:    coarse pruning on low-cardinality columns
  *                           (partition directories never scanned at all);
  *   - bucketing:            pre-shuffled storage — an equi-join or
  *                           aggregation on the bucket key runs with NO
  *                           exchange (asserted in LayoutSpec);
  *   - range-sorted files:   parquet min/max footer stats become effective
  *                           data-skipping indexes when each file owns a
  *                           disjoint key range;
  *   - z-order:              multi-column locality — one interleaved sort
  *                           key gives bounded min/max spread on EVERY
  *                           participating column, where a lexicographic
  *                           sort only skips on the leading one.
  *
  * All writers are plan-only (repartition/sort/write) — no driver-side
  * data movement. The z-order cutpoints are the one driver round-trip:
  * `approxQuantile` metadata, bounded by (cols × buckets) doubles,
  * corpus-size-independent — same trust model as Similarity's IVF
  * centroids.
  */
object Layout {

  /** Hive-style partitioned parquet write: one directory per distinct
    * value combination of `partitionCols`. Use for low-cardinality
    * pruning columns (date, language, source); high-cardinality partition
    * columns produce a small-file explosion — prefer bucketing or range
    * sort for those. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    val w = df.write.mode("overwrite").partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** Bucketed (pre-shuffled) table layout: rows are hash-distributed into
    * `buckets` files by `bucketCols` and sorted by `sortCols` within each
    * bucket at WRITE time. Every later equi-join / groupBy on the bucket
    * key between co-bucketed tables then runs with no Exchange (and no
    * Sort, when sortCols cover the join key) — the shuffle is paid once at
    * ingest instead of per query. Catalog-backed by necessity: bucketing
    * metadata lives in the table definition, so this writes via
    * `saveAsTable`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Seq.empty
  ): Unit = {
    require(bucketCols.nonEmpty, "bucketing needs at least one column")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Range-partitioned, sorted parquet layout: rows are range-distributed
    * into `numRanges` partitions on `sortCols` and sorted within each, so
    * every output file owns a (near-)disjoint key range — parquet min/max
    * footer stats then prune whole files for range predicates on those
    * columns (LayoutSpec asserts the disjointness). `maxRecordsPerFile`
    * bounds file size so a 100 TB write lands as uniformly-sized,
    * individually-skippable files. */
  def writeRangeSorted(
      df: DataFrame,
      path: String,
      sortCols: Seq[String],
      numRanges: Int,
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    require(sortCols.nonEmpty && numRanges > 0, "need sort columns and ranges")
    val w = df
      .repartitionByRange(numRanges, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** Z-value: bit-interleave of `cols`, which must already be non-negative
    * integers < 2^bits (bucket indexes — see [[quantileBucket]]). Bit i of
    * column j lands at position i·n + j, so sorting by the z-value orders
    * rows by all columns "simultaneously": any z-contiguous run spans a
    * bounded hyper-rectangle of the column space, which is exactly what
    * makes per-file min/max stats selective on every column at once.
    * Pure shift/mask arithmetic — whole-stage-codegen'd, scan-stage. */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * cols must fit a signed long, got $bits * ${cols.size}")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** ANSI-SQL mirror of [[zorderValue]] (same bit placement, `|`/`&`/shift
    * operators), so a z-value query is oracle-checkable bit-for-bit on an
    * external engine. Kept adjacent to the Scala so the two cannot drift
    * silently. */
  def zorderSql(cols: Seq[String], bits: Int): String = {
    require(cols.size >= 2 && bits > 0 && bits * cols.size <= 63)
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Quantile-bucket index: 0-based bucket of `c` among `cuts` (ascending
    * quantile cutpoints) — the rank-equalizing transform that feeds
    * [[zorderValue]], so skew in any one column cannot collapse the
    * z-curve. One pass over a literal cutpoint array per row (count of
    * cutpoints ≤ c); no codegen blowup at any bucket count. */
  def quantileBucket(c: Column, cuts: Seq[Double]): Column =
    size(filter(typedLit(cuts), x => c.cast("double") >= x))

  /** Z-ordered parquet layout over `cols` (numeric): per-column quantile
    * cutpoints (2^bits − 1 each, one bounded `approxQuantile` driver
    * round-trip), bucket each column by rank, interleave buckets into a
    * z-value, then range-partition + sort the write on it. The layout
    * twin of a multi-dimensional index: range predicates on ANY of `cols`
    * skip most files, not just predicates on a leading sort column. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      bits: Int,
      numRanges: Int,
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val zc = "__z"
    require(!df.columns.contains(zc), s"input already has a $zc column")
    // multi-column overload: ALL cutpoint sets in one pass over the
    // input, not one full scan per z-order column
    val allCuts = df.stat.approxQuantile(cols.toArray, probs, 0.01)
    val bucketed = cols.zip(allCuts).map { case (c, cuts) =>
      quantileBucket(col(c), cuts.toSeq)
    }
    val w = df.withColumn(zc, zorderValue(bucketed, bits))
      .repartitionByRange(numRanges, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }
}
