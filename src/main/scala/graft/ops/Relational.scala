package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operators beyond the reference's surface (SURVEY §2.2 NS
  * rows), built as DataFrame combinators. All are shuffle-aware: one
  * shuffle each, no driver-side materialization, no cross joins unless the
  * operator is inherently theta.
  */
object Relational {

  /** Watchlist frequency estimation in ONE shuffle-free pass — the
    * second mergeable-sketch family next to HLL (q102/q104): a
    * Count–Min sketch of `keyCol` is built as a partial+final aggregate
    * (every partition sketches locally; sketches MERGE, so no row ever
    * shuffles), collected to the driver (depth×width counters — bounded
    * metadata, corpus-independent), and probed for the given keys.
    *
    * Output: (keyCol, est). The CMS guarantee is one-sided:
    * est ≥ true count always, and est ≤ true + ε·N with probability
    * ≥ `confidence` — which is what makes this gateable (q160 pins the
    * bracket, the q102 HLL pattern). Fixed `seed` → deterministic
    * estimates, replay-stable.
    *
    * The 100 TB use: counting a wordlist/blocklist/URL-watchlist over
    * the full corpus costs one scan and ships only sketches — where a
    * groupBy-then-filter pays a corpus-shaped shuffle for counts of
    * keys you never asked about. */
  def cmsProbeCounts(
      df: DataFrame,
      keyCol: String,
      probes: Seq[String],
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      seed: Int = 42
  ): DataFrame = {
    require(probes.nonEmpty, "cmsProbeCounts: need at least one probe key")
    val bytes = df
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
        .as("s"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val spark = df.sparkSession
    import spark.implicits._
    probes.map(p => (p, cms.estimateCount(p)))
      .toDF(keyCol, "est")
  }

  /** HEAVY HITTERS: the top-k most frequent keys WITHOUT knowing them in
    * advance — hot domains, hot n-grams, hot join keys — in ONE
    * shuffle-free pass. Completes the mergeable-sketch family: HLL
    * answers "how many distinct", CMS ([[cmsProbeCounts]]) answers "how
    * often do THESE keys occur", this answers "WHICH keys dominate".
    *
    * Built on Spark 4's native `approx_top_k` aggregate (an Apache
    * DataSketches frequent-items sketch): every partition sketches
    * locally, sketches MERGE partial→final, so no row ever shuffles —
    * the alternative groupBy+orderBy+limit pays a distinct-keys-shaped
    * shuffle, which for n-gram-like domains is itself corpus-scale. The
    * sketch tracks `maxItemsTracked` items (bounded metadata); we pull
    * ALL tracked items and re-rank deterministically by (count DESC,
    * key ASC) — the sketch's own top-k tie order is unspecified — then
    * keep k. The rank window runs over ≤ maxItemsTracked rows (bounded,
    * single partition by design).
    *
    * Guarantee: when `maxItemsTracked` ≥ the true distinct count, every
    * count is EXACT (nothing is ever evicted) — the oracle-gated
    * regime. Under eviction, counts are estimates with error ≤ ~N /
    * maxItemsTracked and any key with true count above that bound is
    * guaranteed present (the frequent-items contract). NULL keys are
    * not counted. Batch-only by name (global aggregate); on streams,
    * run per window or over the landed batch.
    *
    * Output: (keyCol, count, rn), rn = 1-based rank. */
  def approxTopK(
      df: DataFrame,
      keyCol: String,
      k: Int = 10,
      maxItemsTracked: Int = 10000
  ): DataFrame = {
    require(k >= 1, s"approx_top_k: k must be >= 1, got $k")
    require(maxItemsTracked >= k,
      s"approx_top_k: max_items_tracked ($maxItemsTracked) must be >= k ($k)")
    require(df.columns.contains(keyCol),
      s"approx_top_k: unknown column '$keyCol' (have: ${df.columns.mkString(", ")})")
    require(keyCol != "count" && keyCol != "rn",
      s"approx_top_k: key column '$keyCol' collides with the output " +
        "count/rn columns — rename it upstream")
    val sk = df.filter(col(keyCol).isNotNull).agg(
      expr(s"approx_top_k(`$keyCol`, $maxItemsTracked, $maxItemsTracked)")
        .as("__tk"))
    val w = Window.orderBy(col("count").desc, col(keyCol).asc)
    sk.select(explode(col("__tk")).as("__e"))
      .select(col("__e.item").as(keyCol), col("__e.count").cast("long").as("count"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Per-column data-quality profile — the monitoring pass a production
    * pipeline runs on every ingested batch: one row per profiled column
    * with (col_name, n_rows, n_nulls, n_distinct, min_value, max_value),
    * min/max cast to string so heterogeneous column types share one
    * output schema.
    *
    * ONE aggregate pass over the input (partial+final, no matter how
    * many columns are profiled — the per-column stats are sibling
    * aggregate expressions, not separate jobs), then a constant-size
    * `stack` unpivot of the single result row. The expensive term at
    * scale is exact `count_distinct` (one hash set per column in the
    * aggregate); `approx = true` swaps in HLL `approx_count_distinct`,
    * the right default at corpus scale where "how many distinct URLs"
    * tolerates ±2%. Exact mode is the oracle-gated one.
    */
  def profile(
      df: DataFrame,
      columns: Seq[String],
      approx: Boolean = false,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    require(columns.nonEmpty, "profile: need at least one column")
    val missing = (columns ++ groupCols).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"profile: columns not in the frame: ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    val overlap = columns.filter(groupCols.contains)
    require(overlap.isEmpty,
      s"profile: column(s) ${overlap.mkString(", ")} are also group " +
        "columns — profiling a key against itself is a constant row")
    require(groupCols.distinct.size == groupCols.size,
      s"profile: duplicate group column(s) " +
        s"${groupCols.diff(groupCols.distinct).distinct.mkString(", ")}")
    val clash = groupCols.filter(c =>
      Seq("col_name", "n_rows", "n_nulls", "n_distinct", "min_value",
        "max_value").contains(c) || c.startsWith("__pr_"))
    require(clash.isEmpty,
      s"profile: group column(s) ${clash.mkString(", ")} collide with the " +
        "output schema — rename upstream")
    val aggs = count(lit(1)).as("__pr_n") +: columns.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__pr_nulls_$c"),
        (if (approx) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"__pr_dist_$c"),
        min(col(c)).cast("string").as(s"__pr_min_$c"),
        max(col(c)).cast("string").as(s"__pr_max_$c"))
    }
    // groupCols → the per-slice profile: one stats row set per group
    // value (still ONE aggregate pass; NULL groups profile as their own
    // slice — standard groupBy semantics, unlike the count-JOIN-shaped
    // operators that must reject them)
    val row =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns.map { c =>
      s"'$c', __pr_n, `__pr_nulls_$c`, `__pr_dist_$c`, `__pr_min_$c`, `__pr_max_$c`"
    }.mkString(", ")
    row.select(groupCols.map(col) :+ expr(
      s"stack(${columns.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"): _*)
  }

  /** Per-group top-k: row_number over (partition, order) then filter ≤ k.
    * The standard scalable pattern — one shuffle on `partitionCols`; the
    * window is rank-only so Spark's WindowExec streams each group without
    * buffering beyond the frame. `orderCols` must be a total order within a
    * group (include a unique tiebreaker) or results are nondeterministic. */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rn"
  ): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Changelog / CDC compaction: reduce an append-only change stream to
    * the current snapshot — the latest version per key wins; keys whose
    * latest record is a delete marker disappear. This is the ingest-side
    * compaction every 100 TB training-data store needs before consuming a
    * mutable upstream (upserts + tombstones → point-in-time state).
    *
    * `versionOrder` must be a total order within a key (include a unique
    * tiebreaker such as a sequence number) — recency FIRST, i.e. pass
    * DESC columns. One shuffle on `keys`; row_number + `rn = 1` plans
    * Spark's WindowGroupLimit, so each map task forwards only its
    * per-key latest candidate — the shuffle is keys-shaped, not
    * changelog-shaped. The delete filter runs AFTER the rank (a deleted
    * key's older live versions must NOT resurface). A NULL `isDelete`
    * (e.g. a tombstone predicate over a nullable column) means "not a
    * delete" — a plain `filter(!isDelete)` would silently drop live rows
    * with null markers. */
  def compactChangelog(
      df: DataFrame,
      keys: Seq[String],
      versionOrder: Seq[Column],
      isDelete: Column
  ): DataFrame =
    topKPerGroup(df, keys, versionOrder, 1, rankCol = "__cc_rn")
      .filter(!coalesce(isDelete, lit(false)))
      .drop("__cc_rn")

  /** As-of join: for each left row, attach the payload of the nearest
    * right row with equal keys in the given `direction` (both bounds
    * INCLUSIVE — ties on the instant take the right row):
    *  - "backward" (default): most recent right with rightTs ≤ leftTs
    *  - "forward": earliest right with rightTs ≥ leftTs
    *  - "nearest": whichever of the two is closer (ties → backward)
    * `tolerance` (an expression: an `INTERVAL 'x'` literal for timestamp
    * columns, a number for numeric ones) nulls the payload when the
    * matched row is further than that from leftTs — the pandas
    * merge_asof contract. Nulls when no qualifying right row exists
    * (left-join semantics).
    *
    * Implementation is the union-and-carry pattern, NOT a range cross
    * join: union both sides tagged, ONE shuffle on `on` keys, window
    * `last/first(carry, ignoreNulls)` carries the nearest right
    * payload to every left row. The carry is ONE struct holding the
    * matched row's timestamp AND every payload column together — so a
    * NULL in one payload field can never be silently back-filled from
    * an OLDER right row (per-column carries had exactly that defect:
    * the value came from beyond the tolerance gate while the gate
    * validated the matched row's timestamp). Cost is a single shuffle
    * of |L|+|R| with one in-task sort (two for forward/nearest — the
    * tie rule needs the opposite side order; same Exchange either
    * way) — the only as-of formulation that survives 100 TB (a
    * `l.ts >= r.ts` theta join is O(|L|·|R|) per key).
    *
    * Right rows must be unique per (on, rightTs) — pre-dedup if not —
    * otherwise which duplicate wins is tie-broken by `rightTieBreak`:
    * the LARGEST tie-break value wins, in every direction.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: Option[String] = None,
      direction: String = "backward",
      tolerance: Option[String] = None
  ): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoin: direction must be backward/forward/nearest, got '$direction'")
    val tolExpr = tolerance.map { t =>
      // expr() parses lazily (a malformed INTERVAL literal only fails at
      // analysis) — force analysis on a 1-row frame so the typo fails
      // HERE by name, not mid-plan
      try {
        val e = expr(t)
        left.sparkSession.range(1).select(e).queryExecution.analyzed
        e
      } catch {
        case e: Exception => throw new IllegalArgumentException(
          s"asofJoin: tolerance '$t' does not parse (use an INTERVAL " +
            s"literal for timestamps, a number for numeric axes): ${e.getMessage}")
      }
    }
    val side = "__asof_side"
    val ts = "__asof_ts"
    val carry = "__asof_carry"
    val tieC = "__asof_tie"
    val bCol = "__asof_b"

    // The carry is ONE struct: the matched row's own timestamp (field
    // __rts — it decides nearest and tolerance) plus every payload
    // column (positional fields __f0.. so payload names can never
    // collide with __rts). Right rows carry a NON-NULL struct even when
    // every payload field is NULL; left rows carry NULL (unionByName
    // back-fills the missing column) — so ignoreNulls skips exactly the
    // left rows and nothing else.
    val carryStruct = struct(
      col(rightTs).as("__rts") +:
        rightPayload.zipWithIndex.map { case (c, i) => col(c).as(s"__f$i") }: _*)
    val l = left.withColumn(side, lit(1)).withColumn(ts, col(leftTs))
    val r = right.select(
      (on.map(col) :+ col(rightTs).as(ts) :+ carryStruct.as(carry)) ++
        rightTieBreak.map(c => col(c).as(tieC)).toSeq: _*)
      .withColumn(side, lit(0))
    // null out the side-only columns on the other side via unionByName
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // Duplicate right rows at one (on, ts): the LARGEST tie-break value
    // wins in EVERY direction — backward's last() over (ts ASC, tie ASC)
    // and forward's last() over the REVERSED (ts DESC, tie ASC) order
    // both see the largest tie value LAST among a (on, ts) duplicate
    // group, so they pick the same winner (OpsSpec pins it).
    // backward: right-before-left at equal ts → last() ≤-inclusive
    val wb = Window.partitionBy(on.map(col): _*)
      .orderBy(Seq(col(ts).asc, col(side).asc) ++
        rightTieBreak.map(_ => col(tieC).asc).toSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: REVERSED running frame. Spark's [currentRow,
    // unboundedFollowing] frame re-opens an iterator at the current row
    // and folds the aggregate over the partition REMAINDER for every
    // output row — O(n²) row visits on a hot key. Sorting ts DESC puts
    // later instants first, so the O(n) running [unboundedPreceding,
    // currentRow] frame sees exactly the rows at ts ≥ the anchor, and
    // last(ignoreNulls) is the MIN qualifying instant. At an equal ts
    // the right row must be IN the frame (≥-inclusive) → side ASC (0
    // before 1); among equal-ts rights, tie ASC makes last() pick the
    // LARGEST tie-break — the same winner as backward.
    val wf = Window.partitionBy(on.map(col): _*)
      .orderBy(Seq(col(ts).desc, col(side).asc) ++
        rightTieBreak.map(_ => col(tieC).asc).toSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    var out = unioned
    direction match {
      case "backward" =>
        out = out.withColumn(bCol, last(col(carry), ignoreNulls = true).over(wb))
      case "forward" =>
        out = out.withColumn(bCol, last(col(carry), ignoreNulls = true).over(wf))
      case "nearest" =>
        out = out
          .withColumn("__asof_bk", last(col(carry), ignoreNulls = true).over(wb))
          .withColumn("__asof_fw", last(col(carry), ignoreNulls = true).over(wf))
        val bTs = col("__asof_bk").getField("__rts")
        val fTs = col("__asof_fw").getField("__rts")
        // closer side wins; equal distance → backward; one-sided → that side
        val useB = bTs.isNotNull &&
          (fTs.isNull || (col(ts) - bTs) <= (fTs - col(ts)))
        out = out.withColumn(bCol,
          when(useB, col("__asof_bk")).otherwise(col("__asof_fw")))
          .drop("__asof_bk", "__asof_fw")
    }
    // tolerance: the matched row exists but sits too far — null the
    // payload. mts IS the matched row's timestamp: payload and gate come
    // from the same struct, so they can never disagree about which row
    // was matched.
    val mts = col(bCol).getField("__rts")
    val inTol = tolExpr.map { tol =>
      val dist = when(mts <= col(ts), col(ts) - mts).otherwise(mts - col(ts))
      mts.isNotNull && dist <= tol
    }
    rightPayload.zipWithIndex.foreach { case (c, i) =>
      val v = col(bCol).getField(s"__f$i")
      out = out.withColumn(c, inTol match {
        case Some(ok) => when(ok, v)
        case None     => v
      })
    }
    out
      .filter(col(side) === 1)
      .drop(side, ts, carry, tieC, bCol)
  }

  /** RANGE (point-in-interval) join, the config-reachable GENERAL form
    * of the [[rangeJoin]]/[[bucketedRangeJoin]] family: attach interval
    * payload to every point row with `lo <= point < hi` (`inclusiveHi`
    * makes the upper bound closed) and equal `on` keys — IP→geo blocks,
    * per-machine calibration windows, irregular price bands.
    * Overlapping intervals produce one output row per match; `how` =
    * "inner" drops unmatched points, "left" keeps them with null
    * payload (which [[bucketedRangeJoin]] cannot express).
    *
    * A naive `p >= lo AND p < hi` condition has no equi-key, so Spark
    * plans BroadcastNestedLoopJoin — O(|P|·|I|) and a driver OOM the
    * moment the interval side is not tiny. This implementation buckets
    * the domain by `bucket` width: each point maps to floor(point /
    * bucket) (ONE bucket — unmatched left rows cannot duplicate), each
    * interval explodes to its covering bucket range, and the join is a
    * plain EQUI-join on (bucket, on…) with the exact range predicate
    * riding the join condition. Cost: one bucket-keyed shuffle of
    * points + exploded intervals (or ZERO point-side shuffle with
    * `broadcastIntervals` — the common dimension-table case), never a
    * nested loop. Float division is monotone, so bucket coverage is
    * exact — the range predicate, not the bucketing, decides matches.
    *
    * Pick `bucket` ~ the typical interval span: explode factor is
    * span/bucket + 1 per interval (a per-row cap of
    * `maxBucketsPerInterval` fails by name on degenerate spans — an
    * unbounded explode of one 0..MAX_LONG interval is a data bug, not a
    * plan). Numeric columns only (cast timestamps to epoch seconds
    * upstream; exact within 2^53). NULL point / NULL bounds never match
    * (SQL semantics); empty intervals (lo > hi, or lo == hi exclusive)
    * match nothing. Streaming-admissible on the point side
    * (stream-static equi-join).
    *
    * Output: all point columns + `on`-deduped interval `payload`
    * columns (default: every interval column except bounds/keys);
    * payload names colliding with point columns fail by name. */
  def rangeJoinKeyed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucket: Double,
      on: Seq[String] = Nil,
      payload: Seq[String] = Nil,
      how: String = "inner",
      inclusiveHi: Boolean = false,
      broadcastIntervals: Boolean = false,
      maxBucketsPerInterval: Int = 1 << 16
  ): DataFrame = {
    require(bucket > 0, s"range_join: bucket must be > 0, got $bucket")
    require(how == "inner" || how == "left",
      s"range_join: how must be 'inner' or 'left', got '$how'")
    require(maxBucketsPerInterval >= 1,
      s"range_join: max_buckets_per_interval must be >= 1, got $maxBucketsPerInterval")
    val pay =
      if (payload.nonEmpty) payload
      else intervals.columns.filterNot((Seq(loCol, hiCol) ++ on).contains).toSeq
    require(pay.nonEmpty,
      "range_join: interval side has no payload columns (nothing to attach)")
    val missing = (Seq(loCol, hiCol) ++ on ++ pay)
      .filterNot(intervals.columns.contains)
    require(missing.isEmpty,
      s"range_join: interval side is missing column(s) ${missing.mkString(", ")} " +
        s"(have: ${intervals.columns.mkString(", ")})")
    val collide = pay.filter(points.columns.contains)
    require(collide.isEmpty,
      s"range_join: payload column(s) ${collide.mkString(", ")} already exist " +
        "on the point side — rename one side first")
    val payOverlap = pay.filter((Seq(loCol, hiCol) ++ on).contains)
    require(payOverlap.isEmpty,
      s"range_join: payload column(s) ${payOverlap.mkString(", ")} duplicate " +
        "the bounds/key columns")
    requireNumericBound("range_join", points, pointCol)
    Seq(loCol, hiCol).foreach(requireNumericBound("range_join", intervals, _))
    val b = "__rj_bucket"
    require(!points.columns.contains(b) && !intervals.columns.contains(b),
      s"range_join: reserved column name '$b' already present")

    val loB = floor(col(loCol) / lit(bucket)).cast("long")
    val hiB = floor(col(hiCol) / lit(bucket)).cast("long")
    val nB = hiB - loB + lit(1L)
    var iv = intervals
      .select((on ++ Seq(loCol, hiCol) ++ pay).map(col): _*)
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn(b, explode(when(nB > lit(maxBucketsPerInterval.toLong),
        raise_error(concat(
          lit(s"range_join: interval spans more than $maxBucketsPerInterval " +
            s"buckets at bucket width $bucket (lo="), col(loCol).cast("string"),
          lit(", hi="), col(hiCol).cast("string"),
          lit(") — widen bucket or fix the interval")))
        .cast("array<long>")).otherwise(sequence(loB, hiB))))
    if (broadcastIntervals) iv = broadcast(iv)

    val pts = points.withColumn(b, floor(col(pointCol) / lit(bucket)).cast("long"))
    val upper =
      if (inclusiveHi) pts(pointCol) <= iv(hiCol) else pts(pointCol) < iv(hiCol)
    val cond = (Seq(pts(b) === iv(b), pts(pointCol) >= iv(loCol), upper) ++
      on.map(k => pts(k) === iv(k))).reduce(_ && _)
    pts.join(iv, cond, how)
      .select(points.columns.map(pts(_)) ++ pay.map(iv(_)): _*)
  }

  /** The bucketed joins' bound/point columns must be NUMERIC at plan
    * time: a string column would otherwise cast silently to double in
    * the floor(col/bucket) cell arithmetic (non-numeric strings become
    * NULL cells — rows silently match nothing). Shared by
    * [[rangeJoinKeyed]] and [[overlapJoin]]. */
  private def requireNumericBound(op: String, df: DataFrame, c: String): Unit =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType => ()
      case _: org.apache.spark.sql.types.DecimalType => ()
      case t => throw new IllegalArgumentException(
        s"$op: column '$c' has type ${t.simpleString}; the bucketed cell " +
          "arithmetic needs numeric bounds — cast timestamps to epoch " +
          "seconds/micros (unix_micros) upstream")
    }

  /** INTERVAL-OVERLAP JOIN: all pairs of a left interval and a right
    * interval (equal `on` keys) whose spans OVERLAP — the
    * interval×interval sibling of [[rangeJoinKeyed]] (point-in-interval):
    * session × outage attribution, ad exposure × browsing windows,
    * speech segments × speaker turns. Overlap is the standard predicate
    * over half-open `[lo, hi)` spans — `l.lo < r.hi AND r.lo < l.hi` —
    * or over closed `[lo, hi]` spans with `inclusive` (touching
    * endpoints count, point intervals `lo == hi` are valid).
    *
    * A naive inequality-pair condition has no equi-key, so Spark plans
    * BroadcastNestedLoopJoin — O(|L|·|R|). This implementation buckets
    * the domain by `bucket` width: BOTH sides explode to the cells their
    * span covers (named per-row cap, like rangeJoinKeyed), the join is a
    * plain EQUI-join on (cell, on…), and each overlapping pair is
    * emitted EXACTLY ONCE with zero dedup shuffle: the pair only
    * survives in the cell containing the LATER of the two interval
    * starts — `cell == greatest(floor(l.lo/bucket), floor(r.lo/bucket))`
    * (both spans provably cover that cell whenever they overlap, and
    * floor is monotone, so the greatest of the floors IS the floor of
    * the greatest). Cost: one cell-keyed shuffle of both exploded sides
    * (or ZERO left-side shuffle with `broadcastRight` — the
    * calendar/outage dimension-table case), never a nested loop.
    *
    * Pick `bucket` ~ the typical span: explode factor is span/bucket + 1
    * per interval. Numeric bounds only (cast timestamps to epoch
    * seconds/micros upstream; exact within 2^53). NULL bounds and empty
    * spans (`lo > hi`, or `lo == hi` half-open) match nothing. `how` =
    * "left" keeps non-overlapping left rows with NULL payload (NULL
    * -bound/empty left spans included — the rangeJoinKeyed posture);
    * the match set of a left row is a pure function of its VALUES, so
    * the pad side is a null-safe anti-join keyed on every left column —
    * multiplicity-exact without a nondeterministic row id (batch-only:
    * the anti side re-reads the matched output). Self-overlap within
    * ONE table is the same call with the frame passed as both sides and
    * a downstream `l_id < r_id` filter. Streaming-admissible
    * on the left side (stream-static equi-join; the generator explode is
    * deterministic and stateless) for `how: "inner"` only.
    *
    * Output: all left columns + right `payload` columns (default: every
    * right column except bounds/keys — unlike rangeJoinKeyed, an
    * EXPLICIT payload may name the right bounds, because overlap
    * length/extent arithmetic needs them downstream). */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      bucket: Double,
      rightLoCol: String = null,
      rightHiCol: String = null,
      on: Seq[String] = Nil,
      payload: Seq[String] = Nil,
      inclusive: Boolean = false,
      broadcastRight: Boolean = false,
      maxBucketsPerInterval: Int = 1 << 16,
      how: String = "inner"
  ): DataFrame = {
    require(bucket > 0, s"overlap_join: bucket must be > 0, got $bucket")
    require(how == "inner" || how == "left",
      s"overlap_join: how must be 'inner' or 'left', got '$how'")
    require(maxBucketsPerInterval >= 1,
      s"overlap_join: max_buckets_per_interval must be >= 1, got $maxBucketsPerInterval")
    val rLo = Option(rightLoCol).getOrElse(loCol)
    val rHi = Option(rightHiCol).getOrElse(hiCol)
    val pay =
      if (payload.nonEmpty) payload
      else right.columns.filterNot((Seq(rLo, rHi) ++ on).contains).toSeq
    require(pay.nonEmpty,
      "overlap_join: right side has no payload columns (nothing to attach) — " +
        "name the right bounds in payload if the extent itself is the output")
    val missingL = (Seq(loCol, hiCol) ++ on).filterNot(left.columns.contains)
    require(missingL.isEmpty,
      s"overlap_join: left side is missing column(s) ${missingL.mkString(", ")} " +
        s"(have: ${left.columns.mkString(", ")})")
    val missingR = (Seq(rLo, rHi) ++ on ++ pay).filterNot(right.columns.contains)
    require(missingR.isEmpty,
      s"overlap_join: right side is missing column(s) ${missingR.mkString(", ")} " +
        s"(have: ${right.columns.mkString(", ")})")
    val collide = pay.filter(left.columns.contains)
    require(collide.isEmpty,
      s"overlap_join: payload column(s) ${collide.mkString(", ")} already exist " +
        "on the left side — rename one side first")
    require(!pay.exists(on.contains),
      s"overlap_join: payload column(s) ${pay.filter(on.contains).mkString(", ")} " +
        "duplicate the 'on' keys (the left side already carries them)")
    require(pay.distinct.size == pay.size,
      s"overlap_join: duplicate payload column(s) " +
        s"${pay.diff(pay.distinct).distinct.mkString(", ")}")
    Seq(left -> Seq(loCol, hiCol), right -> Seq(rLo, rHi)).foreach {
      case (side, cols) => cols.foreach(requireNumericBound("overlap_join", side, _))
    }
    val b = "__oj_cell"
    require(!left.columns.contains(b) && !right.columns.contains(b),
      s"overlap_join: reserved column name '$b' already present")

    // Valid-span filter + covering-cell explode for one side. Empty spans
    // are dropped here (they overlap nothing by definition); the explode
    // cap fails BY NAME on degenerate spans — one 0..MAX_LONG interval
    // exploding 2^48 cells is a data bug, not a plan.
    def cells(df: DataFrame, lo: String, hi: String, side: String): DataFrame = {
      val loB = floor(col(lo) / lit(bucket)).cast("long")
      val hiB = floor(col(hi) / lit(bucket)).cast("long")
      val nB = hiB - loB + lit(1L)
      val nonEmpty =
        if (inclusive) col(lo) <= col(hi) else col(lo) < col(hi)
      df.filter(col(lo).isNotNull && col(hi).isNotNull && nonEmpty)
        .withColumn(b, explode(when(nB > lit(maxBucketsPerInterval.toLong),
          raise_error(concat(
            lit(s"overlap_join: $side interval spans more than " +
              s"$maxBucketsPerInterval buckets at bucket width $bucket (lo="),
            col(lo).cast("string"), lit(", hi="), col(hi).cast("string"),
            lit(") — widen bucket or fix the interval")))
          .cast("array<long>")).otherwise(sequence(loB, hiB))))
    }

    val l = cells(left, loCol, hiCol, "left")
    // The right side's columns are renamed to a reserved prefix before the
    // join: name-based references stay unambiguous even when BOTH sides are
    // the same frame (the self-overlap case), where df("col") attribute
    // disambiguation is unreliable on shared lineage.
    def rn(c: String) = s"__oj_r_$c"
    val rCols = (on ++ Seq(rLo, rHi) ++ pay).distinct
    val badPrefix = left.columns.filter(_.startsWith("__oj_r_"))
    require(badPrefix.isEmpty,
      s"overlap_join: reserved prefix '__oj_r_' already present on the left " +
        s"side (${badPrefix.mkString(", ")})")
    var r = cells(
      right.select(rCols.map(c => col(c).as(rn(c))): _*),
      rn(rLo), rn(rHi), "right")
      .withColumnRenamed(b, rn(b))
    if (broadcastRight) r = broadcast(r)

    val overlap =
      if (inclusive) col(loCol) <= col(rn(rHi)) && col(rn(rLo)) <= col(hiCol)
      else col(loCol) < col(rn(rHi)) && col(rn(rLo)) < col(hiCol)
    // Exactly-once cell: the later-starting side's first cell.
    val firstCell = col(b) === greatest(
      floor(col(loCol) / lit(bucket)).cast("long"),
      floor(col(rn(rLo)) / lit(bucket)).cast("long"))
    val cond = (Seq(col(b) === col(rn(b)), overlap, firstCell) ++
      on.map(k => col(k) === col(rn(k)))).reduce(_ && _)
    val matchedPlain = l.join(r, cond, "inner")
      .select(left.columns.map(col) ++ pay.map(c => col(rn(c)).as(c)): _*)
    if (how == "inner") matchedPlain
    else {
      // the matched frame feeds BOTH the pad-key distinct and the final
      // union — without a persist the cell-explode join would execute
      // twice per action (relying on exchange reuse to dedupe identical
      // subtrees is exactly what the collocations plan audit showed NOT
      // to hold). Output-shaped cache, registered with the compiler's
      // hygiene registry (batch-only path — a lazily-returned frame has
      // no safe self-unpersist point).
      val matched = matchedPlain
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // LEFT: pad non-overlapping left rows with NULL payload. A left
      // row's match set is a pure function of its column VALUES (the
      // join condition reads nothing else), so identical left rows have
      // identical matches — the pad side keys on ALL left columns with
      // NULL-SAFE equality (a matched row carrying an unrelated NULL
      // must not slip through an = key and duplicate) and left_anti
      // preserves the multiplicity of unmatched copies exactly, without
      // a nondeterministic row id. NULL-bound / empty left spans match
      // nothing and so surface here with NULL payload. Cost: one
      // distinct over the matched keys + one anti-join shuffle — output
      // -shaped, never a nested loop.
      val mapCols = left.schema.fields.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      require(mapCols.isEmpty,
        "overlap_join: how \"left\" keys the pad anti-join on every left " +
          s"column, and map-typed column(s) ${mapCols.map(_.name).mkString(", ")} " +
          "cannot be join keys — drop or serialize them upstream")
      val mk = matched.select(left.columns.map(c => col(c).as(rn(c))): _*)
        .distinct()
      val antiCond = left.columns.map(c => col(c) <=> col(rn(c))).reduce(_ && _)
      val padded = left.join(mk, antiCond, "left_anti")
        .select(left.columns.map(col) ++
          pay.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
      graft.compile.Compiler.trackOperatorCache(matched)
      matched.unionByName(padded)
    }
  }

  /** CONTRACT AUDIT: the frame becomes one row per expect-rule —
    * (groupCols…, rule, n_violations, n_rows) — with the `expect` key's
    * exact NULL-is-violation semantics (violation ⇔ NOT coalesce(rule,
    * false)), so audit and fail-fast modes always agree on which rows
    * are bad. Empty frames report 0, never NULL. ONE map-side-combined
    * aggregate pass (per group with `groupCols`), then a rules-sized
    * in-row explode — no per-rule scans. Shared by the `expect_report`
    * batch key and the per-batch streaming monitor. */
  def expectReport(
      df: DataFrame,
      rules: Seq[(String, String)],
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    require(rules.nonEmpty, "expect_report: declare at least one rule")
    val missing = groupCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"expect_report: group column(s) not in the frame: " +
        s"${missing.mkString(", ")} (have: ${df.columns.mkString(", ")})")
    require(groupCols.distinct.size == groupCols.size,
      s"expect_report: duplicate group column(s) " +
        s"${groupCols.diff(groupCols.distinct).distinct.mkString(", ")}")
    val clash = groupCols.filter(c =>
      Seq("rule", "n_violations", "n_rows").contains(c) || c.startsWith("__er_"))
    require(clash.isEmpty,
      s"expect_report: group column(s) ${clash.mkString(", ")} collide with " +
        "the output schema (rule, n_violations, n_rows) — rename upstream")
    val aggs = count(lit(1)).as("__er_rows") +:
      rules.zipWithIndex.map { case ((_, e), i) =>
        coalesce(sum(when(coalesce(expr(e), lit(false)), 0L).otherwise(1L)),
          lit(0L)).as(s"__er_v$i")
      }
    val agged =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val pairs = array(rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__er_v$i").as("n_violations"))
    }: _*)
    agged
      .select(groupCols.map(col) ++ Seq(explode(pairs).as("__er_r"),
        col("__er_rows").as("n_rows")): _*)
      .select(groupCols.map(col) ++ Seq(col("__er_r.rule").as("rule"),
        col("__er_r.n_violations").as("n_violations"), col("n_rows")): _*)
  }

  /** RESAMPLE / GAP-FILL: per key, re-grid an irregular event series
    * onto a REGULAR `step` grid covering [min(ts), max(ts)] of that key
    * — each bucket carries its rows' aggregates, and buckets with no
    * rows materialize per `fill`: "none" (null values), "zero"
    * (coalesce to 0 — counts/sums), "ffill" (carry the last observed
    * value forward — gauge/state series). The classic time-series
    * prep every monitoring/feature pipeline needs before windowed
    * models; the inverse concern of `session_window` (which merges,
    * this regularizes).
    *
    * Bucketing is exact integer arithmetic on epoch micros
    * (um − pmod(um, step) — true floor semantics, no float division),
    * so Spark and any oracle agree bucket-for-bucket. `step` is an
    * interval string; month-granularity steps reject by name (variable
    * length). Per-key grids longer than `maxBucketsPerKey` fail by
    * name — a single key spanning years at 1-second step is a data
    * bug surfacing as an explode, not a plan choice.
    *
    * Scale: one (key, bucket) aggregate of the events (map-side
    * combine), one key-shaped bounds aggregate whose grid explode is
    * grid-shaped (not event-shaped), one equi-join grid←observed, and
    * for ffill one key-partitioned window. No cross joins, nothing
    * driver-side, grids never exceed span/step per key. Batch-only by
    * name (per-key global bounds).
    *
    * `aggs` are (aggregate column, output name) pairs — build with
    * functions (`dsum(col("v")) -> "sum_v"`); the config path feeds
    * the same `aggregations` list as `aggregate`. Output: keys ++
    * tsCol (the bucket start, timestamp) ++ value columns. */
  def resample(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      step: String,
      aggs: Seq[(Column, String)],
      fill: String = "none",
      maxBucketsPerKey: Long = 1L << 20
  ): DataFrame = {
    require(keys.nonEmpty, "resample: need at least one key column")
    require(aggs.nonEmpty, "resample: need at least one aggregation")
    require(Seq("none", "zero", "ffill").contains(fill),
      s"resample: fill must be none/zero/ffill, got '$fill'")
    val iv =
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(step))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"resample: step '$step' is not a valid interval: ${e.getMessage}")
      }
    require(iv.months == 0,
      "resample: month-granularity steps are ambiguous (variable length) — " +
        "use days/hours/minutes/seconds")
    val stepUs = iv.days * 86400000000L + iv.microseconds
    require(stepUs > 0, s"resample: step '$step' must be a positive span")
    val missing = (keys :+ tsCol).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"resample: column(s) not in the frame: ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")

    val b = "__rs_bucket"
    // exact floor bucketing: um − pmod(um, step) (integer, sign-safe)
    val um = unix_micros(col(tsCol))
    val bucketed = df.withColumn(b, um - pmod(um, lit(stepUs)))
    val valueNames = aggs.map(_._2)
    val observed = bucketed.groupBy((keys :+ b).map(col): _*)
      .agg(aggs.head._1.as(aggs.head._2),
        aggs.tail.map { case (c, n) => c.as(n) }: _*)

    val nB = (col("__rs_hi") - col("__rs_lo")) / lit(stepUs) + lit(1L)
    val grid = bucketed.groupBy(keys.map(col): _*)
      .agg(min(col(b)).as("__rs_lo"), max(col(b)).as("__rs_hi"))
      .withColumn(b, explode(when(nB > lit(maxBucketsPerKey),
        raise_error(concat(
          lit(s"resample: a key's grid exceeds $maxBucketsPerKey buckets " +
            s"at step '$step' (span "),
          ((col("__rs_hi") - col("__rs_lo")) / lit(86400000000L)).cast("long")
            .cast("string"),
          lit(" days) — widen step or split the key")))
        .cast("array<bigint>"))
        .otherwise(sequence(col("__rs_lo"), col("__rs_hi"), lit(stepUs)))))
      .drop("__rs_lo", "__rs_hi")

    var out = grid.join(observed, keys :+ b, "left")
    fill match {
      case "zero" =>
        valueNames.foreach { n =>
          val dt = observed.schema(n).dataType
          out = out.withColumn(n, coalesce(col(n), lit(0).cast(dt)))
        }
      case "ffill" =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(b).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        valueNames.foreach { n =>
          out = out.withColumn(n, last(col(n), ignoreNulls = true).over(w))
        }
      case _ => ()
    }
    out.withColumn(tsCol, timestamp_micros(col(b))).drop(b)
      .select(((keys :+ tsCol) ++ valueNames).map(col): _*)
  }

  /** UNPIVOT (melt): wide → long — each row becomes one row per value
    * column, keyed by `ids`, with the column NAME in `varCol` and its
    * value in `valCol`. The inverse of the `pivot` aggregate option and
    * the reshape every per-metric pipeline needs (per-measure quality
    * stats, one-metric-per-row sinks, sparse feature tables).
    *
    * Plans as a single Expand over the scan — ZERO shuffles, no join,
    * streaming-admissible; output is |rows| × |values| and each input
    * row is read once. NULL values are KEPT (a null measurement is a
    * row — filter downstream to drop them; DuckDB's UNPIVOT drops them
    * by default, which is why the oracle mirror is a UNION ALL).
    * `values` defaults to every non-id column; value columns must share
    * a least common type (mixed string/numeric fails by name — cast
    * upstream). */
  def unpivot(
      df: DataFrame,
      ids: Seq[String],
      values: Seq[String] = Nil,
      varCol: String = "variable",
      valCol: String = "value"
  ): DataFrame = {
    require(ids.nonEmpty, "unpivot: need at least one id column")
    val missing = (ids ++ values).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"unpivot: column(s) not in the frame: ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    val vals =
      if (values.nonEmpty) values else df.columns.filterNot(ids.contains).toSeq
    require(vals.nonEmpty,
      "unpivot: no value columns (every column is an id)")
    val overlap = ids.filter(vals.contains)
    require(overlap.isEmpty,
      s"unpivot: column(s) ${overlap.mkString(", ")} listed as both id and value")
    Seq(varCol, valCol).foreach { c =>
      require(!ids.contains(c) && !vals.contains(c),
        s"unpivot: output column '$c' collides with an input column — " +
          "pick var_col/value_col names not in the frame")
    }
    require(varCol != valCol,
      s"unpivot: var_col and value_col are both '$varCol'")
    try df.unpivot(ids.map(col).toArray, vals.map(col).toArray, varCol, valCol)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"unpivot: value columns ${vals.mkString(", ")} do not share a " +
            s"least common type — cast them upstream (${e.getMessage})")
    }
  }

  /** Ordered FUNNEL analysis — the classic event-analytics conversion
    * count ("of the users who viewed, how many then clicked, then
    * purchased?"): per key, step 1 anchors at the FIRST occurrence of
    * `steps(0)`, and step i completes at the earliest `steps(i)` event
    * STRICTLY after step i−1 (same-timestamp events do not chain).
    * `window` (an interval string, e.g. "2 hours") additionally requires
    * every step to land within window of the step-1 anchor — the
    * "converted within N hours" business rule.
    *
    * `anchor` picks between the two industry conventions:
    *  - "first" (default): a key anchors ONCE, at its first `steps(0)`
    *    event — a later step-1 event that would convert better does not
    *    re-anchor; n_keys counts KEYS. The chained-min formulation.
    *  - "every": EVERY distinct (key, step-1 instant) is its own anchor
    *    and converts independently (the "event totals" convention);
    *    n_keys counts surviving ANCHORS, so a key appears once per
    *    qualifying anchor. Duplicate step-1 events at one instant
    *    collapse to one anchor (they would convert identically).
    *
    * Returns one row per step: (step 1-based, event, n_keys) — n_keys
    * monotonically non-increasing down the funnel.
    *
    * Scale: "first" is chained per-key MIN aggregates (no per-key event
    * arrays, no windows over history): step i's frame is the events
    * filtered to ONE event type, joined key-shaped to the step i−1
    * anchors, and min-aggregated — each pass shuffles only that step's
    * events plus key-shaped anchors, with map-side combine. "every"
    * cannot join anchors to events (per-key anchors × events is
    * quadratic on a hot key) — it uses the as-of union-and-carry shape
    * instead: per step, ONE shuffle of |anchors| + |step events| and a
    * per-key sort carries the next-event instant to every anchor, so a
    * key with a million anchors costs sort, never a product. The final
    * output is a union of k single-row counts. Batch-only by name
    * (per-step global counts). */
  def funnel(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      eventCol: String,
      steps: Seq[String],
      window: Option[String] = None,
      anchor: String = "first"
  ): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"funnel: steps must be distinct, got ${steps.mkString(", ")}")
    require(anchor == "first" || anchor == "every",
      s"funnel: anchor must be 'first' or 'every', got '$anchor'")
    // validate the interval eagerly so a typo fails at plan time by name
    val winInterval = window.map { w =>
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      catch { case e: Exception => throw new IllegalArgumentException(
        s"funnel: window '$w' is not a valid interval: ${e.getMessage}") }
    }
    winInterval.foreach { iv =>
      require(iv.months == 0,
        "funnel: month-granularity windows are ambiguous (variable " +
          "length) — use days/hours/minutes")
    }
    val winCol = window.map(w => expr(s"INTERVAL '$w'"))
    val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    if (anchor == "first") {
      // anchor: first occurrence of step 1 per key — (key, t0, t)
      var cur = events.filter(col(eventCol) === steps.head)
        .groupBy(col(keyCol))
        .agg(min(col(tsCol)).as("__t"))
        .withColumn("__t0", col("__t"))
      frames += cur
      steps.tail.foreach { s =>
        val prev = cur.select(col(keyCol), col("__t").as("__prev"), col("__t0"))
        var stepEv = events.filter(col(eventCol) === s)
          .join(prev, Seq(keyCol))
          .filter(col(tsCol) > col("__prev"))
        winCol.foreach(wc => stepEv = stepEv.filter(col(tsCol) <= col("__t0") + wc))
        cur = stepEv.groupBy(col(keyCol))
          .agg(min(col(tsCol)).as("__t"), first(col("__t0")).as("__t0"))
        frames += cur
      }
    } else {
      // anchor = "every": one anchor per DISTINCT (key, step-1 instant).
      // Joining anchors to step events would be per-key anchors × events
      // (quadratic on a hot key) — instead each step is the as-of
      // union-and-carry: anchors (side 1) and that step's events (side 0)
      // union, ONE shuffle on the key, and a per-key-sorted RUNNING
      // window (O(n), never the O(n²) unbounded-following frame)
      // carries the NEXT event instant to every anchor. At an equal
      // instant the event sorts AFTER the anchor in the DESC order and
      // so falls outside the anchor's running frame — which is exactly
      // the STRICTLY-after rule. The carried event past __t is also the
      // MIN qualifying one, so filtering the window bound afterwards is
      // equivalent (any later event is even further from __t0).
      // NULL-timestamp step-1 events never anchor — parity with "first",
      // whose min(ts) ignores NULLs (an unorderable event can't open a
      // funnel; NULL-ts later-step events are skipped by the carry's
      // null handling on both paths)
      var cur = events
        .filter(col(eventCol) === steps.head && col(tsCol).isNotNull)
        .select(col(keyCol), col(tsCol).as("__t")).distinct()
        .withColumn("__t0", col("__t"))
      frames += cur
      steps.tail.foreach { s =>
        val a = cur.select(col(keyCol), col("__t").as("__ats"), col("__t0"))
          .withColumn("__side", lit(1))
        val e = events.filter(col(eventCol) === s)
          .select(col(keyCol), col(tsCol).as("__ats"))
          .withColumn("__side", lit(0))
        val u = a.unionByName(e, allowMissingColumns = true)
        // REVERSED running frame: Spark's [currentRow,
        // unboundedFollowing] frame re-scans the partition remainder
        // per output row — O(n²) on a hot key. Sorting __ats DESC puts
        // later instants first so the O(n) running frame from an anchor
        // sees exactly the events strictly after it: at an equal
        // instant the event must be OUTSIDE the frame (strictly-after
        // rule) → side DESC (anchor 1 before event 0). last(ignoreNulls)
        // over the DESC order IS the min strictly-after event instant.
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col("__ats").desc, col("__side").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        var nxt = u.withColumn("__nxt",
          last(when(col("__side") === 0, col("__ats")), ignoreNulls = true)
            .over(w))
          .filter(col("__side") === 1 && col("__nxt").isNotNull)
        winCol.foreach(wc => nxt = nxt.filter(col("__nxt") <= col("__t0") + wc))
        cur = nxt.select(col(keyCol), col("__nxt").as("__t"), col("__t0"))
        frames += cur
      }
    }
    frames.zip(steps).zipWithIndex.map { case ((f, s), i) =>
      f.agg(count(lit(1)).as("n_keys"))
        .select(lit(i + 1).as("step"), lit(s).as("event"), col("n_keys"))
    }.reduce(_.unionByName(_))
  }

  /** Range (band) join: left rows matched to right rows where
    * `left(probe)` ∈ [right(lo), right(hi)). Right side is expected to be
    * a small bands/dimension table and is broadcast — at scale this is a
    * broadcast nested-loop join over the fact table, no shuffle of the
    * left side at all. For big-big range joins, bucketize both sides on
    * floor(probe/width) first (see `bucketedRangeJoin`). */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      probe: String,
      lo: String,
      hi: String,
      how: String = "inner"
  ): DataFrame =
    left.join(
      broadcast(right),
      left(probe) >= right(lo) && left(probe) < right(hi),
      how)

  /** Big-big range join on interval width `width`: both sides get a
    * bucket key floor(x / width); right intervals spanning k buckets are
    * exploded to one row per covered bucket; then an EQUI-join on the
    * bucket key (shuffle-hash/SMJ, scalable) followed by the residual
    * range predicate. */
  def bucketedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      probe: String,
      lo: String,
      hi: String,
      width: Double
  ): DataFrame = {
    val lb = left.withColumn("__bucket", floor(col(probe) / width))
    val rb = right.withColumn(
      "__bucket",
      explode(sequence(floor(col(lo) / width), floor((col(hi) - 1e-9) / width))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(probe) >= col(lo) && col(probe) < col(hi))
      .drop("__bucket")
  }

  /** [[bucketedRangeJoin]] with the bucket width derived from the data:
    * width = the right side's median interval width, from one
    * `approxQuantile` driver round-trip (bounded metadata — same trust
    * model as IVF centroids). This pins the knob whose mis-setting
    * silently re-creates the O(n²): a width much larger than the typical
    * interval makes every probe meet every interval sharing its bucket
    * (measured on q78's history: 25× the intermediate volume at width
    * 100 vs width ≈ interval width). Width much SMALLER than intervals
    * only costs explode duplication — linear, visible, benign — so the
    * median is a safe default; pass an explicit width when interval
    * sizes are wildly skewed. */
  def bucketedRangeJoinAuto(
      left: DataFrame,
      right: DataFrame,
      probe: String,
      lo: String,
      hi: String
  ): DataFrame = {
    val width = right.select((col(hi) - col(lo)).cast("double").as("__w"))
      .stat.approxQuantile("__w", Array(0.5), 0.01).head
    require(width > 0,
      s"cannot derive a bucket width: median of ($hi - $lo) is $width")
    bucketedRangeJoin(left, right, probe, lo, hi, width)
  }

  /** Two-phase (salted) aggregation for skewed group keys: phase 1 groups
    * by (keys, salt) — the hot key's rows spread over `saltBuckets`
    * reducers — phase 2 merges the partials by key alone. Only needed when
    * ONE key exceeds a reducer; Spark's map-side partial aggregation
    * already handles moderate skew, and AQE handles join skew, but a
    * single 10-TB key in a 100-TB groupBy needs explicit salting. The salt
    * is derived from stable row content (hash of all columns), not rand(),
    * so retried tasks resalt identically. Supports the decomposable
    * functions (sum/count/min/max, dsum). */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[(String, String, String)], // (col, func ∈ sum|count|min|max|dsum, outName)
      saltBuckets: Int
  ): DataFrame = {
    // Content-derived salt caveat: rows of the hot key that are FULLY
    // duplicate (identical in every column — common after narrow
    // projections) hash identically and land in one bucket, so the
    // effective fan-out is capped at the hot key's distinct-row count.
    // That is the price of retry-stability: any per-partition or random
    // component would resalt differently on task replay and double-count.
    require(!df.columns.contains("__salt"),
      "input already has a __salt column — rename it before salting")
    val salted = df.withColumn(
      "__salt", pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
    def phase1(c: String, f: String, o: String): Column = f match {
      case "sum"   => sum(col(c)).as(o)
      case "dsum"  => sum(col(c).cast(DecimalType(25, 6))).as(o)
      case "count" if c == "*" => count(lit(1)).as(o)
      case "count" => count(col(c)).as(o)
      case "min"   => min(col(c)).as(o)
      case "max"   => max(col(c)).as(o)
      case other   => throw new IllegalArgumentException(
        s"'$other' is not decomposable — salting only supports sum/count/min/max/dsum")
    }
    def phase2(c: String, f: String): Column = f match {
      case "sum"          => sum(col(c)).as(c)
      case "dsum"         => sum(col(c)).cast("double").as(c)
      case "count"        => sum(col(c)).as(c) // counts add up
      case "min"          => min(col(c)).as(c)
      case "max"          => max(col(c)).as(c)
      case _              => throw new IllegalStateException
    }
    val p1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1(aggs.head._1, aggs.head._2, aggs.head._3),
        aggs.tail.map(a => phase1(a._1, a._2, a._3)): _*)
    p1.groupBy(keys.map(col): _*)
      .agg(phase2(aggs.head._3, aggs.head._2),
        aggs.tail.map(a => phase2(a._3, a._2)): _*)
  }

  /** Salted equi-join for a skewed key: when ONE join key carries a
    * disproportionate share of the big side's rows, a plain shuffle join
    * lands that key on a single reducer. Salting splits it: the big side
    * gets a content-derived salt in [0, buckets) (hash of ALL its columns —
    * hashing the join key would put the hot key in one bucket again, and
    * rand() would resalt differently on task retry); the small side is
    * replicated once per salt value; the join runs on (keys, salt).
    * Semantics-preserving for inner/left joins — every big-side row meets
    * exactly one copy of each matching small-side row. Right/full joins are
    * rejected: an unmatched small-side row would surface `buckets` times.
    *
    * Cost: small side × `buckets` rows shuffled (it's small — that's the
    * premise); big side shuffles once, now skew-free. AQE's skew-join
    * handles sort-merge skew automatically when it can split partitions —
    * this operator is for when you KNOW the key and want the plan fixed at
    * compile time (or the skew is inside one key, which AQE can't split).
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int,
      how: String = "inner"
  ): DataFrame = {
    require(buckets > 1, s"salting needs buckets > 1, got $buckets")
    require(how == "inner" || how == "left",
      s"salted join preserves semantics only for inner/left, got '$how'")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "input already has a __salt column — rename it before salting")
    // Same fully-duplicate-row caveat as saltedAggregate: identical
    // large-side rows share a salt, capping fan-out at the hot key's
    // distinct-row count (the retry-stability tradeoff).
    val l = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(buckets)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)))) // int elements; matches the cast above
    l.join(s, keys :+ "__salt", how).drop("__salt")
  }

  /** Keyed diff of two corpus snapshots — the curation-iteration
    * primitive: which rows did this pipeline change/add/remove relative
    * to the last run? `newDf` is the current snapshot, `oldDf` the
    * previous one; rows pair on `keys` and compare null-safely on
    * `compare` (default: every column the two frames share, minus the
    * keys, sorted). Output: keys, `statusCol` ∈ added|removed|changed
    * (|unchanged with `includeUnchanged`), `changedCol` = the compared
    * columns that differ (NULL for added/removed — no comparison
    * happened; [] means compared-and-equal), and with
    * `carryNew` the new-side compare columns under their original names
    * (NULL on removed rows) so downstream nodes can act on the delta
    * directly.
    *
    * Scale: ONE full-outer equi-join on the keys — shuffle-partitioned
    * by key, no window over either corpus, no driver data. Both sides
    * project to keys + compared columns before the join, so unselected
    * payload never shuffles. NULL keys fail loudly (a NULL never
    * equi-matches, so such a row would silently surface as added AND
    * removed — the hash_split posture). */
  def snapshotDiff(
      newDf: DataFrame,
      oldDf: DataFrame,
      keys: Seq[String],
      compare: Seq[String] = Nil,
      statusCol: String = "diff_status",
      changedCol: String = "changed_cols",
      includeUnchanged: Boolean = false,
      carryNew: Boolean = false
  ): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff: need at least one key column")
    keys.foreach { k =>
      require(newDf.columns.contains(k) && oldDf.columns.contains(k),
        s"snapshotDiff: key column '$k' must exist in both snapshots")
    }
    val cmp =
      if (compare.nonEmpty) compare
      else (newDf.columns.toSet & oldDf.columns.toSet)
        .diff(keys.toSet).toSeq.sorted
    require(cmp.nonEmpty,
      "snapshotDiff: no columns to compare — the snapshots share no " +
        "non-key columns; pass compare explicitly")
    cmp.foreach { c =>
      require(newDf.columns.contains(c) && oldDf.columns.contains(c),
        s"snapshotDiff: compare column '$c' must exist in both snapshots")
      require(!keys.contains(c),
        s"snapshotDiff: '$c' is a key; keys are paired on, not compared")
      // a type drift between snapshots must be an explicit decision, not
      // an implicit cast — whether 1 (int) "changed" into 1.0 (double)
      // depends on cast semantics the user never chose
      val (nt, ot) = (newDf.schema(c).dataType, oldDf.schema(c).dataType)
      require(nt == ot,
        s"snapshotDiff: compare column '$c' changed TYPE between " +
          s"snapshots (${ot.simpleString} -> ${nt.simpleString}) — cast " +
          "one side explicitly to state the comparison you mean")
    }
    Seq(statusCol, changedCol).foreach { c =>
      require(!keys.contains(c) && !cmp.contains(c),
        s"snapshotDiff: output column '$c' collides with an input column")
    }
    def guard(k: String): Column =
      when(col(k).isNotNull, col(k)).otherwise(raise_error(lit(
        s"snapshotDiff: NULL key in column '$k' — a NULL never " +
          "equi-matches, so the row would diff as added AND removed")))
    val n = newDf.select(
      keys.map(k => guard(k).as(k)) ++
        cmp.map(c => col(c).as(s"__n_$c")) :+ lit(true).as("__n"): _*)
    val o = oldDf.select(
      keys.map(k => guard(k).as(k)) ++
        cmp.map(c => col(c).as(s"__o_$c")) :+ lit(true).as("__o"): _*)
    val j = n.join(o, keys, "full_outer")
    val diffs = cmp.map(c => !(col(s"__n_$c") <=> col(s"__o_$c")))
    val status = when(col("__o").isNull, "added")
      .when(col("__n").isNull, "removed")
      .when(diffs.reduce(_ || _), "changed")
      .otherwise("unchanged")
    // NULL (not []) on added/removed — the comparison never happened
    // there; [] is reserved for genuinely-compared-and-equal (unchanged)
    val changed = when(col("__n").isNotNull && col("__o").isNotNull,
      array_compact(array(cmp.zip(diffs).map { case (c, d) =>
        when(d, lit(c)) }: _*)))
      .otherwise(lit(null).cast("array<string>"))
    val out = j.select(
      keys.map(col) ++ Seq(status.as(statusCol), changed.as(changedCol)) ++
        (if (carryNew) cmp.map(c => col(s"__n_$c").as(c)) else Nil): _*)
    if (includeUnchanged) out
    else out.filter(col(statusCol) =!= "unchanged")
  }

  /** APPLY a snapshot diff — the inverse of [[snapshotDiff]], closing the
    * diff lifecycle: given the BASE (old) snapshot and a DELTA produced
    * by `snapshotDiff(new, old, carryNew = true)`, materialize the NEW
    * snapshot WITHOUT recomputing it — at 100 TB the nightly rebuild
    * becomes "ship the delta, patch at the destination" instead of
    * re-copying the corpus. Round-trip law (tested):
    * `applyDiff(old, snapshotDiff(new, old, carry)) == new`.
    *
    * Contract: `delta` is key-unique (the diff contract — keys identify
    * snapshot rows) and carries `statusCol` plus the new-side payload
    * (`carry: "new"`); a payload-less delta rejects by name (added/
    * changed rows would have no values to land). The base must be
    * exactly keys + payload-shaped: a base column the delta never
    * tracked rejects by name (changed rows could not fill it), as does
    * a payload type drift. Unknown status values raise at run time by
    * name. `changedCol` (if present) is bookkeeping and is dropped.
    *
    * Scale: ONE key-shaped left-anti join (the base shuffles once on
    * the keys; the other side is touched-keys-shaped, i.e. delta-sized)
    * plus a union with the delta's added/changed rows — no windows, no
    * full-outer join, no driver data. */
  def applyDiff(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      statusCol: String = "diff_status",
      changedCol: String = "changed_cols"
  ): DataFrame = {
    require(keys.nonEmpty, "applyDiff: need at least one key column")
    keys.foreach { k =>
      require(base.columns.contains(k) && delta.columns.contains(k),
        s"applyDiff: key column '$k' must exist in both base and delta")
    }
    require(delta.columns.contains(statusCol),
      s"applyDiff: delta has no status column '$statusCol' — apply " +
        "takes a snapshotDiff output (set status_col if it was renamed)")
    val payload = delta.columns.toSeq
      .filterNot(c => keys.contains(c) || c == statusCol || c == changedCol)
    require(payload.nonEmpty,
      "applyDiff: the delta carries no payload columns — run the diff " +
        "with carry: \"new\" so added/changed rows bring their values")
    val missing = payload.filterNot(base.columns.contains)
    require(missing.isEmpty,
      s"applyDiff: delta payload columns ${missing.mkString(", ")} are " +
        "absent from the base — the delta was built against a " +
        "different schema")
    val extra = base.columns.toSeq
      .filterNot(c => keys.contains(c) || payload.contains(c))
    require(extra.isEmpty,
      s"applyDiff: base columns ${extra.mkString(", ")} are not tracked " +
        "by the delta — include them in the diff's compare/carry or " +
        "drop them from the base (changed rows could not fill them)")
    // keys get the same named drift check as payload — a silent
    // union-type promotion on the KEY column would change the patched
    // snapshot's schema with no warning
    (keys ++ payload).foreach { c =>
      val (bt, dt) = (base.schema(c).dataType, delta.schema(c).dataType)
      require(bt == dt,
        s"applyDiff: column '$c' changed TYPE between base and " +
          s"delta (${bt.simpleString} -> ${dt.simpleString}) — cast one " +
          "side explicitly")
    }
    val outCols = keys ++ payload
    // unknown status = a frame that is not a diff output (or a corrupted
    // one) — fail loudly instead of silently dropping those rows
    val checked = when(
      col(statusCol).isin("added", "removed", "changed", "unchanged"),
      col(statusCol))
      .otherwise(raise_error(concat(
        lit(s"applyDiff: unknown $statusCol value '"),
        col(statusCol), lit("' — apply takes a snapshotDiff output"))))
    val affected = delta.select(
      (keys.map(col) :+ checked.as(statusCol)) ++ payload.map(col): _*)
    val touched = affected.filter(col(statusCol) =!= "unchanged")
      .select(keys.map(col): _*)
    val kept = base.select(outCols.map(col): _*)
      .join(touched, keys, "left_anti")
    val landed = affected.filter(col(statusCol).isin("added", "changed"))
      .select(outCols.map(col): _*)
    kept.unionByName(landed)
  }

  /** Windowed running sum with exact decimal accumulation — the window
    * analogue of Tables.dsum. Both Spark and DuckDB evaluate moving sums
    * with engine-specific association (segment trees vs running state), so
    * double running sums are NOT reproducible across engines; decimal is. */
  def runningDSum(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(25, 6))).over(w).cast("double")
}
