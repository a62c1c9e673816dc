package graft.streaming

import graft.spec.AggSpec
import graft.compile.Compiler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming operators (north-star; `events` is the stream fixture).
  *
  * Each builder takes a plain DataFrame and works identically on a static
  * frame (batch, oracle-checkable) and on a `readStream` frame (the same
  * logical plan compiles to a stateful streaming plan with watermark-based
  * state eviction). That batch/stream symmetry is the test strategy
  * (SURVEY §5.5): the DuckDB oracle validates the batch run; ScalaTest
  * asserts stream-equals-batch on the same input.
  *
  * Scale: streaming aggregation state is partitioned by (group keys,
  * window) — the same shuffle as a batch groupBy; the watermark bounds
  * state size, which is what makes an unbounded stream feasible at all.
  */
object Streaming {

  private def applyAggs(
      grouped: org.apache.spark.sql.RelationalGroupedDataset,
      aggs: Seq[AggSpec]): DataFrame = {
    val exprs = aggs.map(Compiler.aggColumn)
    grouped.agg(exprs.head, exprs.tail: _*)
  }

  /** Tumbling (or, with `slide` < `duration`, sliding/hopping) event-time
    * window aggregation. `watermark` enables append-mode streaming output +
    * state eviction; pass None for batch. Window struct is flattened to
    * win_start/win_end so results are plain columns. */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      duration: String,
      slide: Option[String],
      keys: Seq[String],
      aggs: Seq[AggSpec],
      watermark: Option[String] = None
  ): DataFrame = {
    val in = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val win = slide match {
      case Some(sl) => window(col(tsCol), duration, sl)
      case None     => window(col(tsCol), duration)
    }
    applyAggs(in.groupBy(win +: keys.map(col): _*), aggs)
      .withColumn("win_start", col("window.start"))
      .withColumn("win_end", col("window.end"))
      .drop("window")
  }

  /** Interval join: left rows matched to right rows with the same keys
    * whose `rightTs` falls in [leftTs - lookback, leftTs]. On static
    * frames this is a plain equi-join + range filter; on two streams the
    * SAME plan becomes a stream-stream join where the watermarks plus the
    * time bound let Spark evict join state — the range condition is what
    * makes unbounded stream-stream joins feasible at all (without it,
    * state grows forever). `watermarks` = (left delay, right delay). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      lookback: String,
      watermarks: Option[(String, String)] = None
  ): DataFrame = {
    // Alias both sides before building the condition: when left and right
    // descend from the same source (a self interval join), `l(k) === r(k)`
    // is ambiguous and only works via Spark's best-effort self-join fix-up
    // (it logs "trivially true equals predicate" and silently breaks under
    // lineage changes). Alias-qualified references are unambiguous.
    val l = watermarks.fold(left) { case (wl, _) => left.withWatermark(leftTs, wl) }
      .alias("__ij_l")
    val r = watermarks.fold(right) { case (_, wr) => right.withWatermark(rightTs, wr) }
      .alias("__ij_r")
    val cond = keys.map(k => col(s"__ij_l.$k") === col(s"__ij_r.$k")).reduce(_ && _) &&
      col(s"__ij_r.$rightTs") >= col(s"__ij_l.$leftTs") - expr(s"INTERVAL $lookback") &&
      col(s"__ij_r.$rightTs") <= col(s"__ij_l.$leftTs")
    // keep one copy of each key column (the left one)
    keys.foldLeft(l.join(r, cond, "inner"))((df, k) => df.drop(col(s"__ij_r.$k")))
  }

  /** Streaming deduplication: drops rows whose `keys` already appeared
    * within the watermark horizon — the streaming counterpart of exact
    * dedup for continuous ingestion. State holds one entry per key seen in
    * the horizon; the watermark bounds and evicts it (an unbounded
    * dropDuplicates would grow state forever on an infinite stream). On a
    * static frame this degrades to dropDuplicates(keys). */
  def dedup(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      watermark: Option[String] = None
  ): DataFrame =
    watermark match {
      case Some(w) =>
        df.withWatermark(tsCol, w).dropDuplicatesWithinWatermark(keys)
      case None => df.dropDuplicates(keys)
    }

  /** Session windows: groups rows of one key whose gaps are < `gap`;
    * window = [first event, last event + gap). Streaming state is one
    * open session per key, merged/closed by watermark. */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      gap: String,
      keys: Seq[String],
      aggs: Seq[AggSpec],
      watermark: Option[String] = None
  ): DataFrame = {
    val in = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    applyAggs(in.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*), aggs)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }
}
