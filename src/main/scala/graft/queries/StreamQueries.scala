package graft.queries

import graft.Tables
import graft.Tables.dsumSql
import graft.spec.AggSpec
import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing pack: the same Streaming builders run here in
  * batch mode against the static `events` table (oracle-checked); the
  * streaming execution of identical plans is covered in StreamingSpec.
  */
object StreamQueries extends QueryPack {
  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  private val counts = Seq(
    AggSpec("*", "count", Some("n")),
    AggSpec("value", "dsum", Some("sum_value")))

  // q34 — tumbling 1-hour windows per event_type.
  private def q34(s: SparkSession, dir: String): DataFrame =
    Streaming.windowedAgg(ev(s, dir), "ts", "1 hour", None, Seq("event_type"), counts)
      .orderBy(col("win_start").asc_nulls_first, col("event_type").asc_nulls_first)
  private val q34Sql = s"""
    SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value,
           time_bucket(INTERVAL '1 hour', ts) AS win_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end
    FROM events GROUP BY event_type, win_start
    ORDER BY win_start ASC NULLS FIRST, event_type ASC NULLS FIRST"""

  // q35 — session windows per user, 30-minute gap; session ends at
  // last-event + gap (Spark session_window semantics, mirrored in the
  // oracle's island detection).
  private def q35(s: SparkSession, dir: String): DataFrame =
    Streaming.sessionAgg(ev(s, dir), "ts", "30 minutes", Seq("user_id"), counts)
      .orderBy(col("user_id").asc_nulls_first, col("session_start").asc_nulls_first)
  private val q35Sql = s"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL '30 minutes'
                  THEN 0 ELSE 1 END AS new_session
      FROM events),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id, COUNT(*) AS n, ${dsumSql("value")} AS sum_value,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end
    FROM numbered GROUP BY user_id, sid
    ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST"""

  // q36 — sliding windows: 1-hour duration, 30-minute slide (every event
  // lands in 2 windows). Oracle materializes the two covering windows per
  // event explicitly.
  private def q36(s: SparkSession, dir: String): DataFrame =
    Streaming.windowedAgg(ev(s, dir), "ts", "1 hour", Some("30 minutes"),
        Seq("event_type"), counts)
      .orderBy(col("win_start").asc_nulls_first, col("event_type").asc_nulls_first)
  private val q36Sql = s"""
    WITH expanded AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS win_start
      FROM events, (SELECT unnest([0, 1]) AS k))
    SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value,
           win_start, win_start + INTERVAL '1 hour' AS win_end
    FROM expanded GROUP BY event_type, win_start
    ORDER BY win_start ASC NULLS FIRST, event_type ASC NULLS FIRST"""

  // q37b — interval join (batch mode of the stream-stream joinable plan):
  // each purchase picks up the same user's clicks from the preceding hour.
  private def q37b(s: SparkSession, dir: String): DataFrame = {
    val ev = ev_(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
    Streaming.intervalJoin(
        purchases, clicks, Seq("user_id"),
        leftTs = "p_ts", rightTs = "c_ts", lookback = "1 HOUR")
      .select("purchase_id", "click_id", "user_id", "p_ts", "c_ts")
      .orderBy(col("purchase_id").asc_nulls_first, col("click_id").asc_nulls_first)
  }
  private def ev_(s: SparkSession, dir: String) = graft.Tables.load(s, dir, "events")
  private val q37bSql = """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
           p.ts AS p_ts, c.ts AS c_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
    ORDER BY purchase_id ASC NULLS FIRST, click_id ASC NULLS FIRST"""

  // q63 — session windows from the config language: `session_window` as a
  // derived group key (exactly how `window` powers config tumbling aggs),
  // struct flattened via with_columns and dropped. Same oracle as q35's
  // Scala path. The streaming variant of this spec additionally needs a
  // `watermark` (append-mode session state) and a streaming `save` sink,
  // and no root order_by — the pattern StreamingSpec's config-declared
  // windowed pipeline demonstrates.
  private def q63(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "derive": {"sw": "session_window(ts, '30 minutes')"},
       "aggregate": {"group_by": ["user_id", "sw"],
         "aggregations": [
           {"col": "*", "func": "count", "new_name": "n"},
           {"col": "value", "func": "dsum", "new_name": "sum_value"}]},
       "with_columns": {"session_start": "sw.start", "session_end": "sw.end"},
       "drop": ["sw"],
       "order_by": ["user_id asc", "session_start asc"]}""")

  // q65 — the SAME interval join declared from JSON (`join.how =
  // "interval"` + lookback): purchases pick up the preceding hour's
  // clicks per user. Carries q44's oracle — the config path must be
  // value-identical to the Scala API path. The identical spec with
  // `"stream": true` on the child source and left/right delays runs as a
  // stream-stream join under compileStream (StreamingSpec).
  private def q65(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"id": "purchases",
       "source": {"table": "events"},
       "filters": [{"col": "event_type", "op": "==", "value": "purchase"}],
       "keep_columns": ["event_id", "user_id", "ts"],
       "rename": {"event_id": "purchase_id", "ts": "p_ts"},
       "children": [
         {"id": "clicks",
          "source": {"table": "events"},
          "filters": [{"col": "event_type", "op": "==", "value": "click"}],
          "keep_columns": ["event_id", "user_id", "ts"],
          "rename": {"event_id": "click_id", "ts": "c_ts"},
          "join": {"on": ["user_id"], "how": "interval",
                   "left_ts": "p_ts", "right_ts": "c_ts", "lookback": "1 HOUR"}}],
       "order_by": ["purchase_id asc", "click_id asc"]}""")

  // q224 — PER-ROW sessionization from pure config: `derive` compiles
  // each entry through the full SQL expression parser, which admits
  // WINDOW expressions — so the row-preserving tier under q35/q63's
  // session AGGREGATES (every event keeps its columns and gains its
  // gap-based session ordinal, the shape session-level joins and
  // per-session sequence features consume) needs no dedicated operator:
  // entry 1 flags a session break with lag() (first event per user, or a
  // gap > 30 min since the previous event — the q35 oracle's island
  // rule), entry 2 numbers the sessions with a running sum over the same
  // (user, ts, event_id) order. Later derive entries may reference
  // earlier ones, so the two windows chain inside one projection pipeline
  // — one keys-shaped Exchange + in-task sort, the running_totals batch
  // cost class, spill-safe at any per-user history length. Window
  // expressions are batch-only by nature (Spark rejects them under
  // streams; the streaming spelling of sessions is q63's session_window
  // aggregate with a watermark).
  private def q224(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "derive": {
         "brk": "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) + INTERVAL '30' MINUTE THEN 1 ELSE 0 END",
         "session_id": "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"},
       "keep_columns": ["event_id", "user_id", "ts", "session_id"],
       "order_by": ["event_id asc"]}""")
  private val q224Sql = """
    WITH flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                              + INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events)
    SELECT event_id, user_id, ts,
           CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM flagged
    ORDER BY event_id ASC NULLS FIRST"""

  // q230 — ordered FUNNEL conversion (view → click → purchase within 2
  // hours of the first view): the classic event-analytics question as
  // ONE config key. Semantics are the chained-min formulation — step 1
  // anchors at the FIRST view per user; each later step is the earliest
  // qualifying event STRICTLY after the previous step and within the
  // window of the anchor — which the oracle restates as literal chained
  // MIN CTEs. Scale: per-step frames are (one event type + key-shaped
  // anchors); no per-user event arrays, no windows over history.
  private def q230(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "funnel": {"key_col": "user_id", "ts_col": "ts",
                  "event_col": "event_type",
                  "steps": ["view", "click", "purchase"],
                  "window": "2 hours"},
       "order_by": ["step asc"]}""")
  private val q230Sql = """
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2, MIN(t1.ts1) AS ts1
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
        AND e.ts <= t1.ts1 + INTERVAL '2 hours'
      GROUP BY e.user_id),
    t3 AS (
      SELECT e.user_id
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
        AND e.ts <= t2.ts1 + INTERVAL '2 hours'
      GROUP BY e.user_id)
    SELECT 1 AS step, 'view' AS event, CAST(COUNT(*) AS BIGINT) AS n_keys FROM t1
    UNION ALL
    SELECT 2 AS step, 'click' AS event, CAST(COUNT(*) AS BIGINT) AS n_keys FROM t2
    UNION ALL
    SELECT 3 AS step, 'purchase' AS event, CAST(COUNT(*) AS BIGINT) AS n_keys FROM t3
    ORDER BY step ASC NULLS FIRST"""

  // q249 — the funnel's OTHER industry convention, anchor: "every"
  // ("event totals"): every distinct (user, view instant) is its own
  // anchor and converts independently — n_keys counts anchors, not
  // users. Engine-side this is the union-and-carry shape (one
  // |anchors|+|events| shuffle per step, never an anchors × events
  // product); the oracle restates it as literal per-anchor chained MIN
  // joins (quadratic but exact at oracle scale).
  private def q249(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "funnel": {"key_col": "user_id", "ts_col": "ts",
                  "event_col": "event_type",
                  "steps": ["view", "click", "purchase"],
                  "window": "2 hours", "anchor": "every"},
       "order_by": ["step asc"]}""")
  private val q249Sql = """
    WITH a1 AS (
      SELECT DISTINCT user_id, ts AS t0
      FROM events WHERE event_type = 'view' AND ts IS NOT NULL),
    t2 AS (
      SELECT a.user_id, a.t0, MIN(e.ts) AS ts2
      FROM a1 a JOIN events e ON e.user_id = a.user_id
      WHERE e.event_type = 'click' AND e.ts > a.t0
        AND e.ts <= a.t0 + INTERVAL '2 hours'
      GROUP BY a.user_id, a.t0),
    t3 AS (
      SELECT t.user_id, t.t0
      FROM t2 t JOIN events e ON e.user_id = t.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t.ts2
        AND e.ts <= t.t0 + INTERVAL '2 hours'
      GROUP BY t.user_id, t.t0)
    SELECT 1 AS step, 'view' AS event, CAST(COUNT(*) AS BIGINT) AS n_keys FROM a1
    UNION ALL
    SELECT 2 AS step, 'click' AS event, CAST(COUNT(*) AS BIGINT) AS n_keys FROM t2
    UNION ALL
    SELECT 3 AS step, 'purchase' AS event, CAST(COUNT(*) AS BIGINT) AS n_keys FROM t3
    ORDER BY step ASC NULLS FIRST"""

  // q231 — COHORT RETENTION from pure config (no dedicated operator —
  // q224's window-derive capability closes this whole analytics family):
  // each user's cohort is their first active day (a whole-partition MIN
  // window), each event's day_offset counts days since the cohort day,
  // and the aggregate is the classic retention matrix — distinct active
  // users per (cohort, day_offset). One keys-shaped window Exchange +
  // one aggregate shuffle; the matrix output is (days × days)/2-shaped,
  // never event-shaped.
  private def q231(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "derive": {
         "day": "CAST(date_trunc('DAY', ts) AS DATE)",
         "cohort": "min(day) OVER (PARTITION BY user_id)",
         "day_offset": "datediff(day, cohort)"},
       "aggregate": {"group_by": ["cohort", "day_offset"],
         "aggregations": [
           {"col": "user_id", "func": "count_distinct", "new_name": "n_users"}]},
       "order_by": ["cohort asc", "day_offset asc"]}""")
  private val q231Sql = """
    WITH d AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
    c AS (
      SELECT user_id, day,
             MIN(day) OVER (PARTITION BY user_id) AS cohort
      FROM d)
    SELECT cohort, CAST(date_diff('day', cohort, day) AS INT) AS day_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c
    GROUP BY cohort, day_offset
    ORDER BY cohort ASC NULLS FIRST, day_offset ASC NULLS FIRST"""

  // q255 — next-event TRANSITION matrix from pure config (zero new
  // engine code — the window-derive family closes this too): each event
  // pairs with the SAME user's next event by time (lead over the user
  // partition, totalized by event_id), and the aggregate counts
  // (event_type → next) pairs — the Markov-chain view of product flows
  // that funnel (fixed step list) and sessionize (gap cuts) don't give.
  // One keys-shaped window Exchange + one aggregate with map-side
  // combine; output is (#event_types)²-shaped, never event-shaped.
  private def q255(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "derive": {
         "nxt": "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"},
       "filters": ["nxt IS NOT NULL"],
       "aggregate": {"group_by": ["event_type", "nxt"], "aggregations": [
         {"col": "*", "func": "count", "new_name": "n"}]},
       "order_by": ["event_type asc", "nxt asc"]}""")
  private val q255Sql = """
    WITH nx AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events)
    SELECT event_type, nxt, CAST(COUNT(*) AS BIGINT) AS n
    FROM nx WHERE nxt IS NOT NULL
    GROUP BY event_type, nxt
    ORDER BY event_type ASC NULLS FIRST, nxt ASC NULLS FIRST"""

  // q241 — RESAMPLE / gap-fill, zero policy: each user's event series
  // re-gridded to a regular 6-hour axis over their own [first, last]
  // span; empty buckets materialize with 0 counts/sums (the
  // monitoring-series shape). Exact integer epoch-micros bucketing on
  // both sides — Spark and DuckDB agree bucket-for-bucket by
  // construction, with the grid restated as a correlated
  // generate_series unnest.
  private def q241(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "resample": {"key_cols": ["user_id"], "ts_col": "ts",
                    "step": "6 hours",
                    "aggregations": [
                      {"col": "*", "func": "count", "new_name": "n_events"},
                      {"col": "value", "func": "dsum", "new_name": "sum_value"}],
                    "fill": "zero"},
       "order_by": ["user_id asc", "ts asc"]}""")
  private val q241Sql = s"""
    WITH b AS (
      SELECT user_id,
             epoch_us(ts) - ((epoch_us(ts) % 21600000000) + 21600000000) % 21600000000 AS bu,
             value
      FROM events),
    obs AS (
      SELECT user_id, bu, CAST(COUNT(*) AS BIGINT) AS n_events,
             ${graft.Tables.dsumSql("value")} AS sum_value
      FROM b GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(bu) AS lo, MAX(bu) AS hi FROM b GROUP BY 1),
    grid AS (
      SELECT user_id, lo + 21600000000 * t.g AS bu
      FROM bounds, UNNEST(generate_series(0, CAST((hi - lo) // 21600000000 AS BIGINT))) AS t(g))
    SELECT g.user_id, make_timestamp(g.bu) AS ts,
           COALESCE(o.n_events, 0) AS n_events,
           COALESCE(o.sum_value, 0.0) AS sum_value
    FROM grid g LEFT JOIN obs o USING (user_id, bu)
    ORDER BY user_id ASC NULLS FIRST, ts ASC NULLS FIRST"""

  // q242 — RESAMPLE, forward-fill policy: the gauge/state reading —
  // per-bucket max as the observed level, carried forward across empty
  // buckets (IGNORE NULLS last_value is the DuckDB mirror). Leading
  // buckets before a key's first observation cannot exist (grids start
  // at each key's own min), so ffill is total.
  private def q242(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "resample": {"key_cols": ["user_id"], "ts_col": "ts",
                    "step": "1 day",
                    "aggregations": [
                      {"col": "value", "func": "max", "new_name": "gauge"}],
                    "fill": "ffill"},
       "order_by": ["user_id asc", "ts asc"]}""")
  private val q242Sql = """
    WITH b AS (
      SELECT user_id,
             epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000 AS bu,
             value
      FROM events),
    obs AS (
      SELECT user_id, bu, MAX(value) AS gauge FROM b GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(bu) AS lo, MAX(bu) AS hi FROM b GROUP BY 1),
    grid AS (
      SELECT user_id, lo + 86400000000 * t.g AS bu
      FROM bounds, UNNEST(generate_series(0, CAST((hi - lo) // 86400000000 AS BIGINT))) AS t(g)),
    j AS (
      SELECT g.user_id, g.bu, o.gauge
      FROM grid g LEFT JOIN obs o USING (user_id, bu))
    SELECT user_id, make_timestamp(bu) AS ts,
           last_value(gauge IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bu
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gauge
    FROM j
    ORDER BY user_id ASC NULLS FIRST, ts ASC NULLS FIRST"""

  // q264 — TRAILING-WINDOW features from pure config (zero new engine
  // code — the window-derive family again, now with a time-RANGE frame):
  // per event, the user's activity count and exact decimal value sum
  // over the trailing hour — the burst-detection / rate-limiting /
  // feature-engineering view that row-frames can't express (events are
  // irregular; "last N rows" is not "last hour"). Both engines bound the
  // frame [ts − 1h, ts] inclusively on exact micros and include ALL ties
  // (RANGE semantics), so the count is exact and the DECIMAL(25,6) sum
  // is order-independent — bit-identical without any totalizing trick.
  // One keys-shaped window Exchange; the frame is bounded by data rate,
  // never corpus size.
  private def q264(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "derive": {
         "trail_n": "count(*) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)",
         "trail_sum": "CAST(sum(CAST(value AS DECIMAL(25,6))) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)"},
       "keep_columns": ["user_id", "event_id", "ts", "trail_n", "trail_sum"],
       "order_by": ["user_id asc", "ts asc", "event_id asc"]}""")
  private val q264Sql = """
    SELECT user_id, event_id, ts,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS trail_n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS trail_sum
    FROM events
    ORDER BY user_id ASC NULLS FIRST, ts ASC NULLS FIRST,
             event_id ASC NULLS FIRST"""

  // q265 — RUN-LENGTH islands from pure config (zero new engine code):
  // collapse each user's CONSECUTIVE same-type events into runs with
  // extent and length — the state-change / gaps-and-islands view under
  // q224's sessionization (sessions break on TIME gaps, runs break on
  // VALUE changes). The classic two-window spelling: lag-change flag,
  // running-sum run id, one aggregate; run ids are deterministic because
  // the order (ts, event_id) is totalized. One keys-shaped window
  // Exchange + one map-side-combined aggregate.
  private def q265(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "derive": {
         "brk": "CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS DISTINCT FROM event_type THEN 1 ELSE 0 END",
         "run_id": "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"},
       "aggregate": {"group_by": ["user_id", "run_id", "event_type"],
                     "aggregations": [
         {"col": "*", "func": "count", "new_name": "run_len"},
         {"col": "ts", "func": "min", "new_name": "run_start"},
         {"col": "ts", "func": "max", "new_name": "run_end"}]},
       "order_by": ["user_id asc", "run_id asc"]}""")
  private val q265Sql = """
    WITH f AS (
      SELECT user_id, event_type, ts,
             CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS brk,
             event_id
      FROM events),
    r AS (
      SELECT user_id, event_type, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS run_id
      FROM f)
    SELECT user_id, run_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           MIN(ts) AS run_start, MAX(ts) AS run_end
    FROM r GROUP BY 1, 2, 3
    ORDER BY user_id ASC NULLS FIRST, run_id ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q264_trailing_features", q264, Some(q264Sql)),
    Q("q265_run_length_islands", q265, Some(q265Sql)),
    Q("q34_tumbling_window", q34, Some(q34Sql)),
    Q("q35_session_window", q35, Some(q35Sql)),
    Q("q36_sliding_window", q36, Some(q36Sql)),
    Q("q44_interval_join", q37b, Some(q37bSql)),
    Q("q63_config_session", q63, Some(q35Sql)),
    Q("q65_config_interval", q65, Some(q37bSql)),
    Q("q224_sessionize_rows", q224, Some(q224Sql)),
    Q("q230_funnel", q230, Some(q230Sql)),
    Q("q249_funnel_every", q249, Some(q249Sql)),
    Q("q231_cohort_retention", q231, Some(q231Sql)),
    Q("q255_event_transitions", q255, Some(q255Sql)),
    Q("q241_resample_zero", q241, Some(q241Sql)),
    Q("q242_resample_ffill", q242, Some(q242Sql))
  )
}
