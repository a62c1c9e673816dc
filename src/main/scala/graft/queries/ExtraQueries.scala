package graft.queries

import graft.Tables
import graft.Tables.dsumSql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Remaining pipeline utilities: exact percentiles/median, pivot,
  * deterministic hash sampling.
  */
object ExtraQueries extends QueryPack {

  // q38 — exact percentiles + median per group. Exact `percentile` sorts
  // within the aggregate (fine per-group; for global quantiles at 100 TB
  // use approx_percentile instead — exposed but not oracle-comparable).
  private def q38(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 9).as("p50"),
        round(expr("percentile(l_quantity, 0.9)"), 9).as("p90"),
        round(median(col("l_quantity")), 9).as("med"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  private val q38Sql = """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 9) AS p50,
           ROUND(quantile_cont(l_quantity, 0.9), 9) AS p90,
           ROUND(MEDIAN(l_quantity), 9) AS med
    FROM lineitem GROUP BY 1 ORDER BY l_returnflag ASC NULLS FIRST"""

  // q39 — pivot: per-user event_type value sums as columns (explicit value
  // list — at scale an implicit pivot means an extra distinct pass).
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private def q39(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(sum(col("value").cast(DecimalType(25, 6))).cast("double"))
      .orderBy(col("user_id").asc_nulls_first)
  private val q39Sql = {
    val cols = eventTypes.map(t =>
      s"${dsumSql(s"CASE WHEN event_type = '$t' THEN value END")} AS $t").mkString(", ")
    s"""SELECT user_id, $cols FROM events GROUP BY 1
        ORDER BY user_id ASC NULLS FIRST"""
  }

  // The xxhash64 deterministic sampler (keep keys with the hash in the
  // lowest 10% of the modulus space — reproducible across runs/retries,
  // stable under repartitioning, the only sane way to sample at 100 TB)
  // had a rows-only declared entry (q40) until round 9: DuckDB has no
  // xxhash64, so it added no signal beyond q123's per-run rate gate on
  // the same filter expression — retired; ScalaTest keeps determinism.

  // q123 — the xxhash64 sampler's RATE as a driver gate: n_total is
  // exactly pinnable (plain COUNT), and the sampled fraction must sit
  // within 1pp of the declared 10% (≈8σ of binomial noise at sf0.01 —
  // a hash-mixing regression that skews the sample fails the gate; the
  // per-row membership stays rows-only because DuckDB has no xxhash64,
  // and exact-membership coverage lives in q61's portable twin).
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val sampled = li.filter(
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(100)) < 10)
    li.agg(count(lit(1)).as("n_total"))
      .crossJoin(sampled.agg(count(lit(1)).as("__n")))
      .select(col("n_total"),
        (abs(col("__n").cast("double") / col("n_total") - 0.10) < 0.01).as("rate_ok"))
  }
  private val q123Sql =
    "SELECT COUNT(*) AS n_total, TRUE AS rate_ok FROM lineitem"

  // q61 — PORTABLE deterministic sample: multiplicative (Knuth) hash over
  // the key pair — plain BIGINT arithmetic both engines compute
  // identically, so unlike the xxhash64 sampler this one is oracle
  // hash-checked. Same contract: reproducible across runs/retries and
  // stable under repartitioning; use the xxhash64 spelling at scale for
  // better mixing, this one where cross-engine verifiability matters.
  private def q61(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(pmod(col("l_orderkey") * lit(2654435761L) + col("l_linenumber"), lit(100)) < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first)
  private val q61Sql = """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE (l_orderkey * 2654435761 + l_linenumber) % 100 < 10
    ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST"""

  // q62 — per-group top-k from the config language (`top_k` node key):
  // the 3 priciest orders per customer, same semantics as q14's Scala
  // combinator; plans WindowGroupLimit (k rows kept per group map-side).
  private def q62(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "orders"},
       "keep_columns": ["o_custkey", "o_orderkey", "o_totalprice"],
       "top_k": {"partition_by": ["o_custkey"],
                 "order_by": ["o_totalprice desc", "o_orderkey asc"],
                 "k": 3},
       "order_by": ["o_custkey asc", "rn asc"]}""")
  private val q62Sql = """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
      FROM orders) WHERE rn <= 3
    ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST"""

  // q41 — the registered graft functions called FROM the config language:
  // lang_id() in a `derive` expr string (pre-agg computed column) used as
  // a group key. Same oracle shape as q25 (the constants are shared).
  private def q41(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"lang_pred": "lang_id(text)"},
       "group_by": ["lang", "lang_pred"],
       "aggregations": [{"col": "*", "func": "count", "new_name": "n"}],
       "order_by": ["lang asc", "lang_pred asc"]}""")
  private val q41Sql = {
    val scores = graft.ops.TextAnalysis.langMarkers.map { case (lang, ms) =>
      val terms = ms.map(m => s"CAST(list_contains(t, '$m') AS INT)").mkString(" + ")
      lang -> s"($terms)"
    }
    val best = s"GREATEST(${scores.map(_._2).mkString(", ")})"
    val cases = scores
      .map { case (lang, sc) => s"WHEN $sc = $best AND $sc > 0 THEN '$lang'" }
      .mkString(" ")
    s"""
    WITH toks AS (
      SELECT lang,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS t
      FROM documents),
    pred AS (
      SELECT lang, CASE $cases ELSE 'und' END AS lang_pred FROM toks)
    SELECT lang, lang_pred, COUNT(*) AS n FROM pred
    GROUP BY 1, 2 ORDER BY lang ASC NULLS FIRST, lang_pred ASC NULLS FIRST"""
  }

  // q42 — registered vector functions from a config SQL source: pairwise
  // cosine over a key-range slice, filtered and ordered by the config node.
  private def q42(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"sql": "SELECT a.vec_id AS idA, b.vec_id AS idB, ROUND(vector_cosine(a.embedding, b.embedding), 9) AS score FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id WHERE a.vec_id < 20 AND b.vec_id < 20"},
       "filters": [{"col": "score", "op": ">", "value": -2}],
       "order_by": ["idA asc", "idB asc"]}""")
  private val q42Sql = {
    def norm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    def dot(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    s"""
    SELECT a.vec_id AS idA, b.vec_id AS idB,
           ROUND(${dot("a.embedding", "b.embedding")} /
                 (${norm("a.embedding")} * ${norm("b.embedding")}), 9) AS score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 20 AND b.vec_id < 20
    ORDER BY idA ASC NULLS FIRST, idB ASC NULLS FIRST"""
  }

  // q43 — embedding storage path: L2-normalize, int8-quantize (4× smaller),
  // and measure the round-trip cosine per vector. Carries a FULL DuckDB
  // hash oracle (r7; the q70 pattern): every step — normalize's
  // float-cast division, the max|x|/127 double scale, HALF-UP round to
  // tinyint, float-cast dequantize multiply, and the zero-norm-guarded
  // cosine — is exact float/integer arithmetic mirrored verbatim in SQL,
  // IEEE-identical in both engines. The error BOUND stays in ScalaTest.
  private def q43(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Similarity
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        Similarity.quantizeInt8(Similarity.normalize(col("embedding"))).as("q"),
        col("embedding"))
      .select(
        col("vec_id"),
        col("q.scale").as("scale"),
        round(
          Similarity.cosine(col("embedding"), Similarity.dequantizeInt8(col("q"))),
          6).as("roundtrip_cosine"))
      .orderBy(col("vec_id").asc_nulls_first)
  }
  private val q43Sql = {
    // dot/norm mirrors of Similarity.dot (sequential double fold) — same
    // forms as SimQueries.duckCosine, inlined here with the zero-norm
    // guard that Similarity.cosine carries.
    def norm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    def dot(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    s"""
    WITH norms AS (
      SELECT vec_id, embedding, ${norm("embedding")} AS n
      FROM embeddings),
    nv AS ( -- Similarity.normalize: per-element float-cast divide, 0.0f on zero norm
      SELECT vec_id, embedding,
             list_transform(embedding, x -> CASE WHEN n > 0
               THEN CAST(CAST(x AS DOUBLE) / n AS FLOAT)
               ELSE CAST(0.0 AS FLOAT) END) AS nvec
      FROM norms),
    quant AS ( -- Similarity.quantizeInt8: scale = max|x| (double) / 127
      SELECT vec_id, embedding, nvec,
             CAST(list_max(list_transform(nvec, x -> abs(x))) AS DOUBLE)
               / CAST(127.0 AS DOUBLE) AS scale_d
      FROM nv),
    q AS (
      SELECT vec_id, embedding, CAST(scale_d AS FLOAT) AS scale,
             CASE WHEN scale_d > 0
                  THEN list_transform(nvec,
                         x -> CAST(round(CAST(x AS DOUBLE) / scale_d) AS TINYINT))
                  ELSE list_transform(nvec, x -> CAST(0 AS TINYINT)) END AS data
      FROM quant),
    deq AS ( -- Similarity.dequantizeInt8: byte × float-cast scale, float cast
      SELECT vec_id, embedding, scale,
             list_transform(data,
               b -> CAST(CAST(b AS DOUBLE) * CAST(scale AS DOUBLE) AS FLOAT)) AS dv
      FROM q)
    SELECT vec_id, scale,
           ROUND(CASE WHEN ${norm("embedding")} > 0 AND ${norm("dv")} > 0
                 THEN ${dot("embedding", "dv")} / (${norm("embedding")} * ${norm("dv")})
                 ELSE 0.0 END, 6) AS roundtrip_cosine
    FROM deq
    ORDER BY vec_id ASC NULLS FIRST"""
  }

  // q47 — percentile from the config language (AggSpec.param carries the
  // percentage). Exact `percentile` matches DuckDB's quantile_cont (both
  // linear-interpolate); rounded to 9 for float determinism like q38.
  private def q47(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "orders"},
       "aggregate": {"group_by": ["o_orderpriority"],
         "aggregations": [
           {"col": "o_totalprice", "func": "percentile", "param": 0.5, "new_name": "p50"},
           {"col": "o_totalprice", "func": "percentile", "param": 0.9, "new_name": "p90"}]},
       "with_columns": {"p50": "round(p50, 9)", "p90": "round(p90, 9)"},
       "order_by": ["o_orderpriority asc"]}""")
  private val q47Sql = """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 9) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 9) AS p90
    FROM orders GROUP BY 1 ORDER BY o_orderpriority ASC NULLS FIRST"""

  // q48 — arbitrary GROUPING SETS from the config language: per-flag,
  // per-status, and grand-total subtotals in one pass (rollup/cube can't
  // express this set list). One shuffle; Spark expands sets map-side.
  private def q48(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "lineitem"},
       "aggregate": {"group_by": ["l_returnflag", "l_linestatus"],
         "sets": [["l_returnflag"], ["l_linestatus"], []],
         "aggregations": [
           {"col": "l_quantity", "func": "dsum", "new_name": "sum_qty"},
           {"col": "*", "func": "count", "new_name": "n"}]},
       "order_by": ["l_returnflag asc", "l_linestatus asc"]}""")
  private val q48Sql = s"""
    SELECT l_returnflag, l_linestatus,
           ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  // (q49, the rows-only config approx_percentile entry, is retired: its
  // hash-green bounded-estimate twin q103 gates the same GK sketch per
  // driver run, and the config-surface `approx_percentile` func spelling
  // stays covered by CompilerSpec's exact-vs-approx bound test.)

  // q50 — window functions from the config language: `with_columns` expr
  // strings parse full `... OVER (...)` syntax, so ranking/lag/running
  // aggregates need no dedicated spec key. The three windows share one
  // partition+order → Catalyst's CollapseWindow folds them into a single
  // Window operator (one shuffle+sort). Running sum goes through decimal
  // for cross-engine determinism (same rationale as q13).
  private def q50(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "lineitem"},
       "filters": ["l_suppkey <= 10"],
       "keep_columns": ["l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"],
       "with_columns": {
         "rn": "row_number() over (partition by l_suppkey order by l_orderkey asc, l_linenumber asc)",
         "prev_qty": "lag(l_quantity, 1) over (partition by l_suppkey order by l_orderkey asc, l_linenumber asc)",
         "running_qty": "cast(sum(cast(l_quantity as decimal(25,6))) over (partition by l_suppkey order by l_orderkey asc, l_linenumber asc rows between unbounded preceding and current row) as double)"},
       "order_by": ["l_suppkey asc", "rn asc"]}""")
  private val q50Sql = """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           LAG(l_quantity, 1) OVER w AS prev_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6)))
                OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_qty
    FROM lineitem WHERE l_suppkey <= 10
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey ASC, l_linenumber ASC)
    ORDER BY l_suppkey ASC NULLS FIRST, rn ASC NULLS FIRST"""

  // q54 — salted aggregation from the config language: "salt": 8 spreads
  // each group over 8 reducers (phase 1) and merges partials (phase 2) —
  // the explicit-skew escape hatch for a single hot key that exceeds one
  // reducer. Results are identical to the plain groupBy (dsum keeps the
  // double sum exact under the extra merge), so the oracle is the plain
  // SQL — the hash-compare proves salting is semantics-preserving.
  private def q54(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "lineitem"},
       "aggregate": {"group_by": ["l_returnflag"], "salt": 8,
         "aggregations": [
           {"col": "l_quantity", "func": "dsum", "new_name": "sum_qty"},
           {"col": "*", "func": "count", "new_name": "n"},
           {"col": "l_extendedprice", "func": "max", "new_name": "max_price"}]},
       "order_by": ["l_returnflag asc"]}""")
  private val q54Sql = s"""
    SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
           COUNT(*) AS n, MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY 1 ORDER BY l_returnflag ASC NULLS FIRST"""

  // q55 — theta join from the config language: `join.on_expr` carries an
  // arbitrary boolean condition (here an inequality band on price). The
  // child side is broadcast-hinted — a pure-inequality join plans as a
  // nested loop, and broadcasting the small side is the only shape that
  // survives scale (the alternative for big-big bands is
  // Relational.bucketedRangeJoin).
  private def q55(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "orders"},
       "filters": ["o_orderkey <= 200"],
       "keep_columns": ["o_orderkey", "o_totalprice"],
       "children": [{
          "id": "c1", "prefix": true, "hint": "broadcast",
          "source": {"table": "orders"},
          "filters": ["o_orderkey <= 200"],
          "keep_columns": ["o_orderkey", "o_totalprice"],
          "join": {"how": "inner",
                   "on_expr": "o_orderkey < c1_o_orderkey AND abs(o_totalprice - c1_o_totalprice) < 100"}}],
       "order_by": ["o_orderkey asc", "c1_o_orderkey asc"]}""")
  private val q55Sql = """
    SELECT a.o_orderkey, a.o_totalprice,
           b.o_orderkey AS c1_o_orderkey, b.o_totalprice AS c1_o_totalprice
    FROM orders a JOIN orders b
      ON a.o_orderkey < b.o_orderkey AND ABS(a.o_totalprice - b.o_totalprice) < 100
    WHERE a.o_orderkey <= 200 AND b.o_orderkey <= 200
    ORDER BY a.o_orderkey ASC NULLS FIRST, c1_o_orderkey ASC NULLS FIRST"""

  // q56 — generator columns from the config language: `derive` admits one
  // generator per column (explode of the registered `tokens` function),
  // turning a doc table into a token table — the config spelling of
  // explode+groupBy token counting.
  private def q56(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "filters": ["doc_id < 20"],
       "derive": {"tok": "explode(tokens(text))"},
       "group_by": ["tok"],
       "aggregations": [{"col": "*", "func": "count", "new_name": "n"}],
       "order_by": ["tok asc"]}""")
  private val q56Sql = """
    SELECT tok, COUNT(*) AS n FROM (
      SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> len(x) > 0)) AS tok
      FROM documents WHERE doc_id < 20)
    GROUP BY 1 ORDER BY tok ASC NULLS FIRST"""

  // q57 — set operations as a config node: `combine` feeds the node the
  // union/intersect/except of full child pipelines instead of one source.
  // Two overlapping orders slices, deduped, re-aggregated.
  private def q57(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"id": "u",
       "combine": {"op": "union_distinct", "nodes": [
         {"source": {"table": "orders"},
          "filters": ["o_orderkey <= 600"],
          "keep_columns": ["o_orderkey", "o_orderstatus", "o_totalprice"]},
         {"source": {"table": "orders"},
          "filters": ["o_orderkey >= 400 AND o_orderkey <= 1000"],
          "keep_columns": ["o_orderkey", "o_orderstatus", "o_totalprice"]}]},
       "group_by": ["o_orderstatus"],
       "aggregations": [{"col": "*", "func": "count", "new_name": "n"},
                        {"col": "o_totalprice", "func": "dsum", "new_name": "sum_price"}],
       "order_by": ["o_orderstatus asc"]}""")
  private val q57Sql = s"""
    WITH u AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 600
      UNION
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey >= 400 AND o_orderkey <= 1000)
    SELECT o_orderstatus, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
    FROM u GROUP BY 1 ORDER BY o_orderstatus ASC NULLS FIRST"""

  // q58 — as-of join from the config language (join.how = "asof"): each
  // purchase picks up the latest prior signup/login of the same user.
  // Same union-and-carry-forward plan as q22's Scala API; DuckDB's native
  // ASOF JOIN is the oracle.
  private def q58(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "filters": [{"col": "event_type", "op": "==", "value": "purchase"}],
       "keep_columns": ["event_id", "user_id", "ts", "value"],
       "children": [{
          "id": "logins",
          "source": {"table": "events"},
          "filters": [{"col": "event_type", "op": "isin", "value": ["signup", "login"]}],
          "aggregate": {"group_by": ["user_id", "ts"],
            "aggregations": [{"col": "event_id", "func": "max", "new_name": "login_event_id"}]},
          "join": {"how": "asof", "on": ["user_id"], "left_ts": "ts", "right_ts": "ts"}}],
       "order_by": ["event_id asc"]}""")
  private val q58Sql = """
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
    logins AS (
      SELECT user_id, ts, MAX(event_id) AS login_event_id
      FROM events WHERE event_type IN ('signup', 'login') GROUP BY 1, 2)
    SELECT p.event_id, p.user_id, p.ts, p.value, l.login_event_id
    FROM purchases p ASOF LEFT JOIN logins l
      ON p.user_id = l.user_id AND p.ts >= l.ts
    ORDER BY p.event_id ASC NULLS FIRST"""

  // q239 — FORWARD as-of with tolerance (time-to-convert): each
  // signup/login picks up the user's NEXT purchase, but only if it lands
  // within 2 hours — pandas merge_asof(direction="forward",
  // tolerance=...) as two config keys on the same union-and-carry plan
  // (ONE shuffle; the tolerance is a post-predicate on the carried
  // match timestamp, not a second pass). DuckDB's ASOF with the
  // flipped inequality + a CASE mirror the pair.
  private def q239(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "filters": [{"col": "event_type", "op": "isin", "value": ["signup", "login"]}],
       "keep_columns": ["event_id", "user_id", "ts"],
       "children": [{
          "id": "buys",
          "source": {"table": "events"},
          "filters": [{"col": "event_type", "op": "==", "value": "purchase"}],
          "aggregate": {"group_by": ["user_id", "ts"],
            "aggregations": [{"col": "event_id", "func": "max", "new_name": "purchase_event_id"}]},
          "join": {"how": "asof", "on": ["user_id"], "left_ts": "ts",
                   "right_ts": "ts", "direction": "forward",
                   "tolerance": "INTERVAL '2 hours'"}}],
       "order_by": ["event_id asc"]}""")
  private val q239Sql = """
    WITH logins AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type IN ('signup', 'login')),
    buys AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN b.ts - l.ts <= INTERVAL '2 hours'
                THEN b.purchase_event_id END AS purchase_event_id
    FROM logins l ASOF LEFT JOIN buys b
      ON l.user_id = b.user_id AND l.ts <= b.ts
    ORDER BY l.event_id ASC NULLS FIRST"""

  // q240 — NEAREST as-of: each login matched to the temporally closest
  // purchase on either side (ties → backward, the pandas rule). The
  // oracle runs BOTH DuckDB ASOF directions and restates the
  // closer-side choice as arithmetic.
  private def q240(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "filters": [{"col": "event_type", "op": "isin", "value": ["signup", "login"]}],
       "keep_columns": ["event_id", "user_id", "ts"],
       "children": [{
          "id": "buys",
          "source": {"table": "events"},
          "filters": [{"col": "event_type", "op": "==", "value": "purchase"}],
          "aggregate": {"group_by": ["user_id", "ts"],
            "aggregations": [{"col": "event_id", "func": "max", "new_name": "purchase_event_id"}]},
          "join": {"how": "asof", "on": ["user_id"], "left_ts": "ts",
                   "right_ts": "ts", "direction": "nearest"}}],
       "order_by": ["event_id asc"]}""")
  private val q240Sql = """
    WITH logins AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type IN ('signup', 'login')),
    buys AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    bk AS (
      SELECT l.event_id, b.ts AS bts, b.purchase_event_id AS bid
      FROM logins l ASOF LEFT JOIN buys b
        ON l.user_id = b.user_id AND l.ts >= b.ts),
    fw AS (
      SELECT l.event_id, b.ts AS fts, b.purchase_event_id AS fid
      FROM logins l ASOF LEFT JOIN buys b
        ON l.user_id = b.user_id AND l.ts <= b.ts)
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN bk.bts IS NOT NULL AND
                     (fw.fts IS NULL OR l.ts - bk.bts <= fw.fts - l.ts)
                THEN bk.bid ELSE fw.fid END AS purchase_event_id
    FROM logins l
    LEFT JOIN bk ON l.event_id = bk.event_id
    LEFT JOIN fw ON l.event_id = fw.event_id
    ORDER BY l.event_id ASC NULLS FIRST"""

  // q59 — pivot from the config language: explicit value list (an implicit
  // pivot would pay a distinct pass to discover columns), dsum cells for
  // determinism. Same shape as q39's Scala API; with a single aggregation
  // the pivoted columns are named by the bare pivot values.
  private def q59(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "aggregate": {"group_by": ["user_id"],
         "pivot": {"col": "event_type",
                   "values": ["click", "error", "purchase", "signup", "view"]},
         "aggregations": [{"col": "value", "func": "dsum", "new_name": "s"}]},
       "order_by": ["user_id asc"]}""")
  private val q59Sql = {
    val cols = eventTypes.map(t =>
      s"${dsumSql(s"CASE WHEN event_type = '$t' THEN value END")} AS $t").mkString(", ")
    s"""SELECT user_id, $cols FROM events GROUP BY 1
        ORDER BY user_id ASC NULLS FIRST"""
  }

  // q232 — row-level DATA CONTRACTS (`expect`): the CHECK-constraint
  // shape — each rule rides the scan as a filter that is TRUE for
  // passing rows and raise_error for violations, so a contract costs
  // zero extra passes and a violating pipeline fails loudly by rule
  // name (CompilerSpec proves the raise; this query proves the pass
  // path is a pure no-op: the oracle is the same query WITHOUT the
  // contracts, and satisfied expectations must leave every byte of the
  // result untouched).
  private def q232(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "lineitem"},
       "filters": [{"col": "l_quantity", "op": ">", "value": 45}],
       "keep_columns": ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
       "expect": {
         "qty_in_band": "l_quantity > 45 AND l_quantity <= 50",
         "price_positive": "l_extendedprice > 0",
         "keys_present": "l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL"},
       "order_by": ["l_orderkey asc", "l_linenumber asc"]}""")
  }
  private val q232Sql = """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 45
    ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST"""

  // q248 — statistical outlier screening from PURE config (zero new
  // engine code): per-group z-scores via chained window-derive entries,
  // filtered to the tails — the data-quality sweep that flags mis-parsed
  // rows before they poison training statistics. The sd comes from raw
  // SUM/COUNT moments, not stddev_samp: the quantities are
  // integer-valued, so the window sums are EXACT in both engines and
  // the derived z is bit-identical — a naive stddev_samp differs in the
  // engines' streaming algorithms and flips tail-boundary rows (the
  // deterministic-under-retries rule from SCALE.md applied to a score).
  private def q248(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "lineitem"},
       "derive": {
         "s1": "sum(l_quantity) OVER (PARTITION BY l_returnflag)",
         "s2": "sum(l_quantity * l_quantity) OVER (PARTITION BY l_returnflag)",
         "n":  "count(1) OVER (PARTITION BY l_returnflag)",
         "z":  "round((l_quantity - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)"},
       "filters": ["abs(z) > 1.6"],
       "keep_columns": ["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_quantity", "z"],
       "order_by": ["l_orderkey asc", "l_linenumber asc",
                    "l_returnflag asc", "l_quantity asc"]}""")
  private val q248Sql = """
    WITH zs AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             ROUND((l_quantity - s1 / n)
                   / SQRT((s2 - s1 * s1 / n) / (n - 1)), 6) AS z
      FROM (
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS s1,
               SUM(l_quantity * l_quantity)
                 OVER (PARTITION BY l_returnflag) AS s2,
               CAST(COUNT(*) OVER (PARTITION BY l_returnflag)
                    AS DOUBLE) AS n
        FROM lineitem))
    SELECT * FROM zs WHERE ABS(z) > 1.6
    ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
             l_returnflag ASC NULLS FIRST, l_quantity ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q248_outlier_screen", q248, Some(q248Sql)),
    Q("q232_expect_contracts", q232, Some(q232Sql)),
    Q("q38_percentiles", q38, Some(q38Sql)),
    Q("q39_pivot", q39, Some(q39Sql)),
    Q("q41_config_langid", q41, Some(q41Sql)),
    Q("q42_config_vector_sql", q42, Some(q42Sql)),
    Q("q43_embedding_quantize", q43, Some(q43Sql)),
    Q("q47_config_percentile", q47, Some(q47Sql)),
    Q("q48_grouping_sets", q48, Some(q48Sql)),
    Q("q50_config_window", q50, Some(q50Sql)),
    Q("q54_salted_agg", q54, Some(q54Sql)),
    Q("q55_config_theta_join", q55, Some(q55Sql)),
    Q("q56_config_explode", q56, Some(q56Sql)),
    Q("q57_config_setops", q57, Some(q57Sql)),
    Q("q58_config_asof", q58, Some(q58Sql)),
    Q("q239_asof_forward_tol", q239, Some(q239Sql)),
    Q("q240_asof_nearest", q240, Some(q240Sql)),
    Q("q59_config_pivot", q59, Some(q59Sql)),
    Q("q61_portable_sample", q61, Some(q61Sql)),
    Q("q62_config_topk", q62, Some(q62Sql)),
    Q("q78_bucketed_range_join", q78, Some(q78Sql)),
    Q("q79_changelog_compact", q79, Some(q79Sql)),
    Q("q83_zorder_key", q83, Some(q83Sql)),
    Q("q102_approx_distinct_bound", q102, Some(q102Sql)),
    Q("q123_hash_sample_rate_gate", q123, Some(q123Sql)),
    Q("q103_approx_percentile_bound", q103, Some(q103Sql)),
    Q("q104_hll_union_bound", q104, Some(q104Sql)),
    Q("q160_cms_watchlist_bound", q160, Some(q160Sql)),
    Q("q161_config_cms_gate", q161, Some(q160Sql)),
    Q("q84_config_compact", q84, Some(q79Sql)),
    Q("q85_config_scrub", q85, Some(CorpusQueries.q81Sql)),
    Q("q86_config_sample", q86, Some(q86Sql)),
    Q("q87_config_zorder", q87, Some(q83Sql)),
    Q("q95_config_layout", q95, Some(q95Sql)),
    Q("q91_config_boilerplate", q91, Some(CorpusQueries.q90Sql))
  )

  // q84 — q79's changelog compaction declared as pure JSON (`compact` node
  // key). Same oracle as q79: the config path must hash-match the Scala
  // API path exactly.
  private def q84(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "keep_columns": ["user_id", "event_id", "ts", "event_type", "value"],
       "compact": {"keys": ["user_id"],
                   "version_order": ["ts desc", "event_id desc"],
                   "delete_when": "event_type = 'error'"},
       "order_by": ["user_id asc"]}""")

  // q85 — q81's PII scrub from the config language: the registered
  // scrub_pii/pii_count functions make the privacy pass one `derive`
  // entry. Same generated oracle as q81.
  private def q85(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "events"},
       "derive": {"scrubbed": "scrub_pii(props)", "n_pii": "pii_count(props)"},
       "keep_columns": ["event_id", "scrubbed", "n_pii"],
       "order_by": ["event_id asc"]}""")

  // q86 — stratified sample from the config language: derive the portable
  // hash rank, then `top_k` partitioned by stratum — config spelling of
  // q80/Corpus.stratifiedSample (rank column kept; it's part of the
  // declared output here, unlike the operator which drops it).
  private def q86(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"h": "(doc_id * 2654435761) % 1000000007"},
       "keep_columns": ["doc_id", "lang", "source", "h"],
       "top_k": {"partition_by": ["lang"],
                 "order_by": ["h asc", "doc_id asc"], "k": 25},
       "order_by": ["lang asc", "doc_id asc"]}""")
  private val q86Sql = """
    WITH ranked AS (
      SELECT doc_id, lang, source,
             (doc_id * 2654435761) % 1000000007 AS h,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY (doc_id * 2654435761) % 1000000007 ASC, doc_id ASC) AS rn
      FROM documents)
    SELECT doc_id, lang, source, h, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 25
    ORDER BY lang ASC NULLS FIRST, doc_id ASC NULLS FIRST"""

  // q87 — q83's z-order key from the config language: the registered
  // `zorder` function in a `derive` entry. Same oracle as q83.
  private def q87(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "lineitem"},
       "filters": ["l_orderkey % 50 = 0"],
       "derive": {"z": "zorder(l_partkey % 256, l_suppkey % 256, 8)"},
       "keep_columns": ["l_orderkey", "l_linenumber", "z"],
       "order_by": ["z asc", "l_orderkey asc", "l_linenumber asc"]}""")

  // q95 — config-surface LAYOUT sink end-to-end: the JSON pipeline writes
  // documents hive-partitioned by lang (save.partition_by →
  // Layout.writePartitioned) and the query reads the PARTITIONED output
  // back and aggregates per lang. The oracle runs on the ORIGINAL table,
  // so the hash-match proves the layout round-trip is lossless — values,
  // types and the partition column itself (which parquet re-derives from
  // directory names). Partition pruning on this layout is asserted in
  // LayoutSpec; this query gates the config plumbing.
  private def q95(s: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_q95_layout"
    graft.compile.Compiler.compileJson(s, s"""
      {"source": {"table": "documents"},
       "keep_columns": ["doc_id", "lang", "source", "n_chars"],
       "save": {"path": "$out", "partition_by": ["lang"]}}""")
    s.read.parquet(out)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("lang").asc_nulls_first)
  }
  private val q95Sql = """
    SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents GROUP BY 1 ORDER BY lang ASC NULLS FIRST"""

  // q91 — q90's boilerplate line removal as pure JSON: the planted
  // header/body/footer construction is one `derive` expr, the removal is
  // the `boilerplate` node key. Same oracle as q90 — config path must
  // hash-match the Scala API path.
  private def q91(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"mtext": "concat_ws('\n', 'subscribe to our newsletter', replace(text, ' the ', '\n'), concat('(c) footer ', source))"},
       "boilerplate": {"id_col": "doc_id", "text_col": "mtext",
                       "max_docs": 20},
       "order_by": ["doc_id asc"]}""")

  // q78 — BIG-BIG range join via interval bucketing: lineitem prices
  // probed against per-part price bands [0.995·retail, 1.005·retail). The
  // naive formulation is a nested-loop theta join — O(|L|·|R|) pair
  // evaluations, and broadcast-only (q55's shape, fine for a small band
  // table, fatal for two big sides). Bucketing gives the scale shape:
  // each band explodes into the width-20 buckets it covers, both sides
  // EQUI-join on the bucket key (SMJ/shuffle-hash — candidates-shaped
  // shuffle), and the exact predicate re-filters. The oracle is the plain
  // theta join — the hash-match proves bucketing is invisible to
  // semantics, the same proof pattern as q54/q76 for salting.
  //
  // Width vs band width: the bucket width (20) is chosen ≈ the band
  // width (~15 at retail≈1500), so a probe meets only the 1-2 bucket's
  // worth of bands adjacent to its price — candidate volume ≈ true
  // matches × ~2. A coarse width re-creates the n²: at width 100 with
  // ±10% bands this query's intermediate was ~25× larger (measured 7.5 s
  // vs 0.8 s at sf0.1) — the knob matters as much as the shape.
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select("l_extendedprice", "l_quantity")
    val bands = Tables.load(s, dir, "part").select(col("p_partkey"),
      (col("p_retailprice") * 0.995).as("lo"), (col("p_retailprice") * 1.005).as("hi"))
    graft.ops.Relational
      .bucketedRangeJoin(li, bands, "l_extendedprice", "lo", "hi", width = 20.0)
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_li"), Tables.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_partkey").asc_nulls_first)
  }
  private val q78Sql = s"""
    SELECT p_partkey, CAST(COUNT(*) AS BIGINT) AS n_li,
           ${dsumSql("l_quantity")} AS sum_qty
    FROM lineitem JOIN part
      ON l_extendedprice >= p_retailprice * 0.995
     AND l_extendedprice <  p_retailprice * 1.005
    GROUP BY 1 ORDER BY p_partkey ASC NULLS FIRST"""

  // q79 — changelog/CDC compaction to a point-in-time snapshot: events
  // replayed as an upsert stream keyed by user ((ts, event_id) = version;
  // 'error' plays the tombstone). Latest version per key wins; a key whose
  // latest record is a tombstone disappears — and its OLDER live versions
  // must not resurface, which is why the delete filter runs after the
  // rank (see Relational.compactChangelog). WindowGroupLimit keeps the
  // shuffle keys-shaped.
  private def q79(s: SparkSession, dir: String): DataFrame =
    graft.ops.Relational.compactChangelog(
        Tables.load(s, dir, "events")
          .select("user_id", "event_id", "ts", "event_type", "value"),
        keys = Seq("user_id"),
        versionOrder = Seq(col("ts").desc, col("event_id").desc),
        isDelete = col("event_type") === "error")
      .orderBy(col("user_id").asc_nulls_first)
  private val q79Sql = """
    WITH ranked AS (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
      FROM events)
    SELECT user_id, event_id, ts, event_type, value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id ASC NULLS FIRST"""

  // (q82, the rows-only Datasketches-HLL merge entry, is retired: its
  // hash-green bounded twin q104 gates the same hll_sketch_agg /
  // hll_union_agg algebra — per-slice AND merged corpus-wide estimates —
  // per driver run; OpsSpec keeps the ≤2% error and union==sketch-of-union
  // invariants.)

  // q83 — z-order key (the layout sort key behind Layout.writeZOrdered),
  // oracle-checked BIT-FOR-BIT: the Scala expression and the SQL mirror
  // are generated from the same bit-placement spec (Layout.zorderValue /
  // Layout.zorderSql), so the interleave cannot drift between engines.
  // Pure shift/mask arithmetic — whole-stage codegen, scan-stage.
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val z = graft.ops.Layout.zorderValue(
      Seq(pmod(col("l_partkey"), lit(256L)), pmod(col("l_suppkey"), lit(256L))),
      bits = 8)
    Tables.load(s, dir, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(50L)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"), z.as("z"))
      .orderBy(col("z").asc_nulls_first, col("l_orderkey").asc_nulls_first,
        col("l_linenumber").asc_nulls_first)
  }
  private val q83Sql = {
    val z = graft.ops.Layout.zorderSql(Seq("(l_partkey % 256)", "(l_suppkey % 256)"), 8)
    s"""SELECT l_orderkey, l_linenumber, $z AS z
        FROM lineitem WHERE l_orderkey % 50 = 0
        ORDER BY z ASC NULLS FIRST, l_orderkey ASC NULLS FIRST,
                 l_linenumber ASC NULLS FIRST"""
  }

  // ---- bounded-estimate gates -------------------------------------------
  // q16/q49/q82 emit RAW sketch estimates (rows-only gates — two engines'
  // sketches differ by design). These twins make the ESTIMATE QUALITY a
  // driver-verified fact: Spark computes estimate AND exact, emits the
  // exact value plus an in-tolerance boolean; the DuckDB oracle computes
  // the same exact value with TRUE. A drifting sketch flips the boolean
  // and fails the hash gate — the tolerance invariant is cross-checked
  // per run, not just in ScalaTest. Deterministic: both sketches are
  // deterministic functions of the data; tolerances sit ≥3 sigma out.

  // q102 — HLL++ per-group distinct within 5% of exact (rsd 0.01 → 5% is
  // 5σ). Approx and exact stay in SEPARATE aggregates joined on the tiny
  // group key, never mixed in one agg: mixing an exact count_distinct
  // with approx sketches makes Spark's distinct-rewrite group by the
  // distinct column and carry a partial HLL PER GROUP — with rsd=0.01
  // that's a 2^14-register sketch per key (measured 10 s at sf0.1; GBs of
  // registers at 100 TB). Separated, the sketches stay global/per-group
  // as declared and the exact distinct gets its own two-phase plan.
  // q160 — Count–Min watchlist gate (the q102 pattern for the second
  // mergeable-sketch family): token frequencies for a fixed probe list
  // are estimated by ONE shuffle-free CMS aggregate and must bracket
  // the exact counts — est ≥ exact always (CMS is one-sided), and
  // est ≤ exact + ⌈ε·N⌉ (the width bound; at ε=1e-4 over this vocab the
  // estimate is exact, so the deterministic fixed-seed gate is stable).
  // The oracle pins the exact counts and TRUE.
  private val cmsProbes =
    Seq("the", "spark", "join", "merge", "data", "window", "zz_absent")
  private def q160(s: SparkSession, dir: String): DataFrame = {
    val eps = 1e-4
    val toks = Tables.load(s, dir, "documents")
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("token"))
    val est = graft.ops.Relational.cmsProbeCounts(
      toks, "token", cmsProbes, eps = eps, confidence = 0.99, seed = 42)
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
    val total = toks.agg(count(lit(1)).as("__N"))
    est.join(exact, Seq("token"), "left")
      .select(col("token"), coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        col("est"))
      .crossJoin(broadcast(total))
      .select(col("token"), col("n_exact"),
        (col("est") >= col("n_exact") &&
          col("est") <= col("n_exact") +
            ceil(lit(eps) * col("__N")).cast("long")).as("est_ok"))
      .orderBy(col("token").asc_nulls_first)
  }
  private val q160Sql = {
    val vals = cmsProbes.map(p => s"('$p')").mkString(", ")
    s"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
        x -> len(x) > 0)) AS token
      FROM documents),
    ex AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1)
    SELECT p.token, CAST(COALESCE(ex.n, 0) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM (VALUES $vals) p(token) LEFT JOIN ex USING (token)
    ORDER BY token ASC NULLS FIRST"""
  }

  // q161 — the q160 gate rebuilt as PURE JSON on named defs: one shared
  // token def feeds the `cms_probe` key, an exact-count child, and a
  // constant-key total child; the gate arithmetic rides a ref stage's
  // derive. Same oracle as q160 — the config path must reproduce the
  // API gate row-for-row.
  private def q161(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(s, dir)
    val probes = cmsProbes.map(p => s""""$p"""").mkString(", ")
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
        {"id": "base",
         "source": {"table": "documents"},
         "derive": {"token": "explode(tokens(text))"},
         "keep_columns": ["token"]},
        {"id": "probed",
         "source": {"ref": "base"},
         "cms_probe": {"key_col": "token", "probes": [$probes],
                       "eps": 0.0001, "seed": 42},
         "with_columns": {"k": "1"},
         "children": [
           {"id": "ex", "source": {"ref": "base"},
            "group_by": ["token"],
            "aggregations": [{"col": "*", "func": "count", "new_name": "nx"}],
            "join": {"on": ["token"], "how": "left"}},
           {"id": "tot", "source": {"ref": "base"},
            "derive": {"k": "1"},
            "group_by": ["k"],
            "aggregations": [{"col": "*", "func": "count", "new_name": "N"}],
            "join": {"on": ["k"], "how": "inner"}}]}],
       "id": "gate",
       "source": {"ref": "probed"},
       "derive": {"n_exact": "coalesce(nx, cast(0 as bigint))",
                  "est_ok": "est >= coalesce(nx, cast(0 as bigint)) and est <= coalesce(nx, cast(0 as bigint)) + cast(ceil(0.0001 * N) as bigint)"},
       "keep_columns": ["token", "n_exact", "est_ok"],
       "order_by": ["token asc"]}""")
  }

  private def q102(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("au"))
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact_users"))
    exact.join(approx, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("au") - col("exact_users")) <=
          col("exact_users").cast("double") * 0.05).as("est_ok"))
      .orderBy(col("event_type").asc_nulls_first)
  }
  private val q102Sql = """
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS est_ok
    FROM events GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""

  // q103 — approx_percentile (GK sketch, default accuracy 10000: rank
  // error ≤ n/10000) lands inside the exact p45–p55 band — a rank window
  // thousands of positions wide at any SF. Exact band via `percentile`,
  // the same cross-engine-pinned form as q38.
  private def q103(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        // one array-form percentile = ONE sorted buffer per group for all
        // three exact quantiles (three scalar calls would buffer the
        // column three times — measured 1.6x slower)
        expr("percentile(l_extendedprice, array(0.45, 0.5, 0.55))").as("pq"),
        expr("approx_percentile(l_extendedprice, 0.5)").as("ap50"))
      .select(col("l_returnflag"), col("n"),
        round(element_at(col("pq"), 2), 9).as("p50_exact"),
        (col("ap50") >= element_at(col("pq"), 1) &&
          col("ap50") <= element_at(col("pq"), 3)).as("ap50_ok"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  private val q103Sql = """
    SELECT l_returnflag, COUNT(*) AS n,
           ROUND(quantile_cont(l_extendedprice, 0.5), 9) AS p50_exact,
           TRUE AS ap50_ok
    FROM lineitem GROUP BY 1 ORDER BY l_returnflag ASC NULLS FIRST"""

  // q104 — Datasketches HLL merge algebra within 5% of exact, per slice
  // AND for the re-merged corpus-wide union (q82's shape; lgK=12 → rsd
  // ≈1.6%, 5% ≈ 3σ). The union row proves sketch-of-slices == usable
  // corpus estimate without re-touching data.
  private def q104(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val perType = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val approx = perType.select(col("event_type"),
        hll_sketch_estimate(col("sk")).as("au"))
      .unionByName(perType
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("au"))
        .select(lit("ALL").as("event_type"), col("au")))
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact_users"))
      .unionByName(ev
        .agg(count_distinct(col("user_id")).as("exact_users"))
        .select(lit("ALL").as("event_type"), col("exact_users")))
    exact.join(approx, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("au") - col("exact_users")) <=
          col("exact_users").cast("double") * 0.05).as("est_ok"))
      .orderBy(col("event_type").asc_nulls_first)
  }
  private val q104Sql = """
    WITH per AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM events GROUP BY 1
      UNION ALL
      SELECT 'ALL', COUNT(DISTINCT user_id) FROM events)
    SELECT event_type, exact_users, TRUE AS est_ok
    FROM per ORDER BY event_type ASC NULLS FIRST"""
}
