package graft.queries

import graft.Tables
import graft.Tables.{davgSql, dsum, dsumSql}
import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational fill-in beyond reference parity (SURVEY §2.2 NS rows):
  * semi/anti joins, set ops, window functions, top-k, distinct + approx,
  * rollup/cube, scalar + array + JSON functions, as-of and range joins.
  */
object RelQueries extends QueryPack {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // q10 — semi + anti join: customers WITH an open order, suppliers WITHOUT
  // any lineitem. Both are one-shuffle joins (no payload duplication).
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val open = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    cust.join(open, Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey").asc_nulls_first)
  }
  private val q10Sql = """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    ORDER BY c_custkey ASC NULLS FIRST"""

  private def q11(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val li = t(s, dir, "lineitem").select(col("l_partkey").as("p_partkey"))
    part.join(li, Seq("p_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy(col("p_partkey").asc_nulls_first)
  }
  private val q11Sql = """
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    ORDER BY p_partkey ASC NULLS FIRST"""

  // q12 — set ops: (BUILDING ∪ rich) ∖ (AUTOMOBILE) over customer keys.
  // Spark union is ALL → .distinct() to match SQL UNION; intersect/except
  // are distinct-semantics on both engines.
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    building.union(rich).distinct().except(auto)
      .orderBy(col("c_custkey").asc_nulls_first)
  }
  private val q12Sql = """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    ORDER BY c_custkey ASC NULLS FIRST"""

  // q13 — window functions: ranking + analytic + exact running aggregate
  // per supplier in shipdate order. Running double sums go through decimal
  // (Relational.runningDSum) — Spark's running state vs DuckDB's segment
  // tree associate float adds differently.
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_suppkey") <= 20)
    val order = Seq(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        row_number().over(w).as("rn"),
        rank().over(Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity").desc))
          .as("qty_rank"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"),
        lead(col("l_quantity"), 1).over(w).as("next_qty"),
        Relational.runningDSum(col("l_quantity"), wRun).as("running_qty"))
      .orderBy(col("l_suppkey").asc_nulls_first, col("rn").asc_nulls_first)
  }
  private val q13Sql = """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           CAST(RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS INT) AS qty_rank,
           LAG(l_quantity, 1) OVER w AS prev_qty,
           LEAD(l_quantity, 1) OVER w AS next_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6)))
                OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_qty
    FROM lineitem WHERE l_suppkey <= 20
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)
    ORDER BY l_suppkey ASC NULLS FIRST, rn ASC NULLS FIRST"""

  // q14 — per-group top-k via the Relational.topKPerGroup combinator:
  // 3 priciest orders per customer, total order tie-broken by orderkey.
  private def q14(s: SparkSession, dir: String): DataFrame =
    Relational.topKPerGroup(
        t(s, dir, "orders"),
        Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy(col("o_custkey").asc_nulls_first, col("rn").asc_nulls_first)
  private val q14Sql = """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
      FROM orders) WHERE rn <= 3
    ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST"""

  // q15 — distinct projection + exact distinct aggregates.
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.select("l_returnflag", "l_linestatus").distinct()
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }
  private val q15Sql = """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  // (q16, the rows-only approx_count_distinct entry, is retired: its
  // hash-green bounded-estimate twin q102 gates the same HLL++ operator
  // per driver run. The distinct-rewrite register-blowup note that lived
  // here moved to q102.)

  // q17 — rollup over the cascade's level hierarchy (returnflag →
  // linestatus), subtotals identified by null keys; cube on orders.
  private def q17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  private val q17Sql = s"""
    SELECT l_returnflag, l_linestatus,
           ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  private def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  private val q18Sql = s"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ${dsumSql("o_totalprice")} AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  // q19 — scalar function surface: date parts/trunc, string ops, math.
  private def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        upper(col("o_orderstatus")).as("status_uc"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat_ws("_", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        length(col("o_orderpriority")).as("prio_len"),
        floor(col("o_totalprice")).as("price_floor"),
        abs(col("o_totalprice") * lit(-1.0)).as("price_abs"))
      .orderBy(col("o_orderkey").asc_nulls_first)
  private val q19Sql = """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(MONTH(o_orderdate) AS INT) AS o_month,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           UPPER(o_orderstatus) AS status_uc,
           SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           CONCAT_WS('_', o_orderstatus, o_orderpriority) AS status_prio,
           CAST(LENGTH(o_orderpriority) AS INT) AS prio_len,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           ABS(o_totalprice * -1.0) AS price_abs
    FROM orders WHERE o_orderkey <= 2000
    ORDER BY o_orderkey ASC NULLS FIRST"""

  // q20 — array functions over embeddings: dimensionality + exact L2 norm²
  // via explode + decimal sum (per-element double squares are bit-identical
  // across engines; the decimal sum makes the reduction order-insensitive).
  private def q20(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("x2", col("x").cast("double") * col("x").cast("double"))
      .groupBy("vec_id")
      .agg(
        any_value(col("label"), lit(true)).as("label"),
        count(lit(1)).as("dim"),
        // decimal(25,18) quantizes each double square with engine-specific
        // tie-rounding → last-ulp drift; round the final norm to 12 dp so
        // both engines agree.
        round(sum(col("x2").cast(DecimalType(25, 18))).cast("double"), 12).as("norm_sq"))
      .orderBy(col("vec_id").asc_nulls_first)
  private val q20Sql = """
    SELECT vec_id, ANY_VALUE(label) AS label, COUNT(*) AS dim,
           ROUND(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(25,18))) AS DOUBLE), 12) AS norm_sq
    FROM (SELECT vec_id, label, UNNEST(embedding) AS x
          FROM embeddings WHERE vec_id < 100)
    GROUP BY vec_id ORDER BY vec_id ASC NULLS FIRST"""

  // q21 — JSON extraction from events.props ({"k": N}) both ways: path
  // extraction (get_json_object) and full parse to MapType (from_json),
  // aggregated per event_type. The two must agree (asserted via sum_k vs
  // sum_k2 in the oracle).
  private def q21(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k2",
        element_at(
          from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)),
          "k").cast("long"))
      .groupBy("event_type")
      .agg(
        sum(col("k")).as("sum_k"),
        sum(col("k2")).as("sum_k2"),
        max(col("k")).as("max_k"),
        count(when(col("k") > 50, lit(1))).as("n_big_k"))
      .orderBy(col("event_type").asc_nulls_first)
  private val q21Sql = """
    SELECT event_type,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(k) AS BIGINT) AS sum_k2,
           MAX(k) AS max_k,
           COUNT(CASE WHEN k > 50 THEN 1 END) AS n_big_k
    FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type ORDER BY event_type ASC NULLS FIRST"""

  // q22 — as-of join (union-and-carry-forward, Relational.asofJoin): each
  // purchase event picks up the most recent prior signup/login of the same
  // user. DuckDB's native ASOF JOIN is the oracle.
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    // dedup right per (user_id, ts): keep max event_id — keeps the oracle's
    // tie choice well-defined
    val logins = ev.filter(col("event_type").isin("signup", "login"))
      .groupBy("user_id", "ts")
      .agg(max(col("event_id")).as("login_event_id"))
    Relational.asofJoin(
        purchases, logins,
        on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("login_event_id"))
      .withColumnRenamed("ts", "purchase_ts")
      .select("event_id", "user_id", "purchase_ts", "value", "login_event_id")
      .orderBy(col("event_id").asc_nulls_first)
  }
  private val q22Sql = """
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
    logins AS (
      SELECT user_id, ts, MAX(event_id) AS login_event_id
      FROM events WHERE event_type IN ('signup', 'login') GROUP BY 1, 2)
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value, l.login_event_id
    FROM purchases p ASOF LEFT JOIN logins l
      ON p.user_id = l.user_id AND p.ts >= l.ts
    ORDER BY p.event_id ASC NULLS FIRST"""

  // q23 — range (band) join: orders bucketed into price bands. Bands are a
  // tiny in-memory dim → broadcast nested-loop, zero shuffle of orders.
  private def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (0.0, 1000.0, "small"),
      (1000.0, 10000.0, "medium"),
      (10000.0, 100000.0, "large"),
      (100000.0, 1e12, "huge")
    ).toDF("lo", "hi", "band")
    Relational.rangeJoin(t(s, dir, "orders"), bands, "o_totalprice", "lo", "hi")
      .groupBy("band")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("band").asc_nulls_first)
  }
  private val q23Sql = s"""
    WITH bands(lo, hi, band) AS (VALUES
      (0.0, 1000.0, 'small'), (1000.0, 10000.0, 'medium'),
      (10000.0, 100000.0, 'large'), (100000.0, 1e12, 'huge'))
    SELECT band, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band ORDER BY band ASC NULLS FIRST"""

  // q234 — KEYED range join from pure config (`range_join`): orders
  // probe an overlapping-band interval def (25 nation-derived bands,
  // 20k wide at 12k spacing — every 8k-wide overlap strip matches TWO
  // bands, prices ≥ 308k match none) with how=left, so multi-match,
  // single-match, and null-padded unmatched rows all ride one hash.
  // Scale shape: bucketed EQUI-join on floor(price/10k) — never a
  // nested loop; the oracle is the plain inequality join DuckDB can
  // afford at sf0.01.
  private def q234(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "bands", "source": {"table": "nation"},
          "derive": {"lo": "n_nationkey * 12000.0",
                     "hi": "n_nationkey * 12000.0 + 20000.0",
                     "band": "n_name"}}],
       "source": {"table": "orders"},
       "keep_columns": ["o_orderkey", "o_totalprice"],
       "range_join": {"intervals_ref": "bands",
                      "point_col": "o_totalprice",
                      "lo_col": "lo", "hi_col": "hi",
                      "bucket": 10000, "how": "left",
                      "payload": ["band"]},
       "order_by": ["o_orderkey asc", "band asc"]}""")
  private val q234Sql = """
    SELECT o_orderkey, o_totalprice, band
    FROM orders o LEFT JOIN (
      SELECT n_nationkey * 12000.0 AS lo,
             n_nationkey * 12000.0 + 20000.0 AS hi,
             n_name AS band
      FROM nation) b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    ORDER BY o_orderkey ASC NULLS FIRST, band ASC NULLS FIRST"""

  // q235 — UNPIVOT (melt) from pure config: lineitem's four measures go
  // wide → long (one row per measure), values defaulted to every non-id
  // column. One Expand over the scan — zero shuffles; NULL-keeping
  // semantics make the faithful DuckDB mirror a UNION ALL (DuckDB's
  // UNPIVOT drops nulls).
  private def q235(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "lineitem"},
       "keep_columns": ["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax"],
       "unpivot": {"ids": ["l_orderkey", "l_linenumber"],
                   "var_col": "measure", "value_col": "value"},
       "order_by": ["l_orderkey asc", "l_linenumber asc", "measure asc"]}""")
  private val q235Sql = """
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
             l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
    ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
             measure ASC NULLS FIRST"""

  // q236 — HEAVY HITTERS from pure config (`approx_top_k`): the top-25
  // customers by order count from ONE shuffle-free mergeable-sketch
  // pass. max_items_tracked 65536 ≥ the ~1000 distinct custkeys at this
  // SF, so every count is EXACT (nothing evicted) and the sketch result
  // hash-gates against the plain GROUP BY — the q160 CMS discipline.
  // Ties at the boundary are safe: both sides rank (count DESC, key
  // ASC).
  private def q236(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "orders"},
       "approx_top_k": {"key_col": "o_custkey", "k": 25,
                        "max_items_tracked": 65536},
       "order_by": ["rn asc"]}""")
  private val q236Sql = """
    SELECT o_custkey, count, rn FROM (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS count,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o_custkey ASC)
                  AS INT) AS rn
      FROM orders GROUP BY o_custkey)
    WHERE rn <= 25 ORDER BY rn ASC NULLS FIRST"""

  // q237 — INCREMENTAL SKETCH TABLE flagship: per-day frequent-items
  // sketches (the artifact a 100 TB pipeline persists per ingest batch)
  // COMBINE across days and answer the same top-25 question WITHOUT
  // rescanning any row — accumulate/combine/estimate from pure config
  // (pass-through aggregates + derive), sketches parquet-safe structs.
  // No eviction at this capacity, so the re-aggregated answer is EXACT
  // and carries q236's oracle verbatim; estimate pulls ALL tracked
  // items and the deterministic (count DESC, key ASC) re-rank cuts 25.
  private def q237(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "daily_sk", "source": {"table": "orders"},
          "derive": {"day": "CAST(date_trunc('DAY', o_orderdate) AS DATE)"},
          "aggregate": {"group_by": ["day"], "aggregations": [
             {"col": "o_custkey", "func": "approx_top_k_accumulate",
              "param": 65536, "new_name": "sk"}]}},
         {"id": "combined", "source": {"ref": "daily_sk"},
          "aggregate": {"aggregations": [
             {"col": "sk", "func": "approx_top_k_combine",
              "param": 65536, "new_name": "csk"}]}}],
       "source": {"ref": "combined"},
       "derive": {"e": "explode(approx_top_k_estimate(csk, 65536))",
                  "o_custkey": "e.item",
                  "count": "CAST(e.count AS BIGINT)",
                  "rn": "CAST(row_number() OVER (ORDER BY `count` DESC, o_custkey ASC) AS INT)"},
       "post_filters": ["rn <= 25"],
       "drop": ["csk", "e"],
       "order_by": ["rn asc"]}""")

  // q238 — HLL SKETCH TABLE: the distinct-count sibling of q237's
  // frequent-items artifact — per-day hll_sketch_agg structs persistable
  // per ingest batch, hll_union_agg re-aggregates ANY date range with
  // zero row rescans. The estimate itself is approximate by contract,
  // so the hash carries the 2%-bound BOOLEAN (the q233 discipline) plus
  // the exact baseline the oracle restates; at this SF the DataSketches
  // HLL is still in exact (coupon) mode and est == exact.
  private def q238(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "daily_h", "source": {"table": "orders"},
          "derive": {"day": "CAST(date_trunc('DAY', o_orderdate) AS DATE)"},
          "aggregate": {"group_by": ["day"], "aggregations": [
             {"col": "o_custkey", "func": "hll_sketch_agg", "param": 14,
              "new_name": "h"}]}},
         {"id": "unioned", "source": {"ref": "daily_h"},
          "aggregate": {"aggregations": [
             {"col": "h", "func": "hll_union_agg", "new_name": "hu"},
             {"col": "*", "func": "count", "new_name": "n_sketches"}]}}],
       "source": {"ref": "unioned"},
       "derive": {"est": "hll_sketch_estimate(hu)",
                  "exact_nd": "CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)",
                  "est_ok": "abs(est - exact_nd) <= CAST(0.02 * exact_nd AS BIGINT)"},
       "drop": ["hu", "est"]}""")
  private val q238Sql = """
    SELECT CAST(COUNT(DISTINCT CAST(date_trunc('day', o_orderdate) AS DATE)) AS BIGINT) AS n_sketches,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_nd,
           TRUE AS est_ok
    FROM orders"""

  // q149/q150 — per-column profile (the per-batch data-quality monitor):
  // lineitem with a derived nullable flag column so the null-count path
  // is exercised (lineitem itself is null-free). One aggregate pass for
  // all columns; min/max stringified for the uniform schema. q150 is
  // the PURE-JSON twin over the same derive.
  private def q149(s: SparkSession, dir: String): DataFrame =
    Relational.profile(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            nullif(col("lang"), lit("en")).as("flag")),
        Seq("doc_id", "source", "flag"))
      .orderBy(col("col_name").asc_nulls_first)
  private val q149Sql = """
    WITH d AS (SELECT doc_id, source,
                      nullif(lang, 'en') AS flag FROM documents)
    SELECT * FROM (
      SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
             COUNT(*) FILTER (WHERE doc_id IS NULL) AS n_nulls,
             COUNT(DISTINCT doc_id) AS n_distinct,
             CAST(MIN(doc_id) AS VARCHAR) AS min_value,
             CAST(MAX(doc_id) AS VARCHAR) AS max_value FROM d
      UNION ALL
      SELECT 'flag', COUNT(*),
             COUNT(*) FILTER (WHERE flag IS NULL),
             COUNT(DISTINCT flag),
             CAST(MIN(flag) AS VARCHAR),
             CAST(MAX(flag) AS VARCHAR) FROM d
      UNION ALL
      SELECT 'source', COUNT(*),
             COUNT(*) FILTER (WHERE source IS NULL),
             COUNT(DISTINCT source),
             CAST(MIN(source) AS VARCHAR),
             CAST(MAX(source) AS VARCHAR) FROM d)
    ORDER BY col_name ASC NULLS FIRST"""
  private def q150(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"flag": "nullif(lang, 'en')"},
       "profile": {"columns": ["doc_id", "source", "flag"]},
       "order_by": ["col_name asc"]}""")
  }

  // q244 — corpus snapshot diff (`diff` node key): the "d" def's frame is
  // the NEW snapshot (docs with id % 13 ≠ 0), the "old" def the OLD one
  // (id % 11 ≠ 0, with a planted score change on id % 7 = 0) — so
  // id % 11 = 0 rows diff as added, id % 13 = 0 as removed, id % 7 = 0
  // survivors as changed with changed_cols = [sc], and everything else
  // drops as unchanged. carry: "new" surfaces the new-side values (NULL
  // on removed). The root node projects the array<string> changed_cols
  // through array_join — the driver checker row-sorts with pandas and
  // array cells are unhashable, so declared queries keep arrays out of
  // their output schema (NULL stays NULL on added/removed). The oracle
  // restates the whole thing as one FULL OUTER JOIN.
  private def q244(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "old", "source": {"table": "documents"},
          "filters": ["doc_id % 11 != 0"],
          "derive": {"sc": "CAST(if(doc_id % 7 = 0, length(text) + 1, length(text)) AS BIGINT)"},
          "keep_columns": ["doc_id", "lang", "sc"]},
         {"id": "d", "source": {"table": "documents"},
          "filters": ["doc_id % 13 != 0"],
          "derive": {"sc": "CAST(length(text) AS BIGINT)"},
          "keep_columns": ["doc_id", "lang", "sc"],
          "diff": {"on": ["doc_id"], "ref": "old",
                   "compare": ["lang", "sc"], "carry": "new"}}],
       "source": {"ref": "d"},
       "derive": {"changed": "array_join(changed_cols, ',')"},
       "keep_columns": ["doc_id", "diff_status", "changed", "lang", "sc"],
       "order_by": ["doc_id asc"]}""")
  private val q244Sql = """
    WITH newv AS (
      SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS sc
      FROM documents WHERE doc_id % 13 <> 0),
    oldv AS (
      SELECT doc_id, lang,
             CAST(CASE WHEN doc_id % 7 = 0 THEN length(text) + 1
                       ELSE length(text) END AS BIGINT) AS sc
      FROM documents WHERE doc_id % 11 <> 0)
    SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS diff_status,
           CASE WHEN n.doc_id IS NOT NULL AND o.doc_id IS NOT NULL THEN
             array_to_string(list_filter(
               [CASE WHEN n.lang IS DISTINCT FROM o.lang THEN 'lang' END,
                CASE WHEN n.sc IS DISTINCT FROM o.sc THEN 'sc' END],
               x -> x IS NOT NULL), ',')
           ELSE NULL END AS changed,
           n.lang AS lang, n.sc AS sc
    FROM newv n FULL OUTER JOIN oldv o ON n.doc_id = o.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL
       OR (n.lang IS DISTINCT FROM o.lang) OR (n.sc IS DISTINCT FROM o.sc)
    ORDER BY doc_id ASC NULLS FIRST"""

  // q251 — APPLY a snapshot diff (`apply_diff`), the inverse that closes
  // the diff lifecycle: the q244 fixture's delta (new-vs-old with carry)
  // patches the OLD snapshot and must reproduce the NEW snapshot
  // EXACTLY — the round-trip law apply(old, diff(new, old)) == new as a
  // driver-gated oracle. At 100 TB this is "ship the delta, patch at
  // the destination" instead of re-copying the corpus. The oracle is
  // simply the new-side SELECT — if any of the anti-join/union legs is
  // wrong, rows go missing, duplicate, or keep stale values.
  private def q251(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "old", "source": {"table": "documents"},
          "filters": ["doc_id % 11 != 0"],
          "derive": {"sc": "CAST(if(doc_id % 7 = 0, length(text) + 1, length(text)) AS BIGINT)"},
          "keep_columns": ["doc_id", "lang", "sc"]},
         {"id": "delta", "source": {"table": "documents"},
          "filters": ["doc_id % 13 != 0"],
          "derive": {"sc": "CAST(length(text) AS BIGINT)"},
          "keep_columns": ["doc_id", "lang", "sc"],
          "diff": {"on": ["doc_id"], "ref": "old",
                   "compare": ["lang", "sc"], "carry": "new"}}],
       "source": {"ref": "old"},
       "apply_diff": {"delta_ref": "delta", "on": ["doc_id"]},
       "order_by": ["doc_id asc"]}""")
  private val q251Sql = """
    SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS sc
    FROM documents WHERE doc_id % 13 <> 0
    ORDER BY doc_id ASC NULLS FIRST"""

  // q245 — INCREMENTAL corpus rebuild, the flagship composition the diff
  // key exists for: the previous snapshot (a def with a planted
  // truncation bug on id % 7 = 0 and missing id % 11 = 0 docs) diffs
  // against the current corpus, and ONLY the delta (added + changed) is
  // re-tokenized — at 100 TB you re-pay tokenization for ~the delta
  // fraction instead of the whole corpus. One config: defs → diff with
  // carry → registered tokens() over the carried text → aggregate.
  private def q245(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "oldsnap", "source": {"table": "documents"},
          "filters": ["doc_id % 11 != 0"],
          "derive": {"text2": "if(doc_id % 7 = 0, substring(text, 1, 10), text)"},
          "keep_columns": ["doc_id", "text2"]},
         {"id": "delta", "source": {"table": "documents"},
          "derive": {"text2": "text"},
          "keep_columns": ["doc_id", "text2"],
          "diff": {"on": ["doc_id"], "ref": "oldsnap",
                   "compare": ["text2"], "carry": "new"}}],
       "source": {"ref": "delta"},
       "filters": ["diff_status != 'removed'"],
       "derive": {"n_tok": "size(tokens(text2))"},
       "aggregate": {"group_by": ["diff_status"], "aggregations": [
         {"col": "*", "func": "count", "new_name": "docs"},
         {"col": "n_tok", "func": "sum", "new_name": "toks"}]},
       "order_by": ["diff_status asc"]}""")
  private val q245Sql = """
    WITH oldsnap AS (
      SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN substr(text, 1, 10)
                          ELSE text END AS text2
      FROM documents WHERE doc_id % 11 <> 0),
    delta AS (
      SELECT n.doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added' ELSE 'changed' END
               AS diff_status,
             n.text2
      FROM (SELECT doc_id, text AS text2 FROM documents) n
      LEFT JOIN oldsnap o ON n.doc_id = o.doc_id
      WHERE o.doc_id IS NULL OR n.text2 IS DISTINCT FROM o.text2)
    SELECT diff_status, CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(len(list_filter(
             string_split_regex(trim(text2), '\s+'), x -> len(x) > 0)))
             AS BIGINT) AS toks
    FROM delta GROUP BY 1 ORDER BY diff_status ASC NULLS FIRST"""

  // q246 — tee fan-out: ONE cached corpus read writes accepted + rejected
  // side outputs (the curation accept/audit split), and the ROOT then
  // re-reads the accepted parquet it just wrote — the tee write itself
  // sits under the oracle hash (the q196 reparse discipline). The oracle
  // restates the accept filter + aggregate straight over documents.
  private def q246(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-q246").toString
    graft.compile.Compiler.compileJson(s, s"""
      {"defs": [
         {"id": "scored", "cache": true,
          "source": {"table": "documents"},
          "derive": {"n_tok": "token_count(text)"},
          "keep_columns": ["doc_id", "lang", "n_tok"]}],
       "tee": [
         {"id": "accepted", "source": {"ref": "scored"},
          "filters": ["n_tok >= 8"],
          "save": {"format": "parquet", "path": "$base/accepted"}},
         {"id": "rejected", "source": {"ref": "scored"},
          "filters": ["n_tok < 8"],
          "save": {"format": "parquet", "path": "$base/rejected"}}],
       "source": {"path": "$base/accepted"},
       "aggregate": {"group_by": ["lang"], "aggregations": [
         {"col": "*", "func": "count", "new_name": "n_docs"},
         {"col": "n_tok", "func": "sum", "new_name": "toks"}]},
       "order_by": ["lang asc"]}""")
  }
  private val q246Sql = """
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> len(x) > 0)) AS n_tok
      FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS toks
    FROM scored WHERE n_tok >= 8
    GROUP BY 1 ORDER BY lang ASC NULLS FIRST"""

  // q262 — INTERVAL-OVERLAP join (`overlap_join`): click attention spans
  // (variable length, 30–90 min) × view windows (fixed 1 h) per user —
  // which ad exposures overlapped a browsing window. Both sides explode
  // to 1-hour cells and pair via a plain equi-join with the
  // later-start-cell exactly-once rule; the oracle restates it as the
  // plain inequality pair join DuckDB can afford at this SF. Bounds are
  // exact epoch-micros integers end to end; the overlap extent
  // (least(hi) − greatest(lo)) is BIGINT arithmetic both engines compute
  // identically.
  private def q262(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "views", "source": {"table": "events"},
          "filters": ["event_type = 'view'"],
          "derive": {"v_id": "event_id", "v_lo": "unix_micros(ts)",
                     "v_hi": "unix_micros(ts) + 3600000000"},
          "keep_columns": ["user_id", "v_id", "v_lo", "v_hi"]},
         {"id": "pairs", "source": {"table": "events"},
          "filters": ["event_type = 'click'"],
          "derive": {"c_id": "event_id", "c_lo": "unix_micros(ts)",
                     "c_hi": "unix_micros(ts) + (1800 + event_id % 3600) * 1000000"},
          "keep_columns": ["user_id", "c_id", "c_lo", "c_hi"],
          "overlap_join": {"other_ref": "views",
                           "lo_col": "c_lo", "hi_col": "c_hi",
                           "other_lo_col": "v_lo", "other_hi_col": "v_hi",
                           "bucket": 3600000000, "on": ["user_id"],
                           "payload": ["v_id", "v_lo", "v_hi"]}}],
       "source": {"ref": "pairs"},
       "derive": {"ov_us": "least(c_hi, v_hi) - greatest(c_lo, v_lo)"},
       "keep_columns": ["user_id", "c_id", "v_id", "ov_us"],
       "order_by": ["user_id asc", "c_id asc", "v_id asc"]}""")
  private val q262Sql = """
    WITH clicks AS (
      SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_lo,
             epoch_us(ts) + (1800 + event_id % 3600) * 1000000 AS c_hi
      FROM events WHERE event_type = 'click'),
    views AS (
      SELECT user_id, event_id AS v_id, epoch_us(ts) AS v_lo,
             epoch_us(ts) + 3600000000 AS v_hi
      FROM events WHERE event_type = 'view')
    SELECT c.user_id, c_id, v_id,
           least(c_hi, v_hi) - greatest(c_lo, v_lo) AS ov_us
    FROM clicks c JOIN views v
      ON c.user_id = v.user_id AND c_lo < v_hi AND v_lo < c_hi
    ORDER BY c.user_id ASC NULLS FIRST, c_id ASC NULLS FIRST,
             v_id ASC NULLS FIRST"""

  // q266 — grouped Pearson CORRELATION from raw moments, pure config
  // (zero new engine code; the q248 moment discipline extended to the
  // bivariate case): per return flag, corr(l_quantity, l_extendedprice)
  // derived from six sums — n, Σx, Σx² (BIGINT-exact: quantity is
  // integral), Σy, Σxy, Σy² (DECIMAL(25,6)-exact via dsum on the same
  // IEEE products both engines compute from the stored doubles). The
  // final corr is ONE double formula spelled identically in both engines
  // (IEEE mul/sub/div/sqrt on identical operands), ROUND 6 — never the
  // engines' own corr()/stddev() aggregates, whose streaming algorithms
  // differ in last-ulp rounding. One map-side-combined aggregate pass.
  private def q266(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "m", "source": {"table": "lineitem"},
          "derive": {"x": "CAST(l_quantity AS BIGINT)",
                     "xx": "CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)",
                     "xy": "l_quantity * l_extendedprice",
                     "yy": "l_extendedprice * l_extendedprice"},
          "aggregate": {"group_by": ["l_returnflag"], "aggregations": [
            {"col": "*", "func": "count", "new_name": "n"},
            {"col": "x", "func": "sum", "new_name": "sx"},
            {"col": "xx", "func": "sum", "new_name": "sxx"},
            {"col": "l_extendedprice", "func": "dsum", "new_name": "sy"},
            {"col": "xy", "func": "dsum", "new_name": "sxy"},
            {"col": "yy", "func": "dsum", "new_name": "syy"}]}}],
       "source": {"ref": "m"},
       "derive": {"corr_qp": "ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)"},
       "keep_columns": ["l_returnflag", "n", "corr_qp"],
       "order_by": ["l_returnflag asc"]}""")
  private val q266Sql = """
    WITH m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
               AS BIGINT) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(25,6)))
               AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(25,6)))
               AS DOUBLE) AS syy
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, n,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                 (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                  sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_qp
    FROM m ORDER BY l_returnflag ASC NULLS FIRST"""

  // q267 — generic CONNECTED COMPONENTS (`connected_components`): the
  // dedup tiers' CC engine exposed over an arbitrary edge table. The
  // fixture plants chains of ten (edge id→id+1 except across decade
  // boundaries; doc_ids are contiguous 0..N−1 at every SF), so the
  // min-reachable-id label is pure arithmetic — cluster = id − id%10 —
  // and the oracle needs no recursion. `small_graph_edges: 0` FORCES the
  // distributed min-label-propagation loop (the driver union-find would
  // otherwise absorb the whole fixture), putting the iterative engine
  // itself — propagate, pointer-jump, convergence detection — under the
  // driver hash for the first time (it was ScalaTest-only before).
  private def q267(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "filters": ["doc_id % 10 < 9"],
       "derive": {"src": "doc_id", "dst": "doc_id + 1"},
       "keep_columns": ["src", "dst"],
       "connected_components": {"src_col": "src", "dst_col": "dst",
                                "small_graph_edges": 0},
       "order_by": ["id asc"]}""")
  private val q267Sql = """
    WITH e AS (
      SELECT doc_id AS src, doc_id + 1 AS dst
      FROM documents WHERE doc_id % 10 < 9),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
    SELECT id, id - id % 10 AS cluster FROM nodes
    ORDER BY id ASC NULLS FIRST"""

  // q268 — population stability index (PSI) from pure config (zero new
  // engine code): the standard data-drift gauge between a reference and
  // a current window — per bin, (p_cur − p_ref)·ln(p_cur/p_ref) with
  // Laplace-smoothed proportions p = (n+1)/(N+B), so empty bins
  // contribute finitely instead of ±∞. The monitoring sibling of
  // `profile` (which describes ONE snapshot; PSI compares two). All
  // inputs are integer bin counts; every double derives from them
  // through ONE formula spelled identically in both engines (the q266
  // discipline), ROUND 9. Two map-side-combined count aggregates + one
  // bin-shaped full-outer join + bins-shaped windows — corpus-scale
  // work is the two counts, everything after is ≤#bins rows.
  private def q268(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "refc", "source": {"table": "events"},
          "filters": ["ts < timestamp'2024-01-16 00:00:00'"],
          "derive": {"bin": "CAST(floor(value / 50) AS BIGINT)"},
          "aggregate": {"group_by": ["bin"], "aggregations": [
            {"col": "*", "func": "count", "new_name": "n_ref"}]}},
         {"id": "joined", "source": {"table": "events"},
          "filters": ["ts >= timestamp'2024-01-16 00:00:00'"],
          "derive": {"bin": "CAST(floor(value / 50) AS BIGINT)"},
          "aggregate": {"group_by": ["bin"], "aggregations": [
            {"col": "*", "func": "count", "new_name": "n_cur"}]},
          "children": [
            {"id": "refj", "source": {"ref": "refc"},
             "join": {"how": "full", "on": ["bin"]}}]}],
       "source": {"ref": "joined"},
       "derive": {
         "nr": "coalesce(n_ref, CAST(0 AS BIGINT))",
         "nc": "coalesce(n_cur, CAST(0 AS BIGINT))",
         "tr": "sum(nr) OVER ()",
         "tc": "sum(nc) OVER ()",
         "b": "count(*) OVER ()",
         "p_ref": "CAST(nr + 1 AS DOUBLE) / CAST(tr + b AS DOUBLE)",
         "p_cur": "CAST(nc + 1 AS DOUBLE) / CAST(tc + b AS DOUBLE)",
         "psi_contrib": "ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 9)"},
       "keep_columns": ["bin", "nr", "nc", "psi_contrib"],
       "order_by": ["bin asc"]}""")
  private val q268Sql = """
    WITH refc AS (
      SELECT CAST(floor(value / 50) AS BIGINT) AS bin, COUNT(*) AS n_ref
      FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
    curc AS (
      SELECT CAST(floor(value / 50) AS BIGINT) AS bin, COUNT(*) AS n_cur
      FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
    j AS (
      SELECT bin, COALESCE(n_ref, CAST(0 AS BIGINT)) AS nr,
             COALESCE(n_cur, CAST(0 AS BIGINT)) AS nc
      FROM curc FULL OUTER JOIN refc USING (bin)),
    w AS (
      SELECT bin, nr, nc,
             CAST(SUM(nr) OVER () AS BIGINT) AS tr,
             CAST(SUM(nc) OVER () AS BIGINT) AS tc,
             COUNT(*) OVER () AS b
      FROM j),
    p AS (
      SELECT bin, nr, nc,
             CAST(nr + 1 AS DOUBLE) / CAST(tr + b AS DOUBLE) AS p_ref,
             CAST(nc + 1 AS DOUBLE) / CAST(tc + b AS DOUBLE) AS p_cur
      FROM w)
    SELECT bin, nr, nc,
           ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 9) AS psi_contrib
    FROM p ORDER BY bin ASC NULLS FIRST"""

  // q272 — per-SLICE data profile (`profile.group_cols`): q149's stats
  // broken out per source — the "which feed is sending junk" view. One
  // grouped aggregate pass; the oracle mirrors it as per-column UNION
  // ALL legs each GROUPed BY source.
  private def q272(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "derive": {"flag": "nullif(lang, 'en')"},
       "profile": {"columns": ["doc_id", "flag"], "group_cols": ["source"]},
       "order_by": ["source asc", "col_name asc"]}""")
  private val q272Sql = """
    WITH d AS (SELECT source, doc_id, nullif(lang, 'en') AS flag
               FROM documents)
    SELECT * FROM (
      SELECT source, 'doc_id' AS col_name, COUNT(*) AS n_rows,
             COUNT(*) FILTER (WHERE doc_id IS NULL) AS n_nulls,
             COUNT(DISTINCT doc_id) AS n_distinct,
             CAST(MIN(doc_id) AS VARCHAR) AS min_value,
             CAST(MAX(doc_id) AS VARCHAR) AS max_value
      FROM d GROUP BY source
      UNION ALL
      SELECT source, 'flag', COUNT(*),
             COUNT(*) FILTER (WHERE flag IS NULL),
             COUNT(DISTINCT flag),
             CAST(MIN(flag) AS VARCHAR),
             CAST(MAX(flag) AS VARCHAR)
      FROM d GROUP BY source)
    ORDER BY source ASC NULLS FIRST, col_name ASC NULLS FIRST"""

  // q273 — outage-IMPACT attribution flagship: the q262 overlap join
  // composed with aggregation — per user, how many click-attention
  // spans intersected an error window and the total overlapped
  // duration ("impact time"). Overlap extents are exact BIGINT micros,
  // so the per-user SUM needs no decimal trick; the oracle restates
  // pair join + SUM directly.
  private def q273(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "errors", "source": {"table": "events"},
          "filters": ["event_type = 'error'"],
          "derive": {"e_id": "event_id", "e_lo": "unix_micros(ts)",
                     "e_hi": "unix_micros(ts) + 1800000000"},
          "keep_columns": ["user_id", "e_id", "e_lo", "e_hi"]},
         {"id": "pairs", "source": {"table": "events"},
          "filters": ["event_type = 'click'"],
          "derive": {"c_id": "event_id", "c_lo": "unix_micros(ts)",
                     "c_hi": "unix_micros(ts) + (1800 + event_id % 3600) * 1000000"},
          "keep_columns": ["user_id", "c_id", "c_lo", "c_hi"],
          "overlap_join": {"other_ref": "errors",
                           "lo_col": "c_lo", "hi_col": "c_hi",
                           "other_lo_col": "e_lo", "other_hi_col": "e_hi",
                           "bucket": 3600000000, "on": ["user_id"],
                           "payload": ["e_id", "e_lo", "e_hi"]}}],
       "source": {"ref": "pairs"},
       "derive": {"ov_us": "least(c_hi, e_hi) - greatest(c_lo, e_lo)"},
       "aggregate": {"group_by": ["user_id"], "aggregations": [
         {"col": "*", "func": "count", "new_name": "n_impacted"},
         {"col": "ov_us", "func": "sum", "new_name": "impact_us"}]},
       "order_by": ["user_id asc"]}""")
  private val q273Sql = """
    WITH clicks AS (
      SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_lo,
             epoch_us(ts) + (1800 + event_id % 3600) * 1000000 AS c_hi
      FROM events WHERE event_type = 'click'),
    errs AS (
      SELECT user_id, event_id AS e_id, epoch_us(ts) AS e_lo,
             epoch_us(ts) + 1800000000 AS e_hi
      FROM events WHERE event_type = 'error'),
    pairs AS (
      SELECT c.user_id,
             least(c_hi, e_hi) - greatest(c_lo, e_lo) AS ov_us
      FROM clicks c JOIN errs e
        ON c.user_id = e.user_id AND c_lo < e_hi AND e_lo < c_hi)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_impacted,
           CAST(SUM(ov_us) AS BIGINT) AS impact_us
    FROM pairs GROUP BY 1
    ORDER BY user_id ASC NULLS FIRST"""

  // q274 — LEFT overlap join (`how: "left"`): which click spans had NO
  // covering view window — the exposure-gap audit the inner q262 makes
  // the user hand-roll as an anti-join. Views thinned to event_id % 7
  // and clicks shortened to 10 min so plenty of clicks go uncovered;
  // the engine pads them ONCE with NULL payload via the null-safe
  // all-left-columns anti-join (match sets are value-determined, so no
  // row id is needed). Oracle: the plain DuckDB LEFT JOIN on the same
  // inequality pair condition.
  private def q274(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "views", "source": {"table": "events"},
          "filters": ["event_type = 'view'", "event_id % 7 = 0"],
          "derive": {"v_id": "event_id", "v_lo": "unix_micros(ts)",
                     "v_hi": "unix_micros(ts) + 3600000000"},
          "keep_columns": ["user_id", "v_id", "v_lo", "v_hi"]},
         {"id": "pairs", "source": {"table": "events"},
          "filters": ["event_type = 'click'"],
          "derive": {"c_id": "event_id", "c_lo": "unix_micros(ts)",
                     "c_hi": "unix_micros(ts) + 600000000"},
          "keep_columns": ["user_id", "c_id", "c_lo", "c_hi"],
          "overlap_join": {"other_ref": "views",
                           "lo_col": "c_lo", "hi_col": "c_hi",
                           "other_lo_col": "v_lo", "other_hi_col": "v_hi",
                           "bucket": 3600000000, "on": ["user_id"],
                           "payload": ["v_id"], "how": "left"}}],
       "source": {"ref": "pairs"},
       "derive": {"covered": "CAST(v_id IS NOT NULL AS INT)"},
       "keep_columns": ["user_id", "c_id", "v_id", "covered"],
       "order_by": ["user_id asc", "c_id asc", "v_id asc"]}""")
  private val q274Sql = """
    WITH clicks AS (
      SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_lo,
             epoch_us(ts) + 600000000 AS c_hi
      FROM events WHERE event_type = 'click'),
    views AS (
      SELECT user_id, event_id AS v_id, epoch_us(ts) AS v_lo,
             epoch_us(ts) + 3600000000 AS v_hi
      FROM events WHERE event_type = 'view' AND event_id % 7 = 0)
    SELECT c.user_id, c_id, v_id,
           CAST(v_id IS NOT NULL AS INT) AS covered
    FROM clicks c LEFT JOIN views v
      ON c.user_id = v.user_id AND c_lo < v_hi AND v_lo < c_hi
    ORDER BY c.user_id ASC NULLS FIRST, c_id ASC NULLS FIRST,
             v_id ASC NULLS FIRST"""

  // q277 — interval UNION length per key ("busy time"), pure config
  // (zero new engine code): per user, the total length of the union of
  // their click-attention spans — overlapping spans must not double
  // count, the question naive SUM(hi − lo) answers wrongly. Classic
  // sweep: in (lo, hi, id) order, each span contributes
  // max(0, hi − max(lo, max-prev-hi)) where max-prev-hi is a running
  // MAX over the O(n) [unboundedPreceding, 1 PRECEDING] frame — never
  // a self-join, never an unbounded-following frame. Exact BIGINT
  // micros end to end.
  private def q277(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "spans", "source": {"table": "events"},
          "filters": ["event_type = 'click'"],
          "derive": {"c_lo": "unix_micros(ts)",
                     "c_hi": "unix_micros(ts) + (1800 + event_id % 3600) * 1000000"},
          "keep_columns": ["user_id", "event_id", "c_lo", "c_hi"]}],
       "source": {"ref": "spans"},
       "derive": {
         "prev_hi": "max(c_hi) OVER (PARTITION BY user_id ORDER BY c_lo ASC, c_hi ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)",
         "covered_us": "greatest(c_hi - greatest(c_lo, coalesce(prev_hi, c_lo)), 0)"},
       "aggregate": {"group_by": ["user_id"], "aggregations": [
         {"col": "covered_us", "func": "sum", "new_name": "busy_us"},
         {"col": "*", "func": "count", "new_name": "n_spans"}]},
       "order_by": ["user_id asc"]}""")
  private val q277Sql = """
    WITH c AS (
      SELECT user_id, event_id, epoch_us(ts) AS c_lo,
             epoch_us(ts) + (1800 + event_id % 3600) * 1000000 AS c_hi
      FROM events WHERE event_type = 'click'),
    w AS (
      SELECT user_id, c_lo, c_hi,
             MAX(c_hi) OVER (PARTITION BY user_id
                             ORDER BY c_lo ASC, c_hi ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_hi
      FROM c)
    SELECT user_id,
           CAST(SUM(GREATEST(c_hi - GREATEST(c_lo, COALESCE(prev_hi, c_lo)),
                             0)) AS BIGINT) AS busy_us,
           CAST(COUNT(*) AS BIGINT) AS n_spans
    FROM w GROUP BY 1
    ORDER BY user_id ASC NULLS FIRST"""

  // q278 — MAX CONCURRENCY per key ("peak parallel sessions"), pure
  // config (zero new engine code): per user, the maximum number of
  // simultaneously-open view windows. The classic sweep-line: each span
  // emits (+1 at lo, −1 at hi) markers through ONE scan-stage explode,
  // a running SUM over the O(n) [unboundedPreceding, currentRow] frame
  // is the live count, MAX per key is the answer. At an equal instant
  // the −1 sorts first (d ASC) — half-open spans: a window ending at t
  // does not overlap one starting at t. Prefix sums within an equal
  // (t, d) run are order-insensitive as a multiset, so the MAX is
  // deterministic by construction.
  private def q278(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"defs": [
         {"id": "markers", "source": {"table": "events"},
          "filters": ["event_type = 'view'"],
          "derive": {"v_lo": "unix_micros(ts)",
                     "v_hi": "unix_micros(ts) + 3600000000",
                     "m": "explode(array(named_struct('t', v_lo, 'd', 1), named_struct('t', v_hi, 'd', -1)))",
                     "t": "m.t", "d": "m.d"},
          "keep_columns": ["user_id", "event_id", "t", "d"]}],
       "source": {"ref": "markers"},
       "derive": {
         "conc": "sum(d) OVER (PARTITION BY user_id ORDER BY t ASC, d ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"},
       "aggregate": {"group_by": ["user_id"], "aggregations": [
         {"col": "conc", "func": "max", "new_name": "max_concurrent"},
         {"col": "*", "func": "count", "new_name": "n_markers"}]},
       "order_by": ["user_id asc"]}""")
  private val q278Sql = """
    WITH v AS (
      SELECT user_id, event_id, epoch_us(ts) AS v_lo,
             epoch_us(ts) + 3600000000 AS v_hi
      FROM events WHERE event_type = 'view'),
    m AS (
      SELECT user_id, event_id, v_lo AS t, 1 AS d FROM v
      UNION ALL
      SELECT user_id, event_id, v_hi AS t, -1 AS d FROM v),
    w AS (
      SELECT user_id,
             SUM(d) OVER (PARTITION BY user_id
                          ORDER BY t ASC, d ASC, event_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS conc
      FROM m)
    SELECT user_id, CAST(MAX(conc) AS BIGINT) AS max_concurrent,
           CAST(COUNT(*) AS BIGINT) AS n_markers
    FROM w GROUP BY 1
    ORDER BY user_id ASC NULLS FIRST"""

  // q270 — contract AUDIT (`expect_report`): the data-quality dashboard
  // twin of q232's fail-fast `expect` — one aggregate pass, one row per
  // rule with its violation count. The `always_null` rule evaluates to
  // NULL on EVERY row, pinning the deliberate NULL-is-violation
  // semantics (violation ⇔ NOT coalesce(rule, false)) under the driver
  // hash: its count must equal n_rows.
  private def q270(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "expect_report": {
         "has_text": "length(text) > 0",
         "en_or_de": "lang IN ('en', 'de')",
         "always_null": "nullif(doc_id, doc_id) > 0"},
       "order_by": ["rule asc"]}""")
  private val q270Sql = """
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN NOT COALESCE(length(text) > 0, FALSE)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_text,
             CAST(SUM(CASE WHEN NOT COALESCE(lang IN ('en', 'de'), FALSE)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
             CAST(SUM(CASE WHEN NOT COALESCE(nullif(doc_id, doc_id) > 0, FALSE)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_null
      FROM documents)
    SELECT 'always_null' AS rule, v_null AS n_violations, n_rows FROM m
    UNION ALL
    SELECT 'en_or_de', v_lang, n_rows FROM m
    UNION ALL
    SELECT 'has_text', v_text, n_rows FROM m
    ORDER BY rule ASC NULLS FIRST"""

  // q271 — per-SLICE contract scorecard (`expect_report.group_cols`):
  // the q270 audit broken out per language — the "which corpus slice is
  // damaged" view that decides where remediation effort goes. Reserved
  // key group_cols inside the rule map; one grouped aggregate pass.
  private def q271(s: SparkSession, dir: String): DataFrame =
    graft.compile.Compiler.compileJson(s, """
      {"source": {"table": "documents"},
       "expect_report": {
         "group_cols": ["lang"],
         "long_enough": "n_chars >= 100",
         "source_known": "source IS NOT NULL"},
       "order_by": ["lang asc", "rule asc"]}""")
  private val q271Sql = """
    SELECT lang,
           r.rule,
           CASE r.rule
             WHEN 'long_enough' THEN v_len
             WHEN 'source_known' THEN v_src END AS n_violations,
           n_rows
    FROM (
      SELECT lang, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN NOT COALESCE(n_chars >= 100, FALSE)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_len,
             CAST(SUM(CASE WHEN NOT COALESCE(source IS NOT NULL, FALSE)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_src
      FROM documents GROUP BY 1)
    CROSS JOIN (VALUES ('long_enough'), ('source_known')) AS r(rule)
    ORDER BY lang ASC NULLS FIRST, rule ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q244_snapshot_diff", q244, Some(q244Sql)),
    Q("q262_overlap_join", q262, Some(q262Sql)),
    Q("q266_corr_moments", q266, Some(q266Sql)),
    Q("q267_connected_components", q267, Some(q267Sql)),
    Q("q268_psi_drift", q268, Some(q268Sql)),
    Q("q270_expect_report", q270, Some(q270Sql)),
    Q("q271_expect_report_grouped", q271, Some(q271Sql)),
    Q("q272_profile_grouped", q272, Some(q272Sql)),
    Q("q273_overlap_impact", q273, Some(q273Sql)),
    Q("q274_overlap_join_left", q274, Some(q274Sql)),
    Q("q277_interval_union_len", q277, Some(q277Sql)),
    Q("q278_max_concurrency", q278, Some(q278Sql)),
    Q("q251_apply_diff", q251, Some(q251Sql)),
    Q("q245_incremental_rebuild", q245, Some(q245Sql)),
    Q("q246_tee_fanout", q246, Some(q246Sql)),
    Q("q10_semi_join", q10, Some(q10Sql)),
    Q("q11_anti_join", q11, Some(q11Sql)),
    Q("q12_set_ops", q12, Some(q12Sql)),
    Q("q13_window_funcs", q13, Some(q13Sql)),
    Q("q14_topk_per_group", q14, Some(q14Sql)),
    Q("q15_distinct", q15, Some(q15Sql)),
    Q("q17_rollup", q17, Some(q17Sql)),
    Q("q18_cube", q18, Some(q18Sql)),
    Q("q19_scalar_funcs", q19, Some(q19Sql)),
    Q("q20_array_funcs", q20, Some(q20Sql)),
    Q("q21_json_funcs", q21, Some(q21Sql)),
    Q("q22_asof_join", q22, Some(q22Sql)),
    Q("q23_range_join", q23, Some(q23Sql)),
    Q("q234_config_range_join", q234, Some(q234Sql)),
    Q("q235_config_unpivot", q235, Some(q235Sql)),
    Q("q236_approx_topk", q236, Some(q236Sql)),
    Q("q237_sketch_table", q237, Some(q236Sql)),
    Q("q238_hll_sketch_table", q238, Some(q238Sql)),
    Q("q149_profile", q149, Some(q149Sql)),
    Q("q150_config_profile", q150, Some(q149Sql))
  )
}
