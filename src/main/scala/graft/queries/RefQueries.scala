package graft.queries

import graft.Tables.{dsumSql, davgSql}
import graft.compile.Compiler
import graft.spec.JsonCodec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference-parity operators (SURVEY §2.1), each exercised through the
  * JSON config surface → JsonCodec → Compiler, so these queries test the
  * metadata-driven engine itself, not hand-written DataFrame code.
  */
object RefQueries extends QueryPack {

  private def cfg(spark: SparkSession, json: String): DataFrame =
    Compiler.compile(spark, JsonCodec.parse(json))

  // q01 — iteration×level cascade (EP1/R2: `Optimus/optimus.py:40-51`):
  // level 1 filters + group-by agg, level 2 re-aggregates level 1's output.
  private def q01(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"source": {"format": "parquet", "path": "$dir/lineitem.parquet"},
     "iterations": [{
       "id": "it1",
       "levels": [
         {"filters": ["l_quantity > 5",
                      {"col": "l_linestatus", "op": "!=", "value": "X"}],
          "group_by": ["l_returnflag", "l_linestatus"],
          "aggregations": [
            {"col": "l_quantity", "func": "dsum", "new_name": "sum_qty"},
            {"col": "l_extendedprice", "func": "dsum", "new_name": "sum_price"},
            {"col": "*", "func": "count", "new_name": "n"}]},
         {"group_by": ["l_returnflag"],
          "aggregations": [
            {"col": "sum_qty", "func": "dsum", "new_name": "qty_total"},
            {"col": "n", "func": "sum", "new_name": "n_total"}],
          "order_by": ["l_returnflag asc"]}
       ]}]}""")
  private val q01Sql = s"""
    WITH l1 AS (
      SELECT l_returnflag, l_linestatus,
             ${dsumSql("l_quantity")} AS sum_qty,
             ${dsumSql("l_extendedprice")} AS sum_price,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_quantity > 5 AND l_linestatus <> 'X'
      GROUP BY 1, 2)
    SELECT l_returnflag,
           ${dsumSql("sum_qty")} AS qty_total,
           CAST(SUM(n) AS BIGINT) AS n_total
    FROM l1 GROUP BY 1 ORDER BY l_returnflag ASC NULLS FIRST"""

  // q02 — full filter surface (F1 ==, F3 >, F4 isin, F5 expr string) +
  // keep_columns projection (P1) on orders.
  private def q02(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"source": {"format": "parquet", "path": "$dir/orders.parquet"},
     "filters": [
       {"col": "o_orderstatus", "op": "==", "value": "O"},
       {"col": "o_totalprice", "op": ">", "value": 1000},
       {"col": "o_orderpriority", "op": "isin", "value": ["1-URGENT", "2-HIGH", "3-MEDIUM"]},
       "o_custkey % 2 = 0"],
     "keep_columns": ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
     "order_by": ["o_orderkey asc"]}""")
  private val q02Sql = """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 1000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      AND o_custkey % 2 = 0
    ORDER BY o_orderkey ASC NULLS FIRST"""

  // q03 — multi-function fan-out per column (A6: `sparks/optimus.py:26-33`
  // {col: [funcs]}) + rename map (P3: `sparks/optimus.py:69-73`).
  private def q03(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"source": {"format": "parquet", "path": "$dir/lineitem.parquet"},
     "aggregation": {
       "group_by": ["l_suppkey"],
       "aggregations": {"l_quantity": ["dsum", "max", "min"],
                        "l_discount": ["max"]}},
     "rename": {"dsum_l_quantity": "sum_qty",
                "max_l_quantity": "max_qty",
                "min_l_quantity": "min_qty",
                "max_l_discount": "max_disc"},
     "order_by": ["l_suppkey asc"]}""")
  private val q03Sql = s"""
    SELECT l_suppkey, ${dsumSql("l_quantity")} AS sum_qty,
           MAX(l_quantity) AS max_qty, MIN(l_quantity) AS min_qty,
           MAX(l_discount) AS max_disc
    FROM lineitem GROUP BY 1 ORDER BY l_suppkey ASC NULLS FIRST"""

  // q04 — filtered (conditional) aggregates (A5: `Optimus/soundwave.py:57-62`
  // avg-where) in hotrod config spelling {col: {filter, function}}.
  private def q04(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"source": {"table": "events"},
     "group_by": ["event_type"],
     "aggregate": {
       "value": {"function": "davg", "filter": "value > 10", "new_name": "avg_big_value"},
       "event_id": {"function": "count", "new_name": "n_events"},
       "user_id": {"function": "count_distinct", "new_name": "n_users"}},
     "order_by": ["event_type asc"]}""")
  private val q04Sql = s"""
    SELECT event_type,
           ${dsumSql("CASE WHEN value > 10 THEN value END")} / COUNT(CASE WHEN value > 10 THEN value END) AS avg_big_value,
           COUNT(event_id) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""

  // q05 — recursive parent→child→grandchild tree (R1/J1/J2:
  // `pandas/optimus.py:31-38`, grandchildren `Optimus/hotrod.py:103-110`):
  // orders aggregated per customer, joined inner to the customer dimension,
  // which itself left-joins nation. Catalyst broadcasts the small sides.
  private def q05(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"id": "par",
     "source": {"format": "parquet", "path": "$dir/orders.parquet"},
     "group_by": ["o_custkey"],
     "aggregations": [
       {"col": "*", "func": "count", "new_name": "n_orders"},
       {"col": "o_totalprice", "func": "dsum", "new_name": "sum_price"}],
     "children": [{
        "id": "cust",
        "source": {"format": "parquet", "path": "$dir/customer.parquet"},
        "keep_columns": ["c_custkey", "c_nationkey", "c_mktsegment"],
        "rename": {"c_custkey": "o_custkey"},
        "join": {"on": ["o_custkey"], "how": "inner"},
        "children": [{
           "id": "nat",
           "source": {"format": "parquet", "path": "$dir/nation.parquet"},
           "keep_columns": ["n_nationkey", "n_name"],
           "rename": {"n_nationkey": "c_nationkey"},
           "join": {"on": ["c_nationkey"], "how": "left"}}]}],
     "order_by": ["o_custkey asc"]}""")
  private val q05Sql = s"""
    WITH par AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             ${dsumSql("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1),
    cust AS (
      SELECT c_custkey AS o_custkey, c_nationkey, c_mktsegment,
             n_name
      FROM customer
      LEFT JOIN (SELECT n_nationkey AS c_nationkey, n_name FROM nation) n
      USING (c_nationkey))
    SELECT par.o_custkey, n_orders, sum_price, c_nationkey, c_mktsegment, n_name
    FROM par JOIN cust USING (o_custkey)
    ORDER BY o_custkey ASC NULLS FIRST"""

  // q06 — nested aggregate + bitemporal stamping (EP3:
  // `Optimus/soundwave.py:31-80`, stamps at `:76-78`) + literal column (P4).
  private def q06(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"source": {"table": "events"},
     "group_by": ["event_type"],
     "aggregations": [
       {"col": "value", "func": "davg", "new_name": "avg_value"},
       {"col": "value", "func": "max", "new_name": "max_value"},
       {"col": "*", "func": "count", "new_name": "n"}],
     "with_columns": {"engine": "'graft'"},
     "bitemporal": {"valid_from": "2024-01-01", "valid_to": "9999-12-31"},
     "order_by": ["event_type asc"]}""")
  private val q06Sql = s"""
    SELECT event_type, ${davgSql("value")} AS avg_value,
           MAX(value) AS max_value, COUNT(*) AS n,
           'graft' AS engine,
           '2024-01-01' AS valid_from, '9999-12-31' AS valid_to
    FROM events GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""

  // q98 — q06's bitemporal stamp PARAMETERIZED end-to-end (SURVEY §1.5:
  // "make the stamp configurable (as-of timestamp parameter) rather than
  // hardcoded"): a NON-default as-of window and custom stamp column
  // names, all four flowing from the JSON config through BitemporalSpec
  // to the output schema — proving nothing in the path is hardcoded.
  private def q98(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"source": {"table": "events"},
     "group_by": ["event_type"],
     "aggregations": [
       {"col": "value", "func": "dsum", "new_name": "sum_value"},
       {"col": "*", "func": "count", "new_name": "n"}],
     "bitemporal": {"valid_from": "2026-08-12", "valid_to": "2027-01-01",
                    "from_col": "as_of", "to_col": "valid_until"},
     "order_by": ["event_type asc"]}""")
  private val q98Sql = s"""
    SELECT event_type, ${dsumSql("value")} AS sum_value, COUNT(*) AS n,
           '2026-08-12' AS as_of, '2027-01-01' AS valid_until
    FROM events GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""

  // q07 — filter → projection → rename, no aggregation (P1/P3 alone).
  private def q07(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"source": {"format": "parquet", "path": "$dir/part.parquet"},
     "filters": [{"col": "p_size", "op": ">", "value": 10}],
     "keep_columns": ["p_partkey", "p_brand", "p_retailprice"],
     "rename": {"p_brand": "brand"},
     "order_by": ["p_partkey asc"]}""")
  private val q07Sql = """
    SELECT p_partkey, p_brand AS brand, p_retailprice
    FROM part WHERE p_size > 10
    ORDER BY p_partkey ASC NULLS FIRST"""

  // q08 — null-safe equality filter (F2: `Optimus/megatron.py:11`
  // eqNullSafe) + string predicate ops.
  private def q08(spark: SparkSession, dir: String): DataFrame = cfg(spark, s"""
    {"source": {"format": "parquet", "path": "$dir/customer.parquet"},
     "filters": [
       {"col": "c_mktsegment", "op": "==", "value": "BUILDING", "null_safe": true},
       {"col": "c_name", "op": "starts_with", "value": "Customer"}],
     "keep_columns": ["c_custkey", "c_name", "c_acctbal"],
     "order_by": ["c_custkey asc"]}""")
  private val q08Sql = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment IS NOT DISTINCT FROM 'BUILDING'
      AND c_name LIKE 'Customer%'
    ORDER BY c_custkey ASC NULLS FIRST"""

  // q09 — SQL source (S4: `Optimus/soundwave.py:24-27` spark.sql) feeding a
  // config node; requires Tables.registerViews (done by query harness).
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(spark, dir)
    cfg(spark, s"""
      {"source": {"sql": "SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice FROM lineitem WHERE l_quantity >= 30"},
       "group_by": ["l_orderkey"],
       "aggregations": [
         {"col": "l_quantity", "func": "dsum", "new_name": "big_qty"},
         {"col": "l_partkey", "func": "count_distinct", "new_name": "n_parts"}],
       "order_by": ["l_orderkey asc"]}""")
  }
  private val q09Sql = s"""
    SELECT l_orderkey, ${dsumSql("l_quantity")} AS big_qty,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem WHERE l_quantity >= 30
    GROUP BY 1 ORDER BY l_orderkey ASC NULLS FIRST"""

  override def queries: Seq[Q] = Seq(
    Q("q01_cascade_agg", q01, Some(q01Sql)),
    Q("q02_filter_ops", q02, Some(q02Sql)),
    Q("q03_multifunc_rename", q03, Some(q03Sql)),
    Q("q04_filtered_agg", q04, Some(q04Sql)),
    Q("q05_join_tree", q05, Some(q05Sql)),
    Q("q06_bitemporal", q06, Some(q06Sql)),
    Q("q07_project_rename", q07, Some(q07Sql)),
    Q("q08_nullsafe_filter", q08, Some(q08Sql)),
    Q("q09_sql_source", q09, Some(q09Sql)),
    Q("q98_bitemporal_asof", q98, Some(q98Sql))
  )
}
