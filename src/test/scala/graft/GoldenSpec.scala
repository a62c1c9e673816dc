package graft

import graft.compile.Compiler
import org.apache.spark.sql.functions._

/** Golden end-to-end runs of the reference's own example configs
  * (SURVEY §5.4, FIXTURES.md "Representative config-shaped test inputs"),
  * translated onto the test corpus and checked against hand-built
  * DataFrame equivalents:
  *   - flat iteration/level cascade     (`Optimus/optimus.py:54-80`)
  *   - multi-func agg + rename          (`sparks/optimus.py:52-76`)
  *   - recursive join tree              (`pandas/optimus.py:43-67`)
  *   - nested + filtered agg + bitemporal + grandchildren
  *                                      (`Optimus/hotrod.py:83-113`)
  */
class GoldenSpec extends SparkSpec {

  private lazy val li = Tables.load(spark, sf, "lineitem")
  private lazy val orders = Tables.load(spark, sf, "orders")

  test("optimus.py flat cascade example") {
    // original: group [column1,column2], keep [column3], sum(column4) as
    // sum_column4, filter column5 > 100 — on lineitem per FIXTURES.md
    val out = Compiler.compileJson(spark, s"""
      {"source": {"format": "parquet", "path": "$sf/lineitem.parquet"},
       "iterations": [{"id": "iteration_1",
         "level_1": {
           "group_by": ["l_returnflag", "l_linestatus"],
           "keep_columns": [],
           "aggregations": [{"agg_col": "l_quantity", "agg_func": "sum",
                             "new_name": "sum_l_quantity"}],
           "filters": [{"filter_col": "l_extendedprice", "filter_op": ">",
                        "filter_value": 100}]}}]}""")
    val expect = li.filter(col("l_extendedprice") > 100)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_l_quantity"))
    assert(out.orderBy("l_returnflag", "l_linestatus").collect().toSeq ==
      expect.orderBy("l_returnflag", "l_linestatus").collect().toSeq)
  }

  test("sparks/optimus.py multi-func + rename example") {
    // original: {column2: [sum, max, min]} + rename map
    val out = Compiler.compileJson(spark, s"""
      {"source": {"format": "parquet", "path": "$sf/lineitem.parquet"},
       "aggregation": {
         "group_by": ["l_returnflag"],
         "aggregations": {"l_quantity": ["sum", "max", "min"]}},
       "rename": {"sum_l_quantity": "total_qty",
                  "max_l_quantity": "biggest",
                  "min_l_quantity": "smallest"}}""")
    assert(out.columns.toSeq ==
      Seq("l_returnflag", "total_qty", "biggest", "smallest"))
    val expect = li.groupBy("l_returnflag").agg(
      sum("l_quantity").as("total_qty"),
      max("l_quantity").as("biggest"),
      min("l_quantity").as("smallest"))
    assert(out.orderBy("l_returnflag").collect().toSeq ==
      expect.orderBy("l_returnflag").collect().toSeq)
  }

  test("pandas/optimus.py recursive join-tree example") {
    // original: parent filters + keep + sum agg; child joined inner on a
    // common column — orders parent, customer child on o_custkey
    val out = Compiler.compileJson(spark, s"""
      {"unique_id": "parent",
       "data_path": "$sf/orders.parquet",
       "filters": ["o_totalprice > 0"],
       "aggregation": {
         "group_by": ["o_custkey"],
         "aggregations": {"o_totalprice": ["sum"]}},
       "children": [{
          "unique_id": "child",
          "data_path": "$sf/customer.parquet",
          "keep_columns": ["c_custkey", "c_mktsegment"],
          "rename": {"c_custkey": "o_custkey"},
          "join": {"on": ["o_custkey"], "how": "inner"}}]}""")
    val expect = orders.filter(col("o_totalprice") > 0)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("sum_o_totalprice"))
      .join(Tables.load(spark, sf, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"), "inner")
    assert(out.orderBy("o_custkey").collect().toSeq ==
      expect.orderBy("o_custkey").collect().toSeq)
  }

  test("hotrod.py nested + filtered agg + bitemporal + grandchild example") {
    // original: top filter col1 != 'excluded', avg(col4) filter col4 > 10,
    // child count + grandchild min over link columns, bitemporal stamps
    val out = Compiler.compileJson(spark, s"""
      {"id": "root",
       "source": {"format": "parquet", "path": "$sf/orders.parquet"},
       "filters": [{"col": "o_orderstatus", "op": "!=", "value": "X"}],
       "group_by": ["o_custkey"],
       "aggregate": {
         "o_totalprice": {"function": "avg", "filter": "o_totalprice > 10",
                          "new_name": "avg_big_price"}},
       "bitemporal": {"valid_from": "2024-01-01", "valid_to": "9999-12-31"},
       "children": [{
          "id": "child",
          "source": {"format": "parquet", "path": "$sf/customer.parquet"},
          "rename": {"c_custkey": "o_custkey"},
          "keep_columns": ["c_custkey", "c_nationkey"],
          "aggregate": {"c_nationkey": {"function": "min", "new_name": "min_nation"}},
          "group_by": ["c_custkey"],
          "link": ["o_custkey"], "how": "left",
          "children": [{
            "id": "grandchild",
            "source": {"format": "parquet", "path": "$sf/nation.parquet"},
            "keep_columns": ["n_nationkey", "n_regionkey"],
            "aggregate": {"n_regionkey": {"function": "min", "new_name": "min_region"}},
            "group_by": ["n_nationkey"],
            "rename": {"n_nationkey": "min_nation"},
            "link": ["min_nation"], "how": "left"}]}]}""")
    assert(out.columns.toSet ==
      Set("o_custkey", "avg_big_price", "valid_from", "valid_to",
        "min_nation", "min_region"))
    assert(out.count() == orders.filter(col("o_orderstatus") =!= "X")
      .select("o_custkey").distinct().count())
    // stamps present on every row
    assert(out.filter(col("valid_from") === "2024-01-01").count() == out.count())
  }
}
