package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-stage profiling for the q173 flagship (dev tool). */
object ProfileQ173 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalConf(SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerViews(spark, dir)
    spark.table("lineitem").groupBy("l_returnflag").count().count()

    val cleanDef = """
         {"id": "clean", "cache": true,
          "source": {"table": "documents"},
          "derive": {
            "mtext": "concat('Start line here.', char(10), replace(text, ' a ', concat('.', char(10))), char(10), if(doc_id % 7 = 0, 'brace { here.', 'plain mid line.'), char(10), if(doc_id % 11 = 0, 'Lorem ipsum bad.', 'fine line here.'), char(10), 'the of and end line.')",
            "c": "c4_line_filter(mtext, 3)",
            "g": "gopher_quality(c.clean_text)",
            "pat": "doc_id % 128",
            "emb": "transform(sequence(0, 31), d -> CAST(CASE WHEN d = CAST(pat % 16 AS INT) OR d = 16 + CAST(pat DIV 16 AS INT) THEN 1.0 ELSE 0.0 END AS DOUBLE))"},
          "filters": ["c.keep_doc", "g.stop_hits >= 3", "g.n_words >= 5",
                      "g.alpha_word_frac >= 0.9"],
          "keep_columns": ["doc_id", "emb"]}"""

    def time(name: String)(json: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.compile.Compiler.compileJson(spark, json)
      val tc = System.nanoTime()
      val n = df.count()
      println(f"$name%-10s compile ${(tc - t0) / 1e9}%5.2f s  action ${(System.nanoTime() - tc) / 1e9}%5.2f s  rows=$n")
      graft.compile.Compiler.releaseAllCaches()
      spark.catalog.clearCache()
    }
    // derive WITHOUT the quality structs, for the baseline
    val bare = """
      {"source": {"table": "documents"},
       "derive": {"mtext": "concat('x', char(10), replace(text, ' a ', char(10)))"},
       "keep_columns": ["doc_id", "mtext"]}"""
    val c4only = """
      {"source": {"table": "documents"},
       "derive": {"mtext": "concat('x', char(10), replace(text, ' a ', char(10)))",
                  "c": "c4_line_filter(mtext, 3)"},
       "keep_columns": ["doc_id", "c"]}"""
    val gopherOnly = """
      {"source": {"table": "documents"},
       "derive": {"g": "gopher_quality(text)"},
       "keep_columns": ["doc_id", "g"]}"""
    val fullQ173 = """
      {"id": "flag12",
       "defs": [
         {"id": "scored", "cache": true,
          "source": {"table": "documents"},
          "derive": {
            "mtext": "concat('Start line here.', char(10), replace(text, ' a ', concat('.', char(10))), char(10), if(doc_id % 7 = 0, 'brace { here.', 'plain mid line.'), char(10), if(doc_id % 11 = 0, 'Lorem ipsum bad.', 'fine line here.'), char(10), 'the of and end line.')",
            "c": "c4_line_filter(mtext, 3)",
            "g": "gopher_quality(c.clean_text)",
            "pat": "doc_id % 128",
            "emb": "transform(sequence(0, 31), d -> CAST(CASE WHEN d = CAST(pat % 16 AS INT) OR d = 16 + CAST(pat DIV 16 AS INT) THEN 1.0 ELSE 0.0 END AS DOUBLE))"},
          "keep_columns": ["doc_id", "c", "g", "emb"]},
         {"id": "clean", "cache": true,
          "source": {"ref": "scored"},
          "filters": ["c.keep_doc", "g.stop_hits >= 3", "g.n_words >= 5",
                      "g.alpha_word_frac >= 0.9"],
          "keep_columns": ["doc_id", "emb"]}],
       "source": {"ref": "clean"},
       "semantic_dedup": {"id_col": "doc_id", "vec_col": "emb",
                          "threshold": 0.9, "dim": 32, "nlist": 4},
       "global_shuffle": {"id_col": "doc_id", "shards": 4, "seed": 7},
       "aggregate": {"group_by": ["shard"], "aggregations": [
         {"col": "*", "func": "count", "new_name": "n_docs"},
         {"col": "shuffle_pos", "func": "max", "new_name": "max_pos"}]},
       "order_by": ["shard asc"]}"""
    for (i <- 0 until 3) {
      println(s"--- pass $i")
      time("bare")(bare)
      time("c4only")(c4only)
      time("gopher")(gopherOnly)
      time("clean")(s"""{"id": "x", "defs": [$cleanDef], "source": {"ref": "clean"}}""")
      time("clean+sd")(s"""{"id": "x", "defs": [$cleanDef], "source": {"ref": "clean"},
        "semantic_dedup": {"id_col": "doc_id", "vec_col": "emb",
                           "threshold": 0.9, "dim": 32, "nlist": 4}}""")
      time("fullq173")(fullQ173)
    }
    spark.stop()
  }
}
