package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-stage profiling for the q137 flagship (dev tool): compiles
  * each def prefix of the flagship config and times an action over it, so
  * a wall-time regression can be pinned to the stage that owns it. */
object ProfileQ137 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalConf(SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerViews(spark, dir)
    spark.udf.register("key_to_bmp", queries.MultimodalQueries.keyToBmp)
    spark.udf.register("key_to_png", queries.MultimodalQueries.keyToPng)
    spark.table("lineitem").groupBy("l_returnflag").count().count()

    val union = """{"id": "u", "combine": {"op": "union", "nodes": [
      {"id": "b", "source": {"table": "documents"},
       "derive": {"mkey": "doc_id",
                  "url": "concat('HTTP://News.Example.COM:80/', source, '/item/', cast(doc_id % 40 as string), '/?utm_source=feed&z=9&a=', cast(doc_id % 3 as string), '&fbclid=track#sec')",
                  "curl": "canonical_url(url)", "fmt": "'bmp'"},
       "keep_columns": ["doc_id", "lang", "text", "mkey", "fmt", "curl"]},
      {"id": "p", "source": {"table": "documents"}, "filters": ["doc_id % 20 = 0"],
       "derive": {"doc_id2": "doc_id + 10000000", "mkey": "doc_id",
                  "url": "concat('https://Media.Mirror.NET/media/', cast(doc_id as string), '/?utm_campaign=x')",
                  "curl": "canonical_url(url)",
                  "text2": "concat(text, ' the')", "fmt": "'png'"},
       "keep_columns": ["doc_id2", "lang", "text2", "mkey", "fmt", "curl"],
       "rename": {"doc_id2": "doc_id", "text2": "text"}},
      {"id": "r", "source": {"table": "documents"}, "filters": ["doc_id % 25 = 0"],
       "derive": {"doc_id3": "doc_id + 20000000", "mkey": "doc_id + 20000000",
                  "url": "concat('http://Cache.Example.ORG:80/copy/', cast(doc_id as string), '#cached')",
                  "curl": "canonical_url(url)", "fmt": "'bmp'"},
       "keep_columns": ["doc_id3", "lang", "text", "mkey", "fmt", "curl"],
       "rename": {"doc_id3": "doc_id"}}]},
     "dedup": {"keys": ["curl"], "id_col": "doc_id"}}"""

    def time(name: String)(json: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.compile.Compiler.compileJson(spark, json)
      val tc = System.nanoTime()
      val n = df.count()
      println(f"$name%-12s compile ${(tc - t0) / 1e9}%5.2f s  action ${(System.nanoTime() - tc) / 1e9}%5.2f s  rows=$n")
      graft.compile.Compiler.releaseAllCaches()
      spark.catalog.clearCache()
    }

    val cdDef = s"""{"id": "cd", "cache": true, "combine": {"op": "union", "nodes": [$union]},
          "derive": {"norm": "normalize_text(text)", "fp": "doc_fingerprint_portable(norm)"},
          "dedup": {"keys": ["fp"], "id_col": "doc_id"}}"""
    val scDef = s"""{"id": "sc", "source": {"ref": "cd"},
          "children": [{"id": "lmn", "source": {"ref": "cd"},
                        "lm_perplexity": {"id_col": "doc_id", "text_col": "norm"},
                        "join": {"on": ["doc_id"], "how": "inner"}}]}"""
    val flDef = s"""{"id": "fl", "cache": true, "source": {"ref": "sc"},
          "filters": ["nll <= 3.42"]}"""
    val imDef = s"""{"id": "im", "source": {"ref": "fl"},
          "children": [{"id": "imc", "source": {"ref": "fl"},
                        "derive": {"payload": "if(fmt = 'bmp', key_to_bmp(mkey), key_to_png(mkey))"},
                        "image_dedup": {"id_col": "doc_id", "payload_col": "payload",
                                        "max_dist": 0, "output": "clusters"},
                        "rename": {"id": "doc_id"},
                        "join": {"on": ["doc_id"], "how": "inner"}}]}"""

    for (i <- 0 until 2) {
      println(s"--- pass $i")
      time("union")(union)
      time("cd")(s"""{"id": "x", "defs": [$cdDef], "source": {"ref": "cd"}}""")
      time("cd+sc")(s"""{"id": "x", "defs": [$cdDef, $scDef], "source": {"ref": "sc"}}""")
      time("cd..fl")(s"""{"id": "x", "defs": [$cdDef, $scDef, $flDef], "source": {"ref": "fl"}}""")
      time("cd..im")(s"""{"id": "x", "defs": [$cdDef, $scDef, $flDef, $imDef], "source": {"ref": "im"}}""")
    }
    spark.stop()
  }
}
