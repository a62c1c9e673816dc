package graft
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSet
    val builder = LocalConf(SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc A/B overrides: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.registerViews(spark, sfDir)
    spark.table("lineitem").groupBy("l_returnflag").count().count()
    // runs > 1 separates first-run codegen cost (run 1) from the warm
    // steady state (runs 2+) — the number the battery's median reports.
    val runs = sys.env.getOrElse("SPARK_GRAFT_QBENCH_RUNS", "1").toInt
    SparkEntry.queries.filter(q => names.isEmpty || names(q._1)).foreach { case (name, fn) =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[qbench] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        graft.compile.Compiler.releaseAllCaches()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
