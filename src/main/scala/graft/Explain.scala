package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper (dev tool): prints the formatted physical plan of
  * the named queries so pushdown / broadcast / codegen spans can be
  * eyeballed — `sbt "runMain graft.Explain q05_join_tree ..."`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = LocalConf(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.compile.Compiler.drainCompileWarnings() // clear stale
      val df = SparkEntry.queries(n)(spark, sfDir)
      // compile-time scale lints (e.g. an O(partition²) UNBOUNDED
      // FOLLOWING frame in a derive) — surfaced where plans are
      // actually reviewed, not just in log.warn noise
      graft.compile.Compiler.drainCompileWarnings()
        .foreach(w => println(s"!! COMPILE WARNING: $w"))
      df.explain("formatted")
      // sweep operator/def caches per query: CacheManager fragment-matching
      // would otherwise substitute one query's persisted subtree into the
      // NEXT query's printed plan (bench clears caches per query, so that
      // cross-pollution is not the shape the timed runs see)
      graft.compile.Compiler.releaseAllCaches()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
