package graft

import graft.compile.Compiler
import graft.spec.JsonCodec
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** CLI entry point — run a pipeline config end-to-end:
  *
  *   sbt "runMain graft.Run <config.json> [--validate] [--show N] [--explain] [--stream]"
  *
  * The config's own `save` sinks do the writing; `--show N` prints the
  * first N result rows, `--validate` only checks the config and exits
  * non-zero on errors, `--explain` prints the physical plan, `--stream`
  * runs the config as a Structured Streaming job (see USAGE.md).
  * `--tables DIR` registers the test-corpus parquet tables (and graft's
  * SQL functions) so configs can use bare `table`/`sql` sources.
  */
object Run {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.Run <config.json> [--validate] [--show N] [--explain] [--tables DIR]")
      sys.exit(2)
    }
    val configPath = args(0)
    val rest = args.drop(1)
    def flag(name: String): Boolean = rest.contains(name)
    def opt(name: String): Option[String] =
      rest.sliding(2).collectFirst { case Array(`name`, v) => v }

    val json = Files.readString(Paths.get(configPath))
    val spec = JsonCodec.parse(json)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalConf(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    opt("--tables").foreach(dir => Tables.registerViews(spark, dir))
    graft.functions.Registry.registerAll(spark)

    val errors = Compiler.validatePipeline(spark, spec)
    if (errors.nonEmpty) {
      errors.foreach(e => System.err.println(s"[graft] config error: $e"))
      spark.stop()
      sys.exit(1)
    }
    if (flag("--validate")) {
      println(s"[graft] $configPath: OK")
      spark.stop()
      return
    }

    if (flag("--stream")) {
      // run the SAME config as a Structured Streaming job (root source →
      // readStream, root save → writeStream); blocks until the trigger
      // completes (available_now/once) or the process is stopped
      val q = Compiler.compileStream(spark, spec)
      q.awaitTermination()
      spark.stop()
      return
    }

    val df = Compiler.compile(spark, spec) // executes the config's sinks
    if (flag("--explain")) df.explain("formatted")
    opt("--show") match {
      case Some(n) => df.show(n.toInt, truncate = false)
      case None    => if (!flag("--explain")) println(s"[graft] rows: ${df.count()}")
    }
    spark.stop()
  }
}
