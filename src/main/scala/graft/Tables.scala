package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Test-corpus table access + oracle-determinism helpers. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    if (table == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects ([PARQUET_TYPE_ILLEGAL]). Read the raw int64 nanos
      // and floor-divide to microseconds — exactly the truncation DuckDB
      // (µs-precision timestamps) applies, so oracle values line up.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$sfDir/$table.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$table.parquet")

  /** Register all corpus tables as temp views so SQL-source specs
    * (`spark.sql`/`spark.table`) resolve by bare name — mirroring the
    * reference's Databricks-table source (`Optimus/megatron.py:63-65`)
    * and matching the DuckDB oracle's view names. */
  @volatile private var registeredDir: String = null
  def registerViews(spark: SparkSession, sfDir: String): Unit = synchronized {
    // idempotent per dir: re-reading 10 parquet footers before every query
    // is pure overhead (the query harness calls this unconditionally)
    if (registeredDir != sfDir) {
      names.foreach(t => load(spark, sfDir, t).createOrReplaceTempView(t))
      // graft's text/vector functions ride along so config expr strings
      // and SQL sources can call them (lang_id, vector_cosine, ...)
      graft.functions.Registry.registerAll(spark)
      registeredDir = sfDir
    }
  }

  /** Deterministic double sum: per-row cast to DECIMAL(25,6) makes the sum
    * exact and order-insensitive (decimal addition is associative), then one
    * cast back to double. DuckDB mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`.
    * A plain double sum is order-sensitive, and Spark's partial/final
    * aggregation order differs run to run → hash-compare would flake. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast("double")
  def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(25,6))) AS DOUBLE)"

  /** Deterministic double avg: exact decimal sum cast to double, divided by
    * count — double/long division of identical operands is identical.
    * DuckDB mirror: `CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)/COUNT(x)`. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(25, 6))).cast("double") / count(c)
  def davgSql(x: String): String = s"${dsumSql(x)} / COUNT($x)"
}
