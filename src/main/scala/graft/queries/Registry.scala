package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same parquet
  * tables. Oracle determinism rules (SURVEY §5):
  *   - every query has a total ORDER BY (ties broken by a unique key);
  *   - double sums/avgs go through the DECIMAL(25,6) trick (Tables.dsum);
  *   - Spark sort-null placement is stated explicitly in the SQL
  *     (Spark default: ASC NULLS FIRST / DESC NULLS LAST — DuckDB's
  *     default is the opposite for ASC);
  *   - integer SUMs in DuckDB are CAST(... AS BIGINT) (DuckDB sums to
  *     HUGEINT, Spark to LongType).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

trait QueryPack {
  def queries: Seq[Q]

  /** Recursive delete of a query's scratch dir (the artifact-lifecycle
    * queries re-seed their tmp trees per run) — shared so every pack
    * stops re-defining it inline. */
  protected def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) Option(p.listFiles()).toSeq.flatten.foreach(rmrf)
    p.delete(); ()
  }
}
