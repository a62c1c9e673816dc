package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All query packs. Each pack covers one SURVEY §2 slice. */
  private val packs: Seq[QueryPack] = Seq(
    RefQueries,
    RelQueries,
    TextQueries,
    DedupQueries,
    SimQueries,
    StreamQueries,
    MultimodalQueries,
    ExtraQueries,
    CorpusQueries
  )

  private lazy val all: Seq[Q] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the end-to-end training-data curation pipeline declared as ONE config
    * (scan-stage scoring via registered functions → quality/language
    * filters → content dedup → deterministic sample → per-language corpus
    * stats), q60 — the engine's two halves, the config compiler and the
    * LLM-pipeline operator library, in a single plan. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    all.find(_.name == "q60_curation_pipeline").get.run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2.
    * Corpus views are (re-)registered before each query so config specs can
    * use `table`/`sql` sources by bare name — and so `events` gets its
    * nanosecond-timestamp normalization (Tables.load) everywhere. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> { (s: SparkSession, dir: String) =>
      Tables.registerViews(s, dir)
      q.run(s, dir)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
