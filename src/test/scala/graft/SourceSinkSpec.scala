package graft

import graft.compile.Compiler
import java.nio.file.Files

/** Source/sink coverage the parquet-only query battery doesn't hit:
  * CSV with/without inferSchema (S1/S2), JSON lines source, CSV + parquet
  * sinks (S5), per-iteration cascade saves, limit. */
class SourceSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft_io").toString

  test("csv roundtrip through config: inferSchema source → csv sink") {
    val csvDir = s"$tmp/in_csv"
    Seq(("a", 1, 2.5), ("b", 2, 3.5), ("a", 3, 4.0)).toDF("k", "id", "v")
      .write.option("header", "true").mode("overwrite").csv(csvDir)
    val out = Compiler.compileJson(spark, s"""
      {"source": {"format": "csv", "path": "$csvDir"},
       "group_by": ["k"],
       "aggregations": [{"col": "v", "func": "sum", "new_name": "sv"}],
       "order_by": ["k asc"],
       "save": {"format": "csv", "path": "$tmp/out_csv", "mode": "overwrite"}}""")
    // inferSchema gave numeric types
    assert(out.schema("sv").dataType.typeName == "double")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/out_csv").orderBy("k")
    assert(back.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 6.5), ("b", 3.5)))
  }

  test("csv without inferSchema reads all-string (reference S2 semantics)") {
    val csvDir = s"$tmp/in_csv2"
    Seq(("a", 1)).toDF("k", "n").write.option("header", "true").mode("overwrite").csv(csvDir)
    val df = Compiler.readSource(spark,
      graft.spec.SourceSpec(format = "csv", path = Some(csvDir),
        options = Map("inferSchema" -> "false")))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("warc source: records explode binary-safe; batch and stream agree") {
    val dir = s"$tmp/in_warc"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    def rec(headers: String, payload: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\n${headers}Content-Length: ${payload.length}\r\n\r\n")
        .getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val bin = Array[Byte](0, 1, -1, 13, 10, -128, 127)
    val bytes =
      rec("WARC-Type: warcinfo\r\n", "software: test".getBytes) ++
        rec("WARC-Type: response\r\nWARC-Target-URI: http://a/1\r\n" +
          "WARC-Date: 2026-01-01T00:00:00Z\r\n", "hello world".getBytes) ++
        rec("WARC-Type: response\r\nWARC-Target-URI: http://a/2\r\n", bin)
    Files.write(java.nio.file.Paths.get(s"$dir/f1.warc"), bytes)
    val out = Compiler.compileJson(spark, s"""
      {"source": {"format": "warc", "path": "$dir"},
       "filters": [{"col": "warc_type", "op": "==", "value": "response"}],
       "order_by": ["url asc"]}""")
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("url")).toSeq == Seq("http://a/1", "http://a/2"))
    assert(new String(rows(0).getAs[Array[Byte]]("payload")) == "hello world")
    assert(rows(0).getAs[Long]("content_length") == 11L)
    assert(rows(0).getAs[String]("warc_date") == "2026-01-01T00:00:00Z")
    assert(rows(1).getAs[Array[Byte]]("payload").toSeq == bin.toSeq,
      "binary payload must survive the source byte-exact")
    // the warcinfo record is present pre-filter with a NULL url
    val all = Compiler.readSource(spark,
      graft.spec.SourceSpec(format = "warc", path = Some(dir)))
    assert(all.count() == 3)
    assert(all.filter("warc_type = 'warcinfo'").collect().head.isNullAt(1))
    // a SECOND file in the same directory, compressed member-per-record
    // (.warc.gz layout): the sniffing source reads both with one plan
    val gzBytes =
      graft.functions.GzipOps.gzip(
        rec("WARC-Type: response\r\nWARC-Target-URI: http://gz/1\r\n",
          "compressed page".getBytes)) ++
      graft.functions.GzipOps.gzip(
        rec("WARC-Type: request\r\n", "GET".getBytes))
    Files.write(java.nio.file.Paths.get(s"$dir/f2.warc.gz"), gzBytes)
    val mixed = Compiler.readSource(spark,
      graft.spec.SourceSpec(format = "warc", path = Some(dir)))
    assert(mixed.count() == 5, "3 plain + 2 gz records")
    val gzRow = mixed.filter("url = 'http://gz/1'").collect().head
    assert(new String(gzRow.getAs[Array[Byte]]("payload")) == "compressed page")

    // stream twin: same rows through readStreamSource
    val sdf = Compiler.readStreamSource(spark,
      graft.spec.SourceSpec(format = "warc", path = Some(dir), stream = true))
    val q = sdf.writeStream.format("memory").queryName("warc_stream_t")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("warc_stream_t")
    assert(streamed.count() == 5, "3 plain + 2 gz records through the stream")
    assert(streamed.filter("warc_type = 'response'")
      .select("url").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("http://a/1", "http://a/2", "http://gz/1"))
  }

  test("json lines source") {
    val jsonDir = s"$tmp/in_json"
    Seq("""{"k":"a","v":1}""", """{"k":"b","v":2}""").toDS()
      .write.mode("overwrite").text(jsonDir)
    val out = Compiler.compileJson(spark, s"""
      {"source": {"format": "json", "path": "$jsonDir"},
       "filters": ["v > 1"], "order_by": ["k asc"]}""")
    assert(out.select("k").as[String].collect().toSeq == Seq("b"))
  }

  test("orc roundtrip via format passthrough") {
    val orcDir = s"$tmp/in_orc"
    Seq(("a", 1.5), ("b", 2.5)).toDF("k", "v").write.mode("overwrite").orc(orcDir)
    val out = Compiler.compileJson(spark, s"""
      {"source": {"format": "orc", "path": "$orcDir"},
       "order_by": ["k asc"],
       "save": {"format": "orc", "path": "$tmp/out_orc", "mode": "overwrite"}}""")
    assert(out.count() == 2)
    val back = spark.read.orc(s"$tmp/out_orc").orderBy("k")
    assert(back.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 1.5), ("b", 2.5)))
  }

  test("cascade with two iterations saves one parquet per iteration") {
    Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
      .createOrReplaceTempView("cascade_src")
    val out = Compiler.compileJson(spark, s"""
      {"source": {"table": "cascade_src"},
       "iterations": [
         {"id": "it1",
          "levels": [{"group_by": ["k"],
                      "aggregations": [{"col": "v", "func": "sum", "new_name": "sv"}]}],
          "save": {"path": "$tmp/it1", "mode": "overwrite"}},
         {"id": "it2",
          "levels": [{"aggregations": [{"col": "v", "func": "max", "new_name": "mx"}],
                      "group_by": []}],
          "save": {"path": "$tmp/it2", "mode": "overwrite"}}]}""")
    assert(spark.read.parquet(s"$tmp/it1").count() == 2)
    assert(spark.read.parquet(s"$tmp/it2").collect().head.getDouble(0) == 3.0)
    assert(out.columns.toSeq == Seq("mx")) // last iteration's result returned
  }

  test("limit in config") {
    val out = Compiler.compileJson(spark, s"""
      {"source": {"sql": "SELECT * FROM range(100)"},
       "order_by": ["id desc"], "limit": 5}""")
    assert(out.count() == 5)
  }
}
