package graft

import graft.ops.Layout
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-layout invariants: bucketing kills the join exchange,
  * range-sorted files own disjoint key ranges (min/max skipping works),
  * hive partitioning prunes, and the z-order interleave is bit-exact. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("bucketed tables join with NO shuffle exchange") {
    val a = spark.range(0, 1000).select($"id", ($"id" * 3 % 101).as("va"))
    val b = spark.range(0, 1000).select($"id", ($"id" * 7 % 101).as("vb"))
    Layout.writeBucketed(a, "bkt_a", Seq("id"), buckets = 4, sortCols = Seq("id"))
    Layout.writeBucketed(b, "bkt_b", Seq("id"), buckets = 4, sortCols = Seq("id"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real (non-broadcast) join so the exchange would be visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan
      val resolved = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val exchanges = resolved.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join should plan no exchange, found ${exchanges.size}:\n$resolved")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("range-sorted layout: output files own disjoint key ranges") {
    val dir = tmp("graft-rangesort")
    Layout.writeRangeSorted(
      Tables.load(spark, sf, "lineitem"), dir, Seq("l_orderkey"), numRanges = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length > 1, "expected multiple range files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey")).first()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"file ranges overlap: hi=$hiA vs next lo=$loB")
      case _ =>
    }
  }

  test("hive-partitioned layout prunes to the selected partition") {
    val dir = tmp("graft-hivepart")
    Layout.writePartitioned(
      Tables.load(spark, sf, "documents"), dir, Seq("lang"))
    val langs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langs.length > 1, s"expected one dir per lang, got ${langs.toSeq}")
    val one = spark.read.parquet(dir).filter($"lang" === "en")
    // partition pruning: the scan's selected partitions must not include
    // other langs — visible as the partition count in the file index
    val expected = Tables.load(spark, sf, "documents")
      .filter($"lang" === "en").count()
    assert(one.count() == expected)
    val scanned = one.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.contains(1), s"expected 1 pruned partition, got $scanned")
  }

  test("zorderValue matches a bit-twiddling reference implementation") {
    def ref(xs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits; j <- xs.indices)
        z |= ((xs(j) >> i) & 1L) << (i * xs.size + j)
      z
    }
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zorderValue(Seq($"x", $"y"), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(Seq(x, y), 4), s"z($x,$y)")
    }
    // 3-column interleave too
    val g3 = Seq((5L, 3L, 7L)).toDF("a", "b", "c")
      .select(Layout.zorderValue(Seq($"a", $"b", $"c"), 3)).first().getLong(0)
    assert(g3 == ref(Seq(5L, 3L, 7L), 3))
  }

  test("quantileBucket: counts cutpoints below the value, handles skew") {
    val cuts = Seq(10.0, 20.0, 30.0)
    val got = Seq(5, 10, 15, 25, 99).toDF("v")
      .select(Layout.quantileBucket($"v", cuts).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 1, 2, 3))
  }

  test("config layout sinks: partition_by prunes, range_by files disjoint, bucket_by joins exchange-free") {
    Tables.registerViews(spark, sf)
    // partition_by from JSON → hive dirs → file-index pruning
    val pdir = tmp("graft-cfg-part")
    graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "documents"},
       "keep_columns": ["doc_id", "lang", "n_chars"],
       "save": {"path": "$pdir", "partition_by": ["lang"]}}""")
    val one = spark.read.parquet(pdir).filter($"lang" === "en")
    val scanned = one.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.contains(1), s"expected 1 pruned partition, got $scanned")
    // range_by from JSON → disjoint per-file key ranges
    val rdir = tmp("graft-cfg-range")
    graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "lineitem"},
       "keep_columns": ["l_orderkey", "l_quantity"],
       "save": {"path": "$rdir", "range_by": ["l_orderkey"], "ranges": 4}}""")
    val files = new java.io.File(rdir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("l_orderkey"), max("l_orderkey")).first()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB, "file ranges overlap")
      case _ =>
    }
    // bucket_by from JSON → catalog table → exchange-free self-join
    graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "orders"},
       "keep_columns": ["o_orderkey", "o_totalprice"],
       "save": {"table": "cfg_bkt", "bucket_by": ["o_orderkey"],
                "buckets": 4, "sort_by": ["o_orderkey"]}}""")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("cfg_bkt").join(
        spark.table("cfg_bkt").select($"o_orderkey", $"o_totalprice".as("p2")), "o_orderkey")
      j.count()
      val resolved = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(resolved.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"config-bucketed self-join should plan no exchange:\n$resolved")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS cfg_bkt")
    }
  }

  test("config layout sinks: misuse throws with the site named") {
    Tables.registerViews(spark, sf)
    def bad(saveJson: String): String =
      intercept[IllegalArgumentException](
        graft.compile.Compiler.compileJson(spark, s"""
          {"source": {"table": "documents"}, "keep_columns": ["doc_id", "lang"],
           "save": $saveJson}""")).getMessage
    // two layout modes at once
    assert(bad(s"""{"path": "/tmp/x", "partition_by": ["lang"], "range_by": ["doc_id"], "ranges": 2}""")
      .contains("exactly ONE"))
    // sort_by without bucket_by
    assert(bad(s"""{"path": "/tmp/x", "range_by": ["doc_id"], "ranges": 2, "sort_by": ["doc_id"]}""")
      .contains("sort_by"))
    // bucket_by without a catalog table
    assert(bad(s"""{"path": "/tmp/x", "bucket_by": ["doc_id"], "buckets": 4}""")
      .contains("table"))
    // range_by without ranges
    assert(bad(s"""{"path": "/tmp/x", "range_by": ["doc_id"]}""").contains("ranges"))
    // layout sinks are overwrite-only
    assert(bad(s"""{"path": "/tmp/x", "partition_by": ["lang"], "mode": "append"}""")
      .contains("overwrite"))
    // and the global-pass modes are batch-only on a stream sink
    val sdf = spark.readStream.format("rate").load()
    val err = intercept[IllegalArgumentException](
      graft.compile.Compiler.startStreamSink(sdf, graft.spec.SinkSpec(
        path = "/tmp/x",
        layout = Some(graft.spec.SinkLayoutSpec(zorderBy = Seq("a", "b"), ranges = 2)))))
    assert(err.getMessage.contains("batch-only"))
  }

  test("z-ordered write preserves rows and improves per-file column locality") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val dir = tmp("graft-zorder")
    // 8 range files (not 4): repartitionByRange's sample seed varies
    // with rdd.id, and at 4 files the per-file span is one unlucky
    // boundary away from the threshold — 8 files make the locality
    // signal robust to the sampling seed
    Layout.writeZOrdered(li, dir, Seq("l_partkey", "l_suppkey"),
      bits = 4, numRanges = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.columns.sorted.toSeq == li.columns.sorted.toSeq)
    // locality: average per-file span of BOTH z-ordered columns must beat
    // the unsorted baseline's (each file ~ the full value range)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1)
    def spans(paths: Seq[String], c: String): Double = {
      val ss = paths.map { p =>
        val r = spark.read.parquet(p).agg(min(c), max(c)).first()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      ss.sum / ss.size
    }
    val global = li.agg(min("l_partkey"), max("l_partkey")).first()
    val globalSpan = (global.getLong(1) - global.getLong(0)).toDouble
    val partSpan = spans(files.toSeq, "l_partkey")
    assert(partSpan < globalSpan * 0.75,
      s"z-order should shrink per-file l_partkey span: $partSpan vs $globalSpan")
  }
}
