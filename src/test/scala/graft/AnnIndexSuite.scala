package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** At-rest ANN index (saveAnnIndex / annSearchIndex + the ann_index /
  * ann_search config keys): bit-identity with the in-memory ivfTopK,
  * the list-partitioned physical layout, conservation, and guards. */
class AnnIndexSuite extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus: 60 vectors of dim 8 from a
  // seeded LCG — clusterable enough that nlist=4 lists are non-trivial
  private def corpus = {
    var s = 12345L
    def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33).toInt % 1000) / 500.0 - 1.0 }
    (1L to 60L).map(i => (i, Array.fill(8)(next().toFloat))).toDF("vid", "emb")
  }

  test("annSearchIndex == ivfTopK bit-for-bit (partial and full probe)") {
    val c = corpus
    val q = c.filter($"vid" <= 6).select($"vid".as("qid"), $"emb")
    val dir = java.nio.file.Files.createTempDirectory("graft-ann").toString
    for ((nlist, nprobe, refine) <- Seq((4, 2, 0), (4, 4, 0), (8, 3, 1))) {
      Similarity.saveAnnIndex(spark, c, "vid", "emb", s"$dir/i$nlist$nprobe$refine",
        nlist = nlist, refineRounds = refine)
      val viaIndex = Similarity.annSearchIndex(
          q, "qid", "emb", s"$dir/i$nlist$nprobe$refine", k = 3, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val inMemory = Similarity.ivfTopK(
          q, c.select($"vid".as("mid"), $"emb"),
          "qid", "emb", "mid", "emb",
          k = 3, nlist = nlist, nprobe = nprobe, refineRounds = refine)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(viaIndex == inMemory, s"nlist=$nlist nprobe=$nprobe refine=$refine")
      assert(viaIndex.nonEmpty)
    }
  }

  test("index layout: list-partitioned parquet, every vector assigned once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-layout").toString
    Similarity.saveAnnIndex(spark, corpus, "vid", "emb", s"$dir/idx", nlist = 4)
    // partitioned write → list=<n> subdirectories (the pruning unit)
    val subdirs = new java.io.File(s"$dir/idx/index").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("list=")).toSeq
    assert(subdirs.nonEmpty && subdirs.forall(_.matches("list=\\d+")))
    val idx = spark.read.parquet(s"$dir/idx/index")
    assert(idx.count() == 60L)
    assert(idx.select("id").distinct().count() == 60L)
    assert(idx.agg(min("list"), max("list")).collect().head match {
      case r => r.getInt(0) >= 0 && r.getInt(1) <= 3
    })
    // centroids are the bounded metadata side
    assert(spark.read.parquet(s"$dir/idx/centroids").count() <= 4L)
  }

  test("appendAnnIndex: saved centroids, full-coverage exact over the union") {
    val c = corpus
    val first = c.filter($"vid" <= 40)
    val later = c.filter($"vid" > 40)
    val q = c.filter($"vid" <= 4).select($"vid".as("qid"), $"emb")
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-app").toString
    Similarity.saveAnnIndex(spark, first, "vid", "emb", s"$dir/idx", nlist = 4)
    Similarity.appendAnnIndex(spark, later, "vid", "emb", s"$dir/idx")
    // conservation: all 60 vectors, each exactly once, lists in range
    val idx = spark.read.parquet(s"$dir/idx/index")
    assert(idx.count() == 60L && idx.select("id").distinct().count() == 60L)
    // appended rows carry the ORIGINAL centroids' assignment: appending
    // the same batch again yields identical (id, list) rows (no refit)
    val before = idx.filter($"id" > 40)
      .select("id", "list").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    Similarity.appendAnnIndex(spark, later, "vid", "emb", s"$dir/idx")
    val after = spark.read.parquet(s"$dir/idx/index").filter($"id" > 40)
      .select("id", "list").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(after.length == 2 * before.size && after.toSet == before)
    // full-coverage search over a build+append index == brute force over
    // the union, regardless of which half fit the centroids
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ann-app2").toString
    Similarity.saveAnnIndex(spark, first, "vid", "emb", s"$dir2/idx", nlist = 4)
    Similarity.appendAnnIndex(spark, later, "vid", "emb", s"$dir2/idx")
    val viaIndex = Similarity.annSearchIndex(q, "qid", "emb", s"$dir2/idx",
        k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = Similarity.cosineTopK(q, c.select($"vid".as("mid"), $"emb"),
        "qid", "emb", "mid", "emb", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaIndex == brute)
    // appending into an absent index is a named error, not a bad write
    val e = intercept[IllegalArgumentException](
      Similarity.appendAnnIndex(spark, later, "vid", "emb", s"$dir/nope"))
    assert(e.getMessage.contains("centroids"))
  }

  test("annProbeIndex: exact max-cosine flag, stream == batch, guards") {
    val c = corpus
    val bench = c.filter($"vid" <= 10)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-probe").toString
    Similarity.saveAnnIndex(spark, bench, "vid", "emb", s"$dir/idx", nlist = 2)
    val got = Similarity.annProbeIndex(c, "emb", s"$dir/idx", threshold = 0.5)
      .select("vid", "ann_score", "ann_match")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    // expected: plain cross-join max of the same rounded cosine
    val expected = c.crossJoin(
        bench.select($"vid".as("bid"), $"emb".as("bemb")))
      .select($"vid", round(Similarity.cosine($"emb", $"bemb"), 9).as("cos"))
      .groupBy("vid").agg(max("cos").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (score, flag)) =>
      assert(score == expected(id), s"vid=$id")
      assert(flag == (score >= 0.5), s"vid=$id")
    }
    // benchmark members self-match at exactly 1.0
    (1L to 10L).foreach(id => assert(got(id)._1 == 1.0, s"vid=$id"))
    // the probe is plan-only: no Exchange, no join in the executed plan
    val plan = Similarity.annProbeIndex(c, "emb", s"$dir/idx", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join"),
      s"probe must stay scan-stage:\n$plan")
    // streaming twin: identical flags/scores through compileStreamJson
    val sdir = java.nio.file.Files.createTempDirectory("graft-ann-probe-s").toString
    c.coalesce(1).write.parquet(s"$sdir/in")
    val body = s""""ann_probe": {"vec_col": "emb", "index_dir": "$dir/idx",
                    "threshold": 0.5}"""
    val q = graft.compile.Compiler.compileStreamJson(spark, s"""
      {"source": {"path": "$sdir/in"}, $body,
       "save": {"format": "memory", "query_name": "ann_probe_stream",
                "trigger": "available_now", "output_mode": "append"}}""")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ann_probe_stream")
      .select("vid", "ann_score", "ann_match")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(streamed == got, "streamed probe must equal batch")
    // guards: threshold range, output-column collision, absent index
    intercept[IllegalArgumentException](
      Similarity.annProbeIndex(c, "emb", s"$dir/idx", 1.5))
    intercept[IllegalArgumentException](
      Similarity.annProbeIndex(
        c.withColumn("ann_match", lit(true)), "emb", s"$dir/idx", 0.5))
    intercept[Exception](
      Similarity.annProbeIndex(c, "emb", s"$dir/nope", 0.5))
  }

  test("config keys: ann_index histogram + ann_search output; batch-only; guards") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-cfg").toString
    corpus.write.parquet(s"$dir/c")
    corpus.createOrReplaceTempView("ann_corpus")
    val hist = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_index": {"id_col": "vid", "vec_col": "emb",
                     "dir": "$dir/idx", "nlist": 4}}""")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist.values.sum == 60L && hist.keySet.forall(l => l >= 0 && l < 4))
    val got = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"sql": "SELECT vid AS qid, emb FROM ann_corpus WHERE vid <= 3"},
       "ann_search": {"id_col": "qid", "vec_col": "emb",
                      "index_dir": "$dir/idx", "k": 2, "nprobe": 4},
       "order_by": ["qid asc", "rank asc"]}""")
    assert(got.columns.toSeq == Seq("qid", "match_id", "score", "rank"))
    val rows = got.collect()
    assert(rows.length == 6 && rows.forall(_.getInt(3) <= 2))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-matches filtered")
    // streaming compiles reject both keys by name
    Seq(
      s""""ann_index": {"id_col": "vid", "vec_col": "emb", "dir": "$dir/x", "nlist": 2}""",
      s""""ann_search": {"id_col": "vid", "vec_col": "emb", "index_dir": "$dir/idx"}"""
    ).foreach { key =>
      val e = intercept[IllegalArgumentException] {
        graft.compile.Compiler.compileStreamJson(spark, s"""
          {"source": {"path": "$dir/c"}, $key,
           "save": {"format": "memory", "query_name": "ann_x",
                    "output_mode": "append"}}""")
      }
      assert(e.getMessage.contains("batch-only"), e.getMessage)
    }
    // named guards: bad k/nprobe at decode, reserved query id, no index
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark,
      s"""{"source": {"table": "ann_corpus"},
           "ann_search": {"id_col": "vid", "vec_col": "emb",
                          "index_dir": "$dir/idx", "k": 0}}"""))
      .getMessage.contains("k"))
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark,
      s"""{"source": {"table": "ann_corpus"},
           "ann_search": {"id_col": "match_id", "vec_col": "emb",
                          "index_dir": "$dir/idx"}}"""))
      .getMessage.contains("match_id"))
    intercept[Exception] { // absent index dir fails loudly, not empty
      Similarity.annSearchIndex(corpus.select($"vid".as("qid"), $"emb"),
        "qid", "emb", s"$dir/nope", k = 2).collect()
    }
  }

  test("PQ at-rest index: full-probe search == pqTopK bit-for-bit, append uses SAVED codebooks, probe rejects, stats reads it") {
    val c = corpus
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-pq").toString
    Similarity.saveAnnIndex(spark, c, "vid", "emb", s"$dir/idx",
      nlist = 4, pq = Some((4, 16)))
    // the at-rest shape: codes instead of the vector, codebooks next door
    val idx = spark.read.parquet(s"$dir/idx/index")
    assert(idx.columns.toSet == Set("id", "codes", "norm", "list"))
    assert(spark.read.parquet(s"$dir/idx/codebooks").count() == 4L * 16)
    // full probe == brute-force pqTopK with independently re-trained
    // codebooks (pqTrain is deterministic, so they are the saved ones)
    val cbs = Similarity.pqTrain(c, "vid", "emb", dim = 8, m = 4, k = 16)
    val q = c.filter($"vid" <= 6).select($"vid".as("qid"), $"emb")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaIndex = asSet(Similarity.annSearchIndex(
      q, "qid", "emb", s"$dir/idx", k = 3, nprobe = 4))
    val inMemory = asSet(Similarity.pqTopK(
      q, c.select($"vid".as("mid"),
        graft.functions.PqKernels.pqEncode($"emb", cbs).as("codes")),
      "qid", "emb", "mid", "codes", cbs, k = 3))
    assert(viaIndex == inMemory && viaIndex.nonEmpty,
      "PQ artifact search must equal in-memory pqTopK at full probe")
    // append: new rows encode with the SAVED (even-trained) codebooks
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ann-pq2").toString
    val evens = c.filter($"vid" % 2 === 0)
    Similarity.saveAnnIndex(spark, evens, "vid", "emb", s"$dir2/idx",
      nlist = 4, pq = Some((4, 16)))
    Similarity.appendAnnIndex(spark, c.filter($"vid" % 2 === 1),
      "vid", "emb", s"$dir2/idx")
    val cbsEven = Similarity.pqTrain(evens, "vid", "emb", dim = 8, m = 4, k = 16)
    val viaAppended = asSet(Similarity.annSearchIndex(
      q, "qid", "emb", s"$dir2/idx", k = 3, nprobe = 4))
    val refUnion = asSet(Similarity.pqTopK(
      q, c.select($"vid".as("mid"),
        graft.functions.PqKernels.pqEncode($"emb", cbsEven).as("codes")),
      "qid", "emb", "mid", "codes", cbsEven, k = 3))
    assert(viaAppended == refUnion,
      "appended PQ rows must score under the saved codebooks")
    // the probe tier needs exact vectors — PQ indexes reject by name
    assert(intercept[IllegalArgumentException](
      Similarity.annProbeIndex(q, "emb", s"$dir/idx", 0.5))
      .getMessage.contains("PQ"))
    // the health gauge reads the PQ artifact like any other
    val st = Similarity.annIndexStats(spark, s"$dir/idx").collect().head
    assert(st.getInt(0) == 4 && st.getLong(2) == 60L)
    // COMPACT the appended index: file count per list drops to 1,
    // search stays bit-identical
    def filesPerList(d: String): Map[String, Int] =
      new java.io.File(s"$d/index").listFiles().filter(_.isDirectory)
        .map(l => l.getName ->
          l.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(filesPerList(s"$dir2/idx").values.exists(_ > 1),
      "the append must have fragmented at least one list")
    Similarity.compactAnnIndex(spark, s"$dir2/idx")
    assert(filesPerList(s"$dir2/idx").values.forall(_ == 1),
      s"compaction must leave one file per list: ${filesPerList(s"$dir2/idx")}")
    assert(asSet(Similarity.annSearchIndex(
      q, "qid", "emb", s"$dir2/idx", k = 3, nprobe = 4)) == refUnion,
      "search must be bit-identical after compaction")
    // config: mode compact needs only dir; id/vec reject by name
    corpus.createOrReplaceTempView("ann_corpus")
    val hist = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_index": {"dir": "$dir2/idx", "mode": "compact"}}""")
      .agg(org.apache.spark.sql.functions.sum("n_vectors")).collect().head.getLong(0)
    assert(hist == 60L)
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_index": {"dir": "$dir2/idx", "mode": "compact", "id_col": "vid"}}"""))
      .getMessage.contains("id_col"))
  }

  test("ann_index pq config: JSON build + search round trip; pq under append/stats rejects; decode guards") {
    corpus.createOrReplaceTempView("ann_corpus")
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-pqcfg").toString
    val hist = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_index": {"id_col": "vid", "vec_col": "emb", "dir": "$dir/idx",
                     "nlist": 4, "pq": {"m": 4, "k": 16}}}""")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist.values.sum == 60L)
    val got = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"sql": "SELECT vid AS qid, emb FROM ann_corpus WHERE vid <= 3"},
       "ann_search": {"id_col": "qid", "vec_col": "emb",
                      "index_dir": "$dir/idx", "k": 2, "nprobe": 4},
       "order_by": ["qid asc", "rank asc"]}""").collect()
    assert(got.length == 6 && got.forall(_.getInt(3) <= 2))
    Seq(
      s"""{"id_col": "vid", "vec_col": "emb", "dir": "$dir/idx", "mode": "append", "pq": {"m": 4}}""",
      s"""{"dir": "$dir/idx", "mode": "stats", "pq": {"m": 4}}"""
    ).foreach { ai =>
      assert(intercept[IllegalArgumentException](
        graft.compile.Compiler.compileJson(spark,
          s"""{"source": {"table": "ann_corpus"}, "ann_index": $ai}"""))
        .getMessage.contains("pq"))
    }
    assert(intercept[IllegalArgumentException](
      graft.compile.Compiler.compileJson(spark, s"""
        {"source": {"table": "ann_corpus"},
         "ann_index": {"id_col": "vid", "vec_col": "emb",
                       "dir": "$dir/x", "pq": {"m": 4, "k": 300}}}"""))
      .getMessage.contains("k"))
    assert(intercept[IllegalArgumentException](
      graft.compile.Compiler.compileJson(spark, s"""
        {"source": {"table": "ann_corpus"},
         "ann_index": {"id_col": "vid", "vec_col": "emb",
                       "dir": "$dir/x", "pq": {"k": 16}}}"""))
      .getMessage.contains("m"))
  }

  test("filtered ann search: k best from the ALLOWED subset at full probe; guards") {
    val c = corpus
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-allow").toString
    Similarity.saveAnnIndex(spark, c, "vid", "emb", s"$dir/idx", nlist = 4)
    val q = c.filter($"vid" <= 6).select($"vid".as("qid"), $"emb")
    val allow = c.filter($"vid" % 3 === 0).select($"vid".as("id"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = asSet(Similarity.annSearchIndex(
      q, "qid", "emb", s"$dir/idx", k = 3, nprobe = 4,
      allowed = Some(allow)))
    val want = asSet(Similarity.cosineTopK(
      q, c.filter($"vid" % 3 === 0).select($"vid".as("mid"), $"emb"),
      "qid", "emb", "mid", "emb", k = 3))
    assert(got == want && got.nonEmpty,
      "filtered full-probe search must equal brute force over the subset")
    // every returned match is allowed
    assert(got.forall(_._2 % 3 == 0))
    // guards: wrong allow column by name; allow_id_col without allow_ref
    assert(intercept[IllegalArgumentException](
      Similarity.annSearchIndex(q, "qid", "emb", s"$dir/idx", k = 3,
        allowed = Some(allow.toDF("nope")))).getMessage.contains("id"))
    corpus.createOrReplaceTempView("ann_corpus")
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_search": {"id_col": "vid", "vec_col": "emb",
                      "index_dir": "$dir/idx", "allow_id_col": "id"}}"""))
      .getMessage.contains("allow_ref"))
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_search": {"id_col": "vid", "vec_col": "emb",
                      "index_dir": "$dir/idx", "allow_ref": "nodef"}}"""))
      .getMessage.contains("nodef"))
  }

  test("annIndexStats: exact health gauge, nlist=1 degenerate, empty lists counted; stats config guards") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-stats").toString
    corpus.createOrReplaceTempView("ann_corpus")
    // nlist=1: every vector in list 0 — the fully-determined case
    Similarity.saveAnnIndex(spark, corpus, "vid", "emb", s"$dir/one", nlist = 1)
    val one = Similarity.annIndexStats(spark, s"$dir/one").collect().head
    assert(one.getInt(0) == 1 && one.getLong(1) == 0L && one.getLong(2) == 60L &&
      one.getLong(3) == 60L && one.getDouble(4) == 60.0 && one.getDouble(5) == 1.0,
      s"degenerate stats wrong: $one")
    // nlist=16 over 60 vectors: recount against a direct per-list groupBy
    Similarity.saveAnnIndex(spark, corpus, "vid", "emb", s"$dir/m", nlist = 16)
    val counts = spark.read.parquet(s"$dir/m/index")
      .groupBy("list").count().collect().map(_.getLong(1))
    val st = Similarity.annIndexStats(spark, s"$dir/m").collect().head
    assert(st.getInt(0) == 16)
    assert(st.getLong(1) == 16L - counts.length, "empty lists = nlist - present")
    assert(st.getLong(2) == 60L && st.getLong(3) == counts.max)
    assert(math.abs(st.getDouble(4) - 60.0 / 16) < 1e-9)
    assert(math.abs(st.getDouble(5) - counts.max / (60.0 / 16)) < 1e-6)
    // config: mode stats needs only dir; id/vec/nlist rejected by name
    val viaCfg = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_index": {"dir": "$dir/m", "mode": "stats"}}""").collect().head
    assert(viaCfg.toSeq == st.toSeq, "config stats view must equal the API")
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_index": {"dir": "$dir/m", "mode": "stats", "id_col": "vid"}}"""))
      .getMessage.contains("id_col"))
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "ann_corpus"},
       "ann_index": {"dir": "$dir/m", "mode": "stats", "nlist": 4}}"""))
      .getMessage.contains("nlist"))
  }
}
