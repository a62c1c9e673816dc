package graft

import graft.ops.Retrieval
import org.apache.spark.sql.functions._

/** BM25 ranking invariants beyond the q190/q191 oracles. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple apple apple"),
    (3L, "banana banana pear pear pear"),
    (4L, "quantum flux capacitor"), // the only doc with these terms
    (5L, "apple pear")).toDF("id", "txt")

  test("bm25: a query's unique-term doc ranks first; scores positive; topK bounds") {
    val qs = Seq((1L, "quantum capacitor"), (2L, "apple")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext", topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3)))
    val q1 = r.filter(_._1 == 1L)
    assert(q1.length == 1 && q1.head._2 == 4L, "only doc 4 matches the rare query")
    val q2 = r.filter(_._1 == 2L).sortBy(_._4)
    assert(q2.length == 3, "topK bounds each query's results")
    assert(q2.map(_._2).toSet.subsetOf(Set(1L, 2L, 5L)), "only apple docs match")
    assert(r.forall(_._3 > 0), "Lucene idf keeps scores positive")
  }

  test("bm25: higher tf wins within equal length; rarer terms outweigh common") {
    // tf: doc 2 has apple×4; doc 1 has apple×1 — same-ish lengths
    val qs = Seq((1L, "apple")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext", topK = 5)
      .collect().map(x => x.getLong(1) -> x.getInt(3)).toMap
    assert(r(2L) == 1, "the tf-4 doc must rank first for 'apple'")
    // rarity: 'pear' (2 docs) must contribute more than 'apple' (3 docs)
    // for a doc containing both once
    val qs2 = Seq((1L, "pear"), (2L, "apple")).toDF("qid", "qtext")
    val s = Retrieval.bm25TopK(corpus, "id", "txt", qs2, "qid", "qtext", topK = 5)
      .filter(col("id") === 5L)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(s(1L) > s(2L), "rarer term must score higher on the same doc")
  }

  test("bm25: deterministic across runs and repartitioning") {
    val qs = Seq((1L, "apple pear banana")).toDF("qid", "qtext")
    val a = Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext").collect().toSeq
    val b = Retrieval.bm25TopK(corpus.repartition(5), "id", "txt",
      qs, "qid", "qtext").collect().toSeq
    assert(a.toSet == b.toSet)
  }

  test("bm25: plan broadcasts the query terms and plans WindowGroupLimit top-k") {
    val qs = Seq((1L, "apple pear")).toDF("qid", "qtext")
    val plan = Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext", topK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"query terms must broadcast (postings never re-shuffle for the probe):\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k per query must plan WindowGroupLimit, not a full sort:\n$plan")
  }

  test("bm25 prox: verbatim phrase outranks scattered words; 0-weight is unchanged") {
    // same bag of words, opposite adjacency: bag-of-words BM25 cannot
    // reliably split these two; the bigram tier must
    val qs = Seq((1L, "red green blue")).toDF("qid", "qtext")
    val phraseDoc = Seq((10L, "red green blue red green blue"),
      (11L, "red also green then blue maybe green again red blue lots"))
      .toDF("id", "txt")
    val r = Retrieval.bm25TopK(corpus.unionAll(phraseDoc), "id", "txt",
        qs, "qid", "qtext", topK = 3, proxWeight = 2.0)
      .collect().map(x => (x.getLong(1), x.getInt(3)))
    assert(r.find(_._2 == 1).map(_._1).contains(10L),
      s"the verbatim-phrase doc must take rank 1 with prox on, got ${r.toSeq}")
    // prox_weight = 0 must be byte-identical to the plain two-arg path
    val a = Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext")
      .collect().toSeq
    val b = Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext",
      proxWeight = 0.0).collect().toSeq
    assert(a == b)
    // a one-token query has no bigrams: prox must not change the ranking
    val one = Seq((1L, "apple")).toDF("qid", "qtext")
    val c = Retrieval.bm25TopK(corpus, "id", "txt", one, "qid", "qtext")
      .collect().toSeq
    val d = Retrieval.bm25TopK(corpus, "id", "txt", one, "qid", "qtext",
      proxWeight = 3.0).collect().toSeq
    assert(c == d, "no query bigrams -> no bigram contributions")
  }

  test("rrfFuse: hand-computed fusion, overlap boost, tie rule, topK, guards") {
    // query 1: listA ranks docs (10, 20, 30); listB ranks (20, 40).
    // doc 20 appears in both -> 1/61 + 1/62 beats everything.
    val lists = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), // list A
      (1L, 20L, 1), (1L, 40L, 2)                // list B
    ).toDF("q", "d", "r")
    def w(rank: Int): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(1.0 / (60 + rank))
        .setScale(9, java.math.RoundingMode.HALF_UP)
    def score(ranks: Int*): Double =
      ranks.map(w).reduce(_.add(_)).setScale(9, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    val out = graft.ops.Retrieval.rrfFuse(lists, "q", "d", "r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._4)
    assert(out.map(t => (t._2, t._4)).toSeq ==
      Seq((20L, 1), (10L, 2), (40L, 3), (30L, 4)),
      s"fusion order wrong: ${out.toSeq}")
    assert(out.find(_._2 == 20L).get._3 == score(2, 1), "overlap sums both lists")
    assert(out.find(_._2 == 10L).get._3 == score(1))
    // tie rule: equal fused score (same single rank) breaks by doc id —
    // 30 (rank 3 in A only) vs a same-rank doc in B
    val tied = Seq((1L, 5L, 1), (1L, 3L, 1)).toDF("q", "d", "r")
    val t = graft.ops.Retrieval.rrfFuse(tied, "q", "d", "r")
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2)
    assert(t.toSeq == Seq((3L, 1), (5L, 2)), s"tie must break by doc id: ${t.toSeq}")
    // topK truncates per query
    assert(graft.ops.Retrieval.rrfFuse(lists, "q", "d", "r", topK = 2)
      .count() == 2)
    // rrfK shifts every weight: k=0 makes rank-1 weight exactly 1.0
    val k0 = graft.ops.Retrieval.rrfFuse(tied, "q", "d", "r", rrfK = 0)
      .collect().map(_.getDouble(2))
    assert(k0.forall(_ == 1.0), s"rrfK=0 rank-1 weight must be 1.0: ${k0.toSeq}")
    // guards: bad topK/rrfK by name; NULL rank raises at execution
    intercept[IllegalArgumentException](
      graft.ops.Retrieval.rrfFuse(lists, "q", "d", "r", topK = 0))
    intercept[IllegalArgumentException](
      graft.ops.Retrieval.rrfFuse(lists, "q", "d", "r", rrfK = -1))
    val withNull = Seq((1L, Some(10L), Some(1)), (1L, Some(20L), None))
      .toDF("q", "d", "r")
    val e = intercept[Exception](
      graft.ops.Retrieval.rrfFuse(withNull, "q", "d", "r").collect())
    assert(e.getMessage.contains("rank"), e.getMessage)
  }

  test("rrf_fuse config key: combine union of ranked lists fuses identically to the API") {
    val listA = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("q", "d", "r")
    val listB = Seq((1L, 20L, 1), (1L, 40L, 2)).toDF("q", "d", "r")
    listA.createOrReplaceTempView("rrf_list_a")
    listB.createOrReplaceTempView("rrf_list_b")
    val api = graft.ops.Retrieval.rrfFuse(listA.unionByName(listB), "q", "d", "r")
      .orderBy("rn").collect().map(_.toSeq).toSeq
    val cfg = graft.compile.Compiler.compileJson(spark, """
      {"combine": {"op": "union",
         "nodes": [{"id": "a", "source": {"table": "rrf_list_a"}},
                   {"id": "b", "source": {"table": "rrf_list_b"}}]},
       "rrf_fuse": {"query_col": "q", "doc_col": "d", "rank_col": "r"},
       "order_by": ["rn asc"]}""").collect().map(_.toSeq).toSeq
    assert(cfg == api, s"config fusion diverged:\n$cfg\nvs\n$api")
    // batch-only by name on streams
    val inDir = java.nio.file.Files.createTempDirectory("graft_rrf_in").toString
    listA.write.mode("overwrite").parquet(inDir)
    val eS = intercept[IllegalArgumentException](
      graft.compile.Compiler.compileStreamJson(spark, s"""
        {"source": {"path": "$inDir"},
         "rrf_fuse": {"query_col": "q", "doc_col": "d", "rank_col": "r"},
         "save": {"format": "memory", "query_name": "rrf_x"}}"""))
    assert(eS.getMessage.contains("rrf_fuse"), eS.getMessage)
  }

  test("rankingEval: hand-computed metrics incl. zero-hit and beyond-k results; guards") {
    // q1: judged {10,20,30,40}; retrieved 99@1, 20@2, 30@5, 10@7.
    //   At k=5: hits = {20, 30} → 2, first relevant rank 2 → rr 0.5,
    //   recall 2/4, precision 2/5. The rank-7 hit is beyond the cutoff.
    // q2: judged {50}; nothing relevant retrieved → all zeros.
    // q3: retrieved but never judged → NOT evaluated (no row).
    val results = Seq(
      (1L, 99L, 1), (1L, 20L, 2), (1L, 30L, 5), (1L, 10L, 7),
      (2L, 60L, 1), (2L, 61L, 2),
      (3L, 70L, 1)).toDF("q", "d", "r")
    val qrels = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L), (1L, 40L),
      (2L, 50L),
      (1L, 20L) // duplicate judgment — must dedup, not double-count
    ).toDF("q", "d")
    val out = Retrieval.rankingEval(results, "q", "d", "r", qrels, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set(1L, 2L), s"evaluate exactly the judged queries: ${out.keySet}")
    assert(out(1L) == ((4L, 2L, 0.5, 0.5, 0.4)), s"q1 metrics: ${out(1L)}")
    assert(out(2L) == ((1L, 0L, 0.0, 0.0, 0.0)), s"q2 metrics: ${out(2L)}")
    // guards
    intercept[IllegalArgumentException](
      Retrieval.rankingEval(results, "q", "d", "r", qrels, k = 0))
    intercept[IllegalArgumentException](
      Retrieval.rankingEval(results, "q", "d", "r", qrels.toDF("q", "other")))
    val nullRank = Seq((1L, Some(10L), None: Option[Int])).toDF("q", "d", "r")
    val e = intercept[Exception](
      Retrieval.rankingEval(nullRank, "q", "d", "r", qrels).collect())
    assert(e.getMessage.contains("rank"), e.getMessage)
  }

  test("bm25SearchIndex == bm25TopK bit-for-bit (plain and prox); append reflects the union corpus exactly") {
    val qs = Seq((1L, "apple pear"), (2L, "quantum capacitor"), (3L, "banana banana pear"))
      .toDF("qid", "qtext")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    // plain build: search == in-memory over the same corpus
    Retrieval.saveBm25Index(spark, corpus, "id", "txt", s"$dir/plain", buckets = 8)
    assert(asSet(Retrieval.bm25SearchIndex(qs, "qid", "qtext", s"$dir/plain", topK = 3)) ==
      asSet(Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext", topK = 3)))
    // the output id column carries the index's id_col name
    assert(Retrieval.bm25SearchIndex(qs, "qid", "qtext", s"$dir/plain")
      .columns.toSeq == Seq("qid", "id", "score", "rn"))
    // the postings scan must be STATICALLY bucket-pruned (a literal IN
    // on the partition column — DPP does not fire for this join shape)
    val physical = Retrieval.bm25SearchIndex(qs, "qid", "qtext",
      s"$dir/plain", topK = 3).queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      ("""bucket#\d+ IN""".r.findFirstIn(physical).isDefined ||
        physical.contains("INSET")),
      s"postings scan must carry a literal bucket filter:\n$physical")
    // prox build: bigram contributions identical through the artifact
    Retrieval.saveBm25Index(spark, corpus, "id", "txt", s"$dir/prox",
      prox = true, buckets = 8)
    assert(asSet(Retrieval.bm25SearchIndex(qs, "qid", "qtext", s"$dir/prox",
        topK = 3, proxWeight = 0.5)) ==
      asSet(Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext",
        topK = 3, proxWeight = 0.5)))
    // append: build on ids <= 2, append the rest -> search == in-memory
    // over the UNION (df/idf/avgdl all reflect the union; no merge step)
    Retrieval.saveBm25Index(spark, corpus.filter($"id" <= 2), "id", "txt",
      s"$dir/inc", buckets = 8)
    Retrieval.appendBm25Index(spark, corpus.filter($"id" > 2), "id", "txt",
      s"$dir/inc")
    assert(asSet(Retrieval.bm25SearchIndex(qs, "qid", "qtext", s"$dir/inc", topK = 3)) ==
      asSet(Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext", topK = 3)))
    // COMPACT the appended index: postings files per bucket drop to 1,
    // search stays bit-identical
    def filesPerBucket(p: String): Map[String, Int] =
      new java.io.File(p).listFiles().filter(_.isDirectory)
        .map(b => b.getName ->
          b.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(filesPerBucket(s"$dir/inc/postings").values.exists(_ > 1),
      "the append must have fragmented at least one bucket")
    def dlFiles(): Int = new java.io.File(s"$dir/inc/dl")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(dlFiles() > 1, "the append must have fragmented dl")
    Retrieval.compactBm25Index(spark, s"$dir/inc")
    assert(filesPerBucket(s"$dir/inc/postings").values.forall(_ == 1),
      s"compaction must leave one file per bucket")
    // dl is read by EVERY search (doc-length attach) — the compactor
    // must rewrite it too (size-targeted; one file at this scale)
    assert(dlFiles() == 1,
      s"compaction must rewrite dl to size-targeted files, got ${dlFiles()}")
    assert(asSet(Retrieval.bm25SearchIndex(qs, "qid", "qtext", s"$dir/inc", topK = 3)) ==
      asSet(Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext", topK = 3)),
      "search must be bit-identical after compaction")
    // rebuilding prox=false over a prox=true dir drops the stale bigram
    // postings (compaction would otherwise rewrite dead data forever)
    assert(new java.io.File(s"$dir/prox/postings2").exists())
    Retrieval.saveBm25Index(spark, corpus, "id", "txt", s"$dir/prox", buckets = 8)
    assert(!new java.io.File(s"$dir/prox/postings2").exists(),
      "rebuild without prox must delete the stale postings2")
    // guards by name
    assert(intercept[IllegalArgumentException](
      Retrieval.bm25SearchIndex(qs, "qid", "qtext", s"$dir/plain",
        proxWeight = 0.5)).getMessage.contains("prox"))
    assert(intercept[IllegalArgumentException](
      Retrieval.bm25SearchIndex(qs, "qid", "qtext", s"$dir/absent"))
      .getMessage.contains("stats"))
    assert(intercept[IllegalArgumentException](
      Retrieval.saveBm25Index(spark, corpus.filter($"id" > 99), "id", "txt",
        s"$dir/empty")).getMessage.contains("empty"))
    // all-whitespace corpus: zero postings — a fileless dir would fail
    // LATER with an unnamed parquet schema error; reject at build
    val blank = Seq((1L, ""), (2L, "   ")).toDF("id", "txt")
    assert(intercept[IllegalArgumentException](
      Retrieval.saveBm25Index(spark, blank, "id", "txt", s"$dir/blank"))
      .getMessage.contains("ZERO tokens"))
    // query id colliding with the index's stored id_col rejects by name
    assert(intercept[IllegalArgumentException](
      Retrieval.bm25SearchIndex(qs.withColumnRenamed("qid", "id"),
        "id", "qtext", s"$dir/plain")).getMessage.contains("collides"))
  }

  test("bm25_index / bm25_search config keys: twin of the API; append layout params reject; batch-only") {
    val qs = Seq((1L, "apple pear")).toDF("qid", "qtext")
    corpus.createOrReplaceTempView("bm25_corpus")
    qs.createOrReplaceTempView("bm25_qs")
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-cfg").toString
    val hist = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "bm25_corpus"},
       "bm25_index": {"id_col": "id", "text_col": "txt",
                      "dir": "$dir/idx", "buckets": 8}}""")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist.values.sum > 0 && hist.keySet.forall(b => b >= 0 && b < 8))
    val viaCfg = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "bm25_qs"},
       "bm25_search": {"qid_col": "qid", "qtext_col": "qtext",
                       "index_dir": "$dir/idx", "top_k": 3}}""")
      .collect().map(_.toSeq).toSet
    val viaApi = Retrieval.bm25SearchIndex(qs, "qid", "qtext", s"$dir/idx", topK = 3)
      .collect().map(_.toSeq).toSet
    assert(viaCfg == viaApi)
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "bm25_corpus"},
       "bm25_index": {"id_col": "id", "text_col": "txt", "dir": "$dir/idx",
                      "mode": "append", "buckets": 8}}"""))
      .getMessage.contains("buckets"))
    // mode stats: exact recount of the artifact, API == config
    val st = Retrieval.bm25IndexStats(spark, s"$dir/idx").collect().head
    val posted = spark.read.parquet(s"$dir/idx/postings").count()
    assert(st.getAs[Long]("n_docs") == 5L && st.getAs[Int]("buckets") == 8 &&
      !st.getAs[Boolean]("prox") && st.getAs[Long]("n_postings") == posted &&
      st.getAs[Long]("max_bucket_n") >= 1L &&
      math.abs(st.getAs[Double]("mean_bucket_n") - posted / 8.0) < 1e-9,
      s"stats gauge wrong: $st")
    val stCfg = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "bm25_corpus"},
       "bm25_index": {"dir": "$dir/idx", "mode": "stats"}}""").collect().head
    assert(stCfg.toSeq == st.toSeq)
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "bm25_corpus"},
       "bm25_index": {"dir": "$dir/idx", "mode": "stats", "text_col": "txt"}}"""))
      .getMessage.contains("text_col"))
    // mode compact from config: only dir; id/text reject by name
    val hist2 = graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "bm25_corpus"},
       "bm25_index": {"dir": "$dir/idx", "mode": "compact"}}""")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist2.values.sum > 0)
    assert(intercept[IllegalArgumentException](graft.compile.Compiler.compileJson(spark, s"""
      {"source": {"table": "bm25_corpus"},
       "bm25_index": {"dir": "$dir/idx", "mode": "compact", "id_col": "id"}}"""))
      .getMessage.contains("id_col"))
    qs.write.mode("overwrite").parquet(s"$dir/q")
    val e = intercept[IllegalArgumentException] {
      graft.compile.Compiler.compileStreamJson(spark, s"""
        {"source": {"path": "$dir/q"},
         "bm25_search": {"qid_col": "qid", "qtext_col": "qtext",
                         "index_dir": "$dir/idx"},
         "save": {"format": "memory", "query_name": "bm25_x"}}""")
    }
    assert(e.getMessage.contains("batch-only"), e.getMessage)
  }

  test("weighted rrfFuse: hand-computed scores, zero-weight ablation, named guards, config twin") {
    // q1: list A ranks docs (10,20), list B ranks (20,30); wA=1, wB=0.5
    val lists = Seq(
      (1L, 10L, 1, 1.0), (1L, 20L, 2, 1.0),   // list A
      (1L, 20L, 1, 0.5), (1L, 30L, 2, 0.5))   // list B
      .toDF("q", "d", "r", "w")
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Retrieval.rrfFuse(lists, "q", "d", "r", topK = 5,
        weightCol = Some("w"))
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(got(10L) == r9(1.0 / 61))
    assert(got(20L) == r9(r9(1.0 / 62) + r9(0.5 / 61)))
    assert(got(30L) == r9(0.5 / 62))
    // zero-weight list: contributes nothing; its exclusive docs score 0
    val ablated = Retrieval.rrfFuse(
        lists.withColumn("w", when(col("w") === 0.5, lit(0.0)).otherwise(lit(1.0))),
        "q", "d", "r", topK = 5, weightCol = Some("w"))
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(ablated(10L) == r9(1.0 / 61) && ablated(30L) == 0.0)
    // guards: NULL weight raises by name; missing column; negative
    val nullW = Seq((1L, 10L, 1, None: Option[Double])).toDF("q", "d", "r", "w")
    val e = intercept[Exception](
      Retrieval.rrfFuse(nullW, "q", "d", "r", weightCol = Some("w")).collect())
    assert((Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse(""))
      .contains("weight"), e.toString)
    assert(intercept[IllegalArgumentException](
      Retrieval.rrfFuse(lists, "q", "d", "r", weightCol = Some("nope")))
      .getMessage.contains("nope"))
    val negW = Seq((1L, 10L, 1, -1.0)).toDF("q", "d", "r", "w")
    intercept[Exception](
      Retrieval.rrfFuse(negW, "q", "d", "r", weightCol = Some("w")).collect())
    // config twin
    lists.createOrReplaceTempView("wrrf_lists")
    val viaCfg = graft.compile.Compiler.compileJson(spark, """
      {"source": {"table": "wrrf_lists"},
       "rrf_fuse": {"query_col": "q", "doc_col": "d", "rank_col": "r",
                    "weight_col": "w", "top_k": 5}}""")
      .collect().map(_.toSeq).toSet
    assert(viaCfg == Retrieval.rrfFuse(lists, "q", "d", "r", topK = 5,
      weightCol = Some("w")).collect().map(_.toSeq).toSet)
  }

  test("rankingEval: duplicate (query, doc) result rows count as ONE hit (recall <= 1)") {
    // doc 10 retrieved THREE times inside the top k (a concatenated /
    // fused result table); judged set is just {10}. Per-row counting
    // would report hits_at_k = 3 > n_rel = 1 and recall 3.0.
    val results = Seq((1L, 10L, 1), (1L, 10L, 2), (1L, 10L, 4), (1L, 11L, 3))
      .toDF("q", "d", "r")
    val qrels = Seq((1L, 10L)).toDF("q", "d")
    val out = Retrieval.rankingEval(results, "q", "d", "r", qrels, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out(1L) == ((1L, 1L, 1.0, 1.0, 0.2)),
      s"dedup to one hit at min rank 1: ${out(1L)}")
  }

  test("ranking_eval config key: qrels def, same metrics as the API; stream rejection") {
    val results = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("q", "d", "r")
    val qrels = Seq((1L, 20L), (1L, 30L)).toDF("q", "d")
    results.createOrReplaceTempView("re_results")
    qrels.createOrReplaceTempView("re_qrels")
    val api = Retrieval.rankingEval(results, "q", "d", "r", qrels, k = 2)
      .collect().map(_.toSeq).toSeq
    val cfg = graft.compile.Compiler.compileJson(spark, """
      {"defs": [{"id": "judgments", "source": {"table": "re_qrels"}}],
       "source": {"table": "re_results"},
       "ranking_eval": {"query_col": "q", "doc_col": "d", "rank_col": "r",
                        "qrels_ref": "judgments", "k": 2}}""")
      .collect().map(_.toSeq).toSeq
    assert(cfg == api, s"config eval diverged:\n$cfg\nvs\n$api")
    // unknown def rejects by name
    val eRef = intercept[IllegalArgumentException](
      graft.compile.Compiler.compileJson(spark, """
        {"source": {"table": "re_results"},
         "ranking_eval": {"query_col": "q", "doc_col": "d", "rank_col": "r",
                          "qrels_ref": "nope"}}"""))
    assert(eRef.getMessage.contains("qrels_ref"), eRef.getMessage)
  }

  test("bm25: misuse is rejected by name") {
    val qs = Seq((1L, "x")).toDF("qid", "qtext")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext", topK = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "id", "txt", qs, "qid", "qtext", b = 2.0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus.filter(lit(false)), "id", "txt", qs, "qid", "qtext")
    }
  }

  test("foldIncInto self-heals every crash window: roll back under the _folding flag (replay-landed dirs win), roll forward after it") {
    import graft.ops.Artifacts
    val base0 = java.nio.file.Files.createTempDirectory("graft_foldrec").toString
    def writeBatch(inc: String, id: Long, docs: (Long, Long)*): Unit =
      docs.toSeq.toDF("doc", "dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$inc/batch=$id")
    def docsIn(path: String): Set[Long] =
      spark.read.parquet(path).select("doc").collect().map(_.getLong(0)).toSet
    def touch(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true).close()
    }

    // WINDOW 1 (flag present = rewrite never finished → roll BACK):
    // batch=5 was staged aside mid-fold, a partial $base.compact was
    // left behind; batch=0 landed after the crash. The next fold must
    // restore batch=5, drop the stale compact, then fold BOTH batches.
    locally {
      val (b, inc) = (s"$base0/w1b/dl", s"$base0/w1b/dl_inc")
      Seq((1L, 3L), (2L, 4L)).toDF("doc", "dl")
        .coalesce(1).write.mode("overwrite").parquet(b)
      writeBatch(inc, 0, (10L, 2L))
      writeBatch(inc, 5, (15L, 2L))
      val fs = new org.apache.hadoop.fs.Path(b)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inc.old")))
      touch(s"$inc.old/_folding")
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$inc/batch=5"),
        new org.apache.hadoop.fs.Path(s"$inc.old/batch=5")))
      Seq((99L, 9L)).toDF("doc", "dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$b.compact") // stale partial
      Artifacts.foldIncInto(spark, b, inc, None)
      assert(docsIn(b) == Set(1L, 2L, 10L, 15L),
        s"roll-back fold must recover the staged dir, got ${docsIn(b)}")
      assert(!new java.io.File(s"$inc.old").exists &&
        !new java.io.File(s"$b.compact").exists)
    }

    // WINDOW 1b (flag present AND the replay already re-landed the
    // staged batch): the re-landed copy is authoritative — no dup.
    locally {
      val (b, inc) = (s"$base0/w2/dl", s"$base0/w2/dl_inc")
      Seq((1L, 3L)).toDF("doc", "dl")
        .coalesce(1).write.mode("overwrite").parquet(b)
      writeBatch(inc, 5, (15L, 2L)) // the replay's copy
      val fs = new org.apache.hadoop.fs.Path(b)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inc.old")))
      touch(s"$inc.old/_folding")
      Seq((15L, 2L)).toDF("doc", "dl").coalesce(1) // the staged twin
        .write.mode("overwrite").parquet(s"$inc.old/batch=5")
      Artifacts.foldIncInto(spark, b, inc, None)
      val rows = spark.read.parquet(b).collect()
      assert(docsIn(b) == Set(1L, 15L) && rows.length == 2,
        s"replay-landed dir must fold exactly once, got ${rows.toSeq}")
    }

    // WINDOW 2 (flag ABSENT, $base.compact present = rewrite finished,
    // swap didn't → roll FORWARD): the compact already holds the folded
    // rows; recovery must land it and drop inc.old WITHOUT re-folding.
    locally {
      val (b, inc) = (s"$base0/w3/dl", s"$base0/w3/dl_inc")
      Seq((1L, 3L)).toDF("doc", "dl")
        .coalesce(1).write.mode("overwrite").parquet(b)
      val fs = new org.apache.hadoop.fs.Path(b)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inc.old")))
      Seq((15L, 2L)).toDF("doc", "dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$inc.old/batch=5")
      Seq((1L, 3L), (15L, 2L)).toDF("doc", "dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$b.compact") // finished fold
      Artifacts.foldIncInto(spark, b, inc, None)
      assert(docsIn(b) == Set(1L, 15L) &&
        spark.read.parquet(b).count() == 2L,
        "roll-forward must land the finished compact exactly once")
      assert(!new java.io.File(s"$inc.old").exists)
    }

    // WINDOW 3 (flag absent, compact absent = swap finished → drop the
    // leftover inc.old; nothing re-folds)
    locally {
      val (b, inc) = (s"$base0/w4/dl", s"$base0/w4/dl_inc")
      Seq((1L, 3L), (15L, 2L)).toDF("doc", "dl")
        .coalesce(1).write.mode("overwrite").parquet(b) // swap landed
      val fs = new org.apache.hadoop.fs.Path(b)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inc.old")))
      Seq((15L, 2L)).toDF("doc", "dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$inc.old/batch=5")
      Artifacts.foldIncInto(spark, b, inc, None)
      assert(docsIn(b) == Set(1L, 15L) &&
        spark.read.parquet(b).count() == 2L,
        "post-swap leftover must drop without re-folding")
      assert(!new java.io.File(s"$inc.old").exists)
    }
  }

  test("fold lease: a fresh foreign lease rejects by name, a stale one is taken over and released") {
    import graft.ops.Artifacts
    val base0 = java.nio.file.Files.createTempDirectory("graft_lease").toString
    val (b, inc) = (s"$base0/dl", s"$base0/dl_inc")
    Seq((1L, 3L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(b)
    Seq((2L, 4L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(s"$inc/batch=0")
    def writeLease(ts: Long): Unit = {
      val w = new java.io.FileWriter(s"$b.lease")
      try w.write(s"$ts\n") finally w.close()
    }
    // FRESH foreign lease (another process is folding this artifact):
    // the fold must reject by name instead of sabotaging it
    writeLease(System.currentTimeMillis())
    val e = intercept[IllegalArgumentException](
      Artifacts.foldIncInto(spark, b, inc, None))
    assert(e.getMessage.contains("lease"), e.getMessage)
    assert(spark.read.parquet(b).count() == 1L, "rejected fold must not touch the base")
    // STALE lease (a crashed holder's leftover): taken over, fold
    // proceeds, and the lease is released afterwards
    writeLease(0L)
    Artifacts.foldIncInto(spark, b, inc, None)
    assert(spark.read.parquet(b).select("doc").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(!new java.io.File(s"$b.lease").exists, "lease must be released")
    // the heal path is lease-guarded too (it mutates): a fresh foreign
    // lease over a crashed fold rejects by name
    val fs = new org.apache.hadoop.fs.Path(b)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inc.old")))
    writeLease(System.currentTimeMillis())
    val e2 = intercept[IllegalArgumentException](
      Artifacts.healCrashedFold(spark, b, inc))
    assert(e2.getMessage.contains("lease"), e2.getMessage)
    writeLease(0L) // stale → heal proceeds (drops the empty inc.old)
    Artifacts.healCrashedFold(spark, b, inc)
    assert(!new java.io.File(s"$inc.old").exists)
  }

  test("roll-back recovery cross-checks a re-landed staged dir's rows; a foreign mismatch rejects by name") {
    import graft.ops.Artifacts
    val base0 = java.nio.file.Files.createTempDirectory("graft_foldcc").toString
    val (b, inc) = (s"$base0/dl", s"$base0/dl_inc")
    Seq((1L, 3L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(b)
    // live twin holds ONE row; the staged copy holds TWO — not a replay
    // of the same deterministic batch, so recovery must not pick either
    Seq((15L, 2L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(s"$inc/batch=5")
    val fs = new org.apache.hadoop.fs.Path(b)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inc.old")))
    fs.create(new org.apache.hadoop.fs.Path(s"$inc.old/_folding"), true).close()
    Seq((15L, 2L), (16L, 1L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(s"$inc.old/batch=5")
    val e = intercept[IllegalArgumentException](
      Artifacts.foldIncInto(spark, b, inc, None))
    assert(e.getMessage.contains("rows"), e.getMessage)
  }

  test("unscoped fold leaves a mid-write batch dir (only _temporary inside) alone") {
    import graft.ops.Artifacts
    val base0 = java.nio.file.Files.createTempDirectory("graft_foldtmp").toString
    val (b, inc) = (s"$base0/dl", s"$base0/dl_inc")
    Seq((1L, 3L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(b)
    Seq((2L, 4L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(s"$inc/batch=0")
    // batch=1 is mid-write: its dir holds only an in-flight _temporary
    assert(new java.io.File(s"$inc/batch=1/_temporary/0").mkdirs())
    Artifacts.foldIncInto(spark, b, inc, None)
    assert(spark.read.parquet(b).select("doc").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L), "landed batch folds")
    assert(new java.io.File(s"$inc/batch=1/_temporary").exists,
      "the in-flight batch dir must survive the fold untouched")
  }

  test("stray entries in a delta area: strict folds reject by name, in-stream folds skip them") {
    import graft.ops.Artifacts
    val base0 = java.nio.file.Files.createTempDirectory("graft_foldstray").toString
    val (b, inc) = (s"$base0/dl", s"$base0/dl_inc")
    Seq((1L, 3L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(b)
    Seq((2L, 4L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(s"$inc/batch=0")
    val w = new java.io.FileWriter(s"$inc/stray.txt")
    try w.write("not a batch dir") finally w.close()
    val e = intercept[IllegalArgumentException](
      Artifacts.foldIncInto(spark, b, inc, None)) // strict default
    assert(e.getMessage.contains("stray.txt"), e.getMessage)
    Artifacts.foldIncInto(spark, b, inc, None, strict = false)
    assert(spark.read.parquet(b).select("doc").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L), "non-strict fold proceeds")
    assert(new java.io.File(s"$inc/stray.txt").exists, "stray survives")
  }

  test("foldBatchArea: committed batch dirs fold into ONE dir named after the max id; readers and replay exclusion unchanged") {
    import graft.ops.Artifacts
    val area = s"${java.nio.file.Files.createTempDirectory("graft_area").toString}/corpus"
    def writeBatch(id: String, docs: Long*): Unit =
      docs.map(d => (d, s"t$d")).toDF("doc", "txt").coalesce(1)
        .write.mode("overwrite").parquet(s"$area/batch=$id")
    writeBatch("0", 1L); writeBatch("1", 2L, 3L); writeBatch("2", 4L)
    writeBatch("3", 9L) // NOT committed: above the ceiling
    Artifacts.foldBatchArea(spark, area, maxBatchId = Some(2L))
    val dirs = new java.io.File(area).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=2", "batch=3"),
      s"committed dirs fold into batch=2; uncommitted batch=3 survives: $dirs")
    val rows = spark.read.parquet(area)
      .select("doc", "batch").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSet == Set((1L, 2), (2L, 2), (3L, 2), (4L, 2), (9L, 3)),
      s"all rows survive; folded rows carry the folded dir's id: ${rows.toSeq}")
    // folding again with nothing new below the ceiling: no-op under
    // minDirs=2 (the cadence posture) — the single folded dir stays
    Artifacts.foldBatchArea(spark, area, Some(2L), minDirs = 2)
    assert(new java.io.File(s"$area/batch=2").exists)
  }

  test("foldBatchArea: a non-canonical numeric dir (batch=007) rejects by name strict, is skipped non-strict") {
    // r21 (r20 ADVICE): batch=007 passed the all-digits validation but
    // foldedDirName normalizes the max id to batch=7 — the commit phase
    // then failed every cadence with an opaque NoSuchElementException.
    // Non-canonical names are foreign by construction (the ingests
    // always write canonical ids): named reject strict, log-and-skip
    // in-stream.
    import graft.ops.Artifacts
    val area = s"${java.nio.file.Files.createTempDirectory("graft_areaz").toString}/corpus"
    def writeBatch(id: String, docs: Long*): Unit =
      docs.map(d => (d, s"t$d")).toDF("doc", "txt").coalesce(1)
        .write.mode("overwrite").parquet(s"$area/batch=$id")
    writeBatch("0", 1L); writeBatch("1", 2L); writeBatch("007", 9L)
    val e = intercept[IllegalArgumentException](
      Artifacts.foldBatchArea(spark, area, maxBatchId = Some(7L)))
    assert(e.getMessage.contains("007"), e.getMessage)
    // in-stream posture: the stray is skipped, the canonical dirs fold
    Artifacts.foldBatchArea(spark, area, Some(7L), strict = false)
    val dirs = new java.io.File(area).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=007", "batch=1"),
      s"canonical dirs fold into batch=1, the stray survives untouched: $dirs")
    assert(spark.read.parquet(s"$area/batch=1").count() == 2)
  }

  test("fold lease content: timestamp + holder uuid, never observed empty mid-fold") {
    // r21 (r20 ADVICE): the lease used to be created empty and truncated
    // on every heartbeat — a contender reading the empty file parsed
    // ts=0 ("unreadable = stale") and could take over a LIVE fold. The
    // timestamp now lands inside the create-exclusive stream and
    // heartbeats replace the file atomically, so every observation of
    // an existing lease carries "ts uuid".
    import graft.ops.Artifacts
    val base0 = java.nio.file.Files.createTempDirectory("graft_leasec").toString
    val (b, inc) = (s"$base0/dl", s"$base0/dl_inc")
    Seq((1L, 3L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(b)
    (0 until 4).foreach { i =>
      Seq((10L + i, 2L)).toDF("doc", "dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$inc/batch=$i")
    }
    val prior = Artifacts.leaseHeartbeatMs
    Artifacts.leaseHeartbeatMs = 20L
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val watcher = new Thread(() => {
      val f = new java.io.File(s"$b.lease")
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
          !Thread.currentThread().isInterrupted) {
        if (f.exists)
          try seen += scala.io.Source.fromFile(f).mkString
          catch { case _: Exception => () } // mid-rename read: file gone, fine
        Thread.sleep(2)
      }
    })
    watcher.start()
    try Artifacts.foldIncInto(spark, b, inc, None)
    finally {
      watcher.interrupt(); watcher.join(2000)
      Artifacts.leaseHeartbeatMs = prior
    }
    // the one remaining sub-ms empty window is ACQUISITION (create-
    // exclusive, then the ts lands in the same stream) — and a steal in
    // that window is now safe (uuid mismatch aborts the holder by name).
    // Heartbeats must never expose emptiness: with ~100+ samples over
    // the fold, truncating heartbeats (the fixed bug) would show many
    // empty reads; at most the acquisition instant may.
    val nonEmpty = seen.filter(_.trim.nonEmpty)
    assert(nonEmpty.nonEmpty, "watcher must observe lease content")
    assert(seen.count(_.trim.isEmpty) <= 1,
      s"heartbeat rewrites must never truncate the lease " +
        s"(${seen.count(_.trim.isEmpty)} empty observations)")
    nonEmpty.foreach { c =>
      val parts = c.trim.split("\\s+")
      assert(parts.length == 2 && parts(0).forall(_.isDigit),
        s"every observed lease content is 'ts uuid', got '$c'")
    }
  }

  test("foldBatchArea: b-dialect areas (batch=seed + batch=b<id>) fold in their own dialect; mixed dialects reject") {
    import graft.ops.Artifacts
    val base = java.nio.file.Files.createTempDirectory("graft_areab").toString
    val area = s"$base/classes"
    Seq((1L, 10L)).toDF("cluster", "rep").coalesce(1)
      .write.mode("overwrite").parquet(s"$area/batch=seed")
    Seq((2L, 20L)).toDF("cluster", "rep").coalesce(1)
      .write.mode("overwrite").parquet(s"$area/batch=b0")
    Seq((3L, 30L)).toDF("cluster", "rep").coalesce(1)
      .write.mode("overwrite").parquet(s"$area/batch=b1")
    Artifacts.foldBatchArea(spark, area, maxBatchId = Some(1L))
    val dirs = new java.io.File(area).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=b1"),
      s"seed + committed b-dirs fold into the b-dialect max: $dirs")
    assert(spark.read.parquet(area).select("cluster").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // mixed dialects in one area = structural corruption — reject
    val area2 = s"$base/mixed"
    Seq((1L, 1L)).toDF("a", "b").coalesce(1)
      .write.mode("overwrite").parquet(s"$area2/batch=0")
    Seq((2L, 2L)).toDF("a", "b").coalesce(1)
      .write.mode("overwrite").parquet(s"$area2/batch=b1")
    val e = intercept[IllegalArgumentException](
      Artifacts.foldBatchArea(spark, area2))
    assert(e.getMessage.contains("dialect"), e.getMessage)
  }

  test("foldBatchArea self-heals every crash window via the manifest") {
    import graft.ops.Artifacts
    val base = java.nio.file.Files.createTempDirectory("graft_areaheal").toString
    def seed(area: String): Unit = {
      Seq((1L, "a")).toDF("doc", "txt").coalesce(1)
        .write.mode("overwrite").parquet(s"$area/batch=0")
      Seq((2L, "b")).toDF("doc", "txt").coalesce(1)
        .write.mode("overwrite").parquet(s"$area/batch=1")
    }
    def writeManifest(area: String, names: String*): Unit = {
      val w = new java.io.FileWriter(s"$area/_fold_manifest")
      try w.write(names.mkString("", "\n", "\n")) finally w.close()
    }
    def docs(area: String): Set[Long] =
      spark.read.parquet(area).select("doc").collect().map(_.getLong(0)).toSet

    // WINDOW 1: manifest + PARTIAL tmp (no _SUCCESS) → roll back; the
    // sources are all still live, the next fold folds them
    locally {
      val area = s"$base/w1"
      seed(area)
      assert(new java.io.File(s"$area/_fold_tmp").mkdirs())
      writeManifest(area, "batch=0", "batch=1")
      Artifacts.healCrashedAreaFold(spark, area)
      assert(!new java.io.File(s"$area/_fold_tmp").exists &&
        !new java.io.File(s"$area/_fold_manifest").exists)
      assert(docs(area) == Set(1L, 2L), "sources intact after roll-back")
    }

    // WINDOW 2: manifest + COMPLETE tmp, sources still live → roll
    // forward (stage, land the folded dir, clean up); no duplicates
    locally {
      val area = s"$base/w2"
      seed(area)
      Seq((1L, "a"), (2L, "b")).toDF("doc", "txt").coalesce(1)
        .write.mode("overwrite").parquet(s"$area/_fold_tmp") // has _SUCCESS
      writeManifest(area, "batch=0", "batch=1")
      Artifacts.healCrashedAreaFold(spark, area)
      val dirs = new java.io.File(area).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toSeq
      assert(dirs == Seq("batch=1"), s"folded dir landed: $dirs")
      val all = spark.read.parquet(area).select("doc").collect().map(_.getLong(0))
      assert(all.sorted.toSeq == Seq(1L, 2L), s"exactly once: ${all.toSeq}")
    }

    // WINDOW 3: manifest + staged sources + tmp already landed (the
    // rename happened, cleanup didn't) → drop the staged copies
    locally {
      val area = s"$base/w3"
      seed(area)
      val fs = new org.apache.hadoop.fs.Path(area)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$area/_fold_old")))
      // simulate: both sources staged, folded dir landed as batch=1
      fs.rename(new org.apache.hadoop.fs.Path(s"$area/batch=0"),
        new org.apache.hadoop.fs.Path(s"$area/_fold_old/batch=0"))
      fs.rename(new org.apache.hadoop.fs.Path(s"$area/batch=1"),
        new org.apache.hadoop.fs.Path(s"$area/_fold_old/batch=1"))
      Seq((1L, "a"), (2L, "b")).toDF("doc", "txt").coalesce(1)
        .write.mode("overwrite").parquet(s"$area/batch=1")
      writeManifest(area, "batch=0", "batch=1")
      Artifacts.healCrashedAreaFold(spark, area)
      assert(!new java.io.File(s"$area/_fold_old").exists &&
        !new java.io.File(s"$area/_fold_manifest").exists)
      assert(docs(area) == Set(1L, 2L))
      assert(spark.read.parquet(area).count() == 2L, "no duplicates")
    }

    // WINDOW 4: manifest alone (crash before the rewrite started, or
    // after everything else finished) → just drop it
    locally {
      val area = s"$base/w4"
      seed(area)
      writeManifest(area, "batch=0", "batch=1")
      Artifacts.healCrashedAreaFold(spark, area)
      assert(!new java.io.File(s"$area/_fold_manifest").exists)
      assert(docs(area) == Set(1L, 2L))
    }

    // a later fold runs recovery itself: leftover partial state heals
    // at fold entry, then the fold proceeds
    locally {
      val area = s"$base/w5"
      seed(area)
      assert(new java.io.File(s"$area/_fold_tmp").mkdirs())
      writeManifest(area, "batch=0", "batch=1")
      Artifacts.foldBatchArea(spark, area)
      val dirs = new java.io.File(area).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).sorted.toSeq
      assert(dirs == Seq("batch=1") && docs(area) == Set(1L, 2L))
    }

    // WINDOW 5 (the duplication-preferring commit order's new window):
    // the folded dir landed, but a non-max source was not yet retired —
    // its rows are duplicated until heal retires it
    locally {
      val area = s"$base/w6"
      seed(area)
      val fs = new org.apache.hadoop.fs.Path(area)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$area/_fold_old")))
      // original batch=1 staged; folded (union) landed as batch=1;
      // batch=0 still live = transiently duplicated
      fs.rename(new org.apache.hadoop.fs.Path(s"$area/batch=1"),
        new org.apache.hadoop.fs.Path(s"$area/_fold_old/batch=1"))
      Seq((1L, "a"), (2L, "b")).toDF("doc", "txt").coalesce(1)
        .write.mode("overwrite").parquet(s"$area/batch=1")
      writeManifest(area, "batch=0", "batch=1")
      assert(spark.read.parquet(area).count() == 3L,
        "pre-heal readers see the benign duplicate, never a gap")
      Artifacts.healCrashedAreaFold(spark, area)
      assert(docs(area) == Set(1L, 2L) &&
        spark.read.parquet(area).count() == 2L,
        "heal retires the duplicated source exactly once")
      assert(!new java.io.File(s"$area/_fold_old").exists &&
        !new java.io.File(s"$area/_fold_manifest").exists)
    }
  }

  test("foldBatchArea strict mode rejects a non-engine batch dir (batch=12.bak); in-stream skips it") {
    import graft.ops.Artifacts
    val area = s"${java.nio.file.Files.createTempDirectory("graft_areabak").toString}/corpus"
    Seq((1L, "a")).toDF("doc", "txt").coalesce(1)
      .write.mode("overwrite").parquet(s"$area/batch=0")
    Seq((2L, "b")).toDF("doc", "txt").coalesce(1)
      .write.mode("overwrite").parquet(s"$area/batch=1")
    // an operator's manual backup copy must never fold as "always
    // committed" — that would duplicate every row in it
    Seq((1L, "a")).toDF("doc", "txt").coalesce(1)
      .write.mode("overwrite").parquet(s"$area/batch=0.bak")
    val e = intercept[IllegalArgumentException](
      Artifacts.foldBatchArea(spark, area))
    assert(e.getMessage.contains("batch=0.bak"), e.getMessage)
    Artifacts.foldBatchArea(spark, area, strict = false)
    assert(new java.io.File(s"$area/batch=0.bak").exists,
      "the backup survives a non-strict fold untouched")
    val rows = spark.read.parquet(s"$area/batch=1")
      .select("doc").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 2L), "only engine-written dirs folded")
  }

  test("fold lease heartbeat: a held lease's timestamp refreshes during the fold, so a live fold never goes stale") {
    import graft.ops.Artifacts
    val base0 = java.nio.file.Files.createTempDirectory("graft_leasehb").toString
    val (b, inc) = (s"$base0/dl", s"$base0/dl_inc")
    Seq((1L, 3L)).toDF("doc", "dl").coalesce(1)
      .write.mode("overwrite").parquet(b)
    (0 until 4).foreach { i =>
      Seq((10L + i, 2L)).toDF("doc", "dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$inc/batch=$i")
    }
    val prior = Artifacts.leaseHeartbeatMs
    Artifacts.leaseHeartbeatMs = 50L
    val seen = scala.collection.mutable.Set[String]()
    val watcher = new Thread(() => {
      val f = new java.io.File(s"$b.lease")
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
          !Thread.currentThread().isInterrupted) {
        if (f.exists)
          try seen += scala.io.Source.fromFile(f).mkString.trim
          catch { case _: Exception => () }
        Thread.sleep(10)
      }
    })
    watcher.start()
    try Artifacts.foldIncInto(spark, b, inc, None)
    finally {
      watcher.interrupt(); watcher.join(2000)
      Artifacts.leaseHeartbeatMs = prior
    }
    assert(seen.size >= 2,
      s"the heartbeat must refresh the lease timestamp mid-fold " +
        s"(observed ${seen.size} distinct values)")
    assert(!new java.io.File(s"$b.lease").exists, "released after the fold")
  }

  test("foldBatchArea survives upstream schema evolution: a column added mid-stream is preserved, older rows read it as null") {
    import graft.ops.Artifacts
    val area = s"${java.nio.file.Files.createTempDirectory("graft_areaevo").toString}/corpus"
    Seq((1L, "a")).toDF("doc", "txt").coalesce(1)
      .write.mode("overwrite").parquet(s"$area/batch=0")
    // the stream's upstream derive gained a column at batch 1
    Seq((2L, "b", 0.9)).toDF("doc", "txt", "score").coalesce(1)
      .write.mode("overwrite").parquet(s"$area/batch=1")
    Artifacts.foldBatchArea(spark, area)
    val folded = spark.read.option("mergeSchema", "true").parquet(area)
    assert(folded.columns.toSet == Set("doc", "txt", "score", "batch"),
      s"the added column must survive the fold: ${folded.columns.toSeq}")
    val rows = folded.select("doc", "score").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    assert(rows == Set((1L, None), (2L, Some(0.9))),
      s"older rows read the new column as null: $rows")
  }

  test("foldBatchArea fuzzer: random land/fold/ceiling sequences preserve the row multiset exactly") {
    import graft.ops.Artifacts
    val rnd = new scala.util.Random(20260816L)
    (0 until 6).foreach { trial =>
      val area = java.nio.file.Files
        .createTempDirectory(s"graft_areafuzz$trial").toString + "/t"
      var nextDoc = 0L
      var written = Vector.empty[Long]
      var batchId = 0
      val steps = 3 + rnd.nextInt(7)
      (0 until steps).foreach { _ =>
        if (batchId == 0 || rnd.nextInt(3) < 2) {
          // land a batch dir (sometimes all-empty → fileless)
          val rows = (0 until rnd.nextInt(4)).map { _ =>
            nextDoc += 1; nextDoc
          }
          rows.map(d => (d, s"t$d")).toDF("doc", "txt")
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$area/batch=$batchId")
          written ++= rows
          batchId += 1
        } else {
          // fold with a random committed ceiling and cadence posture
          Artifacts.foldBatchArea(spark, area,
            maxBatchId = Some(rnd.nextInt(batchId).toLong),
            strict = rnd.nextBoolean(),
            minDirs = 1 + rnd.nextInt(2))
        }
      }
      // final unscoped fold (quiesced posture), then the law: the area
      // reads back EXACTLY the multiset of rows ever admitted — no fold
      // sequence may duplicate or lose a row
      Artifacts.foldBatchArea(spark, area)
      val got =
        if (written.isEmpty) Seq.empty[Long]
        else spark.read.parquet(area).select("doc")
          .collect().map(_.getLong(0)).toSeq.sorted
      assert(got == written.sorted,
        s"trial $trial: folds must preserve the row multiset " +
          s"(${got.size} vs ${written.size})")
    }
  }

  test("lastCommittedBatch: a dir that is not a streaming checkpoint rejects by name; a pre-commit checkpoint yields None") {
    import graft.ops.Artifacts
    val base0 = java.nio.file.Files.createTempDirectory("graft_ckshape").toString
    // an existing-but-wrong dir (e.g. the index dir itself) must not
    // silently mean "fold nothing forever"
    assert(new java.io.File(s"$base0/index/postings").mkdirs())
    val e = intercept[IllegalArgumentException](
      Artifacts.lastCommittedBatch(spark, s"$base0/index"))
    assert(e.getMessage.contains("checkpoint"), e.getMessage)
    // a real checkpoint that has not committed a batch yet: offsets/
    // exists, commits/ doesn't → None (fold ceiling -1, fold nothing)
    assert(new java.io.File(s"$base0/ck/offsets").mkdirs())
    assert(Artifacts.lastCommittedBatch(spark, s"$base0/ck").isEmpty)
  }
}
