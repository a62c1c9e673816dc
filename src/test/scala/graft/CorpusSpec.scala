package graft

import graft.ops.{Corpus, Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** Invariants for the corpus-shaping operators (chunking, packing,
  * decontamination, repetition metrics, salted join) beyond what the
  * DuckDB oracles pin down. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  // ---- chunking -----------------------------------------------------------

  test("chunking: chunks reconstruct the document exactly (stride tokens each)") {
    val chunked = Corpus.chunkByTokens(docs, "doc_id", "text", 16, 4)
    // taking the first `stride` tokens of every chunk plus the tail of the
    // last chunk reproduces the original token sequence
    val rebuilt = chunked
      .withColumn("toks", split(col("chunk_text"), " "))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("chunk_id"), col("toks")))).as("cs"))
      .select(col("doc_id"),
        flatten(transform(col("cs"), (c, i) =>
          when(i < size(col("cs")) - 1, slice(c.getField("toks"), 1, 12))
            .otherwise(c.getField("toks")))).as("rebuilt"))
    val orig = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("orig"))
    val bad = rebuilt.join(orig, "doc_id")
      .filter(col("rebuilt") =!= col("orig")).count()
    assert(bad == 0, "chunk reconstruction must be lossless")
  }

  test("chunking: consecutive full chunks share exactly `overlap` tokens") {
    val chunked = Corpus.chunkByTokens(docs, "doc_id", "text", 16, 4)
      .withColumn("toks", split(col("chunk_text"), " "))
    val pairs = chunked.alias("a").join(chunked.alias("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.chunk_id") + 1 === col("b.chunk_id"))
      .filter(size(col("a.toks")) === 16) // predecessor is a full chunk
      .select(
        slice(col("a.toks"), 13, 4).as("tailA"),
        slice(col("b.toks"), 1, 4).as("headB"))
    assert(pairs.filter(col("tailA") =!= col("headB")).count() == 0)
  }

  test("chunking: edge cases — empty doc, short doc, exact multiples") {
    val tiny = Seq(
      (1L, ""),                       // empty → no chunks
      (2L, "   "),                    // whitespace-only → no chunks
      (3L, "a b c"),                  // shorter than chunk → 1 chunk
      (4L, (1 to 16).map("t" + _).mkString(" ")), // exactly chunkSize → 1 chunk
      (5L, (1 to 17).map("t" + _).mkString(" "))  // one over → 2 chunks
    ).toDF("doc_id", "text")
    val got = Corpus.chunkByTokens(tiny, "doc_id", "text", 16, 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 4L -> 1L, 5L -> 2L))
    val c5 = Corpus.chunkByTokens(tiny, "doc_id", "text", 16, 4)
      .filter(col("doc_id") === 5 && col("chunk_id") === 1)
      .select("chunk_text").as[String].head()
    assert(c5 == (13 to 17).map("t" + _).mkString(" "),
      "second chunk starts at stride offset 12")
    intercept[IllegalArgumentException] {
      Corpus.chunkByTokens(tiny, "doc_id", "text", 8, 8)
    }
  }

  test("chunkIds: same window rule as the text tier, chunks stay id arrays") {
    // surrogate ids = per-token lengths: the two tiers must agree on chunk
    // boundaries, and each id chunk must be the element-wise length of the
    // matching text chunk
    val withIds = docs.select(col("doc_id"), col("text"),
      transform(TextAnalysis.tokens(col("text")), t => length(t)).as("tids"))
    val byText = Corpus.chunkByTokens(withIds, "doc_id", "text", 16, 4)
      .select(col("doc_id"), col("chunk_id"),
        transform(split(col("chunk_text"), " "), t => length(t)).as("want"),
        col("n_tokens").as("want_n"))
    val byIds = Corpus.chunkIds(withIds, "doc_id", "tids", 16, 4)
    assert(byIds.count() == byText.count())
    val joined = byIds.join(byText, Seq("doc_id", "chunk_id"))
    assert(joined.count() == byIds.count(), "chunk boundaries must match")
    assert(joined.filter(col("chunk_ids") =!= col("want") ||
      col("n_tokens") =!= col("want_n")).count() == 0)
  }

  test("chunking plans are scan-stage: one Generate, zero Exchange") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val withIds = docs.select(col("doc_id"),
      transform(TextAnalysis.tokens(col("text")), t => length(t)).as("tids"))
    Seq(
      Corpus.chunkByTokens(docs, "doc_id", "text", 16, 4),
      Corpus.chunkIds(withIds, "doc_id", "tids", 16, 4)
    ).foreach { chunked =>
      val plan = chunked.queryExecution.executedPlan
      assert(plan.collect { case e: Exchange => e }.isEmpty,
        "chunking must not shuffle")
      val gens = chunked.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
      assert(gens.size == 1, "exactly one generator expected")
    }
  }

  test("chunkIds: edge cases — empty array, short, exact multiple, overlap bound") {
    val tiny = Seq(
      (1L, Seq.empty[Int]),        // empty → no chunks
      (2L, (1 to 3).toSeq),        // shorter than chunk → 1 chunk
      (3L, (1 to 16).toSeq),       // exactly chunkSize → 1 chunk
      (4L, (1 to 17).toSeq)        // one over → 2 chunks
    ).toDF("doc_id", "tids")
    val got = Corpus.chunkIds(tiny, "doc_id", "tids", 16, 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L, 3L -> 1L, 4L -> 2L))
    val c4 = Corpus.chunkIds(tiny, "doc_id", "tids", 16, 4)
      .filter(col("doc_id") === 4 && col("chunk_id") === 1)
      .select("chunk_ids").as[Seq[Int]].head()
    assert(c4 == (13 to 17).toSeq, "second chunk starts at stride offset 12")
    intercept[IllegalArgumentException] {
      Corpus.chunkIds(tiny, "doc_id", "tids", 8, 8)
    }
  }

  test("chunkBySegments: greedy paragraph packing — merge, close, oversized, empties") {
    val tiny = Seq(
      // 3+3+3 token paragraphs at size 7: [p1 p2] then [p3]
      (1L, "a b c\n\nd e f\n\ng h i"),
      // oversized middle paragraph gets its own chunk; neighbors pack
      (2L, "a b\n\n" + (1 to 9).map("t" + _).mkString(" ") + "\n\nc d"),
      // whitespace-only segment drops; survivors re-join with sep
      (3L, "a b\n\n   \n\nc d"),
      // empty doc → no chunks
      (4L, ""),
      // single paragraph under size → one chunk
      (5L, "x y z")
    ).toDF("doc_id", "text")
    val got = Corpus.chunkBySegments(tiny, "doc_id", "text", size = 7)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getInt(3), r.getInt(4))).toMap
    assert(got((1L, 0)) == ("a b c\n\nd e f", 6, 2))
    assert(got((1L, 1)) == ("g h i", 3, 1))
    assert(got((2L, 0)) == ("a b", 2, 1))
    assert(got((2L, 1)) == ((1 to 9).map("t" + _).mkString(" "), 9, 1),
      "an oversized segment forms its own chunk, never splits")
    assert(got((2L, 2)) == ("c d", 2, 1))
    assert(got((3L, 0)) == ("a b\n\nc d", 4, 2),
      "whitespace-only segments drop; survivors re-separate with sep")
    assert(!got.keys.exists(_._1 == 4L), "empty doc emits nothing")
    assert(got((5L, 0)) == ("x y z", 3, 1))
    assert(got.size == 7)
    // custom separator
    val alt = Corpus.chunkBySegments(
      Seq((9L, "a b|c d|e f")).toDF("doc_id", "text"),
      "doc_id", "text", size = 4, sep = "|")
      .collect().map(r => r.getInt(1) -> r.getString(2)).toMap
    assert(alt == Map(0 -> "a b|c d", 1 -> "e f"))
    intercept[IllegalArgumentException] {
      Corpus.chunkBySegments(tiny, "doc_id", "text", size = 0)
    }
  }

  // ---- packing ------------------------------------------------------------

  test("packing: total conservation, bin monotonicity, overflow bound") {
    val withTok = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val packed = Corpus.packSequences(withTok, "doc_id", "n_tok", 256L, 8)
    // every doc assigned exactly once
    assert(packed.count() == withTok.count())
    // per-shard token totals conserved
    val tot = packed.groupBy("shard").agg(sum("n_tok").as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = withTok.withColumn("shard", pmod(col("doc_id"), lit(8)).cast("int"))
      .groupBy("shard").agg(sum("n_tok").as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(tot == want)
    // a doc's start offset lies inside its bin → bin totals can exceed the
    // budget only by the overflow of their LAST doc
    assert(packed.filter(
      col("start_off") < col("bin") * 256L ||
        col("start_off") >= (col("bin") + 1) * 256L).count() == 0)
    // bins within a shard fill in doc_id order (non-decreasing)
    val disorder = packed
      .withColumn("prev_bin", lag("bin", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id")))
      .filter(col("prev_bin") > col("bin")).count()
    assert(disorder == 0)
  }

  // ---- decontamination ----------------------------------------------------

  test("decontamination: a planted eval copy is caught; clean docs survive") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely unrelated text about spark shuffles and partitions here"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bend") // near-copy
    ).toDF("doc_id", "text")
    val holdout = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank")
    ).toDF("doc_id", "text")
    val report = Corpus.contaminationReport(train, holdout, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report(1L) >= 9, "verbatim copy shares all its shingles")
    assert(report(3L) >= 5, "near-copy shares most shingles")
    assert(!report.contains(2L), "unrelated doc has zero 4-gram overlap")
    val clean = Corpus.decontaminate(train, holdout, "doc_id", "text", 4, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("decontamination report matches anti-join arithmetic on the corpus") {
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val ev = docs.filter(col("doc_id") % 10 === 0)
    val contaminated = Corpus.contaminationReport(train, ev, "doc_id", "text", 4)
      .filter(col("n_common") >= 5).count()
    val clean = Corpus.decontaminate(train, ev, "doc_id", "text", 4, 5).count()
    assert(clean == train.count() - contaminated)
  }

  test("bloom decontamination: conservative — never passes what exact drops") {
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val ev = docs.filter(col("doc_id") % 10 === 0)
    val exactClean = Corpus.decontaminate(train, ev, "doc_id", "text", 4, 5)
      .select("doc_id").as[Long].collect().toSet
    val bloomClean = Corpus.decontaminateBloom(train, ev, "doc_id", "text", 4, 5)
      .select("doc_id").as[Long].collect().toSet
    // no false negatives: bloom survivors ⊆ exact survivors
    assert(bloomClean.subsetOf(exactClean),
      s"bloom passed contaminated docs: ${bloomClean -- exactClean}")
    // and false positives are bounded: ≥ 95% of clean docs survive
    assert(bloomClean.size >= (exactClean.size * 95) / 100,
      s"bloom dropped too many clean docs: ${bloomClean.size}/${exactClean.size}")
  }

  // ---- repetition metrics -------------------------------------------------

  test("repetition metrics: hand-computed bigram fractions") {
    val tiny = Seq(
      (1L, "buy now buy now buy now"), // bigrams: bn,nb,bn,nb,bn → top 3/5, dup 5/5
      (2L, "a b c d e f"),             // all distinct → top 1/5, dup 0
      (3L, "")                         // empty → zeros
    ).toDF("doc_id", "text")
    val got = tiny.select(col("doc_id"),
        TextAnalysis.repetitionStats(col("text"), 2).as("r"))
      .select(col("doc_id"), col("r.n_grams"), col("r.top_frac"), col("r.dup_frac"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((5, 0.6, 1.0)))
    assert(got(2L) == ((5, 0.2, 0.0)))
    assert(got(3L) == ((0, 0.0, 0.0)))
  }

  test("line stats: hand-computed dup/bullet/ellipsis fractions") {
    val tiny = Seq(
      // lines (trimmed, non-empty): "- a b", "x", "x", "wait...", "• pt"
      // dup: 2/5; dup chars: 2 of (5+1+1+7+4)=18; bullets: 2/5; ell: 1/5
      (1L, "- a b\n x \nx\nwait...\n• pt"),
      (2L, "only line"), // single line, no dups/markers
      (3L, ""),          // empty → zeros
      (4L, " \n  \n ")   // whitespace-only segments → zeros
    ).toDF("doc_id", "text")
    val got = tiny.select(col("doc_id"), TextAnalysis.lineStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_lines"), col("r.dup_line_frac"),
        col("r.dup_line_char_frac"), col("r.bullet_start_frac"),
        col("r.ellipsis_end_frac"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(1L) == ((5, 0.4, math.rint(2.0 / 18 * 1e9) / 1e9, 0.4, 0.2)))
    assert(got(2L) == ((1, 0.0, 0.0, 0.0, 0.0)))
    assert(got(3L) == ((0, 0.0, 0.0, 0.0, 0.0)))
    assert(got(4L) == ((0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("url host: userinfo/port stripped, lowercased, non-URLs empty") {
    val got = Seq(
      "https://u:p@News.Example.COM:443/a?b#c",
      "HTTP://Blog.Example.ORG/x",
      "ftp://Files.Example.net:2121",
      "http://[::1]:8080/v6",
      "no scheme here",
      "mailto:someone@example.com" // no ://, not an authority URL
    ).zipWithIndex.map(_.swap).toDF("i", "u")
      .select(col("i"), TextAnalysis.urlHost(col("u")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(0) == "news.example.com")
    assert(got(1) == "blog.example.org")
    assert(got(2) == "files.example.net")
    assert(got(3) == "[::1]")
    assert(got(4) == "" && got(5) == "")
  }

  test("gopher quality: hand-computed metrics; each rule flips the verdict") {
    // 60 words, stop words present, all alphabetic → keeps
    val good = (Seq("the", "be", "of", "and") ++
      (0 until 56).map(i => s"word$i")).mkString(" ")
    val tiny = Seq(
      (1L, good),
      (2L, good + " " + Seq.fill(10)("#").mkString(" ")), // symbol+alpha rules
      (3L, (0 until 60).map(i => s"w$i").mkString(" ")),  // no stop words
      (4L, "the be short doc"),                           // under min words
      (5L, "")                                            // empty → zeros
    ).toDF("doc_id", "text")
    val got = tiny.select(col("doc_id"), TextAnalysis.gopherQuality(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_words"), col("g.mean_word_len"),
        col("g.symbol_word_ratio"), col("g.alpha_word_frac"),
        col("g.stop_hits"), col("g.keep"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getInt(5), r.getBoolean(6))))
      .toMap
    assert(got(1L)._1 == 60 && got(1L)._5 == 4 && got(1L)._6)
    assert(got(2L)._3 > 0.1 && got(2L)._4 < 0.9 && !got(2L)._6)
    assert(got(3L)._5 == 0 && !got(3L)._6)
    assert(got(4L)._1 == 4 && !got(4L)._6)
    assert(got(5L) == ((0, 0.0, 0.0, 0.0, 0, false)))
  }

  test("c4 line filter: per-rule line verdicts and the page-level verdict") {
    val tiny = Seq(
      (1L, "Keep this sentence here.\nno punct line at all\nOk two.\nTiny.\n" +
        "Please enable JavaScript now!\nA quoted keeper \"\n \nLast good line?"),
      (2L, "Lorem ipsum dolor sit amet."), // page poisoned (case-insensitive)
      (3L, "Code { inside. This page dies."),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = tiny.select(col("doc_id"),
        TextAnalysis.c4LineFilter(col("text"), 3).as("c"))
      .select(col("doc_id"), col("c.clean_text"), col("c.kept_lines"),
        col("c.dropped_lines"), col("c.keep_doc"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4))))
      .toMap
    // doc 1: keepers = the 4-word opener, the quoted keeper (trailing "),
    // "Last good line?"; dropped = no-punct, "Ok two." (2 words), "Tiny."
    // (1 word), the javascript line, the whitespace segment.
    assert(got(1L)._1 ==
      "Keep this sentence here.\nA quoted keeper \"\nLast good line?")
    assert(got(1L)._2 == 3 && got(1L)._3 == 5 && got(1L)._4)
    assert(got(2L) == (("Lorem ipsum dolor sit amet.", 1, 0, false)))
    assert(got(3L)._4 == false)
    assert(got(4L) == (("", 0, 1, true))) // split("") → one empty segment
  }

  test("upsample: factor-exact copies, zero drops, token conservation, guards") {
    import graft.ops.Corpus
    val df = Seq((1L, 2), (2L, 0), (3L, 1), (4L, 3)).toDF("id", "f")
    val out = Corpus.upsample(df, "f").collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("copy"))))
    assert(out.sorted.toSeq == Seq(
      (1L, 0L), (1L, 1L), (3L, 0L), (4L, 0L), (4L, 1L), (4L, 2L)),
      s"copies wrong: ${out.sorted.toSeq}")
    // output row count == sum of factors, copies are exactly 0..f-1
    assert(Corpus.upsample(df, "f").count() == 6L)
    // schema: input columns + copy, in order
    assert(Corpus.upsample(df, "f").columns.toSeq == Seq("id", "f", "copy"))
    // custom copy col
    assert(Corpus.upsample(df, "f", "epoch").columns.contains("epoch"))
    // plan-time guards: non-integral factor, copy collision
    val frac = Seq((1L, 1.5)).toDF("id", "f")
    assert(intercept[IllegalArgumentException](
      Corpus.upsample(frac, "f")).getMessage.contains("integral"))
    assert(intercept[IllegalArgumentException](
      Corpus.upsample(df.withColumn("copy", lit(1)), "f"))
      .getMessage.contains("already exists"))
    // exec-time guards by name: negative, NULL, absurd factor
    val neg = Seq((1L, -1)).toDF("id", "f")
    assert(intercept[Exception](Corpus.upsample(neg, "f").collect())
      .getMessage.contains("upsample"))
    val nul = Seq((1L, None: Option[Int])).toDF("id", "f")
    assert(intercept[Exception](Corpus.upsample(nul, "f").collect())
      .getMessage.contains("upsample"))
    val huge = Seq((1L, (1 << 20) + 1)).toDF("id", "f")
    assert(intercept[Exception](Corpus.upsample(huge, "f").collect())
      .getMessage.contains("upsample"))
    // scan-stage: no Exchange anywhere in the plan
    val plan = Corpus.upsample(df, "f").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"upsample must not shuffle:\n$plan")
  }

  test("quantileFilter: ~n kept, ties all keep, both directions, guards") {
    import org.apache.spark.sql.functions._
    // distinct scores, exact sketch: kept is n or n+1 (the GK rank
    // convention), and every rank-selected row clears the cut
    val distinctScores = (1L to 60L).map(i => (i, i * 0.37 % 7.0)).toDF("id", "s")
    for (n <- Seq(1L, 10L, 37L)) {
      val kept = Corpus.quantileFilter(distinctScores, "s", n, relativeError = 0.0)
        .collect().map(_.getLong(0)).toSet
      val topN = distinctScores.orderBy(col("s").desc, col("id").asc)
        .limit(n.toInt).collect().map(_.getLong(0)).toSet
      assert(kept.size >= n && kept.size <= n + 1, s"n=$n kept ${kept.size}")
      assert(topN.subsetOf(kept), s"n=$n: rank top-n must clear the cut")
    }
    // tied scores with the target rank mid-run: the whole run keeps
    val tied = (1L to 100L).map(i => (i, (i % 5).toDouble)).toDF("id", "s")
    val keptTied = Corpus.quantileFilter(tied, "s", 30, relativeError = 0.0)
      .collect().map(_.getLong(0)).toSet
    // 20 each of 0..4; keep ~30 best -> values 4 and 3 (rank 30 is 10
    // deep inside the 3-run) = 40 rows
    assert(keptTied == (1L to 100L).filter(i => i % 5 >= 3).toSet)
    // ascending keeps the LOWEST scores (the perplexity direction)
    val keptAsc = Corpus.quantileFilter(tied, "s", 30, descending = false,
        relativeError = 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(keptAsc == (1L to 100L).filter(i => i % 5 <= 1).toSet)
    // n >= N keeps everything
    assert(Corpus.quantileFilter(tied, "s", 1000).count() == 100)
    // the CUT alone is exposed for batch-derive -> stream-apply: on the
    // tied fixture it is provably the rank-30 value, and a plain filter
    // with it reproduces quantileFilter exactly
    val cut = Corpus.quantileCut(tied, "s", 30, relativeError = 0.0)
    assert(cut == 3.0)
    assert(tied.filter(col("s") >= cut).collect().map(_.getLong(0)).toSet
      == keptTied)
    assert(Corpus.quantileCut(tied, "s", 1000) == Double.NegativeInfinity)
    // guards: non-numeric column, NULL score, bad params
    intercept[IllegalArgumentException](
      Corpus.quantileFilter(tied.withColumn("t", lit("x")), "t", 5))
    intercept[IllegalArgumentException](Corpus.quantileFilter(tied, "s", 0))
    intercept[IllegalArgumentException](
      Corpus.quantileFilter(tied, "s", 5, relativeError = 1.0))
    intercept[Exception](Corpus.quantileFilter(
      (1L to 5L).map(i => (i, if (i == 3) null else java.lang.Double.valueOf(i.toDouble)))
        .toDF("id", "s"), "s", 2).collect())
    // the keep itself is one scan-stage predicate — no Exchange
    val plan = Corpus.quantileFilter(tied, "s", 30, relativeError = 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quantile keep must not shuffle (the 100 TB claim):\n$plan")
  }

  test("line dedup: first trimmed occurrence survives verbatim; later copies drop") {
    val tiny = Seq(
      // verbatim dup, indented dup (trimmed match — first copy's spacing
      // survives), a unique line between, a space-only dup pair, and a
      // tab line (SQL trim strips SPACES only — both engines — so the
      // tab form is distinct from the empty form and survives)
      (1L, "Nav menu\nBody text one.\n  Nav menu\nFooter\nFooter\n \n\t\n "),
      (2L, "only line"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = tiny.select(col("doc_id"),
        graft.ops.TextAnalysis.lineDedup(col("text")).as("d"))
      .select(col("doc_id"), col("d.clean_text"), col("d.kept_lines"),
        col("d.dropped_lines"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    // the two space-only lines share the empty trimmed form (first
    // survives verbatim); the tab line is its own form and stays
    assert(got(1L) == (("Nav menu\nBody text one.\nFooter\n \n\t", 5, 3)))
    assert(got(2L) == (("only line", 1, 0)))
    assert(got(3L) == (("", 1, 0))) // split("") → one empty segment, kept
    // scan-stage: no Exchange in the plan
    val plan = tiny.select(graft.ops.TextAnalysis.lineDedup(col("text")).as("d"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
    // registered SQL twin agrees
    Tables.registerViews(spark, sf) // registers the SQL function surface
    tiny.createOrReplaceTempView("ld_tiny")
    val viaSql = spark.sql(
        "SELECT doc_id, line_dedup(text).clean_text AS c FROM ld_tiny")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaSql(1L) == got(1L)._1)
  }

  test("line dedup: brute-force equality, conservation, idempotence on random soups") {
    // space-only trim — the SQL trim rule (Java's String.trim also strips
    // tabs/controls, which would diverge from both engines)
    def sp(s: String) = s.replaceAll("\\A +| +\\z", "")
    def brute(text: String): Seq[String] = {
      val raw = text.split("\n", -1).toSeq
      raw.zipWithIndex.collect { case (l, i)
        if !raw.take(i).map(sp).contains(sp(l)) => l }
    }
    val rng = new scala.util.Random(42)
    val pool = Seq("alpha", "beta", "alpha ", " beta", "c  c", "", " ", "\tgamma", "gamma")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(3 + rng.nextInt(10))(pool(rng.nextInt(pool.size))).mkString("\n"))
    }.toDF("id", "t")
    val out = docs.select(col("id"),
        graft.ops.TextAnalysis.lineDedup(col("t")).as("d"), col("t"))
      .select(col("id"), col("d.clean_text"), col("d.kept_lines"),
        col("d.dropped_lines"), col("t"))
      .collect()
    out.foreach { r =>
      val raw = r.getString(4).split("\n", -1)
      val expect = brute(r.getString(4))
      assert(r.getString(1) == expect.mkString("\n"), s"id=${r.getLong(0)}")
      assert(r.getInt(2) == expect.length && r.getInt(2) + r.getInt(3) == raw.length,
        s"id=${r.getLong(0)}: kept+dropped must conserve lines")
      // idempotence: a deduped document re-dedups to itself
      assert(brute(r.getString(1)) == expect, s"id=${r.getLong(0)}")
    }
  }

  test("global shuffle: deterministic, seed-sensitive, membership/positions exact, ids guarded") {
    val d = Tables.load(spark, sf, "documents").select("doc_id")
    def run(seed: Long) = Corpus.globalShuffle(d, "doc_id", shards = 4, seed = seed)
      .select("doc_id", "shard", "shuffle_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val a = run(7)
    // bit-deterministic across runs
    assert(run(7).sortBy(_._1).toSeq == a.sortBy(_._1).toSeq)
    // membership preserved; shards in range; positions are 1..n per shard
    assert(a.map(_._1).sorted.toSeq ==
      d.collect().map(_.getLong(0)).sorted.toSeq)
    assert(a.forall(t => t._2 >= 0 && t._2 < 4))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a different seed is a different permutation (same membership)
    val b = run(8)
    assert(a.sortBy(_._1).map(t => (t._2, t._3)).toSeq !=
      b.sortBy(_._1).map(t => (t._2, t._3)).toSeq)
    // string ids route through the portable fingerprint and still rank
    val s2 = Corpus.globalShuffle(
      d.select(concat(lit("u-"), col("doc_id")).as("sid")), "sid", 4)
    assert(s2.count() == d.count())
    // guard rails
    intercept[IllegalArgumentException](Corpus.globalShuffle(d, "doc_id", 0))
    intercept[IllegalArgumentException](Corpus.globalShuffle(d, "doc_id", 4, seed = -1))
    intercept[IllegalArgumentException](
      Corpus.globalShuffle(d.select(col("doc_id").cast("double").as("x")), "x", 4))
    intercept[Exception](
      Corpus.globalShuffle(
        spark.range(3).select(when(col("id") === 1, null).otherwise(col("id")).as("nid")),
        "nid", 4).collect())
  }

  test("plan shapes: line heuristics shuffle-free; global shuffle exactly one Exchange") {
    val d = Tables.load(spark, sf, "documents")
    // line_stats / c4_line_filter / repetition metrics are scan-stage
    for (c <- Seq(TextAnalysis.lineStats(col("text")),
        TextAnalysis.c4LineFilter(col("text")),
        TextAnalysis.repetitionStats(col("text"), 2))) {
      val plan = d.select(c.as("r")).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
    }
    // globalShuffle costs exactly the per-shard rank window's shuffle
    val gplan = Corpus.globalShuffle(d.select("doc_id"), "doc_id", 4)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(gplan).size == 1,
      s"global shuffle must plan exactly one Exchange:\n$gplan")
  }

  test("multiclass classifier: planted languages learned exactly, deterministic, tie rule") {
    import graft.ops.Corpus
    // planted per-language marker token on real corpus text: each class
    // is linearly separable by its marker bucket, so OVR training must
    // recover the label for EVERY row
    val base = Tables.load(spark, sf, "documents")
      .withColumn("mtext", concat_ws(" ", col("text"),
        concat(lit("zzmarker"), col("lang"))))
    val models = Corpus.trainMulticlassClassifier(
      base, "doc_id", "mtext", "lang", dim = 1024, epochs = 4)
    assert(models.map(_._1) == models.map(_._1).sorted, "label order sorted")
    val pred = Corpus.predictMulticlass(base, "mtext", models, keepScores = true)
    assert(pred.filter(col("pred_label") =!= col("lang")).count() == 0,
      "every planted language must be recovered")
    // per-class scores present and the winner's score is the max
    val langs = models.map(_._1)
    val maxExpr = langs.map(l => col(s"score_$l")).reduce(greatest(_, _))
    assert(pred.filter(col(s"score_${langs.head}").isNull).count() == 0)
    langs.foreach { l =>
      assert(pred.filter(col("pred_label") === l &&
        col(s"score_$l") =!= maxExpr).count() == 0)
    }
    // bit-deterministic retrain
    val models2 = Corpus.trainMulticlassClassifier(
      base, "doc_id", "mtext", "lang", dim = 1024, epochs = 4)
    models.zip(models2).foreach { case ((l1, m1), (l2, m2)) =>
      assert(l1 == l2 && m1.intercept == m2.intercept &&
        java.util.Arrays.equals(m1.weights, m2.weights))
    }
    // argmax ties break by label order (two identical models)
    import spark.implicits._
    val m0 = models.head._2
    val tied = Corpus.predictMulticlass(
      Seq(Tuple1("some text")).toDF("t"), "t",
      Seq("bbb" -> m0, "aaa" -> m0))
    assert(tied.collect()(0).getString(1) == "bbb",
      "first listed label wins a tied argmax")
    // guard rails
    intercept[IllegalArgumentException](
      Corpus.trainMulticlassClassifier(
        base.filter(col("lang") === "en"), "doc_id", "mtext", "lang"))
    intercept[IllegalArgumentException](
      Corpus.predictMulticlass(base, "mtext", Nil))
  }

  test("multiclass artifacts: save/load round trip; stream prediction equals batch") {
    import graft.ops.Corpus
    import org.apache.spark.sql.streaming.Trigger
    val base = Tables.load(spark, sf, "documents")
      .withColumn("mtext", concat_ws(" ", col("text"),
        concat(lit("zzmarker"), col("lang"))))
    val models = Corpus.trainMulticlassClassifier(
      base, "doc_id", "mtext", "lang", dim = 512, epochs = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-mcc").toString
    Corpus.saveMulticlassClassifier(spark, models, s"$dir/model")
    val loaded = Corpus.loadMulticlassClassifier(spark, s"$dir/model")
    assert(loaded.map(_._1) == models.map(_._1))
    models.zip(loaded).foreach { case ((_, a), (_, b)) =>
      assert(a.intercept == b.intercept && a.dim == b.dim &&
        java.util.Arrays.equals(a.weights, b.weights))
    }
    // stream prediction with the LOADED models equals batch prediction
    val batch = Corpus.predictMulticlass(base, "mtext", loaded)
      .select("doc_id", "pred_label").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    base.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema).parquet(s"$dir/in")
    val q = Corpus.predictMulticlass(streamIn, "mtext", loaded)
      .select("doc_id", "pred_label")
      .writeStream.outputMode("append").format("memory")
      .queryName("mcc_stream").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("mcc_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch, "stream prediction must equal batch")
    // a non-artifact path fails by name
    spark.range(2).selectExpr("'x' as label", "cast(id as int) as bucket",
      "1.0 as weight").write.parquet(s"$dir/notmodel")
    intercept[IllegalArgumentException](
      Corpus.loadMulticlassClassifier(spark, s"$dir/notmodel"))
  }

  // ---- salted join --------------------------------------------------------

  test("salted join: row-identical to the plain join, and small side replicates") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, Seq("l_orderkey")).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Relational.saltedJoin(li, ord, Seq("l_orderkey"), 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(li, ord, Seq("l_orderkey"), 8, how = "right")
    }
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(li, ord, Seq("l_orderkey"), 1)
    }
  }

  test("salted left join keeps unmatched large-side rows exactly once") {
    val large = Seq((1L, "x"), (2L, "y"), (99L, "no-match")).toDF("k", "payload")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "dim")
    val out = Relational.saltedJoin(large, small, Seq("k"), 4, how = "left")
    assert(out.count() == 3)
    assert(out.filter(col("k") === 99 && col("dim").isNull).count() == 1)
  }

  // ---- boilerplate line removal ------------------------------------------

  test("boilerplate lines: hot lines dropped, unique lines kept in order") {
    val planted = Seq(
      (1L, "HEADER\nalpha beta\ngamma delta\nFOOTER"),
      (2L, "HEADER\nepsilon zeta\nFOOTER"),
      (3L, "HEADER\neta theta\nFOOTER"),
      (4L, "HEADER\nFOOTER") // all-boilerplate doc survives, empty
    ).toDF("doc_id", "text")
    val out = Corpus.removeBoilerplateLines(
      planted, "doc_id", "text", maxDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) == (("alpha beta\ngamma delta", 2L, 2L)))
    assert(byId(2L) == (("epsilon zeta", 1L, 2L)))
    assert(byId(4L) == (("", 0L, 2L)))
  }

  test("boilerplate lines: hash path identical to exact-string path") {
    val base = docs.select(col("doc_id"),
      concat_ws("\n", lit("SUB"),
        expr("replace(text, ' the ', '\n')"),
        concat(lit("F "), col("source"))).as("t"))
    val exact = Corpus.removeBoilerplateLines(
      base, "doc_id", "t", maxDocs = 20, byHash = false)
    val hashed = Corpus.removeBoilerplateLines(
      base, "doc_id", "t", maxDocs = 20, byHash = true)
    assert(exact.exceptAll(hashed).isEmpty && hashed.exceptAll(exact).isEmpty)
  }

  test("boilerplate lines: hot set drop scales — hot side plans a broadcast join") {
    val base = docs.select(col("doc_id"),
      concat_ws("\n", lit("SUB"), col("text")).as("t"))
    val plan = Corpus.removeBoilerplateLines(base, "doc_id", "t", maxDocs = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"hot-set join should broadcast:\n$plan")
  }

  // ---- hash split ---------------------------------------------------------

  test("hashSplit: stable under corpus growth, proportions roughly honored") {
    val small = (1L to 2000L).toDF("id")
    val big = (1L to 4000L).toDF("id")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Corpus.hashSplit(small, "id", w).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Corpus.hashSplit(big, "id", w).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // growth stability: every id keeps its bucket when the corpus doubles
    assert(a.forall { case (id, s) => b(id) == s },
      "adding docs must never move an existing doc's split")
    // proportions within a few percent on 4000 ids
    val counts = b.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 4000.0 - 0.8) < 0.03, s"train: $counts")
    assert(math.abs(counts("val") / 4000.0 - 0.1) < 0.03, s"val: $counts")
    // every row lands in exactly one bucket
    assert(counts.values.sum == 4000)
    val err = intercept[IllegalArgumentException](
      Corpus.hashSplit(small, "id", Seq("a" -> 0.5, "b" -> -0.1)))
    assert(err.getMessage.contains("positive"))
  }

  test("hashSplit: string ids hash portably — proportions honored, growth-stable") {
    // the round-7 audit trap: cast("long") on a string id yields NULL and
    // silently dumped 100% of the corpus in the LAST bucket
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val big = (1 to 4000).map(i => s"doc-$i").toDF("id")
    val b = Corpus.hashSplit(big, "id", w).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val counts = b.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 4000.0 - 0.8) < 0.03, s"train: $counts")
    assert(counts.getOrElse("test", 0) < 4000 * 0.2, s"last-bucket dump: $counts")
    assert(counts.values.sum == 4000)
    val small = (1 to 2000).map(i => s"doc-$i").toDF("id")
    val a = Corpus.hashSplit(small, "id", w).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, s) => b(id) == s },
      "string-id buckets must be stable under corpus growth")
  }

  test("hashSplit: NULL id fails loudly; non-hashable id type rejected at plan time") {
    val withNull = Seq(Option(1L), None).toDF("id")
    val e = intercept[Throwable](
      Corpus.hashSplit(withNull, "id", Seq("a" -> 1.0, "b" -> 1.0)).collect())
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("hashSplit"), s"expected a named error, got: $e")
    val dbl = Seq(1.5, 2.5).toDF("id")
    val e2 = intercept[IllegalArgumentException](
      Corpus.hashSplit(dbl, "id", Seq("a" -> 1.0, "b" -> 1.0)))
    assert(e2.getMessage.contains("hashSplit"))
  }

  // ---- temperature resampling ---------------------------------------------

  test("temperatureSample: alpha=1 proportional; alpha<1 raises tail rates") {
    val df = ((1L to 3000L).map(i => (i, "en")) ++
      (3001L to 3600L).map(i => (i, "de")) ++
      (3601L to 3750L).map(i => (i, "rw"))).toDF("id", "g")
    def byGroup(alpha: Double): Map[String, Long] =
      Corpus.temperatureSample(df, "g", "id", 0.4, alpha)
        .groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val prop = byGroup(1.0)
    // alpha=1: every group sampled at ~the target fraction
    assert(math.abs(prop("en") / 3000.0 - 0.4) < 0.05, s"en: $prop")
    assert(math.abs(prop("de") / 600.0 - 0.4) < 0.07, s"de: $prop")
    val flat = byGroup(0.5)
    // alpha<1: realized rate strictly decreasing in group size, and the
    // tail group gains over its proportional share
    assert(flat("rw").toDouble / 150 > flat("en").toDouble / 3000, s"$flat")
    assert(flat("rw") > prop("rw"), s"flat=$flat prop=$prop")
  }

  test("temperatureSample: smaller fractions nest inside larger (same alpha)") {
    val df = ((1L to 2000L).map(i => (i, "a")) ++
      (2001L to 2400L).map(i => (i, "b"))).toDF("id", "g")
    def keep(frac: Double): Set[Long] =
      Corpus.temperatureSample(df, "g", "id", frac)
        .select("id").collect().map(_.getLong(0)).toSet
    val s20 = keep(0.2)
    val s40 = keep(0.4)
    assert(s20.nonEmpty && s40.size > s20.size)
    assert(s20.subsetOf(s40),
      "the scaling-law-subset property: 20% must nest inside 40%")
  }

  test("temperatureSample: a group whose quota exceeds its size is kept whole") {
    val df = ((1L to 5000L).map(i => (i, "big")) ++
      (5001L to 5005L).map(i => (i, "tiny"))).toDF("id", "g")
    val kept = Corpus.temperatureSample(df, "g", "id", 0.5, alpha = 0.2)
      .filter(col("g") === "tiny").count()
    assert(kept == 5, "rate caps at 1.0 — no oversampling past the population")
  }

  test("temperatureSample: integral groups and string ids; sampling hash " +
    "decorrelated from the split hash") {
    val intG = (1L to 2000L).map(i => (i, i % 4)).toDF("id", "g")
    val n = Corpus.temperatureSample(intG, "g", "id", 0.5, alpha = 1.0).count()
    assert(math.abs(n / 2000.0 - 0.5) < 0.05, s"integral groups: kept $n")
    val strIds = (1 to 2000).map(i => (s"doc-$i", "x")).toDF("id", "g")
    val m = Corpus.temperatureSample(strIds, "g", "id", 0.5, alpha = 1.0).count()
    assert(math.abs(m / 2000.0 - 0.5) < 0.05, s"string ids: kept $m")
    // composition: a 50% sample then a 50/50 split must not send every
    // sampled row to one bucket (the shared-hash correlation failure)
    val sampled = Corpus.temperatureSample(intG, "g", "id", 0.5, alpha = 1.0)
    val split = Corpus.hashSplit(sampled, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.getOrElse("a", 0L) > 0 && split.getOrElse("b", 0L) > 0,
      s"sample∘split collapsed to one bucket: $split")
    assert(math.abs(split("a").toDouble / (split("a") + split("b")) - 0.5) < 0.1,
      s"sample∘split skewed: $split")
  }

  test("temperatureSample: named errors — NULL group, bad params, bad types") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "g")
    val withNull = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "g")
    val e = intercept[IllegalArgumentException](
      Corpus.temperatureSample(withNull, "g", "id", 0.5))
    assert(e.getMessage.contains("NULL group"))
    val e2 = intercept[IllegalArgumentException](
      Corpus.temperatureSample(df, "g", "id", 0.0))
    assert(e2.getMessage.contains("target_fraction"))
    val e3 = intercept[IllegalArgumentException](
      Corpus.temperatureSample(df, "g", "id", 0.5, alpha = 1.5))
    assert(e3.getMessage.contains("alpha"))
    val dblGroup = Seq((1L, 0.5)).toDF("id", "g")
    val e4 = intercept[IllegalArgumentException](
      Corpus.temperatureSample(dblGroup, "g", "id", 0.5))
    assert(e4.getMessage.contains("group column"))
    val dblId = Seq((0.5, "a")).toDF("id", "g")
    val e5 = intercept[IllegalArgumentException](
      Corpus.temperatureSample(dblId, "g", "id", 0.5))
    assert(e5.getMessage.contains("temperatureSample"))
  }

  // ---- token-budget mixture sampling --------------------------------------

  /** Brute-force mirror of the budget-prefix contract: per group, order
    * by (budget hash, id), keep while the exclusive cumsum passes the
    * policy — what the bucketed Spark plan must equal exactly. */
  private def budgetBrute(
      rows: Seq[(Long, String, Long)], // (id, group, tokens)
      budgets: Map[String, Long],
      overshoot: Boolean): Set[Long] = {
    def h(id: Long) = ((id % 1000000L) * 1103515245L) % 1000000L
    rows.groupBy(_._2).flatMap { case (g, docs) =>
      budgets.get(g).toSeq.flatMap { budget =>
        var c = 0L
        docs.sortBy(d => (h(d._1), d._1)).flatMap { case (id, _, t) =>
          val keep = if (overshoot) c < budget else c + t <= budget
          c += t
          if (keep) Some(id) else None
        }
      }
    }.toSet
  }

  test("tokenBudgetSample: equals the brute-force budget prefix on random data") {
    val rnd = new scala.util.Random(11)
    val groups = Seq("web", "code", "math")
    val rows = (1L to 600L).map(i =>
      (i, groups(rnd.nextInt(3)), rnd.nextInt(200) + 1L))
    val df = rows.toDF("id", "g", "t").repartition(7)
    val budgets = Seq("web" -> 9000L, "code" -> 4000L, "math" -> 999999L)
    for (overshoot <- Seq(true, false)) {
      val got = Corpus.tokenBudgetSample(df, "g", "id", "t", budgets, overshoot)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == budgetBrute(rows, budgets.toMap, overshoot),
        s"overshoot=$overshoot must match the window contract exactly")
    }
  }

  test("tokenBudgetSample: overshoot fills the budget; strict never exceeds") {
    val rows = (1L to 80L).map(i => (i, "g", 100L))
    val df = rows.toDF("id", "g", "t")
    // budget 1050 — not a multiple of the doc size, so the policies differ
    val filled = Corpus.tokenBudgetSample(df, "g", "id", "t", Seq("g" -> 1050L))
      .agg(sum("t")).head.getLong(0)
    assert(filled == 1100L, "overshoot keeps the boundary-crossing doc")
    val strict = Corpus.tokenBudgetSample(df, "g", "id", "t",
      Seq("g" -> 1050L), overshoot = false).agg(sum("t")).head.getLong(0)
    assert(strict == 1000L, "strict stays at the longest prefix <= budget")
    // a budget above the group total keeps the whole group either way
    val all = Corpus.tokenBudgetSample(df, "g", "id", "t", Seq("g" -> 99999L))
    assert(all.count() == 80L)
  }

  test("tokenBudgetSample: unlisted groups drop; budget 0 drops; weights derive") {
    val df = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L))
      .toDF("id", "g", "t")
    val kept = Corpus.tokenBudgetSample(df, "g", "id", "t",
      Seq("a" -> 100L, "b" -> 0L)).select("g").collect().map(_.getString(0))
    assert(kept.toSeq == Seq("a"), "unlisted 'c' and zero-budget 'b' drop")
    val w = Corpus.budgetsFromWeights(
      Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), 4096L)
    assert(w == Seq("a" -> 2048L, "b" -> 1024L, "c" -> 1024L))
    intercept[IllegalArgumentException](
      Corpus.budgetsFromWeights(Seq("a" -> 0.0), 100L))
    intercept[IllegalArgumentException](
      Corpus.budgetsFromWeights(Seq("a" -> 1.0), 0L))
  }

  test("tokenBudgetSample: order_col selects the TOP-scoring prefix per group") {
    val rnd = new scala.util.Random(23)
    val rows = (1L to 500L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", rnd.nextInt(100) + 1L,
        rnd.nextInt(1000) / 10.0))
    val df = rows.toDF("id", "g", "t", "score").repartition(5)
    val budgets = Seq("a" -> 4000L, "b" -> 2500L)
    for (desc <- Seq(true, false)) {
      val got = Corpus.tokenBudgetSample(df, "g", "id", "t", budgets,
          orderCol = Some("score"), descending = desc)
        .select("id").collect().map(_.getLong(0)).toSet
      // brute-force: per group, sort by (score desc|asc, id), exclusive
      // cumsum < budget
      val want = rows.groupBy(_._2).flatMap { case (g, docs) =>
        val budget = budgets.toMap.apply(g)
        var c = 0L
        val sorted = if (desc) docs.sortBy(d => (-d._4, d._1))
                     else docs.sortBy(d => (d._4, d._1))
        sorted.flatMap { case (id, _, t, _) =>
          val keep = c < budget; c += t; if (keep) Some(id) else None
        }
      }.toSet
      assert(got == want, s"descending=$desc must be the exact score prefix")
    }
    // ties on score resolve by id: all-equal scores degrade to one
    // bucket and still select the id-ascending prefix exactly
    val tied = (1L to 50L).map(i => (i, "g", 10L, 1.0)).toDF("id", "g", "t", "score")
    val keptTied = Corpus.tokenBudgetSample(tied, "g", "id", "t",
        Seq("g" -> 95L), orderCol = Some("score"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptTied == (1L to 10L).toSet)
    // NULL / NaN scores fail loudly; non-numeric order column rejected
    val withNaN = Seq((1L, "g", 10L, Double.NaN)).toDF("id", "g", "t", "score")
    val e = intercept[Exception](Corpus.tokenBudgetSample(withNaN, "g",
      "id", "t", Seq("g" -> 5L), orderCol = Some("score")).count())
    assert(e.getMessage.contains("NaN"))
    val strScore = Seq((1L, "g", 10L, "hi")).toDF("id", "g", "t", "score")
    val e2 = intercept[IllegalArgumentException](Corpus.tokenBudgetSample(
      strScore, "g", "id", "t", Seq("g" -> 5L), orderCol = Some("score")))
    assert(e2.getMessage.contains("order column"))
  }

  test("tokenBudgetSample: integral group keys match their decimal spelling") {
    val df = Seq((1L, 7, 10L), (2L, 7, 10L), (3L, 8, 10L)).toDF("id", "g", "t")
    val kept = Corpus.tokenBudgetSample(df, "g", "id", "t", Seq("7" -> 15L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.size == 2 && !kept.contains(3L),
      "group 7 fills to >= 15 tokens (2 docs); group 8 is unlisted")
  }

  test("tokenBudgetSample: named errors — NULL group, bad tokens, bad types") {
    val df = Seq((1L, "a", 10L)).toDF("id", "g", "t")
    val withNull = Seq((1L, null.asInstanceOf[String], 10L)).toDF("id", "g", "t")
    val e = intercept[IllegalArgumentException](
      Corpus.tokenBudgetSample(withNull, "g", "id", "t", Seq("a" -> 1L)))
    assert(e.getMessage.contains("NULL group"))
    val zeroTok = Seq((1L, "a", 0L)).toDF("id", "g", "t")
    val e2 = intercept[Exception](
      Corpus.tokenBudgetSample(zeroTok, "g", "id", "t", Seq("a" -> 1L)).count())
    assert(e2.getMessage.contains("non-positive token count"))
    val dblTok = Seq((1L, "a", 0.5)).toDF("id", "g", "t")
    val e3 = intercept[IllegalArgumentException](
      Corpus.tokenBudgetSample(dblTok, "g", "id", "t", Seq("a" -> 1L)))
    assert(e3.getMessage.contains("token column"))
    intercept[IllegalArgumentException](
      Corpus.tokenBudgetSample(df, "g", "id", "t", Seq.empty))
    intercept[IllegalArgumentException](
      Corpus.tokenBudgetSample(df, "g", "id", "t", Seq("a" -> -1L)))
    intercept[IllegalArgumentException](
      Corpus.tokenBudgetSample(df, "g", "id", "t", Seq("a" -> 1L, "a" -> 2L)))
  }

  // ---- LM perplexity ------------------------------------------------------

  test("lmPerplexity: predictable text scores lower than unique text; short docs absent") {
    // 10 identical docs (every bigram seen 10×) vs one doc of one-off words
    val rows = (1L to 10L).map(i => (i, "the cat sat on the mat again today")) ++
      Seq((11L, "zebra quartz violin nebula harpoon tundra obelisk fjord")) ++
      Seq((12L, "single"), (13L, ""))
    val scored = Corpus.lmPerplexity(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!scored.contains(12L) && !scored.contains(13L),
      "docs with < 2 tokens have no bigrams and are absent")
    assert(scored(1L)._1 == 7, "n_bigrams = tokens - 1")
    assert(scored(1L)._2 < scored(11L)._2,
      s"repeated text must be more predictable: ${scored(1L)} vs ${scored(11L)}")
    // identical docs score identically (the model is corpus-global)
    assert(scored(1L) == scored(10L))

    // keepUnscored=true: the short docs come back with 0 bigrams and NULL
    // nll instead of vanishing, and every scored doc keeps its exact score
    val kept = Corpus.lmPerplexity(rows.toDF("doc_id", "text"), "doc_id", "text",
        keepUnscored = true)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(kept.keySet == (1L to 13L).toSet, s"all ids present: ${kept.keySet}")
    assert(kept(12L) == (0L, None) && kept(13L) == (0L, None))
    assert(kept(1L) == (scored(1L)._1, Some(scored(1L)._2)),
      "scored docs must be unchanged by the keep policy")
  }

  // ---- trainable quality classifier --------------------------------------

  test("classifier: planted marker separates, loss decreases, training is deterministic") {
    import spark.implicits._
    // real corpus text, labels planted by a marker token in even-id docs —
    // the q155 fixture shape
    val base = Tables.load(spark, sf, "documents").limit(200)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(" zqxmarker")))
          .otherwise(col("text")).as("txt"),
        when(col("doc_id") % 2 === 0, 1.0).otherwise(0.0).as("label"))
      .cache()
    val m1 = Corpus.trainTextClassifier(base, "doc_id", "txt", "label",
      dim = 512, epochs = 6)
    // per-epoch mean log-loss strictly decreases on a separable fixture
    assert(m1.losses.sliding(2).forall { case Seq(a, b) => b < a },
      s"loss trace must decrease: ${m1.losses}")
    // every planted doc scores above every clean doc
    val scored = base.select(col("doc_id"), col("label"),
        graft.functions.ClassifierKernels
          .textScore(col("txt"), m1.weights, m1.intercept).as("s"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val minPos = scored.filter(_._1 == 1.0).map(_._2).min
    val maxNeg = scored.filter(_._1 == 0.0).map(_._2).max
    assert(minPos > maxNeg, s"separation: minPos=$minPos maxNeg=$maxNeg")
    // bit-identical retrain: decimal-exact aggregates + fixed schedule
    val m2 = Corpus.trainTextClassifier(base, "doc_id", "txt", "label",
      dim = 512, epochs = 6)
    assert(m1.intercept == m2.intercept &&
      m1.weights.toSeq == m2.weights.toSeq && m1.losses == m2.losses,
      "training must be run-to-run deterministic")
    base.unpersist()
  }

  test("classifier: NULL labels are excluded from training but still scored") {
    import spark.implicits._
    val rows = Seq(
      (1L, "good text alpha", Some(1.0)), (2L, "bad text beta", Some(0.0)),
      (3L, "good text alpha", Some(1.0)), (4L, "bad text beta", Some(0.0)),
      (5L, "good text alpha", None)).toDF("id", "txt", "label")
    val out = Corpus.qualityClassifier(rows, "id", "txt", "label",
      dim = 64, epochs = 8).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), "unlabeled rows still score")
    assert(out(5L) == out(1L), "identical text scores identically")
    assert(out(1L) > out(2L), "positive-labeled text outranks negative")
  }

  test("classifier: hashed buckets are portable-hash mod dim, in document order") {
    import spark.implicits._
    val bs = Seq(("a bb a", 0)).toDF("t", "x")
      .select(graft.functions.ClassifierKernels
        .hashedTokenBuckets(col("t"), 97).as("b"))
      .head.getSeq[Int](0)
    val M = 1000000007L
    def h(tok: String): Int =
      (tok.foldLeft(7L)((a, c) => (a * 131 + c) % M) % 97).toInt
    assert(bs == Seq(h("a"), h("bb"), h("a")), "order + repeats preserved")
    // empty and null propagate the kernel contract
    val empty = Seq(("   ", 0)).toDF("t", "x")
      .select(graft.functions.ClassifierKernels
        .hashedTokenBuckets(col("t"), 97).as("b")).head.getSeq[Int](0)
    assert(empty.isEmpty)
  }

  test("classifier model artifact: save/load round-trips; stream scoring equals batch; scan-stage plan") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft-cls-art").toString
    val train = Seq(
      (1L, "good alpha words", 1.0), (2L, "bad beta words", 0.0),
      (3L, "good alpha again", 1.0), (4L, "bad beta again", 0.0))
      .toDF("id", "txt", "label")
    val m = Corpus.trainTextClassifier(train, "id", "txt", "label",
      dim = 128, epochs = 3)
    Corpus.saveTextClassifier(spark, m, s"$base/model")
    val m2 = Corpus.loadTextClassifier(spark, s"$base/model")
    assert(m2.dim == m.dim && m2.intercept == m.intercept &&
      m2.weights.toSeq == m.weights.toSeq, "round trip must be exact")
    // batch-trained model scores a STREAM: stateless scan-stage kernel
    train.write.parquet(s"$base/in")
    val raw = spark.read.parquet(s"$base/in")
    val scoredStream = spark.readStream.schema(raw.schema).parquet(s"$base/in")
      .select(col("id"),
        graft.functions.ClassifierKernels
          .textScore(col("txt"), m2.weights, m2.intercept).as("s"))
    val q = scoredStream.writeStream.format("memory").queryName("cls_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cls_stream")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = raw.select(col("id"),
        graft.functions.ClassifierKernels
          .textScore(col("txt"), m.weights, m.intercept).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch, "stream scoring must equal batch scoring")
    // inference is one codegen span over the scan: no exchange anywhere
    val plan = raw.select(graft.functions.ClassifierKernels
        .textScore(col("txt"), m.weights, m.intercept))
      .queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"),
      s"inference must not shuffle:\n$plan")
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      "inference must run inside whole-stage codegen")
    // a non-artifact path fails by name
    spark.range(1).select(col("id").cast("int").as("bucket"),
      lit(1.0).as("weight")).write.parquet(s"$base/notmodel")
    val e = intercept[IllegalArgumentException] {
      Corpus.loadTextClassifier(spark, s"$base/notmodel")
    }
    assert(e.getMessage.contains("dim"), e.getMessage)
  }

  test("classifier: misuse is rejected by name") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.0)).toDF("id", "txt", "label")
    intercept[IllegalArgumentException] {
      Corpus.trainTextClassifier(df, "id", "txt", "label", dim = 0)
    }
    intercept[IllegalArgumentException] {
      Corpus.trainTextClassifier(df, "id", "txt", "label", epochs = 0)
    }
    intercept[IllegalArgumentException] {
      Corpus.trainTextClassifier(
        df.filter(col("id") < 0), "id", "txt", "label")
    }
  }

  test("lmPerplexity KN: hand-computed interpolated Kneser-Ney on a tiny corpus") {
    // corpus = one doc "a b a c a b": bigrams ab ba ac ca ab
    // c12: ab=2 ba=1 ac=1 ca=1; c1: a=3 b=1 c=1; types T=4
    // N1+(a·)=2 N1+(b·)=1 N1+(c·)=1; N1+(·b)=1 N1+(·a)=2 N1+(·c)=1
    val d = Seq((1L, "a b a c a b")).toDF("id", "txt")
    val got = Corpus.lmPerplexity(d, "id", "txt", smoothing = "kn")
      .head()
    def lp(c12: Long, c1: Long, n1l: Long, n1r: Long): Double =
      BigDecimal(math.log((math.max(c12 - 0.75, 0.0) + 0.75 * n1l * (n1r / 4.0)) / c1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lps = Seq(
      lp(2, 3, 2, 1), // ab
      lp(1, 1, 1, 2), // ba
      lp(1, 3, 2, 1), // ac
      lp(1, 1, 1, 2), // ca
      lp(2, 3, 2, 1)) // ab
    val want = BigDecimal(-(lps.map(BigDecimal(_)).sum / 5).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Long]("n_bigrams") == 5L)
    assert(got.getAs[Double]("nll") == want,
      s"KN nll must match the hand computation (${got.getAs[Double]("nll")} vs $want)")
    // and KN differs from add-k on the same corpus (different model family)
    val addk = Corpus.lmPerplexity(d, "id", "txt").head().getAs[Double]("nll")
    assert(addk != got.getAs[Double]("nll"))
    intercept[IllegalArgumentException] {
      Corpus.lmPerplexity(d, "id", "txt", smoothing = "laplace")
    }
    intercept[IllegalArgumentException] {
      Corpus.lmPerplexity(d, "id", "txt", smoothing = "kn", discount = 1.5)
    }
  }

  // ---- DSIR importance resampling ----------------------------------------

  private def dsirFixture = {
    // raw = a mixture of "science" docs (target-like) and "spam" docs;
    // target = pure science exemplars with disjoint ids
    val sci = (1L to 30L).map(i =>
      (i, s"quantum field theory lecture $i covers gauge symmetry"))
    val spam = (31L to 60L).map(i =>
      (i, s"buy cheap pills now discount offer $i click here"))
    val raw = (sci ++ spam).toDF("id", "txt")
    val target = (101L to 120L).map(i =>
      (i, s"gauge symmetry in quantum field theory seminar $i")).toDF("id", "txt")
    (raw, target)
  }

  test("dsir: target-like docs outweigh off-target docs, fit is deterministic") {
    val (raw, target) = dsirFixture
    val m1 = Corpus.dsirFit(raw, target, "txt", buckets = 256)
    val m2 = Corpus.dsirFit(raw, target, "txt", buckets = 256)
    assert(m1.logRatios.sameElements(m2.logRatios), "fit must be bit-identical")
    val w = Corpus.dsirScore(raw, "txt", m1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("dsir_logw")).toMap
    val sciMin = (1L to 30L).map(w).min
    val spamMax = (31L to 60L).map(w).max
    assert(sciMin > spamMax,
      s"every science doc must outweigh every spam doc (sci min $sciMin, spam max $spamMax)")
  }

  test("dsir: empty/token-free docs score 0 with 0 features; n_feats = 2n-1") {
    val (raw, target) = dsirFixture
    val m = Corpus.dsirFit(raw, target, "txt", buckets = 64)
    val edge = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "one two")).toDF("id", "txt")
    val got = Corpus.dsirScore(edge, "txt", m)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("n_feats"))).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 3),
      "unigrams + bigrams: n tokens give 2n-1 features (0 for token-free)")
  }

  test("dsir model artifact: save/load round-trips scores exactly") {
    val (raw, target) = dsirFixture
    val m = Corpus.dsirFit(raw, target, "txt", buckets = 128)
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    Corpus.saveDsirModel(spark, m, s"$dir/model")
    val loaded = Corpus.loadDsirModel(spark, s"$dir/model")
    assert(loaded.buckets == 128)
    val a = Corpus.dsirScore(raw, "txt", m).select("id", "dsir_logw").collect().toSeq
    val b = Corpus.dsirScore(raw, "txt", loaded).select("id", "dsir_logw").collect().toSeq
    assert(a.toSet == b.toSet, "artifact round-trip must preserve every score")
  }

  test("dsir resample: n rows; gumbel=false is hard top-n; seeds vary the draw") {
    val (raw, target) = dsirFixture
    val scored = Corpus.dsirWeights(raw, target, "txt", buckets = 256)
    val hard = Corpus.dsirResample(scored, "id", n = 10, gumbel = false)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hard.size == 10 && hard.subsetOf((1L to 30L).toSet),
      "hard top-10 must be science docs")
    // seed-dependence needs comparable weights (on the separable fixture
    // the logw gap dwarfs the noise, as it should): tie every weight and
    // the draw is pure Gumbel rank
    val tied = (1L to 100L).map(i => (i, 0.0)).toDF("id", "dsir_logw")
    val g1 = Corpus.dsirResample(tied, "id", n = 20, seed = 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    val g2 = Corpus.dsirResample(tied, "id", n = 20, seed = 2L)
      .select("id").collect().map(_.getLong(0)).toSet
    val g1b = Corpus.dsirResample(tied, "id", n = 20, seed = 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(g1.size == 20 && g1 == g1b, "same seed must replay the same draw")
    assert(g1 != g2, "different seeds should draw differently")
  }

  test("dsir threshold-select matches rank-select at matched n; filter is scan-stage") {
    val (raw, target) = dsirFixture
    val scored = Corpus.dsirWeights(raw, target, "txt", buckets = 256)
    val n = 15L
    // exact sketch (relativeError = 0) on distinct Gumbel keys: the
    // derived cut keeps the rank-select set, give or take the one row
    // sitting exactly AT the quantile (both conventions are honest —
    // threshold mode documents ">= t", rank mode exactly n)
    val t = Corpus.dsirThresholdForN(scored, "id", n, seed = 3L,
      relativeError = 0.0)
    val thr = Corpus.dsirResampleThreshold(scored, "id", t, seed = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    val ranked = Corpus.dsirResample(scored, "id", n.toInt, seed = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(thr.size >= n && thr.size <= n + 1,
      s"threshold cut should keep ~n rows, kept ${thr.size} of n=$n")
    assert(ranked.subsetOf(thr),
      "every rank-selected row must clear the matched-n threshold")
    // explicit-threshold path: -inf keeps everything, +inf keeps nothing
    assert(Corpus.dsirResampleThreshold(scored, "id",
      Double.NegativeInfinity, seed = 3L).count() == 60)
    assert(Corpus.dsirResampleThreshold(scored, "id",
      Double.PositiveInfinity, seed = 3L).count() == 0)
    // n >= N derives a keep-all threshold
    assert(Corpus.dsirThresholdForN(scored, "id", 500L, seed = 3L)
      == Double.NegativeInfinity)
    // the selection itself is one scan-stage predicate — no Exchange
    val plan = Corpus.dsirResampleThreshold(scored, "id", t, seed = 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"threshold select must not shuffle (the 100 TB claim):\n$plan")
  }

  test("dsir: scoring plan is scan-stage — no Exchange, no dim-shaped literals") {
    val (raw, target) = dsirFixture
    val m = Corpus.dsirFit(raw, target, "txt", buckets = 4096)
    val plan = Corpus.dsirScore(raw, "txt", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"dsir scoring must not shuffle (the 100 TB claim):\n$plan")
    // the ratio table rides as a codegen reference object, not a plan
    // literal — a 4096-double array literal would show as a giant array
    assert(plan.length < 6000,
      s"plan text should not embed the ratio table (len ${plan.length})")
  }

  test("dsir: misuse is rejected by name") {
    val (raw, target) = dsirFixture
    intercept[IllegalArgumentException] {
      Corpus.dsirFit(raw, target, "txt", buckets = 1)
    }
    val scored = Corpus.dsirWeights(raw, target, "txt", buckets = 64)
    intercept[IllegalArgumentException] {
      Corpus.dsirResample(scored, "id", n = 0)
    }
    intercept[IllegalArgumentException] {
      Corpus.dsirResample(scored.withColumn("fid", col("id").cast("double")),
        "fid", n = 5)
    }
  }
}
