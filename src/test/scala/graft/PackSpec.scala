package graft

import graft.ops.Pack
import org.apache.spark.sql.functions._

/** Invariants for training-sequence packing beyond the q203 oracle:
  * hand-computed windows, EOS placement, partial-window policy, token
  * conservation, shard independence, determinism under repartitioning. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long, Seq[Int])] =
    df.orderBy("shard", "seq").collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getSeq[Int](2))).toSeq

  test("sequencePack: hand-computed windows — order, EOS separators, boundaries") {
    // stream (id order): 1 2 3 E | 4 E 5 6 | 7 8 9 E  (E = 0, seqLen 4)
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4)), (3L, Seq(5, 6, 7, 8, 9)))
      .toDF("id", "ids")
    val got = rows(Pack.sequencePack(docs, "id", "ids", seqLen = 4))
    assert(got == Seq(
      (0, 0L, Seq(1, 2, 3, 0)),
      (0, 1L, Seq(4, 0, 5, 6)),
      (0, 2L, Seq(7, 8, 9, 0))))
  }

  test("sequencePack: dropLast policy — partial window kept only on request") {
    val docs = Seq((1L, Seq(1, 2, 3)), (2L, Seq(4, 5))).toDF("id", "ids")
    // stream: 1 2 3 E 4 5 E — 7 tokens → full [1,2,3,E] + partial [4,5,E]
    val full = rows(Pack.sequencePack(docs, "id", "ids", seqLen = 4))
    assert(full == Seq((0, 0L, Seq(1, 2, 3, 0))))
    val all = rows(Pack.sequencePack(docs, "id", "ids", seqLen = 4,
      dropLast = false))
    assert(all == Seq((0, 0L, Seq(1, 2, 3, 0)), (0, 1L, Seq(4, 5, 0))))
  }

  test("sequencePack: token conservation + repartition invariance on random docs") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 200L).map(i =>
      (i, Seq.fill(rnd.nextInt(50))(rnd.nextInt(1000) + 1))).toDF("id", "ids")
    val totalTokens = docs.select(sum(size(col("ids")) + 1)).head.getLong(0)
    val packed = Pack.sequencePack(docs, "id", "ids", seqLen = 16,
      shards = 4, dropLast = false)
    val kept = packed.select(sum("n_tokens")).head.getLong(0)
    assert(kept == totalTokens, "every token (incl. EOS) lands in exactly one window")
    val a = rows(packed)
    val b = rows(Pack.sequencePack(docs.repartition(7), "id", "ids",
      seqLen = 16, shards = 4, dropLast = false))
    assert(a == b, "packing must be deterministic under repartitioning")
    // dropLast drops at most one window per shard, each shorter than seqLen
    val fullOnly = Pack.sequencePack(docs, "id", "ids", seqLen = 16, shards = 4)
    assert(fullOnly.filter(col("n_tokens") =!= 16).count() == 0)
    assert(a.size - rows(fullOnly).size <= 4)
  }

  test("sequencePack: shards pack independently by id mod shards") {
    val docs = (0L to 9L).map(i => (i, Seq(i.toInt + 100))).toDF("id", "ids")
    val got = rows(Pack.sequencePack(docs, "id", "ids", seqLen = 2, shards = 2))
    // shard 0: docs 0,2,4,6,8 → 100 E 102 E ... five 2-token windows
    assert(got.filter(_._1 == 0).map(_._3) ==
      Seq(Seq(100, 0), Seq(102, 0), Seq(104, 0), Seq(106, 0), Seq(108, 0)))
    assert(got.filter(_._1 == 1).map(_._3) ==
      Seq(Seq(101, 0), Seq(103, 0), Seq(105, 0), Seq(107, 0), Seq(109, 0)))
  }

  test("sequencePack: string ids shard deterministically; empty docs still emit EOS") {
    val docs = Seq(("a", Seq(1)), ("b", Seq.empty[Int]), ("c", Seq(2)))
      .toDF("id", "ids")
    val a = rows(Pack.sequencePack(docs, "id", "ids", seqLen = 2, shards = 3,
      dropLast = false))
    val b = rows(Pack.sequencePack(docs, "id", "ids", seqLen = 2, shards = 3,
      dropLast = false))
    assert(a == b, "string-id sharding must replay")
    val tokens = a.flatMap(_._3)
    assert(tokens.count(_ == 0) == 3, "an empty doc is exactly one EOS token")
    assert(tokens.sorted.filter(_ > 0) == Seq(1, 2))
  }

  test("sequencePack: with_bounds emits doc-start slots per window (split mode)") {
    // stream (id order): 1 2 3 E | 4 E 5 6 | 7 8 9 E  (E = 0, seqLen 4)
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4)), (3L, Seq(5, 6, 7, 8, 9)))
      .toDF("id", "ids")
    val got = Pack.sequencePack(docs, "id", "ids", seqLen = 4,
        withBounds = true)
      .orderBy("shard", "seq").collect()
      .map(r => (r.getLong(1), r.getSeq[Int](2), r.getSeq[Int](4))).toSeq
    assert(got == Seq(
      (0L, Seq(1, 2, 3, 0), Seq(0)),      // doc 1 starts at slot 0
      (1L, Seq(4, 0, 5, 6), Seq(0, 2)),   // doc 2 at 0, doc 3 at 2
      (2L, Seq(7, 8, 9, 0), Seq())))      // pure continuation window
  }

  test("sequencePack whole mode: next-fit — docs never split, short windows keep") {
    // seqLen 6; with EOS: doc1=4, doc2=3, doc3=2, doc4=6(truncated from 9)
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (3L, Seq(6)),
      (4L, Seq(7, 8, 9, 10, 11, 12, 13, 14, 15)))
      .toDF("id", "ids")
    val got = Pack.sequencePack(docs, "id", "ids", seqLen = 6,
        mode = "whole", dropLast = false, withBounds = true)
      .orderBy("shard", "seq").collect()
      .map(r => (r.getLong(1), r.getSeq[Int](2), r.getInt(3), r.getSeq[Int](4)))
      .toSeq
    assert(got == Seq(
      (0L, Seq(1, 2, 3, 0), 4, Seq(0)),       // doc2 (3) would overflow 4+3>6
      (1L, Seq(4, 5, 0, 6, 0), 5, Seq(0, 3)), // docs 2+3 share a window
      (2L, Seq(7, 8, 9, 10, 11, 0), 6, Seq(0)))) // doc4 truncated to 5+EOS
  }

  test("sequencePack whole mode: dropLast drops only a SHORT final window") {
    val docs = Seq((1L, Seq(1, 2, 3)), (2L, Seq(4, 5, 6))).toDF("id", "ids")
    // seqLen 4: windows [1,2,3,E] (full) then [4,5,6,E] (full, final)
    val full = Pack.sequencePack(docs, "id", "ids", seqLen = 4, mode = "whole")
    assert(full.count() == 2, "a final FULL window always keeps")
    // seqLen 5: [1,2,3,E] closes short at doc 2 (4+4>5), [4,5,6,E] is the
    // open final window — dropped; the closed-short intermediate keeps
    val cut = Pack.sequencePack(docs, "id", "ids", seqLen = 5, mode = "whole")
      .collect().map(r => r.getSeq[Int](2)).toSeq
    assert(cut == Seq(Seq(1, 2, 3, 0)))
  }

  test("sequencePack whole mode: repartition invariance + token conservation") {
    val rnd = new scala.util.Random(13)
    val docs = (1L to 300L).map(i =>
      (i, Seq.fill(rnd.nextInt(20))(rnd.nextInt(1000) + 1))).toDF("id", "ids")
    def run(df: org.apache.spark.sql.DataFrame) =
      Pack.sequencePack(df, "id", "ids", seqLen = 32, shards = 4,
          mode = "whole", dropLast = false, withBounds = true)
        .orderBy("shard", "seq").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Int](2),
          r.getSeq[Int](4))).toSeq
    val a = run(docs)
    assert(a == run(docs.repartition(7)), "whole-mode pack must replay")
    // no doc here exceeds seqLen − 1, so every token (incl. EOS) survives
    val totalTokens = docs.select(sum(size(col("ids")) + 1)).head.getLong(0)
    assert(a.map(_._3.size.toLong).sum == totalTokens)
    // every window starts with a doc (never a continuation) and each
    // doc_start slot is a real boundary: previous slot holds an EOS
    a.foreach { case (_, _, ids, starts) =>
      assert(starts.headOption.contains(0))
      starts.filter(_ > 0).foreach(s => assert(ids(s - 1) == 0))
    }
  }

  test("sequencePack best_fit: hand-computed BFD — length-desc order, tightest bin") {
    // lens with EOS: a=5, b=4, c=3, d=2, e=2 (seqLen 7)
    // BFD order a,b,c,d,e: a→w0 (rem 2), b→w1 (rem 3), c→w1 (rem 0),
    // d→w0 (rem 0), e→w2 (rem 5)
    val docs = Seq(
      (1L, Seq(11, 12, 13, 14)), (2L, Seq(21, 22, 23)), (3L, Seq(31, 32)),
      (4L, Seq(41)), (5L, Seq(51)))
      .toDF("id", "ids")
    val got = Pack.sequencePack(docs, "id", "ids", seqLen = 7,
        mode = "best_fit", withBounds = true)
      .orderBy("shard", "seq").collect()
      .map(r => (r.getLong(1), r.getSeq[Int](2), r.getSeq[Int](4))).toSeq
    assert(got == Seq(
      (0L, Seq(11, 12, 13, 14, 0, 41, 0), Seq(0, 5)),
      (1L, Seq(21, 22, 23, 0, 31, 32, 0), Seq(0, 4)),
      (2L, Seq(51, 0), Seq(0))))
  }

  test("sequencePack best_fit: tie rules — equal lengths by id, equal remaining by window") {
    // four docs of len 3 (incl EOS), seqLen 6: BFD ties on length break
    // by id; two windows fill (1,2) then (3,4) — NOT (1,3)/(2,4)
    val docs = Seq((1L, Seq(1, 2)), (2L, Seq(3, 4)), (3L, Seq(5, 6)),
      (4L, Seq(7, 8))).toDF("id", "ids")
    val got = Pack.sequencePack(docs, "id", "ids", seqLen = 6,
        mode = "best_fit")
      .orderBy("seq").collect().map(_.getSeq[Int](2)).toSeq
    assert(got == Seq(Seq(1, 2, 0, 3, 4, 0), Seq(5, 6, 0, 7, 8, 0)))
  }

  test("sequencePack best_fit: conservation, replay, waste <= whole mode") {
    val rnd = new scala.util.Random(17)
    val docs = (1L to 400L).map(i =>
      (i, Seq.fill(rnd.nextInt(24))(rnd.nextInt(1000) + 1))).toDF("id", "ids")
    def run(df: org.apache.spark.sql.DataFrame) =
      Pack.sequencePack(df, "id", "ids", seqLen = 32, shards = 4,
          mode = "best_fit", withBounds = true)
        .orderBy("shard", "seq").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Int](2),
          r.getSeq[Int](4))).toSeq
    val a = run(docs)
    assert(a == run(docs.repartition(9)), "BFD pack must replay")
    val totalTokens = docs.select(sum(size(col("ids")) + 1)).head.getLong(0)
    assert(a.map(_._3.size.toLong).sum == totalTokens,
      "no doc here exceeds seqLen - 1: every token survives intact")
    a.foreach { case (_, _, ids, starts) =>
      assert(ids.size <= 32 && starts.headOption.contains(0))
      starts.filter(_ > 0).foreach(s => assert(ids(s - 1) == 0))
    }
    val nfWindows = Pack.sequencePack(docs, "id", "ids", seqLen = 32,
      shards = 4, mode = "whole", dropLast = false).count()
    assert(a.size <= nfWindows,
      "best-fit-decreasing never needs more windows than next-fit here")
  }

  test("sequencePack: pad_id pads short kept windows; n_tokens stays pre-pad") {
    val docs = Seq((1L, Seq(1, 2, 3)), (2L, Seq(4, 5))).toDF("id", "ids")
    val got = Pack.sequencePack(docs, "id", "ids", seqLen = 4,
        dropLast = false, padId = 9)
      .orderBy("seq").collect()
      .map(r => (r.getSeq[Int](2), r.getInt(3))).toSeq
    assert(got == Seq((Seq(1, 2, 3, 0), 4), (Seq(4, 5, 0, 9), 3)))
  }

  test("sequencePack: misuse is rejected by name") {
    val docs = Seq((1L, Seq(1))).toDF("id", "ids")
    intercept[IllegalArgumentException] {
      Pack.sequencePack(docs, "id", "ids", seqLen = 1)
    }
    intercept[IllegalArgumentException] {
      Pack.sequencePack(docs, "id", "ids", seqLen = 4, shards = 0)
    }
    intercept[IllegalArgumentException] {
      Pack.sequencePack(docs.select(array(col("ids")).as("id"), col("ids")),
        "id", "ids", seqLen = 4)
    }
    val eMode = intercept[IllegalArgumentException] {
      Pack.sequencePack(docs, "id", "ids", seqLen = 4, mode = "bestfit")
    }
    assert(eMode.getMessage.contains("mode"))
    intercept[IllegalArgumentException] {
      Pack.sequencePack(docs, "id", "ids", seqLen = 4, padId = -2)
    }
  }
}
