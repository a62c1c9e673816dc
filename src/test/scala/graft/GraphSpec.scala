package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Invariants for the link-graph operators beyond the q186/q187 oracles:
  * hand-computed ranks on tiny graphs, mass conservation, dangling
  * redistribution, determinism. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: 2-cycle is the fixed point — both nodes hold 1/2 forever") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iters = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("a" -> 0.5, "b" -> 0.5))
  }

  test("pageRank: dangling mass redistributes (hand-computed a→b, one iteration)") {
    // N=2, r0=(0.5, 0.5); b is dangling with mass 0.5:
    //   r'(a) = 0.15/2 + 0.85·(0 + 0.25)   = 0.2875
    //   r'(b) = 0.15/2 + 0.85·(0.5 + 0.25) = 0.7125
    val e = Seq(("a", "b")).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("a" -> 0.2875, "b" -> 0.7125))
  }

  test("pageRank: rank mass is conserved to rounding on a mixed graph") {
    val e = Seq(
      ("hub", "s1"), ("s1", "hub"), ("s2", "hub"), ("s3", "hub"),
      ("s3", "s2"), ("s4", "s1") // s4 has out, nothing in; s1 links back
    ).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iters = 8)
    val total = r.agg(sum("rank")).head.getDouble(0)
    // 5 nodes × 9-dp rounding per iteration × 8 iterations bounds the drift
    assert(math.abs(total - 1.0) < 5 * 8 * 1e-9, s"mass drifted: $total")
    val m = r.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(m("hub") > m("s1") && m("s1") > m("s4"),
      "in-degree-rich hub must outrank spokes, linked spoke must outrank unlinked")
  }

  test("pageRank: multi-edges don't double-vote; NULL endpoints drop") {
    val e = Seq(
      (Some("a"), Some("b")), (Some("a"), Some("b")), // duplicate edge
      (Some("b"), Some("a")),
      (None, Some("a")), (Some("b"), None) // null endpoints
    ).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("a" -> 0.5, "b" -> 0.5),
      "after dedup + null-drop this is the 2-cycle fixed point")
  }

  test("pageRank: deterministic across runs") {
    val e = Tables.load(spark, sf, "documents").select(
      concat(lit("h"), col("doc_id") % 7).as("src"),
      concat(lit("h"), expr("doc_id div 3") % 7).as("dst"))
      .filter(col("src") =!= col("dst"))
    val a = Graph.pageRank(e, "src", "dst", iters = 3).collect().toSet
    val b = Graph.pageRank(e, "src", "dst", iters = 3).collect().toSet
    assert(a == b)
  }

  test("pageRank: tol stops at the fixed point with ranks unchanged") {
    // The 2-cycle reaches its fixed point after one iteration, so with
    // tol set, iteration 2's max |Δ| = 0 stops the loop early — ranks
    // must equal the fixed-iteration result bit for bit.
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val conv = Graph.pageRank(e, "src", "dst", iters = 50, tol = 1e-9)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(conv == Map("a" -> 0.5, "b" -> 0.5))
    // On a graph that hasn't converged, a loose tol and the full run
    // bracket the same fixed ranks: tol-stopped result equals the
    // fixed-iteration result of however many rounds it ran — here just
    // assert a tight tol reproduces the exact 8-iteration mixed-graph
    // ranks (8 rounds, |Δ| stays above 1e-12 until the cap).
    val g = Seq(
      ("hub", "s1"), ("s1", "hub"), ("s2", "hub"), ("s3", "hub"),
      ("s3", "s2"), ("s4", "s1")).toDF("src", "dst")
    val fixed = Graph.pageRank(g, "src", "dst", iters = 8).collect().toSet
    val toled = Graph.pageRank(g, "src", "dst", iters = 8, tol = 1e-12)
      .collect().toSet
    assert(toled == fixed, "a tol below the per-round delta must not change ranks")
  }

  test("pageRank: misuse is rejected by name") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pageRank(e, "src", "dst", iters = 0) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, "src", "dst", damping = 1.0) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, "src", "dst", tol = -1.0) }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e.filter(lit(false)), "src", "dst")
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", smallGraphEdges = (1L << 24) + 1)
    }
  }

  test("pageRank: driver cutover is bit-identical to the distributed loop") {
    // A deliberately messy graph: hub, chain, dangling sinks, a cycle,
    // multi-edges, plus integer-keyed variant. smallGraphEdges = 0
    // forces the distributed loop on the same input.
    val edges = Seq(
      "h" -> "a", "h" -> "b", "h" -> "c", "a" -> "b", "b" -> "c",
      "c" -> "h", "c" -> "d", "d" -> "e", "x" -> "y", "h" -> "a",
      "y" -> "x", "e" -> "h", "q" -> "z")
    val e = edges.toDF("src", "dst")
    for (it <- Seq(1, 3, 7); tol <- Seq(0.0, 1e-7)) {
      val local = Graph.pageRank(e, "src", "dst", iters = it, tol = tol)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val dist = Graph.pageRank(e, "src", "dst", iters = it, tol = tol,
          smallGraphEdges = 0L)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(local == dist, s"iters=$it tol=$tol")
    }
    val ei = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 5L -> 4L)
      .toDF("src", "dst")
    val li = Graph.pageRank(ei, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val di = Graph.pageRank(ei, "src", "dst", iters = 4, smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(li == di)
  }
}
