package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star center dominates; total rank mass is conserved") {
    // star: 0-1, 0-2, 0-3, 0-4 (undirected)
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("doc_a", "doc_b")
    val pr = Graph.pageRank(pairs, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 5)
    val leaves = (1L to 4L).map(pr)
    assert(leaves.distinct.size == 1, "symmetric leaves must score identically")
    assert(pr(0L) > leaves.head * 2, s"center ${pr(0L)} vs leaf ${leaves.head}")
    // PageRank over a graph with no dangling mass sums to 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-4, pr.values.sum.toString)
  }

  test("pageRank: disconnected pairs score by local degree only, deterministically") {
    val pairs = Seq((10L, 11L), (20L, 21L), (20L, 22L)).toDF("doc_a", "doc_b")
    val run1 = Graph.pageRank(pairs, iters = 3).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val run2 = Graph.pageRank(pairs, iters = 3).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(run1.sameElements(run2), "fixed-iteration PageRank must be run-stable")
    val m = run1.toMap
    // the 10-11 pair exchanges rank symmetrically
    assert(m(10L) == m(11L))
    // hub 20 collects from two leaves, beats them
    assert(m(20L) > m(21L) && m(21L) == m(22L))
  }

  test("triangleStats: K4 is all triangles (cc=1), a path has none (cc=0)") {
    // K4: 6 edges, C(4,3)=4 triangles, Σ C(3,2)=12 wedges → cc = 3·4/12 = 1
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("doc_a", "doc_b")
    val r = Graph.triangleStats(k4).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((6L, 4L, 12L, 1.0)), r.toString)
    // path 0-1-2: 2 edges, 1 wedge at node 1, no closing edge
    val path = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b")
    val p = Graph.triangleStats(path).collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getDouble(3)) ==
      ((2L, 0L, 1L, 0.0)), p.toString)
  }

  test("degree orientation: a mid-id hub emits ZERO wedge candidates, not d²/4") {
    // hub id 500 with 200 leaves split below/above its id. Raw-id
    // orientation (a<b<c, wedge at the middle id) would enumerate
    // 100×100 = 10,000 wedges at the hub; degree orientation points
    // every edge INTO the hub (leaves have degree 1 < 200), so the
    // candidate list is empty — the Schank–Wagner bound in action.
    val leaves = ((1L to 100L) ++ (901L to 1000L))
    val star = leaves.map(l => if (l < 500L) (l, 500L) else (500L, l))
      .toDF("doc_a", "doc_b")
    assert(Graph.degreeOrientedWedges(star).count() == 0L)
    val s = Graph.triangleStats(star).collect().head
    // 200 edges, no triangles, C(200,2) wedges by degree count
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == ((200L, 0L, 19900L)), s.toString)
    // triangles hanging off the hub are still found exactly once
    val withTri = (leaves.map(l => if (l < 500L) (l, 500L) else (500L, l)) ++
      Seq((1L, 2L), (901L, 902L))).toDF("doc_a", "doc_b")
    assert(Graph.triangleStats(withTri).collect().head.getLong(1) == 2L)
  }

  test("degreeHistogram: star graph = one hub of degree d, d leaves of degree 1") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("doc_a", "doc_b")
    val out = Graph.degreeHistogram(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 4L, 4L -> 1L), out.toString)
  }

  test("kCorePeel: pendant chain peels outside-in, triangle nucleus survives") {
    // triangle {1,2,3} with a chain 3–4–5 hanging off it
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val out = Graph.kCorePeel(g).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 5 (deg 1) peels round 1; 4's degree then drops to 1 → round 2;
    // the triangle is the 2-core and survives all rounds
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 2, 5L -> 1), out.toString)
  }

  test("assortativity: path is perfectly disassortative, regular graph is null") {
    // P3 (1–2–3): directed endpoint degrees x=[1,2,2,1], y=[2,1,1,2] → r = −1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val p = Graph.assortativity(path).collect().head
    assert(p.getLong(0) == 2L && p.getLong(1) == 3L && p.getDouble(2) == -1.0)
    // C3 triangle: every degree 2 → zero variance → null, not NaN
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val t = Graph.assortativity(tri).collect().head
    assert(t.getLong(0) == 3L && t.isNullAt(2), t.toString)
    // star K1,3: hubs-to-leaves only → also −1 (Newman 2002's canonical case)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("doc_a", "doc_b")
    assert(Graph.assortativity(star).collect().head.getDouble(2) == -1.0)
  }
}
