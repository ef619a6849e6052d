package graft.operators

import graft.SparkTestBase

/** Connected-components fixpoint semantics: min-id labels, propagation
  * across the full diameter, disjoint components stay disjoint, and the
  * round cap fails loudly instead of returning a partial labelling.
  */
class GraphSpec extends SparkTestBase {

  private def cc(edges: Seq[(Long, Long)], maxIters: Int = 30) = {
    import spark.implicits._
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("label propagation: synchronous rounds, majority vote, min-label ties") {
    import spark.implicits._
    // two triangles bridged by 3—4; every step hand-computed:
    // round 1 (from self labels): 1→2 (tie {2,3}), 2→1, 3→1 (tie
    // {1,2,4}), 4→3 (tie {3,5,6}), 5→4, 6→4
    // round 2: 1→1 (both nbrs carry 1), 2→1 (tie {2,1}), 3→1 (tie
    // {2,1,3}), 4→4 (majority: 5,6 carry 4), 5→3 (tie {3,4}), 6→3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    def lp(r: Int) = Graph.labelPropagation(edges, "a", "b", r)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(lp(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 4L, 6L -> 4L))
    assert(lp(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 3L, 6L -> 3L))
  }

  test("path graph needs full-diameter propagation; components stay disjoint") {
    // 5—4—3—2—1 written high-to-low so the min label must travel the
    // whole path, plus a separate pair and a self-contained triangle.
    val got = cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
      (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("edge direction and duplicates don't matter") {
    assert(cc(Seq((2L, 7L), (7L, 2L), (2L, 7L), (9L, 7L))) ==
      Map(2L -> 2L, 7L -> 2L, 9L -> 2L))
  }

  test("an insufficient round cap fails loudly, never partially") {
    intercept[IllegalStateException] {
      cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)), maxIters = 1)
    }
  }

  private def ccStar(edges: Seq[(Long, Long)], maxIters: Int = 50) = {
    import spark.implicits._
    Graph.connectedComponentsStar(edges.toDF("a", "b"), "a", "b", maxIters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("star contraction agrees with propagation on mixed graphs") {
    val cases = Seq(
      Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
        (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L)),
      Seq((2L, 7L), (7L, 2L), (2L, 7L), (9L, 7L)),
      // deterministic pseudo-random graph over 60 nodes
      (0 until 120).map { i =>
        val a = (i * 2654435761L) % 60
        val b = (i * 40503L + 13) % 60
        (a, b)
      })
    cases.foreach { es =>
      assert(ccStar(es) == cc(es, maxIters = 60), s"mismatch on $es")
    }
  }

  test("star contraction closes a 200-node path in O(log^2) rounds") {
    // propagation would need ~200 rounds; star contraction must land
    // well inside 20 alternations, with every node labelled 0
    val path = (0L until 199L).map(i => (i, i + 1))
    val got = ccStar(path, maxIters = 20)
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("self-loop-only nodes keep themselves as component") {
    assert(ccStar(Seq((3L, 3L), (1L, 2L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("triangle counts: K4 has 4 triangles with every vertex in 3") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val got = Graph.triangleCount(k4, "a", "b")
      .orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == (1L to 4L).map(v => (v, 3L, 3L)))
  }

  test("triangle counts: pendant vertex has 0; duplicates/reversals collapse") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 4L))
      .toDF("a", "b")
    val got = Graph.triangleCount(g, "a", "b")
      .orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 1L, 0L)))
  }

  test("pageRankInt rejects dangling nodes instead of leaking rank mass") {
    import spark.implicits._
    // node 3 appears only as a destination: its incoming rank would
    // silently vanish each round — the guard must fail loudly instead
    val sink = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("s", "d")
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankInt(sink, "s", "d", iters = 2).collect()
    }
    assert(ex.getMessage.contains("dangling"))
    // symmetrized, the same edges pass and conserve scaled mass within
    // integer-division slack
    val und = sink.union(sink.select($"d", $"s"))
    val ranks = Graph.pageRankInt(und, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(ranks.keySet == Set(1L, 2L, 3L) && ranks.values.forall(_ > 0L))
  }

  test("k-core peeling cascades: a tail strands its neighbor round by round") {
    import spark.implicits._
    // triangle {10,11,12} with a 2-hop tail 1-2-10: k=2 removes node 1
    // (degree 1) in round 1, which strands node 2 for round 2; the
    // triangle is the 2-core. A converged extra round changes nothing.
    val edges = Seq((10L, 11L), (11L, 12L), (10L, 12L),
      (1L, 2L), (2L, 10L)).toDF("a", "b")
    def core(rounds: Int) =
      Graph.kCorePeel(edges, "a", "b", k = 2, rounds = rounds)
        .as[(Long, Long)].collect().toMap
    assert(core(1).keySet == Set(2L, 10L, 11L, 12L)) // tail end gone
    assert(core(2) == Map(10L -> 2L, 11L -> 2L, 12L -> 2L))
    assert(core(3) == core(2)) // converged: no-op round
    // k above the max degree empties the graph
    assert(Graph.kCorePeel(edges, "a", "b", k = 4, rounds = 2).count() == 0)
  }

  test("modularity: two clean cliques score high, one random blob scores ~0") {
    import spark.implicits._
    // two disjoint triangles; labels = the component → the textbook
    // high-modularity partition. m=6, intra=6, each community d_c=6:
    // Q = 1 − 2·36/144 = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L)).toDF("node", "label")
    val r = Graph.modularity(edges, labels, "a", "b", "node", "label")
      .collect().head
    assert(r.getLong(0) == 6L)      // n_edges
    assert(r.getLong(1) == 2L)      // n_communities
    assert(r.getLong(2) == 6L)      // intra_edges
    assert(r.getLong(3) == 500000L) // Q = 0.5 exactly

    // everything in ONE community: Q = 1 − (2m/2m)² = 0 exactly
    import org.apache.spark.sql.functions.{col, lit}
    val one = labels.select(col("node"), lit(7L).as("label"))
    val r1 = Graph.modularity(edges, one, "a", "b", "node", "label")
      .collect().head
    assert(r1.getLong(3) == 0L)

    // cross-community edges are penalized: swap node 3 into the other
    // community → intra drops to 4, Q < 0.5
    val bad = Seq((1L, 1L), (2L, 1L), (3L, 10L),
      (10L, 10L), (11L, 10L), (12L, 10L)).toDF("node", "label")
    val rb = Graph.modularity(edges, bad, "a", "b", "node", "label")
      .collect().head
    assert(rb.getLong(2) == 4L && rb.getLong(3) < 500000L)
  }
}
