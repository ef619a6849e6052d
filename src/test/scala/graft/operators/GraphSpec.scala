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
}
