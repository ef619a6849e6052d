package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every declared query must have an
  * oracle and vice versa (a key present on one side only silently
  * weakens the round's correctness gate), and the short bench ids must
  * stay unique (Bench falls back to full names on collision, but a
  * collision is always an authoring mistake worth failing fast on). */
class ContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("short bench ids (qNN prefixes) are unique") {
    val ids = SparkEntry.queries.keySet.toSeq.map(_.takeWhile(_ != '_'))
    assert(ids.distinct.size == ids.size,
      s"colliding prefixes: ${ids.groupBy(identity).collect { case (k, v) if v.size > 1 => k }}")
  }
}
