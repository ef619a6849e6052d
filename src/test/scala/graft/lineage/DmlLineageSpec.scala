package graft.lineage

import graft.SparkTestBase

/** Lakehouse DML lineage (engine extension): MERGE INTO / UPDATE /
  * DELETE statements, which analyze only against v2 tables and so take
  * the unresolved-plan path — except the MERGE source side, a plain
  * query that goes through the analyzer and chases to leaf columns. */
class DmlLineageSpec extends SparkTestBase {

  // full fixtures: MERGE ambiguity detection reads the target's
  // schema (lineage_target) through the metadata provider. Registered
  // once per suite — the fixture DDL drops/creates physical warehouse
  // tables, so re-running it per parsed statement is pure churn.
  private lazy val fixtures: Unit =
    LineageQueries.registerFixtures(spark, sfDir)

  private def parse(stmt: String): LineageResult = {
    fixtures
    LineageParser.parseStatement(spark, stmt, 1)
  }

  test("UPDATE: self-edges per assignment, WHERE tag, literal elision") {
    val r = parse("UPDATE orders SET o_totalprice = o_totalprice * 1.1, " +
      "o_orderstatus = 'X' WHERE o_orderstatus = 'O'")
    assert(r.operation == Operation.Update)
    assert(r.inputTables == Set("default.orders"))
    assert(r.outputTables == Set("default.orders"))
    val edges = r.colLines.map(c => (c.toName, c.fromName)).toSet
    assert(edges == Set(
      ("o_totalprice", "default.orders.o_totalprice"),
      ("o_orderstatus", ""))) // literal-only assignment has no sources
    assert(r.colLines.forall(_.conditionSet ==
      Set("WHERE:(o_orderstatus = 'O')")))
  }

  test("DELETE: DDL-style output encoding, the predicate reads the table") {
    val r = parse("DELETE FROM orders WHERE o_totalprice < 10")
    assert(r.operation == Operation.Delete)
    assert(r.inputTables == Set("default.orders"))
    assert(r.outputTables == Set("default.orders\tDELETE"))
    // WHERE parity with UPDATE: the predicate's columns are recorded
    // (destination-column-less edge — a delete writes no column)
    val edge = r.colLines match { case Seq(e) => e }
    assert(edge.toName == "" && edge.colName.isEmpty)
    assert(edge.fromName == "default.orders.o_totalprice")
    assert(edge.conditionSet.exists(_.startsWith("WHERE:")))
  }

  test("unconditional DELETE carries no predicate edge") {
    val r = parse("DELETE FROM orders")
    assert(r.colLines.isEmpty)
    assert(r.inputTables == Set("default.orders"))
  }

  test("DML subquery tables reach inputTables (UPDATE value, DELETE predicate)") {
    // expression.collect does not descend into subquery plans; the
    // explicit walk must surface `customer` as an input in both paths
    val u = parse("UPDATE orders SET o_totalprice = " +
      "(SELECT max(c_acctbal) FROM customer) WHERE o_orderstatus = 'O'")
    assert(u.inputTables == Set("default.orders", "default.customer"))
    val d = parse("DELETE FROM orders WHERE o_custkey IN " +
      "(SELECT c_custkey FROM customer WHERE c_acctbal < 0)")
    assert(d.inputTables == Set("default.orders", "default.customer"))
    // doubly-nested: the subquery's OWN predicate hides another
    // subquery — the walk must recurse or `supplier` vanishes
    val n = parse("UPDATE orders SET o_totalprice = " +
      "(SELECT max(c_acctbal) FROM customer WHERE c_custkey IN " +
      "(SELECT s_suppkey FROM supplier))")
    assert(n.inputTables ==
      Set("default.orders", "default.customer", "default.supplier"))
  }

  test("MERGE unqualified name on BOTH sides emits both candidate edges") {
    // source output `tgt_name` collides with the target's own column:
    // the conservative union keeps both (a confident wrong edge is
    // worse than an extra one)
    val r = parse(
      "MERGE INTO lineage_target t USING " +
        "(SELECT n_nationkey AS k, n_name AS tgt_name FROM nation) s " +
        "ON t.tgt_key = s.k " +
        "WHEN MATCHED THEN UPDATE SET tgt_name = tgt_name")
    val edge = r.colLines.head
    assert(edge.fromName ==
      "default.lineage_target.tgt_name,default.nation.n_name")
  }

  test("MERGE: source refs chase the subquery to leaf columns; ON tag everywhere") {
    val r = parse(
      "MERGE INTO lineage_target t USING " +
        "(SELECT n_nationkey AS k, n_name AS nm FROM nation WHERE n_regionkey = 1) s " +
        "ON t.tgt_key = s.k " +
        "WHEN MATCHED THEN UPDATE SET tgt_name = s.nm " +
        "WHEN NOT MATCHED THEN INSERT (tgt_key, tgt_name) VALUES (s.k, s.nm)")
    assert(r.operation == Operation.Merge)
    // inputs: the source's leaf table plus the target (read for matching)
    assert(r.inputTables == Set("default.nation", "default.lineage_target"))
    assert(r.outputTables == Set("default.lineage_target"))
    val edges = r.colLines.map(c => (c.toName, c.fromName)).toSet
    assert(edges == Set(
      ("tgt_name", "default.nation.n_name"),
      ("tgt_key", "default.nation.n_nationkey")))
    assert(r.colLines.forall(_.conditionSet.contains("MERGE:(t.tgt_key = s.k)")))
  }

  test("MERGE star actions map same-named source columns; WHEN tags attach") {
    val r = parse(
      "MERGE INTO lineage_target t USING nation ON t.tgt_key = nation.n_nationkey " +
        "WHEN MATCHED AND nation.n_regionkey > 2 THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    val byName = r.colLines.groupBy(_.toName)
    // one edge per source output column per star action
    assert(byName.keySet == Set("n_nationkey", "n_name", "n_regionkey"))
    assert(byName("n_name").map(_.fromName).toSet == Set("default.nation.n_name"))
    // the conditional action carries its WHEN tag; the unconditional one doesn't
    val tags = r.colLines.flatMap(_.conditionSet).toSet
    assert(tags.contains("MERGE:(t.tgt_key = nation.n_nationkey)"))
    assert(tags.exists(_.startsWith("WHEN:(nation.n_regionkey >")))
  }

  test("MERGE target-side references resolve to the target by alias") {
    val r = parse(
      "MERGE INTO lineage_target t USING nation s ON t.tgt_key = s.n_nationkey " +
        "WHEN MATCHED THEN UPDATE SET tgt_name = concat(t.tgt_name, s.n_name)")
    val edge = r.colLines.head
    assert(edge.fromName ==
      "default.lineage_target.tgt_name,default.nation.n_name")
  }
}
