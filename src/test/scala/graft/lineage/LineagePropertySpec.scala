package graft.lineage

import graft.{SparkTestBase, Tables}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5 #3): union folding, literal elision,
  * and alias-resolution invariance under renaming, checked over
  * generated query shapes instead of fixed fixtures. Generators are
  * driven with a fixed seed (deterministic CI) — the scalatest/
  * scalacheck bridge is not in the offline artifact cache.
  */
class LineagePropertySpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    // Full corpus fixtures (incl. the view statement 35 reads) — the
    // wrapper-invariance property re-parses corpus statements.
    LineageQueries.registerFixtures(spark, sfDir)
  }

  /** Sample `n` deterministic values from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val natCols = Seq("n_nationkey", "n_name", "n_regionkey")

  test("union of N branches over M columns yields M edges with merged sources") {
    val cases = samples(Gen.zip(Gen.chooseNum(2, 4), Gen.chooseNum(1, 3)), 8)
    cases.foreach { case (branches, width) =>
      val cols = natCols.take(width)
      val sql = Seq.fill(branches)(
        s"SELECT ${cols.map(c => s"$c AS c_$c").mkString(", ")} FROM nation")
        .mkString(" UNION ALL ")
      val r = LineageParser.parseStatement(spark, sql, 1)
      assert(r.colLines.length == width, s"branches=$branches width=$width")
      r.colLines.zip(cols).foreach { case (cl, c) =>
        // every branch reads the same source column here, so the merged
        // source set is exactly that one column
        assert(cl.fromName == s"default.nation.$c")
      }
    }
  }

  test("literal-only select items never contribute sources") {
    val cases = samples(Gen.zip(Gen.chooseNum(1, 1000), Gen.alphaLowerStr.map(_.take(8))), 8)
    cases.foreach { case (n, s) =>
      val sql = s"SELECT $n AS num, '$s' AS str, n_name FROM nation"
      val r = LineageParser.parseStatement(spark, sql, 1)
      val byName = r.colLines.map(c => c.toName -> c.fromName).toMap
      assert(byName("num") == "")
      assert(byName("str") == "")
      assert(byName("n_name") == "default.nation.n_name")
    }
  }

  test("lineage is invariant under FROM-alias renaming") {
    val base = LineageParser.parseStatement(spark,
      "SELECT x.n_name FROM nation x WHERE x.n_regionkey = 1", 1)
    val aliases = samples(Gen.identifier.map(a => "a" + a.take(6)), 8).distinct
    aliases.foreach { alias =>
      val renamed = LineageParser.parseStatement(spark,
        s"SELECT $alias.n_name FROM nation $alias WHERE $alias.n_regionkey = 1", 1)
      assert(base.colLines.map(c => (c.toName, c.fromName)) ==
        renamed.colLines.map(c => (c.toName, c.fromName)), s"alias=$alias")
      assert(base.inputTables == renamed.inputTables)
      // condition strings differ only by the alias text
      assert(renamed.colLines.head.conditionSet.map(_.replace(alias + ".", "x.")) ==
        base.colLines.head.conditionSet, s"alias=$alias")
    }
  }

  test("select-item aliasing changes toName but not sources") {
    val outs = samples(Gen.identifier.map(a => "c" + a.take(6)), 8).distinct
    outs.foreach { out =>
      val r = LineageParser.parseStatement(spark,
        s"SELECT n_name AS $out FROM nation", 1)
      assert(r.colLines.map(c => (c.toName, c.fromName)) ==
        Seq((out, "default.nation.n_name")), s"out=$out")
    }
  }

  test("control mode never perturbs value-flow edges (parity, whole corpus)") {
    // The CTRL contract (VERDICT r16 #3): includeControl adds edges,
    // never alters one. Checked over EVERY corpus statement, not just
    // the 5-statement ctrl golden: value rows (no CTRL: tag) of the
    // control parse equal the plain parse exactly, and every added row
    // carries only CTRL: tags.
    def key(c: ColLine) = (c.tableName, c.colName, c.toName, c.fromName,
      c.conditionSet)
    LineageQueries.corpus.zipWithIndex.foreach { case (sql, i) =>
      val plain = LineageParser.parseStatement(spark, sql, i + 1)
      val ctrl = LineageParser.parseStatement(spark, sql, i + 1,
        includeControl = true)
      val (added, value) = ctrl.colLines.partition(
        _.conditionSet.exists(_.startsWith("CTRL:")))
      assert(value.map(key).sortBy(_.toString) ==
        plain.colLines.map(key).sortBy(_.toString), s"stmt ${i + 1}: $sql")
      added.foreach(c => assert(
        c.conditionSet.forall(_.startsWith("CTRL:")),
        s"stmt ${i + 1}: mixed tag set on added edge $c"))
      assert(ctrl.inputTables == plain.inputTables, s"stmt ${i + 1}")
      assert(ctrl.outputTables == plain.outputTables, s"stmt ${i + 1}")
    }
  }

  test("parseBulk equals sequential parsing, any thread count") {
    // the parallel path must be a pure reordering of work: same
    // results, same order, same indices — and one poisoned statement
    // degrades to a Left without voiding its neighbors
    val stmts = LineageQueries.corpus.filter(_.startsWith("SELECT")).take(12)
    val sequential = stmts.zipWithIndex.map { case (s, i) =>
      LineageParser.parseStatement(spark, s, i + 1) }
    Seq(1, 4, 16).foreach { p =>
      val bulk = LineageParser.parseBulk(spark, stmts, p)
      assert(bulk.forall(_.isRight), s"p=$p")
      bulk.map(_.toOption.get).zip(sequential).foreach { case (b, s) =>
        assert(b.statementIndex == s.statementIndex)
        assert(b.colLines == s.colLines, s"p=$p stmt ${s.statementIndex}")
        assert(b.inputTables == s.inputTables)
      }
    }
    val poisoned = stmts.take(2) ++ Seq("SELEKT broken FROM") ++ stmts.drop(2)
    val r = LineageParser.parseBulk(spark, poisoned, 8)
    assert(r.count(_.isLeft) == 1 && r(2).isLeft)
    assert(r.count(_.isRight) == stmts.size)
  }

  test("ORDER BY / LIMIT wrappers never change a SELECT statement's sources") {
    // Presentation operators are lineage-invariant on SOURCES and on
    // WHERE/JOIN condition tags (corpus 33 pins one instance; this
    // checks every corpus SELECT under generated wrappers). COLFUN is
    // excluded by design: it annotates the TOP-LEVEL projection, and
    // the wrapper's star expansion replaces expression items with bare
    // columns — the expression still shows in the inner statement.
    def comparable(cls: Seq[ColLine]) = cls.map(c =>
      (c.toName, c.fromName, c.conditionSet.filterNot(_.startsWith("COLFUN:"))))
    val selects = LineageQueries.corpus.filter(s =>
      s.startsWith("SELECT") && !s.contains("ORDER BY") && !s.contains("LIMIT"))
    val limits = samples(Gen.chooseNum(1, 9999), 3)
    selects.foreach { sql =>
      val base = LineageParser.parseStatement(spark, sql, 1).colLines
      limits.foreach { n =>
        val wrapped = LineageParser.parseStatement(spark,
          s"SELECT * FROM ($sql) w_outer LIMIT $n", 1).colLines
        assert(comparable(wrapped) == comparable(base),
          s"LIMIT $n changed edges for: $sql")
      }
    }
  }
}
