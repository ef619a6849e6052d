package graft.lineage

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** COMPOSITIONAL fuzz (r17, widened r18): random query trees over the
  * fixture schema, generated TOGETHER with their expected per-column
  * source sets — a self-computed oracle, not just a crash check. The
  * grammar composes scans, projections (renames + arithmetic merges),
  * filters, equi-joins, positional unions, AGGREGATES (grouping vs
  * aggregate source split), CTEs (single- and double-reference — the
  * `WithCTE` ref chase), and WINDOW functions (frame reads partition
  * key AND argument) to depth 3; for every tree the parser's edges
  * must carry exactly the predicted atomic sources per output column,
  * and inputTables must equal the tables the generator placed.
  *
  * Every tree is additionally parsed in CONTROL-dependency mode
  * (VERDICT r17 #6): the generator tracks which columns its filters
  * and join conditions READ, and the union of the parser's `CTRL:`
  * edges per output column must equal exactly that set — while the
  * value edges stay byte-identical to the parity run (the opt-in
  * contract). Deterministic seeds (the scalatest/scalacheck bridge is
  * not in the offline cache). */
class LineageFuzzSpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    LineageQueries.registerFixtures(spark, sfDir)
  }

  /** One output column: exposed name, atomic sources (db.table.col),
    * and whether arithmetic may be applied to it. */
  private case class Col(name: String, sources: Set[String], numeric: Boolean)
  /** `ctrl`: the atomic sources of every column a filter WHERE or a
    * join ON in this tree reads — the self-computed control oracle
    * (the parser applies each condition's CTRL edge to ALL output
    * columns, so one set per tree suffices). */
  private case class Q(sql: String, cols: Seq[Col], tables: Set[String],
                       ctrl: Set[String] = Set.empty)

  private val scanable: Seq[(String, Seq[(String, Boolean)])] = Seq(
    "nation" -> Seq("n_nationkey" -> true, "n_name" -> false,
      "n_regionkey" -> true),
    "region" -> Seq("r_regionkey" -> true, "r_name" -> false),
    "customer" -> Seq("c_custkey" -> true, "c_name" -> false,
      "c_nationkey" -> true),
    "supplier" -> Seq("s_suppkey" -> true, "s_name" -> false,
      "s_nationkey" -> true))

  private def fresh(ctr: AtomicInteger) = s"f${ctr.incrementAndGet()}"

  private def genScan(ctr: AtomicInteger): Gen[Q] =
    for {
      (t, cols) <- Gen.oneOf(scanable)
      width <- Gen.chooseNum(2, cols.length)
      picked <- Gen.pick(width, cols)
    } yield {
      val out = picked.toSeq.map { case (c, num) =>
        Col(fresh(ctr), Set(s"default.$t.$c"), num) }
      val items = picked.toSeq.zip(out)
        .map { case ((c, _), o) => s"$c AS ${o.name}" }.mkString(", ")
      Q(s"SELECT $items FROM $t", out, Set(s"default.$t"))
    }

  private def genProject(child: Q, ctr: AtomicInteger): Gen[Q] =
    for {
      width <- Gen.chooseNum(1, child.cols.length)
      picked <- Gen.pick(width, child.cols)
      addArith <- Gen.oneOf(true, false)
    } yield {
      val kept = picked.toSeq.map(c => c.copy(name = fresh(ctr)))
      val items = picked.toSeq.zip(kept)
        .map { case (c, k) => s"${c.name} AS ${k.name}" }
      val nums = child.cols.filter(_.numeric)
      val (allItems, allCols) =
        if (addArith && nums.length >= 2) {
          val merged = Col(fresh(ctr),
            nums(0).sources ++ nums(1).sources, numeric = true)
          (items :+ s"${nums(0).name} + ${nums(1).name} AS ${merged.name}",
            kept :+ merged)
        } else (items, kept)
      val a = s"t${ctr.incrementAndGet()}"
      Q(s"SELECT ${allItems.mkString(", ")} FROM (${child.sql}) $a",
        allCols, child.tables, child.ctrl)
    }

  private def genFilter(child: Q, ctr: AtomicInteger): Gen[Q] =
    Gen.chooseNum(0, 7).map { k =>
      val a = s"t${ctr.incrementAndGet()}"
      val condCol = child.cols.find(_.numeric)
      val cond = condCol
        .map(c => s" WHERE ${c.name} > $k").getOrElse("")
      // filter preserves every column and source; names re-exposed 1:1.
      // Control mode additionally reads the condition column.
      Q(s"SELECT * FROM (${child.sql}) $a$cond", child.cols, child.tables,
        child.ctrl ++ condCol.map(_.sources).getOrElse(Set.empty))
    }

  private def genJoin(l: Q, r: Q, ctr: AtomicInteger): Gen[Q] =
    (l.cols.find(_.numeric), r.cols.find(_.numeric)) match {
      case (Some(lk), Some(rk)) =>
        Gen.const {
          val (la, ra) =
            (s"t${ctr.incrementAndGet()}", s"t${ctr.incrementAndGet()}")
          val items = (l.cols ++ r.cols).map(_.name).mkString(", ")
          Q(s"SELECT $items FROM (${l.sql}) $la JOIN (${r.sql}) $ra " +
              s"ON $la.${lk.name} = $ra.${rk.name}",
            l.cols ++ r.cols, l.tables ++ r.tables,
            // the ON condition reads both keys (control mode)
            l.ctrl ++ r.ctrl ++ lk.sources ++ rk.sources)
        }
      case _ => Gen.const(l)
    }

  private def genUnion(l: Q, r: Q, ctr: AtomicInteger): Gen[Q] =
    Gen.const {
      // positional fold over the common width; types must line up, so
      // only positions with matching numeric-ness survive — if none
      // do, degrade to the left child
      val width = math.min(l.cols.length, r.cols.length)
      val pairs = l.cols.take(width).zip(r.cols.take(width))
      if (pairs.exists(p => p._1.numeric != p._2.numeric)) l
      else {
        val out = pairs.map { case (a, b) =>
          Col(fresh(ctr), a.sources ++ b.sources, a.numeric) }
        def side(q: Q): String =
          q.cols.take(width).zip(out)
            .map { case (c, o) => s"${c.name} AS ${o.name}" }
            .mkString(", ")
        val (la, ra) =
          (s"t${ctr.incrementAndGet()}", s"t${ctr.incrementAndGet()}")
        Q(s"SELECT ${side(l)} FROM (${l.sql}) $la UNION ALL " +
            s"SELECT ${side(r)} FROM (${r.sql}) $ra",
          out, l.tables ++ r.tables, l.ctrl ++ r.ctrl)
      }
    }

  /** Aggregate (r18): the grouping-vs-aggregate source split — the
    * grouping output carries the key's sources, the SUM carries its
    * ARGUMENT's sources only (never the key's; golden q04's
    * count-distinct rule). Degrades to the child when no numeric
    * column exists to aggregate. */
  private def genAgg(child: Q, ctr: AtomicInteger): Gen[Q] =
    child.cols.find(_.numeric) match {
      case Some(n) =>
        Gen.oneOf(child.cols).map { g =>
          val a = s"t${ctr.incrementAndGet()}"
          val gOut = Col(fresh(ctr), g.sources, g.numeric)
          val sOut = Col(fresh(ctr), n.sources, numeric = true)
          Q(s"SELECT ${g.name} AS ${gOut.name}, " +
              s"SUM(${n.name}) AS ${sOut.name} " +
              s"FROM (${child.sql}) $a GROUP BY ${g.name}",
            Seq(gOut, sOut), child.tables, child.ctrl)
        }
      case None => Gen.const(child)
    }

  /** CTE (r18): `WithCTE` reference chasing. The double-reference
    * variant reads the SAME definition twice through a positional
    * union — per-position sources must come out identical to one
    * reference (a ∪ a = a), which breaks if ref resolution confuses
    * the two instantiations. */
  private def genCte(child: Q, ctr: AtomicInteger): Gen[Q] =
    Gen.oneOf(true, false).map { double =>
      val cte = s"cte${ctr.incrementAndGet()}"
      val out = child.cols.map(c => c.copy(name = fresh(ctr)))
      def select(): String = child.cols.zip(out)
        .map { case (c, o) => s"${c.name} AS ${o.name}" }.mkString(", ")
      val body =
        if (double)
          s"SELECT ${select()} FROM $cte UNION ALL " +
            s"SELECT ${select()} FROM $cte"
        else s"SELECT ${select()} FROM $cte"
      Q(s"WITH $cte AS (${child.sql}) $body", out, child.tables,
        child.ctrl)
    }

  /** Window (r18): a frame computation reads its argument AND its
    * partition key (LineageFromPlanSpec golden 19 — all-references
    * intent on `WindowExpression`), unlike GROUP BY where the key
    * stays out of the aggregate's sources. */
  private def genWindow(child: Q, ctr: AtomicInteger): Gen[Q] =
    child.cols.find(_.numeric) match {
      case Some(n) =>
        Gen.oneOf(child.cols).map { p =>
          val a = s"t${ctr.incrementAndGet()}"
          val kept = child.cols.map(c => c.copy(name = fresh(ctr)))
          val items = child.cols.zip(kept)
            .map { case (c, k) => s"${c.name} AS ${k.name}" }
          val w = Col(fresh(ctr), n.sources ++ p.sources, numeric = true)
          Q(s"SELECT ${items.mkString(", ")}, SUM(${n.name}) " +
              s"OVER (PARTITION BY ${p.name}) AS ${w.name} " +
              s"FROM (${child.sql}) $a",
            kept :+ w, child.tables, child.ctrl)
        }
      case None => Gen.const(child)
    }

  /** HAVING (r18): lowers to a Filter ABOVE the Aggregate — value
    * sources match plain aggregation, while control mode reads the
    * aggregate argument through the HAVING predicate. */
  private def genHaving(child: Q, ctr: AtomicInteger): Gen[Q] =
    child.cols.find(_.numeric) match {
      case Some(n) =>
        for { g <- Gen.oneOf(child.cols); k <- Gen.chooseNum(0, 5) }
        yield {
          val a = s"t${ctr.incrementAndGet()}"
          val gOut = Col(fresh(ctr), g.sources, g.numeric)
          val sOut = Col(fresh(ctr), n.sources, numeric = true)
          Q(s"SELECT ${g.name} AS ${gOut.name}, " +
              s"SUM(${n.name}) AS ${sOut.name} " +
              s"FROM (${child.sql}) $a GROUP BY ${g.name} " +
              s"HAVING SUM(${n.name}) > $k",
            Seq(gOut, sOut), child.tables,
            child.ctrl ++ n.sources)
        }
      case None => Gen.const(child)
    }

  /** Scalar subquery (r18): a fixed correlated-free `(SELECT MAX …)`
    * select item — its sources are the INNER table's column, and the
    * inner table joins the statement's inputTables. */
  private def genScalarSub(child: Q, ctr: AtomicInteger): Gen[Q] =
    Gen.const {
      val a = s"t${ctr.incrementAndGet()}"
      val kept = child.cols.map(c => c.copy(name = fresh(ctr)))
      val items = child.cols.zip(kept)
        .map { case (c, k) => s"${c.name} AS ${k.name}" }
      val s = Col(fresh(ctr),
        Set("default.region.r_regionkey"), numeric = true)
      Q(s"SELECT ${items.mkString(", ")}, " +
          s"(SELECT MAX(r_regionkey) FROM region) AS ${s.name} " +
          s"FROM (${child.sql}) $a",
        kept :+ s, child.tables + "default.region", child.ctrl)
    }

  private def genQ(depth: Int, ctr: AtomicInteger): Gen[Q] =
    if (depth == 0) genScan(ctr)
    else Gen.chooseNum(0, 9).flatMap {
      case 0 => genScan(ctr)
      case 1 => genQ(depth - 1, ctr).flatMap(genProject(_, ctr))
      case 2 => genQ(depth - 1, ctr).flatMap(genFilter(_, ctr))
      case 3 => for {
        l <- genQ(depth - 1, ctr); r <- genQ(depth - 1, ctr)
        j <- genJoin(l, r, ctr)
      } yield j
      case 4 => for {
        l <- genQ(depth - 1, ctr); r <- genQ(depth - 1, ctr)
        u <- genUnion(l, r, ctr)
      } yield u
      case 5 => genQ(depth - 1, ctr).flatMap(genAgg(_, ctr))
      case 6 => genQ(depth - 1, ctr).flatMap(genCte(_, ctr))
      case 7 => genQ(depth - 1, ctr).flatMap(genWindow(_, ctr))
      case 8 => genQ(depth - 1, ctr).flatMap(genHaving(_, ctr))
      case _ => genQ(depth - 1, ctr).flatMap(genScalarSub(_, ctr))
    }

  private def trees(n: Int): Seq[Q] = {
    val ts = (0 until n).flatMap { i =>
      genQ(3, new AtomicInteger(1000 * i))
        .apply(Gen.Parameters.default, Seed(7L * i + 1))
    }
    assert(ts.size >= n * 5 / 6, s"generator drought: ${ts.size}")
    ts
  }

  test("edges match the generator's own source predictions, 60 trees") {
    trees(60).foreach { q =>
      val r = LineageParser.parseStatement(spark, q.sql, 1)
      val got = r.colLines.map(c =>
        c.toName -> c.fromName.split("[,&]").filter(_.nonEmpty).toSet)
        .toMap
      val want = q.cols.map(c => c.name -> c.sources).toMap
      assert(got == want,
        s"\nsql: ${q.sql}\n got: $got\nwant: $want")
      assert(r.inputTables == q.tables, s"\nsql: ${q.sql}")
      // determinism: a second parse is identical
      val again = LineageParser.parseStatement(spark, q.sql, 1)
      assert(again.colLines == r.colLines, q.sql)
    }
  }

  test("control mode: CTRL edges match the tracked condition reads, 40 trees") {
    trees(40).foreach { q =>
      val r = LineageParser.parseStatement(spark, q.sql, 1,
        includeControl = true)
      val (ctrlEdges, valueEdges) = r.colLines.partition(
        _.conditionSet.exists(_.startsWith("CTRL:")))
      // the opt-in contract: value edges are byte-identical to parity
      assert(valueEdges ==
        LineageParser.parseStatement(spark, q.sql, 1).colLines,
        s"\nsql: ${q.sql} — control mode disturbed the value edges")
      // per output column, the union of CTRL sources = exactly the
      // columns the tree's filters and join conditions read
      val gotCtrl = ctrlEdges.groupBy(_.toName).map { case (k, es) =>
        k -> es.flatMap(_.fromName.split("[,&]")).filter(_.nonEmpty).toSet
      }
      q.cols.foreach { c =>
        assert(gotCtrl.getOrElse(c.name, Set.empty) == q.ctrl,
          s"\nsql: ${q.sql}\n col: ${c.name}\n got: ${
            gotCtrl.getOrElse(c.name, Set.empty)}\nwant: ${q.ctrl}")
      }
    }
  }
}
