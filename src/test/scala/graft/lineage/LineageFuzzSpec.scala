package graft.lineage

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** COMPOSITIONAL fuzz (r17): random query trees over the fixture
  * schema, generated TOGETHER with their expected per-column source
  * sets — a self-computed oracle, not just a crash check. The grammar
  * composes scans, projections (renames + arithmetic merges), filters,
  * equi-joins, and positional unions to depth 3; for every tree the
  * parser's edges must carry exactly the predicted atomic sources per
  * output column, and inputTables must equal the tables the generator
  * placed. Deterministic seeds (the scalatest/scalacheck bridge is not
  * in the offline cache). */
class LineageFuzzSpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    LineageQueries.registerFixtures(spark, sfDir)
  }

  /** One output column: exposed name, atomic sources (db.table.col),
    * and whether arithmetic may be applied to it. */
  private case class Col(name: String, sources: Set[String], numeric: Boolean)
  private case class Q(sql: String, cols: Seq[Col], tables: Set[String])

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
        allCols, child.tables)
    }

  private def genFilter(child: Q, ctr: AtomicInteger): Gen[Q] =
    Gen.chooseNum(0, 7).map { k =>
      val a = s"t${ctr.incrementAndGet()}"
      val cond = child.cols.find(_.numeric)
        .map(c => s" WHERE ${c.name} > $k").getOrElse("")
      // filter preserves every column and source; names re-exposed 1:1
      Q(s"SELECT * FROM (${child.sql}) $a$cond", child.cols, child.tables)
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
            l.cols ++ r.cols, l.tables ++ r.tables)
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
          out, l.tables ++ r.tables)
      }
    }

  private def genQ(depth: Int, ctr: AtomicInteger): Gen[Q] =
    if (depth == 0) genScan(ctr)
    else Gen.chooseNum(0, 4).flatMap {
      case 0 => genScan(ctr)
      case 1 => genQ(depth - 1, ctr).flatMap(genProject(_, ctr))
      case 2 => genQ(depth - 1, ctr).flatMap(genFilter(_, ctr))
      case 3 => for {
        l <- genQ(depth - 1, ctr); r <- genQ(depth - 1, ctr)
        j <- genJoin(l, r, ctr)
      } yield j
      case _ => for {
        l <- genQ(depth - 1, ctr); r <- genQ(depth - 1, ctr)
        u <- genUnion(l, r, ctr)
      } yield u
    }

  test("edges match the generator's own source predictions, 60 trees") {
    val trees = (0 until 60).flatMap { i =>
      genQ(3, new AtomicInteger(1000 * i))
        .apply(Gen.Parameters.default, Seed(7L * i + 1))
    }
    assert(trees.size >= 50, s"generator drought: ${trees.size}")
    trees.foreach { q =>
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
}
