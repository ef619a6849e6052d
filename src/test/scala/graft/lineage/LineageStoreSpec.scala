package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[LineageStore]] semantics over a synthetic three-run store: runs
  * are immutable appends, the snapshot is latest-wins PER STATEMENT
  * (not per store), the diff is scoped to the newer run's statements,
  * and per-run reads prune to one partition directory. */
class LineageStoreSpec extends SparkTestBase {

  private def edge(stmt: Int, to: String, from: String,
                   conds: String = ""): LineageEdge =
    LineageEdge(stmt, "SELECT", "<EOF>", "", to, from, conds)

  private def frame(edges: LineageEdge*) = {
    import spark.implicits._
    edges.toDF()
  }

  private def withStore(f: String => Unit): Unit = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_store_spec").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("snapshot is latest-wins per statement across partial runs") {
    withStore { dir =>
      // run 1: stmts 1,2,3 — run 2 re-parses stmt 2 only — run 3
      // re-parses stmts 1,3 (overlapping neither-superset scopes)
      LineageStore.append(spark, dir, 1L, frame(
        edge(1, "a", "db.t.x"), edge(2, "b", "db.t.y"),
        edge(3, "c", "db.t.z")))
      LineageStore.append(spark, dir, 2L, frame(
        edge(2, "b", "db.t.y2")))
      LineageStore.append(spark, dir, 3L, frame(
        edge(1, "a", "db.t.x3"), edge(3, "c", "db.t.z3"),
        edge(3, "c2", "db.t.w")))
      assert(LineageStore.runs(spark, dir) == Seq(1L, 2L, 3L))
      val snap = LineageStore.snapshot(spark, dir)
        .select("run_id", "stmt", "to_name", "from_name")
        .collect().map(r => (r.getLong(0), r.getInt(1),
          r.getString(2), r.getString(3))).toSet
      assert(snap == Set(
        (3L, 1, "a", "db.t.x3"),
        (2L, 2, "b", "db.t.y2"),
        (3L, 3, "c", "db.t.z3"), (3L, 3, "c2", "db.t.w")))
      // time travel: as of run 2 the graph is run 1's stmts 1,3 plus
      // run 2's stmt 2 — run 3 never happened yet
      val asOf2 = LineageStore.snapshot(spark, dir, asOf = Some(2L))
        .select("run_id", "stmt", "to_name", "from_name")
        .collect().map(r => (r.getLong(0), r.getInt(1),
          r.getString(2), r.getString(3))).toSet
      assert(asOf2 == Set(
        (1L, 1, "a", "db.t.x"),
        (2L, 2, "b", "db.t.y2"),
        (1L, 3, "c", "db.t.z")))
    }
  }

  test("append refuses an already-present run id") {
    withStore { dir =>
      LineageStore.append(spark, dir, 1L, frame(edge(1, "a", "db.t.x")))
      intercept[IllegalArgumentException] {
        LineageStore.append(spark, dir, 1L, frame(edge(1, "a", "db.t.x")))
      }
    }
  }

  test("stores are version-stamped; a foreign contract fails by name") {
    withStore { dir =>
      LineageStore.append(spark, dir, 1L, frame(edge(1, "a", "db.t.x")))
      // the stamp lives on the store's own (Hadoop) filesystem — read
      // and tamper through it, like a real HDFS/S3 deployment would
      val p = new org.apache.hadoop.fs.Path(dir, "_schema_version")
      val hfs = p.getFileSystem(spark.sessionState.newHadoopConf())
      def readStamp(): String = {
        val in = hfs.open(p)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      def writeStamp(v: String): Unit = {
        val out = hfs.create(p, true)
        try out.write(v.getBytes("UTF-8")) finally out.close()
      }
      assert(readStamp() == LineageEdgeSchema.Version.toString)
      // a store written under a future contract refuses this library
      writeStamp("99")
      val e = intercept[IllegalArgumentException] {
        LineageStore.append(spark, dir, 2L, frame(edge(1, "b", "db.t.y")))
      }
      assert(e.getMessage.contains("v99"))
      // the stamp survives vacuum (it lives beside the partitions)
      writeStamp(LineageEdgeSchema.Version.toString)
      LineageStore.append(spark, dir, 2L, frame(edge(1, "b", "db.t.y")))
      LineageStore.vacuum(spark, dir)
      assert(hfs.exists(p))
    }
  }

  test("diff is scoped to the newer run's statements and is set algebra") {
    withStore { dir =>
      LineageStore.append(spark, dir, 1L, frame(
        edge(1, "a", "db.t.x"), edge(1, "gone", "db.t.g"),
        edge(2, "untouched", "db.t.u")))
      // run 2 re-parses stmt 1 only: keeps a, drops gone, adds a CTRL
      // twin of a (same names, different conditions — the case q192's
      // keyed rowDiff cannot represent)
      LineageStore.append(spark, dir, 2L, frame(
        edge(1, "a", "db.t.x"),
        edge(1, "a", "db.t.c", "CTRL:WHERE:(t.c > 0)")))
      val d = LineageStore.diff(spark, dir, 1L, 2L)
        .select("stmt", "to_name", "from_name", "change")
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getString(3))).toSet
      // stmt 2 (outside run 2's scope) emits NOTHING — a partial
      // re-parse must not read as mass removal
      assert(d == Set(
        (1, "gone", "db.t.g", "removed"),
        (1, "a", "db.t.c", "added")))
    }
  }

  test("vacuum removes exactly the fully-superseded runs; snapshot unchanged") {
    withStore { dir =>
      // run 1 {1,2} fully re-parsed by runs 2+3; run 2 {1} superseded
      // by run 3; run 3 {1} and run 4 {2} are each some stmt's latest
      LineageStore.append(spark, dir, 1L, frame(
        edge(1, "a", "db.t.x"), edge(2, "b", "db.t.y")))
      LineageStore.append(spark, dir, 2L, frame(edge(1, "a", "db.t.x2")))
      LineageStore.append(spark, dir, 3L, frame(edge(1, "a", "db.t.x3")))
      LineageStore.append(spark, dir, 4L, frame(edge(2, "b", "db.t.y4")))
      assert(LineageStore.supersededRuns(spark, dir) == Seq(1L, 2L))
      def snap() = LineageStore.snapshot(spark, dir)
        .select("run_id", "stmt", "from_name")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSet
      val before = snap()
      assert(LineageStore.vacuum(spark, dir) == Seq(1L, 2L))
      assert(LineageStore.runs(spark, dir) == Seq(3L, 4L))
      assert(snap() == before)
      assert(before == Set((3L, 1, "db.t.x3"), (4L, 2, "db.t.y4")))
      // vacuum is idempotent: nothing left to remove
      assert(LineageStore.vacuum(spark, dir).isEmpty)
    }
  }

  test("a per-run read prunes to that run's partition") {
    withStore { dir =>
      LineageStore.append(spark, dir, 1L, frame(edge(1, "a", "db.t.x")))
      LineageStore.append(spark, dir, 2L, frame(edge(1, "a", "db.t.y")))
      val one = LineageStore.read(spark, dir)
        .filter(col("run_id") === 2L)
      // partition pruning: the scan's selected partitions drop run 1
      val scan = one.queryExecution.executedPlan.collectLeaves().head
        .toString
      assert(scan.contains("run_id"), scan)
      assert(one.select("from_name").collect().map(_.getString(0))
        .toSeq == Seq("db.t.y"))
    }
  }
}
