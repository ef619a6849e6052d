package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** MODEL-BASED store check (r18): a random sequence of store
  * operations — claim, append (claimed / explicit / zero-edge),
  * compact, vacuum, purge — driven against an independent in-memory
  * model of what the store MUST contain, with every read path
  * (runs, runStats, read, snapshot, runTaken/runVisible) compared to
  * the model after every step. The single-behavior specs pin each
  * operation alone; this spec pressures their INTERACTIONS — the
  * territory where r18's review found its races (claim-only folds,
  * mid-write stamps, shared committer dirs). Deterministic seed.
  *
  * Model:
  *  - `committed`: run id → its edge rows (empty seq = zero-edge run)
  *  - `claimed`: ids reserved but not yet appended
  *  - `vacuumed`: tombstoned ids (invisible to every read, data kept)
  *  - `folded`: ids living in compacted segments (from compact's own
  *    return value — the model checks the VISIBLE semantics, which
  *    must not change across the fold)
  */
class LineageStoreModelSpec extends SparkTestBase {

  private case class Model(
      committed: Map[Long, Seq[(Int, String)]] = Map.empty,
      claimed: Set[Long] = Set.empty,
      vacuumed: Set[Long] = Set.empty,
      folded: Set[Long] = Set.empty,
      // claim-only ids vacuumClaims folded into the manifest — the
      // RESERVATION survives (still registered/listed), only the
      // directory goes, so every read-path expectation is unchanged
      reclaimedClaims: Set[Long] = Set.empty) {
    /** Runs every read path may see. */
    def visible: Map[Long, Seq[(Int, String)]] =
      committed.filterNot { case (id, _) => vacuumed(id) }
    /** Latest-wins per statement over the visible runs. */
    def snapshot: Set[(Long, Int, String)] = {
      val latest = visible.toSeq
        .flatMap { case (id, es) => es.map(e => (e._1, id)) }
        .groupBy(_._1).map { case (stmt, xs) => stmt -> xs.map(_._2).max }
      visible.toSeq.flatMap { case (id, es) =>
        es.collect { case (stmt, from) if latest(stmt) == id =>
          (id, stmt, from) }
      }.toSet
    }
    /** What runs()/runTaken must report: everything not purged. */
    def registered: Set[Long] = committed.keySet ++ claimed
    def listed: Set[Long] = registered -- vacuumed
    /** Fully-superseded, data-bearing, still-partition-resident runs
      * — vacuum's exact expected return. */
    def vacuumable: Seq[Long] = visible.toSeq
      .filter { case (id, es) => es.nonEmpty && !folded(id) }
      .filter { case (id, es) =>
        es.map(_._1).distinct.forall { stmt =>
          visible.exists { case (id2, es2) =>
            id2 > id && es2.exists(_._1 == stmt) }
        }
      }.map(_._1).sorted
  }

  private def edgeFrame(rows: Seq[(Int, String)]) = {
    import spark.implicits._
    rows.map { case (stmt, from) =>
      LineageEdge(stmt, "SELECT", "<EOF>", "", s"c$stmt", from, "")
    }.toDF()
  }

  private def checkAll(dir: String, m: Model, step: String): Unit = {
    assert(LineageStore.runs(spark, dir).toSet == m.listed,
      s"[$step] runs() diverged from model")
    val (count, latest) = LineageStore.runStats(spark, dir)
    assert(count == m.listed.size,
      s"[$step] runStats count $count != ${m.listed.size}")
    assert(latest == (if (m.listed.isEmpty) 0L else m.listed.max),
      s"[$step] runStats latest")
    val got = LineageStore.read(spark, dir)
      .select("run_id", "stmt", "from_name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val want = m.visible.toSeq.flatMap { case (id, es) =>
      es.map(e => (id, e._1, e._2)) }.toSet
    assert(got == want, s"[$step] read() diverged:\n got $got\nwant $want")
    val snap = LineageStore.snapshot(spark, dir)
      .select("run_id", "stmt", "from_name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(snap == m.snapshot, s"[$step] snapshot diverged")
    // membership views: every registered id is taken; listed ids with
    // data or a segment home are visible
    m.registered.foreach { id =>
      assert(LineageStore.runTaken(spark, dir, id), s"[$step] taken $id")
    }
    assert(!LineageStore.runTaken(spark, dir,
      (m.registered + 0L).max + 1000), s"[$step] phantom taken")
  }

  for (seed <- Seq(20260816L, 77L, 4242L))
  test(s"random op sequences agree with the in-memory model (seed $seed)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_store_model").toString
    val rnd = new scala.util.Random(seed)
    var m = Model()
    val stmts = 1 to 5 // small pool → supersession happens often
    try {
      for (step <- 1 to 30) {
        val op = rnd.nextInt(12)
        if (op <= 3) { // claimed append (sometimes zero-edge)
          val id = LineageStore.claimRun(spark, dir)
          assert(!m.registered(id), s"[$step] claim reused id $id")
          assert(m.registered.forall(_ < id), s"[$step] claim not max")
          val k = rnd.nextInt(4) // 0 = zero-edge
          val rows = Seq.fill(k)(
            (stmts(rnd.nextInt(stmts.size)), s"db.t.x$step"))
          LineageStore.append(spark, dir, id, edgeFrame(rows))
          m = m.copy(committed = m.committed + (id -> rows))
        } else if (op == 4) { // claim left dangling (crashed writer)
          val id = LineageStore.claimRun(spark, dir)
          m = m.copy(claimed = m.claimed + id)
        } else if (op == 5) { // explicit append at a fresh high id
          val id = (m.registered + 0L).max + 1 + rnd.nextInt(3)
          if (!m.registered(id)) {
            val rows = Seq(
              (stmts(rnd.nextInt(stmts.size)), s"db.t.e$step"))
            LineageStore.append(spark, dir, id, edgeFrame(rows))
            m = m.copy(committed = m.committed + (id -> rows))
          }
        } else if (op == 6) { // double-append must always be refused
          if (m.committed.nonEmpty) {
            val id = m.committed.keys.toSeq(
              rnd.nextInt(m.committed.size))
            intercept[IllegalArgumentException] {
              LineageStore.append(spark, dir, id,
                edgeFrame(Seq((1, "db.t.dup"))))
            }
          }
        } else if (op == 7) { // compact: visible semantics unchanged
          if (m.registered.nonEmpty) {
            val upTo = m.registered.toSeq(rnd.nextInt(m.registered.size))
            // random merge threshold (r19): tiered segment creation
            // and smallest-first merging must both be invisible to
            // every read path — maxSegments=1 exercises the old
            // everything-into-one shape, 2-3 force mid-store merges.
            // Random cleanup grace (r20): deferred deletion leaves
            // folded partitions and merged segments LINGERING behind
            // retirement markers — also invisible to every read path.
            val folded = LineageStore.compact(spark, dir, upTo,
              maxSegments = 1 + rnd.nextInt(3),
              cleanupGraceMs =
                if (rnd.nextBoolean()) 0L else 3600L * 1000)
            // only committed, non-vacuumed, not-already-folded,
            // non-claim runs ≤ upTo may fold
            folded.foreach { id =>
              assert(m.committed.contains(id) && id <= upTo &&
                !m.vacuumed(id) && !m.folded(id) && !m.claimed(id),
                s"[$step] compact folded unexpected $id")
            }
            m = m.copy(folded = m.folded ++ folded)
          }
        } else if (op == 8) { // vacuum: exactly the model's prediction
          val dead = LineageStore.vacuum(spark, dir)
          assert(dead == m.vacuumable,
            s"[$step] vacuum $dead != model ${m.vacuumable}")
          m = m.copy(vacuumed = m.vacuumed ++ dead)
        } else if (op == 9) { // purge: tombstoned partitions leave
          // explicit zero grace — the DEFAULT is a conservative
          // non-zero window (ADVICE r19 #2) under which a just-written
          // tombstone would survive
          val purged = LineageStore.purgeVacuumed(spark, dir,
            graceMs = 0L)
          val ids = purged.map(_.stripPrefix("run_id=").toLong).toSet
          assert(ids == m.vacuumed,
            s"[$step] purge $ids != model ${m.vacuumed}")
          m = m.copy(
            committed = m.committed -- ids,
            vacuumed = m.vacuumed -- ids)
        } else if (op == 10) { // vacuumClaims: orphan reservations fold
          // negative window: every dangling claim is "stale" without
          // sleeping for mtime granularity; the read paths must not
          // move an inch (the ids stay registered via the manifest)
          val got = LineageStore.vacuumClaims(spark, dir,
            olderThanMs = -1000L)
          val want = (m.claimed -- m.reclaimedClaims).toSeq.sorted
          assert(got == want,
            s"[$step] vacuumClaims $got != model $want")
          m = m.copy(reclaimedClaims = m.reclaimedClaims ++ got)
        } else { // contract migration with the identity rewrite
          // simulate a library version bump landing on this store:
          // forge the stamp back to v0 (CRC sidecar first — local FS
          // would trip Hadoop's checksum on the out-of-band rewrite),
          // then migrate; every read path must survive the full
          // partition+segment rewrite byte-for-byte
          val stamp = java.nio.file.Paths.get(dir, "_schema_version")
          if (java.nio.file.Files.exists(stamp)) {
            java.nio.file.Files.deleteIfExists(
              java.nio.file.Paths.get(dir, "._schema_version.crc"))
            java.nio.file.Files.write(stamp, "0".getBytes("UTF-8"))
          }
          if (rnd.nextBoolean()) {
            // half the time the maintainer CRASHES on a random unit:
            // `_migrating` stays down, the rewrite stays registered in
            // this JVM — every read path must STILL match the model
            // through the mid-migration serve, and the resume must
            // finish without double-rewriting
            val dieAt = 1 + rnd.nextInt(3)
            val calls = new java.util.concurrent.atomic.AtomicInteger(0)
            try LineageStore.migrate(spark, dir, fromVersion = 0,
              df => {
                if (calls.incrementAndGet() == dieAt)
                  throw new RuntimeException("model maintainer died")
                df
              })
            catch { case _: RuntimeException => () }
            checkAll(dir, m, s"step $step mid-migration serve")
          }
          LineageStore.migrate(spark, dir, fromVersion = 0, df => df)
        }
        checkAll(dir, m, s"step $step op $op")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("concurrent maintenance keeps rows, ids, and snapshot intact") {
    // the model above is sequential by construction; this arm races
    // two MAINTAINERS (the r19 verdict's committed-data-loss
    // interleaving) and checks the one invariant every schedule must
    // uphold under the `_maintain` lease: nothing committed ever
    // disappears, whichever maintainer wins each round.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_store_model_conc").toString
    try {
      val all = (1 to 12).map(i => (i.toLong, i, s"db.t.x$i"))
      all.foreach { case (id, stmt, from) =>
        LineageStore.append(spark, dir, id,
          edgeFrame(Seq((stmt, from))))
      }
      for (round <- 1 to 4) {
        val gate = new java.util.concurrent.CyclicBarrier(2)
        val ops: Seq[() => Any] = Seq(
          () => LineageStore.compact(spark, dir,
            upToRun = (round * 3).toLong, maxSegments = 2),
          () =>
            if (round % 2 == 0)
              LineageStore.vacuumClaims(spark, dir, -1000L)
            else LineageStore.compact(spark, dir,
              upToRun = (round * 3 + 1).toLong, maxSegments = 2))
        val threads = ops.map(op => new Thread(() => {
          gate.await()
          try { op(); () }
          catch { case _: MaintenanceBusyException => () }
        }))
        threads.foreach(_.start())
        threads.foreach(_.join())
        val got = LineageStore.read(spark, dir)
          .select("run_id", "stmt", "from_name").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
        assert(got == all.toSet, s"[round $round] rows diverged")
        assert(LineageStore.runs(spark, dir) == (1L to 12L),
          s"[round $round] ids diverged")
        assert(LineageStore.snapshot(spark, dir).count() == 12,
          s"[round $round] snapshot diverged")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
