package graft.lineage

import graft.SparkTestBase

/** MODEL-BASED check for the READ-LOG tier (r19): random sequences of
  * flush / compactReads / vacuumReads driven against an independent
  * in-memory row multiset. The invariants are crisp — consolidation
  * is INVISIBLE (any interleaving of compactReads leaves the rows
  * identical) and retention is exactly a timestamp filter (whole-unit
  * footer-stat drops and straddler rewrites must compose to the same
  * rows a plain `ts >= cutoff` filter keeps). Timestamps sit on
  * day-grain points and cutoffs on half-day offsets, so the wall
  * clock moving between the library's `currentTimeMillis` and the
  * model's cannot flip a classification. Deterministic seeds. */
class ReadLogModelSpec extends SparkTestBase {

  private case class R(session: String, action: Int, table: String,
                       col: String, ts: Long)

  for (seed <- Seq(20260816L, 7L, 4242L))
  test(s"read-log op sequences agree with the in-memory model (seed $seed)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_readlog_model").toString
    val rnd = new scala.util.Random(seed)
    val day = 86400L * 1000
    var model = Vector.empty[R]
    var nextAction = 1
    def logRows() = LineageStore.readLog(spark, dir)
      .collect().map(r => R(r.getString(0), r.getInt(1),
        r.getString(2), r.getString(3), r.getLong(4)))
    def check(step: String): Unit = {
      val got = logRows().groupBy(identity).view.mapValues(_.length)
      val want = model.groupBy(identity).view.mapValues(_.length)
      assert(got.toMap == want.toMap,
        s"[$step] log diverged from model: got ${got.size} distinct, " +
          s"want ${want.size}")
    }
    try {
      for (step <- 1 to 20) {
        val now = System.currentTimeMillis()
        rnd.nextInt(6) match {
          case 0 | 1 | 2 => // flush a batch of 1-4 rows, ts 0-9 days old
            val rows = (1 to 1 + rnd.nextInt(4)).map { _ =>
              val a = nextAction; nextAction += 1
              R(s"s$seed", a, s"db.t${rnd.nextInt(4)}",
                s"c${rnd.nextInt(3)}",
                now - rnd.nextInt(10).toLong * day)
            }
            import spark.implicits._
            LineageStore.appendReads(spark, dir,
              rows.map(r => (r.session, r.action, r.table, r.col, r.ts))
                .toDF("session", "action", "table_name", "column_read",
                  "ts_ms"))
            model ++= rows
          case 3 | 4 => // consolidation is invisible at any threshold,
            // with or without grace-deferred cleanup (r20: consumed
            // flush dirs LINGER behind markers, carried forward in the
            // manifest so they are excluded, never double-read)
            LineageStore.compactReads(spark, dir,
              maxSegments = 1 + rnd.nextInt(3),
              cleanupGraceMs =
                if (rnd.nextBoolean()) 0L else 3600L * 1000)
          case _ => // retention = a plain ts filter (half-day cutoffs)
            val window = rnd.nextInt(19).toLong * day / 2 + day / 2
            LineageStore.vacuumReads(spark, dir, olderThanMs = window,
              cleanupGraceMs =
                if (rnd.nextBoolean()) 0L else 3600L * 1000)
            val cutoff = now - window
            model = model.filter(_.ts >= cutoff)
        }
        check(s"step $step")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
