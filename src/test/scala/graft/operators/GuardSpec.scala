package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The round-8 operators' input-contract guards: every `require` that
  * protects a semantic assumption must FIRE, with a message naming the
  * violated constraint — a misconfigured call at 100 TB should die at
  * plan-construction time, not produce a silently wrong answer hours
  * later. */
class GuardSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = Seq((1L, "a b c")).toDF("doc_id", "text")

  test("phraseSearch rejects single-token phrases") {
    val e = intercept[IllegalArgumentException] {
      Search.phraseSearch(docs, "doc_id", "text", Seq("a"), 5)
    }
    assert(e.getMessage.contains("two tokens"))
  }

  test("paddingAudit rejects unsorted, duplicate, or non-positive ladders") {
    for (bad <- Seq(Seq(8L, 4L), Seq(4L, 4L, 8L), Seq(0L, 4L), Seq.empty[Long])) {
      intercept[IllegalArgumentException] {
        Curation.paddingAudit(docs, "text", bad)
      }
    }
  }

  test("thresholdSweep and contaminationSweep reject malformed knob lists") {
    intercept[IllegalArgumentException] {
      Dedup.thresholdSweep(docs, "doc_id", "text", 2, 24, 4, 6,
        Seq(900L, 800L))
    }
    intercept[IllegalArgumentException] {
      Curation.contaminationSweep(docs, "doc_id", "text",
        col("doc_id") % 2 === 0, Seq(3, 2))
    }
  }

  test("zoneBloomAudit rejects bad filter geometry and empty probes") {
    val rows = Seq((0L, "a")).toDF("z", "v")
    intercept[IllegalArgumentException] {
      Layout.zoneBloomAudit(rows, col("z"), "v", Seq("a"), bits = 33)
    }
    intercept[IllegalArgumentException] {
      Layout.zoneBloomAudit(rows, col("z"), "v", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Layout.zoneBloomAudit(rows, col("z"), "v", Seq("a"), kHash = 17)
    }
  }

  test("interArrivalBurstiness and concurrencySweep hold their NULL contracts") {
    // burstiness: minGaps filters thin users rather than emitting noise
    val ev = Seq((1L, 1L, new java.sql.Timestamp(1000L)),
      (2L, 1L, new java.sql.Timestamp(2000L)))
      .toDF("event_id", "user_id", "ts")
    assert(Events.interArrivalBurstiness(ev, "user_id", "ts",
      minGaps = 5, k = 10).count() == 0)
    // sweep: an all-NULL interval set yields an empty report, not a crash
    val iv = Seq((1L, Option.empty[Long], Option.empty[Long]))
      .toDF("id", "s", "e")
    assert(Events.concurrencySweep(iv, "s", "e").count() == 0)
  }

  test("joinAmplification audits string keys natively after the r8 fix") {
    val l = Seq("x", "x", "y", "01").toDF("k")
    val r = Seq("x", "1").toDF("k")
    val got = Layout.joinAmplification(l, "k", r, "k", 10)
      .collect().map(x => (x.getString(0), x.getLong(3))).toMap
    // string keys survive untouched: "x" amplifies 2x1, and "01" never
    // merges with "1" the way a numeric cast would have merged them
    assert(got == Map("x" -> 2L))
  }
}
