package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-12 hardening: keySkew's NULL-key tie-break pinned to
  * NULLS LAST (the cross-engine total order), cusumShift's non-finite
  * metric exclusion. */
class Round12OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("keySkew: NULL key ties order NULLS LAST, matching the oracle") {
    // sizes: a=5, b=3, c=3, NULL=3 — three keys tie at n=3 and the
    // NULL must sort AFTER b and c (Spark's bare asc would put it
    // first, diverging from DuckDB's NULLS LAST default).
    val df = (Seq.fill(5)(Option("a")) ++ Seq.fill(3)(Option("b")) ++
      Seq.fill(3)(Option("c")) ++ Seq.fill(3)(Option.empty[String]))
      .toDF("k")
    val top2 = DataQuality.keySkew(df, "k", topK = 2).collect()
    assert(top2.map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("a"), Some("b")))
    val all = DataQuality.keySkew(df, "k", topK = 4).collect()
    assert(all.map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("a"), Some("b"), Some("c"), None))
    assert(all.map(_.getAs[Long]("rank")).toSeq == (1L to 4L))
    // the NULL key is a first-class audit row: count and share real
    val nullRow = all.last
    assert(nullRow.getAs[Long]("n") == 3L)
    assert(nullRow.getAs[Long]("share_permille") == 1000L * 3 / 14)
    assert(all.head.getAs[Long]("n_keys") == 4L)
    assert(all.head.getAs[Long]("n_rows") == 14L)
  }

  test("cusumShift: NaN/Inf/NULL metrics are excluded and counted") {
    val df = Seq(
      ("a", 10L, 1L, Option(2.0)),
      ("a", 20L, 2L, Option(Double.NaN)),
      ("a", 30L, 3L, Option(3.0)),
      ("a", 40L, 4L, Option(Double.PositiveInfinity)),
      ("a", 50L, 5L, Option(4.0)),
      ("a", 60L, 6L, Option.empty[Double]))
      .toDF("g", "tsec", "id", "v")
      .withColumn("ts", col("tsec").cast("timestamp"))
    val r = Stats.cusumShift(df, "g", "ts", "id", "v",
      driftCents = 100L, thresholdCents = 300L).collect().head
    // finite d: 100, 200, 300 -> prefix 100, 300, 600 = S (no dips)
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("n_excluded") == 3L)
    assert(r.getAs[Long]("n_alarms") == 2L)
    assert(r.getAs[Long]("max_s_cents") == 600L)
    assert(r.getAs[Long]("first_alarm_us") == 30L * 1000000L)
  }

  test("minHashLsh over a subset == full-corpus pairs restricted (artifact reuse)") {
    // The funnel queries reuse the full-corpus pair artifact by
    // semi-joining both endpoints to their stage corpus. That is exact
    // only because signatures/band keys are per-document and the
    // Jaccard verify is per-pair — prove it on the real fixture.
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val sub = docs.filter(col("doc_id") % 3 =!= 0)
    val direct = Dedup.minHashLsh(sub, "doc_id", "text",
      shingleN = 2, k = 24, bands = 4, rows = 6, threshold = 0.8)
    val full = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleN = 2, k = 24, bands = 4, rows = 6, threshold = 0.8)
    // compare COLLECTED bit-level sets: both frames share the same
    // source exprIds, and except() over such sibling plans mis-plans
    // the anti-join (observed: every matching row reported missing)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toSet
    val subIds = sub.select("doc_id").collect().map(_.getLong(0)).toSet
    val restricted = pairSet(full).filter(p =>
      subIds(p._1) && subIds(p._2))
    val d = pairSet(direct)
    assert(d.nonEmpty, "vacuous fixture: no pairs in the subset")
    assert(d == restricted)
  }

  test("cusumShift: an all-non-finite series is absent, like all-NULL") {
    val df = Seq(("a", 10L, 1L, Double.NaN),
      ("a", 20L, 2L, Double.NegativeInfinity))
      .toDF("g", "tsec", "id", "v")
      .withColumn("ts", col("tsec").cast("timestamp"))
    assert(Stats.cusumShift(df, "g", "ts", "id", "v", 0L, 1L)
      .collect().isEmpty)
  }
}
