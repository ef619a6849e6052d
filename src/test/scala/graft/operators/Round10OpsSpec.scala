package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-10 operators: target-mixture resample (water-filling),
  * calibration reliability bins. */
class Round10OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("calibrationBins: hand-computed deciles, full domain, s=1.0 edge") {
    // scores 0.05 (y=0), 0.05 (y=1), 0.55 (y=1), 1.0 (y=1):
    // bin0: n=2, pos=1, mean=50, rate=500, gap=-450
    // bin5: n=1, pos=1, mean=550, rate=1000, gap=-450
    // bin9: n=1 (the 1.0 edge), pos=1, mean=1000, rate=1000, gap=0
    val df = Seq((0.05, 0L), (0.05, 1L), (0.55, 1L), (1.0, 1L))
      .toDF("s", "y")
    val r = Stats.calibrationBins(df, "s", "y", nBins = 10)
      .orderBy("bin").collect()
    assert(r.length == 10)
    def row(b: Int) = r(b)
    assert(row(0).getAs[Long]("n") == 2 &&
      row(0).getAs[Long]("mean_score_milli") == 50 &&
      row(0).getAs[Long]("rate_milli") == 500 &&
      row(0).getAs[Long]("gap_milli") == -450)
    assert(row(5).getAs[Long]("n") == 1 &&
      row(5).getAs[Long]("mean_score_milli") == 550)
    assert(row(9).getAs[Long]("n") == 1 &&
      row(9).getAs[Long]("rate_milli") == 1000)
    // empty deciles report with NULL rates, not absence
    assert(row(3).getAs[Long]("n") == 0 &&
      row(3).isNullAt(row(3).fieldIndex("rate_milli")))
    assert(r.forall(_.getAs[Long]("n_excluded") == 0))
  }

  test("calibrationBins: NULL / out-of-range rows land in n_excluded") {
    val df = Seq((Some(0.5), Some(1L)), (None, Some(0L)),
      (Some(1.5), Some(1L)), (Some(0.5), None)).toDF("s", "y")
    val r = Stats.calibrationBins(df, "s", "y", nBins = 10)
      .orderBy("bin").collect()
    // one valid row, three excluded; sum(n) + n_excluded == input rows
    assert(r.map(_.getAs[Long]("n")).sum == 1)
    assert(r.forall(_.getAs[Long]("n_excluded") == 3))
  }

  private def rows(src: String, n: Int, base: Int) =
    (0 until n).map(i => (base + i.toLong, src))

  test("artifactBacked names resolve to real queries (retime-flag guard)") {
    // A typo here would silently un-flag a cache-backed retime, which
    // is exactly the misreading the flag exists to prevent.
    val known = graft.SparkEntry.queries.keySet
    val unknown = (graft.queries.PipelineQueries.artifactBacked.keySet ++
      graft.queries.StreamingQueries.artifactBacked.keySet)
      .filterNot(known)
    assert(unknown.isEmpty, s"artifactBacked names not in queries: $unknown")
  }

  test("scanCostSweep: hand-computed cluster costs, self excluded") {
    // Two well-separated clusters: 4 vectors near (1,0), 2 near (0,1).
    // Query 0 lives in the big cluster: nprobe=1 scans its own cluster
    // (4 members minus self = 3); nprobe=2 scans everything (6-1 = 5).
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.98f, 0.02f)), (3L, Array(0.97f, 0.03f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.01f, 0.99f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(10000L, 0L)), (1L, Seq(0L, 10000L)))
      .toDF("cluster", "centroid")
    val r = Similarity.scanCostSweep(rows, cents, Seq(0L),
      "vec_id", "embedding", maxNprobe = 2)
      .orderBy("nprobe").collect()
    assert(r.map(x => (x.getAs[Long]("nprobe"), x.getAs[Long]("n_scanned"),
      x.getAs[Long]("n_brute"))).toSeq ==
      Seq((1L, 3L, 5L), (2L, 5L, 5L)))
    assert(r.last.getAs[Long]("scan_permille") == 1000L)
  }

  test("kFoldAudit: full domain, counts conserve, shares bounded") {
    val df = (0 until 97).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "lang")
    val r = Curation.kFoldAudit(df, "lang", "id", k = 4)
      .orderBy("lang", "fold").collect()
    assert(r.length == 8) // 2 strata x 4 folds, even if a fold is empty
    val byLang = r.groupBy(_.getString(0))
    assert(byLang("a").map(_.getAs[Long]("n")).sum == 33)
    assert(byLang("b").map(_.getAs[Long]("n")).sum == 64)
    r.foreach { row =>
      val (mn, mx) = (row.getAs[Long]("stratum_min_milli"),
        row.getAs[Long]("stratum_max_milli"))
      assert(mn <= row.getAs[Long]("share_milli") &&
        row.getAs[Long]("share_milli") <= mx)
    }
    // min/max constant within a stratum
    byLang.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("stratum_min_milli")).distinct.length == 1)
      assert(rows.map(_.getAs[Long]("stratum_max_milli")).distinct.length == 1)
    }
  }

  test("mixtureResample: scarcest domain binds, quotas honor shares") {
    // a has 30 docs, b has 10; target 500/500 → T bound by b:
    // T = 10*1000/500 = 20; quota_a = quota_b = 10
    val df = (rows("a", 30, 0) ++ rows("b", 10, 100)).toDF("id", "src")
    val r = Curation.mixtureResample(df, "src", "id",
      Seq("a" -> 500L, "b" -> 500L)).orderBy("src").collect()
    assert(r.map(x => (x.getString(0), x.getAs[Long]("n_before"),
      x.getAs[Long]("quota"), x.getAs[Long]("n_kept"))).toSeq ==
      Seq(("a", 30L, 10L, 10L), ("b", 10L, 10L, 10L)))
  }

  test("mixtureResample: absent target domain makes the mixture infeasible") {
    val df = rows("a", 30, 0).toDF("id", "src")
    val r = Curation.mixtureResample(df, "src", "id",
      Seq("a" -> 500L, "ghost" -> 500L)).orderBy("src").collect()
    // ghost has n=0 → T=0 → every quota 0, nothing kept — reported
    assert(r.length == 2)
    assert(r.forall(x => x.getAs[Long]("quota") == 0L &&
      x.getAs[Long]("n_kept") == 0L))
    assert(r.map(_.getAs[Long]("n_before")).sum == 30L)
  }

  test("mixtureResample: untargeted domains keep nothing, selection deterministic") {
    val df = (rows("a", 20, 0) ++ rows("b", 20, 100) ++
      rows("junk", 50, 1000)).toDF("id", "src")
    val out = Curation.mixtureResample(df, "src", "id",
      Seq("a" -> 600L, "b" -> 400L))
    assert(!out.collect().map(_.getString(0)).contains("junk"))
    // deterministic: same input → same kept_id_sum
    val s1 = out.orderBy("src").collect().map(_.getAs[Long]("kept_id_sum"))
    val s2 = Curation.mixtureResample(df, "src", "id",
      Seq("a" -> 600L, "b" -> 400L))
      .orderBy("src").collect().map(_.getAs[Long]("kept_id_sum"))
    assert(s1.toSeq == s2.toSeq)
    // realized mixture: T = min(20*1000/600, 20*1000/400) = 33;
    // quotas 19 (600*33 div 1000) and 13 (400*33 div 1000)
    val quotas = out.orderBy("src").collect().map(_.getAs[Long]("quota"))
    assert(quotas.toSeq == Seq(19L, 13L))
  }
}
