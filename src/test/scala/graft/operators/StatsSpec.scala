package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Stats.exactMedian]] — the two-phase selection must agree exactly
  * with the naive single-window rank pick on every input shape: odd and
  * even group sizes, heavy ties, single-value groups, and tiny bucket
  * counts that force multi-bucket spill of the target ranks.
  */
class StatsSpec extends SparkTestBase {

  import spark.implicits._

  /** Reference implementation: whole-group window sort (the plan shape
    * exactMedian exists to avoid, but trivially correct). */
  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("g").orderBy("x")
    val wn = Window.partitionBy("g")
    df.select(col("g"), col("x").cast("double").as("x"))
      .select(col("g"), col("x"),
        row_number().over(w).as("rn"), count(lit(1)).over(wn).as("n"))
      .filter(col("rn") === expr("(n+1) div 2") || col("rn") === expr("(n+2) div 2"))
      .groupBy("g")
      .agg(avg("x").as("median_value"), max("n").as("n_events"))
  }

  private def check(rows: Seq[(String, Double)], buckets: Int): Unit = {
    val df = rows.toDF("g", "x")
    val got = Stats.exactMedian(df, "g", "x", buckets)
    val want = naive(df)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("matches the naive median on odd/even groups and ties") {
    // deterministic pseudo-random values, some groups even, some odd
    val rows = (0 until 501).map { i =>
      (s"g${i % 7}", ((i * 2654435761L) % 1000) / 10.0)
    }
    check(rows, buckets = 64)
  }

  test("single-value groups (hi == lo) collapse to one bucket") {
    check(Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 1.0)), buckets = 16)
  }

  test("tiny bucket count still selects the exact ranks") {
    val rows = (1 to 100).map(i => ("g", i.toDouble))
    check(rows, buckets = 2) // median straddles bucket boundaries
  }

  test("heavy ties at the median value") {
    val rows = Seq.fill(50)(("g", 3.0)) ++ Seq.fill(25)(("g", 1.0)) ++
      Seq.fill(25)(("g", 9.0))
    check(rows, buckets = 8)
  }

  test("null/NaN/infinite values are excluded, not corrupting") {
    // A NaN max would poison every bucket id of group "g" if it reached
    // phase 1; the finite-filter must instead yield the median of the
    // remaining finite values.
    val rows = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0),
      ("g", Double.NaN), ("g", Double.PositiveInfinity),
      ("g", Double.NegativeInfinity))
    val got = Stats.exactMedian(rows.toDF("g", "x"), "g", "x", 16)
      .collect()
    assert(got.length == 1)
    assert(got(0).getAs[Double]("median_value") == 2.0)
    assert(got(0).getAs[Long]("n_events") == 3L)
  }

  test("matches on the events fixture per event_type") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_type").as("g"), col("value").as("x"))
    val got = Stats.exactMedian(events, "g", "x")
    val want = naive(events)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  /** Naive quantile reference: full-sort rank pick with the same
    * rank = floor((n-1)*q)+1 convention. */
  private def naiveQuantiles(df: org.apache.spark.sql.DataFrame,
                             qs: Seq[Double]) = {
    val w = Window.partitionBy("g").orderBy("x")
    val wn = Window.partitionBy("g")
    df.select(col("g"), col("x").cast("double").as("x"))
      .select(col("g"), col("x"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(wn).as("n"))
      .select(col("g"), col("x"), col("rn"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("rn") === floor((col("n") - 1) * col("q")).cast("long") + 1L)
      .select(col("g"), col("q"), col("x").as("quantile_value"),
        col("n").as("n_events"))
  }

  test("exactQuantiles matches the naive rank pick incl. q=0 and q=1") {
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val rows = (0 until 501).map { i =>
      (s"g${i % 7}", ((i * 2654435761L) % 1000) / 10.0)
    }
    val df = rows.toDF("g", "x")
    val got = Stats.exactQuantiles(df, "g", "x", qs, buckets = 32)
    val want = naiveQuantiles(df, qs)
    assert(got.count() == 7L * qs.size)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("zscore matches naive per-group normalization within float tolerance") {
    val rows = (0 until 400).map(i => (s"g${i % 3}", (i * 37 % 100) / 4.0))
    val df = rows.toDF("g", "x")
    val got = Stats.zscore(df, "g", "x")
    // z has zero mean and unit population variance within each group
    val checks = got.groupBy("g")
      .agg(avg("z").as("m"), avg(col("z") * col("z")).as("v"))
      .collect()
    checks.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-9)
      assert(math.abs(r.getAs[Double]("v") - 1.0) < 1e-9)
    }
    // spot value against the naive formula
    val g0 = rows.filter(_._1 == "g0").map(_._2)
    val mean = g0.sum / g0.size
    val sd = math.sqrt(g0.map(x => (x - mean) * (x - mean)).sum / g0.size)
    val x0 = g0.head
    val z0 = got.filter(col("g") === "g0" && col("x") === x0)
      .select("z").head().getDouble(0)
    assert(math.abs(z0 - (x0 - mean) / sd) < 1e-9)
  }

  test("madOutliers flags only the contaminated tail, not via it") {
    // 9 inliers around 10 and one gross outlier; median 10, MAD 1
    val rows = Seq(8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 1000.0)
      .map(("g", _))
    val got = Stats.madOutliers(rows.toDF("g", "x"), "g", "x", k = 3.0)
      .select("n_events", "median_value", "mad", "n_outliers")
      .as[(Long, Double, Double, Long)].head()
    assert(got == ((10L, 10.0, 1.0, 1L)))
    // mean/stddev on the same data would put the threshold past 900 —
    // the outlier drags z-score detection; MAD ignores it
  }

  test("exactQuantiles survives heavy ties and tiny bucket counts") {
    val rows = Seq.fill(60)(("g", 3.0)) ++ Seq.fill(20)(("g", 1.0)) ++
      Seq.fill(20)(("g", 9.0))
    val qs = Seq(0.1, 0.5, 0.95)
    val df = rows.toDF("g", "x")
    val got = Stats.exactQuantiles(df, "g", "x", qs, buckets = 2)
    val want = naiveQuantiles(df, qs)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("profileNumeric counts nulls and distincts per column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (2.0, null), (3.0, 20.0))
      .toDF("a", "b")
    val got = Stats.profileNumeric(df, Seq("a", "b")).orderBy("col_name")
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 4L, 0L, 3L, 1.0, 3.0, 8.0),
      ("b", 4L, 1L, 2L, 10.0, 20.0, 40.0)))
  }

  test("histogram: counts sum to total, empty bins present, edges exact") {
    val df = (0 to 100).map(_.toDouble).toDF("x")
      .filter(col("x") < 30 || col("x") > 70) // hollow the middle
    val h = Stats.histogram(df, "x", nBins = 10).orderBy("bucket").collect()
    assert(h.length == 10) // empty middle bins still present
    assert(h.map(_.getLong(3)).sum == df.count())
    assert(h.count(_.getLong(3) == 0L) == 4) // buckets 3..6 are empty
    assert(h.head.getDouble(1) == 0.0 && h.last.getDouble(2) == 100.0)
    // max value lands in the LAST bucket, not a phantom bucket n
    assert(h.last.getLong(3) > 0)
  }

  test("histogram degenerate min == max collapses to bucket 0") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    val h = Stats.histogram(df, "x", nBins = 4).orderBy("bucket").collect()
    assert(h.map(_.getLong(3)).toSeq == Seq(3L, 0L, 0L, 0L))
  }

  test("equiDepthBin: cutpoint binning, ties share a bin, non-finite → NULL") {
    import spark.implicits._
    // 16 values 1..16, nBins=4: ranks floor(15q)+1 = 4, 8, 12 → cuts
    // at values 4, 8, 12; bin = #cuts ≤ x
    val rows = (1 to 16).map(i => ("g", i.toDouble)) :+ (("g", Double.NaN))
    val df = rows.toDF("g", "x")
    val rowsOut = Stats.equiDepthBin(df, "g", "x", nBins = 4).collect()
      .map(r => (r.getDouble(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    val got = rowsOut.filterNot(_._1.isNaN).toMap
    assert(got(3.0) == 0L && got(4.0) == 1L) // tie at the cut → upper bin
    assert(got(7.0) == 1L && got(8.0) == 2L)
    assert(got(12.0) == 3L && got(16.0) == 3L)
    assert(rowsOut.filter(_._1.isNaN).map(_._2).toSeq == Seq(-1L)) // NULL bin
    // tie mass all lands together: duplicate a cut value heavily
    val dup = (Seq.fill(10)(5.0) ++ Seq(1.0, 2.0, 3.0, 9.0, 10.0, 11.0))
      .map(("h", _)).toDF("g", "x")
    val bins = Stats.equiDepthBin(dup, "g", "x", nBins = 4)
      .filter(col("x") === 5.0).select("bin").distinct().collect()
    assert(bins.length == 1) // every tied row shares one bin
  }

  test("skewAudit names the hot keys with exact shares, NULL included") {
    import spark.implicits._
    val rows: Seq[Option[Int]] =
      Seq.fill(60)(Some(7)) ++ Seq.fill(25)(None) ++
        Seq.fill(10)(Some(1)) ++ (100 to 104).map(Some(_))
    val df = rows.toDF("k")
    val got = Stats.skewAudit(df, "k", topN = 3).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (Some("7"), 60L, 600L),   // 60 of 100 rows = 600 permille
      (None, 25L, 250L),        // NULL is a key — usually THE hot one
      (Some("1"), 10L, 100L)))
  }

  test("histogram excludes non-finite values like the other selectors") {
    // an infinite value would make hi infinite and every affine bucket
    // expression NaN — the finiteBase convention applies here too
    val df = Seq(1.0, 2.0, 3.0, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN).toDF("x")
    val h = Stats.histogram(df, "x", nBins = 2).orderBy("bucket").collect()
    assert(h.map(_.getLong(3)).sum == 3L)
    assert(h.head.getDouble(1) == 1.0 && h.last.getDouble(2) == 3.0)
  }

  test("percentRankMilli equals the naive whole-group rank, ties included") {
    // heavy ties + a skewed group + a singleton group, tiny buckets so
    // the cutoff logic is exercised, not bypassed
    val rows = (0 until 400).map(i => (s"g${i % 3}", (i % 17).toDouble)) :+
      (("solo", 42.0))
    val df = rows.toDF("g", "x")
    val got = Stats.percentRankMilli(df, "g", "x", buckets = 4)
    val want = df.selectExpr("g", "x",
      "CASE WHEN count(1) OVER (PARTITION BY g) = 1 THEN CAST(0 AS BIGINT) " +
        "ELSE (1000 * (rank() OVER (PARTITION BY g ORDER BY x) - 1)) " +
        "div (count(1) OVER (PARTITION BY g) - 1) END AS prank_milli")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("weightedQuantiles: smallest x with cumweight ≥ ⌈q·W⌉, ties row-order-free") {
    // heavy ties (x repeats with different weights) + a skewed group;
    // tiny buckets so the straddle logic is exercised
    val rows = (0 until 300).map(i =>
      (s"g${i % 3}", (i % 11).toDouble, 1L + (i % 7)))
    val df = rows.toDF("g", "x", "wt")
    val got = Stats.weightedQuantiles(df, "g", "x", "wt",
      Seq(0.0, 0.25, 0.5, 0.9, 1.0), buckets = 4)
    val want = df.selectExpr("g", "x",
      "sum(wt) OVER (PARTITION BY g ORDER BY x " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw",
      "sum(wt) OVER (PARTITION BY g) AS tw")
      .crossJoin(Seq(0.0, 0.25, 0.5, 0.9, 1.0).toDF("q"))
      .withColumn("t", greatest(ceil(col("q") * col("tw").cast("double")),
        lit(1L)))
      .filter(col("cw") >= col("t"))
      .groupBy("g", "q")
      .agg(min("x").as("quantile_value"), max("tw").as("total_weight"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // unit weights degrade to the plain "count ≥ ⌈q·n⌉" rank pick
    val unit = df.withColumn("wt", lit(1L))
    val uq = Stats.weightedQuantiles(unit, "g", "x", "wt", Seq(0.5), 4)
      .filter(col("g") === "g0").head
    val manual = rows.filter(_._1 == "g0").map(_._2).sorted
    assert(uq.getDouble(2) == manual((manual.size + 1) / 2 - 1))
  }

  test("chiSquare: independence grid zeroes out; skewed table sums to n; zero cells emitted") {
    // uniform 2×3 grid: expected = observed = 4 everywhere, chi2 = 0
    val even = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r");
      _ <- 0 until 4 } yield (a, b)).toDF("a", "b")
    val r1 = Stats.chiSquare(even, "a", "b").collect()
    assert(r1.length == 6)
    assert(r1.forall(r => r.getDouble(3) == 4.0 && r.getDouble(4) == 0.0))

    // perfectly dependent 2×2 diagonal: chi2 = n = 20, and the two
    // ZERO cells carry half of it (expected 5 each, observed 0)
    val diag = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val r2 = Stats.chiSquare(diag, "a", "b").collect()
    assert(r2.length == 4)
    assert(r2.map(_.getDouble(4)).sum == 20.0)
    assert(r2.count(_.getLong(2) == 0L) == 2)

    // NULL categories are categories
    val withNull = Seq((Some("x"), "p"), (None, "p"), (None, "q"))
      .toDF("a", "b")
    val r3 = Stats.chiSquare(withNull, "a", "b")
    assert(r3.count() == 4)
    assert(r3.filter(col("a").isNull).count() == 2)
  }

  test("a NULL group is an ordinary partition, not silently dropped") {
    // GROUP BY and PARTITION BY both treat NULL as its own group; the
    // broadcast bounds joins must be null-safe or every NULL-group row
    // vanishes (no error, just missing output).
    val rows: Seq[(Option[String], Double)] =
      (0 until 60).map(i => (if (i % 4 == 0) None else Some(s"g${i % 3}"),
        (i % 13).toDouble))
    val df = rows.toDF("g", "x")
    val nullRows = rows.count(_._1.isEmpty)

    val med = Stats.exactMedian(df, "g", "x", buckets = 4)
    assert(med.filter(col("g").isNull).count() == 1)
    val wantMed = naive(df)
    assert(med.except(wantMed).count() == 0 &&
      wantMed.except(med).count() == 0)

    val q = Stats.exactQuantiles(df, "g", "x", Seq(0.0, 0.5, 1.0), 4)
    assert(q.filter(col("g").isNull).count() == 3)

    val pr = Stats.percentRankMilli(df, "g", "x", buckets = 4)
    assert(pr.filter(col("g").isNull).count() == nullRows)
    val wantPr = df.selectExpr("g", "x",
      "CASE WHEN count(1) OVER (PARTITION BY g) = 1 THEN CAST(0 AS BIGINT) " +
        "ELSE (1000 * (rank() OVER (PARTITION BY g ORDER BY x) - 1)) " +
        "div (count(1) OVER (PARTITION BY g) - 1) END AS prank_milli")
    assert(pr.except(wantPr).count() == 0 && wantPr.except(pr).count() == 0)

    assert(Stats.zscore(df, "g", "x").count() == rows.size)
    assert(Stats.madOutliers(df, "g", "x", k = 3.0, buckets = 4)
      .filter(col("g").isNull).count() == 1)
  }
}
