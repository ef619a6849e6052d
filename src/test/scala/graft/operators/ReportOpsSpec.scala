package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 reporting operators: [[Stats.ksMatrix]],
  * [[Stats.corrMatrix]], [[Events.transitionMatrix]],
  * [[Curation.mixtureConcentration]], [[TextAnalysis.ngramNovelty]].
  * Each is checked against either a hand-computed fixture or a naive
  * reference implementation, plus a partitioning-invariance case (the
  * answer must not depend on how the input is split across tasks).
  */
class ReportOpsSpec extends SparkTestBase {

  import spark.implicits._

  // ---------------------------------------------------------------- KS

  test("ksMatrix: hand-computed two-sample distance") {
    // A = {1,2,3,4}, B = {3,4,5,6}: on the union grid the ECDF gap
    // peaks at 0.5 (x in [2,4)).
    val df = (Seq.tabulate(4)(i => ("A", (i + 1).toDouble)) ++
      Seq.tabulate(4)(i => ("B", (i + 3).toDouble))).toDF("s", "x")
    val row = Stats.ksMatrix(df, "s", "x").collect().head
    assert(row.getAs[String]("sample_a") == "A")
    assert(row.getAs[String]("sample_b") == "B")
    assert(math.abs(row.getAs[Double]("ks_stat") - 0.5) < 1e-15)
    assert(row.getAs[Long]("n_a") == 4 && row.getAs[Long]("n_b") == 4)
  }

  test("ksMatrix: identical samples have distance 0; disjoint have 1") {
    val same = (Seq.tabulate(5)(i => ("A", i.toDouble)) ++
      Seq.tabulate(5)(i => ("B", i.toDouble))).toDF("s", "x")
    assert(Stats.ksMatrix(same, "s", "x")
      .collect().head.getAs[Double]("ks_stat") == 0.0)
    val disj = (Seq.tabulate(5)(i => ("A", i.toDouble)) ++
      Seq.tabulate(5)(i => ("B", (i + 100).toDouble))).toDF("s", "x")
    assert(Stats.ksMatrix(disj, "s", "x")
      .collect().head.getAs[Double]("ks_stat") == 1.0)
  }

  test("ksMatrix: matches a naive driver-side ECDF on 3 skewed samples") {
    val rows = (0 until 600).map { i =>
      val s = s"s${i % 3}"
      // sample-dependent shift so the distances are non-trivial
      (s, ((i * 2654435761L) % 97).toDouble + (i % 3) * 10.0)
    }
    val got = Stats.ksMatrix(rows.toDF("s", "x"), "s", "x")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val bySample = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val grid = rows.map(_._2).distinct.sorted
    def ecdf(vs: Seq[Double], x: Double) =
      vs.count(_ <= x).toDouble / vs.size
    for {
      a <- bySample.keys; b <- bySample.keys if a < b
    } {
      val want = grid.map(x =>
        math.abs(ecdf(bySample(a), x) - ecdf(bySample(b), x))).max
      assert(math.abs(got((a, b)) - want) < 1e-12, s"pair ($a,$b)")
    }
  }

  test("ksMatrix: invariant under repartitioning") {
    val df = (0 until 400)
      .map(i => (s"s${i % 2}", (i % 37).toDouble)).toDF("s", "x")
    val one = Stats.ksMatrix(df.repartition(1), "s", "x").collect().toSet
    val many = Stats.ksMatrix(df.repartition(13), "s", "x").collect().toSet
    assert(one == many)
  }

  // -------------------------------------------------------------- corr

  test("corrMatrix: exact ±1 on linear columns, agrees with builtin") {
    val df = (1 to 200)
      .map { i => (i.toDouble, 2.0 * i + 1, 100.0 - i) }
      .toDF("x", "y", "z")
    val got = Stats.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(got(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(got(("x", "z")) + 1.0) < 1e-12)
    val builtin = df.agg(corr("x", "y"), corr("x", "z"), corr("y", "z"))
      .collect().head
    assert(math.abs(got(("x", "y")) - builtin.getDouble(0)) < 1e-9)
    assert(math.abs(got(("y", "z")) - builtin.getDouble(2)) < 1e-9)
  }

  test("corrMatrix: listwise NULL handling and 2-decimal inputs") {
    // one row has a NULL y — the whole row must drop from EVERY pair
    val df = Seq(
      (Some(1.25), Some(2.50), Some(10.00)),
      (Some(2.75), Some(5.50), Some(8.25)),
      (Some(3.00), None: Option[Double], Some(7.75)),
      (Some(4.50), Some(9.00), Some(5.25)),
      (Some(6.25), Some(12.50), Some(1.00))
    ).toDF("x", "y", "z")
    val rows = Stats.corrMatrix(df, Seq("x", "y", "z")).collect()
    assert(rows.forall(_.getAs[Long]("n") == 4))
    val xy = rows.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(math.abs(xy.getAs[Double]("corr") - 1.0) < 1e-12) // y = 2x
  }

  test("corrMatrix: one job, invariant under repartitioning") {
    val df = (1 to 300)
      .map(i => (((i * 7) % 100) / 4.0, ((i * 13) % 100) / 4.0))
      .toDF("a", "b")
    val r1 = Stats.corrMatrix(df.repartition(1), Seq("a", "b"))
      .collect().head.getDouble(3)
    val r17 = Stats.corrMatrix(df.repartition(17), Seq("a", "b"))
      .collect().head.getDouble(3)
    assert(r1 == r17) // bit-identical, not approximately equal
  }

  // ------------------------------------------------------- transitions

  test("transitionMatrix: hand fixture with probabilities") {
    val ev = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"),
      (1L, 30L, 3L, "A"), (1L, 40L, 4L, "C"),
      (2L, 10L, 5L, "B"), (2L, 20L, 6L, "A")
    ).toDF("u", "ts", "id", "et")
    val got = Events.transitionMatrix(ev, "u", "ts", "id", "et")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_trans"), r.getAs[Long]("p_micro"))).toMap
    // chains: u1 A→B→A→C, u2 B→A
    assert(got(("A", "B")) == (1L, 500000L))
    assert(got(("A", "C")) == (1L, 500000L))
    assert(got(("B", "A")) == (2L, 1000000L))
    assert(got.size == 3)
  }

  test("transitionMatrix: equal timestamps break ties on the tiebreaker") {
    val ev = Seq(
      (1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"), (1L, 20L, 3L, "C")
    ).toDF("u", "ts", "id", "et")
    val got = Events.transitionMatrix(ev, "u", "ts", "id", "et")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("A", "B"), ("B", "C")))
  }

  // ------------------------------------------------------ concentration

  test("mixtureConcentration: hand HHI, NULL domain is a domain") {
    val df = (Seq.fill(2)("a") ++ Seq.fill(2)("b"))
      .map(Option(_)).padTo(8, None: Option[String])
      .toDF("d") // a:2, b:2, NULL:4 → N=8, ssq=4+4+16=24
    val rows = Curation.mixtureConcentration(df, "d").collect()
    assert(rows.length == 3)
    val byDom = rows.map(r => Option(r.getString(0)) ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("share_micro"))).toMap
    assert(byDom(Some("a")) == (2L, 250000L))
    assert(byDom(None) == (4L, 500000L))
    val hhi = rows.head.getAs[Double]("hhi")
    assert(math.abs(hhi - 24.0 / 64.0) < 1e-15)
    assert(math.abs(rows.head.getAs[Double]("effective_domains")
      - 64.0 / 24.0) < 1e-12)
  }

  // ------------------------------------------------------------ novelty

  test("ngramNovelty: hand bigram fixture") {
    val probe = Seq((1L, "a b c"), (2L, "x y")).toDF("id", "txt")
    val ref = Seq((10L, "a b q")).toDF("id", "txt")
    val got = TextAnalysis.ngramNovelty(probe, ref, "id", "txt", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_permille"))).toMap
    // doc 1: {a b, b c}; ref has {a b, b q} → 1 of 2 novel
    assert(got(1L) == (2L, 1L, 500L))
    // doc 2: {x y} fully novel
    assert(got(2L) == (1L, 1L, 1000L))
  }

  // -------------------------------------------------------------- drift

  test("profileDrift: null rates, cardinality and mean movement") {
    val before = Seq(Some(1.0), Some(2.0), None).toDF("x")
    val after = Seq(Some(4.0), None, None, Some(6.0)).toDF("x")
    val r = DataQuality.profileDrift(before, after, Seq("x"))
      .collect().head
    assert(r.getAs[Long]("n_rows_a") == 3 && r.getAs[Long]("n_rows_b") == 4)
    assert(r.getAs[Long]("null_permille_a") == 333)
    assert(r.getAs[Long]("null_permille_b") == 500)
    assert(r.getAs[Long]("distinct_delta") == 0)
    assert(r.getAs[Double]("mean_a") == 1.5)
    assert(r.getAs[Double]("mean_b") == 5.0)
    assert(r.getAs[Double]("min_delta") == 3.0)
    assert(r.getAs[Double]("max_delta") == 4.0)
  }

  // ----------------------------------------------------------------- pq

  test("Pq.encode: nearest codeword per subspace, ties to lowest code") {
    val df = Seq(
      (1L, Seq(0.5f, 0.5f, 1.0f, 1.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // quantized-space codebooks: sub0 codes at (0,0) and (10000,10000)
    // — vector 1's sub0 slice (5000,5000) is EQUIDISTANT → code 0.
    val cbs = Seq(
      Seq(0L -> Seq(0L, 0L), 1L -> Seq(10000L, 10000L)),
      Seq(0L -> Seq(9000L, 9000L), 1L -> Seq(10000L, 10000L)))
    val got = Pq.encode(df, "vec_id", "embedding", cbs, subDim = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("code_0"), r.getAs[Long]("code_1"),
          r.getAs[Long]("err2_1"))).toMap
    assert(got(1L)._1 == 0L) // equidistant tie → lowest code id
    assert(got(1L)._2 == 1L && got(1L)._3 == 0L) // exact hit on (1e4,1e4)
    assert(got(2L)._1 == 0L)
  }

  test("Pq.trainCodebooks: deterministic, equals lloyd on each slice") {
    val df = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(4)(d => ((i * 7 + d * 3) % 10) / 10.0f))
    }.toDF("vec_id", "embedding")
    val cbs = Pq.trainCodebooks(df, "vec_id", "embedding",
      m = 2, subDim = 2, k = 3, iters = 2)
    val cbs2 = Pq.trainCodebooks(df, "vec_id", "embedding",
      m = 2, subDim = 2, k = 3, iters = 2)
    assert(cbs == cbs2)
    val direct = KMeans.lloyd(
      df.select(col("vec_id"), slice(col("embedding"), 3, 2).as("s")),
      "vec_id", "s", 3, 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq
    assert(cbs(1) == direct)
  }

  test("ngramNovelty: short text falls back to the joined token") {
    // "a" has <n words → single joined-token shingle, never zero rows
    val probe = Seq((1L, "a")).toDF("id", "txt")
    val ref = Seq((10L, "a")).toDF("id", "txt")
    val got = TextAnalysis.ngramNovelty(probe, ref, "id", "txt", n = 3)
      .collect().head
    assert(got.getAs[Long]("n_ngrams") == 1L)
    assert(got.getAs[Long]("n_novel") == 0L)
  }

  test("Pq.adcTopK: score equals table-lookup sum, self excluded") {
    // 4-dim vectors, m=2 × subDim=2; quantized space is value×10⁴
    val df = Seq(
      (0L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 1.0f, 1.0f, 1.0f)),
      (3L, Seq(0.1f, 0.1f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cbs = Pq.trainCodebooks(df, "vec_id", "embedding",
      m = 2, subDim = 2, k = 2, iters = 2)
    val got = Pq.adcTopK(df, "vec_id", "embedding", cbs, subDim = 2,
      queryIds = Seq(0L), k = 3).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("d2_adc")))
    assert(got.length == 3 && !got.exists(_._2 == 0L)) // self excluded
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))     // dense ranks
    // ADC score must EQUAL the independent reconstruction distance:
    // d2(query_slice, codeword(assigned_code)) summed over subspaces.
    val enc = Pq.encode(df, "vec_id", "embedding", cbs, subDim = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("code_0"), r.getAs[Long]("code_1"))).toMap
    val q = Seq(0L, 0L, 0L, 0L) // query 0 quantized
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    got.foreach { case (_, vid, s) =>
      val (c0, c1) = enc(vid)
      val expect = d2(q.slice(0, 2), cbs(0).find(_._1 == c0).get._2) +
        d2(q.slice(2, 4), cbs(1).find(_._1 == c1).get._2)
      assert(s == expect, s"vec $vid")
    }
  }

  // ---------------------------------------------------------- compaction

  test("compactionPlan: byte-offset bins, straddle keeps one bin over") {
    val files = Seq(
      ("p", 1L, 40L), ("p", 2L, 40L), ("p", 3L, 40L), // 40+40 | 40…
      ("p", 4L, 150L),                                 // big file alone
      ("q", 5L, 10L)
    ).toDF("part", "file_id", "bytes")
    val got = Layout.compactionPlan(files, "part", "file_id", "bytes",
      targetBytes = 100L).collect()
      .map(r => r.getAs[Long]("file_id") ->
        (r.getAs[Long]("bin"), r.getAs[Long]("bin_files"),
          r.getAs[Long]("bin_bytes"))).toMap
    // p: offsets 0,40,80,120 → bins 0,0,0,1 — file 3 STARTS at 80 so
    // bin 0 overfills to 120 bytes (the documented one-file slack)
    assert(got(1L) == (0L, 3L, 120L))
    assert(got(3L) == (0L, 3L, 120L))
    assert(got(4L) == (1L, 1L, 150L))
    assert(got(5L) == (0L, 1L, 10L)) // partitions pack independently
  }

  test("compactionPlan: fileCol ties walk one row at a time (ROWS frame)") {
    // two files TIED on file_id: the default RANGE frame would give
    // both a cumulative of 210 (each counting the other), start both
    // at offset 60, and pack both into bin 0
    val files = Seq(("p", 1L, 150L), ("p", 1L, 60L))
      .toDF("part", "file_id", "bytes")
    val bins = Layout.compactionPlan(files, "part", "file_id", "bytes",
      targetBytes = 100L).collect().map(_.getAs[Long]("bin")).sorted
    // ROWS: offsets 0 and 150 (either order) → bins 0 and 1
    assert(bins.toSeq == Seq(0L, 1L))
  }
}
