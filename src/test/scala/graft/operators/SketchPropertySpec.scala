package graft.operators

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-10 operators, generated-input style
  * (fixed seeds — the scalatest/scalacheck bridge is not in the
  * offline artifact cache, same convention as LineagePropertySpec).
  *
  *  - logHistQuantiles: for ANY positive input set and ANY q, the
  *    estimate is a lower bound of the exact rank-rule quantile and
  *    within the bin's +10% relative width.
  *  - mixtureResample: kept counts equal quotas, quotas honor shares
  *    to floor rounding, and every domain's quota fits its population.
  */
class SketchPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("logHist estimate is a lower bound within the bin width, any input") {
    val gen = for {
      n <- Gen.chooseNum(5, 400)
      scale <- Gen.chooseNum(1, 100000)
      vals <- Gen.listOfN(n, Gen.chooseNum(1, 1000000))
    } yield vals.map(v => v.toDouble * scale / 1000.0)
    samples(gen, 6).foreach { vals =>
      val df = vals.map(("g", _)).toDF("g", "v")
      val qs = Seq(100L, 500L, 900L, 1000L)
      val got = Sketch.logHistQuantiles(
        Sketch.logHistSketch(df, Seq("g"), "v"), Seq("g"), qs)
        .collect().map(r => r.getAs[Long]("q_permille") ->
          r.getAs[Long]("est_cents")).toMap
      val sortedCents = vals.map(v => math.floor(v * 100).toLong).sorted
      for (q <- qs) {
        val exact = sortedCents((((vals.size - 1) * q) / 1000).toInt)
        val est = got(q)
        assert(est <= exact, s"q=$q est=$est exact=$exact n=${vals.size}")
        // bin [lo, lo + lo/10 + adjustment): exact < upper bound
        val upper = if (est < 10) est + 1 else est + est / 10 + 10
        assert(exact < upper, s"q=$q est=$est exact=$exact — bin too wide")
      }
    }
  }

  test("mixtureResample quotas honor shares and populations, any input") {
    val gen = for {
      nA <- Gen.chooseNum(1, 60)
      nB <- Gen.chooseNum(1, 60)
      nC <- Gen.chooseNum(1, 60)
      sA <- Gen.chooseNum(1, 998)
      sB <- Gen.chooseNum(1, 999 - sA)
    } yield (nA, nB, nC, sA.toLong, sB.toLong, 1000L - sA - sB)
    samples(gen, 6).foreach { case (nA, nB, nC, sA, sB, sC) =>
      val rows = (0 until nA).map(i => (i.toLong, "a")) ++
        (0 until nB).map(i => (1000L + i, "b")) ++
        (0 until nC).map(i => (2000L + i, "c"))
      val df = rows.toDF("id", "src")
      val shares = Seq("a" -> sA, "b" -> sB, "c" -> sC)
      val r = Curation.mixtureResample(df, "src", "id", shares)
        .orderBy("src").collect()
      val t = Seq(nA * 1000L / sA, nB * 1000L / sB, nC * 1000L / sC).min
      val expect = Map("a" -> (nA.toLong, sA * t / 1000),
        "b" -> (nB.toLong, sB * t / 1000), "c" -> (nC.toLong, sC * t / 1000))
      r.foreach { row =>
        val (nBefore, quota) = expect(row.getString(0))
        assert(row.getAs[Long]("n_before") == nBefore)
        assert(row.getAs[Long]("quota") == quota)
        assert(row.getAs[Long]("n_kept") == quota) // quota <= n_s always
        assert(quota <= nBefore)
      }
    }
  }
}
