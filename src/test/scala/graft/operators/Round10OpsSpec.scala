package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-10 operators: target-mixture resample (water-filling). */
class Round10OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def rows(src: String, n: Int, base: Int) =
    (0 until n).map(i => (base + i.toLong, src))

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
