package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 hardening: kFoldAudit NULL-id conservation, the
  * mixtureResample numeric-id contract. */
class Round11OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("kFoldAudit: NULL ids report under fold -1, counts conserve") {
    // 10 non-null ids + 3 NULL ids in stratum a; stratum b all-NULL.
    val df = ((0 until 10).map(i => (Some(i.toLong), "a")) ++
      Seq((None, "a"), (None, "a"), (None, "a"),
        (None, "b"), (None, "b"))).toDF("id", "lang")
    val r = Curation.kFoldAudit(df, "lang", "id", k = 4)
      .orderBy("lang", "fold").collect()
    // full 2x4 domain plus one -1 row per stratum that has NULL ids
    assert(r.length == 10)
    val byLang = r.groupBy(_.getString(0))
    assert(byLang("a").map(_.getAs[Long]("n")).sum == 13)
    assert(byLang("b").map(_.getAs[Long]("n")).sum == 2)
    val aNull = byLang("a").find(_.getAs[Long]("fold") == -1L).get
    assert(aNull.getAs[Long]("n") == 3)
    // the all-NULL stratum still reports: one -1 row, four zero rows
    val bRows = byLang("b")
    assert(bRows.map(_.getAs[Long]("fold")).sorted.toSeq ==
      Seq(-1L, 0L, 1L, 2L, 3L))
    assert(bRows.find(_.getAs[Long]("fold") == -1L)
      .get.getAs[Long]("n") == 2)
    // shares still integrate over a positive total (no NULL shares)
    r.foreach(row => assert(!row.isNullAt(row.fieldIndex("share_milli"))))
  }

  test("kFoldAudit: no NULL ids — unchanged full-domain contract") {
    val df = (0 until 20).map(i => (i.toLong, "a")).toDF("id", "lang")
    val r = Curation.kFoldAudit(df, "lang", "id", k = 4).collect()
    assert(r.length == 4 && r.map(_.getAs[Long]("n")).sum == 20)
    assert(r.forall(_.getAs[Long]("fold") >= 0L))
  }

  test("mixtureResample: non-numeric id is a loud require, not a 0") {
    val df = Seq(("x1", "a"), ("x2", "a")).toDF("id", "src")
    val ex = intercept[IllegalArgumentException] {
      Curation.mixtureResample(df, "src", "id", Seq("a" -> 1000L))
    }
    assert(ex.getMessage.contains("must be numeric"))
  }
}
