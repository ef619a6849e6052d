package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-13 operator pins. */
class Round13OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("bloom gate with double-hashed positions never misses") {
    // Kirsch–Mitzenmacher positions (one digest, arithmetic strides)
    // changed WHERE bits land, not the Bloom contract: every exact
    // benchmark shingle hit must still probe as maybe (no false
    // negatives), and maybe counts stay within the shingle count.
    val docs = (0L until 60L)
      .map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i * 3) % 11} end$i"))
      .toDF("doc_id", "text")
    val out = Curation.bloomContamination(
      docs, "doc_id", "text", col("doc_id") % 3 === 0).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ns, ne, nm) = (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_maybe"))
      assert(ne <= nm, s"false negative: doc ${r.get(0)} exact=$ne maybe=$nm")
      assert(nm <= ns && ne <= ns)
    }
    // the shared tok-vocabulary guarantees real contamination exists
    assert(out.exists(_.getAs[Long]("n_exact") >= 1))
  }
}
