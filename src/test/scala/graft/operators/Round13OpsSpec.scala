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

  test("bloomPositions: the Column and driver derivations agree bit-for-bit") {
    // Filters are BUILT with the Column form and PROBED (q217) with
    // the driver form — any divergence is a silent false negative, so
    // pin the two sides against each other over random 60-bit digests
    // and both deployed (k, bits) shapes.
    val rnd = new scala.util.Random(13)
    val digests = Seq.fill(40)(rnd.nextLong() & ((1L << 60) - 1))
    for ((k, bits) <- Seq((4, 65536), (3, 256), (8, 1024))) {
      val got = digests.map(d => (d, d))
        .toDF("d", "dup")
        .select(col("d"), Dedup.bloomPositions(col("d"), k, bits).as("p"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      digests.foreach { d =>
        assert(got(d) == Dedup.bloomPositionsOf(d, k, bits),
          s"d=$d k=$k bits=$bits")
        assert(got(d).forall(p => p >= 0 && p < bits))
      }
    }
  }
}
