package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KMV set-operation contracts: the sketch is the set below k, so the
  * intersection estimate must be EXACT there; above k it is an
  * estimator whose error is bounded by the bottom-k sampling rate.
  */
class SketchSpec extends SparkTestBase {

  import spark.implicits._

  test("kmvIntersect is exact when both sides fit in the sketch") {
    // A = {0..9}, B = {5..14} within one group: true overlap 5
    val a = Sketch.kmvSketch((0 until 10).map(i => ("g", i)).toDF("g", "x"),
      Seq("g"), col("x").cast("string"), k = 16)
    val b = Sketch.kmvSketch((5 until 15).map(i => ("g", i)).toDF("g", "x"),
      Seq("g"), col("x").cast("string"), k = 16)
    val est = Sketch.kmvIntersect(a, b, Seq("g"), k = 16)
      .select("est_common").as[Long].head()
    assert(est == 5L)
  }

  test("kmvIntersect estimates a large overlap within sampling error") {
    // |A| = |B| = 800, overlap 500; k = 64 → rel. std ≈ 1/sqrt(62)
    val a = Sketch.kmvSketch((0 until 800).map(i => ("g", i)).toDF("g", "x"),
      Seq("g"), col("x").cast("string"), k = 64)
    val b = Sketch.kmvSketch((300 until 1100).map(i => ("g", i)).toDF("g", "x"),
      Seq("g"), col("x").cast("string"), k = 64)
    val est = Sketch.kmvIntersect(a, b, Seq("g"), k = 64)
      .select("est_common").as[Long].head()
    assert(est > 250L && est < 750L, s"estimate $est too far from 500")
  }

  test("disjoint sketches produce no intersection row") {
    val a = Sketch.kmvSketch((0 until 50).map(i => ("g", i)).toDF("g", "x"),
      Seq("g"), col("x").cast("string"), k = 16)
    val b = Sketch.kmvSketch((1000 until 1050).map(i => ("g", i)).toDF("g", "x"),
      Seq("g"), col("x").cast("string"), k = 16)
    assert(Sketch.kmvIntersect(a, b, Seq("g"), k = 16).count() == 0)
  }
}
