package graft.operators

import graft.{SparkTestBase, Tables}

/** Lloyd k-means: determinism and objective improvement. */
class KMeansSpec extends SparkTestBase {

  lazy val embs = Tables.load(spark, sfDir, "embeddings")

  test("training reduces the within-cluster objective vs the init centroids") {
    val init = KMeans.lloyd(embs, "vec_id", "embedding", k = 8, iters = 0)
    val trained = KMeans.lloyd(embs, "vec_id", "embedding", k = 8, iters = 3)
    val before = KMeans.wcss(embs, "vec_id", "embedding",
      init.withColumnRenamed("centroid", "centroid"))
    val after = KMeans.wcss(embs, "vec_id", "embedding", trained)
    assert(after < before, s"wcss after=$after before=$before")
  }

  test("training is deterministic") {
    val a = KMeans.lloyd(embs, "vec_id", "embedding", k = 5, iters = 2).collect()
    val b = KMeans.lloyd(embs, "vec_id", "embedding", k = 5, iters = 2).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == 5)
    assert(a.forall(_.getSeq[Long](1).length == 64))
  }
}
