package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Hyperplane sign-LSH blocking for embedding near-dup
  * ([[Dedup.embeddingCosineLsh]]): candidates must be a subset of the
  * brute-force pair set with identical cosines, identical vectors must
  * always collide, and the weight matrix must be deterministic.
  */
class EmbeddingLshSpec extends SparkTestBase {

  import spark.implicits._

  test("hyperplane weights are deterministic and bounded") {
    val a = Dedup.hyperplaneWeights(16, 64)
    val b = Dedup.hyperplaneWeights(16, 64)
    assert(a == b)
    assert(a.flatten.forall(w => w >= -1000L && w <= 1000L))
    // not degenerate: both signs occur
    assert(a.flatten.exists(_ > 0) && a.flatten.exists(_ < 0))
  }

  test("LSH pairs are a subset of brute-force pairs with equal cosines") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .withColumn("label", lit("all"))
    val lsh = Dedup.embeddingCosineLsh(emb, "vec_id", "embedding",
      Seq("label"), dim = 64, nPlanes = 16, bands = 4, threshold = 0.2)
      .select("id_a", "id_b", "cosine")
    val brute = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.2)
      .select("id_a", "id_b", "cosine")
    assert(lsh.except(brute).count() == 0)
    // Minimum-recall floor on the fixture: banded sign-LSH is
    // approximate by design (a 4-bit band collides with p = (1-θ/π)^4),
    // but a weight or banding regression must not be able to silently
    // empty the candidate set. The measured fixture recall is well above
    // this floor; the assertion pins the order of magnitude, not the
    // exact value.
    val nBrute = brute.count()
    val nHit = lsh.intersect(brute).count()
    assert(nBrute > 0, "fixture must contain qualifying pairs")
    assert(nHit.toDouble / nBrute >= 0.2,
      s"LSH recall collapsed: $nHit of $nBrute brute-force pairs found")
  }

  test("identical vectors collide on every band and are always found") {
    val emb = Tables.load(spark, sfDir, "embeddings").limit(5)
    val dup = emb.withColumn("vec_id", col("vec_id") + 1000000L)
    val pairs = Dedup.embeddingCosineLsh(
      emb.union(dup).withColumn("label", lit("x")),
      "vec_id", "embedding", Seq("label"),
      dim = 64, nPlanes = 16, bands = 4, threshold = 0.99)
    // each original pairs with its exact copy at cosine 1.0
    val found = pairs.filter(col("id_b") === col("id_a") + 1000000L).count()
    assert(found == 5)
  }

  test("semanticDecontamination flags exact copies, never self-joins the corpus") {
    val bench = Tables.load(spark, sfDir, "embeddings").limit(4)
    // corpus: exact copies of the benchmark (shifted ids) + itself-
    // duplicated far vectors that must NOT appear (corpus-corpus
    // similarity is not contamination)
    val copies = bench.withColumn("vec_id", col("vec_id") + 1000L)
    val corpus = copies.union(copies.withColumn("vec_id",
      col("vec_id") + 1000L))
    val got = Dedup.semanticDecontamination(corpus, bench,
      "vec_id", "embedding", dim = 64, nPlanes = 16, bands = 4,
      threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // all 8 corpus vectors are copies of some benchmark vector
    assert(got.size == 8)
    assert(got.values.forall(c => c > 0.999))
  }
}
