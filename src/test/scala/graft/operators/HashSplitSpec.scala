package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Deterministic split contract: total (every row labelled), stable
  * (identical across runs — it's a pure hash), fraction-faithful at
  * corpus size, and validated up front.
  */
class HashSplitSpec extends SparkTestBase {

  private val splits = Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1))

  test("every row gets a label and fractions are approximately honored") {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = docs.count().toDouble
    val counts = Curation.hashSplit(docs, "doc_id", splits)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n.toLong)
    // md5 is uniform; at 50 docs allow a generous binomial tolerance
    assert(counts("train") / n > 0.6 && counts("train") / n < 0.95)
    assert(counts.keySet == Set("train", "valid", "test") ||
      counts.keySet.subsetOf(Set("train", "valid", "test")))
  }

  test("assignment is a pure function of the id") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = Curation.hashSplit(docs, "doc_id", splits)
      .select("doc_id", "split").collect().toSet
    val b = Curation.hashSplit(docs.repartition(7), "doc_id", splits)
      .select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("fractions that don't sum to 1 are rejected") {
    val docs = Tables.load(spark, sfDir, "documents")
    intercept[IllegalArgumentException] {
      Curation.hashSplit(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
  }
}
