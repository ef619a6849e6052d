package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Search.bm25TopK]] ranking properties and [[Curation.mixtureSample]]
  * mixture/determinism invariants. */
class SearchMixSpec extends SparkTestBase {

  import spark.implicits._

  test("bm25 saturates tf and normalizes length") {
    val docs = Seq(
      (1L, ("apple " * 50).trim),                      // tf=50, dl=50
      (2L, "apple pear plum fig"),                     // tf=1, dl=4
      (3L, ("apple " + "x " * 96).trim))               // tf=1, dl=97
      .toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("apple"), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val score = got.toMap
    // saturation: 50x the tf buys well under 50x the score
    assert(score(1L) < 50 * score(2L) && score(1L) > score(2L))
    // length normalization: same tf, longer doc scores strictly lower
    assert(score(2L) > score(3L))
  }

  test("bm25 multi-term score is the fixed-order sum of per-term scores") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "gamma delta"))
      .toDF("doc_id", "text")
    val both = Search.bm25TopK(docs, "doc_id", "text",
      Seq("alpha", "beta"), 3).collect().map(r => r.getLong(0)).toSeq
    // doc 1 matches both terms and must outrank the single-term docs
    assert(both.head == 1L)
    assert(!both.contains(3L))
  }

  test("rrfFuse sums integer rank reciprocals; consensus outranks outliers") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "vec_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 13L, 2L), (1L, 10L, 3L))
      .toDF("query_id", "vec_id", "rank")
    val got = Search.rrfFuse(Seq(a, b), "query_id", "vec_id", "rank",
      k0 = 60, topK = 4).orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // 11: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522 (2 lists)
    // 10: 1e6/61 + 1e6/63 = 16393 + 15873 = 32266 (2 lists)
    // 13: 1e6/62 = 16129 (1 list)   12: 1e6/63 = 15873 (1 list)
    assert(got.toSeq == Seq((11L, 32522L, 2L), (10L, 32266L, 2L),
      (13L, 16129L, 1L), (12L, 15873L, 1L)))
  }

  test("int8 dot and L2 rankers disagree exactly when norms should matter") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),   // query
      (1L, Seq(1.9f, 0.0f)),   // big-norm: best by dot, far by L2
      (2L, Seq(0.9f, 0.0f)))   // near the query: best by L2
      .toDF("vec_id", "embedding")
    val byDot = Similarity.int8TopK(emb, Seq(0L), "vec_id", "embedding", 2)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    val byL2 = Similarity.int8L2TopK(emb, Seq(0L), "vec_id", "embedding", 2)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(byDot == Seq(1L, 2L))
    assert(byL2 == Seq(2L, 1L))
  }

  test("mixtureSample hits the target mixture and drops unlisted domains") {
    val docs = (0 until 400).map(i => (i.toLong, s"dom${i % 4}"))
      .toDF("doc_id", "domain")
    val kept = Curation.mixtureSample(docs, "doc_id", "domain",
      Seq("dom0" -> 0.5, "dom1" -> 0.25))
    val byDom = kept.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = min(100/0.5, 100/0.25) = 200 → dom0 rate 1.0 (keeps all 100),
    // dom1 rate 0.5 (~50 by hash), others dropped
    assert(byDom("dom0") == 100L)
    assert(byDom("dom1") > 30L && byDom("dom1") < 70L)
    assert(!byDom.contains("dom2") && !byDom.contains("dom3"))
    // deterministic: the same call returns the identical kept set
    val again = Curation.mixtureSample(docs, "doc_id", "domain",
      Seq("dom0" -> 0.5, "dom1" -> 0.25))
    assert(kept.select("doc_id").except(again.select("doc_id")).count() == 0)
    assert(again.select("doc_id").except(kept.select("doc_id")).count() == 0)
  }

  test("mixture binding domain keeps EVERY row for non-dyadic shares (clamp)") {
    // non-dyadic shares (1/3, 1/7, ...) are where floor(T·share/n·65536)
    // can double-round to 65535 and silently shed ~1/65536 of the
    // binding domain; the exact-equality clamp must hold regardless
    val docs = (0 until 900).map(i => (i.toLong, s"dom${i % 3}"))
      .toDF("doc_id", "domain")
    for (shares <- Seq(
      Seq("dom0" -> (1.0 / 3), "dom1" -> (1.0 / 7)),
      Seq("dom0" -> 0.3, "dom1" -> 0.1, "dom2" -> 0.6),
      Seq("dom0" -> (1.0 / 9), "dom1" -> (2.0 / 7), "dom2" -> 0.13))) {
      val kept = Curation.mixtureSample(docs, "doc_id", "domain", shares)
        .groupBy("domain").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // binding domain = argmin n_d/share_d; every domain has n=300
      val binding = shares.minBy { case (_, sh) => 300.0 / sh }._1
      assert(kept(binding) == 300L,
        s"binding domain $binding lost rows under $shares: ${kept(binding)}")
    }
  }
}
