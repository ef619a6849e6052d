package graft.operators

import graft.SparkTestBase

/** [[TextAnalysis.chunk]], [[TextAnalysis.repetition]], and
  * [[Curation.packSequences]]: window/stride coverage, repetition
  * ratios, and prefix-sum pack assignment. */
class ChunkPackSpec extends SparkTestBase {

  import spark.implicits._

  test("chunk covers every token; starts advance by stride; tail may be short") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(docs, "doc_id", "text",
      window = 8, stride = 4)
      .orderBy("chunk_id")
      .select("chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(chunks == Seq(
      (0L, 8L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 6L, (5 to 10).map(i => s"t$i").mkString(" ")),
      (2L, 2L, (9 to 10).map(i => s"t$i").mkString(" "))))
  }

  test("chunk with stride == window gives non-overlapping full cover") {
    val docs = Seq((1L, (1 to 9).map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(docs, "doc_id", "text", 4, 4)
      .select("n_chunk_tokens").as[Long].collect().toSeq
    assert(chunks.sum == 9 && chunks == Seq(4L, 4L, 1L))
  }

  test("repetition flags the degenerate document, keeps the diverse one") {
    val docs = Seq(
      (1L, "spam spam spam spam spam ham"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "top_token_ratio", "dup_trigram_ratio", "keep")
      .as[(Long, Double, Double, Boolean)].collect().toSeq
    assert(r(0)._2 == 5.0 / 6 && !r(0)._4)       // 5 of 6 tokens are 'spam'
    assert(r(0)._3 == 1.0 - 2.0 / 4)             // 4 trigrams, 2 distinct
    assert(r(1)._2 == 0.1 && r(1)._3 == 0.0 && r(1)._4)
  }

  test("packSequences assigns packs by exact prefix sum and counts straddlers") {
    // shard A: doc sizes 3,4,5 with ctx 6 → before = 0,3,7 → packs 0,0,1;
    // doc 2 (before 3, ends at token 7) straddles the cut at 6.
    val docs = Seq(
      (1L, "a a a", "A"), (2L, "b b b b", "A"), (3L, "c c c c c", "A"),
      (4L, "d d", "B"))
      .toDF("doc_id", "text", "source")
    val packs = Curation.packSequences(docs, "doc_id", "text", "source", 6)
      .orderBy("shard", "pack_id")
      .select("shard", "pack_id", "n_docs", "n_tokens", "first_doc",
        "last_doc", "n_boundary_docs")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(packs == Seq(
      ("A", 0L, 2L, 7L, 1L, 2L, 1L),
      ("A", 1L, 1L, 5L, 3L, 3L, 0L),
      ("B", 0L, 1L, 2L, 4L, 4L, 0L)))
  }
}
