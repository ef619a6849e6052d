package graft.operators

import graft.SparkTestBase

/** BPE merge learning against the hand-computed classic corpus
  * (low×5, lower×2, newest×6, widest×3 — Sennrich et al.'s example,
  * char-init without end-of-word marker):
  *
  *  round 1: (e,s)  count 9  (ties (s,t) 9 → left asc wins)
  *  round 2: (es,t) count 9
  *  round 3: (l,o)  count 7  (ties (o,w) 7)
  *  round 4: (lo,w) count 7
  *  round 5: (e,w)  count 6  (ties (n,e), (w,est) → 'e' < 'n' < 'w')
  *  round 6: (ew,est) count 6 (ties (n,ew) → 'ew' < 'n')
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private val corpus: Seq[String] =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("learns the classic merge sequence with deterministic tie-breaks") {
    val docs = corpus.toDF("text")
    val got = Bpe.learnMerges(docs, "text", 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L),
      (6L, "ew", "est", 6L)))
  }

  test("merge application handles back-to-back and odd-chain occurrences") {
    import org.apache.spark.sql.functions.col
    val got = Seq(" a b a b ", " x a b y ", " a a b b ").toDF("s")
      .select(Bpe.applyMerge(col("s"), "a", "b").as("s"))
      .as[String].collect().toSeq
    assert(got == Seq(" ab ab ", " x ab y ", " a ab b "))
    val chain = Seq(" b b b ").toDF("s")
      .select(Bpe.applyMerge(col("s"), "b", "b").as("s"))
      .as[String].head()
    assert(chain == " bb b ")
  }

  test("tokenize applies the learned merges: low=1, lower=3, newest=2, widest=4") {
    // after merges es, est, lo, low, ew, ew+est: "low"→[low],
    // "lower"→[low,e,r], "newest"→[n,ewest], "widest"→[w,i,d,est]
    val docs = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expectTokens = Map("low" -> 1L, "lower" -> 3L, "newest" -> 2L,
      "widest" -> 4L)
    corpus.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == ((1L, expectTokens(w))),
        s"doc $i ($w): got ${got(i.toLong)}")
    }
  }

  test("trained-artifact overload reproduces the learn-path tokenization") {
    // applying a pre-trained merge table must equal training in-line —
    // same fold over the same merges — without running the learning loop
    val docs = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", 6)
    val viaArtifact = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaLearn = Bpe.tokenCounts(docs, "doc_id", "text", numMerges = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaArtifact == viaLearn)
  }

  test("stops early when no pairs remain") {
    val docs = Seq("a b c").toDF("text") // three 1-char words: no pairs
    val got = Bpe.learnMerges(docs, "text", 5).count()
    assert(got == 0L)
  }
}
