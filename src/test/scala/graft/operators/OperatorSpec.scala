package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Invariant tests for the pipeline operators (dedup / similarity /
  * text analysis) at sf0.001. Value-level parity with DuckDB is covered
  * by the driver's oracle for q30–q40; these specs pin the semantic
  * invariants the oracles can't express.
  */
class OperatorSpec extends SparkTestBase {

  lazy val docs = Tables.load(spark, sfDir, "documents")
  lazy val embs = Tables.load(spark, sfDir, "embeddings")

  test("exact dedup keeps one row per distinct text with min id") {
    val n = docs.count()
    val d = Dedup.exact(docs, "doc_id", "text")
    assert(d.count() == docs.select("text").distinct().count())
    // fixture texts are unique, so every digest keeps exactly one copy
    assert(d.filter(col("n_copies") =!= 1).count() == 0)
    assert(d.agg(sum("n_copies")).head.getLong(0) == n)
  }

  test("identical texts always share a MinHash band (never a false negative)") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z q")).toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(df, "doc_id", "text", threshold = 0.99).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2L, 1.0)))
  }

  test("incremental dedup reports batch-vs-corpus pairs only") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f"), (2L, "p q r s t u")).toDF("doc_id", "text")
    // 10 and 11 are batch-internal duplicates of each other AND of
    // corpus doc 1; 12 is novel
    val batch = Seq((10L, "a b c d e f"), (11L, "a b c d e f"),
      (12L, "m n o p")).toDF("doc_id", "text")
    val got = Dedup.incrementalMinHashLsh(corpus, batch, "doc_id", "text",
      threshold = 0.99)
      .orderBy("batch_id")
      .select("batch_id", "corpus_id")
      .as[(Long, Long)].collect().toSeq
    // both batch copies match corpus doc 1; the 10–11 internal pair and
    // the novel doc never appear
    assert(got == Seq((10L, 1L), (11L, 1L)))
  }

  test("jaccard is 1 for equal sets and 0 for disjoint sets") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d"))).toDF("x", "y", "z")
    val r = df.select(Dedup.jaccard(col("x"), col("y")), Dedup.jaccard(col("x"), col("z"))).head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("simhash of identical texts is identical; fingerprint is 32 bits") {
    import spark.implicits._
    val df = Seq(("t u v w"), ("t u v w"), ("alpha beta")).toDF("text")
    val fps = df.select(Dedup.simHash32(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps.forall(f => f.length == 32 && f.forall(c => c == '0' || c == '1')))
    assert(fps(0) != fps(2))
  }

  test("simhash band keys: identical docs share all bands, banding partitions the fingerprint") {
    import spark.implicits._
    val df = Seq(("m n o p q r"), ("m n o p q r"), ("zz yy xx ww")).toDF("text")
    val bands = df.select(Dedup.simHashBandKeys(
      Dedup.simHash32(col("text")), bits = 32, bands = 4).as("b")).collect()
      .map(_.getSeq[String](0))
    assert(bands.forall(_.length == 4))
    assert(bands(0) == bands(1))            // identical docs: all bands equal
    assert(bands(0).toSet.intersect(bands(2).toSet).isEmpty ||
      bands(0) != bands(2))                 // different docs differ somewhere
    // band keys carry their index prefix so bands never cross-collide
    bands(0).zipWithIndex.foreach { case (k, i) => assert(k.startsWith(s"$i:")) }
  }

  test("quantized cosine is 1 for a vector with itself") {
    val r = embs.limit(5)
      .select(Dedup.qcosine(Dedup.quantize(col("embedding")),
        Dedup.quantize(col("embedding"))).as("c"))
      .collect()
    assert(r.forall(x => math.abs(x.getDouble(0) - 1.0) < 1e-12))
  }

  test("brute-force top-k returns k ranked neighbors per query, self excluded") {
    val r = Similarity.bruteForceTopK(embs, Seq(0L, 1L), "vec_id", "embedding", 5)
      .collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(rows.forall(_.getLong(2) != q))
      // cosine non-increasing with rank
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF top-k neighbors are a subset of vectors, ranks contiguous") {
    val r = Similarity.ivfTopK(embs, col("vec_id") % 25 === 0, Seq(0L),
      "vec_id", "embedding", k = 5, nprobe = 2).collect()
    assert(r.nonEmpty && r.length <= 5)
    assert(r.map(_.getLong(1)).sorted.toSeq == (1L to r.length).toSeq)
  }

  test("duplicated-span census: shared spans counted, unique spans not") {
    import spark.implicits._
    // docs 1 and 2 share the span "a b c"; doc 3 shares nothing
    val df = Seq((1L, "a b c x"), (2L, "a b c y"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // each 4-word doc has 2 distinct 3-gram spans
    assert(got(1L) == ((2L, 1L, 500L)))
    assert(got(2L) == ((2L, 1L, 500L)))
    assert(got(3L) == ((2L, 0L, 0L)))
  }

  test("containment finds a quoted subset that Jaccard would miss") {
    import spark.implicits._
    // doc 1 (5 words) is verbatim inside doc 2 (20 words): containment
    // of 1 in 2 is 1000 permille while Jaccard is only ~0.22 — below
    // any LSH near-dup threshold
    val contained = "alpha beta gamma delta epsilon"
    val container = contained + " one two three four five six seven " +
      "eight nine ten eleven twelve thirteen fourteen fifteen"
    val df = Seq((1L, contained), (2L, container), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentNearDup(df, "doc_id", "text",
      shingleN = 3, probes = 3, thresholdPermille = 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1000L)))
  }

  test("semantic dedup groups same-cluster near-identical vectors, keeps min id") {
    import spark.implicits._
    // two tight groups far apart; 0/1/2 near-identical, 10/11 near-identical
    def vec(base: Float, eps: Float) =
      Array.tabulate(64)(i => if (i == 0) base + eps else 0.1f)
    val emb = Seq(
      (0L, vec(5f, 0f)), (1L, vec(5f, 0.001f)), (2L, vec(5f, 0.002f)),
      (10L, vec(-5f, 0f)), (11L, vec(-5f, 0.001f))
    ).toDF("vec_id", "embedding")
    val cents = KMeans.lloyd(emb, "vec_id", "embedding", k = 2, iters = 2)
    val got = Dedup.semanticDedup(emb, cents, "vec_id", "embedding", 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L))
    // sub-banded path: near-identical vectors share every band, so the
    // same groups form through the bounded (cluster, band) pair space
    val banded = Dedup.semanticDedup(emb, cents, "vec_id", "embedding",
      0.999, subPlanes = 16, subBands = 4, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(banded == got)
  }

  test("semantic dedup sub-banding keeps a hot cluster sub-quadratic") {
    import spark.implicits._
    // one pathological cluster: 200 vectors, all nearest the single
    // centroid, but pointing in spread-out directions — the fixed-k
    // skew case the all-pairs path cannot survive. Directions rotate
    // through 16 orthogonal axes (plus sign), so hyperplane sign bits
    // differ across most pairs and band buckets stay small.
    val emb = (0 until 200).map { i =>
      val v = Array.fill(64)(0.01f)
      v(i % 16 * 4) = if (i % 2 == 0) 4f + i * 0.01f else -4f - i * 0.01f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val assigned = emb.select(
      org.apache.spark.sql.functions.lit(0).as("cluster"),
      col("vec_id").as("id"),
      Dedup.quantize(col("embedding")).as("v"))
    val nCand = Dedup.semanticCandidates(assigned,
      subPlanes = 32, subBands = 4, dim = 64).count()
    val allPairs = 200L * 199 / 2
    // the banding must prune the hot cluster's pair space hard — well
    // under a tenth of all-pairs on this spread fixture (width-8 bands:
    // unrelated directions collide per band at ~2^-8)
    assert(nCand < allPairs / 10, s"got $nCand of $allPairs pairs")
  }

  test("unigram surprisal: rare words carry more bits, integer-exact") {
    import spark.implicits._
    // corpus of 8 tokens: 'x' appears 4 times (8/4=2 -> 1 bit),
    // 'y' twice (8/2=4 -> 2 bits), 'z' and 'w' once (8 -> 3 bits)
    val df = Seq((1L, "x x x x"), (2L, "y y z w")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((4L, 4L, 1000L)))   // 4 tokens x 1 bit
    assert(got(2L) == ((4L, 10L, 2500L)))  // 2+2+3+3 bits
  }

  test("bigram surprisal: unusual word ORDER costs bits common words don't") {
    import spark.implicits._
    // doc1's 9 tokens tail-zip to 8 bigrams: (a,b)×4, (b,a)×4.
    // doc2 "a a" uses only the corpus's most common WORD, but the
    // ORDER (a following a) is unique. Context counts (as bigram
    // left): c(a)=5, c(b)=4 → bits(a,b)=floor(log2(5/4))=0,
    // bits(b,a)=floor(log2(4/4))=0, bits(a,a)=floor(log2(5/1))=2.
    val df = Seq((1L, "a b a b a b a b a"), (2L, "a a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((8L, 0L, 0L)))     // fluent under the corpus LM
    assert(got(2L) == ((1L, 2L, 2000L)))  // common words, rare order
    // a single-token doc has no bigrams and is absent
    val single = TextAnalysis.bigramSurprisal(
      Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
    assert(single.count() == 0)
  }

  test("int8 top-k ranks by integer dot with vec_id tie-break") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(0.5f, 0.0f)),   // query: q8 = [32, 0]
      (1L, Array(0.4f, 0.0f)),   // dot 32*25 = 800
      (2L, Array(-0.5f, 0.0f)),  // dot -1024
      (3L, Array(0.4f, 0.3f))    // dot 800 — ties with 1, loses on id
    ).toDF("vec_id", "embedding")
    val got = Similarity.int8TopK(df, Seq(0L), "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 800L), (2L, 3L, 800L), (3L, 2L, -1024L)))
  }

  test("int8 rerank equals exact brute force when recall covers the corpus") {
    // with recallK = |corpus|, the int8 stage filters nothing and the
    // rerank IS the exact ranking — the ladder's correctness anchor
    val n = embs.count().toInt
    val exact = Similarity.bruteForceTopK(embs, Seq(0L, 1L), "vec_id",
      "embedding", k = 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ladder = Similarity.int8Rerank(embs, Seq(0L, 1L), "vec_id",
      "embedding", recallK = n, k = 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ladder == exact)
  }

  test("span census, containment, surprisal are partitioning-invariant") {
    // engine-determinism evidence: the same corpus under a different
    // physical partitioning must produce the identical result set
    val base = docs.filter(col("doc_id") < 60) // deterministic subset
    val shuffled = base.repartition(7)
    def set(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(set(Dedup.duplicatedSpans(base, "doc_id", "text", 8)) ==
      set(Dedup.duplicatedSpans(shuffled, "doc_id", "text", 8)))
    assert(set(Dedup.containmentNearDup(base, "doc_id", "text", 3, 4, 600)) ==
      set(Dedup.containmentNearDup(shuffled, "doc_id", "text", 3, 4, 600)))
    assert(set(TextAnalysis.unigramSurprisal(base, "doc_id", "text")) ==
      set(TextAnalysis.unigramSurprisal(shuffled, "doc_id", "text")))
  }

  test("round-6 operators are partitioning-invariant") {
    // classBalance, percentRankMilli, bigramSurprisal, kCorePeel: the
    // same input under a different physical partitioning must produce
    // the identical result set (cross-engine determinism evidence).
    import spark.implicits._
    val base = docs.select("doc_id", "source", "text")
    val shuffled = base.repartition(7)
    def set(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(set(Curation.classBalance(base.drop("text"), "source", "doc_id", 7)) ==
      set(Curation.classBalance(shuffled.drop("text"), "source", "doc_id", 7)))
    assert(set(TextAnalysis.bigramSurprisal(base, "doc_id", "text")) ==
      set(TextAnalysis.bigramSurprisal(shuffled, "doc_id", "text")))
    val vals = (0 until 300).map(i => (s"g${i % 3}", (i * 37 % 101).toDouble))
      .toDF("g", "x")
    assert(set(Stats.percentRankMilli(vals, "g", "x", buckets = 8)) ==
      set(Stats.percentRankMilli(vals.repartition(5), "g", "x", buckets = 8)))
    val edges = Seq((10L, 11L), (11L, 12L), (10L, 12L), (1L, 2L), (2L, 10L))
      .toDF("a", "b")
    assert(set(Graph.kCorePeel(edges, "a", "b", 2, 2)) ==
      set(Graph.kCorePeel(edges.repartition(3), "a", "b", 2, 2)))
  }

  test("heavy hitters: the exact HAVING answer under any partitioning") {
    // the Misra-Gries CANDIDATE set varies with partitioning (each
    // partition keeps its own k survivors); the final output, after
    // the exact recount, must not
    def set(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
    val n = words.count()
    val want = set(words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 30 > n))
    assert(want.nonEmpty) // the fixture must exercise the non-trivial path
    assert(set(TextAnalysis.heavyHitters(docs, "text", 30)) == want)
    assert(set(TextAnalysis.heavyHitters(docs.repartition(1), "text", 30)) == want)
    assert(set(TextAnalysis.heavyHitters(docs.repartition(13), "text", 30)) == want)
  }

  test("canonicalMap keeps the heaviest member, min-id tiebreak; singletons self-map") {
    import spark.implicits._
    val d = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L), (5L, 5L),
      (6L, 7L)).toDF("id", "wt")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("pa", "pb")
    val m = Dedup.canonicalMap(d, "id", "wt", pairs, "pa", "pb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster {1,2,3}: max weight 30 shared by 2 and 3 → min id 2;
    // cluster {4,5}: equal weights → 4; singleton 6 → itself
    assert(m == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L,
      6L -> 6L))
  }

  test("pii scan counts each pattern kind independently") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jo.doe+x@corp.io or 555-123-4567 from 10.0.0.7"),
      (2L, "ssn 123-45-6789 twice 123-45-6789, no email"),
      (3L, "clean text only")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) == ((1L, 1L, 1L, 0L, 3L)))
    assert(got(2L) == ((0L, 0L, 0L, 2L, 2L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("pii redact replaces every hit with its kind tag") {
    import spark.implicits._
    val df = Seq((1L, "mail a@b.co then dial 555-123-4567 at 10.0.0.7 id 123-45-6789"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(df, "doc_id", "text")
      .collect().head.getString(1)
    assert(got == "mail <EMAIL> then dial <PHONE> at <IP> id <SSN>"
      .replace("<IP>", "<IPV4>"))
  }

  test("boilerplate strip drops group-frequent lines, keeps order") {
    import spark.implicits._
    val boiler = "accept cookies"
    val df = Seq(
      (1L, "s1", s"$boiler\nunique alpha\nclosing note"),
      (2L, "s1", s"opening\n$boiler\nunique beta"),
      (3L, "s1", s"unique gamma\n$boiler"),
      (4L, "s2", boiler) // different group: frequency 1 there, kept
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.boilerplateStrip(df, "doc_id", "source", "text",
      minDocs = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("unique alpha\nclosing note", 3L, 1L)))
    assert(got(2L) == (("opening\nunique beta", 3L, 1L)))
    assert(got(3L) == (("unique gamma", 2L, 1L)))
    assert(got(4L) == ((boiler, 1L, 0L))) // other group untouched
  }

  test("canonicalMap rejects weights outside the packed-score contract") {
    import spark.implicits._
    // a raw-token-count weight (≥ 2^20) would silently overflow the
    // weight·2^32 packing and pick wrong keepers — the contract is
    // enforced at runtime, not just documented
    val d = Seq((1L, 1L << 20), (2L, 3L)).toDF("id", "wt")
    val pairs = Seq((1L, 2L)).toDF("pa", "pb")
    val e = intercept[Exception] {
      Dedup.canonicalMap(d, "id", "wt", pairs, "pa", "pb").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("canonicalMap")))
  }

  test("budget fill is partitioning-invariant") {
    def set(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val base = docs.select("doc_id", "source", "n_chars")
    assert(set(Curation.budgetFill(base, "source", "doc_id", "n_chars", 900L)) ==
      set(Curation.budgetFill(base.repartition(7), "source", "doc_id",
        "n_chars", 900L)))
  }

  test("text stats are consistent per document") {
    val r = TextAnalysis.stats(docs, "doc_id", "text").collect()
    r.foreach { row =>
      val (nTok, nTyp) = (row.getLong(1), row.getLong(2))
      assert(nTyp <= nTok)
      assert(math.abs(row.getDouble(3) - nTyp.toDouble / nTok) < 1e-12)
      assert(row.getDouble(5) >= 0.0 && row.getDouble(5) <= 1.0)
    }
  }

  test("quality score stays within [0,1]") {
    val r = TextAnalysis.qualityScore(docs, "doc_id", "text").collect()
    assert(r.forall(x => x.getDouble(1) >= 0.0 && x.getDouble(1) <= 1.0))
  }

  test("language id predicts a known language or 'und'") {
    val langs = TextAnalysis.languageId(docs, "doc_id", "text")
      .select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("curation pipeline drops near-dup losers and low-quality docs") {
    val out = Curation.curate(docs, "doc_id", "text",
      k = 24, bands = 4, rows = 6, nearDupThreshold = 0.8, minQuality = 0.0)
    val survivors = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(all))
    // no verified near-dup pair survives intact
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleN = 2, k = 24, bands = 4, rows = 6, threshold = 0.8).collect()
    pairs.foreach { r =>
      assert(!(survivors.contains(r.getLong(0)) && survivors.contains(r.getLong(1))))
    }
    // a stricter quality gate only shrinks the output
    val strict = Curation.curate(docs, "doc_id", "text",
      k = 24, bands = 4, rows = 6, nearDupThreshold = 0.8, minQuality = 0.8)
    assert(strict.count() <= out.count())
  }

  test("fingerprint digests are stable and distinct for distinct texts") {
    val r = TextAnalysis.fingerprint(docs, "doc_id", "text")
    assert(r.select("digest").distinct().count() == docs.count())
    val again = TextAnalysis.fingerprint(docs, "doc_id", "text")
    assert(r.except(again).count() == 0)
  }
}
