package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-8 mining operators: [[Search.phraseSearch]],
  * [[Similarity.int8HardNegatives]],
  * [[FuzzyJoin.closestPairsByEditDistance]],
  * [[Events.concurrencySweep]], [[TextAnalysis.languageMixture]]. */
class MiningOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("phraseSearch counts adjacent in-order occurrences only") {
    val docs = Seq(
      (1L, "big red fox and big red dog"),   // 2 matches of "big red"
      (2L, "red big fox"),                   // reversed — no match
      (3L, "big blue red fox"),              // gap — no match
      (4L, "big red"))                       // 1 match
      .toDF("doc_id", "text")
    val got = Search.phraseSearch(docs, "doc_id", "text",
      Seq("big", "red"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (4L, 1L)))
  }

  test("phraseSearch handles 3-token phrases and overlapping repeats") {
    val docs = Seq(
      (1L, "a b a b a"),   // "a b a" starts at 0 and 2
      (2L, "a b b a"))
      .toDF("doc_id", "text")
    val got = Search.phraseSearch(docs, "doc_id", "text",
      Seq("a", "b", "a"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("hard negatives exclude self, same-label, and NULL-label rows") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), Some(1)),
      (1L, Array(1.0f, 0.01f), Some(1)),   // same label — excluded
      (2L, Array(0.99f, 0.0f), Some(2)),   // the hardest negative
      (3L, Array(0.5f, 0.5f), Some(2)),
      (4L, Array(1.0f, 0.0f), None))       // NULL label — excluded
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.int8HardNegatives(vecs, Seq(0L), "vec_id",
      "embedding", "label", k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got.map(_._1) == Seq(2L, 3L))
    assert(got.forall(_._2 == 2L))
  }

  test("closestPairsByEditDistance blocks on the token prefix") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delts"),   // dist 1, same block
      (3L, "alpha beta totally different tail"),
      (4L, "zeta eta gamma delta"))     // other block — never paired
      .toDF("doc_id", "text")
    val got = FuzzyJoin.closestPairsByEditDistance(docs, "doc_id", "text",
      blockTokens = 2, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.head == ((1L, 2L, 1L)))
    // doc 4 shares no block with anyone → appears in no pair
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    // within-block completeness: all three same-block pairs present
    assert(got.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("concurrencySweep: closed intervals, boundary-inclusive counts") {
    val iv = Seq(
      (1L, 10L, 20L),
      (2L, 15L, 25L),
      (3L, 20L, 30L),   // starts exactly when #1 ends — both open at 20
      (4L, 40L, 41L))
      .toDF("id", "s", "e")
    val got = Events.concurrencySweep(iv, "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(10L) == 1L)
    assert(got(15L) == 2L)
    assert(got(20L) == 3L)   // 1 still open, 2 open, 3 starting
    assert(got(25L) == 2L)   // 1 closed before 25; 2 and 3 open
    assert(got(30L) == 1L)
    assert(got(40L) == 1L)   // the gap fully reset the count
  }

  test("concurrencySweep drops NULL-bounded intervals, stated contract") {
    val iv = Seq(
      (1L, Some(10L), Some(20L)),
      (2L, None, Some(25L)),
      (3L, Some(15L), None))
      .toDF("id", "s", "e")
    val got = Events.concurrencySweep(iv, "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 1L, 20L -> 1L))
  }

  test("languageMixture ranks top two languages with fold tie rules") {
    val docs = Seq(
      (1L, "the of der die la"),      // en=2 de=2 fr=1 → en, de (order)
      (2L, "xyz qrs"),                // no markers → und/und
      (3L, "el los y la le the"))     // es=3 fr=2 en=1 → es, fr
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageMixture(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got(0) == ((1L, "en", 2L, "de", 2L, 1000L)))
    assert(got(1) == ((2L, "und", 0L, "und", 0L, 0L)))
    assert(got(2) == ((3L, "es", 3L, "fr", 2L, 666L)))
  }

  test("knnLabelNoise: clean point scores 0, planted mislabel scores 1000") {
    // cluster A near (1,0) labeled 1 — except vec 3, planted label 2;
    // cluster B near (0,1) labeled 2. k=3 keeps audits inside clusters.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), Some(1)),
      (1L, Array(0.99f, 0.01f), Some(1)),
      (2L, Array(0.98f, 0.02f), Some(1)),
      (3L, Array(0.97f, 0.03f), Some(2)),     // the mislabel
      (10L, Array(0.0f, 1.0f), Some(2)),
      (11L, Array(0.01f, 0.99f), Some(2)),
      (12L, Array(0.02f, 0.98f), Some(2)),
      (13L, Array(0.03f, 0.97f), None))       // unlabeled: never a voter
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelNoise(vecs, col("vec_id").isin(0L, 3L, 10L),
      "vec_id", "embedding", "label", k = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(0L) == ((1L, 0L, 0L)))     // neighbors 1,2 both agree
    assert(got(3L) == ((2L, 2L, 1000L)))  // both neighbors vote against
    assert(got(10L) == ((2L, 0L, 0L)))    // clean cluster-B point
  }

  test("interArrivalBurstiness: metronome ~0, bursty high, short users dropped") {
    def evs(uid: Long, gapsS: Seq[Long]): Seq[(Long, Long, java.sql.Timestamp)] = {
      val ts = gapsS.scanLeft(0L)(_ + _)
      ts.zipWithIndex.map { case (t, i) =>
        (uid * 1000 + i, uid, new java.sql.Timestamp(t * 1000L))
      }
    }
    // user 1: 24 exact 10s gaps (CV²=0); user 2: bursts — 23×1s + one
    // 1000s lull; user 3: only 3 events (below minGaps)
    val rows = evs(1L, Seq.fill(24)(10L)) ++
      evs(2L, Seq.fill(23)(1L) :+ 1000L) ++
      evs(3L, Seq(5L, 5L, 5L))
    val df = rows.toDF("event_id", "user_id", "ts")
    val got = Events.interArrivalBurstiness(df, "user_id", "ts",
      minGaps = 20, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._2 == 0L)
    assert(got(2L)._2 > 5000000L, s"bursty user scored ${got(2L)._2}")
  }

  test("joinAmplification: products of multiplicities, NULL keys silent") {
    val l = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("k")
    val r = Seq(Some(1L), Some(1L), Some(3L), None).toDF("j")
    val got = Layout.joinAmplification(l, "k", r, "j", k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    // key 1: 3×2=6 output rows; keys 2 and 3 are one-sided → absent;
    // NULL joins nothing → absent
    assert(got == Seq((1L, 3L, 2L, 6L)))
    // the audit's prediction equals the real inner join's output size
    val real = l.join(r, col("k") === col("j")).count()
    assert(real == got.map(_._4).sum)
  }

  test("latenessAudit buckets out-of-order arrivals against the running max") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // arrival order (event_id): t=100, then 95 (5s late), then 200,
    // then 30 (170s late), then 200 (on time — equals running max)
    val ev = Seq(
      (1L, "a", ts(100L)), (2L, "a", ts(95L)), (3L, "a", ts(200L)),
      (4L, "a", ts(30L)), (5L, "a", ts(200L)))
      .toDF("event_id", "event_type", "ts")
    val got = Events.latenessAudit(ev, "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(("0_on_time", 3L, 600L),
      ("1_under_10s", 1L, 200L), ("3_under_10m", 1L, 200L)))
  }

  test("centroidDrift: exact squared-L2 of means, NULL labels dropped") {
    // label 1: slice A means (1.0, 0.0); slice B means (0.5, 0.5)
    //   → drift = 0.25 + 0.25 = 0.5 → 500000 micro
    // label 2: identical slices → 0
    val a = Seq(
      (1L, Array(1.0f, 0.0f), Some(1)),
      (2L, Array(1.0f, 0.0f), Some(1)),
      (3L, Array(0.2f, 0.8f), Some(2)),
      (4L, Array(0.2f, 0.8f), None))
      .toDF("vec_id", "embedding", "label")
    val b = Seq(
      (11L, Array(0.5f, 0.5f), Some(1)),
      (13L, Array(0.2f, 0.8f), Some(2)))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidDrift(a, b, "label", "embedding")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set(1L, 2L))  // the NULL-label vector vanished
    assert(got(1L) == ((2L, 1L, 500000L)))
    assert(got(2L) == ((1L, 1L, 0L)))
  }

  test("paddingAudit: cap ladder, truncation at the top, exact waste") {
    val docs = Seq(
      "a b c",                            // 3 tokens → cap 4, pad 1
      "a b c d",                          // 4 → cap 4, pad 0
      "a b c d e",                        // 5 → cap 8, pad 3
      ("x " * 20).trim)                   // 20 → kept 8, trunc 12, pad 0
      .toDF("text")
    val got = Curation.paddingAudit(docs, "text", Seq(4L, 8L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (4L, 2L, 7L, 1L, 0L, 125L),   // 1 pad over 8 slots → 125‰
      (8L, 2L, 13L, 3L, 12L, 187L)))
  }

  test("thresholdSweep: monotone counts, integer cutoffs, zero rows report") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Dedup.thresholdSweep(docs, "doc_id", "text",
      shingleN = 2, k = 24, bands = 4, rows = 6,
      thresholdsPermille = Seq(500L, 800L, 999L, 1000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(500L, 800L, 999L, 1000L))
    // raising the cutoff can only shrink both counts
    assert(got.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._3 >= b._3 })
    // 800‰ must agree with the production q31 pair count
    val q31 = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleN = 2, k = 24, bands = 4, rows = 6, threshold = 0.8).count()
    assert(got.find(_._1 == 800L).get._2 == q31)
    // every threshold reports a row even if nothing survives
    assert(got.length == 4)
  }

  test("contaminationSweep: larger n flags less; matches contamination at n=2") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = col("doc_id") % 50 === 0
    val got = Curation.contaminationSweep(docs, "doc_id", "text", bench,
      ns = Seq(2, 3, 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(2L, 3L, 4L))
    // same non-bench doc count at every n
    assert(got.map(_._2).distinct.size == 1)
    // longer shingles can only reduce the corpus-level hit mass
    assert(got(0)._4 >= got(1)._4 && got(1)._4 >= got(2)._4)
    // n=2 corpus permille must reproduce the production q49 scan
    val c = Curation.contamination(docs, "doc_id", "text", bench)
      .agg(org.apache.spark.sql.functions.sum("n_contaminated").as("snc"),
        org.apache.spark.sql.functions.sum("n_shingles").as("sns"))
      .selectExpr("(1000 * snc) div sns").as[Long].head()
    assert(got(0)._4 == c)
  }

  test("int8TopKForIds matches the literal-list rung on the same ids") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ids = Seq(0L, 3L, 7L).toDF("id")
    val byIds = Similarity.int8TopKForIds(emb, ids, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val byList = Similarity.int8TopK(emb, Seq(0L, 3L, 7L), "vec_id",
        "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(byIds == byList && byIds.nonEmpty)
  }

  test("triplet negatives never share the anchor's near-dup component") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleN = 2, k = 24, bands = 4, rows = 6, threshold = 0.8)
    val comps = Graph.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trip = graft.SparkEntry.queries("q216_triplet_mining")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(trip.nonEmpty)
    trip.foreach { case (a, p, n) =>
      // positive IS in the anchor's component; negative is NOT
      assert(comps(a) == comps(p))
      assert(!comps.get(n).contains(comps(a)), s"anchor $a negative $n")
    }
  }

  test("zoneBloomAudit: Blooms never miss; sized filters skip absent probes") {
    val rows = Seq((0L, "a"), (0L, "b"), (1L, "c"), (2L, "a"))
      .toDF("z", "v")
    def audit(bits: Int) = Layout.zoneBloomAudit(rows, col("z"), "v",
      probes = Seq("a", "c", "zz"), bits = bits, kHash = 2)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // invariants hold at ANY size: exact hits, never-miss, accounting
    for (m <- Seq(audit(32), audit(4096))) {
      assert(m("a")._2 == 2L && m("c")._2 == 1L && m("zz")._2 == 0L)
      m.values.foreach { case (nz, hits, maybe, fp, skip) =>
        assert(nz == 3L)
        assert(maybe >= hits)            // a Bloom never misses
        assert(fp == maybe - hits && skip == nz - maybe)
      }
    }
    // a well-sized filter admits no false positives on this fixture
    audit(4096).values.foreach { case (_, _, _, fp, _) => assert(fp == 0L) }
    assert(audit(4096)("zz")._5 == 3L)   // absent probe skips every zone
  }

  test("cross-lingual dups: different langs only, subset of unblocked pairs") {
    val got = graft.SparkEntry.queries("q218_crosslingual_dups")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, la, lb) =>
      assert(a < b)
      assert(la != lb, s"pair ($a,$b) has same lang $la")
    }
    // every reported pair must verify in the unblocked cosine pair set
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = Dedup.embeddingCosineLsh(emb, "vec_id", "embedding",
        blockCols = Seq(), dim = 64, nPlanes = 16, bands = 4,
        threshold = 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (a, b, _, _) => assert(all.contains((a, b))) }
  }

  test("token funnel: stages only shrink, in docs and in tokens") {
    val got = graft.SparkEntry.queries("q220_token_funnel")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq ==
      Seq("0_raw", "1_exact", "2_canonical", "3_quality"))
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, s"${b._1} grew in docs")
      assert(a._3 >= b._3, s"${b._1} grew in tokens")
    }
    // the funnel actually cuts something on this corpus
    assert(got.head._2 > got.last._2 && got.head._3 > got.last._3)
  }

  test("languageMixture agrees with languageId on the argmax") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mix = TextAnalysis.languageMixture(docs, "doc_id", "text")
      .select(col("doc_id"), col("top_lang"))
    val lid = TextAnalysis.languageId(docs, "doc_id", "text")
      .select(col("doc_id"), col("predicted_lang"))
    val diff = mix.join(lid, "doc_id")
      .filter(col("top_lang") =!= col("predicted_lang"))
    assert(diff.count() == 0)
  }
}
