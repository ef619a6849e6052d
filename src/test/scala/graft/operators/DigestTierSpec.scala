package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Equivalence contract of the pluggable digest tier (VERDICT r13
  * item 4): the xx tier swaps the HASH, never the DECISIONS. Hashes
  * themselves differ across tiers by construction, so every check here
  * is decision-level, on fixtures whose similarities are nowhere near
  * hash-marginal (exact duplicates at Jaccard 1.0, disjoint docs at
  * Jaccard 0.0). */
class DigestTierSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // = 1
      (3L, "an entirely different document about spark partitions"),
      (4L, "an entirely different document about spark partitions"), // = 3
      (5L, "completely unrelated text regarding bloom filter sizing"),
      (6L, "the quick brown fox jumps over the lazy dog at noon")) // near 1/2
      .toDF("doc_id", "text")
  }

  private def decisions(tier: Dedup.DigestTier): Set[(Long, Long)] =
    Dedup.minHashLsh(docs, "doc_id", "text", shingleN = 2, k = 24,
        bands = 4, rows = 6, threshold = 0.8, tier = tier)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minHashLsh dedup decisions agree across digest tiers") {
    val md5D = decisions(Dedup.Md5Tier)
    val xxD = decisions(Dedup.XxTier)
    // exact duplicates MUST pair under any hash (identical signatures
    // collide in every band; exact-Jaccard verify passes at 1.0)
    assert(md5D.contains((1L, 2L)) && md5D.contains((3L, 4L)))
    assert(xxD == md5D)
  }

  test("xx-tier digests stay in the 60-bit non-negative domain") {
    // the downstream contracts (mod MinHashPrime, bloomPositions' two
    // 30-bit halves) require [0, 2^60); a raw xxhash64 is signed
    val vals = docs.select(Dedup.XxTier.digest(col("text")).as("d"))
      .collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0L && v < (1L << 60)))
    // and the base hash stays under the MinHash modulus
    val bases = docs
      .select(Dedup.shingleBaseHash(col("text"), Dedup.XxTier).as("b"))
      .collect().map(_.getLong(0))
    assert(bases.forall(b => b >= 0L && b < Dedup.MinHashPrime))
  }

  test("fingerprint decisions agree across tiers: equal texts collide, distinct don't") {
    for (tier <- Seq[Dedup.DigestTier](Dedup.Md5Tier, Dedup.XxTier)) {
      val fp = TextAnalysis.fingerprint(docs, "doc_id", "text", tier)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getString(2))).toMap
      assert(fp(1L) == fp(2L)) // identical text, identical fingerprints
      assert(fp(3L) == fp(4L))
      assert(fp(1L)._1 != fp(3L)._1 && fp(1L)._1 != fp(5L)._1)
      assert(fp(1L)._2 != fp(3L)._2)
      // note: WHICH grams are the 4 minima is hash-dependent, so
      // near-dup robust-digest collisions are legitimately tier-
      // specific — only the equal↔equal / distinct↔distinct decisions
      // are the cross-tier contract
      assert(fp(1L)._1 != fp(6L)._1) // tail edit must flip the digest
    }
  }

  test("Column digest and driver digestOf agree bit-for-bit, per tier") {
    import spark.implicits._
    val inputs = (0 until 50).map(i => s"probe:$i:${"x" * (i % 7)}")
    for (tier <- Seq[Dedup.DigestTier](Dedup.Md5Tier, Dedup.XxTier)) {
      val colSide = inputs.toDF("s")
        .select(tier.digest(col("s")).as("d")).collect().map(_.getLong(0))
      assert(colSide.toSeq == inputs.map(tier.digestOf),
        s"tier $tier: engine and driver digests desynced")
    }
  }

  test("zone Bloom audit never false-negatives, on either tier") {
    import spark.implicits._
    // zones 0..3 each hold distinct values; probe values that ARE in a
    // zone must always be maybe'd there (n_maybe >= n_hits is the
    // Bloom guarantee; equality would additionally mean zero FPs)
    val rows = (0L until 200L).map(i => (i % 4, s"v${i % 50}"))
      .toDF("z", "v")
    for (tier <- Seq[Dedup.DigestTier](Dedup.Md5Tier, Dedup.XxTier)) {
      val audit = Layout.zoneBloomAudit(rows, col("z"), "v",
          probes = Seq("v0", "v7", "nope"), bits = 4096, kHash = 4,
          tier = tier)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // gcd(50, 4) = 2, so each value lands in exactly 2 of the 4
      // zones (v0 at i = 0,50,100,150 → zones 0,2; v7 → zones 3,1)
      assert(audit("v0")._2 == 2L && audit("v0")._3 >= 2L, s"$tier")
      assert(audit("v7")._2 == 2L && audit("v7")._3 >= 2L, s"$tier")
      assert(audit("nope")._2 == 0L, s"$tier")
    }
  }

  test("bloom contamination gate: every exact hit is maybe'd, per tier") {
    for (tier <- Seq[Dedup.DigestTier](Dedup.Md5Tier, Dedup.XxTier)) {
      val out = Curation.bloomContamination(
          docs.withColumn("bench", col("doc_id") <= 2L),
          "doc_id", "text", col("bench"), bits = 65536, kHash = 4,
          tier = tier)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      // no false negatives: n_maybe >= n_exact for every probed doc
      assert(out.nonEmpty && out.forall { case (_, exact, maybe) =>
        maybe >= exact }, s"$tier: $out")
      // doc 5 shares no bigrams with the bench docs — exact must be 0;
      // doc 6 shares the "the quick brown fox…" prefix — exact > 0
      assert(out.find(_._1 == 5L).exists(_._2 == 0L), s"$tier")
      assert(out.find(_._1 == 6L).exists(_._2 > 0L), s"$tier")
    }
  }

  test("default tier is md5 (the oracle-checked configuration)") {
    // the no-tier call and the explicit Md5Tier call are the same
    // plan — the driver's 261 green oracles bind the default
    val a = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.fingerprint(docs, "doc_id", "text", Dedup.Md5Tier)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(decisions(Dedup.Md5Tier) ==
      Dedup.minHashLsh(docs, "doc_id", "text", shingleN = 2, k = 24,
          bands = 4, rows = 6, threshold = 0.8)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
