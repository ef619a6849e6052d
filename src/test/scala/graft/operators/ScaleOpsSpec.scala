package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-7 scale/ops operators: consistent-hash sharding, time-decayed
  * counts, row-level snapshot diff, epoch scheduling, grouped split,
  * and RRF's ranker inputs live in [[SearchMixSpec]]. */
class ScaleOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("hashRing: deterministic, collision-free, stable under growth") {
    val r8 = Layout.hashRing(8, 16)
    assert(r8 == Layout.hashRing(8, 16))
    assert(r8.map(_._1).distinct.size == 8 * 16)
    // growing the cluster only ADDS vnodes: the 8-shard ring's
    // positions all survive, at the same shards, in the 9-shard ring
    val r9 = Layout.hashRing(9, 16).toMap
    assert(r8.forall { case (h, s) => r9(h) == s })
  }

  test("consistentShards: ring movement only flows to the new shard") {
    val df = (0L until 500L).toDF("id")
    val per = Layout.consistentShards(df, "id", shards = 8, vnodes = 16)
      .collect()
    // the defining property: adding shard 8 either keeps a key in
    // place or hands it to shard 8 — never shuffles between survivors
    assert(per.forall { r =>
      val (r8, r9) = (r.getLong(3), r.getLong(4))
      r8 == r9 || r9 == 8L
    })
    // and it moves strictly less than modulo rehashing does
    val ringMoved = per.count(r => r.getLong(3) != r.getLong(4))
    val modMoved = per.count(r => r.getLong(1) != r.getLong(2))
    assert(ringMoved < modMoved)
    assert(ringMoved > 0) // something must land on the new shard
  }

  test("decayedCounts: stepped dyadic weights, capped, anchored to max ts") {
    val ev = Seq(
      ("a", "2024-03-01 00:00:00"), // anchor day: h=0, w=1000
      ("a", "2024-02-23 00:00:00"), // 7 days: h=1, w=500
      ("a", "2024-02-27 12:00:00"), // 2.5 days: h=0, w=1000
      ("b", "2023-12-01 00:00:00")) // 91 days: h=13, w=1000/8192=0
      .toDF("k", "s").select(col("k"), col("s").cast("timestamp").as("ts"))
    val got = Events.decayedCounts(ev, "k", "ts", halfLifeDays = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("a") == ((3L, 2500L)))
    assert(got("b") == ((1L, 0L)))
  }

  test("rowDiff: added/removed/changed/same with null-safe column compare") {
    val oldDf = Seq(
      (1L, Some("x"), Some(10L)),
      (2L, Some("y"), None),
      (3L, Some("z"), Some(30L)),
      (4L, None, Some(40L)))
      .toDF("k", "c1", "c2")
    val newDf = Seq(
      (1L, Some("x"), Some(10L)),   // same
      (2L, Some("y"), Some(20L)),   // c2 NULL→20: changed
      (4L, None, Some(41L)),        // c2 changed (NULL c1 on both: same)
      (5L, Some("w"), Some(50L)))   // added
      .toDF("k", "c1", "c2")        // key 3 removed
    val got = Reconcile.rowDiff(oldDf, newDf, "k", Seq("c1", "c2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "added" -> 1L, "removed" -> 1L,
      "rows_changed" -> 2L, "rows_same" -> 1L,
      "col_changed:c1" -> 0L, "col_changed:c2" -> 2L))
  }

  test("rowDiff enforces the keyed-table contract: duplicate and NULL keys raise") {
    val clean = Seq((1L, "a")).toDF("k", "v")
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    val e1 = intercept[Exception](
      Reconcile.rowDiff(dup, clean, "k", Seq("v")).collect())
    assert(e1.getMessage.contains("duplicate or NULL"))
    // a NULL key would never equi-join — a phantom row in every metric,
    // so it raises with a NAMED error instead of a NULL message
    val withNull = Seq((Some(1L), "a"), (None, "b"))
      .toDF("k", "v")
    val e2 = intercept[Exception](
      Reconcile.rowDiff(clean, withNull, "k", Seq("v")).collect())
    assert(e2.getMessage.contains("duplicate or NULL"))
  }

  test("epochSchedule: floor milli-epochs, cap binds small domains") {
    val docs = (Seq.fill(10)("big") ++ Seq.fill(2)("small"))
      .zipWithIndex.map { case (d, i) => (i.toLong, d, "w w w w w") }
      .toDF("id", "domain", "text")
    // tokens: big=50, small=10; budget 1000, shares 50% each, cap 2.5x
    val got = Curation.epochSchedule(docs, "domain",
        size(split(col("text"), " ")).cast("long"),
        Seq("big" -> 500L, "small" -> 500L),
        budgetTokens = 1000L, capMilli = 2500L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    // big: wants 500000/50000 = 10.0 epochs → capped at 2.5 → 125 tokens
    assert(got("big") == ((50L, 2500L, 125L)))
    // small: wants 500000/10000 = 50.0 → capped 2.5 → 25 tokens
    assert(got("small") == ((10L, 2500L, 25L)))
    // un-capped floor case: cap high, shares 300/700
    val free = Curation.epochSchedule(docs, "domain",
        size(split(col("text"), " ")).cast("long"),
        Seq("big" -> 300L, "small" -> 700L),
        budgetTokens = 1000L, capMilli = 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(free("big") == 6000L)    // 300000 div 50 ⇒ 6.0 epochs
    assert(free("small") == 70000L) // 700000 div 10 ⇒ 70.0 epochs
  }

  test("strideInterleave: schedule prefixes hold domains in share proportion") {
    val df = ((1 to 20).map(i => (i.toLong, "a")) ++
      (21 to 30).map(i => (i.toLong, "b"))).toDF("id", "dom")
    val sched = Curation.strideInterleave(df, "id", "dom",
        Seq("a" -> 2000L, "b" -> 1000L))
      .orderBy("sched_pos").collect().map(_.getString(1))
    // share 2:1 ⇒ every 3-prefix has two a's and one b
    (1 to 10).foreach { k =>
      val prefix = sched.take(3 * k)
      assert(prefix.count(_ == "a") == 2 * k, s"prefix ${3 * k}")
    }
    // vt ties (a's rank-2r vs b's rank-r) break by domain name: a first
    assert(sched.take(3).toSeq == Seq("a", "a", "b"))
  }

  test("sharedShingleJaccardPairs equals brute force; eval fields consistent") {
    val docs = Seq(
      (1L, "abcdefgh"), (2L, "abcdefgh"),       // identical
      (3L, "abcdexyzw"), (4L, "qrstuvwx"))      // 3 overlaps 1/2 weakly
      .toDF("doc_id", "text")
    val sh = Dedup.charShingles(col("text"), 3)
    val rows = Dedup.charShingleRows(docs, "doc_id", "text", 3)
    val got = Dedup.sharedShingleJaccardPairs(rows, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over all 6 pairs
    val exact = docs.as("x").crossJoin(docs.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        Dedup.jaccard(Dedup.charShingles(col("x.text"), 3),
          Dedup.charShingles(col("y.text"), 3)).as("j"))
      .filter(col("j") >= 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact && got.contains((1L, 2L)))
    val ev = Dedup.lshCandidateEval(rows,
      k = 12, bands = 3, rows = 4, threshold = 0.1)
      .collect().head
    val (ne, nc, nh) = (ev.getLong(0), ev.getLong(1), ev.getLong(2))
    assert(nh <= math.min(ne, nc))
    // identical docs collide on every band — the (1,2) pair is always hit
    assert(nh >= 1 && ev.getLong(3) == 1000L * nh / ne)
  }

  test("round-7 operators are invariant under repartitioning") {
    val ev = (0 until 300).map { i =>
      (i.toLong, s"t${i % 4}", s"2024-0${1 + i % 3}-0${1 + i % 9} 00:00:00")
    }.toDF("id", "k", "s")
      .select(col("id"), col("k"), col("s").cast("timestamp").as("ts"))
    def decayed(p: Int) = Events.decayedCounts(
      ev.repartition(p), "k", "ts", halfLifeDays = 7).collect().toSet
    assert(decayed(1) == decayed(13))

    val oldDf = (0 until 200).map(i => (i.toLong, i % 7)).toDF("k", "v")
    val newDf = (50 until 250).map(i => (i.toLong, i % 5)).toDF("k", "v")
    def diff(p: Int) = Reconcile.rowDiff(
      oldDf.repartition(p), newDf.repartition(p), "k", Seq("v"))
      .collect().toSeq
    assert(diff(1) == diff(13))

    val ids = (0L until 300L).toDF("id")
    def shards(p: Int) = Layout.consistentShards(
      ids.repartition(p), "id", shards = 4, vnodes = 8).collect().toSet
    assert(shards(1) == shards(13))

    val docs = (0 until 200).map(i => (i.toLong, s"d${i % 5}"))
      .toDF("id", "dom")
    def sched(p: Int) = Curation.strideInterleave(
      docs.repartition(p), "id", "dom",
      Seq("d0" -> 100L, "d1" -> 100L, "d2" -> 50L)).collect().toSet
    assert(sched(1) == sched(13))

    val a = (1 to 30).map(i => (1L, i.toLong, i.toLong))
      .toDF("q", "vec_id", "rank")
    val b = (1 to 30).map(i => (1L, (31 - i).toLong, i.toLong))
      .toDF("q", "vec_id", "rank")
    def fused(p: Int) = Search.rrfFuse(
      Seq(a.repartition(p), b.repartition(p)), "q", "vec_id", "rank",
      k0 = 60, topK = 10).collect().toSet
    assert(fused(1) == fused(13))
  }

  test("aucMicro: perfect separation, midrank ties, degenerate NULL") {
    def auc(rows: Seq[(Boolean, Double)]): Option[Long] = {
      val r = Stats.aucMicro(rows.toDF("y", "s"), col("y"), "s")
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getLong(2))
    }
    // positives strictly above negatives → AUC = 1
    assert(auc(Seq((true, 9.0), (true, 8.0), (false, 2.0), (false, 1.0)))
      .contains(1000000L))
    // all scores tied → AUC = 1/2 by midrank
    assert(auc(Seq((true, 5.0), (true, 5.0), (false, 5.0), (false, 5.0)))
      .contains(500000L))
    // hand case: pos {3, 1}, neg {2, 0} → pairs won 3 of 4 → 0.75
    assert(auc(Seq((true, 3.0), (true, 1.0), (false, 2.0), (false, 0.0)))
      .contains(750000L))
    // single-class input → NULL, not a division error
    assert(auc(Seq((true, 1.0), (true, 2.0))).isEmpty)
  }

  test("topEventNgrams: contiguous per-user n-grams, ordered counts") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "a"))
      .map { case (u, i, t) => (u, i, t, s"2024-01-0$i 00:00:00") }
      .toDF("user_id", "event_id", "event_type", "s")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("s").cast("timestamp").as("ts"))
    val got = Events.topEventNgrams(ev, "user_id", "ts", "event_id",
        "event_type", n = 3, k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // user1: a>b>a, b>a>b; user2: a>b>a — no cross-user grams
    assert(got == Seq("a>b>a" -> 2L, "b>a>b" -> 1L))
  }

  test("groupSample: exactly k per group, insertion-monotone") {
    val df = (0 until 200).map(i => (i.toLong, s"g${i % 4}"))
      .toDF("id", "grp")
    val s1 = Curation.groupSample(df, "grp", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1.size == 20)
    assert(s1.groupBy(_._2).forall(_._2.size == 5))
    // adding rows only displaces: the new sample differs from the old
    // only by displaced members, and retained members keep membership
    val grown = df.unionAll(Seq((1000L, "g0")).toDF("id", "grp"))
    val s2 = Curation.groupSample(grown, "grp", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert((s2 -- s1).forall(_._1 == 1000L) || s2 == s1)
    assert((s1 -- s2).size <= 1)
  }

  test("epochSchedule rejects a zero-token domain instead of emitting NULLs") {
    val docs = Seq((1L, "d0", ""), (2L, "d1", "w w"))
      .toDF("id", "domain", "text")
    // split("") gives [""]: force a genuinely-zero token expression
    val tokens = when(length(col("text")) === 0, 0L)
      .otherwise(size(split(col("text"), " ")).cast("long"))
    val ex = intercept[Exception] {
      Curation.epochSchedule(docs, "domain", tokens,
        Seq("d0" -> 500L, "d1" -> 500L),
        budgetTokens = 1000L, capMilli = 2000L).collect()
    }
    assert(ex.getMessage.contains("no token mass") ||
      Option(ex.getCause).exists(_.getMessage.contains("no token mass")))
  }

  test("groupedSplit: a group never straddles splits") {
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 7}"))
      .toDF("id", "grp")
    val n = Curation.groupedSplit(df, "grp",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .groupBy("grp").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") =!= 1).count()
    assert(n == 0L)
  }
}
