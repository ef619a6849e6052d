package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-9 operators: [[Stats.cohenKappa]], [[Stats.bootstrapMeanCI]],
  * [[Stats.clusterGini]], [[TextAnalysis.zipfDoubling]],
  * [[TextAnalysis.termLift]], [[Multimodal.averageHash64]] /
  * [[Multimodal.ahashNearDup]], [[Curation.chunkDocs]] /
  * [[Curation.chunkingReport]]. Hand-computed fixtures plus
  * partitioning-invariance checks.
  */
class Round9OpsSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------ kappa

  test("cohenKappa: the textbook 2x2 example is exact") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no:
    // po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
        Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert(r.getAs[Long]("n") == 50)
    assert(r.getAs[Long]("n_agree") == 35)
    assert(r.getAs[Long]("po_milli") == 700)
    assert(r.getAs[Long]("pe_milli") == 500)
    assert(r.getAs[Double]("kappa") == 0.4)
  }

  test("cohenKappa: perfect agreement is 1.0, NULLs are excluded") {
    val rows = Seq(("x", "x"), ("y", "y"), ("x", "x"), (null, "x"),
      ("y", null)).toDF("a", "b")
    val r = Stats.cohenKappa(rows, "a", "b").collect().head
    assert(r.getAs[Long]("n") == 3)
    assert(r.getAs[Double]("kappa") == 1.0)
  }

  test("cohenKappa: majority-spam classifier scores near zero") {
    // truth is 50/50; classifier always says "a": po = 0.5, pe = 0.5
    val rows = (0 until 40).map(i => ("a", if (i % 2 == 0) "a" else "b"))
    val r = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert(r.getAs[Double]("kappa") == 0.0)
  }

  // -------------------------------------------------------- bootstrap

  test("bootstrapMeanCI: constant values collapse the interval") {
    val df = (1 to 200).map(i => ("g", i.toLong, 7.0)).toDF("s", "id", "v")
    val r = Stats.bootstrapMeanCI(df, "s", "id", "v",
      reps = 16, loRank = 2, hiRank = 15).collect().head
    assert(r.getAs[Double]("mean") == 7.0)
    assert(r.getAs[Double]("ci_lo") == 7.0)
    assert(r.getAs[Double]("ci_hi") == 7.0)
    assert(r.getAs[Long]("reps") == 16)
  }

  test("bootstrapMeanCI: brackets the mean and is partition-invariant") {
    val df = (1 to 500).map(i => ("g", i.toLong, (i % 100).toDouble))
      .toDF("s", "id", "v")
    val a = Stats.bootstrapMeanCI(df, "s", "id", "v", 40, 2, 39)
      .collect().head
    assert(a.getAs[Double]("ci_lo") <= a.getAs[Double]("mean"))
    assert(a.getAs[Double]("mean") <= a.getAs[Double]("ci_hi"))
    assert(a.getAs[Double]("ci_lo") < a.getAs[Double]("ci_hi"))
    val b = Stats.bootstrapMeanCI(df.repartition(7), "s", "id", "v",
      40, 2, 39).collect().head
    assert(a.getAs[Double]("ci_lo") == b.getAs[Double]("ci_lo"))
    assert(a.getAs[Double]("ci_hi") == b.getAs[Double]("ci_hi"))
  }

  // ------------------------------------------------------------- gini

  test("clusterGini: hand-computed impurity and majority") {
    val df = (Seq.fill(3)((0L, "a")) ++ Seq.fill(1)((0L, "b")) ++
      Seq.fill(5)((1L, "c"))).toDF("cluster", "label")
    val rows = Stats.clusterGini(df, "cluster", "label")
      .orderBy("cluster").collect()
    // cluster 0: n=4, sumsq=9+1=10, gini = 1000*(16-10)/16 = 375
    assert(rows(0).getAs[Long]("n") == 4)
    assert(rows(0).getAs[Long]("n_labels") == 2)
    assert(rows(0).getAs[String]("majority_label") == "a")
    assert(rows(0).getAs[Long]("majority_milli") == 750)
    assert(rows(0).getAs[Long]("gini_milli") == 375)
    // cluster 1 is pure
    assert(rows(1).getAs[Long]("gini_milli") == 0)
    assert(rows(1).getAs[Long]("majority_milli") == 1000)
  }

  test("clusterGini: majority ties break to the smaller label") {
    val df = Seq((0L, "b"), (0L, "a")).toDF("cluster", "label")
    val r = Stats.clusterGini(df, "cluster", "label").collect().head
    assert(r.getAs[String]("majority_label") == "a")
    assert(r.getAs[Long]("gini_milli") == 500)
  }

  // ------------------------------------------------------------- zipf

  test("zipfDoubling: known frequency ladder") {
    // f: t1=8, t2=4, t3=2, t4=1 -> ranks 1..4
    val text = (Seq.fill(8)("t1") ++ Seq.fill(4)("t2") ++
      Seq.fill(2)("t3") ++ Seq("t4")).mkString(" ")
    val rows = TextAnalysis.zipfDoubling(Seq(text).toDF("text"), "text",
      maxPow = 2).collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 4L))
    assert(rows(0).getAs[String]("term") == "t1")
    assert(rows(0).getAs[Long]("f_r") == 8 &&
      rows(0).getAs[Long]("f_2r") == 4 &&
      rows(0).getAs[Long]("ratio_milli") == 2000)
    assert(rows(1).getAs[Long]("f_2r") == 1 &&
      rows(1).getAs[Long]("ratio_milli") == 4000)
    // rank 4's doubling partner (rank 8) is past the vocabulary
    assert(rows(2).isNullAt(rows(2).fieldIndex("f_2r")))
  }

  // ------------------------------------------------------------- lift

  test("termLift: perfect co-occurrence is 1000 permille x N/df") {
    // a and b in all 4 docs: lift = 4*4*1000/(4*4) = 1000
    // a and c in 2 of 4: lift = 2*4*1000/(4*2) = 1000? no: n_ab=2,
    // n_a=4, n_c=2 -> 2*4*1000/(4*2) = 1000 (c only appears with a)
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b"), (4L, "a b")
    ).toDF("id", "text")
    val rows = TextAnalysis.termLift(docs, "id", "text", topM = 3)
      .collect().map(r => (r.getAs[String]("term_a"),
        r.getAs[String]("term_b"), r.getAs[Long]("n_ab"),
        r.getAs[Long]("lift_milli"))).toSeq
    assert(rows.contains(("a", "b", 4L, 1000L)))
    assert(rows.contains(("a", "c", 2L, 1000L)))
    assert(rows.contains(("b", "c", 2L, 1000L)))
  }

  test("termLift: anti-correlated pair is below 1000") {
    // x in docs 1-2, y in docs 3-4, z everywhere: x,y never co-occur
    // (omitted); x,z lift = 2*4*1000/(2*4) = 1000
    val docs = Seq((1L, "x z"), (2L, "x z"), (3L, "y z"), (4L, "y z"))
      .toDF("id", "text")
    val rows = TextAnalysis.termLift(docs, "id", "text", topM = 3)
      .collect()
    assert(!rows.exists(r => r.getAs[String]("term_a") == "x" &&
      r.getAs[String]("term_b") == "y"))
    assert(rows.length == 2) // (x,z) and (y,z)
  }

  // ------------------------------------------------------------ ahash

  test("averageHash64: 4 bands, 16-bit range, deterministic") {
    val media = Multimodal.mediaTable(
      Seq((1L, "alpha beta gamma delta", "en", "s", 22L),
        (2L, "alpha beta gamma delta", "en", "s", 22L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Multimodal.averageHash64(media).collect()
    def bandsOf(id: Long): Seq[Long] = {
      val r = rows.find(_.getAs[Long]("media_id") == id).get
      r.getSeq[Long](r.fieldIndex("bands"))
    }
    val b1 = bandsOf(1)
    val b2 = bandsOf(2)
    assert(b1.length == 4 && b1.forall(b => b >= 0 && b < 65536))
    assert(b1 == b2) // identical payloads hash identically
  }

  test("ahashNearDup: byte-identical payloads pair at distance 0") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about spark query planning"),
      (4L, "yet another unrelated text concerning parquet column pruning"))
    val media = Multimodal.mediaTable(texts
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val pairs = Multimodal.ahashNearDup(media, maxHamming = 3)
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("media_id_a") == 1 &&
      r.getAs[Long]("media_id_b") == 2 && r.getAs[Long]("hamming") == 0))
    assert(pairs.forall(r => r.getAs[Long]("hamming") <= 3))
  }

  // --------------------------------------------------------- chunking

  test("chunkDocs: window geometry and content digests") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val rows = Curation.chunkDocs(Seq((1L, text)).toDF("id", "text"),
        "id", "text", chunkTokens = 4, stride = 3)
      .orderBy("chunk_ord").collect()
    assert(rows.map(_.getAs[Long]("start_tok")).toSeq ==
      Seq(0L, 3L, 6L, 9L))
    assert(rows.map(_.getAs[Long]("n_tok")).toSeq == Seq(4L, 4L, 4L, 1L))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(0).getAs[String]("chunk_digest") == md5hex("w1 w2 w3 w4"))
    assert(rows(3).getAs[String]("chunk_digest") == md5hex("w10"))
  }

  test("chunkDocs: every token is covered at least once") {
    val text = (1 to 23).map(i => s"t$i").mkString(" ")
    val rows = Curation.chunkDocs(Seq((1L, text)).toDF("id", "text"),
      "id", "text", chunkTokens = 5, stride = 5).collect()
    assert(rows.map(_.getAs[Long]("n_tok")).sum == 23)
  }

  // -------------------------------------------------- retrieval evals

  test("filteredRecall: hand-computed post-filter loss") {
    // query 0 = (1,0); neighbors by cosine: v1 > v2 > v3. Only v2/v3
    // are eligible (even label); over-fetch 2 catches v1,v2 -> one
    // survivor, one gold hit of two -> recall 500.
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(1.0f, 0.001f), 1),
      (2L, Array(1.0f, 0.01f), 2),
      (3L, Array(1.0f, 0.1f), 2)).toDF("vec_id", "embedding", "label")
    val r = Similarity.filteredRecall(rows, col("label") % 2 === 0,
      Seq(0L), "vec_id", "embedding", k = 2, overFetch = 2)
      .collect().head
    assert(r.getAs[Long]("n_gold") == 2)
    assert(r.getAs[Long]("n_survivors") == 1)
    assert(r.getAs[Long]("n_hit") == 1)
    assert(r.getAs[Long]("recall_milli") == 500)
  }

  test("filteredRecall: zero-gold queries report n_gold=0, NULL recall") {
    // Nothing satisfies the predicate: the audit's worst case must
    // surface as a row, not vanish (the query-set anchor).
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(1.0f, 0.001f), 1),
      (2L, Array(1.0f, 0.01f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.filteredRecall(rows, col("label") % 2 === 0,
      Seq(0L, 1L), "vec_id", "embedding", k = 2, overFetch = 2)
      .orderBy("query_id").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_gold") == 0)
      assert(r.getAs[Long]("n_survivors") == 0)
      assert(r.getAs[Long]("n_hit") == 0)
      assert(r.isNullAt(r.fieldIndex("recall_milli")))
    }
  }

  test("nprobeSweep: recall is monotone and exhaustive probing is exact") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = KMeans.lloyd(em, "vec_id", "embedding", k = 4, iters = 1)
      .withColumnRenamed("cluster", "cluster")
    val rows = Similarity.nprobeSweep(em, cents, Seq(0L, 1L, 2L),
      "vec_id", "embedding", k = 5, maxNprobe = 4).collect()
    val recalls = rows.map(_.getAs[Long]("recall_milli")).toSeq
    assert(recalls == recalls.sorted)
    assert(recalls.last == 1000) // all 4 clusters probed = brute force
  }

  test("hubnessAudit: occurrence mass conserves sample_size * k") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val rows = Similarity.hubnessAudit(em, col("vec_id") < 50,
      "vec_id", "embedding", k = 5).collect()
    val slots = rows.map(r => r.getAs[Long]("k_occurrence") *
      r.getAs[Long]("n_vecs")).sum
    assert(slots == 50L * 5)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == 50L)
  }

  // ----------------------------------------------------- autocorr

  test("hourlyAutocorr: alternating series gives r(1) = -1, r(2) = 1") {
    // hour h gets 5 events when even, 1 when odd, over 9 hours
    val rows = (0 until 9).flatMap { h =>
      val c = if (h % 2 == 0) 5 else 1
      Seq.fill(c)(java.sql.Timestamp.valueOf(
        s"2024-01-01 ${"%02d".format(h)}:30:00"))
    }.map(Tuple1(_)).toDF("ts")
    val got = Events.hourlyAutocorr(rows, "ts", Seq(1, 2)).collect()
    // sqrt(a)*sqrt(a) reconstructs the variance only to ulp precision
    assert(got(0).getAs[Long]("lag") == 1 &&
      math.abs(got(0).getAs[Double]("r") + 1.0) < 1e-12)
    assert(got(1).getAs[Long]("lag") == 2 &&
      math.abs(got(1).getAs[Double]("r") - 1.0) < 1e-12)
    assert(got(0).getAs[Long]("n_pairs") == 8)
  }

  test("hourlyAutocorr: empty hours are zero-filled, not spliced") {
    // events only at hours 0 and 4: the grid must span 5 hours, so
    // lag-1 pairs = 4 (with zeros), not 1
    val rows = Seq("2024-01-01 00:10:00", "2024-01-01 04:10:00")
      .map(s => Tuple1(java.sql.Timestamp.valueOf(s))).toDF("ts")
    val got = Events.hourlyAutocorr(rows, "ts", Seq(1)).collect().head
    assert(got.getAs[Long]("n_pairs") == 4)
  }

  // -------------------------------------------------- class scatter

  test("classScatter: hand-computed two-class geometry") {
    // 0.5f is exact in float, so quantization is exactly 5000:
    // within_l = 125e6 - 225e6/2 = 12.5e6 each; between_l = 56.25e6
    val rows = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(0.5f, 0.0f)),
      (1, Array(0.0f, 1.0f)), (1, Array(0.0f, 0.5f)))
      .toDF("label", "embedding")
    val r = Similarity.classScatter(rows, "label", "embedding")
      .collect().head
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("n_labels") == 2)
    assert(r.getAs[Long]("within_ss") == 25000000L)
    assert(r.getAs[Long]("between_ss") == 112500000L)
    assert(r.getAs[Double]("separation") == 4.5)
  }

  test("classScatter: label-free geometry separates at ~zero") {
    // identical distribution under both labels: between ~ 0
    val rows = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(0.0f, 1.0f)),
      (1, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("label", "embedding")
    val r = Similarity.classScatter(rows, "label", "embedding")
      .collect().head
    assert(r.getAs[Long]("between_ss") <= 0L) // floor of exact 0
    assert(r.getAs[Long]("within_ss") > 0L)
  }

  // ------------------------------------------------- vocab growth

  test("vocabGrowth: first appearances land in the right bucket") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"), (4L, "d"))
      .toDF("id", "text")
    val rows = TextAnalysis.vocabGrowth(docs, "id", "text", nBuckets = 2)
      .collect()
    assert(rows.map(_.getAs[Long]("new_terms")).toSeq == Seq(3L, 1L))
    assert(rows.map(_.getAs[Long]("cum_vocab")).toSeq == Seq(3L, 4L))
    assert(rows.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 3L))
    assert(rows.map(_.getAs[Long]("cum_tokens")).toSeq == Seq(4L, 7L))
  }

  // ------------------------------------------------- data quality

  test("fdAudit: only violated lhs values, NULL rhs is a value") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"),
      ("c", "x"), ("c", null)).toDF("l", "r")
    val rows = DataQuality.fdAudit(df, "l", "r", topN = 10).collect()
    assert(rows.map(_.getAs[String]("lhs")).toSeq == Seq("a", "c"))
    assert(rows(0).getAs[Long]("n_rows") == 3 &&
      rows(0).getAs[Long]("n_rhs_values") == 2)
    assert(rows(1).getAs[Long]("n_rhs_values") == 2) // x and NULL
  }

  test("refIntegrity: orphans counted, NULL FKs separated") {
    val child = Seq(Some(1L), Some(2L), Some(3L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 2L).toDF("pk")
    val r = DataQuality.refIntegrity(child, "fk", parent, "pk")
      .collect().head
    assert(r.getAs[Long]("n_child") == 4)
    assert(r.getAs[Long]("n_null_fk") == 1)
    assert(r.getAs[Long]("n_orphans") == 1)
    assert(r.getAs[Long]("orphan_permille") == 333)
  }

  test("benfordAudit: cents digits, exclusions, all nine rows") {
    val df = Seq(Some(1.0), Some(2.5), Some(0.0), Some(-3.0),
      Some(19.99), None).toDF("v")
    val rows = DataQuality.benfordAudit(df, "v").collect()
    assert(rows.length == 9)
    val d1 = rows.find(_.getAs[Long]("digit") == 1).get
    assert(d1.getAs[Long]("n") == 2) // 100 and 1999 cents
    assert(d1.getAs[Long]("observed_milli") == 666)
    assert(d1.getAs[Long]("delta_milli") == 365)
    val d2 = rows.find(_.getAs[Long]("digit") == 2).get
    assert(d2.getAs[Long]("n") == 1) // 250 cents
    assert(rows.forall(_.getAs[Long]("n_excluded") == 3))
    assert(rows.find(_.getAs[Long]("digit") == 9).get.getAs[Long]("n") == 0)
  }

  test("ivfPqTopK with exhaustive probing equals the flat ADC scan") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cbs = Pq.trainCodebooks(em, "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 1)
    val cents = KMeans.lloyd(em, "vec_id", "embedding", k = 4, iters = 1)
    val flat = Pq.adcTopK(em, "vec_id", "embedding", cbs, 32,
        Seq(0L, 1L), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfPqTopK(em, cents, cbs, 32, Seq(0L, 1L),
        "vec_id", "embedding", k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == flat) // all 4 clusters probed = no routing loss
  }

  test("ivfPqTopK narrows with nprobe and never exceeds k rows") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cbs = Pq.trainCodebooks(em, "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 1)
    val cents = KMeans.lloyd(em, "vec_id", "embedding", k = 4, iters = 1)
    val one = Similarity.ivfPqTopK(em, cents, cbs, 32, Seq(0L),
      "vec_id", "embedding", k = 5, nprobe = 1).collect()
    assert(one.length <= 5)
    assert(one.map(_.getLong(1)).toSeq == (1L to one.length).toSeq)
  }

  test("as-of on negated time finds the next-at-or-after event") {
    // q242's construction: views at 10 and 50; clicks at 10 and 60.
    // view@10 matches click@10 (inclusive), view@50 matches click@60.
    val views = Seq((1L, 10L), (1L, 50L)).toDF("user_id", "view_us")
      .select(col("user_id"), (-col("view_us")).as("negus"),
        col("view_us"))
    val clicks = Seq((1L, 100L, 10L), (1L, 101L, 60L))
      .toDF("user_id", "event_id", "click_us")
      .select(col("user_id"), (-col("click_us")).as("negus"),
        (-col("event_id")).as("_tie"), col("click_us"))
    val got = AsOfJoin.asOfNative(views, clicks, "user_id", "negus",
        "_tie", Seq("click_us"))
      .select(col("view_us"), (col("asof_click_us") - col("view_us"))
        .as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 0L), (50L, 10L)))
  }

  // ------------------------------------------- report-query invariants

  test("q236 dedup bias conserves totals and never grows a language") {
    val rows = graft.SparkEntry.queries("q236_dedup_bias")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"))
      assert(r.getAs[Long]("removal_permille") >= 0)
    }
  }

  test("q237 grid bins stay in range and cover every document") {
    val rows = graft.SparkEntry
      .queries("q237_quality_length_grid")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    rows.foreach { r =>
      assert((0L to 7L).contains(r.getAs[Long]("len_bin")))
      assert((0L to 4L).contains(r.getAs[Long]("q_bin")))
    }
  }

  test("chunkingReport: overlap overhead is exact") {
    // 10 tokens, chunk 4, stride 3 -> chunks carry 13 tokens:
    // overhead = 1000*(13-10)/10 = 300
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "), "s0"))
      .toDF("id", "text", "src")
    val r = Curation.chunkingReport(docs, "id", "text", "src", 4, 3)
      .collect().head
    assert(r.getAs[Long]("n_chunks") == 4)
    assert(r.getAs[Long]("doc_tokens") == 10)
    assert(r.getAs[Long]("chunk_tokens") == 13)
    assert(r.getAs[Long]("overhead_permille") == 300)
  }
}
