package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Bpe, Cdc, Curation, DataQuality, Dedup, Events, FuzzyJoin, Graph, Layout, Multimodal, Pq, RangeJoin, Reconcile, Search, Similarity, Sketch, Stats, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked query surface for the training-data pipeline
  * extensions (builder brief; SURVEY.md §7.1 #5): deduplication,
  * similarity search, and text analysis over the `documents` and
  * `embeddings` fixture tables.
  *
  * Cross-engine determinism contract (the driver hash-compares against
  * DuckDB): hashing = md5 over explicit strings; float math = integer
  * quantization first; every query ends in ORDER BY on a unique key.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Raw-µs value of events.ts for the q60/q82 engine probes, which
    * read the parquet WITHOUT Tables.load's normalization: nanos-as-
    * long (rounds 1-6 fixture) floors with integer DIV; µs
    * TIMESTAMP_NTZ (r7 fixture) is already the probed value — the UTC
    * session makes the cast wall-clock-preserving. */
  private def rawUs(raw: DataFrame): org.apache.spark.sql.Column =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => expr("unix_micros(cast(ts as timestamp))")
    }

  /** Trained-artifact cache for the BPE queries: whichever of q73/q74
    * runs first trains the merge table; the other applies it. This is
    * the production shape — train once, ship the artifact — and it
    * keeps q74's plan free of the driver-iterative learning loop.
    * The cached value is the driver-local merge rows (≤ numMerges of
    * them, the same k-scalars footprint as a broadcast model), not a
    * DataFrame, so the cache holds no session or block-manager state
    * and is valid across sessions reading the same data dir. */
  private val bpeMergeCache =
    new scala.collection.concurrent.TrieMap[(String, Int),
      Array[(Long, String, String, Long)]]()

  private def trainedBpeMerges(s: SparkSession, dir: String,
                               k: Int): DataFrame = {
    val rows = bpeMergeCache.getOrElseUpdate((dir, k),
      Bpe.learnMerges(t(s, dir, "documents"), "text", k).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))))
    import s.implicits._
    rows.toSeq.toDF("merge_rank", "left", "right", "pair_count")
      .coalesce(1)
  }

  /** Same trained-artifact pattern for KMeans centroids: q51 (IVF
    * search) and q122 (semantic dedup) consume the identical training
    * run; whichever executes first trains, the other reuses. Cached as
    * k×d driver-local longs — no session state. */
  private val centroidCache =
    new scala.collection.concurrent.TrieMap[(String, Int, Int),
      Array[(Long, Seq[Long])]]()

  private def trainedCentroids(s: SparkSession, dir: String,
                               k: Int, iters: Int): DataFrame = {
    val rows = centroidCache.getOrElseUpdate((dir, k, iters),
      graft.operators.KMeans.lloyd(t(s, dir, "embeddings"),
        "vec_id", "embedding", k, iters).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))))
    import s.implicits._
    rows.toSeq.toDF("cluster", "centroid").coalesce(1)
  }

  /** Label-prop communities on the part-supplier incidence graph —
    * the train-once convention shared by q150 (the labelling) and q202
    * (its modularity score). UNLIKE the genuinely bounded caches above
    * (centroids k×d, BPE k merges), converged LPA labels are O(nodes),
    * so the artifact must stay DataFrame-shaped: train once, write the
    * labelling to a parquet under target/, and serve every consumer a
    * fresh scan of that file — zero driver materialization, and at
    * 100× the graph the artifact is a distributed write + read, never
    * a multi-GB collect (VERDICT r9 item 1). The map holds only the
    * PATH (per-JVM, so a new session retrains and overwrites — no
    * stale-artifact reuse across code changes). */
  private val lpaArtifact =
    new scala.collection.concurrent.TrieMap[(String, Int), String]()

  private def partSupplierEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select((col("l_partkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()

  private def lpaLabels(s: SparkSession, dir: String, rounds: Int): DataFrame = {
    val path = lpaArtifact.getOrElseUpdate((dir, rounds), {
      val p = "target/graft-artifacts/lpa_" +
        java.lang.Integer.toHexString(dir.hashCode) + s"_r$rounds"
      Graph.labelPropagation(partSupplierEdges(s, dir), "a", "b", rounds)
        .select(col("node"), col("label"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** The corpus-standard MinHash-LSH near-dup pair set (word
    * 2-shingles, k=24, 4 bands of 6, exact jaccard >= 0.8) — the SAME
    * pairs consumed by q31 (the pairs themselves), q53/q69 (connected
    * components), q110 (triangles), q146 (canonical map), q156
    * (source matrix), q183 (cluster census), q213 (dup profile), and
    * q216 (triplet mining). Same DataFrame-shaped train-once
    * convention as [[lpaArtifact]]: computed once per session, written
    * to parquet, every consumer reads a scan of that file — saves
    * eight identical shingle→signature→band→verify passes per bench
    * run with zero driver materialization (the pair set is
    * corpus-sized at 100 TB, exactly what must never collect). */
  private val pairArtifact =
    new scala.collection.concurrent.TrieMap[String, String]()

  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val path = pairArtifact.getOrElseUpdate(dir, {
      val p = "target/graft-artifacts/mhpairs_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Dedup.minHashLsh(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 2, k = 24, bands = 4, rows = 6, threshold = 0.8)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** [[minhashPairs]] restricted to a sub-corpus: pairs whose BOTH
    * endpoints survive the filter. EXACT, not an approximation —
    * MinHash signatures and band keys are per-document and the
    * Jaccard verification is per-pair, so LSH over any subset equals
    * the full-corpus pair set semi-joined to the subset on both ends.
    * This is what lets the funnel queries (q164, q220) reuse the
    * train-once artifact instead of re-running shingle→signature→
    * band→verify over their stage corpora. */
  private def minhashPairsWithin(s: SparkSession, dir: String,
                                 ids: DataFrame): DataFrame = {
    val keep = ids.select(col("doc_id"))
    minhashPairs(s, dir)
      .join(keep.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"),
        "left_semi")
      .join(keep.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"),
        "left_semi")
  }

  /** Full-corpus quality scores as a train-once parquet artifact —
    * same session convention as [[minhashPairs]]; consumers (q185,
    * q213, q220, q237, q249, q252) read the scan instead of each
    * re-tokenizing the corpus. qualityScore is a pure per-row
    * projection, so subset use is exact: score(subset) == artifact
    * semi-joined to the subset. */
  private val qualityArtifact =
    new scala.collection.concurrent.TrieMap[String, String]()

  private def qualityScores(s: SparkSession, dir: String): DataFrame = {
    val path = qualityArtifact.getOrElseUpdate(dir, {
      val p = "target/graft-artifacts/quality_" +
        java.lang.Integer.toHexString(dir.hashCode)
      TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Which queries consume a session-level trained-artifact cache, and
    * whether that cache is CURRENTLY warm — consumed by Bench's retime
    * triage so "retimed ≪ in-run" on a cache-backed query reads as
    * artifact playback, not as a transient host stall (VERDICT r9
    * item 3). Thunks, not booleans: warmth is evaluated at retime
    * time, after the in-run pass has populated the caches. */
  val artifactBacked: Map[String, () => Boolean] = {
    val bpe = () => bpeMergeCache.nonEmpty
    val cent = () => centroidCache.nonEmpty
    val lpa = () => lpaArtifact.nonEmpty
    val pq = () => pqCache.nonEmpty
    Map(
      "q51_ann_ivf_trained" -> cent,
      "q122_semantic_dedup" -> cent,
      "q159_cluster_profile" -> cent,
      "q222_cluster_gini" -> cent,
      "q230_nprobe_sweep" -> cent,
      "q250_embedding_drift" -> cent,
      "q254_scan_cost" -> cent,
      "q73_bpe_merges" -> bpe,
      "q74_bpe_tokenize" -> bpe,
      "q123_bpe_fertility" -> bpe,
      "q150_label_prop" -> lpa,
      "q202_modularity" -> lpa,
      "q172_pq_encode" -> pq,
      "q173_pq_adc_topk" -> pq,
      "q245_ivf_pq" -> (() => cent() || pq())) ++ {
      val pairs = () => pairArtifact.nonEmpty
      val quality = () => qualityArtifact.nonEmpty
      // Dual-artifact consumers get `pairs() || quality()` — a
      // warm-pairs/cold-quality state (or vice versa) still means the
      // retime replays SOME trained cache, so the triage flag must not
      // read "fully cold" (ADVICE r12).
      val both = () => pairs() || quality()
      Seq("q31_dedup_minhash_lsh", "q53_dedup_components",
        "q69_dedup_components_star", "q110_triangle_count",
        "q146_canonical_pick", "q156_source_dup_matrix",
        "q183_dup_cluster_census", "q216_triplet_mining",
        "q164_curation_funnel")
        .map(_ -> pairs).toMap ++
        Seq("q185_calibrated_gate", "q237_quality_length_grid",
          "q252_resample_bias")
          .map(_ -> quality).toMap ++
        Seq("q213_quality_dup_profile", "q220_token_funnel",
          "q249_calibration_bins")
          .map(_ -> both).toMap
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: one hash-shuffle on the md5 digest.
    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("digest")
    }),

    // MinHash + LSH near-dup pairs, exact-Jaccard verified. r=6 rows per
    // band keeps the candidate set ~10⁻⁴ of the pair space on this
    // corpus (shared small vocab inflates baseline Jaccard).
    "q31_dedup_minhash_lsh" -> ((s, dir) => {
      minhashPairs(s, dir)
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash 32-bit fingerprints (narrow projection, no shuffle).
    "q32_dedup_simhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simHash32(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),

    // Char-5-gram Jaccard near-dups: LSH candidates (no O(n²) pair
    // space), exact-verified — the scale path for raw-string near-dup.
    // Char 5-grams have high baseline similarity on this vocab, so the
    // band width is r=9 (collision odds ~j⁹ per band).
    "q33_dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.minHashLshWith(t(s, dir, "documents"), "doc_id",
        Dedup.charShingles(col("text"), 5),
        k = 36, bands = 4, rows = 9, threshold = 0.5,
        sigRows = Dedup.charShingleRows(t(s, dir, "documents"),
          "doc_id", "text", 5))
        .orderBy("doc_a", "doc_b")
    }),

    // Embedding cosine near-dup pairs, blocked by (label, hyperplane
    // sign-LSH band) — the banded self-join bounds the pair space by
    // bucket size instead of O(label-group²), so a hot label cannot
    // blow up the join at scale. 16 planes × 4 bands of 4 bits.
    //
    // RECALL TRADE-OFF (deliberate): output is LSH *candidates*, not the
    // exhaustive pair set — at threshold 0.3 (angle ≈ 72°) a 4-bit band
    // collides with p ≈ (1-θ/π)^4 ≈ 0.13, so 4 bands recover roughly
    // 40% of qualifying pairs. The oracle mirrors the same approximation
    // (both engines compute identical candidates); completeness is
    // pinned separately by EmbeddingLshSpec's subset + minimum-recall
    // assertions. Consumers needing higher recall raise `bands` (recall
    // 1-(1-p)^b) at proportional shuffle cost.
    "q34_dedup_embedding_cosine" -> ((s, dir) => {
      Dedup.embeddingCosineLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
        blockCols = Seq("label"), dim = 64, nPlanes = 16, bands = 4,
        threshold = 0.3)
        .orderBy("id_a", "id_b")
    }),

    // Brute-force exact cosine top-k for 5 query vectors.
    "q35_ann_brute_topk" -> ((s, dir) => {
      Similarity.bruteForceTopK(t(s, dir, "embeddings"),
        Seq(0L, 1L, 2L, 3L, 4L), "vec_id", "embedding", k = 10)
        .orderBy("query_id", "rank")
    }),

    // IVF approximate top-k: centroids = vec_id % 25 == 0, nprobe = 4.
    "q36_ann_ivf_topk" -> ((s, dir) => {
      Similarity.ivfTopK(t(s, dir, "embeddings"),
        col("vec_id") % 25 === 0, Seq(0L, 1L, 2L, 3L, 4L),
        "vec_id", "embedding", k = 10, nprobe = 4)
        .orderBy("query_id", "rank")
    }),

    // IVF top-k over TRAINED centroids: 2 deterministic Lloyd
    // iterations (k=8, init = 8 smallest vec_ids) feed ivfTopKTrained —
    // KMeans.lloyd exercised end-to-end against the oracle's unrolled
    // fixed-iteration CTE chain. nprobe=2 of 8 clusters.
    "q51_ann_ivf_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKTrained(emb, trainedCentroids(s, dir, 8, 2),
        Seq(0L, 1L, 2L, 3L, 4L),
        "vec_id", "embedding", k = 10, nprobe = 2)
        .orderBy("query_id", "rank")
    }),

    // Near-dup CLUSTERS: the q31 LSH pairs fed through connected
    // components — component = min doc_id, the canonical document a
    // keep-one-per-cluster retention policy retains. Min-label
    // propagation, one join+min-agg shuffle per round.
    "q53_dedup_components" -> ((s, dir) => {
      val pairs = minhashPairs(s, dir)
      Graph.connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),

    // q115: domain-mixture resampling to 40/30/20/10 over four
    // sources — thresholds derived in-plan from observed counts,
    // md5-prefix acceptance, unlisted domains dropped.
    "q115_mixture_sample" -> ((s, dir) => {
      Curation.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
        Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // q114: BM25-shaped retrieval — tf saturation + length
    // normalization in exact rational arithmetic, scaled-integer
    // Robertson idf (log-free), fixed-order per-term total.
    "q114_bm25_topk" -> ((s, dir) => {
      Search.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "stream"), k = 20)
    }),

    // q113: incremental dedup — the daily-ingest gate. New docs
    // (doc_id ≥ 400) match against the standing corpus (< 400) via a
    // batch-bands-broadcast join: the corpus is never shuffled or
    // self-paired, and only candidate corpus docs pay the exact verify.
    "q113_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalMinHashLsh(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "doc_id", "text", shingleN = 2, k = 24, bands = 4, rows = 6,
        threshold = 0.8)
        .orderBy("batch_id", "corpus_id")
    }),

    // q110: triangle census of the near-dup graph (q31's LSH pairs) —
    // degree-ordered orientation caps wedge fan-out at O(√m) per
    // vertex; triangle-dense components are near-cliques of copies.
    "q110_triangle_count" -> ((s, dir) => {
      val pairs = minhashPairs(s, dir)
      Graph.triangleCount(pairs, "doc_a", "doc_b")
        .orderBy("node")
    }),

    // q111: median/MAD robust outliers per event type — both medians
    // via the two-phase histogram selector (no per-group whole-sort),
    // group scalars broadcast, flags pure projections.
    "q111_mad_outliers" -> ((s, dir) => {
      Stats.madOutliers(t(s, dir, "events"), "event_type", "value", k = 3.0)
        .orderBy("event_type")
    }),

    // q102: sliding-frame moving average per user (5-event window) —
    // frame aggregates in exact decimals over the (us, event_id) total
    // order; one division of identical values at the edge.
    "q102_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id")).rowsBetween(-4, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("us"), col("value"))
        .select(col("event_id"), col("user_id"),
          (sum(col("value").cast("decimal(18,3)")).over(w).cast("double") /
            count(lit(1)).over(w).cast("double")).as("moving_avg"))
        .orderBy("event_id")
    }),

    // q100: pre-promotion data-quality gate (DataQuality.report) —
    // domain checks (narrow filters) + referential checks (left-anti
    // joins) collapse to one count per rule.
    "q100_quality_report" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val docs = t(s, dir, "documents")
      DataQuality.report(Seq(
        "documents.empty_text" ->
          docs.filter(col("text").isNull || length(col("text")) === 0),
        "lineitem.nonpositive_quantity" -> li.filter(col("l_quantity") <= 0),
        "lineitem.orphan_orderkey" ->
          li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti"),
        "orders.nonpositive_total" -> ord.filter(col("o_totalprice") <= 0),
        "orders.orphan_custkey" ->
          ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti")))
        .orderBy("rule")
    }),

    // q99: activity coverage via gaps-and-islands — each event claims
    // a 60-second interval; overlapping intervals merge per user
    // (Events.mergeIntervals) and the per-user coverage stats are
    // island-numbering-invariant, so both engines agree even where
    // tie rows could renumber islands.
    "q99_interval_islands" -> ((s, dir) => {
      val iv = t(s, dir, "events").select(col("user_id"),
        expr("unix_micros(ts)").as("ivl_start"),
        expr("unix_micros(ts) + 60000000").as("ivl_end"))
      Events.mergeIntervals(iv, "user_id", "ivl_start", "ivl_end")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("island_end") - col("island_start")).as("covered_us"),
          max(col("island_end") - col("island_start")).as("max_island_us"))
        .orderBy("user_id")
    }),

    // q98: snapshot reconciliation (Reconcile.digest) — XOR row-hash
    // digests of the orders table vs a drifted version (cents bumped on
    // o_orderkey%1000==3, rows %1000==7 dropped), 64 buckets. Equal
    // digests certify untouched buckets; mismatches localize the drift.
    "q98_reconcile_digest" -> ((s, dir) => {
      val rows = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        expr("CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS LONG)")
          .as("cents"))
      val drifted = rows.filter(col("o_orderkey") % 1000 =!= 7)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 1000 === 3, col("cents") + 1000L)
            .otherwise(col("cents")).as("cents"))
      def d(df: DataFrame) = Reconcile.digest(df,
        col("o_orderkey") % 64,
        concat_ws("|", col("o_orderkey"), col("o_custkey"), col("cents")))
      d(rows).select(col("bucket"), col("n_rows").as("n_a"),
          col("digest").as("digest_a"))
        .join(d(drifted).select(col("bucket"), col("n_rows").as("n_b"),
          col("digest").as("digest_b")), Seq("bucket"))
        .withColumn("is_equal",
          col("n_a") === col("n_b") && col("digest_a") === col("digest_b"))
        .orderBy("bucket")
    }),

    // q97: per-type linear value trend (Stats.linearTrend) — minutes
    // since the global first event vs value cents, exact integer
    // sufficient statistics, IEEE-shared slope/intercept tree.
    "q97_group_linreg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), expr("unix_micros(ts)").as("us"),
          col("value"))
      val base = ev.agg(min(col("us")).as("_base_us"))
      val prepared = ev.crossJoin(broadcast(base))
        .select(col("event_type"),
          expr("(us - _base_us) div 60000000").as("x_min"),
          expr("CAST(floor(CAST(value AS DOUBLE) * 100) AS LONG)").as("y_cents"))
      Stats.linearTrend(prepared, Seq("event_type"),
        col("x_min"), col("y_cents"))
        .orderBy("event_type")
    }),

    // q95: weekly cohort retention (Events.cohortRetention) on the
    // proven floor-µs timeline — 604800000000 µs per week bucket.
    "q95_cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
      Events.cohortRetention(ev, "signup", 604800000000L)
        .select(col("cohort_bucket").as("cohort_week"),
          col("bucket_offset").as("week_offset"), col("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // q92: weighted Bernoulli sampling (Curation.weightedSample) —
    // keep probability ∝ n_chars, pure integer inclusion test, no RNG.
    "q92_weighted_sample" -> ((s, dir) => {
      Curation.weightedSample(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // q91: ordered funnel (Events.funnel) — users reaching
    // signup → view → purchase in event-time order, on the proven
    // floor-µs timeline.
    "q91_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
      Events.funnel(ev, "user_id", "event_type", "us",
        Seq("signup", "view", "purchase"))
        .orderBy("stage")
    }),

    // q90: per-label embedding centroids over the quantized integer
    // grid (Similarity.quantizedLabelCentroids) — embedding analytics
    // with one decomposable sum per (label, dimension).
    "q90_label_centroids" -> ((s, dir) => {
      Similarity.quantizedLabelCentroids(
        t(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label", "pos")
    }),

    // q89: edit-distance-1 fuzzy join (FuzzyJoin.editDistance1Join).
    // Deterministic typos (3rd char deleted) probe back into the
    // vocabulary through deletion-neighborhood blocking + exact
    // levenshtein verify — never an all-pairs distance matrix.
    "q89_fuzzy_join" -> ((s, dir) => {
      val vocab = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("token")).distinct()
      val probes = vocab.filter(length(col("token")) >= 5)
        .select(col("token").as("orig"),
          expr("concat(substring(token,1,2), substring(token,4,length(token)))")
            .as("probe"))
      FuzzyJoin.editDistance1Join(probes, "probe", vocab, "token")
        .select(col("orig"), col("probe"), col("token"),
          expr("CAST(levenshtein(probe, token) AS LONG)").as("dist"))
        .orderBy("orig", "token")
    }),

    // q88: fixed-iteration PageRank over the part↔supplier bipartite
    // graph, in pure integer arithmetic (Graph.pageRankInt) — float
    // PageRank sums contributions in nondeterministic order, integer
    // ranks make every iteration exact, so the oracle can recompute
    // all three iterations verbatim as unrolled CTEs. Node encoding:
    // part k → 2k, supplier k → 2k+1.
    "q88_pagerank" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .distinct()
        // checkpoint before the two-direction fan-out: union branches
        // are separate subtrees and would evaluate the distinct twice
        .localCheckpoint()
      val edges = base
        .select((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
        .union(base.select((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
      Graph.pageRankInt(edges, "src", "dst", iters = 3)
        .orderBy(desc("rank"), col("node")).limit(20)
    }),

    // As-of join: every event gets the user's most recent purchase
    // at-or-before it. Times are epoch-micros BIGINTs (the determinism
    // contract — see q43) and ties resolve to the highest event_id.
    "q52_asof_join" -> ((s, dir) => {
      val raw = t(s, dir, "events")
      val left = raw.select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
      val right = raw.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("unix_micros(ts)").as("us"),
          col("event_id"), col("event_id").as("purchase_id"),
          col("value").as("purchase_value"))
      AsOfJoin.asOf(left, right, "user_id", "us", "event_id",
        Seq("purchase_id", "purchase_value"))
        // `us` is checked: both engines floor ns→µs identically
        // (r4 q82 fingerprint probe; oracle side uses epoch_ns//1000).
        .select("event_id", "user_id", "us", "event_type",
          "asof_purchase_id", "asof_purchase_value")
        .orderBy("event_id")
    }),

    // The SAME as-of contract through the native whole-operator path:
    // custom AsOfJoinPlan logical node → AsOfJoinStrategy → merge-join
    // AsOfJoinExec (one exchange per side, O(n+m) per-partition merge).
    // Three engines, one answer: composed Spark (q52), custom operator
    // (q83), DuckDB's native ASOF JOIN (the shared oracle).
    "q83_asof_native" -> ((s, dir) => {
      val raw = t(s, dir, "events")
      val left = raw.select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
      val right = raw.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("unix_micros(ts)").as("us"),
          col("event_id"), col("event_id").as("purchase_id"),
          col("value").as("purchase_value"))
      AsOfJoin.asOfNative(left, right, "user_id", "us", "event_id",
        Seq("purchase_id", "purchase_value"))
        .select("event_id", "user_id", "us", "event_type",
          "asof_purchase_id", "asof_purchase_value")
        .orderBy("event_id")
    }),

    // Deterministic hash split: md5-prefix bucketing, zero shuffle.
    "q54_hash_split" -> ((s, dir) => {
      Curation.hashSplit(t(s, dir, "documents"), "doc_id",
        Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy("doc_id")
    }),

    // Per-group top-k: rank-filter over a per-user window. Spark plans
    // the rnk <= 3 filter as WindowGroupLimit — per-partition k-heaps
    // BEFORE the shuffle — so only ~3·|users| rows reach the sort
    // (PlanSpec pins the node).
    "q56_group_topk" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("user_id", "rnk")
    }),

    // Keyword retrieval: integer-weight TF-IDF top-k (Search scoring
    // stays in BIGINT arithmetic — no log(), no float sums — so every
    // engine ranks identically).
    "q58_search_topk" -> ((s, dir) => {
      Search.topKByTerms(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "stream"), k = 20)
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // Per-document text statistics.
    "q37_text_stats" -> ((s, dir) => {
      TextAnalysis.stats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Heuristic language ID by marker-word hits.
    "q38_lang_id" -> ((s, dir) => {
      TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Content + winnowing-style robust fingerprints.
    "q39_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Regex (BPE-ish) tokenization counts.
    "q40_regex_tokens" -> ((s, dir) => {
      TextAnalysis.regexTokens(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Multimodal: binary payload column + stub decode metadata.
    "q41_multimodal_decode" -> ((s, dir) => {
      Multimodal.decodeColumnar(Multimodal.mediaTable(t(s, dir, "documents")))
        .orderBy("media_id")
    }),

    // Event-time tumbling window aggregation.
    "q42_event_windows" -> ((s, dir) => {
      Events.tumblingCounts(t(s, dir, "events"), "1 hour")
        .orderBy("win_start", "event_type")
    }),

    // Gap-based sessionization (30-minute inactivity). events.parquet is
    // TIMESTAMP(NANOS); the checked µs bounds are safe because BOTH
    // engines floor ns→µs (Spark: Tables.load `ts DIV 1000`; oracle:
    // `epoch_ns(ts) // 1000` — and the r4 q82 fingerprint probe proved
    // the driver engine's own parquet read also floors, pinning min,
    // max and a modular checksum of every µs value). min/max event_id
    // stay in the contract as conversion-free anchors.
    "q43_sessionization" -> ((s, dir) => {
      Events.sessionize(t(s, dir, "events"), 30)
        .select("user_id", "session_id", "n_events",
          "session_start_us", "session_end_us",
          "min_event_id", "max_event_id", "session_value")
        .orderBy("user_id", "session_id")
    }),

    // ENGINE-SEMANTICS PROBES (1 row each). events.ts is parquet
    // TIMESTAMP(NANOS); Spark reads the raw int64 nanos and floors to
    // µs. These rows pin, via the driver's own compare, the conversion
    // the oracle engine applies. MEASURED (rounds 3-4): a q59 sub-µs
    // visibility probe came back red (the engine exposes no sub-µs
    // digits — it converts ns at parquet read) while q60+q82 are green
    // (the conversion FLOORS, and every µs value is bit-identical to
    // Spark's `ts DIV 1000`). Conclusion recorded in DESIGN.md; the
    // answered q59 probe is retired, the floor invariants stay as
    // regression tripwires for driver-engine upgrades.
    //
    // q60: does its ns→µs conversion FLOOR (like Spark's DIV) or round?
    //   green ⇔ floor/truncation end-to-end; red ⇔ it rounds half up
    //   (~50% of µs values shift by +1, flipping parity).
    "q60_probe_us_parity" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/events.parquet")
      // µs from the RAW encoding: nanos-as-long (rounds 1-6 fixture) or
      // µs TIMESTAMP_NTZ (r7 fixture) — the probe pins the same floor
      // invariant either way.
      val us = rawUs(raw)
      raw.agg(sum(when(us % 2 === 1, 1L).otherwise(0L)).as("n_odd_us"))
    }),

    // q82: full µs-value fingerprint. r3's q60 proved the LAST bit of
    // every floor-µs value agrees across engines; this pins the WHOLE
    // value (min, max, and a modular checksum of all 150k values). Green
    // here ⇔ `epoch_ns(ts) // 1000` in the oracle is bit-identical to
    // Spark's `ts div 1000`, and µs-derived output columns (the shape
    // that was red in r2 via DuckDB's epoch_us()) are safe to restore.
    "q82_probe_us_fingerprint" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/events.parquet")
      val us = raw.select(rawUs(raw).as("us"))
      us.agg(min(col("us")).as("min_us"), max(col("us")).as("max_us"),
        sum(col("us") % lit(1000000007L)).as("sum_mod"))
    }),

    // q84: KMV bottom-k distinct sketch (Sketch.kmvDistinct) next to
    // the exact counts it estimates — per event type, distinct users
    // (< k, so the sketch is exact) and distinct active user-hours
    // (thousands, a real estimation). The auditable, mergeable
    // alternative to approx_count_distinct's HLL black box.
    "q84_kmv_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val userHour = concat(col("user_id").cast("string"), lit("#"),
        expr("unix_micros(ts) div 3600000000").cast("string"))
      val estU = Sketch.kmvDistinct(ev, Seq("event_type"),
        col("user_id").cast("string"), 64)
        .withColumnRenamed("est_nd", "est_users")
      val estUh = Sketch.kmvDistinct(ev, Seq("event_type"), userHour, 64)
        .withColumnRenamed("est_nd", "est_user_hours")
      val exact = ev.groupBy("event_type").agg(
        countDistinct(col("user_id")).as("exact_users"),
        countDistinct(userHour).as("exact_user_hours"))
      exact.join(estU, Seq("event_type")).join(estUh, Seq("event_type"))
        .orderBy("event_type")
    }),

    // q86: incremental materialized-view maintenance. The per-custkey
    // order stats are maintained as base (history before a cutoff) +
    // delta (the new partition), merged by adding decomposable partial
    // aggregates through a full-outer join — the daily-refresh pattern
    // that turns a 100 TB full recompute into aggregating one day's
    // partition and merging k×|keys| partials. The oracle is the
    // DIRECT aggregation over everything: hash-equality proves
    // merge(base, delta) ≡ recompute, exactly (decimal partials add
    // associatively; the double cast happens once, after the merge).
    "q86_incremental_agg" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cutoff = to_date(lit("1997-01-01"))
      def part(p: DataFrame, n: String, sm: String) =
        p.groupBy("o_custkey").agg(
          count(lit(1)).as(n),
          sum(col("o_totalprice").cast("decimal(18,3)")).as(sm))
      val base = part(orders.filter(col("o_orderdate") < cutoff), "bn", "bs")
      val delta = part(orders.filter(col("o_orderdate") >= cutoff), "dn", "ds")
      base.join(delta, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("bs"), lit(0).cast("decimal(18,3)")) +
            coalesce(col("ds"), lit(0).cast("decimal(18,3)")))
            .cast("double").as("sum_total"))
        .orderBy("o_custkey")
    }),

    // q96: KMV sketch MERGEABILITY — the distributed-aggregation
    // property itself, oracle-checked: sketch the even and odd event
    // halves separately, merge the two sketches, estimate. The oracle
    // computes the estimate DIRECTLY over everything; a hash match
    // proves merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B), which is why
    // the sketch build can run as partial aggregation at 100 TB.
    "q96_kmv_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val userHour = concat(col("user_id").cast("string"), lit("#"),
        expr("unix_micros(ts) div 3600000000").cast("string"))
      val a = Sketch.kmvSketch(ev.filter(col("event_id") % 2 === 0),
        Seq("event_type"), userHour, 64)
      val b = Sketch.kmvSketch(ev.filter(col("event_id") % 2 === 1),
        Seq("event_type"), userHour, 64)
      Sketch.kmvEstimate(a.union(b), Seq("event_type"), 64)
        .orderBy("event_type")
    }),

    // JSON property extraction + aggregation.
    "q44_json_props" -> ((s, dir) => {
      Events.jsonPropAgg(t(s, dir, "events"), "$.k")
        .orderBy("event_type")
    }),

    // Salted two-phase aggregation over a skewable key.
    "q45_salted_agg" -> ((s, dir) => {
      Events.saltedSum(t(s, dir, "events"), "user_id",
        col("value").cast("decimal(18,3)"), 8)
        .orderBy("user_id")
    }),

    // Benchmark decontamination: per-doc overlap with a held-out set.
    "q49_contamination" -> ((s, dir) => {
      Curation.contamination(t(s, dir, "documents"), "doc_id", "text",
        col("doc_id") % 50 === 0)
        .orderBy("doc_id")
    }),

    // q105: top co-occurring token pairs (TextAnalysis.cooccurrenceTopK)
    // — doc-co-located pair generation, one combinable count, heap
    // top-k. Ties break on the pair itself.
    "q105_cooccurrence" -> ((s, dir) => {
      TextAnalysis.cooccurrenceTopK(t(s, dir, "documents"),
        "doc_id", "text", topK = 30)
    }),

    // q107: fixed-token-window chunking with overlap (window 32,
    // stride 24) — training-example prep; chunk_id = start/stride is
    // position-pure so both engines derive identical ids. Narrow
    // explode, fan-out ceil(n/stride) per doc, no shuffle.
    "q107_chunking" -> ((s, dir) => {
      TextAnalysis.chunk(t(s, dir, "documents"), "doc_id", "text",
        window = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")
    }),

    // q112: Gopher-style repetition metrics — top-token share via a
    // sorted-run fold (O(n log n) per doc, never O(n·distinct)) and
    // duplicate-trigram excess via distinct counts. All ratios are
    // exact-integer divisions; `keep` thresholds computed identically
    // in both engines.
    "q112_repetition_filter" -> ((s, dir) => {
      TextAnalysis.repetition(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // q108: sequence packing (ctx 512) — per-shard prefix-sum layout of
    // the concatenated token stream, cut every ctx tokens; a doc's pack
    // is where it starts, straddlers counted per pack. One bounded
    // window + one combinable agg.
    "q108_sequence_packing" -> ((s, dir) => {
      Curation.packSequences(t(s, dir, "documents"), "doc_id", "text",
        "source", ctxTokens = 512)
        .orderBy("shard", "pack_id")
    }),

    // q109: SCD Type-2 dimension build (Cdc.scd2) — the purchase
    // history per user becomes versioned validity intervals
    // [valid_from, valid_to), open interval = current version. µs
    // epochs only (nanos-source rule); (ts, event_id) order keys make
    // the version sequence total.
    "q109_scd2_build" -> ((s, dir) => {
      val h = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("valid_from_us"), col("value"))
      Cdc.scd2(h, Seq("user_id"), Seq("valid_from_us", "event_id"),
        "valid_from_us")
        .select(col("user_id"), col("version"), col("event_id"),
          col("valid_from_us"), col("valid_to").as("valid_to_us"),
          col("is_current"), col("value"))
        .orderBy("user_id", "version")
    }),

    // q103: Bloom-filter decontamination (Curation.bloomContamination)
    // — the broadcast-kilobytes first-pass gate next to q49's exact
    // set join; n_maybe ≥ n_exact per doc by construction and the
    // surplus is the measured false-positive mass.
    "q103_bloom_contamination" -> ((s, dir) => {
      Curation.bloomContamination(t(s, dir, "documents"), "doc_id", "text",
        col("doc_id") % 50 === 0)
        .orderBy("doc_id")
    }),

    // Vocabulary frequency table (top-k tokens by count).
    "q50_vocabulary" -> ((s, dir) => {
      Curation.vocabulary(t(s, dir, "documents"), "text", topK = 1000)
        .orderBy("rank")
    }),

    // PIVOT: per-user event-type counts as columns (explicit value
    // list keeps the output schema deterministic).
    "q48_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // Exact distributed median per group — two-phase rank selection
    // (histogram buckets, then sort only the median bucket), so a
    // low-cardinality group column never forces a whole-group sort
    // into one task. Engine-portable where quantile_cont is not.
    "q47_exact_median" -> ((s, dir) => {
      Stats.exactMedian(t(s, dir, "events"), "event_type", "value")
        .orderBy("event_type")
    }),

    // Exact per-group quantile vector by two-phase histogram selection
    // (generalizes q47's median): rank = floor((n-1)*q)+1, the discrete
    // lower quantile, computed identically by both engines.
    "q63_exact_quantiles" -> ((s, dir) => {
      Stats.exactQuantiles(t(s, dir, "events"), "event_type", "value",
        Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy("event_type", "q")
    }),

    // Same clusters via star contraction (O(log²) rounds — the variant
    // for graphs whose diameter defeats min-label propagation).
    "q69_dedup_components_star" -> ((s, dir) => {
      val pairs = minhashPairs(s, dir)
      Graph.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),

    // Winsorized aggregation: values clipped to the exact per-group
    // [p05, p95] band (composition of q63's quantile selection with a
    // broadcast clip — the robust-statistics pass a feature pipeline
    // runs before normalization).
    "q77_winsorize" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val bounds = Stats
        .exactQuantiles(ev, "event_type", "value", Seq(0.05, 0.95))
        .groupBy("event_type")
        .agg(min(when(col("q") === 0.05, col("quantile_value"))).as("lo"),
          min(when(col("q") === 0.95, col("quantile_value"))).as("hi"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_type"),
          least(greatest(col("value"), col("lo")), col("hi")).as("clipped"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("clipped").cast("decimal(18,3)")).cast("double")
            .as("sum_clipped"))
        .orderBy("event_type")
    }),

    // Spark's NATIVE session_window aggregation, checked against the
    // same session oracle as the hand-rolled q43 (both reach identical
    // sessions here: the engines differ only at gaps exactly equal to
    // 30 min, and the fixture's nearest gap is 886 ms away). Robust
    // contract columns: per-user ordinal + count.
    "q76_session_window" -> ((s, dir) => {
      val sessions = t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
      sessions
        .select(col("user_id"),
          row_number().over(Window.partitionBy("user_id")
            .orderBy(col("session_window.start"))).cast("long")
            .as("session_seq"),
          col("n_events"))
        .orderBy("user_id", "session_seq")
    }),

    // Range join without a nested loop: per purchase, how many of the
    // same user's views fell in the 30 minutes before it. Bucketed
    // equi-join on (user, time-bucket) + exact BETWEEN on co-located
    // candidates (PlanSpec pins the absence of BroadcastNestedLoop).
    // Membership margins are the measured ≥8 s same-user spacing, so
    // ±1µs engine skew cannot flip a count.
    "q75_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), expr("unix_micros(ts)").as("us"))
      RangeJoin.intervalJoinAgg(purchases, views, "user_id", "us", "us",
        before = 1800000000L, after = 0L,
        matchAggs = Seq(count(col("_rt")).as("n_prior_views")))
        .select("event_id", "user_id", "n_prior_views")
        .orderBy("event_id")
    }),

    // BPE merge learning: 6 merge rounds over the corpus's lowercase
    // words — tokenizer training as a distributed pipeline, checked
    // against an oracle that unrolls the same 6 rounds as CTE stages
    // (the q51 KMeans fixed-iteration pattern).
    "q73_bpe_merges" -> ((s, dir) => {
      trainedBpeMerges(s, dir, 6).orderBy("merge_rank")
    }),

    // Apply the learned BPE merges back to the corpus: per-doc token
    // counts through the broadcast word→symbols vocabulary. Uses the
    // trained-artifact overload — applying a vocabulary must not
    // re-run the learning loop.
    "q74_bpe_tokenize" -> ((s, dir) => {
      Bpe.tokenCounts(t(s, dir, "documents"), "doc_id", "text",
        merges = trainedBpeMerges(s, dir, 6))
        .orderBy("doc_id")
    }),

    // Frame sampling over the binary media payload: every-100th-byte
    // offsets, 16-byte pseudo-frames (stub slicing — a real codec cuts
    // at frame boundaries; the Spark-side plumbing is real). The
    // checked contract is length arithmetic only, so no binary content
    // ever crosses engines: frame count and summed frame bytes are
    // integer functions of the payload length.
    "q72_frame_sample" -> ((s, dir) => {
      val m = Multimodal.mediaTable(t(s, dir, "documents"))
      Multimodal.frameSample(m, everyK = 100, frameBytes = 16)
        .select(col("media_id"),
          size(col("frames")).cast("long").as("n_frames"),
          aggregate(col("frames"), lit(0L),
            (acc, f) => acc + length(f).cast("long"))
            .as("total_frame_bytes"))
        .orderBy("media_id")
    }),

    // Inverted index with df bounds (posting lists as sorted
    // comma-joined ids — deterministic on any engine).
    "q68_inverted_index" -> ((s, dir) => {
      Search.invertedIndex(t(s, dir, "documents"), "doc_id", "text",
        minDf = 5, maxDf = 400)
        .orderBy("token")
    }),

    // Feature normalization: per-row z-score against the event_type
    // group (exact decimal moments, shared IEEE expression tree).
    "q67_zscore" -> ((s, dir) => {
      Stats.zscore(t(s, dir, "events"), "event_type", "value")
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    }),

    // Deterministic stratified sampling: per-lang keep rates from the
    // md5 hash of the id — zero shuffle, zero RNG, any-engine-exact.
    "q65_stratified_sample" -> ((s, dir) => {
      Curation.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        Seq("en" -> 0.5, "fr" -> 0.25), defaultRate = 0.125)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // CDC merge: apply a deterministic I/U/D change batch (derived from
    // the base itself, so the oracle can reconstruct it) and emit the
    // next snapshot. %10==3 updated (+10), %100==3 updated again at a
    // later sequence (+20, must win), %10==7 deleted, %10==1 re-keyed
    // inserts.
    "q64_cdc_merge" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      def ch(f: org.apache.spark.sql.Column, price: org.apache.spark.sql.Column,
             key: org.apache.spark.sql.Column, op: String, seq: Long) =
        base.filter(f).select(key.as("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), price.as("o_totalprice"),
          lit(op).as("op"), lit(seq).as("seq"))
      val k = col("o_orderkey")
      val changes =
        ch(k % 10 === 3, col("o_totalprice") + 10.0d, k, "U", 1L)
          .union(ch(k % 100 === 3, col("o_totalprice") + 20.0d, k, "U", 2L))
          .union(ch(k % 10 === 7, col("o_totalprice"), k, "D", 1L))
          .union(ch(k % 10 === 1, col("o_totalprice"), k + 100000000L, "I", 1L))
      Cdc.applyChanges(base, changes, Seq("o_orderkey"), "seq", "op")
        .orderBy("o_orderkey")
    }),

    // Capstone: end-to-end curation (exact dedup → LSH near-dup removal
    // → quality gate → stats) as one composed pipeline.
    "q46_curation_pipeline" -> ((s, dir) => {
      Curation.curate(t(s, dir, "documents"), "doc_id", "text",
        k = 24, bands = 4, rows = 6, nearDupThreshold = 0.8,
        minQuality = 0.5)
        .orderBy("doc_id")
    }),

    // Span-level duplication census: which documents are stitched from
    // corpus-repeated 8-gram spans (the suffix-array dedup signal of
    // Lee et al. 2022, as a distributed fixed-width census).
    "q117_span_dedup" -> ((s, dir) => {
      Dedup.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // Containment near-dup: asymmetric |A∩B|/|A| over 3-gram shingle
    // sets, rare-shingle prefix blocking (4 probes/doc), integer
    // permille verification ≥ 600 on either side.
    "q118_containment" -> ((s, dir) => {
      Dedup.containmentNearDup(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, probes = 4, thresholdPermille = 600)
        .orderBy("doc_a", "doc_b")
    }),

    // Unigram surprisal quality score: integer floor-log2 bits per
    // token (bit-length trick — no float log anywhere).
    "q119_surprisal" -> ((s, dir) => {
      TextAnalysis.unigramSurprisal(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // int8-quantized retrieval: one-byte vectors, pure-integer dot
    // ranking — the compressed first rung under q35's exact rerank.
    "q120_int8_topk" -> ((s, dir) => {
      Similarity.int8TopK(t(s, dir, "embeddings"),
        Seq(0L, 1L, 2L, 3L, 4L), "vec_id", "embedding", k = 10)
        .orderBy("query_id", "rank")
    }),

    // Semantic dedup (SemDeDup): trained clusters bound the pair space,
    // within-cluster high-cosine pairs close into keep-one groups.
    // Composes KMeans.lloyd + cluster equi-join + connected components.
    // Threshold 0.4: the synthetic embedding space is diffuse (max
    // pairwise cosine ≈ 0.51), so a production-style 0.95 would make
    // the group-formation path vacuous; 0.4 exercises it. Runs the
    // SUB-BANDED pair space (hyperplane sign-LSH inside each cluster,
    // self-join key (cluster, band)) — the shape that survives fixed-k
    // clusters growing with the corpus; the oracle mirrors the banding
    // bit-for-bit, so the recall trade is verified, not assumed.
    "q122_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.semanticDedup(emb, trainedCentroids(s, dir, 8, 2),
        "vec_id", "embedding", threshold = 0.4,
        subPlanes = 16, subBands = 4, dim = 64)
        .orderBy("vec_id")
    }),

    // Retrieval ladder: int8 recall (top-25) → exact cosine rerank
    // (top-10). The compressed scan bounds the candidate set; the exact
    // metric touches 25 rows per query, never the corpus.
    "q124_int8_rerank" -> ((s, dir) => {
      Similarity.int8Rerank(t(s, dir, "embeddings"),
        Seq(0L, 1L, 2L, 3L, 4L), "vec_id", "embedding",
        recallK = 25, k = 10)
        .orderBy("query_id", "rank")
    }),

    // Tokenizer FERTILITY by corpus source (tokens per word, integer
    // permille) — the per-domain health check a tokenizer-training run
    // reports. Applies the cached trained merges (the q73/q74 artifact)
    // through the no-retrain tokenCounts overload.
    "q123_bpe_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Bpe.tokenCounts(docs, "doc_id", "text",
        merges = trainedBpeMerges(s, dir, 6))
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(sum("n_words").as("n_words"), sum("n_tokens").as("n_tokens"))
        .select(col("source"), col("n_words"), col("n_tokens"),
          expr("(1000 * n_tokens) div n_words").as("fertility_milli"))
        .orderBy("source")
    }),

    // ANALYZE-style numeric profile of lineitem: one aggregate pass
    // (multi-distinct plans as a single Expand), stack-unpivoted to a
    // row per column.
    "q128_column_profile" -> ((s, dir) => {
      Stats.profileNumeric(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax"))
        .orderBy("col_name")
    }),

    // Exact equi-width histogram (20 bins, empty bins included) over
    // order totals — bounds pass + decomposable bucket counts.
    "q129_histogram" -> ((s, dir) => {
      Stats.histogram(t(s, dir, "orders"), "o_totalprice", nBins = 20)
        .orderBy("bucket")
    }),

    // Salted equi-join: events (probe, salted) × customer (build,
    // replicated ×8) — result identical to the plain join, shuffle
    // split across salts. The rollup proves result parity.
    "q130_salted_join" -> ((s, dir) => {
      Events.saltedJoin(t(s, dir, "events"),
          t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
          "user_id", "c_custkey", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,3)")).cast("double")
            .as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    // First-touch attribution: purchases credited to each user's first
    // event type; one window + one rollup sharing the user shuffle.
    "q131_attribution" -> ((s, dir) => {
      Events.firstTouchAttribution(t(s, dir, "events"), "user_id",
          "event_type", "ts", "event_id", convType = "purchase",
          valueCol = "value")
        .orderBy("first_touch")
    }),

    // Trailing 1-hour RANGE-frame window per user (time-based frame —
    // q102's sibling with a value frame instead of a row frame; ties
    // at the same µs are peers, so the result is order-independent).
    "q132_trailing_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600000000L, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("us"), col("value"))
        .select(col("event_id"), col("user_id"), col("us"),
          sum(col("value").cast("decimal(18,3)")).over(w).cast("double")
            .as("trailing_1h_sum"),
          count(lit(1)).over(w).as("trailing_1h_n"))
        .orderBy("event_id")
    }),

    // Bigram conditional surprisal — fluency scoring via corpus
    // P(w2|w1), integer bit-length floor-log2 end to end.
    "q133_bigram_surprisal" -> ((s, dir) => {
      TextAnalysis.bigramSurprisal(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Exact per-class cap (13 docs/source by smallest md5 prefix) via
    // the two-phase bucket cutoff — never a whole class in one sort.
    // 13 binds in EVERY class at the sf0.01 gate (25/source), so the
    // cutoff+straddle path is what the oracle checks, not pass-through.
    "q136_class_balance" -> ((s, dir) => {
      Curation.classBalance(
          t(s, dir, "documents").select("doc_id", "source", "lang", "n_chars"),
          "source", "doc_id", cap = 13)
        .orderBy("doc_id")
    }),

    // Exact per-group percent rank in permille (score calibration
    // across domains) — two-phase bucketed ranks, integer output.
    "q137_percent_rank" -> ((s, dir) => {
      Stats.percentRankMilli(
          t(s, dir, "events").select("event_id", "event_type", "value"),
          "event_type", "value")
        .orderBy("event_id")
    }),

    // k-core peeling (k = 26, 3 fixed rounds) over the bipartite
    // part–supplier incidence graph (q88's node encoding): the
    // dense-region filter. The real cascade depth is proven on a path
    // graph in GraphSpec; here the third round is the oracle-checked
    // converged no-op.
    "q138_kcore" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select((col("l_partkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      Graph.kCorePeel(edges, "a", "b", k = 26, rounds = 3)
        .orderBy("node")
    }),

    // SLIDING event-time windows (2 h window, 1 h slide — each event
    // lands in two windows) with exact distinct users: the
    // overlapping-window rollup a live dashboard reads. Tumbling
    // coverage is q42; the slide is what's new — Spark materializes
    // window membership as a generate (row → its 2 windows), then one
    // combinable aggregate; distinct plans as a two-phase expand.
    "q142_sliding_windows" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("win_start"), col("event_type"),
          col("n_events"), col("n_users"))
        .orderBy("win_start", "event_type")
    }),

    // Inter-event gap medians: lag() per user for the sequential gap,
    // then the two-phase exact median per event type — the behavioral
    // cadence feature (bot detection, session tuning) composed from
    // the window + order-statistics primitives.
    "q143_event_gaps" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val gaps = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("gap_us", col("us") - lag("us", 1).over(w))
        .filter(col("gap_us").isNotNull)
      Stats.exactMedian(gaps, "event_type", "gap_us")
        .orderBy("event_type")
    }),

    // Theta-style KMV intersection: shared users between the two
    // event-id parity halves, per event type, from two 64-hash
    // sketches — the cross-dataset overlap question answered without
    // shuffling either side.
    "q140_kmv_intersect" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = Sketch.kmvSketch(ev.filter(col("event_id") % 2 === 0),
        Seq("event_type"), col("user_id").cast("string"), 64)
      val b = Sketch.kmvSketch(ev.filter(col("event_id") % 2 === 1),
        Seq("event_type"), col("user_id").cast("string"), 64)
      Sketch.kmvIntersect(a, b, Seq("event_type"), 64)
        .orderBy("event_type")
    }),

    // Zone-map audit: per-zone min/max stats + the footer-pruning
    // skip verdict for a shipdate range, under TWO layouts of the same
    // table — the by-orderkey layout skips nothing (shipdates span
    // every zone), the by-month layout skips every zone outside the
    // predicate. The measurement to run on a sample BEFORE paying for
    // a 100 TB re-sort.
    "q141_zone_map" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1996-06-30").cast("timestamp")
      val byKey = Layout.zoneMap(li,
          expr("l_orderkey div 2000").cast("long"),
          col("l_shipdate"), lo, hi)
        .withColumn("layout", lit("by_orderkey"))
      val byMonth = Layout.zoneMap(li,
          expr("year(l_shipdate) * 12 + month(l_shipdate)").cast("long"),
          col("l_shipdate"), lo, hi)
        .withColumn("layout", lit("by_month"))
      byKey.union(byMonth)
        .select("layout", "zone", "n_rows", "min_v", "max_v", "skippable")
        .orderBy("layout", "zone")
    }),

    // SCD2 POINT-IN-TIME lookup: each view event joined to the
    // purchase-history version valid at its timestamp — the lakehouse
    // "dimension as of fact time" question, composed as Cdc.scd2 →
    // as-of join (a version interval match IS an as-of on version
    // starts when versions tile time). Views before a user's first
    // version drop (inner interval semantics).
    "q139_pit_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val hist = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("valid_from_us"), col("value"))
      val dims = Cdc.scd2(hist, Seq("user_id"),
          Seq("valid_from_us", "event_id"), "valid_from_us")
        .select(col("user_id"), col("valid_from_us").as("us"),
          col("event_id"), col("version"),
          col("value").as("value_at_time"))
      val facts = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("us"))
      AsOfJoin.asOf(facts, dims, "user_id", "us", "event_id",
          Seq("version", "value_at_time"))
        .withColumnRenamed("asof_version", "version")
        .withColumnRenamed("asof_value_at_time", "value_at_time")
        .filter(col("version").isNotNull)
        .orderBy("event_id")
    }),

    // Exact heavy hitters (count·30 > n) via per-partition Misra-Gries
    // candidates + an exact recount of candidates only — the sketch
    // changes the plan (no full distinct-word shuffle), never the
    // answer, so the HAVING oracle matches bit-for-bit.
    "q145_heavy_hitters" -> ((s, dir) => {
      TextAnalysis.heavyHitters(t(s, dir, "documents"), "text", k = 30)
    }),

    // Keep-the-BEST dedup rewrite map: q53's LSH clusters, keeper =
    // longest member (min doc_id tiebreak), singletons map to
    // themselves — the artifact downstream references rewrite through.
    "q146_canonical_pick" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = minhashPairs(s, dir)
      Dedup.canonicalMap(docs, "doc_id", "n_chars", pairs,
          "doc_a", "doc_b")
        .orderBy("doc_id")
    }),

    // lang × source independence audit: one corpus aggregate to
    // contingency cells, marginals from the cells themselves,
    // shared-IEEE expected counts and chi-square contributions.
    "q147_chisq_assoc" -> ((s, dir) => {
      Stats.chiSquare(t(s, dir, "documents"), "lang", "source")
        .orderBy("lang", "source")
    }),

    // Per-source 2,000-char budget fill in deterministic (md5, id)
    // order — the weighted (token-budget) sibling of q136. The budget
    // binds in EVERY source at sf0.01 (~25 docs × ~190 chars each), so
    // the straddling-bucket prefix-sum path is what the oracle checks.
    "q148_budget_fill" -> ((s, dir) => {
      Curation.budgetFill(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"),
          "source", "doc_id", "n_chars", budget = 2000L)
        .orderBy("doc_id")
    }),

    // Quantity-weighted price percentiles per return flag — the
    // weighted lower quantile (smallest price whose cumulative
    // quantity reaches ⌈q·W⌉) via the two-phase histogram with weight
    // MASS in place of row counts; RANGE-frame peers make ties
    // row-order-free.
    "q149_weighted_quantile" -> ((s, dir) => {
      Stats.weightedQuantiles(t(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice", "l_quantity", Seq(0.25, 0.5, 0.9))
        .orderBy("l_returnflag", "q")
    }),

    // Synchronous label-propagation communities (2 rounds, majority
    // vote, min-label ties) over the part–supplier incidence graph —
    // the dense-region sibling of q53's reachability components,
    // deterministic by integer argmax scoring.
    "q150_label_prop" -> ((s, dir) => {
      lpaLabels(s, dir, rounds = 2).orderBy("node")
    }),

    // PII census — the scrub-before-training pass. The corpus carries
    // no PII, so the query derives deterministic instances from doc_id
    // (email always; phone every 3rd; IP every 5th; SSN-shaped every
    // 7th) and the oracle rebuilds the IDENTICAL strings — the regex
    // extraction itself is what's verified, in the Java∩RE2 pattern
    // subset both engines share.
    "q151_pii_scan" -> ((s, dir) => {
      TextAnalysis.piiScan(piiDocs(t(s, dir, "documents")), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Redaction twin: each hit replaced by its <KIND> tag in declared
    // pattern order — the persisted form of a scrubbed corpus.
    "q152_pii_redact" -> ((s, dir) => {
      TextAnalysis.piiRedact(piiDocs(t(s, dir, "documents")), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Join-key skew audit: hottest user_ids with corpus share — the
    // diagnostic that decides salting (q130) vs AQE skew-split before
    // a 100 TB join, as a combinable count + heap top-N (no full sort
    // of the key domain).
    "q153_skew_audit" -> ((s, dir) => {
      Stats.skewAudit(t(s, dir, "events"), "user_id", topN = 20)
    }),

    // C4-style boilerplate removal: lines shared by ≥3 documents of
    // the same source are template chrome and drop; survivors rejoin
    // in original order. Documents have no newlines, so 2-word lines
    // are derived identically in both engines (the threshold and line
    // width are fixture-tuned so removal AND survival both occur —
    // ~600 of ~9700 distinct (source, line) pairs are boilerplate).
    "q154_boilerplate" -> ((s, dir) => {
      TextAnalysis.boilerplateStrip(lineDocs(t(s, dir, "documents")),
        "doc_id", "source", "text", minDocs = 3)
        .orderBy("doc_id")
    }),

    // Deterministic PPS sampling: expected ~100 docs kept with
    // probability ∝ n_chars — the compute-budgeted subset that weights
    // token mass, not document count; md5-threshold acceptance, no RNG.
    "q155_pps_sample" -> ((s, dir) => {
      Curation.ppsSample(t(s, dir, "documents"), "doc_id", "n_chars",
        k = 100)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // CROSS-SOURCE duplication matrix: which sources near-duplicate
    // into which — q31's LSH pair pipeline rolled up by unordered
    // source pair. The report that decides which feed to cut when the
    // same content arrives twice; source labels attach broadcast.
    "q156_source_dup_matrix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val src = docs.select(col("doc_id"), col("source"))
      minhashPairs(s, dir)
        .join(broadcast(src.select(col("doc_id").as("doc_a"),
          col("source").as("sa"))), "doc_a")
        .join(broadcast(src.select(col("doc_id").as("doc_b"),
          col("source").as("sb"))), "doc_b")
        .select(least(col("sa"), col("sb")).as("source_x"),
          greatest(col("sa"), col("sb")).as("source_y"))
        .groupBy("source_x", "source_y")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_x", "source_y")
    }),

    // TEMPORAL split + leakage guard: train < cutoff ≤ validation,
    // with the count of validation events whose user also appears in
    // train — the temporal-leakage report an eval-split pipeline
    // publishes. Distinct train users close over one aggregate; the
    // membership flag joins back on user_id.
    "q157_temporal_split" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cutoff = expr("timestamp'2024-01-22 00:00:00'")
      val train = ev.filter(col("ts") < cutoff)
      val vali = ev.filter(col("ts") >= cutoff)
      val trainUsers = train.select("user_id").distinct()
        .withColumn("_seen", lit(1L))
      val tAgg = train.groupBy("event_type")
        .agg(count(lit(1)).as("n_train"))
      val vAgg = vali.join(trainUsers, Seq("user_id"), "left")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_val"),
          sum(coalesce(col("_seen"), lit(0L))).as("n_val_leaked"))
      tAgg.join(vAgg, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          coalesce(col("n_train"), lit(0L)).as("n_train"),
          coalesce(col("n_val"), lit(0L)).as("n_val"),
          coalesce(col("n_val_leaked"), lit(0L)).as("n_val_leaked"))
        .orderBy("event_type")
    }),

    // Equi-depth binning (ntile WITHOUT the whole-group sort): 8 bins
    // of events.value per event_type via broadcast quantile cutpoints;
    // value-deterministic tie handling, verified per row.
    "q158_equi_depth_bin" -> ((s, dir) => {
      Stats.equiDepthBin(
          t(s, dir, "events").select("event_id", "event_type", "value"),
          "event_type", "value", nBins = 8)
        .select("event_id", "bin")
        .orderBy("event_id")
    }),

    // Embedding cluster-health profile: per trained cluster, size and
    // quantized-L2 dispersion (mean + max distance-to-centroid) — the
    // report that says whether k is right before SemDeDup trusts the
    // clustering. Broadcast centroids, one combinable aggregate.
    "q159_cluster_profile" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
      val assigned = vecs
        .join(broadcast(trainedCentroids(s, dir, 8, 2)
          .select(col("cluster"), col("centroid").as("cv"))))
        .select(col("vec_id"), col("cluster"),
          aggregate(zip_with(col("v"), col("cv"),
            (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
            .as("d2"))
        .groupBy("vec_id")
        .agg(expr("max_by(cluster, struct(-d2, -cluster))").as("cluster"),
          min(col("d2")).as("d2"))
      assigned.groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          expr("sum(d2) div count(1)").as("mean_d2"),
          max(col("d2")).as("max_d2"))
        .orderBy("cluster")
    }),

    // RECALL@10 of the int8 ladder vs the exact ranking — the eval
    // metric that justifies running compressed retrieval at all (the
    // q120/q124 ladder's report card). Both rankings are heap top-k;
    // the intersection is a 10-row-per-query join.
    "q160_recall_at_k" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val approx = Similarity.int8TopK(emb, qids, "vec_id", "embedding",
        k = 10).select(col("query_id"), col("vec_id"), lit(1L).as("_hit"))
      val exact = Similarity.bruteForceTopK(emb, qids, "vec_id", "embedding",
        k = 10).select(col("query_id"), col("vec_id"))
      exact.join(approx, Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
        .select(col("query_id"), col("n_hit"),
          expr("(1000 * n_hit) div k").as("recall_permille"))
        .orderBy("query_id")
    }),

    // WINSORIZED per-group stats: clip events.value at the exact
    // [p05, p95] two-phase quantiles and report the clipped mass — the
    // outlier-robust rollup that replaces mean-with-outliers. Clip
    // bounds broadcast; the corpus is never sorted.
    "q161_winsorized" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cuts = Stats.exactQuantiles(ev, "event_type", "value",
          Seq(0.05, 0.95))
        .groupBy(col("event_type").as("_g"))
        .agg(min(when(col("q") === 0.05, col("quantile_value"))).as("p05"),
          min(when(col("q") === 0.95, col("quantile_value"))).as("p95"))
      val x = col("value").cast("double")
      ev.join(broadcast(cuts), col("event_type") <=> col("_g"))
        .select(col("event_type"), x.as("x"), col("p05"), col("p95"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min(col("p05")).as("p05"), min(col("p95")).as("p95"),
          sum(when(col("x") < col("p05"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("x") > col("p95"), 1L).otherwise(0L)).as("n_clip_hi"),
          sum(least(greatest(col("x"), col("p05")), col("p95"))
            .cast("decimal(18,3)")).cast("double").as("sum_winsorized"))
        .orderBy("event_type")
    }),

    // USER BEHAVIOR SEQUENCES: each user's first 12 events as an
    // ordered event-type string — the session→sequence build for
    // next-event training data. The rank window is per-user (bounded
    // partitions, WindowGroupLimit prunes pre-shuffle); the rebuild is
    // one aggregate on the same key, so the exchange is reused.
    "q162_user_sequences" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      ev.withColumn("n_total", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 12)
        .groupBy("user_id")
        .agg(
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            s => s.getField("event_type"))).as("seq"),
          count(lit(1)).as("seq_len"),
          min(col("n_total")).as("n_total"))
        .orderBy("user_id")
    }),

    // MERGEABLE quantile sketch: per-flag price quantile ESTIMATES
    // from a deterministic bottom-256-by-hash row sample — the
    // bounded-state sibling of q63's exact two-phase selector, with
    // the estimate itself hash-verified (the sample is a pure function
    // of md5, so the oracle draws the identical one).
    "q163_sample_quantiles" -> ((s, dir) => {
      Sketch.hashSampleQuantiles(t(s, dir, "lineitem"),
          Seq("l_returnflag"),
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")),
          "l_extendedprice", k = 256, qs = Seq(0.5, 0.9))
        .orderBy("l_returnflag", "q")
    }),

    // END-TO-END CURATION FUNNEL: the per-stage attrition report a
    // corpus-cleaning pipeline publishes — language-confident →
    // quality-gated → near-dup-deduplicated, each stage composing the
    // operators the earlier queries verify in isolation (languageId,
    // stats, minHashLsh, connectedComponents). Every stage is
    // non-vacuous on the fixture (453/500 lang, ~3/4 quality, ~25
    // near-dup pairs).
    "q164_curation_funnel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lang = TextAnalysis.languageId(docs, "doc_id", "text")
        .filter(col("predicted_lang") =!= "und").select("doc_id")
      val s1 = docs.join(lang, Seq("doc_id"), "left_semi")
      val qual = TextAnalysis.stats(s1, "doc_id", "text")
        .filter(col("stopword_ratio") >= 0.04).select("doc_id")
      val s2 = s1.join(qual, Seq("doc_id"), "left_semi")
        // three consumers below (pair restriction + keeper filter +
        // count): the filtered corpus is the expensive-to-recompute
        // input
        .localCheckpoint()
      // near-dup pairs come from the shared train-once artifact,
      // restricted to the surviving corpus — exact, see
      // minhashPairsWithin (LSH is per-doc/per-pair pure)
      val pairs = minhashPairsWithin(s, dir, s2)
      val comp = Graph.connectedComponents(pairs, "doc_a", "doc_b")
      val s3 = s2.join(comp, col("doc_id") === col("node"), "left")
        .filter(coalesce(col("component"), col("doc_id")) === col("doc_id"))
      Seq("0_all" -> docs, "1_lang" -> s1, "2_quality" -> s2,
          "3_neardup" -> s3)
        .map { case (n, d) =>
          d.agg(count(lit(1)).as("n_docs"))
            .select(lit(n).as("stage"), col("n_docs"))
        }
        .reduce(_ union _)
        .orderBy("stage")
    }),

    // DISTRIBUTION DRIFT: pairwise two-sample KS distances between the
    // per-source document-length distributions — raw data touched once,
    // everything downstream at distinct-value cardinality.
    "q165_ks_matrix" -> ((s, dir) => {
      Stats.ksMatrix(t(s, dir, "documents"), "source", "n_chars")
        .orderBy("sample_a", "sample_b")
    }),

    // FIRST-ORDER MARKOV TRANSITIONS of the event stream: the
    // behavioral fingerprint a sequence-training build publishes.
    // (ts, event_id) ordering per user, |types|² output.
    "q166_transitions" -> ((s, dir) => {
      Events.transitionMatrix(t(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type")
        .orderBy("from_type", "to_type")
    }),

    // SOURCE-MIXTURE CONCENTRATION: per-source shares + HHI +
    // effective-source count. Entropy deliberately absent (ln is not
    // cross-engine exact — see the operator doc).
    "q167_mixture_report" -> ((s, dir) => {
      Curation.mixtureConcentration(t(s, dir, "documents"), "source")
        .orderBy("domain")
    }),

    // N-GRAM NOVELTY of the odd-id half of the corpus against the
    // even-id half as reference — per-doc trigram non-overlap share,
    // digest-keyed end to end.
    "q168_ngram_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.ngramNovelty(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // EXACT PEARSON CORRELATION MATRIX over the lineitem measures from
    // one aggregate pass — exact-decimal moments, fixed double formula.
    "q169_corr_matrix" -> ((s, dir) => {
      Stats.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")
    }),

    // SNAPSHOT PROFILE DRIFT: the promote-gate report between the
    // pre-1998 and 1998+ halves of orders — null-rate permille, value
    // range, cardinality and mean movement per column, from one
    // aggregate pass per snapshot.
    "q170_profile_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val cut = lit("1998-01-01").cast("timestamp")
      DataQuality.profileDrift(
          o.filter(col("o_orderdate") < cut),
          o.filter(col("o_orderdate") >= cut),
          Seq("o_orderkey", "o_custkey", "o_totalprice"))
        .orderBy("col_name")
    }),

    // PRODUCT QUANTIZATION: 2×32-dim subspace codebooks (8 codewords,
    // 2 Lloyd iterations — the q51 training recipe per slice), then
    // every vector encoded as two code ids + exact quantized squared
    // errors in ONE narrow literal-codebook projection.
    "q172_pq_encode" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cbs = pqCache.getOrElseUpdate((dir, 2, 32, 8, 2),
        Pq.trainCodebooks(emb, "vec_id", "embedding",
          m = 2, subDim = 32, k = 8, iters = 2))
      Pq.encode(emb, "vec_id", "embedding", cbs, subDim = 32)
        .orderBy("vec_id")
    }),

    // ADC TOP-K: the IVF-PQ scan loop over the q172 codes — per-query
    // 2×8 integer distance tables against the cached codebooks, every
    // vector scored by two table lookups; integer d2 end to end.
    "q173_pq_adc_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cbs = pqCache.getOrElseUpdate((dir, 2, 32, 8, 2),
        Pq.trainCodebooks(emb, "vec_id", "embedding",
          m = 2, subDim = 32, k = 8, iters = 2))
      Pq.adcTopK(emb, "vec_id", "embedding", cbs, subDim = 32,
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
        .orderBy("query_id", "rank")
    }),

    // COMPACTION PLAN: the documents table as a file inventory (one
    // "file" per doc — size n_chars, partition source) packed into
    // 10 kB rewrite bins; bin_files > 1 rows are the merge work list.
    "q174_compaction_plan" -> ((s, dir) => {
      Layout.compactionPlan(
          t(s, dir, "documents").select("source", "doc_id", "n_chars"),
          "source", "doc_id", "n_chars", targetBytes = 10000L)
        .orderBy("source", "doc_id")
    }),

    // HYBRID retrieval: fuse the int8 dot ranking (q120's rung) with
    // its L2 sibling by reciprocal-rank fusion — rank-only combination,
    // integer RRF scores, n_lists consensus kept.
    "q175_rrf_fusion" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L)
      Search.rrfFuse(
          Seq(Similarity.int8TopK(emb, qids, "vec_id", "embedding", k = 20),
            Similarity.int8L2TopK(emb, qids, "vec_id", "embedding", k = 20)),
          "query_id", "vec_id", "rank", k0 = 60, topK = 10)
        .orderBy("query_id", "rank")
    }),

    // LEAKAGE-SAFE grouped split: bucket by md5(source) so every doc of
    // a source lands in one split (no near-dup straddle), then report
    // the split sizes — lumpy by design with 20 groups, which is the
    // honest cost the report makes visible.
    "q176_group_split" -> ((s, dir) => {
      Curation.groupedSplit(t(s, dir, "documents"), "source",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(countDistinct(col("source")).as("n_groups"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("split")
    }),

    // Consistent-hash vs modulo shard-scaling audit: per shard, how
    // much data each scheme moves when an 8-shard layout grows to 9.
    "q177_shard_plan" -> ((s, dir) => {
      val per = Layout.consistentShards(
        t(s, dir, "documents").select("doc_id"), "doc_id",
        shards = 8, vnodes = 16)
      val mods = per.groupBy(col("shard_mod").as("shard"))
        .agg(count(lit(1)).as("n_mod"),
          sum(when(col("shard_mod") =!= col("shard_mod_new"), 1L)
            .otherwise(0L)).as("mod_moved"))
      val rings = per.groupBy(col("shard_ring").as("shard"))
        .agg(count(lit(1)).as("n_ring"),
          sum(when(col("shard_ring") =!= col("shard_ring_new"), 1L)
            .otherwise(0L)).as("ring_moved"))
      // FULL outer + coalesce-to-0: a shard that receives zero rows
      // under either scheme must still appear in the audit as n=0, not
      // silently vanish (r7 ADVICE). Full outer can't broadcast, so
      // hint shuffle-hash: both sides are shard-count-sized aggregates
      // already partitioned on the key (exchange reuse, no sort).
      mods.hint("shuffle_hash").join(rings, Seq("shard"), "full_outer")
        .select(col("shard"),
          coalesce(col("n_mod"), lit(0L)).as("n_mod"),
          coalesce(col("mod_moved"), lit(0L)).as("mod_moved"),
          coalesce(col("n_ring"), lit(0L)).as("n_ring"),
          coalesce(col("ring_moved"), lit(0L)).as("ring_moved"))
        .orderBy("shard")
    }),

    // Recency-weighted activity: stepped dyadic half-life decay in
    // exact integer milli-units, anchored to the corpus max timestamp.
    "q178_decayed_counts" -> ((s, dir) => {
      Events.decayedCounts(t(s, dir, "events"), "event_type", "ts",
          halfLifeDays = 7)
        .orderBy("event_type")
    }),

    // Snapshot diff: simulated next-day orders (1/13 removed, 1/11
    // cloned as new keys, price/status edits) classified added /
    // removed / changed / same with per-column change counts.
    "q179_snapshot_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val newSnap = o.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 5 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .unionAll(o.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      Reconcile.rowDiff(o, newSnap, "o_orderkey",
        Seq("o_custkey", "o_totalprice", "o_orderstatus"))
    }),

    // Token-budget mixture plan: per-source epoch factors (integer
    // milli-epochs) to fill a 50k-token budget at uniform target
    // shares over the 20 sources — budget/cap picked so the 2.0-epoch
    // cap binds for SOME sources (both schedule regimes exercised).
    "q180_epoch_schedule" -> ((s, dir) => {
      val shares = (0 until 20).map(i => (s"src$i", 50L))
      Curation.epochSchedule(t(s, dir, "documents"), "source",
          size(split(col("text"), " ")).cast("long"), shares,
          budgetTokens = 50000L, capMilli = 2000L)
        .orderBy("source")
    }),

    // Deterministic training-order interleave: stride scheduling over
    // ten sources, src0/src1 at 4x the share of the rest — every
    // schedule prefix holds domains in share proportion, no RNG.
    "q181_stride_interleave" -> ((s, dir) => {
      val shares = Seq("src0" -> 200L, "src1" -> 200L) ++
        (2 until 10).map(i => s"src$i" -> 50L)
      Curation.strideInterleave(t(s, dir, "documents"), "doc_id", "source",
          shares)
        .orderBy("sched_pos")
    }),

    // LSH parameter eval: q33's banding (k=36, 4x9) measured against
    // the exact shared-shingle ground truth at the same 0.5 threshold.
    // The ground truth is QUADRATIC in sample size (its contract says
    // sample-only — frequent shingles like " the " degenerate the
    // shared-shingle blocking toward all-pairs at a 0.5 threshold), so
    // the eval runs on the doc_id < 400 prefix: 80% of the sf0.01
    // fixture, a ~1/12 sample at sf0.1 — measured 174 s unsampled at
    // sf0.1, ~24 s at 600 docs in full-bench context, ~10 s at 400.
    "q182_lsh_recall_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 400)
      Dedup.lshCandidateEval(
        Dedup.charShingleRows(docs, "doc_id", "text", 5),
        k = 36, bands = 4, rows = 9, threshold = 0.5)
    }),

    // Time-series anomaly detection: hourly event-rate MAD outliers
    // per type — the robust operators (q111) pointed at a derived
    // rate series, the ops-dashboard "did ingestion spike" question.
    "q184_hourly_anomaly" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).cast("double").as("n"))
      Stats.madOutliers(hourly, "event_type", "n", k = 3.0)
        .orderBy("event_type")
    }),

    // Per-domain CALIBRATED quality gate: keep each source's top half
    // by WITHIN-SOURCE percent rank — sources score on different
    // scales, so a global threshold over-prunes some and under-prunes
    // others; rank calibration equalizes the kept fraction while
    // min_kept_quality exposes how different the raw cutoffs are.
    "q185_calibrated_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("source"))
        .join(qualityScores(s, dir), "doc_id")
      Stats.percentRankMilli(scored, "source", "quality")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("prank_milli") >= 500, 1L).otherwise(0L))
            .as("n_kept"),
          min(when(col("prank_milli") >= 500, col("quality")))
            .as("min_kept_quality"))
        .orderBy("source")
    }),

    // Behavioral pattern mining: the 10 most frequent event-type
    // trigrams across user timelines (q166's transition matrix ranks
    // the distribution; this ranks the concrete sequences).
    "q189_event_trigrams" -> ((s, dir) => {
      Events.topEventNgrams(t(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type", n = 3, k = 10)
    }),

    // Ranking-metric eval: does n_chars separate English docs from the
    // rest? Exact integer Mann-Whitney AUC with midrank ties.
    "q190_auc_quality" -> ((s, dir) => {
      Stats.aucMicro(t(s, dir, "documents"), col("lang") === "en",
        "n_chars")
    }),

    // Per-source inspection sample: exactly 5 docs per source by
    // bottom-k md5 order — deterministic, insertion-monotone.
    "q188_group_sample" -> ((s, dir) => {
      Curation.groupSample(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"),
          "source", "doc_id", k = 5)
        .orderBy("source", "smp_rank")
    }),

    // SEMANTIC decontamination: corpus (vec_id >= 100) vs benchmark
    // (vec_id < 100) blocked on shared hyperplane bands — the
    // paraphrase-level contamination check n-gram overlap (q49/q103)
    // cannot see.
    "q187_semantic_decontam" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.semanticDecontamination(
          emb.filter(col("vec_id") >= 100), emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", dim = 64, nPlanes = 16, bands = 4,
          threshold = 0.3)
        .orderBy("vec_id")
    }),

    // Domain fingerprints: top-3 distinctive tokens per source by
    // integer tf·idf over GROUP document frequency.
    "q186_source_terms" -> ((s, dir) => {
      Search.distinctiveTerms(t(s, dir, "documents"), "source", "text",
          k = 3, minLen = 4)
        .orderBy("source", "rnk")
    }),

    // Duplicate-cluster size census over q53's components: how many
    // clusters of each size (singletons are not clusters — components
    // exist only for paired docs).
    "q183_dup_cluster_census" -> ((s, dir) => {
      val pairs = minhashPairs(s, dir)
      Graph.connectedComponents(pairs, "doc_a", "doc_b")
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"))
        .orderBy("cluster_size")
    }),

    // COUNT-MIN sketch point-frequency estimates vs exact counts for
    // the 30 heaviest tokens: est >= exact always (collisions only
    // inflate), `overcount` is the measured collision mass for a
    // 4x8192-counter summary of the whole token stream. Completes the
    // sketch family: KMV = how many distinct (q84), Misra-Gries =
    // which are heaviest (q145), count-min = how often is THIS one.
    "q193_count_min" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
      val sk = Sketch.countMinSketch(toks, "token", depth = 4, width = 8192)
      val probes = toks.groupBy("token")
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token")).limit(30)
      Sketch.countMinLookup(sk, probes, "token", depth = 4, width = 8192)
        .select(col("token"), col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overcount"))
        .orderBy("token")
    }),

    // sqrt-TEMPERATURE (α=1/2) language rebalance: head languages
    // down-weighted toward √n shares under a 200-row budget — the
    // XLM-R/mT5 sampling recipe with exact integer thresholds (isqrt
    // + 128-bit decimal products, no pow, no RNG).
    "q194_sqrt_temperature" -> ((s, dir) => {
      Curation.sqrtTemperatureSample(t(s, dir, "documents"), "lang",
          "doc_id", budget = 200L)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // POSITIONAL PHRASE SEARCH: exact adjacent-token sequence match via
    // rebased posting-list equi-joins; postings filtered to the two
    // query terms before any shuffle.
    "q196_phrase_search" -> ((s, dir) => {
      Search.phraseSearch(t(s, dir, "documents"), "doc_id", "text",
          Seq("table", "hash"), k = 20)
        .orderBy(col("n_matches").desc, col("doc_id"))
    }),

    // HARD-NEGATIVE MINING: per query vector, top-10 most-similar
    // vectors with a DIFFERENT label on the shared int8 grid — the
    // contrastive-training pair generator.
    "q197_hard_negatives" -> ((s, dir) => {
      Similarity.int8HardNegatives(t(s, dir, "embeddings"),
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), "vec_id", "embedding",
          "label", k = 10)
        .orderBy("query_id", "rank")
    }),

    // DOCUMENT EDIT-DISTANCE MINING: the 25 closest pairs by full-text
    // Levenshtein under first-2-token blocking (complete within blocks
    // by construction; cross-block pairs missed by design).
    "q198_edit_distance_pairs" -> ((s, dir) => {
      FuzzyJoin.closestPairsByEditDistance(t(s, dir, "documents"),
          "doc_id", "text", blockTokens = 2, topN = 25, lenCap = 120)
        .orderBy(col("dist"), col("id_a"), col("id_b"))
    }),

    // SESSION CONCURRENCY SWEEP: boundary-instant open-session counts
    // over the 30-minute gap sessions; top 20 peaks.
    "q199_concurrency" -> ((s, dir) => {
      val sess = Events.sessionize(t(s, dir, "events"), gapMinutes = 30)
      Events.concurrencySweep(sess, "session_start_us", "session_end_us")
        .orderBy(col("concurrency").desc, col("t"))
        .limit(20)
        .select(col("t").as("t_us"), col("concurrency"))
    }),

    // LANGUAGE MIXTURE / code-switch report: top-2 marker-language hits
    // per document with an integer permille ratio.
    "q200_language_mixture" -> ((s, dir) => {
      TextAnalysis.languageMixture(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // SOURCE-OVERLAP MATRIX: pairwise vocabulary Jaccard between the
    // five crawl sources from ONE KMV sketch per source — sketch-sized
    // pairwise math, single corpus pass.
    "q201_source_overlap" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      Sketch.kmvOverlapMatrix(toks, "source", col("tok"), k = 128)
        .orderBy("ga", "gb")
    }),

    // PARTITION-QUALITY EVAL: Newman modularity of the q150 label-prop
    // communities on the part-supplier incidence graph — scores the
    // clustering the way q182 scores LSH banding.
    "q202_modularity" -> ((s, dir) => {
      Graph.modularity(partSupplierEdges(s, dir), lpaLabels(s, dir, 2),
        "a", "b", "node", "label")
    }),

    // k-NN LABEL-NOISE AUDIT: every 10th vector audited against its 10
    // nearest labeled neighbors on the int8 grid — confident-learning
    // style mislabel ranking (audit set sample-bounded by contract).
    "q203_knn_label_noise" -> ((s, dir) => {
      Similarity.knnLabelNoise(t(s, dir, "embeddings"),
          col("vec_id") % 10 === 0, "vec_id", "embedding", "label", k = 10)
        .orderBy("query_id")
    }),

    // INTER-ARRIVAL BURSTINESS: top-20 burstiest users by integer CV²
    // of second-quantized event gaps — the bot-vs-human dispersion
    // screen over behavioral data.
    "q204_burstiness" -> ((s, dir) => {
      Events.interArrivalBurstiness(t(s, dir, "events"), "user_id", "ts",
        minGaps = 20, k = 20)
    }),

    // JOIN-AMPLIFICATION AUDIT: top-20 lineitem⋈lineitem partkey hot
    // keys from two count aggregates — the pre-join skew report.
    "q205_join_amplification" -> ((s, dir) => {
      // cast at the call site: the operator keeps native key types
      val li = t(s, dir, "lineitem")
        .withColumn("_k", col("l_partkey").cast("long"))
      Layout.joinAmplification(li, "_k", li, "_k", k = 20)
    }),

    // EVENT-TIME LATENESS AUDIT: per type, bucketed lateness vs the
    // running max event time in arrival (event_id) order — the
    // measured basis for every streaming twin's watermark.
    "q206_lateness_audit" -> ((s, dir) => {
      Events.latenessAudit(t(s, dir, "events"), "event_type", "ts",
        "event_id")
    }),

    // EMBEDDING CENTROID DRIFT: per label, exact squared-L2 distance
    // between the even- and odd-id slices' mean embeddings (micro
    // units) — the silent-model-swap canary.
    "q208_centroid_drift" -> ((s, dir) => {
      val em = t(s, dir, "embeddings")
      Similarity.centroidDrift(
          em.filter(col("vec_id") % 2 === 0),
          em.filter(col("vec_id") % 2 === 1),
          "label", "embedding")
        .orderBy("label")
    }),

    // PADDING-WASTE AUDIT: the bucket-ladder FLOP bill for dynamic
    // batching — pad and truncation token counts per cap.
    "q209_padding_audit" -> ((s, dir) => {
      Curation.paddingAudit(t(s, dir, "documents"), "text",
        buckets = Seq(8L, 16L, 32L, 64L, 128L))
    }),

    // DEDUP THRESHOLD SWEEP: pairs/losers at 700/800/900‰ from ONE
    // LSH candidate pass with exact integer cutoffs — the knob-tuning
    // table behind q31's 0.8.
    "q210_threshold_sweep" -> ((s, dir) => {
      Dedup.thresholdSweep(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 2, k = 24, bands = 4, rows = 6,
        thresholdsPermille = Seq(700L, 800L, 900L))
    }),

    // CONTAMINATION n-GRAM SWEEP: q49's benchmark split re-scanned at
    // shingle n = 2, 3, 4 — how the decontamination n gets chosen.
    //
    // NOT rewired onto the artifact family (r12 verdict item 7,
    // decided): the pair artifact stores verified near-dup PAIRS; this
    // sweep consumes per-document shingle SETS (exploded digest join
    // against the benchmark's distinct shingles) — no LSH pipeline
    // exists here to elide, so the only shareable piece would be the
    // shingling pass itself. A shingle-level artifact is a poor trade:
    // the exploded (doc, shingle-digest) table is corpus×~35 rows
    // (LARGER than the corpus, ~3 legs' worth of parquet I/O to write
    // once), while recomputing it is one cheap narrow projection per
    // leg with no shuffle — and only the n=2 leg could share it with
    // the rest of the family anyway. Contrast with minhashPairs, which
    // elides eight full shingle→signature→band→verify pipelines.
    "q211_contamination_sweep" -> ((s, dir) => {
      Curation.contaminationSweep(t(s, dir, "documents"), "doc_id",
        "text", col("doc_id") % 50 === 0, ns = Seq(2, 3, 4))
    }),

    // QUALITY×DUP CROSS PROFILE: near-dup rate per quality decile —
    // "are my duplicates concentrated in the junk?" — the analysis
    // that decides whether dedup or quality filtering runs first.
    // Deciles are exact integer rank arithmetic ((10·(rn−1)) div n,
    // no boundary-interpolation ambiguity); dup flags are q31's
    // loser set (distinct doc_b at jaccard ≥ 0.8, the pairwise view).
    // The global rank window is corpus-sized — at 100 TB this is the
    // q181 range-partition + prefix-count two-pass, stated.
    "q213_quality_dup_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = qualityScores(s, dir)
      val losers = minhashPairs(s, dir)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("_dup", lit(1L))
      // the corpus total rides the SAME single-partition window pass
      // as the rank (full frame vs growing frame) — no eager count
      // job, no second scan
      val w = Window.orderBy("quality", "doc_id")
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      scored
        .withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(wAll))
        .withColumn("decile",
          // 10L: _rn is 32-bit; the int product would overflow at
          // ~2^31/10 rows where the BIGINT oracle keeps going
          least(lit(9L), expr("(10L * (_rn - 1)) div _n")))
        .join(losers, Seq("doc_id"), "left")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("_dup"), lit(0L))).as("n_dups"),
          min(col("quality")).as("q_min"),
          max(col("quality")).as("q_max"))
        .select(col("decile"), col("n_docs"), col("n_dups"),
          expr("(1000 * n_dups) div n_docs").as("dup_permille"),
          col("q_min"), col("q_max"))
        .orderBy("decile")
    }),

    // RETRIEVAL DIVERSITY@k: distinct labels among each query's int8
    // top-10 — the result-diversity metric next to q160's recall@k
    // (a ranker can be accurate AND collapsed onto one label; both
    // numbers gate a retrieval index). Metadata-scale on top of the
    // top-k lists; integer permille.
    "q214_diversity_at_k" -> ((s, dir) => {
      val em = t(s, dir, "embeddings")
      val topk = Similarity.int8TopK(em, Seq(0L, 1L, 2L, 3L, 4L),
        "vec_id", "embedding", k = 10)
      val lab = em.select(col("vec_id"), col("label").cast("long").as("label"))
      topk.join(lab, "vec_id")
        .groupBy("query_id")
        .agg(count(lit(1)).as("k_eff"),
          countDistinct(col("label")).as("n_labels"))
        .select(col("query_id"), col("k_eff"), col("n_labels"),
          expr("(1000 * n_labels) div k_eff").as("diversity_permille"))
        .orderBy("query_id")
    }),

    // MULTIMODAL FRAME POOLING: sample → per-frame features → exact
    // integer mean-pool, one vector per media item (the video-encoder
    // pipeline shape with the stub feature tier).
    "q215_frame_pooling" -> ((s, dir) => {
      val m = Multimodal.mediaTable(t(s, dir, "documents"))
      Multimodal.framePooling(m, everyK = 100, frameBytes = 16)
        .orderBy("media_id")
    }),

    // CONTRASTIVE TRIPLET MINING: (anchor, positive, negative) —
    // positives are q31's near-dup pairs; the negative is the anchor's
    // most int8-similar vector OUTSIDE its near-dup component (a
    // same-cluster "negative" would be a false negative that poisons
    // the contrastive loss). doc/vec ids are aligned in the fixture —
    // the text and embedding views of one corpus. Everything past the
    // pair mining is anchor-count-sized: candidates top-8 per anchor,
    // component tags join on ids, min_by picks rank 1 survivor.
    "q216_triplet_mining" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = minhashPairs(s, dir)
      val comps = Graph.connectedComponents(pairs, "doc_a", "doc_b")
      val cands = Similarity.int8TopKForIds(emb,
        pairs.select("doc_a"), "vec_id", "embedding", k = 8)
      val ca = comps.select(col("node").as("query_id"),
        col("component").as("_ca"))
      val cb = comps.select(col("node").as("vec_id"),
        col("component").as("_cb"))
      val negs = cands.join(ca, "query_id")
        .join(cb, Seq("vec_id"), "left")
        .filter(col("_cb").isNull || col("_cb") =!= col("_ca"))
        .groupBy("query_id")
        .agg(expr("min_by(vec_id, rank)").as("negative"),
          expr("min_by(dot, rank)").as("neg_dot"))
      pairs.select(col("doc_a").as("anchor"), col("doc_b").as("positive"))
        .join(negs, col("anchor") === col("query_id"))
        .select(col("anchor"), col("positive"), col("negative"),
          col("neg_dot"))
        .orderBy("anchor", "positive")
    }),

    // ZONE-BLOOM PRUNING AUDIT: per probe source, zones skipped /
    // admitted / falsely admitted by a per-zone 256-bit Bloom over the
    // zone's sources. Present probes legitimately admit every zone
    // (sources span all zones in this layout — the audit says so
    // instead of pretending); the absent probe shows the skip rate
    // the filter actually buys, minus its measured false positives.
    "q217_zone_bloom" -> ((s, dir) => {
      Layout.zoneBloomAudit(t(s, dir, "documents"),
        expr("doc_id div 50"), "source",
        probes = Seq("src3", "src15", "src-absent"),
        bits = 256, kHash = 3)
    }),

    // CROSS-LINGUAL DUPLICATE DETECTION: high-cosine pairs whose
    // documents carry DIFFERENT langs — translated/mirrored content
    // that n-gram dedup can never see (zero shared shingles). The
    // sign-LSH banding runs UNBLOCKED (a lang block would hide exactly
    // the pairs we want); the lang tags join on the aligned doc ids
    // after verification, pair-count-sized.
    "q218_crosslingual_dups" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val langs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      Dedup.embeddingCosineLsh(emb, "vec_id", "embedding",
          blockCols = Seq(), dim = 64, nPlanes = 16, bands = 4,
          threshold = 0.3)
        .join(langs.select(col("doc_id").as("id_a"),
          col("lang").as("lang_a")), "id_a")
        .join(langs.select(col("doc_id").as("id_b"),
          col("lang").as("lang_b")), "id_b")
        .filter(col("lang_a") =!= col("lang_b"))
        .select(col("id_a"), col("id_b"), col("lang_a"), col("lang_b"),
          col("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // RETRIEVAL MRR: reciprocal rank of the FIRST same-label neighbor
    // in each query's int8 top-10, in exact integer micro units
    // (1e6 div rank — the RRF integer-reciprocal trick), plus the
    // fleet mean. Completes the retrieval-eval triad: recall@k (q160),
    // diversity@k (q214), rank quality (this).
    "q219_mrr_at_k" -> ((s, dir) => {
      val em = t(s, dir, "embeddings")
      val topk = Similarity.int8TopK(em, Seq(0L, 1L, 2L, 3L, 4L),
        "vec_id", "embedding", k = 10)
      val lab = em.select(col("vec_id"),
        col("label").cast("long").as("label"))
      val qlab = lab.select(col("vec_id").as("query_id"),
        col("label").as("_ql"))
      topk.join(lab, "vec_id").join(broadcast(qlab), "query_id")
        .groupBy("query_id")
        .agg(min(when(col("label") === col("_ql"), col("rank")))
          .as("first_hit_rank"))
        .select(col("query_id"), col("first_hit_rank"),
          coalesce(expr("1000000L div first_hit_rank"), lit(0L))
            .as("rr_micro"))
        .orderBy("query_id")
    }),

    // TOKEN-WEIGHTED CURATION FUNNEL: what the training run actually
    // CONSUMES at each stage — raw → exact-dedup keepers → near-dup
    // canonical keepers (keep-the-heaviest, q146's policy) → quality
    // gate — in documents AND tokens. q164 counts docs; compute
    // budgets are paid in tokens, and the two funnels diverge exactly
    // when dedup removes long documents.
    "q220_token_funnel" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("_nt"))
      val keep1 = base.groupBy(md5(col("text")).as("_d"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val s1 = base.join(keep1, Seq("doc_id"), "left_semi")
        .localCheckpoint()
      // shared pair artifact restricted to the exact-dedup keepers —
      // exact (per-doc signatures, per-pair verify)
      val pairs = minhashPairsWithin(s, dir, s1)
      val cmap = Dedup.canonicalMap(s1, "doc_id", "n_chars",
        pairs, "doc_a", "doc_b")
      val s2 = s1.join(cmap.filter(col("doc_id") === col("keep_id"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
      // quality artifact is per-row pure: the semi-join against s2
      // restricts it to the stage corpus, same rows as recomputing
      val s3 = s2.join(
        qualityScores(s, dir)
          .filter(col("quality") >= 0.5).select("doc_id"),
        Seq("doc_id"), "left_semi")
      Seq("0_raw" -> base, "1_exact" -> s1, "2_canonical" -> s2,
          "3_quality" -> s3)
        .map { case (n, d) =>
          d.agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"))
            .select(lit(n).as("stage"), col("n_docs"), col("n_tokens"))
        }
        .reduce(_ unionAll _)
        .orderBy("stage")
    }),

    // COHEN'S KAPPA of the marker-word language classifier against the
    // lang ground truth — chance-corrected agreement; the go/no-go on
    // replacing labels with the cheap classifier.
    "q221_cohens_kappa" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pred = TextAnalysis.languageId(docs, "doc_id", "text")
      Stats.cohenKappa(
        pred.join(docs.select("doc_id", "lang"), "doc_id"),
        "predicted_lang", "lang")
    }),

    // CLUSTER LABEL PURITY: Gini impurity of embeddings.label inside
    // each trained-KMeans cluster — did the geometry find the labels?
    "q222_cluster_gini" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          Dedup.quantize(col("embedding")).as("v"))
      val assigned = vecs
        .join(broadcast(trainedCentroids(s, dir, 8, 2)
          .select(col("cluster"), col("centroid").as("cv"))))
        .select(col("vec_id"), col("label"), col("cluster"),
          aggregate(zip_with(col("v"), col("cv"),
            (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
            .as("d2"))
        .groupBy("vec_id", "label")
        .agg(expr("max_by(cluster, struct(-d2, -cluster))").as("cluster"))
      Stats.clusterGini(assigned, "cluster", "label")
        .orderBy("cluster")
    }),

    // DETERMINISTIC POISSON-BOOTSTRAP error bars on mean doc length by
    // language — md5-drawn resamples, identical in both engines.
    "q223_bootstrap_ci" -> ((s, dir) => {
      Stats.bootstrapMeanCI(t(s, dir, "documents"), "lang", "doc_id",
          "n_chars", reps = 40, loRank = 2, hiRank = 39)
        .orderBy("grp")
    }),

    // ZIPF RANK-DOUBLING ladder over corpus term frequencies: is the
    // frequency curve power-law-shaped, and with what doubling ratio?
    "q224_zipf_profile" -> ((s, dir) => {
      TextAnalysis.zipfDoubling(t(s, dir, "documents"), "text", maxPow = 4)
    }),

    // PERCEPTUAL AVERAGE-HASH near-dup over the multimodal payloads:
    // 64 slice-pixels -> 4 banded 16-bit words -> Hamming <= 3 pairs.
    "q225_ahash_neardup" -> ((s, dir) => {
      Multimodal.ahashNearDup(
          Multimodal.mediaTable(t(s, dir, "documents")), maxHamming = 3)
        .orderBy("media_id_a", "media_id_b")
    }),

    // RAG-style overlapping chunking, chunk-level: 64-token windows at
    // stride 48, with the content digest downstream stages key on.
    "q226_chunking" -> ((s, dir) => {
      Curation.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 64, stride = 48)
        .orderBy("doc_id", "chunk_ord")
    }),

    // The chunking bill per source: how many chunks, and the overlap
    // overhead the stride choice costs in tokens.
    "q227_chunk_report" -> ((s, dir) => {
      Curation.chunkingReport(t(s, dir, "documents"), "doc_id", "text",
          "source", chunkTokens = 64, stride = 48)
        .orderBy("grp")
    }),

    // TERM-PAIR LIFT over the top-24 vocabulary: co-occurrence vs
    // independence, exact permille — the log-free PMI.
    "q228_term_lift" -> ((s, dir) => {
      TextAnalysis.termLift(t(s, dir, "documents"), "doc_id", "text",
        topM = 24)
    }),

    // FILTERED-RETRIEVAL recall audit: pre-filter gold vs post-filter
    // of a 2x over-fetch, restricted to even-label vectors.
    "q229_filtered_recall" -> ((s, dir) => {
      Similarity.filteredRecall(t(s, dir, "embeddings"),
          col("label") % 2 === 0, Seq(0L, 1L, 2L, 3L, 4L),
          "vec_id", "embedding", k = 10, overFetch = 20)
        .orderBy("query_id")
    }),

    // IVF NPROBE SWEEP: the recall-vs-probes knob table over the
    // trained 8-centroid index.
    "q230_nprobe_sweep" -> ((s, dir) => {
      Similarity.nprobeSweep(t(s, dir, "embeddings"),
        trainedCentroids(s, dir, 8, 2), Seq(0L, 1L, 2L, 3L, 4L),
        "vec_id", "embedding", k = 10, maxNprobe = 4)
    }),

    // HUBNESS: k-occurrence histogram over a deterministic 200-vector
    // sample (quadratic-by-contract eval, the q182 posture).
    "q231_hubness" -> ((s, dir) => {
      Similarity.hubnessAudit(t(s, dir, "embeddings"),
        col("vec_id") < 200, "vec_id", "embedding", k = 10)
    }),

    // SEASONALITY: autocorrelation of the hourly event-count series at
    // lag 1 (persistence) and lag 24 (daily cycle), zero-filled grid.
    "q232_hourly_autocorr" -> ((s, dir) => {
      Events.hourlyAutocorr(t(s, dir, "events"), "ts", Seq(1, 24))
    }),

    // EMBEDDING CLASS SEPARATION: between- vs within-class scatter of
    // the label structure, exact integer units, one final division.
    "q233_class_scatter" -> ((s, dir) => {
      Similarity.classScatter(t(s, dir, "embeddings"), "label",
        "embedding")
    }),

    // HEAPS'-LAW VOCABULARY GROWTH per corpus decile in doc_id order.
    "q234_vocab_growth" -> ((s, dir) => {
      TextAnalysis.vocabGrowth(t(s, dir, "documents"), "doc_id", "text",
        nBuckets = 10)
    }),

    // CHUNK-LEVEL DEDUP RATE: duplication measured at q226's chunk
    // granularity — partial overlap that document-level dedup misses.
    "q235_chunk_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.chunkDocs(docs, "doc_id", "text", chunkTokens = 64,
          stride = 48)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("chunk_digest")).as("n_distinct"))
        .select(col("source"), col("n_chunks"), col("n_distinct"),
          expr("(1000 * (n_chunks - n_distinct)) div n_chunks")
            .as("dup_permille"))
        .orderBy("source")
    }),

    // DEDUP SURVIVORSHIP BIAS: does exact dedup shift the language
    // mixture? Per lang: before/after counts, shares, removal rate.
    "q236_dedup_bias" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val keep = docs.groupBy(md5(col("text")).as("_d"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val after = docs.join(keep, Seq("doc_id"), "left_semi")
        .groupBy("lang").agg(count(lit(1)).as("n_after"))
      val before = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      val totals = before.agg(sum(col("n_before")).as("_tb"))
        .crossJoin(after.agg(sum(col("n_after")).as("_ta")))
      before.join(after, Seq("lang"), "left")
        .select(col("lang"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
        .crossJoin(broadcast(totals))
        .select(col("lang"), col("n_before"), col("n_after"),
          expr("(1000 * n_before) div _tb").as("share_before_milli"),
          expr("(1000 * n_after) div _ta").as("share_after_milli"),
          expr("(1000 * (n_before - n_after)) div n_before")
            .as("removal_permille"))
        .orderBy("lang")
    }),

    // QUALITY x LENGTH GRID: the 2-D census behind the "short docs
    // score low because of the length factor" question — separates the
    // score's length term from genuine lexical quality.
    "q237_quality_length_grid" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = docs
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("_nt"))
        .join(qualityScores(s, dir), "doc_id")
      scored
        .select(least(expr("_nt div 16"), lit(7L)).as("len_bin"),
          least(floor(col("quality") * 5).cast("long"), lit(4L))
            .as("q_bin"))
        .groupBy("len_bin", "q_bin").agg(count(lit(1)).as("n_docs"))
        .orderBy("len_bin", "q_bin")
    }),

    // FUNCTIONAL-DEPENDENCY AUDIT: which customers violate
    // "custkey determines order status" (all with >1 status — the
    // fan-out / feed-mix detector exercised on a known-violated FD).
    "q238_fd_audit" -> ((s, dir) => {
      DataQuality.fdAudit(t(s, dir, "orders"), "o_custkey",
        "o_orderstatus", topN = 25)
    }),

    // REFERENTIAL INTEGRITY: lineitem orphans against an orders
    // snapshot with every 13th key dropped (q179's deletion sim).
    "q239_ref_integrity" -> ((s, dir) => {
      DataQuality.refIntegrity(t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders").filter(col("o_orderkey") % 13 =!= 0),
        "o_orderkey")
    }),

    // BENFORD FIRST-DIGIT AUDIT of order totals: observed vs expected
    // log-uniform shares, permille (literal expectations, no logs).
    "q240_benford" -> ((s, dir) => {
      DataQuality.benfordAudit(t(s, dir, "orders"), "o_totalprice")
    }),

    // TIME-TO-ACTION: per view event, the delay to the user's next
    // click — the native as-of join run FORWWARD by negating the time
    // axis (at-or-before in -t = at-or-after in t), then exact
    // quantiles of the matched delays.
    "q242_time_to_action" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), (-col("us")).as("negus"),
          col("us").as("view_us"), col("event_id").as("view_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), (-col("us")).as("negus"),
          (-col("event_id")).as("_tie"), col("us").as("click_us"))
      val joined = AsOfJoin.asOfNative(views, clicks, "user_id", "negus",
        "_tie", Seq("click_us"))
      val deltas = joined.filter(col("asof_click_us").isNotNull)
        .select((col("asof_click_us") - col("view_us")).as("delta_us"),
          lit("all").as("_g"))
      Stats.exactQuantiles(deltas, "_g", "delta_us", Seq(0.25, 0.5, 0.9))
        .select(col("q"), col("quantile_value").cast("long")
          .as("delta_us"), col("n_events"))
        .orderBy("q")
    }),

    // FULFILLMENT LAG: p50/p90 days from order date to line-item ship
    // date, per order priority — two-phase exact quantiles per group.
    "q243_ship_lag" -> ((s, dir) => {
      val lag = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lag_days"))
      Stats.exactQuantiles(lag, "o_orderpriority", "lag_days",
          Seq(0.5, 0.9))
        .select(col("o_orderpriority"), col("q"),
          col("quantile_value").cast("long").as("lag_days"),
          col("n_events"))
        .orderBy("o_orderpriority", "q")
    }),

    // DATASOURCE V2: the custom-source tier — a deterministic
    // synthetic documents generator (split planning, option plumbing,
    // column pruning), aggregated per language. Every field is a pure
    // function of (doc_id, md5), so the oracle regenerates identical
    // rows from range() + md5().
    "q244_dsv2_source" -> ((s, dir) => {
      s.read.format("graft.sources.SyntheticDocs")
        .option("rows", "2000").option("partitions", "8").load()
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    }),

    // IVF-PQ: the full modern ANN stack — trained coarse router
    // (q51's index) over trained PQ codes (q172's), ADC scoring only
    // inside probed clusters. Reuses BOTH session caches.
    "q245_ivf_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cbs = pqCache.getOrElseUpdate((dir, 2, 32, 8, 2),
        Pq.trainCodebooks(emb, "vec_id", "embedding",
          m = 2, subDim = 32, k = 8, iters = 2))
      Similarity.ivfPqTopK(emb, trainedCentroids(s, dir, 8, 2), cbs,
          subDim = 32, queryIds = Seq(0L, 1L, 2L, 3L, 4L),
          "vec_id", "embedding", k = 10, nprobe = 2)
        .orderBy("query_id", "rank")
    }),

    // DSV2 FILTER PUSHDOWN: the q244 source with a doc_id range that
    // the connector evaluates at split-planning time. The 8-split grid
    // over [0,2000) has 250-id splits, so bounds [510,1490) prune 4
    // splits outright AND clamp both boundary splits ([500,750)->
    // [510,750), [1250,1500)->[1250,1490)) — the min/max ids in the
    // aggregate pin that the clamp is id-exact, not split-granular.
    // The lang predicate stays a post-scan residual Filter.
    "q246_dsv2_pushdown" -> ((s, dir) => {
      s.read.format("graft.sources.SyntheticDocs")
        .option("rows", "2000").option("partitions", "8").load()
        .filter(col("doc_id") >= 510 && col("doc_id") < 1490 &&
          col("lang") =!= "zh")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("source")
    }),

    // MERGEABLE QUANTILE SKETCH: per-priority p50/p90/p99 of
    // o_totalprice from the log-linear histogram (DDSketch shape) —
    // the combinable-aggregate quantile path whose state is bins, not
    // rows, vs q63's exact two-phase rank selection. Estimates are
    // bin lower bounds (within +10%, never above the true value) and
    // the binning rule is fixed, so the oracle rebuilds the identical
    // sketch.
    "q247_loghist_quantiles" -> ((s, dir) => {
      Sketch.logHistQuantiles(
        Sketch.logHistSketch(t(s, dir, "orders"),
          Seq("o_orderpriority"), "o_totalprice"),
        Seq("o_orderpriority"), Seq(500L, 900L, 990L))
        .orderBy("o_orderpriority", "q_permille")
    }),

    // TARGET-MIXTURE RESAMPLE: largest subset hitting a 5×150‰ +
    // 5×50‰ source mixture, water-filled on the scarcest domain,
    // membership by ascending id digest (the data-mixing op as exact
    // subset selection; kept_id_sum pins the selection itself).
    "q248_mixture_resample" -> ((s, dir) => {
      val shares = (0 until 5).map(i => (s"src$i", 150L)) ++
        (5 until 10).map(i => (s"src$i", 50L))
      Curation.mixtureResample(t(s, dir, "documents"), "source",
          "doc_id", shares)
        .orderBy("source")
    }),

    // CALIBRATION TABLE: quality-score deciles vs near-dup membership
    // (the q31 pair set) — AUC (q165) checks the ranking, this checks
    // whether the score VALUES are honest probabilities before q185's
    // gate trusts them. Full decile domain, integer milli throughout.
    "q249_calibration_bins" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = minhashPairs(s, dir)
      val dupIds = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val labeled = qualityScores(s, dir)
        .join(dupIds.withColumn("_y1", lit(1L)), Seq("doc_id"), "left")
        .select(col("quality"), coalesce(col("_y1"), lit(0L)).as("y"))
      Stats.calibrationBins(labeled, "quality", "y", nBins = 10)
        .orderBy("bin")
    }),

    // EMBEDDING-SPACE DRIFT: per trained cluster, the corpus share of
    // the old half (vec_id ≤ max/2) vs the new half and the signed
    // share delta — "did the new data land in the same regions", the
    // snapshot-drift gate (q170) asked of the embedding space. Full
    // cluster domain from the trained centroids; shares integer milli.
    "q250_embedding_drift" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
      val cents = trainedCentroids(s, dir, 8, 2)
      val assigned = vecs
        .join(broadcast(cents.select(col("cluster"),
          col("centroid").as("cv"))))
        .select(col("vec_id"), col("cluster"),
          aggregate(zip_with(col("v"), col("cv"),
            (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
            .as("d2"))
        .groupBy("vec_id")
        .agg(expr("max_by(cluster, struct(-d2, -cluster))").as("cluster"))
      val mx = vecs.agg(max(col("vec_id")).as("_mx"))
      val halved = assigned.crossJoin(broadcast(mx))
        .select(col("cluster"),
          when(col("vec_id") * 2 <= col("_mx"), 1L).otherwise(0L)
            .as("_old"))
      val perCluster = halved.groupBy("cluster")
        .agg(sum(col("_old")).as("n_old"),
          sum(lit(1L) - col("_old")).as("n_new"))
      val totals = perCluster.agg(sum(col("n_old")).as("_to"),
        sum(col("n_new")).as("_tn"))
      cents.select(col("cluster"))
        .join(perCluster, Seq("cluster"), "left")
        .crossJoin(broadcast(totals))
        .select(col("cluster"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          expr("(1000 * coalesce(n_old, 0)) div _to").as("share_old_milli"),
          expr("(1000 * coalesce(n_new, 0)) div _tn").as("share_new_milli"),
          expr("(1000 * coalesce(n_new, 0)) div _tn - " +
            "(1000 * coalesce(n_old, 0)) div _to").as("drift_milli"))
        .orderBy("cluster")
    }),

    // RESAMPLE SELECTION-BIAS AUDIT: within each target domain, mean
    // quality of q248's kept vs dropped docs — hash selection is
    // uniform by construction, so a material bias here would mean the
    // sampler is broken (the within-domain companion to q236's
    // across-domain dedup bias). Integer milli, NULL-safe empty sides.
    "q252_resample_bias" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val shares = (0 until 5).map(i => (s"src$i", 150L)) ++
        (5 until 10).map(i => (s"src$i", 50L))
      val m = Curation.mixtureMembers(docs, "source", "doc_id", shares)
      val q = qualityScores(s, dir)
        .select(col("doc_id"),
          floor(col("quality") * 1000).cast("long").as("qm"))
      m.join(q, "doc_id")
        .groupBy("source")
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("kept"), col("qm"))).as("_qk"),
          sum(when(!col("kept"), col("qm"))).as("_qd"))
        .select(col("source"), col("n_kept"), col("n_dropped"),
          when(col("n_kept") === 0, lit(null))
            .otherwise(expr("_qk div n_kept")).as("mean_kept_milli"),
          when(col("n_dropped") === 0, lit(null))
            .otherwise(expr("_qd div n_dropped")).as("mean_dropped_milli"),
          when(col("n_kept") === 0 || col("n_dropped") === 0, lit(null))
            .otherwise(expr("_qk div n_kept - _qd div n_dropped"))
            .as("bias_milli"))
        .orderBy("source")
    }),

    // STRATIFIED 5-FOLD AUDIT: fold = id-digest mod 5 within each
    // lang stratum; per (stratum, fold) counts plus each stratum's
    // realized min/max fold share — the cross-validation layout and
    // its imbalance read-off in one table.
    "q253_kfold_audit" -> ((s, dir) => {
      Curation.kFoldAudit(t(s, dir, "documents"), "lang", "doc_id", k = 5)
        .orderBy("lang", "fold")
    }),

    // IVF SCAN-COST SWEEP: the cost column of q230's recall table —
    // candidate vectors the probed clusters contain per nprobe, vs the
    // |Q|x(N-1) brute baseline. Same trained index, one probe table,
    // all rungs by conditional aggregates.
    "q254_scan_cost" -> ((s, dir) => {
      Similarity.scanCostSweep(t(s, dir, "embeddings"),
          trainedCentroids(s, dir, 8, 2), Seq(0L, 1L, 2L, 3L, 4L),
          "vec_id", "embedding", maxNprobe = 4)
        .orderBy("nprobe")
    }),

    // SKETCH-ERROR AUDIT: q247's log-hist estimates measured against
    // q63's exact two-phase quantiles on the same column — the +10%
    // bin-width bound turned into a per-(group, q) number (the q182
    // posture: eval the approximation, don't just document it).
    // Estimates are bin LOWER bounds so err is usually >= 0, but the
    // exact side uses the shipped double-rank convention while the
    // sketch side ranks by integer permille, so a boundary rank can
    // land one rank lower on the exact side and produce a small
    // negative err — measured as part of the error, not hidden.
    "q255_sketch_error" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val qsP = Seq(500L, 900L, 990L)
      val est = Sketch.logHistQuantiles(
        Sketch.logHistSketch(orders, Seq("o_orderpriority"),
          "o_totalprice"),
        Seq("o_orderpriority"), qsP)
      val exact = Stats.exactQuantiles(orders, "o_orderpriority",
          "o_totalprice", qsP.map(_ / 1000.0))
        .select(col("o_orderpriority"),
          round(col("q") * 1000).cast("long").as("q_permille"),
          floor(col("quantile_value") * 100).cast("long")
            .as("exact_cents"))
      est.join(exact, Seq("o_orderpriority", "q_permille"))
        .select(col("o_orderpriority"), col("q_permille"),
          col("est_cents"), col("exact_cents"),
          expr("(1000 * (exact_cents - est_cents)) div " +
            "greatest(exact_cents, 1)").as("err_permille"))
        .orderBy("o_orderpriority", "q_permille")
    }),

    // KEY-SKEW AUDIT: the pre-shuffle read-off for "does user_id need
    // salting" — top-10 heaviest keys with permille shares plus the
    // Gini concentration of the whole size distribution, computed from
    // the sizes-of-sizes histogram (the only window runs over distinct
    // SIZE VALUES, and the top-k is TakeOrderedAndProject).
    "q256_key_skew" -> ((s, dir) => {
      DataQuality.keySkew(t(s, dir, "events"), "user_id", topK = 10)
    }),

    // CUSUM CHANGEPOINT: Page's sequential upward-shift statistic per
    // event_type over time-ordered value cents — the drift detector a
    // per-window threshold can't replace. The max(0,·) recursion runs
    // as prefix-sum minus running-min (one window frame, one sort per
    // series); k = 5500 cents (above the global mean so alarms are a
    // sustained-shift signal, not noise), h = 50000 cents.
    "q257_cusum_shift" -> ((s, dir) => {
      Stats.cusumShift(t(s, dir, "events"), "event_type", "ts",
          "event_id", "value", driftCents = 5500L,
          thresholdCents = 50000L)
        .orderBy("event_type")
    }),

    // DSV2 AGGREGATE PUSHDOWN: ungrouped count/min/max/sum(doc_id)
    // over a 100M-row source answered ENTIRELY from split metadata —
    // the SupportsPushDownAggregates complete-pushdown contract. The
    // Aggregate node vanishes from the plan (SyntheticDocsSpec pins
    // this); the scan emits one closed-form row and generates zero
    // data rows, which is why 100M rows is free here.
    "q258_dsv2_agg_pushdown" -> ((s, dir) => {
      s.read.format("graft.sources.SyntheticDocs")
        .option("rows", "100000000").option("partitions", "64").load()
        .filter(col("doc_id") >= 1234 && col("doc_id") < 98765432)
        .agg(count(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(col("doc_id")).as("sum_id"))
    }),

    // DSV2 GROUPED AGGREGATE PUSHDOWN — the PARTIAL half of the
    // SupportsPushDownAggregates contract. lang is an md5-scrambled
    // function of doc_id (no closed form over the bounds, unlike
    // q258's ungrouped case), so each split folds its id slice into
    // ≤5 partial rows executor-side — no text materialized, no full
    // rows built — and Spark's final Aggregate merges |splits|×5
    // partials. The Aggregate node STAYS (it must: splits emit
    // duplicate groups); SyntheticDocsSpec pins PushedGroupBy in the
    // scan. 4M ids keeps the oracle's per-id md5 re-derivation cheap.
    "q259_dsv2_grouped_pushdown" -> ((s, dir) => {
      s.read.format("graft.sources.SyntheticDocs")
        .option("rows", "4000000").option("partitions", "32").load()
        .filter(col("doc_id") >= 1000 && col("doc_id") < 3500000)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),

    // DSV2 BATCH_WRITE — the connector's write face (r13 item 6): the
    // generated table round-trips through the VALIDATING sink (append =
    // "assert each row is exactly the generator's row for its id"),
    // exercising the full commit protocol — per-task writers fold
    // (n, Σid, [min,max]) into commit messages, the driver-side commit
    // merges them into the readable outcome below. A single tampered
    // row fails the write and records `aborted` instead
    // (SyntheticDocsSpec pins both paths). Oracle: the same counts
    // from the generator arithmetic (n = 2000 ids, Σid = n(n−1)/2).
    "q264_dsv2_write_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val writeId = "q264_" + java.util.UUID.randomUUID().toString
      val docs = s.read.format("graft.sources.SyntheticDocs")
        .option("rows", "2000").option("partitions", "8").load()
      docs.write.format("graft.sources.SyntheticDocs")
        .option("rows", "2000").option("writeId", writeId)
        .mode("append").save()
      val o = graft.sources.SyntheticDocsWrites.get(writeId).getOrElse(
        sys.error(s"validating write $writeId recorded no outcome"))
      graft.sources.SyntheticDocsWrites.clear(writeId)
      Seq((o.status, o.nRows, o.sumId, o.minId, o.maxId))
        .toDF("status", "n_rows", "sum_doc_id", "min_doc_id", "max_doc_id")
    })
  )

  /** Trained PQ codebooks per (dir, m, subDim, k, iters) — same
    * train-once-per-session convention as [[centroidCache]]. */
  private val pqCache =
    new scala.collection.concurrent.TrieMap[(String, Int, Int, Int, Int),
      Seq[Seq[(Long, Seq[Long])]]]()

  /** Deterministic PII-bearing text for q151/q152: derived from doc_id
    * with the same construction in the DuckDB oracle, so the regex
    * machinery (not the fixture) is what the driver verifies. */
  private def piiDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(
        col("text"),
        lit(" user"), col("doc_id").cast("string"), lit("@mail.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0.1"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" id 123-45-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))
      ).as("text"))

  /** 2-word-per-line view of documents for q154 (the corpus has no
    * newlines); same construction in the oracle. */
  private def lineDocs(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs.select(col("doc_id"), col("source"),
      concat_ws("\n",
        transform(
          // Column `/` is double division — cast back for sequence()
          sequence(lit(0), ((size(words) - 1) / 2).cast("int")),
          i => concat_ws(" ", slice(words, i * 2 + 1, lit(2))))).as("text"))
  }

  // --------------------------------------------------------------------
  // DuckDB oracles. Shared SQL fragments mirror the Spark operators
  // exactly: same md5 seeds, same shingle index ranges, same quantization.
  // --------------------------------------------------------------------

  /** Distinct word-2-gram shingles of `text` (mirrors Dedup.wordShingles:
    * Spark i in 0..max(len-2,0) over slice(i+1,2) ⇔ DuckDB i in
    * 1..max(len-1,1) over w[i:i+1], both yielding the bare word for
    * single-token texts). */
  private val sqlWordShingles =
    "list_distinct([array_to_string(w[i:i+1], ' ') for i in range(1, greatest(len(w), 2))])"

  /** [[sqlWordShingles]] for arbitrary n (mirrors Dedup.wordShingles):
    * for len(w) < n the clamped slice w[1:n] degrades to the single
    * joined token, exactly Spark's short-text fallback. */
  private def sqlWordShinglesN(n: Int) =
    s"list_distinct([array_to_string(w[i:i+${n - 1}], ' ') " +
      s"for i in range(1, greatest(len(w) - ${n - 2}, 2))])"

  /** One UNION leg of the q211 contamination sweep: the q49 scan at
    * shingle size `n`, folded to corpus-level flag rates. */
  private def sqlContamLeg(n: Int): String =
    s"""SELECT CAST($n AS BIGINT) AS shingle_n,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN nc >= 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_flagged_any,
          CAST(sum(CASE WHEN nc * 2 >= nsh THEN 1 ELSE 0 END) AS BIGINT)
            AS n_flagged_half,
          (1000 * CAST(sum(nc) AS BIGINT)) // CAST(sum(nsh) AS BIGINT)
            AS mean_contamination_permille
        FROM (
          SELECT e.id, CAST(count(*) AS BIGINT) AS nsh,
                 CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS nc
          FROM (SELECT doc_id AS id,
                       ('0x' || substr(md5(unnest(${sqlWordShinglesN(n)})), 1, 15))::BIGINT AS s
                FROM (SELECT doc_id, string_split(text, ' ') AS w
                      FROM documents)
                WHERE NOT doc_id % 50 = 0) e
          LEFT JOIN (SELECT DISTINCT s FROM (
                       SELECT ('0x' || substr(md5(unnest(${sqlWordShinglesN(n)})), 1, 15))::BIGINT AS s
                       FROM (SELECT doc_id, string_split(text, ' ') AS w
                             FROM documents)
                       WHERE doc_id % 50 = 0)) b ON e.s = b.s
          GROUP BY e.id)"""

  /** Mirrors Dedup.shingleBaseHash / minHashSignature / lshBands. */
  private val sqlBases =
    "list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647)"
  private def sqlSig(k: Int) =
    s"[list_min([((2*k+1) * b + (101*k+17)) % 2147483647 for b in $sqlBases]) for k in range(0, $k)]"
  private def sqlBandUnnest(bands: Int, rows: Int) =
    s"unnest([g::VARCHAR || ':' || md5(array_to_string(sig[g*$rows+1:g*$rows+$rows], '|')) for g in range(0, $bands)])"

  /** Full LSH near-dup pipeline over a `docs(doc_id, sh)` CTE. */
  private def sqlLshPipeline(k: Int, bands: Int, rows: Int, threshold: Double) =
    s"""sigs AS (
           SELECT doc_id, ${sqlSig(k)} AS sig FROM docs),
         bands AS (
           SELECT doc_id, ${sqlBandUnnest(bands, rows)} AS band FROM sigs),
         cand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id)
         SELECT doc_a, doc_b, jaccard FROM (
           SELECT c.a AS doc_a, c.b AS doc_b,
                  len(list_intersect(da.sh, db.sh))::DOUBLE /
                  len(list_distinct(list_concat(da.sh, db.sh))) AS jaccard
           FROM cand c
           JOIN docs da ON c.a = da.doc_id
           JOIN docs db ON c.b = db.doc_id)
         WHERE jaccard >= $threshold
         ORDER BY doc_a, doc_b"""

  private def sqlCharShingles(n: Int) =
    s"list_distinct([substr(text, i, $n) for i in range(1, greatest(length(text) - ${n - 1}, 1) + 1)])"

  private val sqlQuantize =
    "[floor(CAST(x AS DOUBLE) * 10000)::BIGINT for x in embedding]"

  /** q177's consistent-hash ring as VALUES literals — the SAME
    * driver-computed (position, shard) pairs the engine embeds, so
    * both engines walk an identical ring. */
  private def sqlRing(shards: Int, vnodes: Int): String =
    graft.operators.Layout.hashRing(shards, vnodes)
      .map { case (h, s) => s"($h, $s)" }.mkString(", ")

  private def sqlQdot(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))"

  private def sqlQcos(a: String, b: String) =
    s"(${sqlQdot(a, b)}::DOUBLE / sqrt((${sqlQdot(a, a)} * ${sqlQdot(b, b)})::DOUBLE))"

  /** Hyperplane sign-LSH band keys of a quantized vector expression —
    * the DuckDB mirror of Dedup.hyperplaneBits + simHashBandKeys, with
    * the SAME driver-computed weight literals, so both engines block on
    * bit-identical band keys. */
  private def sqlHyperplaneBands(vExpr: String, nPlanes: Int, bands: Int,
                                 dim: Int): String = {
    val wlit = graft.operators.Dedup.hyperplaneWeights(nPlanes, dim)
      .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val width = nPlanes / bands
    s"""[CAST(g AS VARCHAR) || ':' ||
          substr(array_to_string(list_transform(range(1, ${nPlanes + 1}),
            j -> CASE WHEN list_sum(list_transform(range(1, ${dim + 1}),
                        i -> $vExpr[i] * ($wlit)[j][i])) > 0
                      THEN '1' ELSE '0' END), ''),
            g * $width + 1, $width)
        for g in range(0, $bands)]"""
  }

  /** One unrolled Lloyd iteration over an `e(vec_id, v)` CTE: assign
    * each vector to the nearest (squared-L2, ties → lowest cluster)
    * centroid in `prev`, recompute floored per-dimension means, and keep
    * the previous centroid for clusters that lost every vector — the
    * exact step KMeans.lloyd runs per iteration. */
  private def sqlLloydIter(prev: String, next: String) =
    s"""a_$next AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) for i in range(0, 64)]),
                               c.cluster) AS rn
             FROM e CROSS JOIN $prev c)
           WHERE rn = 1),
         m_$next AS (
           SELECT cluster, i,
                  CAST(floor(CAST(sum(v[i+1]) AS DOUBLE) / count(*)) AS BIGINT) AS m
           FROM a_$next, range(0, 64) t(i)
           GROUP BY cluster, i),
         $next AS (
           SELECT p.cluster, coalesce(mm.cv, p.cv) AS cv
           FROM $prev p
           LEFT JOIN (SELECT cluster, list(m ORDER BY i) AS cv
                      FROM m_$next GROUP BY cluster) mm
             ON p.cluster = mm.cluster)"""

  /** Unrolled BPE oracle: k CTE stages, each mirroring one Spark merge
    * round — pair counts from zipped adjacent symbols, argmax with the
    * (count desc, left, right) tie-break, then the identical
    * space-doubling replace chain ([[graft.operators.Bpe.applyMerge]]). */
  private def bpeOracleSql(k: Int): String =
    bpeOracleSql(k, (1 to k).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS merge_rank, a AS "left", b AS "right",
                 cnt AS pair_count FROM best$i""")
      .mkString("\n UNION ALL\n ") + "\n ORDER BY merge_rank")

  private def bpeOracleSql(k: Int, tail: String): String = {
    // Every stage CTE is MATERIALIZED and the 1-row argmax joins in by
    // cross join, never by scalar subquery: an inlining engine would
    // otherwise re-expand the whole prior chain once per reference —
    // exponential in k (observed as a hang at k=6 on DuckDB 1.0).
    val stages = (1 to k).map { i =>
      s"""best$i AS MATERIALIZED (
           SELECT z[1] AS a, z[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt
           FROM (SELECT unnest(list_zip(t, t[2:])) AS z, freq
                 FROM (SELECT string_split(trim(s), ' ') AS t, freq
                       FROM s${i - 1}))
           WHERE z[2] IS NOT NULL
           GROUP BY z[1], z[2]
           ORDER BY cnt DESC, a, b LIMIT 1),
         s$i AS MATERIALIZED (
           SELECT st.w,
                  replace(replace(replace(st.s, ' ', '  '),
                    ' ' || b.a || '  ' || b.b || ' ',
                    ' ' || b.a || b.b || ' '),
                  '  ', ' ') AS s, st.freq
           FROM s${i - 1} st CROSS JOIN best$i b)"""
    }
    s"""WITH words AS (
          SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE regexp_full_match(w, '[a-z]+')
          GROUP BY w),
        s0 AS MATERIALIZED (
          SELECT w,
                 ' ' || array_to_string([w[i] for i in range(1, length(w)+1)], ' ')
                 || ' ' AS s, freq
          FROM words),
        ${stages.mkString(",\n        ")}
        $tail"""
  }

  private lazy val componentsCtes =
    s"""WITH RECURSIVE pairs AS (
           WITH docs AS (
             SELECT doc_id, $sqlWordShingles AS sh
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           ${sqlLshPipeline(24, 4, 6, 0.8)}),
         edges AS (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION
           SELECT doc_b AS a, doc_a AS b FROM pairs),
         reach(node, r) AS (
           SELECT a, a FROM edges
           UNION
           SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b)"""

  private lazy val componentsOracle =
    s"""$componentsCtes
         SELECT node AS doc_id, min(r) AS component
         FROM reach GROUP BY node ORDER BY doc_id"""

  // componentsOracle's clusters + arg_max keeper per cluster (the
  // weight·2^32 − id score mirrors Dedup.canonicalMap exactly);
  // singletons restored by the left joins.
  private lazy val canonicalOracle =
    s"""$componentsCtes,
         comps AS (SELECT node AS doc_id, min(r) AS component
                   FROM reach GROUP BY node),
         keeper AS (
           SELECT component,
                  arg_max(c.doc_id, d.n_chars * 4294967296 - c.doc_id)
                    AS keep_id
           FROM comps c JOIN documents d ON d.doc_id = c.doc_id
           GROUP BY component)
         SELECT d.doc_id, COALESCE(k.keep_id, d.doc_id) AS keep_id
         FROM documents d
         LEFT JOIN comps c ON c.doc_id = d.doc_id
         LEFT JOIN keeper k ON k.component = c.component
         ORDER BY d.doc_id"""

  val oracleSql: Map[String, String] = Map(

    "q193_count_min" ->
      """WITH toks AS (
           SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         js AS (SELECT unnest([0, 1, 2, 3]) AS j),
         cms AS (
           SELECT js.j,
                  ('0x'||substr(md5(CAST(js.j AS VARCHAR)||':'||token),1,15))::BIGINT
                    % 8192 AS bucket,
                  CAST(count(*) AS BIGINT) AS c
           FROM toks CROSS JOIN js
           GROUP BY 1, 2),
         probes AS (
           SELECT token, CAST(count(*) AS BIGINT) AS n_exact
           FROM toks GROUP BY token
           ORDER BY n_exact DESC, token LIMIT 30),
         est AS (
           SELECT p.token, p.n_exact,
                  min(coalesce(s.c, 0)) AS n_est
           FROM probes p
           CROSS JOIN js
           LEFT JOIN cms s
             ON s.j = js.j
            AND s.bucket =
                ('0x'||substr(md5(CAST(js.j AS VARCHAR)||':'||p.token),1,15))::BIGINT
                  % 8192
           GROUP BY 1, 2)
         SELECT token, n_exact, CAST(n_est AS BIGINT) AS n_est,
                CAST(n_est - n_exact AS BIGINT) AS overcount
         FROM est ORDER BY token""",

    "q194_sqrt_temperature" ->
      """WITH cnt AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS nd
           FROM documents GROUP BY lang),
         sq AS (
           SELECT lang, nd,
                  CAST(floor(sqrt(CAST(nd AS DOUBLE))) AS BIGINT) AS s
           FROM cnt),
         tt AS (SELECT CAST(sum(s) AS BIGINT) AS st FROM sq),
         th AS (
           SELECT lang,
                  least(CAST(65536 AS BIGINT),
                        CAST((65536::HUGEINT * 200 * s) // (st::HUGEINT * nd)
                             AS BIGINT)) AS thresh
           FROM sq CROSS JOIN tt)
         SELECT d.doc_id, d.lang
         FROM documents d JOIN th USING (lang)
         WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
               < th.thresh
         ORDER BY d.doc_id""",

    // The fixed two-term phrase instance of the posting-join: a start
    // position i has w[i]='table' AND w[i+1]='hash' — counted directly
    // per document (range comprehension, the driver-proven idiom).
    "q196_phrase_search" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         m AS (
           SELECT doc_id,
                  CAST(len([i for i in range(1, len(w))
                            if w[i] = 'table' AND w[i+1] = 'hash'])
                    AS BIGINT) AS n_matches
           FROM w)
         SELECT doc_id, n_matches FROM m WHERE n_matches >= 1
         ORDER BY n_matches DESC, doc_id LIMIT 20""",

    // Same int8 grid as q175; candidates restricted to rows with a
    // NON-NULL label differing from the query's label.
    "q197_hard_negatives" ->
      """WITH v AS (
           SELECT vec_id, label,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q
           FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q AS qv, label AS qlabel
                FROM v WHERE vec_id IN (0, 1, 2, 3, 4)),
         pairs AS (
           SELECT query_id, v.vec_id, CAST(v.label AS BIGINT) AS label,
                  CAST(list_sum(list_transform(range(1, 65),
                    i -> qv[i] * v.q[i])) AS BIGINT) AS dot
           FROM v JOIN qs ON v.vec_id <> qs.query_id
                         AND v.label IS NOT NULL
                         AND v.label <> qs.qlabel),
         ranked AS (
           SELECT query_id, vec_id, label, dot,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, vec_id) AS rank
           FROM pairs)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, label,
                dot
         FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""",

    // First-2-token block key built by range comprehension (no list
    // slices — the q172 r7 lesson); DuckDB's levenshtein is the same
    // classic unit-cost DP as Spark's; same 120-char prefix cap.
    "q198_edit_distance_pairs" ->
      """WITH d AS (
           SELECT doc_id, substr(text, 1, 120) AS text,
                  array_to_string(
                    [w[i] for i in range(1, least(len(w), 2) + 1)], ' ')
                    AS blk
           FROM (SELECT doc_id, text, string_split(text, ' ') AS w
                 FROM documents))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
         FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
         ORDER BY dist, id_a, id_b LIMIT 25""",

    // q43's session chain, collapsed to intervals, then the sweep as
    // per-instant counts: concurrency(t) = starts<=t − ends<t.
    "q199_concurrency" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us
           FROM events),
         flagged AS (
           SELECT user_id, event_id, us,
                  CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         numbered AS (
           SELECT user_id, us,
                  CAST(sum(is_new) OVER (PARTITION BY user_id
                    ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
           FROM flagged),
         sess AS (
           SELECT user_id, session_id, min(us) AS s, max(us) AS e
           FROM numbered GROUP BY user_id, session_id),
         b AS (
           SELECT t, CAST(sum(ns) AS BIGINT) AS ns,
                  CAST(sum(ne) AS BIGINT) AS ne
           FROM (SELECT s AS t, 1 AS ns, 0 AS ne FROM sess
                 UNION ALL
                 SELECT e AS t, 0 AS ns, 1 AS ne FROM sess)
           GROUP BY t),
         c AS (
           SELECT t,
                  CAST(sum(ns) OVER win - (sum(ne) OVER win - ne)
                    AS BIGINT) AS concurrency
           FROM b
           WINDOW win AS (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT t AS t_us, concurrency FROM c
         ORDER BY concurrency DESC, t_us LIMIT 20""",

    // The languageMixture fold in closed form: s1 = max, l1 = earliest
    // argmax (declaration order en/de/fr/es), s2 = max of the rest, l2
    // = earliest non-l1 lang hitting s2 — the exact strictly-greater
    // fold semantics.
    "q200_language_mixture" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         h AS (
           SELECT doc_id,
             CAST(len([x for x in w
               if x IN ('the','a','of','and','is')]) AS BIGINT) AS h1,
             CAST(len([x for x in w
               if x IN ('der','die','das','und','ist')]) AS BIGINT) AS h2,
             CAST(len([x for x in w
               if x IN ('le','la','et','les','est')]) AS BIGINT) AS h3,
             CAST(len([x for x in w
               if x IN ('el','los','de','y','es')]) AS BIGINT) AS h4
           FROM w),
         r1 AS (
           SELECT doc_id, h1, h2, h3, h4,
                  greatest(h1, h2, h3, h4) AS s1
           FROM h),
         r2 AS (
           SELECT *, CASE WHEN h1 = s1 THEN 'en' WHEN h2 = s1 THEN 'de'
                          WHEN h3 = s1 THEN 'fr' ELSE 'es' END AS l1
           FROM r1),
         r3 AS (
           SELECT *, CASE WHEN l1 = 'en' THEN greatest(h2, h3, h4)
                          WHEN l1 = 'de' THEN greatest(h1, h3, h4)
                          WHEN l1 = 'fr' THEN greatest(h1, h2, h4)
                          ELSE greatest(h1, h2, h3) END AS s2
           FROM r2),
         r4 AS (
           SELECT *, CASE WHEN l1 <> 'en' AND h1 = s2 THEN 'en'
                          WHEN l1 <> 'de' AND h2 = s2 THEN 'de'
                          WHEN l1 <> 'fr' AND h3 = s2 THEN 'fr'
                          ELSE 'es' END AS l2
           FROM r3)
         SELECT doc_id,
                CASE WHEN s1 >= 1 THEN l1 ELSE 'und' END AS top_lang,
                s1 AS top_hits,
                CASE WHEN s2 >= 1 THEN l2 ELSE 'und' END AS second_lang,
                s2 AS second_hits,
                CAST(CASE WHEN s1 >= 1 THEN (1000 * s2) // s1
                          ELSE 0 END AS BIGINT) AS mix_permille
         FROM r4 ORDER BY doc_id""",

    // One sketch per source (q84's estimator, k=128), thresholds from
    // the k-th smallest hash, pair domain as a cross join so empty
    // intersections still report; same theta-scaled common estimate as
    // q140 and an integer Jaccard permille.
    "q201_source_overlap" ->
      """WITH hs AS (
           SELECT DISTINCT source,
                  ('0x'||substr(md5(tok),1,15))::BIGINT AS h
           FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents)),
         sk AS (
           SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
           FROM hs),
         est AS (
           SELECT source,
                  CASE WHEN count(*) < 128 THEN CAST(count(*) AS BIGINT)
                       ELSE CAST(floor(CAST(127 AS DOUBLE)
                              * CAST(1152921504606846976 AS DOUBLE)
                              / CAST(max(CASE WHEN rn = 128 THEN h END)
                                     AS DOUBLE)) AS BIGINT)
                  END AS est_nd
           FROM sk WHERE rn <= 128 GROUP BY source),
         th AS (
           SELECT source,
                  coalesce(max(CASE WHEN rn = 128 THEN h END),
                           1152921504606846976) AS t
           FROM sk WHERE rn <= 128 GROUP BY source),
         dom AS (
           SELECT a.source AS ga, b.source AS gb,
                  least(a.t, b.t) AS theta
           FROM th a CROSS JOIN th b WHERE a.source < b.source),
         common AS (
           SELECT a.source AS ga, b.source AS gb,
                  CAST(count(*) AS BIGINT) AS nc
           FROM sk a JOIN sk b ON a.h = b.h AND a.source < b.source
           JOIN dom ON dom.ga = a.source AND dom.gb = b.source
           WHERE a.rn <= 128 AND b.rn <= 128 AND a.h < dom.theta
           GROUP BY 1, 2),
         m AS (
           SELECT dom.ga, dom.gb,
                  CAST(floor(CAST(coalesce(common.nc, 0) AS DOUBLE) *
                       CAST(1152921504606846976 AS DOUBLE) /
                       CAST(dom.theta AS DOUBLE)) AS BIGINT) AS est_common
           FROM dom LEFT JOIN common USING (ga, gb))
         SELECT m.ga, m.gb, ea.est_nd AS est_a, eb.est_nd AS est_b,
                m.est_common,
                (1000 * m.est_common) //
                  greatest(ea.est_nd + eb.est_nd - m.est_common, 1)
                  AS jaccard_permille
         FROM m JOIN est ea ON ea.source = m.ga
                JOIN est eb ON eb.source = m.gb
         ORDER BY ga, gb""",

    // q150's two LPA rounds verbatim, then the modularity aggregates:
    // exact integer m / intra / degree-square sums, one fixed double
    // expression for the micro score (q169 discipline).
    "q202_modularity" ->
      """WITH fwd AS (
           SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem),
         und AS (SELECT src, dst FROM fwd
                 UNION SELECT dst, src FROM fwd),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
         r1 AS (SELECT u.src AS n, l.label, count(*) AS c
                FROM und u JOIN l0 l ON l.node = u.dst
                GROUP BY u.src, l.label),
         l1 AS (SELECT n AS node,
                       arg_max(label, c * 1099511627776 - label) AS label
                FROM r1 GROUP BY n),
         r2 AS (SELECT u.src AS n, l.label, count(*) AS c
                FROM und u JOIN l1 l ON l.node = u.dst
                GROUP BY u.src, l.label),
         l2 AS (SELECT n AS node,
                       arg_max(label, c * 1099511627776 - label) AS label
                FROM r2 GROUP BY n),
         stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n_edges,
                  CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END)
                    AS BIGINT) AS intra_edges
           FROM fwd JOIN l2 la ON la.node = fwd.src
                    JOIN l2 lb ON lb.node = fwd.dst),
         deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
                 FROM und GROUP BY src),
         dc AS (SELECT l2.label, CAST(sum(deg.deg) AS BIGINT) AS dc
                FROM deg JOIN l2 USING (node) GROUP BY l2.label),
         dd AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
                       CAST(sum(dc * dc) AS BIGINT) AS d2
                FROM dc)
         SELECT n_edges, n_communities, intra_edges,
                CAST(floor(1000000.0 *
                     CAST(4 * n_edges * intra_edges - d2 AS DOUBLE) /
                     CAST(4 * n_edges * n_edges AS DOUBLE)) AS BIGINT)
                  AS modularity_micro
         FROM stats CROSS JOIN dd""",

    // Same int8 grid and (dot desc, vec_id) ranking as q197; neighbors
    // restricted to non-null labels, self excluded, then the integer
    // disagree-permille per audited vector.
    "q203_knn_label_noise" ->
      """WITH v AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q
           FROM embeddings WHERE label IS NOT NULL),
         qs AS (SELECT vec_id AS query_id, q AS qv, label AS qlabel
                FROM v WHERE vec_id % 10 = 0),
         pairs AS (
           SELECT query_id, qlabel, v.label AS nl,
                  CAST(list_sum(list_transform(range(1, 65),
                    i -> qv[i] * v.q[i])) AS BIGINT) AS dot,
                  v.vec_id
           FROM v JOIN qs ON v.vec_id <> qs.query_id),
         ranked AS (
           SELECT query_id, qlabel, nl,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, vec_id) AS rank
           FROM pairs),
         agg AS (
           SELECT query_id, qlabel AS label,
                  CAST(count(*) AS BIGINT) AS n_neighbors,
                  CAST(sum(CASE WHEN nl <> qlabel THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_disagree
           FROM ranked WHERE rank <= 10 GROUP BY 1, 2)
         SELECT query_id, label, n_neighbors, n_disagree,
                (1000 * n_disagree) // n_neighbors AS noise_permille
         FROM agg ORDER BY query_id""",

    // Same (user, ts, event_id) gap windows, second-quantized integer
    // gaps, exact sums, one fixed double CV² expression.
    "q204_burstiness" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us
           FROM events),
         g AS (
           SELECT user_id,
                  (us - lag(us) OVER (PARTITION BY user_id
                    ORDER BY us, event_id)) // 1000000 AS gs
           FROM base),
         a AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                  CAST(sum(gs) AS BIGINT) AS sg,
                  CAST(sum(gs * gs) AS BIGINT) AS sg2
           FROM g WHERE gs IS NOT NULL
           GROUP BY user_id
           HAVING count(*) >= 20)
         SELECT user_id, n_gaps, sg // n_gaps AS mean_gap_s,
                CASE WHEN sg = 0 THEN 0
                     ELSE CAST(floor(1000000.0 *
                            CAST(CAST(n_gaps AS HUGEINT) * sg2 AS DOUBLE) /
                            CAST(CAST(sg AS HUGEINT) * sg AS DOUBLE)
                            - 1000000.0)
                          AS BIGINT)
                END AS burstiness_micro
         FROM a
         ORDER BY burstiness_micro DESC, user_id
         LIMIT 20""",

    // Two count aggregates joined on the key; NULL keys excluded like
    // the join they model.
    "q205_join_amplification" ->
      """WITH lc AS (
           SELECT CAST(l_partkey AS BIGINT) AS key,
                  CAST(count(*) AS BIGINT) AS n_left
           FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         rc AS (
           SELECT CAST(l_partkey AS BIGINT) AS key,
                  CAST(count(*) AS BIGINT) AS n_right
           FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1)
         SELECT lc.key, n_left, n_right, n_left * n_right AS out_rows
         FROM lc JOIN rc USING (key)
         ORDER BY out_rows DESC, key LIMIT 20""",

    // Same running max over arrival order, same fixed second-quantized
    // buckets and integer permille shares.
    "q206_lateness_audit" ->
      """WITH base AS (
           SELECT event_type, event_id, epoch_ns(ts) // 1000 AS us
           FROM events),
         lat AS (
           SELECT event_type,
                  CASE WHEN mx IS NULL THEN 0
                       ELSE greatest((mx - us) // 1000000, 0) END AS late
           FROM (SELECT event_type, us,
                   max(us) OVER (ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS mx
                 FROM base)),
         b AS (
           SELECT event_type,
                  CASE WHEN late <= 0 THEN '0_on_time'
                       WHEN late <= 10 THEN '1_under_10s'
                       WHEN late <= 60 THEN '2_under_1m'
                       WHEN late <= 600 THEN '3_under_10m'
                       ELSE '4_over_10m' END AS bucket
           FROM lat),
         c AS (
           SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
           FROM b GROUP BY 1, 2),
         t AS (
           SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
           FROM c GROUP BY 1)
         SELECT c.event_type, c.bucket, c.n,
                (1000 * c.n) // t.tot AS permille
         FROM c JOIN t USING (event_type)
         ORDER BY event_type, bucket""",

    // Same 1e4 grid, exact HUGEINT numerators (≡ Spark DECIMAL(38,0)),
    // shared denominator factored out of the position sum, one fixed
    // double expression at the end.
    "q208_centroid_drift" ->
      """WITH qv AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  [CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                   for x in embedding] AS q
           FROM embeddings WHERE label IS NOT NULL),
         a AS (
           SELECT label, i AS pos, CAST(count(*) AS BIGINT) AS na,
                  CAST(sum(q[i]) AS BIGINT) AS sa
           FROM qv, range(1, 65) t(i)
           WHERE vec_id % 2 = 0 GROUP BY 1, 2),
         b AS (
           SELECT label, i AS pos, CAST(count(*) AS BIGINT) AS nb,
                  CAST(sum(q[i]) AS BIGINT) AS sb
           FROM qv, range(1, 65) t(i)
           WHERE vec_id % 2 = 1 GROUP BY 1, 2),
         j AS (
           SELECT label, na, nb,
                  CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na
                    AS diff
           FROM a JOIN b USING (label, pos)),
         g AS (
           SELECT label, max(na) AS n_a, max(nb) AS n_b,
                  sum(diff * diff) AS d2
           FROM j GROUP BY label)
         SELECT label, n_a, n_b,
                CAST(floor(CAST(d2 AS DOUBLE) /
                     CAST(CAST(n_a * n_b AS HUGEINT) * (n_a * n_b)
                          AS DOUBLE) / 100.0)
                  AS BIGINT) AS drift_micro
         FROM g ORDER BY label""",

    // Same cap ladder CASE, same truncate-at-last-cap rule, integer
    // permille waste.
    "q209_padding_audit" ->
      """WITH n AS (
           SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
         k AS (
           SELECT n, least(n, 128) AS kept FROM n),
         c AS (
           SELECT n, kept,
                  CAST(CASE WHEN kept <= 8 THEN 8
                            WHEN kept <= 16 THEN 16
                            WHEN kept <= 32 THEN 32
                            WHEN kept <= 64 THEN 64
                            ELSE 128 END AS BIGINT) AS cap
           FROM k),
         g AS (
           SELECT cap AS bucket_cap,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(kept) AS BIGINT) AS sum_tokens,
                  CAST(sum(cap - kept) AS BIGINT) AS sum_padding,
                  CAST(sum(n - kept) AS BIGINT) AS sum_truncated
           FROM c GROUP BY cap)
         SELECT bucket_cap, n_docs, sum_tokens, sum_padding,
                sum_truncated,
                (1000 * sum_padding) // (sum_padding + sum_tokens)
                  AS waste_permille
         FROM g ORDER BY bucket_cap""",

    // q31's candidate chain, scored once with integer (|∩|, |∪|),
    // swept by pure-integer cutoffs; one aggregate row per threshold
    // even at zero pairs.
    "q210_threshold_sweep" ->
      s"""WITH docs AS (
           SELECT doc_id, $sqlWordShingles AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         sigs AS (
           SELECT doc_id, ${sqlSig(24)} AS sig FROM docs),
         bands AS (
           SELECT doc_id, ${sqlBandUnnest(4, 6)} AS band FROM sigs),
         cand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.doc_id < y.doc_id),
         scored AS (
           SELECT c.b AS doc_b,
                  CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS ni,
                  CAST(len(list_distinct(list_concat(da.sh, db.sh)))
                    AS BIGINT) AS nu
           FROM cand c
           JOIN docs da ON c.a = da.doc_id
           JOIN docs db ON c.b = db.doc_id)
         SELECT CAST(700 AS BIGINT) AS thresh_permille,
                CAST(count(CASE WHEN 1000 * ni >= 700 * nu THEN 1 END)
                  AS BIGINT) AS n_pairs,
                CAST(count(DISTINCT CASE WHEN 1000 * ni >= 700 * nu
                  THEN doc_b END) AS BIGINT) AS n_losers
         FROM scored
         UNION ALL
         SELECT CAST(800 AS BIGINT),
                CAST(count(CASE WHEN 1000 * ni >= 800 * nu THEN 1 END)
                  AS BIGINT),
                CAST(count(DISTINCT CASE WHEN 1000 * ni >= 800 * nu
                  THEN doc_b END) AS BIGINT)
         FROM scored
         UNION ALL
         SELECT CAST(900 AS BIGINT),
                CAST(count(CASE WHEN 1000 * ni >= 900 * nu THEN 1 END)
                  AS BIGINT),
                CAST(count(DISTINCT CASE WHEN 1000 * ni >= 900 * nu
                  THEN doc_b END) AS BIGINT)
         FROM scored
         ORDER BY thresh_permille""",

    // The q49 scan at n = 2, 3, 4 — same split, same clamped-shingle
    // degradation, corpus-level integer flag rates.
    "q211_contamination_sweep" ->
      (Seq(2, 3, 4).map(sqlContamLeg).mkString(" UNION ALL ") +
        " ORDER BY shingle_n"),

    // q46's quality expression, q210's integer-cutoff loser set at
    // 800‰, exact rank-arithmetic deciles.
    "q213_quality_dup_profile" ->
      s"""WITH base AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         docs AS (
           SELECT doc_id, $sqlWordShingles AS sh FROM base),
         sigs AS (
           SELECT doc_id, ${sqlSig(24)} AS sig FROM docs),
         bands AS (
           SELECT doc_id, ${sqlBandUnnest(4, 6)} AS band FROM sigs),
         cand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.doc_id < y.doc_id),
         losers AS (
           SELECT DISTINCT c.b AS doc_id
           FROM cand c
           JOIN docs da ON c.a = da.doc_id
           JOIN docs db ON c.b = db.doc_id
           WHERE 1000 * len(list_intersect(da.sh, db.sh))
                 >= 800 * len(list_distinct(list_concat(da.sh, db.sh)))),
         scored AS (
           SELECT doc_id,
                  least(len(w) / 64.0, 1.0) * 0.4 +
                  (len(list_distinct(w))::DOUBLE / len(w)) * 0.4 +
                  least((len(list_filter(w, x -> x IN ('the','a','of','and','in','is')))::DOUBLE / len(w)) * 4.0, 1.0) * 0.2
                    AS quality
           FROM base),
         ranked AS (
           SELECT doc_id, quality,
                  row_number() OVER (ORDER BY quality, doc_id) AS rn
           FROM scored),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
         dec AS (
           SELECT r.doc_id, r.quality,
                  least(CAST(9 AS BIGINT), (10 * (rn - 1)) // n) AS decile
           FROM ranked r CROSS JOIN tot)
         SELECT d.decile, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dups,
                (1000 * CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1
                                      ELSE 0 END) AS BIGINT))
                  // CAST(count(*) AS BIGINT) AS dup_permille,
                min(d.quality) AS q_min, max(d.quality) AS q_max
         FROM dec d LEFT JOIN losers l ON d.doc_id = l.doc_id
         GROUP BY d.decile ORDER BY d.decile""",

    // q120's top-10 chain joined back to labels; COUNT(DISTINCT)
    // drops NULL labels like Spark's countDistinct.
    "q214_diversity_at_k" ->
      """WITH v AS (
           SELECT vec_id, label,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q
           FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q AS qv FROM v
                WHERE vec_id IN (0, 1, 2, 3, 4)),
         scored AS (
           SELECT query_id, v.vec_id, CAST(v.label AS BIGINT) AS label,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY list_sum(list_transform(range(1, 65),
                      i -> qv[i] * v.q[i])) DESC, v.vec_id) AS rank
           FROM v JOIN qs ON v.vec_id <> qs.query_id),
         top AS (SELECT query_id, label FROM scored WHERE rank <= 10)
         SELECT query_id, CAST(count(*) AS BIGINT) AS k_eff,
                CAST(count(DISTINCT label) AS BIGINT) AS n_labels,
                (1000 * CAST(count(DISTINCT label) AS BIGINT))
                  // CAST(count(*) AS BIGINT) AS diversity_permille
         FROM top GROUP BY query_id ORDER BY query_id""",

    // Same every-100th-offset 16-byte frames over the ASCII payload
    // (chars ≡ bytes, the q72 contract), one md5 per frame, hex-quad
    // integer features, floor-mean pooling.
    "q215_frame_pooling" ->
      """WITH m AS (SELECT doc_id AS media_id, text FROM documents),
         fr AS (
           SELECT media_id, md5(substr(text, o, 16)) AS h
           FROM (SELECT media_id, text,
                   unnest(range(1, greatest(length(text), 1) + 1, 100))
                     AS o
                 FROM m)),
         q AS (
           SELECT media_id,
                  ('0x' || substr(h, 1, 4))::BIGINT AS q0,
                  ('0x' || substr(h, 5, 4))::BIGINT AS q1,
                  ('0x' || substr(h, 9, 4))::BIGINT AS q2,
                  ('0x' || substr(h, 13, 4))::BIGINT AS q3
           FROM fr)
         SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
                CAST(sum(q0) AS BIGINT) // count(*) AS f0,
                CAST(sum(q1) AS BIGINT) // count(*) AS f1,
                CAST(sum(q2) AS BIGINT) // count(*) AS f2,
                CAST(sum(q3) AS BIGINT) // count(*) AS f3
         FROM q GROUP BY media_id ORDER BY media_id""",

    // componentsCtes' recursive clusters + q120's int8 chain restricted
    // to the pair anchors; arg_min picks the rank-1 out-of-component
    // candidate (mirrors Spark's min_by over the unique rank).
    "q216_triplet_mining" ->
      s"""$componentsCtes,
         comps AS (SELECT node, min(r) AS component
                   FROM reach GROUP BY node),
         v AS (
           SELECT vec_id,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q
           FROM embeddings),
         anchors AS (SELECT DISTINCT doc_a FROM pairs),
         qs AS (SELECT v.vec_id AS query_id, v.q AS qv
                FROM v JOIN anchors a ON v.vec_id = a.doc_a),
         scoredc AS (
           SELECT query_id, v.vec_id,
                  CAST(list_sum(list_transform(range(1, 65),
                    i -> qv[i] * v.q[i])) AS BIGINT) AS dot,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY list_sum(list_transform(range(1, 65),
                      i -> qv[i] * v.q[i])) DESC, v.vec_id) AS rank
           FROM v JOIN qs ON v.vec_id <> qs.query_id),
         icand AS (SELECT * FROM scoredc WHERE rank <= 8),
         neg AS (
           SELECT c.query_id,
                  arg_min(c.vec_id, c.rank) AS negative,
                  arg_min(c.dot, c.rank) AS neg_dot
           FROM icand c
           JOIN comps ca ON ca.node = c.query_id
           LEFT JOIN comps cb ON cb.node = c.vec_id
           WHERE cb.node IS NULL OR cb.component <> ca.component
           GROUP BY c.query_id)
         SELECT p.doc_a AS anchor, p.doc_b AS positive,
                n.negative, n.neg_dot
         FROM pairs p JOIN neg n ON n.query_id = p.doc_a
         ORDER BY anchor, positive""",

    // q103's word-fold idiom per zone; probe positions from the same
    // md5 formula over the literal probe list.
    "q217_zone_bloom" ->
      """WITH zv AS (
           SELECT DISTINCT doc_id // 50 AS zone, source AS v
           FROM documents WHERE source IS NOT NULL),
         words AS (
           SELECT zone, pos // 32 AS widx,
                  bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS word
           FROM (SELECT zone,
                   ((d & 1073741823) + j * ((d >> 30) * 2 + 1))
                     % 256 AS pos
                 FROM (SELECT zone,
                         ('0x'||substr(md5(v),1,15))::BIGINT AS d
                       FROM zv), range(0, 3) t(j))
           GROUP BY 1, 2),
         probes(p) AS (VALUES ('src3'), ('src15'), ('src-absent')),
         pp AS (
           SELECT p,
                  ((d & 1073741823) + j * ((d >> 30) * 2 + 1))
                    % 256 AS pos
           FROM (SELECT p, ('0x'||substr(md5(p),1,15))::BIGINT AS d
                 FROM probes), range(0, 3) t(j)),
         zones AS (SELECT DISTINCT zone FROM zv),
         checks AS (
           SELECT z.zone, pp.p,
                  min(CASE WHEN w.word IS NOT NULL
                            AND (w.word &
                                 (1::BIGINT << CAST(pp.pos % 32 AS INTEGER))) <> 0
                           THEN 1 ELSE 0 END) AS may
           FROM zones z CROSS JOIN pp
           LEFT JOIN words w ON w.zone = z.zone AND w.widx = pp.pos // 32
           GROUP BY 1, 2),
         hits AS (
           SELECT zone, v AS p, 1 AS hit FROM zv
           WHERE v IN ('src3', 'src15', 'src-absent'))
         SELECT c.p AS probe, CAST(count(*) AS BIGINT) AS n_zones,
                CAST(sum(COALESCE(h.hit, 0)) AS BIGINT) AS n_hits,
                CAST(sum(c.may) AS BIGINT) AS n_maybe,
                CAST(sum(c.may) - sum(COALESCE(h.hit, 0)) AS BIGINT)
                  AS n_false_pos,
                CAST(count(*) - sum(c.may) AS BIGINT) AS n_skippable
         FROM checks c
         LEFT JOIN hits h ON h.zone = c.zone AND h.p = c.p
         GROUP BY c.p ORDER BY probe""",

    // q34's sign-LSH chain with the label block REMOVED, then the
    // aligned documents' langs joined on and required to differ.
    "q218_crosslingual_dups" ->
      s"""WITH e AS (SELECT vec_id, $sqlQuantize AS q FROM embeddings),
         sig AS (
           SELECT vec_id,
                  [CASE WHEN list_sum(list_transform(range(0, 64),
                         i -> q[i+1] * (('0x' || substr(md5(j::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT % 2001 - 1000))) > 0
                        THEN '1' ELSE '0' END for j in range(0, 16)] AS bits
           FROM e),
         bands AS (
           SELECT vec_id,
                  unnest([g::VARCHAR || ':' || array_to_string(bits[g*4+1:g*4+4], '') for g in range(0, 4)]) AS band
           FROM sig),
         cand AS (
           SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
           FROM bands x JOIN bands y
           ON x.band = y.band AND x.vec_id < y.vec_id),
         verified AS (
           SELECT id_a, id_b, cosine FROM (
             SELECT c.a AS id_a, c.b AS id_b,
                    ${sqlQcos("ea.q", "eb.q")} AS cosine
             FROM cand c
             JOIN e ea ON c.a = ea.vec_id
             JOIN e eb ON c.b = eb.vec_id)
           WHERE cosine >= 0.3)
         SELECT v.id_a, v.id_b, da.lang AS lang_a, db.lang AS lang_b,
                v.cosine
         FROM verified v
         JOIN documents da ON da.doc_id = v.id_a
         JOIN documents db ON db.doc_id = v.id_b
         WHERE da.lang <> db.lang
         ORDER BY id_a, id_b""",

    // q120's top-10 chain + the first same-label rank per query;
    // NULL-safe zero when no neighbor shares the label.
    "q219_mrr_at_k" ->
      """WITH v AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q
           FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q AS qv, label AS ql FROM v
                WHERE vec_id IN (0, 1, 2, 3, 4)),
         scored AS (
           SELECT query_id, ql, v.label AS nl,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY list_sum(list_transform(range(1, 65),
                      i -> qv[i] * v.q[i])) DESC, v.vec_id) AS rank
           FROM v JOIN qs ON v.vec_id <> qs.query_id),
         agg AS (
           SELECT query_id,
                  CAST(min(CASE WHEN nl = ql THEN rank END) AS BIGINT)
                    AS first_hit_rank
           FROM scored WHERE rank <= 10 GROUP BY query_id)
         SELECT query_id, first_hit_rank,
                COALESCE(1000000 // first_hit_rank, 0) AS rr_micro
         FROM agg ORDER BY query_id""",

    // The full curation chain sequenced over the exact-dedup survivor
    // set: q30's min-id keepers, q31's pairs at the 800‰ integer
    // cutoff, the recursive components + q146's arg_max keeper, q46's
    // quality expression — all in doc AND token units.
    "q220_token_funnel" ->
      s"""WITH RECURSIVE base AS (
           SELECT doc_id, text, n_chars,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
           FROM documents),
         keep1 AS (
           SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
         s1 AS (SELECT b.* FROM base b JOIN keep1 k USING (doc_id)),
         docs AS (
           SELECT doc_id, $sqlWordShingles AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM s1)),
         sigs AS (SELECT doc_id, ${sqlSig(24)} AS sig FROM docs),
         bands AS (
           SELECT doc_id, ${sqlBandUnnest(4, 6)} AS band FROM sigs),
         icand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.doc_id < y.doc_id),
         pairs AS (
           SELECT c.a AS doc_a, c.b AS doc_b FROM icand c
           JOIN docs da ON c.a = da.doc_id
           JOIN docs db ON c.b = db.doc_id
           WHERE 1000 * len(list_intersect(da.sh, db.sh))
                 >= 800 * len(list_distinct(list_concat(da.sh, db.sh)))),
         edges AS (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
         reach(node, r) AS (
           SELECT a, a FROM edges
           UNION
           SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b),
         comps AS (
           SELECT node, min(r) AS component FROM reach GROUP BY node),
         keeper AS (
           SELECT component,
                  arg_max(c.node, s.n_chars * 4294967296 - c.node)
                    AS keep_id
           FROM comps c JOIN s1 s ON s.doc_id = c.node
           GROUP BY component),
         s2 AS (
           SELECT s1.* FROM s1
           LEFT JOIN comps c ON c.node = s1.doc_id
           LEFT JOIN keeper k ON k.component = c.component
           WHERE COALESCE(k.keep_id, s1.doc_id) = s1.doc_id),
         s3 AS (
           SELECT s2.* FROM s2 JOIN (
             SELECT doc_id FROM (
               SELECT doc_id,
                      least(len(w) / 64.0, 1.0) * 0.4 +
                      (len(list_distinct(w))::DOUBLE / len(w)) * 0.4 +
                      least((len(list_filter(w, x -> x IN ('the','a','of','and','in','is')))::DOUBLE / len(w)) * 4.0, 1.0) * 0.2
                        AS quality
               FROM (SELECT doc_id, string_split(text, ' ') AS w FROM s2))
             WHERE quality >= 0.5) q USING (doc_id))
         SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS n_tokens FROM base
         UNION ALL
         SELECT '1_exact', CAST(count(*) AS BIGINT),
                CAST(sum(nt) AS BIGINT) FROM s1
         UNION ALL
         SELECT '2_canonical', CAST(count(*) AS BIGINT),
                CAST(sum(nt) AS BIGINT) FROM s2
         UNION ALL
         SELECT '3_quality', CAST(count(*) AS BIGINT),
                CAST(sum(nt) AS BIGINT) FROM s3
         ORDER BY stage""",

    // q38's marker-word classifier verbatim, then the integer kappa:
    // products in HUGEINT (engine: DECIMAL(38,0)), permille by ONE
    // floored double division, kappa by ONE double division.
    "q221_cohens_kappa" ->
      """WITH p AS (
           SELECT doc_id,
                  CASE WHEN best < 1 THEN 'und'
                       WHEN s_en = best THEN 'en'
                       WHEN s_de = best THEN 'de'
                       WHEN s_fr = best THEN 'fr'
                       ELSE 'es' END AS a
           FROM (
             SELECT doc_id, s_en, s_de, s_fr, s_es,
                    greatest(s_en, s_de, s_fr, s_es) AS best
             FROM (
               SELECT doc_id,
                      len(list_filter(w, x -> x IN ('the','a','of','and','is'))) AS s_en,
                      len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS s_de,
                      len(list_filter(w, x -> x IN ('le','la','et','les','est'))) AS s_fr,
                      len(list_filter(w, x -> x IN ('el','los','de','y','es'))) AS s_es
               FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)))),
         cm AS (
           SELECT p.a, d.lang AS b, CAST(count(*) AS BIGINT) AS c
           FROM p JOIN documents d USING (doc_id)
           WHERE p.a IS NOT NULL AND d.lang IS NOT NULL
           GROUP BY p.a, d.lang),
         t AS (
           SELECT CAST(sum(c) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
                    AS n_agree
           FROM cm),
         pe AS (
           SELECT COALESCE(CAST(sum(CAST(ra.r AS HUGEINT) * cb.cc)
                    AS HUGEINT), 0) AS pe_num
           FROM (SELECT a, sum(c) AS r FROM cm GROUP BY a) ra
           JOIN (SELECT b, sum(c) AS cc FROM cm GROUP BY b) cb
             ON ra.a = cb.b)
         SELECT n, n_agree,
                (1000 * n_agree) // n AS po_milli,
                CAST(floor((pe_num * 1000)::DOUBLE /
                  (CAST(n AS HUGEINT) * n)::DOUBLE) AS BIGINT) AS pe_milli,
                (CAST(n AS HUGEINT) * n_agree - pe_num)::DOUBLE /
                  (CAST(n AS HUGEINT) * n - pe_num)::DOUBLE AS kappa
         FROM t CROSS JOIN pe""",

    // q159's trained-centroid assignment verbatim, then per-cluster
    // Gini impurity of the label column in exact integer permille.
    "q222_cluster_gini" ->
      s"""WITH e AS (SELECT vec_id, label, $sqlQuantize AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
           FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIter("c0", "c1")},
         ${sqlLloydIter("c1", "c2")},
         a AS (
           SELECT vec_id, label, cluster FROM (
             SELECT e.vec_id, e.label, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) for i in range(0, 64)]),
                               c.cluster) AS rn
             FROM e CROSS JOIN c2 c)
           WHERE rn = 1),
         cm AS (
           SELECT cluster, CAST(label AS VARCHAR) AS l,
                  CAST(count(*) AS BIGINT) AS c
           FROM a WHERE label IS NOT NULL GROUP BY cluster, label),
         r AS (
           SELECT cluster, l, c,
                  row_number() OVER (PARTITION BY cluster
                                     ORDER BY c DESC, l ASC) AS rk
           FROM cm)
         SELECT CAST(cluster AS BIGINT) AS cluster,
                CAST(sum(c) AS BIGINT) AS n,
                CAST(count(*) AS BIGINT) AS n_labels,
                max(CASE WHEN rk = 1 THEN l END) AS majority_label,
                (1000 * max(CASE WHEN rk = 1 THEN c END))
                  // CAST(sum(c) AS BIGINT) AS majority_milli,
                CAST(floor(((CAST(sum(c) AS HUGEINT) * CAST(sum(c) AS BIGINT)
                      - sum(CAST(c AS HUGEINT) * c)) * 1000)::DOUBLE /
                    (CAST(sum(c) AS HUGEINT) * CAST(sum(c) AS BIGINT))::DOUBLE)
                  AS BIGINT) AS gini_milli
         FROM r GROUP BY cluster ORDER BY cluster""",

    // Identical md5-drawn Poisson(1) multiplicities (thresholds =
    // floor(cum·2^32)), exact-DECIMAL replicate sums, rank-picked CI.
    "q223_bootstrap_ci" ->
      """WITH b AS (
           SELECT lang AS grp, CAST(doc_id AS VARCHAR) AS id,
                  CAST(n_chars AS DECIMAL(18,3)) AS v
           FROM documents WHERE n_chars IS NOT NULL),
         x AS (
           SELECT grp, id, v, r,
                  ('0x' || substr(md5(id || ':' || r), 1, 8))::BIGINT AS u
           FROM b CROSS JOIN range(0, 40) t(r)),
         m AS (
           SELECT grp, r, v,
                  CASE WHEN u < 1580030168 THEN 0
                       WHEN u < 3160060337 THEN 1
                       WHEN u < 3950075421 THEN 2
                       WHEN u < 4213413783 THEN 3
                       ELSE 4 END AS m
           FROM x),
         rm AS (
           SELECT grp, r,
                  CASE WHEN sum(m) > 0
                       THEN sum(m * v)::DOUBLE / CAST(sum(m) AS BIGINT)
                  END AS mean_r
           FROM m GROUP BY grp, r),
         rk AS (
           SELECT grp, r, mean_r,
                  row_number() OVER (PARTITION BY grp
                    ORDER BY mean_r ASC NULLS FIRST, r ASC) AS rk
           FROM rm),
         pt AS (
           SELECT grp, sum(v)::DOUBLE / count(*) AS mean
           FROM b GROUP BY grp)
         SELECT pt.grp, pt.mean, ci.ci_lo, ci.ci_hi,
                CAST(40 AS BIGINT) AS reps
         FROM pt JOIN (
           SELECT grp,
                  max(CASE WHEN rk = 2 THEN mean_r END) AS ci_lo,
                  max(CASE WHEN rk = 39 THEN mean_r END) AS ci_hi
           FROM rk GROUP BY grp) ci USING (grp)
         ORDER BY grp""",

    // Vocabulary-sized rank with (count desc, term asc) determinism;
    // the ladder joins rank r to rank 2r, NULL past the vocabulary.
    "q224_zipf_profile" ->
      """WITH c AS (
           SELECT term, CAST(count(*) AS BIGINT) AS f
           FROM (SELECT unnest(string_split(text, ' ')) AS term
                 FROM documents)
           GROUP BY term),
         r AS (
           SELECT term, f,
                  row_number() OVER (ORDER BY f DESC, term ASC) AS r
           FROM c)
         SELECT CAST(a.r AS BIGINT) AS rank, a.term, a.f AS f_r,
                b.f AS f_2r,
                CASE WHEN b.f IS NOT NULL THEN (1000 * a.f) // b.f END
                  AS ratio_milli
         FROM r a LEFT JOIN r b ON b.r = a.r * 2
         WHERE a.r IN (1, 2, 4, 8, 16)
         ORDER BY rank""",

    // The engine's slice-pixel aHash reproduced over the same bytes
    // (documents.text IS the payload; ASCII, so VARCHAR substr = byte
    // slice), then band-blocked candidates and exact Hamming.
    "q225_ahash_neardup" ->
      """WITH m AS (
           SELECT doc_id AS media_id, text,
                  (length(text) + 63) // 64 AS w
           FROM documents),
         p1 AS (
           SELECT media_id,
                  list_transform(range(0, 64), j ->
                    ('0x' || substr(md5(substr(text,
                       CAST(j * w + 1 AS INT), CAST(w AS INT))), 1, 4))::BIGINT)
                    AS px
           FROM m),
         p2 AS (
           SELECT media_id, px,
                  CAST(list_sum(px) AS BIGINT) // 64 AS mean
           FROM p1),
         p3 AS (
           SELECT media_id,
                  [CAST(list_sum(list_transform(range(0, 16), j ->
                     CASE WHEN px[g * 16 + j + 1] > mean
                          THEN (CAST(1 AS BIGINT) << j) ELSE 0 END))
                    AS BIGINT) for g in range(0, 4)] AS bands
           FROM p2),
         k AS (
           SELECT media_id, bands, g, bands[g + 1] AS b
           FROM p3 CROSS JOIN range(0, 4) t(g)),
         cand AS (
           SELECT DISTINCT x.media_id AS media_id_a,
                  y.media_id AS media_id_b,
                  x.bands AS ba, y.bands AS bb
           FROM k x JOIN k y
             ON x.g = y.g AND x.b = y.b AND x.media_id < y.media_id),
         h AS (
           SELECT media_id_a, media_id_b,
                  CAST(list_sum(list_transform(range(0, 4), g ->
                    bit_count(xor(ba[g + 1], bb[g + 1])))) AS BIGINT)
                    AS hamming
           FROM cand)
         SELECT media_id_a, media_id_b, hamming FROM h
         WHERE hamming <= 3
         ORDER BY media_id_a, media_id_b""",

    // Window starts every 48 tokens; chunk = the next 64 (truncated at
    // doc end); digest over the space-joined window.
    "q226_chunking" ->
      """WITH d AS (
           SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
           FROM documents),
         ch AS (
           SELECT doc_id, t, CAST(s // 48 AS BIGINT) AS chunk_ord,
                  CAST(s AS BIGINT) AS start_tok
           FROM (SELECT doc_id, t,
                        unnest(range(0, greatest(len(t), 1), 48)) AS s
                 FROM d))
         SELECT doc_id, chunk_ord, start_tok,
                CAST(least(64, len(t) - start_tok) AS BIGINT) AS n_tok,
                md5(array_to_string(
                  list_transform(range(0, least(64, len(t) - start_tok)),
                    i -> t[CAST(start_tok + i + 1 AS INT)]), ' '))
                  AS chunk_digest
         FROM ch
         ORDER BY doc_id, chunk_ord""",

    "q227_chunk_report" ->
      """WITH d AS (
           SELECT source AS grp, doc_id,
                  CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
                    AS dt,
                  string_split(coalesce(text, ''), ' ') AS t
           FROM documents),
         ch AS (
           SELECT doc_id,
                  CAST(count(*) AS BIGINT) AS nc,
                  CAST(sum(least(64, len_t - s)) AS BIGINT) AS ct
           FROM (SELECT doc_id, len(t) AS len_t,
                        unnest(range(0, greatest(len(t), 1), 48)) AS s
                 FROM d)
           GROUP BY doc_id)
         SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nc) AS BIGINT) AS n_chunks,
                CAST(sum(dt) AS BIGINT) AS doc_tokens,
                CAST(sum(ct) AS BIGINT) AS chunk_tokens,
                (1000 * (CAST(sum(ct) AS BIGINT) - CAST(sum(dt) AS BIGINT)))
                  // CAST(sum(dt) AS BIGINT) AS overhead_permille
         FROM d JOIN ch USING (doc_id)
         GROUP BY grp ORDER BY grp""",

    // Document frequencies once, top-24 by (df desc, term asc), pairs
    // from each doc's sorted distinct top-term list, lift in permille
    // by ONE floored double division over HUGEINT products.
    "q228_term_lift" ->
      """WITH dt AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
                    AS term
           FROM documents),
         df AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM dt GROUP BY term),
         top AS (
           SELECT term, df FROM (
             SELECT term, df,
                    row_number() OVER (ORDER BY df DESC, term ASC) AS rk
             FROM df)
           WHERE rk <= 24),
         n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         pairs AS (
           SELECT a.term AS term_a, b.term AS term_b,
                  CAST(count(*) AS BIGINT) AS n_ab
           FROM dt a JOIN dt b
             ON a.doc_id = b.doc_id AND a.term < b.term
           JOIN top ta ON ta.term = a.term
           JOIN top tb ON tb.term = b.term
           GROUP BY a.term, b.term)
         SELECT term_a, term_b, ta.df AS n_a, tb.df AS n_b, n_ab,
                CAST(floor((CAST(n_ab AS HUGEINT) * nd * 1000)::DOUBLE /
                  (CAST(ta.df AS HUGEINT) * tb.df)::DOUBLE) AS BIGINT)
                  AS lift_milli
         FROM pairs
         JOIN top ta ON ta.term = term_a
         JOIN top tb ON tb.term = term_b
         CROSS JOIN n
         ORDER BY term_a, term_b""",

    // Gold = exact top-10 over even-label rows only; candidate = exact
    // top-20 over everything, then filtered. Query vectors come from
    // the full corpus.
    "q229_filtered_recall" ->
      s"""WITH v AS (SELECT vec_id, label, $sqlQuantize AS q FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q AS qv FROM v
                WHERE vec_id IN (0,1,2,3,4)),
         gold AS (
           SELECT query_id, vec_id FROM (
             SELECT query_id, v.vec_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY ${sqlQcos("qv", "v.q")} DESC, v.vec_id) AS rank
             FROM v JOIN qs ON v.vec_id <> qs.query_id
             WHERE v.label % 2 = 0)
           WHERE rank <= 10),
         surv AS (
           SELECT query_id, vec_id FROM (
             SELECT query_id, v.vec_id, v.label,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY ${sqlQcos("qv", "v.q")} DESC, v.vec_id) AS rank
             FROM v JOIN qs ON v.vec_id <> qs.query_id)
           WHERE rank <= 20 AND label % 2 = 0),
         g AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_gold
               FROM gold GROUP BY query_id),
         sv AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_survivors
                FROM surv GROUP BY query_id),
         h AS (SELECT s.query_id, CAST(count(*) AS BIGINT) AS n_hit
               FROM surv s JOIN gold USING (query_id, vec_id)
               GROUP BY s.query_id)
         SELECT qs.query_id,
                CAST(COALESCE(g.n_gold, 0) AS BIGINT) AS n_gold,
                CAST(COALESCE(sv.n_survivors, 0) AS BIGINT) AS n_survivors,
                CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
                CASE WHEN COALESCE(g.n_gold, 0) = 0 THEN NULL
                     ELSE (1000 * COALESCE(h.n_hit, 0)) // g.n_gold
                END AS recall_milli
         FROM qs LEFT JOIN g ON qs.query_id = g.query_id
                 LEFT JOIN sv ON qs.query_id = sv.query_id
                 LEFT JOIN h ON qs.query_id = h.query_id
         ORDER BY qs.query_id""",

    // q51's trained-centroid pipeline with the probe cut swept 1..4;
    // gold = q35's exact ranking; one UNION ALL rung per nprobe.
    "q230_nprobe_sweep" ->
      s"""WITH e AS (SELECT vec_id, $sqlQuantize AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
           FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIter("c0", "c1")},
         ${sqlLloydIter("c1", "c2")},
         assigned AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${sqlQcos("e.v", "c.cv")} DESC, c.cluster) AS r
             FROM e CROSS JOIN c2 c)
           WHERE r = 1),
         qs AS (SELECT vec_id AS query_id, v AS qv FROM e
                WHERE vec_id IN (0,1,2,3,4)),
         gold AS (
           SELECT query_id, vec_id FROM (
             SELECT query_id, e.vec_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY ${sqlQcos("qv", "e.v")} DESC, e.vec_id) AS rank
             FROM e JOIN qs ON e.vec_id <> qs.query_id)
           WHERE rank <= 10),
         goldn AS (SELECT CAST(count(*) AS BIGINT) AS n_gold FROM gold),
         probes AS (
           SELECT query_id, qv, cluster, r FROM (
             SELECT qs.query_id, qs.qv, c.cluster,
                    row_number() OVER (PARTITION BY qs.query_id
                      ORDER BY ${sqlQcos("qs.qv", "c.cv")} DESC, c.cluster) AS r
             FROM qs CROSS JOIN c2 c)
           WHERE r <= 4)
         ${(1 to 4).map { np =>
             s"""SELECT CAST($np AS BIGINT) AS nprobe, goldn.n_gold,
                    COALESCE(hits.n_hit, 0) AS n_hit,
                    (1000 * COALESCE(hits.n_hit, 0)) // goldn.n_gold
                      AS recall_milli
                 FROM goldn LEFT JOIN (
                   SELECT CAST(count(*) AS BIGINT) AS n_hit FROM (
                     SELECT query_id, vec_id FROM (
                       SELECT p.query_id, a.vec_id,
                              row_number() OVER (PARTITION BY p.query_id
                                ORDER BY ${sqlQcos("p.qv", "a.v")} DESC,
                                         a.vec_id) AS rank
                       FROM assigned a
                       JOIN probes p ON a.cluster = p.cluster AND p.r <= $np
                       WHERE a.vec_id <> p.query_id)
                     WHERE rank <= 10) s
                   JOIN gold USING (query_id, vec_id)) hits ON true"""
           }.mkString("\n UNION ALL\n ")}
         ORDER BY nprobe""",

    // 200-vector deterministic sample, exact 10-NN within it, then the
    // k-occurrence histogram (vectors in no list appear at 0).
    "q231_hubness" ->
      s"""WITH v AS (SELECT vec_id, $sqlQuantize AS q FROM embeddings
                   WHERE vec_id < 200),
         qs AS (SELECT vec_id AS query_id, q AS qv FROM v),
         knn AS (
           SELECT query_id, vec_id FROM (
             SELECT query_id, v.vec_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY ${sqlQcos("qv", "v.q")} DESC, v.vec_id) AS rank
             FROM v JOIN qs ON v.vec_id <> qs.query_id)
           WHERE rank <= 10),
         ind AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n
                 FROM knn GROUP BY vec_id)
         SELECT k_occurrence, CAST(count(*) AS BIGINT) AS n_vecs FROM (
           SELECT COALESCE(ind.n, 0) AS k_occurrence
           FROM v LEFT JOIN ind USING (vec_id))
         GROUP BY k_occurrence ORDER BY k_occurrence""",

    // Zero-filled hourly grid, then the textbook correlation formula
    // over exact HUGEINT moments (engine: DECIMAL(38,0)) per lag.
    "q232_hourly_autocorr" ->
      (Seq(1, 24).map { lag =>
        s"""SELECT CAST($lag AS BIGINT) AS lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               (count(*)::HUGEINT * sum(a.x::HUGEINT * b.x)
                  - sum(a.x::HUGEINT) * sum(b.x::HUGEINT))::DOUBLE /
               (sqrt((count(*)::HUGEINT * sum(a.x::HUGEINT * a.x)
                  - sum(a.x::HUGEINT) * sum(a.x::HUGEINT))::DOUBLE) *
                sqrt((count(*)::HUGEINT * sum(b.x::HUGEINT * b.x)
                  - sum(b.x::HUGEINT) * sum(b.x::HUGEINT))::DOUBLE)) AS r
            FROM f a JOIN f b ON b.h = a.h + $lag"""
      }.mkString(
        """WITH c AS (
           SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
                  CAST(count(*) AS BIGINT) AS n
           FROM events WHERE ts IS NOT NULL GROUP BY 1),
         g AS (SELECT unnest(range((SELECT min(h) FROM c),
                                   (SELECT max(h) FROM c) + 1)) AS h),
         f AS (SELECT g.h, COALESCE(c.n, 0) AS x
               FROM g LEFT JOIN c USING (h))
         """, "\n UNION ALL\n ", "\n ORDER BY lag")),

    // Integer scatter identities per label (floored double per label
    // over exact HUGEINT sums, then exact integer totals).
    "q233_class_scatter" ->
      s"""WITH e AS (SELECT vec_id, label, $sqlQuantize AS q
                   FROM embeddings WHERE label IS NOT NULL),
         pl AS (
           SELECT label, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(list_sum([x * x for x in q])) AS HUGEINT) AS ssq
           FROM e GROUP BY label),
         cs AS (
           SELECT label, i, CAST(sum(q[i + 1]) AS BIGINT) AS s
           FROM e, range(0, 64) t(i) GROUP BY label, i),
         s2l AS (
           SELECT label, CAST(sum(s::HUGEINT * s) AS HUGEINT) AS s2l
           FROM cs GROUP BY label),
         gs AS (SELECT i, CAST(sum(s) AS BIGINT) AS sg
                FROM cs GROUP BY i),
         g2 AS (SELECT CAST(sum(sg::HUGEINT * sg) AS HUGEINT) AS s2
                FROM gs),
         dlg AS (
           SELECT label, CAST(sum(cs.s::HUGEINT * gs.sg) AS HUGEINT) AS dlg
           FROM cs JOIN gs USING (i) GROUP BY label),
         tot AS (
           SELECT CAST(sum(n) AS BIGINT) AS nt,
                  CAST(count(*) AS BIGINT) AS n_labels
           FROM pl),
         per AS (
           SELECT CAST(floor(pl.ssq::DOUBLE - s2l.s2l::DOUBLE / pl.n)
                    AS BIGINT) AS wl,
                  CAST(floor(s2l.s2l::DOUBLE / pl.n
                    - 2.0 * dlg.dlg::DOUBLE / tot.nt
                    + pl.n::DOUBLE * g2.s2::DOUBLE /
                        (tot.nt::DOUBLE * tot.nt::DOUBLE)) AS BIGINT) AS bl,
                  tot.nt, tot.n_labels
           FROM pl JOIN s2l USING (label) JOIN dlg USING (label)
           CROSS JOIN tot CROSS JOIN g2)
         SELECT nt AS n, n_labels,
                CAST(sum(wl) AS BIGINT) AS within_ss,
                CAST(sum(bl) AS BIGINT) AS between_ss,
                CAST(sum(bl) AS BIGINT)::DOUBLE /
                  CAST(sum(wl) AS BIGINT)::DOUBLE AS separation
         FROM per GROUP BY nt, n_labels""",

    // First appearance = one min per term; deciles by ntile over
    // doc_id; cumulative sums over the 10-row bucket frame.
    "q234_vocab_growth" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         b AS (
           SELECT doc_id, CAST(len(t) AS BIGINT) AS nt,
                  CAST(ntile(10) OVER (ORDER BY doc_id) AS BIGINT) AS bucket
           FROM d),
         fs AS (
           SELECT term, min(doc_id) AS fd
           FROM (SELECT doc_id, unnest(t) AS term FROM d) GROUP BY term),
         nb AS (
           SELECT b.bucket, CAST(count(*) AS BIGINT) AS new_terms
           FROM fs JOIN b ON b.doc_id = fs.fd GROUP BY b.bucket),
         pb AS (
           SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(nt) AS BIGINT) AS n_tokens
           FROM b GROUP BY bucket)
         SELECT pb.bucket, pb.n_docs, pb.n_tokens,
                COALESCE(nb.new_terms, 0) AS new_terms,
                CAST(sum(pb.n_tokens) OVER (ORDER BY pb.bucket
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
                CAST(sum(COALESCE(nb.new_terms, 0)) OVER (ORDER BY pb.bucket
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
         FROM pb LEFT JOIN nb USING (bucket) ORDER BY bucket""",

    // q226's window geometry, digests distinct-counted per source.
    "q235_chunk_dedup" ->
      """WITH d AS (
           SELECT doc_id, source, string_split(coalesce(text, ''), ' ') AS t
           FROM documents),
         ch AS (
           SELECT doc_id, source, t, CAST(s AS BIGINT) AS start_tok
           FROM (SELECT doc_id, source, t,
                        unnest(range(0, greatest(len(t), 1), 48)) AS s
                 FROM d)),
         dg AS (
           SELECT source,
                  md5(array_to_string(
                    list_transform(range(0, least(64, len(t) - start_tok)),
                      i -> t[CAST(start_tok + i + 1 AS INT)]), ' '))
                    AS chunk_digest
           FROM ch)
         SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
                CAST(count(DISTINCT chunk_digest) AS BIGINT) AS n_distinct,
                (1000 * (CAST(count(*) AS BIGINT)
                  - CAST(count(DISTINCT chunk_digest) AS BIGINT)))
                  // CAST(count(*) AS BIGINT) AS dup_permille
         FROM dg GROUP BY source ORDER BY source""",

    "q236_dedup_bias" ->
      """WITH keep AS (
           SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         aft AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_after
           FROM documents JOIN keep USING (doc_id) GROUP BY lang),
         bef AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_before
           FROM documents GROUP BY lang),
         tot AS (
           SELECT (SELECT CAST(sum(n_before) AS BIGINT) FROM bef) AS tb,
                  (SELECT CAST(sum(n_after) AS BIGINT) FROM aft) AS ta)
         SELECT bef.lang, bef.n_before,
                COALESCE(aft.n_after, 0) AS n_after,
                (1000 * bef.n_before) // tot.tb AS share_before_milli,
                (1000 * COALESCE(aft.n_after, 0)) // tot.ta
                  AS share_after_milli,
                (1000 * (bef.n_before - COALESCE(aft.n_after, 0)))
                  // bef.n_before AS removal_permille
         FROM bef LEFT JOIN aft USING (lang) CROSS JOIN tot
         ORDER BY lang""",

    // q46's quality expression verbatim; integer length bins, score
    // quintiles by floor of the SAME double both engines compute.
    "q237_quality_length_grid" ->
      """WITH s AS (
           SELECT doc_id, CAST(len(w) AS BIGINT) AS nt,
                  least(len(w) / 64.0, 1.0) * 0.4 +
                  (len(list_distinct(w))::DOUBLE / len(w)) * 0.4 +
                  least((len(list_filter(w, x -> x IN ('the','a','of','and','in','is')))::DOUBLE / len(w)) * 4.0, 1.0) * 0.2
                    AS quality
           FROM (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents))
         SELECT least(nt // 16, 7) AS len_bin,
                least(CAST(floor(quality * 5) AS BIGINT), 4) AS q_bin,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM s GROUP BY 1, 2 ORDER BY len_bin, q_bin""",

    "q238_fd_audit" ->
      """WITH pc AS (
           SELECT CAST(o_custkey AS VARCHAR) AS lhs,
                  CAST(o_orderstatus AS VARCHAR) AS r,
                  CAST(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1, 2),
         a AS (
           SELECT lhs, CAST(sum(c) AS BIGINT) AS n_rows,
                  CAST(count(*) AS BIGINT) AS n_rhs_values
           FROM pc GROUP BY lhs)
         SELECT lhs, n_rows, n_rhs_values FROM a
         WHERE n_rhs_values > 1
         ORDER BY n_rows DESC, lhs ASC NULLS FIRST LIMIT 25""",

    "q239_ref_integrity" ->
      """WITH par AS (
           SELECT DISTINCT o_orderkey AS pk FROM orders
           WHERE o_orderkey % 13 <> 0)
         SELECT CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
                CAST((SELECT count(*) FROM lineitem
                      WHERE l_orderkey IS NULL) AS BIGINT) AS n_null_fk,
                CAST((SELECT count(*) FROM lineitem
                      WHERE l_orderkey IS NOT NULL
                        AND l_orderkey NOT IN (SELECT pk FROM par))
                  AS BIGINT) AS n_orphans,
                (1000 * CAST((SELECT count(*) FROM lineitem
                      WHERE l_orderkey IS NOT NULL
                        AND l_orderkey NOT IN (SELECT pk FROM par))
                  AS BIGINT))
                  // CAST((SELECT count(*) FROM lineitem
                         WHERE l_orderkey IS NOT NULL) AS BIGINT)
                  AS orphan_permille""",

    // Integer-cents first digit from the BIGINT's decimal string
    // (double formatting is not engine-portable); literal Benford
    // expectations, so no log evaluates in-plan.
    "q240_benford" ->
      """WITH v AS (
           SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) * 100)
                    AS BIGINT) AS c
           FROM orders),
         cnt AS (
           SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
                    AS digit,
                  CAST(count(*) AS BIGINT) AS n
           FROM v WHERE c > 0 GROUP BY 1),
         tot AS (
           SELECT CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS npos,
                  CAST(sum(CASE WHEN c > 0 THEN 0 ELSE 1 END) AS BIGINT)
                    AS n_excluded
           FROM v),
         e AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 124),
                 (4, 96), (5, 79), (6, 66), (7, 57), (8, 51), (9, 45))
                 t(digit, benford_milli))
         SELECT CAST(e.digit AS BIGINT) AS digit,
                COALESCE(cnt.n, 0) AS n,
                (1000 * COALESCE(cnt.n, 0)) // tot.npos AS observed_milli,
                CAST(e.benford_milli AS BIGINT) AS benford_milli,
                (1000 * COALESCE(cnt.n, 0)) // tot.npos
                  - CAST(e.benford_milli AS BIGINT) AS delta_milli,
                tot.n_excluded
         FROM e LEFT JOIN cnt USING (digit) CROSS JOIN tot
         ORDER BY digit""",

    // One delta per VIEW EVENT (view_id in the group key — two views
    // at one microsecond stay two rows); rank r = floor((n-1)q)+1,
    // the exactQuantiles selection rule.
    "q242_time_to_action" ->
      """WITH ev AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
                  event_type
           FROM events),
         v AS (SELECT user_id, event_id AS view_id, us AS view_us
               FROM ev WHERE event_type = 'view'),
         c AS (SELECT user_id, us AS click_us
               FROM ev WHERE event_type = 'click'),
         d AS (
           SELECT v.user_id, v.view_id,
                  min(c.click_us) - v.view_us AS delta_us
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.click_us >= v.view_us
           GROUP BY v.user_id, v.view_id, v.view_us),
         r AS (
           SELECT delta_us,
                  row_number() OVER (ORDER BY delta_us) AS rn,
                  count(*) OVER () AS n
           FROM d)
         SELECT CAST(t.q AS DOUBLE) AS q,
                CAST(r.delta_us AS BIGINT) AS delta_us,
                CAST(r.n AS BIGINT) AS n_events
         FROM r JOIN (VALUES (0.25), (0.5), (0.9)) t(q)
           ON r.rn = CAST(floor((r.n - 1) * CAST(t.q AS DOUBLE)) AS BIGINT) + 1
         ORDER BY q""",

    "q243_ship_lag" ->
      """WITH lag AS (
           SELECT o.o_orderpriority,
                  date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         r AS (
           SELECT o_orderpriority, lag_days,
                  row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY lag_days) AS rn,
                  count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM lag)
         SELECT o_orderpriority, CAST(t.q AS DOUBLE) AS q,
                CAST(lag_days AS BIGINT) AS lag_days,
                CAST(n AS BIGINT) AS n_events
         FROM r JOIN (VALUES (0.5), (0.9)) t(q)
           ON r.rn = CAST(floor((r.n - 1) * CAST(t.q AS DOUBLE)) AS BIGINT) + 1
         ORDER BY o_orderpriority, q""",

    // The SyntheticDocs generator re-derived row for row: same vocab /
    // lang literals (interpolated from the source object — they cannot
    // diverge), same md5-prefix hash, same modular picks.
    "q244_dsv2_source" -> {
      val vocabSql = graft.sources.SyntheticDocs.vocab
        .map(w => s"'$w'").mkString("[", ", ", "]")
      val langsSql = graft.sources.SyntheticDocs.langs
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (
           SELECT i,
                  list_extract($langsSql,
                    ((('0x' || substr(md5(i || ':lang'), 1, 8))::BIGINT % 5)
                      ::INT + 1)) AS lang,
                  20 + ('0x' || substr(md5(i || ':len'), 1, 8))::BIGINT % 30
                    AS ntok
           FROM (SELECT unnest(range(0, 2000)) AS i)),
         x AS (
           SELECT lang, ntok,
                  length(array_to_string(list_transform(range(0, ntok),
                    j -> list_extract($vocabSql,
                      ((('0x' || substr(md5(i || ':' || j), 1, 8))::BIGINT
                        % 31)::INT + 1))), ' ')) AS nch
           FROM t)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(ntok) AS BIGINT) AS sum_tokens,
                CAST(sum(nch) AS BIGINT) AS sum_chars
         FROM x GROUP BY lang ORDER BY lang"""
    },

    // The pushdown variant: the oracle applies the SAME doc_id range
    // and lang predicate declaratively — if the connector's split
    // clamping dropped or duplicated a boundary row, min_id/max_id or
    // the counts would diverge.
    "q246_dsv2_pushdown" -> {
      val langsSql = graft.sources.SyntheticDocs.langs
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (
           SELECT i,
                  list_extract($langsSql,
                    ((('0x' || substr(md5(i || ':lang'), 1, 8))::BIGINT % 5)
                      ::INT + 1)) AS lang,
                  'src' || (('0x' || substr(md5(i || ':src'), 1, 8))::BIGINT
                    % 20) AS source,
                  20 + ('0x' || substr(md5(i || ':len'), 1, 8))::BIGINT % 30
                    AS ntok
           FROM (SELECT unnest(range(510, 1490)) AS i))
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(ntok) AS BIGINT) AS sum_tokens,
                CAST(min(i) AS BIGINT) AS min_id,
                CAST(max(i) AS BIGINT) AS max_id
         FROM t WHERE lang <> 'zh'
         GROUP BY source ORDER BY source"""
    },

    // The identical fixed binning rule (cents -> digit count + first
    // two digits), cumulative pick at the repo rank rule, lower-bound
    // decode — engine-exact because the rule is data-independent.
    "q247_loghist_quantiles" ->
      QueryUtil.sqlLogHistQuantiles("orders", "o_orderpriority",
        "o_totalprice", "o_orderpriority", Seq(500, 900, 990)),

    // Same water-filling arithmetic and md5-prefix ranking; the
    // kept_id_sum digest proves both engines select the same subset.
    "q248_mixture_resample" -> {
      val tgtRows = ((0 until 5).map(i => s"('src$i', 150)") ++
        (5 until 10).map(i => s"('src$i', 50)")).mkString(", ")
      s"""WITH tgt AS (
           SELECT * FROM (VALUES $tgtRows) AS t(source, share)),
         cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_before
                 FROM documents GROUP BY source),
         sized AS (
           SELECT tgt.source, tgt.share,
                  COALESCE(cnt.n_before, 0) AS n_before
           FROM tgt LEFT JOIN cnt USING (source)),
         tt AS (SELECT min(n_before * 1000 // share) AS t_total FROM sized),
         q AS (SELECT source, n_before, share * t_total // 1000 AS quota
               FROM sized CROSS JOIN tt),
         rk AS (
           SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 15))::BIGINT, doc_id) AS rk
           FROM documents WHERE source IN (SELECT source FROM tgt)),
         kept AS (
           SELECT r.source, CAST(count(*) AS BIGINT) AS n_kept,
                  CAST(sum(r.doc_id) AS BIGINT) AS kept_id_sum
           FROM rk r JOIN q ON r.source = q.source AND r.rk <= q.quota
           GROUP BY r.source)
         SELECT q.source, CAST(q.n_before AS BIGINT) AS n_before,
                CAST(q.quota AS BIGINT) AS quota,
                COALESCE(kept.n_kept, 0) AS n_kept,
                COALESCE(kept.kept_id_sum, 0) AS kept_id_sum
         FROM q LEFT JOIN kept ON q.source = kept.source
         ORDER BY q.source"""
    },

    // q248's quota/rank chain made per-row (kept verdict), the q249
    // quality formula, and an integer-milli mean per side.
    "q252_resample_bias" -> {
      val tgtRows = ((0 until 5).map(i => s"('src$i', 150)") ++
        (5 until 10).map(i => s"('src$i', 50)")).mkString(", ")
      s"""WITH tgt AS (
           SELECT * FROM (VALUES $tgtRows) AS t(source, share)),
         cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_before
                 FROM documents GROUP BY source),
         sized AS (
           SELECT tgt.source, tgt.share,
                  COALESCE(cnt.n_before, 0) AS n_before
           FROM tgt LEFT JOIN cnt USING (source)),
         tt AS (SELECT min(n_before * 1000 // share) AS t_total FROM sized),
         q AS (SELECT source, share * t_total // 1000 AS quota
               FROM sized CROSS JOIN tt),
         rk AS (
           SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 15))::BIGINT, doc_id) AS rk
           FROM documents WHERE source IN (SELECT source FROM tgt)),
         mem AS (
           SELECT r.source, r.doc_id, r.rk <= q.quota AS kept
           FROM rk r JOIN q ON r.source = q.source),
         sc AS (
           SELECT doc_id,
                  CAST(floor((
                    least(len(w)::DOUBLE / 64.0, 1.0) * 0.4 +
                    (len(list_distinct(w))::DOUBLE / len(w)) * 0.4 +
                    least((len(list_filter(w, x -> x IN
                      ('the','a','of','and','in','is')))::DOUBLE / len(w))
                      * 4.0, 1.0) * 0.2) * 1000) AS BIGINT) AS qm
           FROM (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents)),
         agg AS (
           SELECT m.source,
                  CAST(sum(CASE WHEN m.kept THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_kept,
                  CAST(sum(CASE WHEN m.kept THEN 0 ELSE 1 END) AS BIGINT)
                    AS n_dropped,
                  CAST(sum(CASE WHEN m.kept THEN sc.qm END) AS BIGINT)
                    AS qk,
                  CAST(sum(CASE WHEN m.kept THEN NULL ELSE sc.qm END)
                    AS BIGINT) AS qd
           FROM mem m JOIN sc ON m.doc_id = sc.doc_id
           GROUP BY m.source)
         SELECT source, n_kept, n_dropped,
                CASE WHEN n_kept = 0 THEN NULL
                     ELSE qk // n_kept END AS mean_kept_milli,
                CASE WHEN n_dropped = 0 THEN NULL
                     ELSE qd // n_dropped END AS mean_dropped_milli,
                CASE WHEN n_kept = 0 OR n_dropped = 0 THEN NULL
                     ELSE qk // n_kept - qd // n_dropped
                END AS bias_milli
         FROM agg ORDER BY source"""
    },

    // Same digest-mod folds, full (stratum x fold) domain, integer
    // shares with per-stratum min/max via windows.
    "q253_kfold_audit" ->
      """WITH f AS (
           -- NULL ids fold to -1, mirroring the operator (md5(NULL)
           -- would otherwise yield a NULL fold the domain join drops)
           SELECT lang,
                  CASE WHEN doc_id IS NULL THEN -1
                       ELSE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                              1, 15))::BIGINT % 5
                  END AS fold
           FROM documents),
         c AS (SELECT lang, fold, CAST(count(*) AS BIGINT) AS n
               FROM f GROUP BY lang, fold),
         dom AS (
           SELECT d.lang, k.fold
           FROM (SELECT DISTINCT lang FROM documents) d
           CROSS JOIN (SELECT unnest(range(0, 5)) AS fold) k),
         filled AS (
           -- FULL OUTER, same as the operator: the -1 fold arrives
           -- from the counts side and must survive the 0..k-1 domain
           SELECT COALESCE(dom.lang, c.lang) AS lang,
                  CAST(COALESCE(dom.fold, c.fold) AS BIGINT) AS fold,
                  COALESCE(c.n, 0) AS n
           FROM dom FULL OUTER JOIN c
             ON dom.lang = c.lang AND dom.fold = c.fold),
         sh AS (
           SELECT lang, fold, n,
                  CAST((1000 * n) // sum(n) OVER (PARTITION BY lang)
                    AS BIGINT) AS share_milli
           FROM filled)
         SELECT lang, fold, n, share_milli,
                min(share_milli) OVER (PARTITION BY lang)
                  AS stratum_min_milli,
                max(share_milli) OVER (PARTITION BY lang)
                  AS stratum_max_milli
         FROM sh ORDER BY lang, fold""",

    // q230's assigned/probes chain, cluster sizes instead of recall:
    // per nprobe, sum of probed-cluster sizes minus the self hit.
    "q254_scan_cost" ->
      s"""WITH e AS (SELECT vec_id, $sqlQuantize AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
           FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIter("c0", "c1")},
         ${sqlLloydIter("c1", "c2")},
         assigned AS (
           SELECT vec_id, cluster FROM (
             SELECT e.vec_id, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${sqlQcos("e.v", "c.cv")} DESC, c.cluster) AS r
             FROM e CROSS JOIN c2 c)
           WHERE r = 1),
         sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS csize
                   FROM assigned GROUP BY cluster),
         ncorp AS (SELECT CAST(count(*) AS BIGINT) AS n FROM assigned),
         qs AS (SELECT vec_id AS query_id, v AS qv FROM e
                WHERE vec_id IN (0, 1, 2, 3, 4)),
         probes AS (
           SELECT query_id, cluster, r FROM (
             SELECT qs.query_id, c.cluster,
                    row_number() OVER (PARTITION BY qs.query_id
                      ORDER BY ${sqlQcos("qs.qv", "c.cv")} DESC, c.cluster)
                      AS r
             FROM qs CROSS JOIN c2 c)
           WHERE r <= 4),
         homes AS (
           SELECT vec_id AS query_id, cluster AS qc FROM assigned
           WHERE vec_id IN (0, 1, 2, 3, 4)),
         nps AS (SELECT unnest(range(1, 5)) AS np)
         SELECT CAST(np AS BIGINT) AS nprobe,
                CAST(sum(CASE WHEN p.r <= np THEN s.csize ELSE 0 END)
                  - sum(CASE WHEN p.r <= np AND p.cluster = h.qc
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
                CAST(5 * (max(ncorp.n) - 1) AS BIGINT) AS n_brute,
                CAST((1000 * (sum(CASE WHEN p.r <= np THEN s.csize ELSE 0 END)
                  - sum(CASE WHEN p.r <= np AND p.cluster = h.qc
                        THEN 1 ELSE 0 END)))
                  // (5 * (max(ncorp.n) - 1)) AS BIGINT) AS scan_permille
         FROM probes p
         JOIN sizes s ON p.cluster = s.cluster
         LEFT JOIN homes h ON p.query_id = h.query_id
         CROSS JOIN ncorp CROSS JOIN nps
         GROUP BY np ORDER BY nprobe""",

    // The shared sketch chain as a CTE, the exact side by direct sort
    // at the same double-rank rule, error in permille of exact.
    "q255_sketch_error" -> {
      val estSql = QueryUtil.sqlLogHistQuantiles("orders",
        "o_orderpriority", "o_totalprice", "o_orderpriority",
        Seq(500, 900, 990))
      s"""WITH est AS ($estSql),
         v AS (SELECT o_orderpriority AS grp, o_totalprice AS x
               FROM orders),
         nn AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
                FROM v GROUP BY grp),
         qq AS (SELECT unnest([0.5, 0.9, 0.99]) AS qf),
         rk AS (SELECT nn.grp, qq.qf,
                       CAST(floor((nn.n - 1) * qq.qf) AS BIGINT) + 1 AS r
                FROM nn CROSS JOIN qq),
         srt AS (
           SELECT grp, x,
                  row_number() OVER (PARTITION BY grp ORDER BY x) AS rn
           FROM v),
         exact AS (
           SELECT rk.grp AS o_orderpriority,
                  CAST(round(rk.qf * 1000) AS BIGINT) AS q_permille,
                  CAST(floor(srt.x * 100) AS BIGINT) AS exact_cents
           FROM rk JOIN srt ON rk.grp = srt.grp AND rk.r = srt.rn)
         SELECT e.o_orderpriority, e.q_permille, e.est_cents,
                x.exact_cents,
                (1000 * (x.exact_cents - e.est_cents))
                  // greatest(x.exact_cents, 1) AS err_permille
         FROM est e JOIN exact x
           ON e.o_orderpriority = x.o_orderpriority
          AND e.q_permille = x.q_permille
         ORDER BY e.o_orderpriority, e.q_permille"""
    },

    // Sizes-of-sizes Gini (block rank-sum telescope) + top-10 keys.
    // Every sum-derived output CAST AS BIGINT (the strict-type rule).
    "q256_key_skew" ->
      """WITH sizes AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY user_id),
         h AS (SELECT n, CAST(count(*) AS BIGINT) AS m
               FROM sizes GROUP BY n),
         b AS (SELECT n, m,
                      sum(m) OVER (ORDER BY n
                        ROWS UNBOUNDED PRECEDING) - m AS r0
               FROM h),
         g AS (SELECT CAST(sum(m) AS BIGINT) AS n_keys,
                      CAST(sum(n * m) AS BIGINT) AS n_rows,
                      sum(n * (m * r0 + (m * (m + 1)) // 2)) AS iwx
               FROM b),
         gg AS (SELECT n_keys, n_rows,
                       CAST((1000 * (2 * iwx - (n_keys + 1) * n_rows))
                         // (n_keys * n_rows) AS BIGINT) AS gini_milli
                FROM g),
         top AS (
           -- NULLS LAST explicit: matches the operator's asc_nulls_last
           -- tie-break (Spark's bare asc would sort NULLs first)
           SELECT user_id, n,
                  CAST(row_number() OVER (ORDER BY n DESC,
                    user_id ASC NULLS LAST) AS BIGINT) AS rank
           FROM sizes ORDER BY n DESC, user_id ASC NULLS LAST LIMIT 10)
         SELECT top.user_id, rank, n,
                (1000 * n) // n_rows AS share_permille,
                gini_milli, n_keys, n_rows
         FROM top CROSS JOIN gg
         ORDER BY rank""",

    // Page's CUSUM via prefix-sum minus running-min, total order by
    // (us, event_id), k = 5500 cents, h = 50000 cents.
    "q257_cusum_shift" ->
      """WITH base AS (
           SELECT event_type, epoch_ns(ts) // 1000 AS us, event_id,
                  CAST(floor(value * 100) AS BIGINT) - 5500 AS d
           FROM events),
         p AS (SELECT event_type, us, event_id, d,
                      sum(d) OVER (PARTITION BY event_type
                        ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS pf
               FROM base WHERE d IS NOT NULL),
         s AS (SELECT event_type, us,
                      pf - least(0, min(pf) OVER (PARTITION BY event_type
                        ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING)) AS s
               FROM p),
         ex AS (SELECT event_type,
                       CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_excluded
                FROM base GROUP BY event_type)
         SELECT s.event_type, CAST(count(*) AS BIGINT) AS n,
                max(ex.n_excluded) AS n_excluded,
                CAST(sum(CASE WHEN s >= 50000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_alarms,
                CAST(max(s) AS BIGINT) AS max_s_cents,
                min(CASE WHEN s >= 50000 THEN us END) AS first_alarm_us
         FROM s JOIN ex ON s.event_type = ex.event_type
         GROUP BY s.event_type ORDER BY s.event_type""",

    // DuckDB aggregates range() lazily (no 98M-row materialization),
    // so the oracle states the SAME aggregate declaratively; sum is
    // HUGEINT there, hence the strict-type CAST AS BIGINT.
    "q258_dsv2_agg_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(min(range) AS BIGINT) AS min_id,
                CAST(max(range) AS BIGINT) AS max_id,
                CAST(sum(range) AS BIGINT) AS sum_id
         FROM range(1234, 98765432)""",

    // Grouped twin: the oracle re-derives lang per id from the same
    // md5-prefix pick and aggregates declaratively — if the grouped
    // scan's per-split fold dropped, duplicated, or mis-bucketed an
    // id, every per-lang figure would diverge.
    "q259_dsv2_grouped_pushdown" -> {
      val langsSql = graft.sources.SyntheticDocs.langs
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(min(i) AS BIGINT) AS min_id,
                CAST(max(i) AS BIGINT) AS max_id,
                CAST(sum(i) AS BIGINT) AS sum_id
         FROM (
           SELECT i, list_extract($langsSql,
                    ((('0x' || substr(md5(i || ':lang'), 1, 8))::BIGINT % 5)
                      ::INT + 1)) AS lang
           FROM (SELECT unnest(range(1000, 3500000)) AS i))
         GROUP BY lang ORDER BY lang"""
    },

    // The validating sink's committed outcome re-derived from the
    // generator arithmetic: ids are exactly range(0, 2000), so the
    // write must commit n = 2000 validated rows with Σid = n(n−1)/2
    // — any dropped, duplicated, or tampered row moves a figure (a
    // tampered row wouldn't even commit; the abort path is spec'd).
    "q264_dsv2_write_roundtrip" ->
      """SELECT 'committed' AS status,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(range) AS BIGINT) AS sum_doc_id,
                CAST(min(range) AS BIGINT) AS min_doc_id,
                CAST(max(range) AS BIGINT) AS max_doc_id
         FROM range(0, 2000)""",

    // q31's pair chain as the label source, the quality formula
    // verbatim, decile binning and milli arithmetic all-integer.
    "q249_calibration_bins" ->
      s"""WITH pairs AS (
           WITH docs AS (
             SELECT doc_id, $sqlWordShingles AS sh
             FROM (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents)),
           ${sqlLshPipeline(24, 4, 6, 0.8)}),
         dup AS (SELECT doc_a AS doc_id FROM pairs
                 UNION SELECT doc_b FROM pairs),
         sc AS (
           SELECT doc_id,
                  least(len(w)::DOUBLE / 64.0, 1.0) * 0.4 +
                  (len(list_distinct(w))::DOUBLE / len(w)) * 0.4 +
                  least((len(list_filter(w, x -> x IN
                    ('the','a','of','and','in','is')))::DOUBLE / len(w))
                    * 4.0, 1.0) * 0.2 AS quality
           FROM (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents)),
         lab AS (
           SELECT least(CAST(floor(sc.quality * 10) AS BIGINT), 9) AS bin,
                  CAST(floor(sc.quality * 1000) AS BIGINT) AS sm,
                  CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END AS y
           FROM sc LEFT JOIN dup d ON sc.doc_id = d.doc_id),
         agg AS (
           SELECT bin, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS n_pos,
                  CAST(sum(sm) AS BIGINT) AS sms
           FROM lab GROUP BY bin),
         dom AS (SELECT unnest(range(0, 10)) AS bin),
         excl AS (
           SELECT CAST(count(*) AS BIGINT) AS n_excluded FROM sc
           WHERE quality IS NULL OR quality < 0 OR quality > 1)
         SELECT dom.bin, COALESCE(agg.n, 0) AS n,
                COALESCE(agg.n_pos, 0) AS n_pos,
                CASE WHEN COALESCE(agg.n, 0) = 0 THEN NULL
                     ELSE agg.sms // agg.n END AS mean_score_milli,
                CASE WHEN COALESCE(agg.n, 0) = 0 THEN NULL
                     ELSE (1000 * agg.n_pos) // agg.n END AS rate_milli,
                CASE WHEN COALESCE(agg.n, 0) = 0 THEN NULL
                     ELSE agg.sms // agg.n - (1000 * agg.n_pos) // agg.n
                END AS gap_milli,
                excl.n_excluded
         FROM dom LEFT JOIN agg ON dom.bin = agg.bin
         CROSS JOIN excl
         ORDER BY dom.bin""",

    // q159's trained assignment, halves at max(vec_id)/2, integer
    // shares; full cluster domain from the centroid table.
    "q250_embedding_drift" ->
      s"""WITH e AS (SELECT vec_id, $sqlQuantize AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
           FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIter("c0", "c1")},
         ${sqlLloydIter("c1", "c2")},
         a AS (
           SELECT vec_id, cluster FROM (
             SELECT e.vec_id, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) for i in range(0, 64)]),
                               c.cluster) AS rn
             FROM e CROSS JOIN c2 c)
           WHERE rn = 1),
         mx AS (SELECT max(vec_id) AS m FROM e),
         h AS (
           SELECT a.cluster,
                  CASE WHEN a.vec_id * 2 <= mx.m THEN 1 ELSE 0 END AS old
           FROM a CROSS JOIN mx),
         pc AS (
           SELECT cluster, CAST(sum(old) AS BIGINT) AS n_old,
                  CAST(sum(1 - old) AS BIGINT) AS n_new
           FROM h GROUP BY cluster),
         tot AS (SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
                        CAST(sum(n_new) AS BIGINT) AS t_new FROM pc)
         SELECT CAST(c.cluster AS BIGINT) AS cluster,
                COALESCE(pc.n_old, 0) AS n_old,
                COALESCE(pc.n_new, 0) AS n_new,
                (1000 * COALESCE(pc.n_old, 0)) // tot.t_old
                  AS share_old_milli,
                (1000 * COALESCE(pc.n_new, 0)) // tot.t_new
                  AS share_new_milli,
                (1000 * COALESCE(pc.n_new, 0)) // tot.t_new -
                (1000 * COALESCE(pc.n_old, 0)) // tot.t_old
                  AS drift_milli
         FROM (SELECT DISTINCT cluster FROM c2) c
         LEFT JOIN pc ON c.cluster = pc.cluster
         CROSS JOIN tot
         ORDER BY cluster""",

    // q51's trained coarse router + q172's trained codes: ADC scoring
    // restricted to the probed clusters — the IVF-PQ composition.
    "q245_ivf_pq" ->
      s"""WITH e AS (SELECT vec_id, $sqlQuantize AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
           FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIter("c0", "c1")},
         ${sqlLloydIter("c1", "c2")},
         assigned AS (
           SELECT vec_id, cluster FROM (
             SELECT e.vec_id, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${sqlQcos("e.v", "c.cv")} DESC, c.cluster) AS r
             FROM e CROSS JOIN c2 c)
           WHERE r = 1),
         probes AS (
           SELECT query_id, cluster FROM (
             SELECT e.vec_id AS query_id, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${sqlQcos("e.v", "c.cv")} DESC, c.cluster) AS r
             FROM e CROSS JOIN c2 c WHERE e.vec_id IN (0,1,2,3,4))
           WHERE r <= 2),
         $sqlPqChain,
         qt0 AS (
           SELECT e.vec_id AS query_id, c.cluster AS code,
                  ${sqlListD2("e.v", "c.cv", 32)} AS d
           FROM e0 e CROSS JOIN s0c2 c WHERE e.vec_id IN (0,1,2,3,4)),
         qt1 AS (
           SELECT e.vec_id AS query_id, c.cluster AS code,
                  ${sqlListD2("e.v", "c.cv", 32)} AS d
           FROM e1 e CROSS JOIN s1c2 c WHERE e.vec_id IN (0,1,2,3,4)),
         scored AS (
           SELECT p.query_id, en.vec_id, q0.d + q1.d AS d2_adc,
                  row_number() OVER (PARTITION BY p.query_id
                                     ORDER BY q0.d + q1.d, en.vec_id)
                    AS rank
           FROM (SELECT * FROM enc0 JOIN enc1 USING (vec_id)) en
           JOIN assigned a ON a.vec_id = en.vec_id
           JOIN probes p ON p.cluster = a.cluster
           JOIN qt0 q0 ON q0.query_id = p.query_id AND q0.code = en.code_0
           JOIN qt1 q1 ON q1.query_id = p.query_id AND q1.code = en.code_1
           WHERE en.vec_id <> p.query_id)
         SELECT query_id, rank, vec_id, d2_adc FROM scored
         WHERE rank <= 10 ORDER BY query_id, rank""",

    "q30_dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY digest""",

    "q31_dedup_minhash_lsh" ->
      s"""WITH docs AS (
           SELECT doc_id, $sqlWordShingles AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         ${sqlLshPipeline(24, 4, 6, 0.8)}""",

    // q31's pair pipeline verbatim (as a nested CTE), then transitive
    // closure by recursion — component = min reachable doc_id, the same
    // fixpoint BOTH Spark variants reach (q53 min-label propagation,
    // q69 star contraction), so they share this oracle.
    "q53_dedup_components" -> componentsOracle,
    "q69_dedup_components_star" -> componentsOracle,

    // Same signatures and band keys on both sides of the id-400 split;
    // candidates cross the split only, verified by the same exact
    // Jaccard.
    "q113_incremental_dedup" ->
      s"""WITH docsall AS (
           SELECT doc_id, $sqlWordShingles AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         corp AS (SELECT * FROM docsall WHERE doc_id < 400),
         newb AS (SELECT * FROM docsall WHERE doc_id >= 400),
         csig AS (SELECT doc_id, ${sqlSig(24)} AS sig FROM corp),
         nsig AS (SELECT doc_id, ${sqlSig(24)} AS sig FROM newb),
         cb AS (SELECT doc_id, ${sqlBandUnnest(4, 6)} AS band FROM csig),
         nb AS (SELECT doc_id, ${sqlBandUnnest(4, 6)} AS band FROM nsig),
         cand AS (
           SELECT DISTINCT n.doc_id AS batch_id, c.doc_id AS corpus_id
           FROM cb c JOIN nb n ON c.band = n.band)
         SELECT batch_id, corpus_id, jaccard FROM (
           SELECT cand.batch_id, cand.corpus_id,
                  len(list_intersect(a.sh, b.sh))::DOUBLE /
                  len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
           FROM cand
           JOIN newb a ON cand.batch_id = a.doc_id
           JOIN corp b ON cand.corpus_id = b.doc_id)
         WHERE jaccard >= 0.8
         ORDER BY batch_id, corpus_id""",

    // q31's pair pipeline as a nested CTE, then the same degree-ordered
    // orientation, wedge join, and closing join — each triangle counted
    // once at its order-minimal vertex.
    "q110_triangle_count" ->
      s"""WITH pairs AS (
           WITH docs AS (
             SELECT doc_id, $sqlWordShingles AS sh
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           ${sqlLshPipeline(24, 4, 6, 0.8)}),
         und AS (
           SELECT DISTINCT least(doc_a, doc_b) AS a,
                  greatest(doc_a, doc_b) AS b
           FROM pairs WHERE doc_a <> doc_b),
         deg AS (
           SELECT v, CAST(count(*) AS BIGINT) AS d
           FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
           GROUP BY v),
         o AS (
           SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                       THEN u.a ELSE u.b END AS u,
                  CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                       THEN u.b ELSE u.a END AS v,
                  CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                       THEN db.d ELSE da.d END AS dv
           FROM und u JOIN deg da ON u.a = da.v JOIN deg db ON u.b = db.v),
         w AS (
           SELECT x.u, x.v AS v1, y.v AS v2
           FROM o x JOIN o y ON x.u = y.u
             AND (x.dv < y.dv OR (x.dv = y.dv AND x.v < y.v))),
         tri AS (
           SELECT w.u, w.v1, w.v2
           FROM w JOIN o z ON z.u = w.v1 AND z.v = w.v2),
         pv AS (
           SELECT v, CAST(count(*) AS BIGINT) AS n_triangles
           FROM (SELECT u AS v FROM tri
                 UNION ALL SELECT v1 FROM tri
                 UNION ALL SELECT v2 FROM tri)
           GROUP BY v)
         SELECT deg.v AS node, deg.d AS degree,
                COALESCE(pv.n_triangles, 0) AS n_triangles
         FROM deg LEFT JOIN pv ON deg.v = pv.v
         ORDER BY node""",

    "q32_dedup_simhash" ->
      """SELECT doc_id,
                array_to_string(
                  [CASE WHEN list_sum([CASE WHEN substr(md5(t), j+1, 1) >= '8' THEN 1 ELSE -1 END for t in w]) > 0
                        THEN '1' ELSE '0' END for j in range(0, 32)], '') AS simhash
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         ORDER BY doc_id""",

    "q33_dedup_ngram_jaccard" ->
      s"""WITH docs AS (
           SELECT doc_id, ${sqlCharShingles(5)} AS sh FROM documents),
         ${sqlLshPipeline(36, 4, 9, 0.5)}""",

    "q34_dedup_embedding_cosine" ->
      s"""WITH e AS (SELECT vec_id, label, $sqlQuantize AS q FROM embeddings),
         sig AS (
           SELECT vec_id, label,
                  [CASE WHEN list_sum(list_transform(range(0, 64),
                         i -> q[i+1] * (('0x' || substr(md5(j::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT % 2001 - 1000))) > 0
                        THEN '1' ELSE '0' END for j in range(0, 16)] AS bits
           FROM e),
         bands AS (
           SELECT vec_id, label,
                  unnest([g::VARCHAR || ':' || array_to_string(bits[g*4+1:g*4+4], '') for g in range(0, 4)]) AS band
           FROM sig),
         cand AS (
           SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
           FROM bands x JOIN bands y
           ON x.label = y.label AND x.band = y.band AND x.vec_id < y.vec_id)
         SELECT id_a, id_b, cosine FROM (
           SELECT c.a AS id_a, c.b AS id_b,
                  ${sqlQcos("ea.q", "eb.q")} AS cosine
           FROM cand c
           JOIN e ea ON c.a = ea.vec_id
           JOIN e eb ON c.b = eb.vec_id)
         WHERE cosine >= 0.3
         ORDER BY id_a, id_b""",

    "q35_ann_brute_topk" ->
      s"""WITH v AS (SELECT vec_id, $sqlQuantize AS q FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q AS qv FROM v WHERE vec_id IN (0,1,2,3,4)),
         scored AS (
           SELECT query_id, v.vec_id,
                  ${sqlQcos("qv", "v.q")} AS cosine,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY ${sqlQcos("qv", "v.q")} DESC, v.vec_id) AS rank
           FROM v JOIN qs ON v.vec_id <> qs.query_id)
         SELECT query_id, rank, vec_id, cosine FROM scored
         WHERE rank <= 10 ORDER BY query_id, rank""",

    "q36_ann_ivf_topk" ->
      s"""WITH v AS (SELECT vec_id, $sqlQuantize AS q FROM embeddings),
         cents AS (SELECT vec_id AS centroid_id, q AS cv FROM v WHERE vec_id % 25 = 0),
         assigned AS (
           SELECT vec_id, q, centroid_id AS cluster FROM (
             SELECT v.vec_id, v.q, centroid_id,
                    row_number() OVER (PARTITION BY v.vec_id
                                       ORDER BY ${sqlQcos("v.q", "cv")} DESC, centroid_id) AS r
             FROM v CROSS JOIN cents)
           WHERE r = 1),
         probes AS (
           SELECT query_id, qv, centroid_id AS cluster FROM (
             SELECT v.vec_id AS query_id, v.q AS qv, centroid_id,
                    row_number() OVER (PARTITION BY v.vec_id
                                       ORDER BY ${sqlQcos("v.q", "cv")} DESC, centroid_id) AS r
             FROM v CROSS JOIN cents WHERE v.vec_id IN (0,1,2,3,4))
           WHERE r <= 4),
         scored AS (
           SELECT query_id, a.vec_id,
                  ${sqlQcos("qv", "a.q")} AS cosine,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY ${sqlQcos("qv", "a.q")} DESC, a.vec_id) AS rank
           FROM assigned a JOIN probes p ON a.cluster = p.cluster
           WHERE a.vec_id <> p.query_id)
         SELECT query_id, rank, vec_id, cosine FROM scored
         WHERE rank <= 10 ORDER BY query_id, rank""",

    // Trained-IVF: the oracle re-derives KMeans.lloyd exactly — init =
    // the 8 smallest vec_ids, two unrolled Lloyd iterations (integer
    // squared-L2 assignment, floored double means, empty clusters keep
    // their centroid), then the same probe/rank pipeline as q36 against
    // the trained centroids.
    "q51_ann_ivf_trained" ->
      s"""WITH e AS (SELECT vec_id, $sqlQuantize AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
           FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIter("c0", "c1")},
         ${sqlLloydIter("c1", "c2")},
         assigned AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                                       ORDER BY ${sqlQcos("e.v", "c.cv")} DESC, c.cluster) AS r
             FROM e CROSS JOIN c2 c)
           WHERE r = 1),
         probes AS (
           SELECT query_id, qv, cluster FROM (
             SELECT e.vec_id AS query_id, e.v AS qv, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                                       ORDER BY ${sqlQcos("e.v", "c.cv")} DESC, c.cluster) AS r
             FROM e CROSS JOIN c2 c WHERE e.vec_id IN (0,1,2,3,4))
           WHERE r <= 2),
         scored AS (
           SELECT query_id, a.vec_id,
                  ${sqlQcos("qv", "a.v")} AS cosine,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY ${sqlQcos("qv", "a.v")} DESC, a.vec_id) AS rank
           FROM assigned a JOIN probes p ON a.cluster = p.cluster
           WHERE a.vec_id <> p.query_id)
         SELECT query_id, rank, vec_id, cosine FROM scored
         WHERE rank <= 10 ORDER BY query_id, rank""",

    "q37_text_stats" ->
      """SELECT doc_id,
                len(w) AS n_tokens,
                len(list_distinct(w)) AS n_types,
                len(list_distinct(w))::DOUBLE / len(w) AS type_token_ratio,
                list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w) AS avg_token_len,
                len(list_filter(w, x -> x IN ('the','a','of','and','in','is')))::DOUBLE / len(w) AS stopword_ratio
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         ORDER BY doc_id""",

    "q38_lang_id" ->
      """SELECT doc_id,
                CASE WHEN best < 1 THEN 'und'
                     WHEN s_en = best THEN 'en'
                     WHEN s_de = best THEN 'de'
                     WHEN s_fr = best THEN 'fr'
                     ELSE 'es' END AS predicted_lang,
                best AS marker_hits
         FROM (
           SELECT doc_id, s_en, s_de, s_fr, s_es,
                  greatest(s_en, s_de, s_fr, s_es) AS best
           FROM (
             SELECT doc_id,
                    len(list_filter(w, x -> x IN ('the','a','of','and','is'))) AS s_en,
                    len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS s_de,
                    len(list_filter(w, x -> x IN ('le','la','et','les','est'))) AS s_fr,
                    len(list_filter(w, x -> x IN ('el','los','de','y','es'))) AS s_es
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)))
         ORDER BY doc_id""",

    "q39_fingerprint" ->
      s"""SELECT doc_id,
                md5(text) AS digest,
                md5(array_to_string(list_sort([md5(g) for g in ${sqlCharShingles(8)}])[1:4], '|')) AS robust_digest
         FROM documents
         ORDER BY doc_id""",

    "q40_regex_tokens" ->
      """SELECT doc_id,
                len(p) AS n_pieces,
                list_sum(list_transform(p, x -> ceil(length(x) / 4.0)::BIGINT))::BIGINT AS n_bpe_est
         FROM (SELECT doc_id, regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS p
               FROM documents)
         ORDER BY doc_id""",

    "q41_multimodal_decode" ->
      """SELECT doc_id AS media_id,
                CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
                octet_length(encode(text)) AS n_bytes,
                (octet_length(encode(text)) % 64 + 1)::INTEGER AS width,
                ((octet_length(encode(text)) // 64) % 64 + 1)::INTEGER AS height,
                (octet_length(encode(text)) % 7 + 1)::INTEGER AS n_frames,
                md5(text) AS content_digest
         FROM documents
         ORDER BY media_id""",

    "q42_event_windows" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY 1, 2
         ORDER BY win_start, event_type""",

    // epoch_ns(ts) // 1000 — NOT epoch_us(ts): the parquet column is
    // TIMESTAMP(NANOS). A DuckDB that reads nanos natively may ROUND when
    // converting to micros, while Spark's loader truncates (Tables.load,
    // ts DIV 1000); floor-dividing the raw nanos is truncation under both
    // behaviors, so both engines see identical microsecond integers.
    "q43_sessionization" ->
      """WITH base AS (
           SELECT user_id, event_id, value,
                  epoch_ns(ts) // 1000 AS us
           FROM events),
         flagged AS (
           SELECT user_id, event_id, us, value,
                  CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         numbered AS (
           SELECT user_id, event_id, us, value,
                  -- CAST: DuckDB sum(INTEGER) is HUGEINT; the driver's
                  -- typed hash needs BIGINT like Spark's sum(LONG) —
                  -- the exact q44 failure mode (VERDICT r1 #1).
                  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id,
                count(*) AS n_events,
                min(us) AS session_start_us,
                max(us) AS session_end_us,
                min(event_id) AS min_event_id,
                max(event_id) AS max_event_id,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS session_value
         FROM numbered
         GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    // ASOF LEFT JOIN is DuckDB's native operator — a genuinely different
    // algorithm from the Spark side's union-and-scan, reaching the same
    // answer. The right side is pre-deduped to the highest event_id per
    // (user_id, us) to pin the tie rule both engines then share.
    "q52_asof_join" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
                  event_type, value
           FROM events),
         p AS (
           SELECT user_id, us, purchase_id, purchase_value FROM (
             SELECT user_id, us, event_id AS purchase_id,
                    value AS purchase_value,
                    row_number() OVER (PARTITION BY user_id, us
                                       ORDER BY event_id DESC) AS rn
             FROM ev WHERE event_type = 'purchase')
           WHERE rn = 1)
         SELECT e.event_id, e.user_id, e.us, e.event_type,
                p.purchase_id AS asof_purchase_id,
                p.purchase_value AS asof_purchase_value
         FROM ev e ASOF LEFT JOIN p
           ON e.user_id = p.user_id AND e.us >= p.us
         ORDER BY e.event_id""",

    // q83 shares q52's contract exactly — the native AsOfJoinExec path
    // must be indistinguishable from the composed union-and-scan.
    "q83_asof_native" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
                  event_type, value
           FROM events),
         p AS (
           SELECT user_id, us, purchase_id, purchase_value FROM (
             SELECT user_id, us, event_id AS purchase_id,
                    value AS purchase_value,
                    row_number() OVER (PARTITION BY user_id, us
                                       ORDER BY event_id DESC) AS rn
             FROM ev WHERE event_type = 'purchase')
           WHERE rn = 1)
         SELECT e.event_id, e.user_id, e.us, e.event_type,
                p.purchase_id AS asof_purchase_id,
                p.purchase_value AS asof_purchase_value
         FROM ev e ASOF LEFT JOIN p
           ON e.user_id = p.user_id AND e.us >= p.us
         ORDER BY e.event_id""",

    // Integer-weight TF-IDF (Search.topKByTerms): W(t) = 1e6·N // df(t),
    // score = Σ tf·W — all BIGINT arithmetic, so ranking is bit-exact
    // across engines (a log-based idf would hang on log() rounding).
    "q58_search_topk" ->
      """WITH tf AS (
           SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents) tok
           WHERE token IN ('spark', 'window', 'stream')
           GROUP BY doc_id, token),
         w AS (
           SELECT token,
                  (1000000 * (SELECT count(*) FROM documents)) // count(*) AS wt
           FROM tf GROUP BY token)
         SELECT tf.doc_id, CAST(sum(tf.tf * w.wt) AS BIGINT) AS score
         FROM tf JOIN w USING (token)
         GROUP BY tf.doc_id
         ORDER BY score DESC, doc_id
         LIMIT 20""",

    // Same T = min(n_d/share_d), same ((T·share)/n_d)·65536 threshold
    // arithmetic, same md5-prefix acceptance.
    "q115_mixture_sample" ->
      """WITH tg(domain, share) AS (
           VALUES ('src0', 0.4), ('src1', 0.3), ('src2', 0.2), ('src3', 0.1)),
         cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS nd
                 FROM documents GROUP BY source),
         tt AS (SELECT min(CAST(nd AS DOUBLE) / share) AS T
                FROM cnt JOIN tg ON cnt.source = tg.domain),
         th AS (SELECT domain,
                       CASE WHEN CAST(nd AS DOUBLE) / share = T THEN 65536
                            ELSE CAST(floor(T * share / nd * 65536) AS BIGINT)
                       END AS thresh
                FROM cnt JOIN tg ON cnt.source = tg.domain CROSS JOIN tt)
         SELECT d.doc_id, d.source
         FROM documents d JOIN th ON d.source = th.domain
         WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
               < th.thresh
         ORDER BY d.doc_id""",

    // Same exact-rational tf part, same scaled-integer idf, same
    // fixed-order (s0 + s1) + s2 total.
    "q114_bm25_topk" ->
      """WITH stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
           FROM documents),
         tf AS (
           SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf,
                  max(dl) AS dl
           FROM (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                        unnest(string_split(text, ' ')) AS token
                 FROM documents) tok
           WHERE token IN ('spark', 'window', 'stream')
           GROUP BY doc_id, token),
         dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                 FROM tf GROUP BY token),
         sc AS (
           SELECT tf.doc_id, tf.token,
                  CAST((1000000 * (2 * (s.n - d.df) + 1)) // (2 * d.df + 1)
                       AS DOUBLE)
                  * (CAST(22 * tf.tf * s.t AS DOUBLE) /
                     CAST(10 * s.t * tf.tf + 3 * s.t + 9 * tf.dl * s.n
                          AS DOUBLE)) AS sterm
           FROM tf JOIN dfs d USING (token) CROSS JOIN stats s),
         agg AS (
           SELECT doc_id,
                  sum(CASE WHEN token = 'spark' THEN sterm ELSE 0.0 END) AS s0,
                  sum(CASE WHEN token = 'window' THEN sterm ELSE 0.0 END) AS s1,
                  sum(CASE WHEN token = 'stream' THEN sterm ELSE 0.0 END) AS s2
           FROM sc GROUP BY doc_id)
         SELECT doc_id, (s0 + s1) + s2 AS score
         FROM agg
         ORDER BY score DESC, doc_id
         LIMIT 20""",

    // Engine-semantics probes (see the query-side comment): these pin
    // the floor ns→µs conversion both engines share (measured r3-r4;
    // a red row means the driver's oracle engine changed semantics).
    "q60_probe_us_parity" ->
      """SELECT CAST(sum(CASE WHEN (epoch_ns(ts) // 1000) % 2 = 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_odd_us
         FROM events""",

    "q82_probe_us_fingerprint" ->
      """SELECT min(us) AS min_us, max(us) AS max_us,
                CAST(sum(us % 1000000007) AS BIGINT) AS sum_mod
         FROM (SELECT epoch_ns(ts) // 1000 AS us FROM events)""",

    // KMV: k smallest md5-prefix hashes per group; estimate
    // (k-1)·2^60/h_k from exactly-representable doubles, floored —
    // bit-identical to the Spark side by construction.
    "q84_kmv_distinct" ->
      """WITH ev AS (
           SELECT event_type, user_id,
                  CAST(user_id AS VARCHAR) || '#' ||
                  CAST(epoch_ns(ts) // 1000 // 3600000000 AS VARCHAR) AS uh
           FROM events),
         kmv_u AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
                  max(CASE WHEN rn = 64 THEN h END) AS hk
           FROM (SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                 FROM (SELECT DISTINCT event_type,
                         ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
                       FROM ev))
           WHERE rn <= 64 GROUP BY event_type),
         kmv_uh AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
                  max(CASE WHEN rn = 64 THEN h END) AS hk
           FROM (SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                 FROM (SELECT DISTINCT event_type,
                         ('0x'||substr(md5(uh),1,15))::BIGINT AS h
                       FROM ev))
           WHERE rn <= 64 GROUP BY event_type),
         ex AS (
           SELECT event_type,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
                  CAST(count(DISTINCT uh) AS BIGINT) AS exact_user_hours
           FROM ev GROUP BY event_type)
         SELECT ex.event_type, ex.exact_users, ex.exact_user_hours,
                CASE WHEN u.n_kept < 64 THEN u.n_kept
                     ELSE CAST(floor(CAST(63 AS DOUBLE)
                                     * CAST(1152921504606846976 AS DOUBLE)
                                     / CAST(u.hk AS DOUBLE)) AS BIGINT)
                END AS est_users,
                CASE WHEN h.n_kept < 64 THEN h.n_kept
                     ELSE CAST(floor(CAST(63 AS DOUBLE)
                                     * CAST(1152921504606846976 AS DOUBLE)
                                     / CAST(h.hk AS DOUBLE)) AS BIGINT)
                END AS est_user_hours
         FROM ex JOIN kmv_u u USING (event_type)
                 JOIN kmv_uh h USING (event_type)
         ORDER BY event_type""",

    // Same window starts (range exclusive ≡ sequence to n-1 inclusive),
    // same 1-based clamped slice, chunk_id = start/stride in both.
    "q107_chunking" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents
           WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0),
         s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start
               FROM d)
         SELECT doc_id,
                CAST(start // 24 AS BIGINT) AS chunk_id,
                CAST(len(toks[start+1 : start+32]) AS BIGINT)
                  AS n_chunk_tokens,
                array_to_string(toks[start+1 : start+32], ' ') AS chunk_text
         FROM s
         ORDER BY doc_id, chunk_id""",

    // Relational twin of the per-doc folds: max per-token count ≡ the
    // sorted-run maximum; distinct-trigram excess ≡ 1 - distinct/total.
    // Ratio arithmetic mirrors the Spark op order exactly.
    "q112_repetition_filter" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents
           WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0),
         tf AS (
           SELECT doc_id, max(c) AS top_freq
           FROM (SELECT doc_id, t, count(*) AS c
                 FROM (SELECT doc_id, unnest(toks) AS t FROM d)
                 GROUP BY doc_id, t)
           GROUP BY doc_id),
         m AS (
           SELECT d.doc_id,
                  len(toks) AS n,
                  CAST(tf.top_freq AS DOUBLE) / len(toks) AS top_token_ratio,
                  CASE WHEN len(toks) - 2 > 0 THEN
                    1.0 - CAST(len(list_distinct(list_transform(
                            range(1, greatest(len(toks) - 2, 1) + 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                          AS DOUBLE) / (len(toks) - 2)
                  ELSE 0.0 END AS dup_trigram_ratio
           FROM d JOIN tf ON d.doc_id = tf.doc_id)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                top_token_ratio, dup_trigram_ratio,
                top_token_ratio <= 0.2 AND dup_trigram_ratio <= 0.3 AS keep
         FROM m
         ORDER BY doc_id""",

    // Same prefix-sum window and integer cut arithmetic; sums cast to
    // BIGINT (DuckDB sum(BIGINT) widens to HUGEINT).
    "q108_sequence_packing" ->
      """WITH sized AS (
           SELECT source AS shard, doc_id AS _id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         pre AS (
           SELECT shard, _id, n_tok,
                  COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY _id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS before
           FROM sized),
         packed AS (
           SELECT shard, _id, n_tok,
                  before // 512 AS pack_id,
                  (before // 512) < ((before + n_tok - 1) // 512)
                    AS straddles
           FROM pre)
         SELECT shard, CAST(pack_id AS BIGINT) AS pack_id,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                min(_id) AS first_doc, max(_id) AS last_doc,
                CAST(sum(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_boundary_docs
         FROM packed
         GROUP BY shard, pack_id
         ORDER BY shard, pack_id""",

    // Same per-key window: row_number versions, lead() closes each
    // interval; value passes through untouched (bit-identical double).
    "q109_scd2_build" ->
      """WITH h AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS valid_from_us,
                  value
           FROM events WHERE event_type = 'purchase')
         SELECT user_id,
                CAST(row_number() OVER w AS BIGINT) AS version,
                event_id, valid_from_us,
                lead(valid_from_us) OVER w AS valid_to_us,
                (lead(valid_from_us) OVER w) IS NULL AS is_current,
                value
         FROM h
         WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us, event_id)
         ORDER BY user_id, version""",

    // Same distinct-token self-join and ordered-pair filter.
    "q105_cooccurrence" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
           FROM documents WHERE text IS NOT NULL)
         SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS n_docs
         FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
         GROUP BY t1, t2
         ORDER BY n_docs DESC, t1, t2
         LIMIT 30""",

    // Identical filter build (same md5 positions, same bit_or words),
    // identical probe — the false positives agree bit-for-bit too.
    "q103_bloom_contamination" ->
      s"""WITH sh AS (
           SELECT doc_id, doc_id % 50 = 0 AS is_bench, $sqlWordShingles AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE is_bench),
         words AS (
           SELECT pos // 32 AS word_idx,
                  bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS word
           FROM (SELECT ((d & 1073741823) + j * ((d >> 30) * 2 + 1))
                          % 65536 AS pos
                 FROM (SELECT (('0x'||substr(md5(s),1,15))::BIGINT) AS d
                       FROM bench), range(0, 4) t(j))
           GROUP BY word_idx),
         probes AS (SELECT DISTINCT doc_id, unnest(sh) AS s
                    FROM sh WHERE NOT is_bench),
         pp AS (SELECT doc_id, s,
                  ((d & 1073741823) + j * ((d >> 30) * 2 + 1))
                    % 65536 AS pos
                FROM (SELECT doc_id, s,
                        (('0x'||substr(md5(s),1,15))::BIGINT) AS d
                      FROM probes), range(0, 4) t(j)),
         checked AS (
           SELECT doc_id, s,
                  min(CASE WHEN w.word IS NOT NULL
                            AND (w.word &
                                 (1::BIGINT << CAST(pp.pos % 32 AS INTEGER))) <> 0
                           THEN 1 ELSE 0 END) AS member
           FROM pp LEFT JOIN words w ON w.word_idx = pp.pos // 32
           GROUP BY doc_id, s),
         ex AS (
           SELECT p.doc_id,
                  CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_exact
           FROM probes p LEFT JOIN bench b ON p.s = b.s
           GROUP BY p.doc_id)
         SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                ex.n_exact, CAST(sum(c.member) AS BIGINT) AS n_maybe
         FROM checked c JOIN ex ON c.doc_id = ex.doc_id
         GROUP BY c.doc_id, ex.n_exact
         ORDER BY c.doc_id""",

    // Identical frame, identical decimal sums, one final divide.
    "q102_moving_avg" ->
      """SELECT event_id, user_id,
                CAST(sum(CAST(value AS DECIMAL(18,3)))
                       OVER (PARTITION BY user_id
                             ORDER BY epoch_ns(ts) // 1000, event_id
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                     AS DOUBLE)
                / CAST(count(*) OVER (PARTITION BY user_id
                                      ORDER BY epoch_ns(ts) // 1000, event_id
                                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                       AS DOUBLE) AS moving_avg
         FROM events
         ORDER BY event_id""",

    // One counting subquery per rule, unioned — NOT EXISTS mirrors the
    // anti joins.
    "q100_quality_report" ->
      """SELECT 'documents.empty_text' AS rule,
                CAST(count(*) AS BIGINT) AS n_violations
         FROM documents WHERE text IS NULL OR length(text) = 0
         UNION ALL
         SELECT 'lineitem.nonpositive_quantity', CAST(count(*) AS BIGINT)
         FROM lineitem WHERE l_quantity <= 0
         UNION ALL
         SELECT 'lineitem.orphan_orderkey', CAST(count(*) AS BIGINT)
         FROM lineitem l WHERE NOT EXISTS
           (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
         UNION ALL
         SELECT 'orders.nonpositive_total', CAST(count(*) AS BIGINT)
         FROM orders WHERE o_totalprice <= 0
         UNION ALL
         SELECT 'orders.orphan_custkey', CAST(count(*) AS BIGINT)
         FROM orders o WHERE NOT EXISTS
           (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
         ORDER BY rule""",

    // Same running-max island construction on the shared µs timeline;
    // the checked aggregates are invariant to tie renumbering.
    "q99_interval_islands" ->
      """WITH iv AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS s,
                  epoch_ns(ts) // 1000 + 60000000 AS e
           FROM events),
         flagged AS (
           SELECT user_id, s, e,
                  CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) IS NULL
                         OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING)
                       THEN 1 ELSE 0 END AS is_new
           FROM iv),
         ids AS (
           SELECT user_id, s, e,
                  sum(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
           FROM flagged),
         islands AS (
           SELECT user_id, island, min(s) AS island_start,
                  max(e) AS island_end
           FROM ids GROUP BY user_id, island)
         SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_islands,
                CAST(sum(island_end - island_start) AS BIGINT) AS covered_us,
                max(island_end - island_start) AS max_island_us
         FROM islands GROUP BY user_id
         ORDER BY user_id""",

    // Same md5-prefix row hashes, same XOR fold; integer-rendered row
    // strings keep float formatting out of the digest.
    "q98_reconcile_digest" ->
      """WITH rows_a AS (
           SELECT o_orderkey, o_custkey,
                  CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)
                    AS cents
           FROM orders),
         rows_b AS (
           SELECT o_orderkey, o_custkey,
                  CASE WHEN o_orderkey % 1000 = 3 THEN cents + 1000
                       ELSE cents END AS cents
           FROM rows_a WHERE o_orderkey % 1000 <> 7),
         da AS (
           SELECT o_orderkey % 64 AS bucket,
                  CAST(count(*) AS BIGINT) AS n_a,
                  bit_xor(('0x'||substr(md5(
                    concat_ws('|', o_orderkey, o_custkey, cents)),1,15))::BIGINT)
                    AS digest_a
           FROM rows_a GROUP BY bucket),
         db AS (
           SELECT o_orderkey % 64 AS bucket,
                  CAST(count(*) AS BIGINT) AS n_b,
                  bit_xor(('0x'||substr(md5(
                    concat_ws('|', o_orderkey, o_custkey, cents)),1,15))::BIGINT)
                    AS digest_b
           FROM rows_b GROUP BY bucket)
         SELECT bucket, n_a, digest_a, n_b, digest_b,
                n_a = n_b AND digest_a = digest_b AS is_equal
         FROM da JOIN db USING (bucket)
         ORDER BY bucket""",

    // Identical sufficient statistics, identical double tree — CASTs
    // keep DuckDB's HUGEINT sums out of the float math.
    "q97_group_linreg" ->
      """WITH base AS (
           SELECT min(epoch_ns(ts) // 1000) AS base_us FROM events),
         prepared AS (
           SELECT event_type,
                  (epoch_ns(ts) // 1000 - (SELECT base_us FROM base))
                    // 60000000 AS x_min,
                  CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT)
                    AS y_cents
           FROM events),
         agg AS (
           SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x_min) AS BIGINT) AS sx,
                  CAST(sum(y_cents) AS BIGINT) AS sy,
                  CAST(sum(x_min * y_cents) AS BIGINT) AS sxy,
                  CAST(sum(x_min * x_min) AS BIGINT) AS sxx
           FROM prepared GROUP BY event_type)
         SELECT event_type, n,
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
                (CAST(sy AS DOUBLE)
                 - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * CAST(sx AS DOUBLE))
                / CAST(n AS DOUBLE) AS intercept
         FROM agg
         ORDER BY event_type""",

    // DIRECT single-pass bottom-k over everything — green only if the
    // Spark side's two-sketch merge reaches the identical estimate.
    "q96_kmv_merge" ->
      """WITH ev AS (
           SELECT event_type,
                  CAST(user_id AS VARCHAR) || '#' ||
                  CAST(epoch_ns(ts) // 1000 // 3600000000 AS VARCHAR) AS uh
           FROM events),
         kept AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
                  max(CASE WHEN rn = 64 THEN h END) AS hk
           FROM (SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                 FROM (SELECT DISTINCT event_type,
                         ('0x'||substr(md5(uh),1,15))::BIGINT AS h
                       FROM ev))
           WHERE rn <= 64 GROUP BY event_type)
         SELECT event_type,
                CASE WHEN n_kept < 64 THEN n_kept
                     ELSE CAST(floor(CAST(63 AS DOUBLE)
                                     * CAST(1152921504606846976 AS DOUBLE)
                                     / CAST(hk AS DOUBLE)) AS BIGINT)
                END AS est_nd
         FROM kept
         ORDER BY event_type""",

    // Week buckets are integer floor-division of the shared µs
    // timeline; offsets count distinct active users per cohort.
    "q95_cohort_retention" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us
           FROM events),
         cohort AS (
           SELECT user_id, min(us) // 604800000000 AS cohort_week
           FROM ev WHERE event_type = 'signup' GROUP BY user_id),
         activity AS (
           SELECT DISTINCT e.user_id, c.cohort_week,
                  e.us // 604800000000 - c.cohort_week AS week_offset
           FROM ev e JOIN cohort c USING (user_id)
           WHERE e.us // 604800000000 >= c.cohort_week)
         SELECT cohort_week, week_offset,
                CAST(count(*) AS BIGINT) AS n_users
         FROM activity GROUP BY cohort_week, week_offset
         ORDER BY cohort_week, week_offset""",

    // Same integer inclusion test: top-40 hash bits × max weight vs
    // 2^40 × row weight.
    "q92_weighted_sample" ->
      """WITH w AS (SELECT max(n_chars) AS maxw FROM documents)
         SELECT doc_id, n_chars
         FROM documents, w
         WHERE (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                // 1048576) * maxw < 1099511627776 * n_chars
         ORDER BY doc_id""",

    // Stage k = min event time of type k at-or-after the stage-(k-1)
    // frontier; counts fall out of the chained CTEs.
    "q91_funnel" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us
           FROM events),
         u AS (SELECT DISTINCT user_id FROM ev),
         s1 AS (SELECT user_id, min(us) AS t FROM ev
                WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.us) AS t
                FROM ev e JOIN s1 USING (user_id)
                WHERE e.event_type = 'view' AND e.us >= s1.t
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.us) AS t
                FROM ev e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.us >= s2.t
                GROUP BY e.user_id)
         SELECT CAST(0 AS BIGINT) AS stage, 'all' AS stage_name,
                CAST(count(*) AS BIGINT) AS n_users FROM u
         UNION ALL
         SELECT CAST(1 AS BIGINT), 'signup', CAST(count(*) AS BIGINT) FROM s1
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'view', CAST(count(*) AS BIGINT) FROM s2
         UNION ALL
         SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s3
         ORDER BY stage""",

    // Element access is 1-based on both sides; the centroid divide is
    // one IEEE division of identical exact integers.
    "q90_label_centroids" ->
      s"""WITH q AS (SELECT label, $sqlQuantize AS qv FROM embeddings),
         e AS (SELECT label, i AS pos, qv[i] AS v
               FROM q, range(1, 65) t(i))
         SELECT label, pos, CAST(count(*) AS BIGINT) AS n,
                CAST(CAST(sum(v) AS BIGINT) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS centroid_q
         FROM e GROUP BY label, pos
         ORDER BY label, pos""",

    // The same deletion-neighborhood pipeline, recomputed end to end
    // (list comprehension ≡ Spark transform; levenshtein is the classic
    // unit-cost definition in both engines).
    "q89_fuzzy_join" ->
      """WITH vocab AS (
           SELECT DISTINCT unnest(string_split(text,' ')) AS token
           FROM documents WHERE text IS NOT NULL),
         probes AS (
           SELECT token AS orig,
                  substring(token,1,2) || substring(token,4,length(token))
                    AS probe
           FROM vocab WHERE length(token) >= 5),
         pv AS (
           SELECT DISTINCT orig, probe, unnest(list_prepend(probe,
             [substring(probe,1,i-1) || substring(probe,i+1,length(probe))
              for i in range(1, length(probe)+1)])) AS variant
           FROM probes),
         vv AS (
           SELECT DISTINCT token, unnest(list_prepend(token,
             [substring(token,1,i-1) || substring(token,i+1,length(token))
              for i in range(1, length(token)+1)])) AS variant
           FROM vocab),
         cand AS (
           SELECT DISTINCT p.orig, p.probe, v.token
           FROM pv p JOIN vv v USING (variant))
         SELECT orig, probe, token,
                CAST(levenshtein(probe, token) AS BIGINT) AS dist
         FROM cand WHERE levenshtein(probe, token) <= 1
         ORDER BY orig, token""",

    // Three unrolled iterations of the exact integer recurrence:
    // rank' = (base·15)//100 + (85·Σ rank//outdeg)//100. The CAST on
    // the sum keeps DuckDB's HUGEINT out of the damping multiply.
    "q88_pagerank" ->
      """WITH base AS (
           SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
         edges AS (
           SELECT 2*p AS src, 2*s+1 AS dst FROM base
           UNION ALL
           SELECT 2*s+1, 2*p FROM base),
         nodes AS (SELECT DISTINCT src AS node FROM edges),
         params AS (
           SELECT (1000000000000 // count(*)) * 15 // 100 AS t,
                  1000000000000 // count(*) AS b
           FROM nodes),
         deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
                 FROM edges GROUP BY src),
         r0 AS (SELECT node, (SELECT b FROM params) AS rank FROM nodes),
         it1 AS (
           SELECT e.dst AS node,
                  (SELECT t FROM params) +
                  (85 * CAST(sum(r.rank // d.outdeg) AS BIGINT)) // 100 AS rank
           FROM edges e JOIN deg d ON e.src = d.src
                        JOIN r0 r ON e.src = r.node
           GROUP BY e.dst),
         it2 AS (
           SELECT e.dst AS node,
                  (SELECT t FROM params) +
                  (85 * CAST(sum(r.rank // d.outdeg) AS BIGINT)) // 100 AS rank
           FROM edges e JOIN deg d ON e.src = d.src
                        JOIN it1 r ON e.src = r.node
           GROUP BY e.dst),
         it3 AS (
           SELECT e.dst AS node,
                  (SELECT t FROM params) +
                  (85 * CAST(sum(r.rank // d.outdeg) AS BIGINT)) // 100 AS rank
           FROM edges e JOIN deg d ON e.src = d.src
                        JOIN it2 r ON e.src = r.node
           GROUP BY e.dst)
         SELECT node, rank FROM it3
         ORDER BY rank DESC, node
         LIMIT 20""",

    // The incremental path must be indistinguishable from direct
    // recomputation — the oracle aggregates everything in one pass.
    "q86_incremental_agg" ->
      """SELECT o_custkey,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE)
                  AS sum_total
         FROM orders
         GROUP BY o_custkey
         ORDER BY o_custkey""",

    // Quantile bounds by the same explicit rank formula as q63, then
    // clip + exact decimal sum (clipped values are corpus values, so
    // the decimal cast stays exact).
    "q77_winsorize" ->
      """WITH ranked AS (
           SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value) AS rnk,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
         qs(q) AS (VALUES (0.05), (0.95)),
         bounds AS (
           SELECT event_type,
                  min(CASE WHEN CAST(q AS DOUBLE) = 0.05 THEN value END) AS lo,
                  min(CASE WHEN CAST(q AS DOUBLE) = 0.95 THEN value END) AS hi
           FROM ranked JOIN qs
             ON rnk = CAST(floor((n - 1) * CAST(q AS DOUBLE)) AS BIGINT) + 1
           GROUP BY event_type)
         SELECT e.event_type,
                count(*) AS n,
                CAST(sum(CAST(least(greatest(e.value, b.lo), b.hi)
                              AS DECIMAL(18,3))) AS DOUBLE) AS sum_clipped
         FROM events e JOIN bounds b ON e.event_type = b.event_type
         GROUP BY e.event_type
         ORDER BY e.event_type""",

    // Same session reconstruction as q43/q66 — the native operator must
    // agree with the hand-rolled one's oracle.
    "q76_session_window" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us
           FROM events),
         flagged AS (
           SELECT user_id, event_id, us,
                  CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS is_new
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         numbered AS (
           SELECT user_id, us,
                  sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_id
           FROM flagged)
         SELECT user_id,
                CAST(session_id AS BIGINT) AS session_seq,
                CAST(count(*) AS BIGINT) AS n_events
         FROM numbered
         GROUP BY user_id, session_id
         ORDER BY user_id, session_seq""",

    // The oracle can afford the plain inequality join the Spark side
    // must avoid.
    "q75_range_join" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
           FROM events WHERE event_type = 'purchase'),
         v AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS us
           FROM events WHERE event_type = 'view')
         SELECT p.event_id, p.user_id,
                CAST(count(v.us) AS BIGINT) AS n_prior_views
         FROM p LEFT JOIN v
           ON p.user_id = v.user_id
          AND v.us >= p.us - 1800000000 AND v.us <= p.us
         GROUP BY p.event_id, p.user_id
         ORDER BY p.event_id""",

    "q73_bpe_merges" -> bpeOracleSql(6),

    // Same learned stages, applied back to the corpus: per-doc word and
    // post-merge token counts through the word→symbols vocabulary.
    "q74_bpe_tokenize" -> bpeOracleSql(6,
      """SELECT d.doc_id,
                CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(len(string_split(trim(v.s), ' '))) AS BIGINT)
                  AS n_tokens
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents) d
         JOIN s6 v ON d.w = v.w
         GROUP BY d.doc_id
         ORDER BY doc_id"""),

    // Same ladder: int8 top-25 candidates (q120's grid and integer dot),
    // then the exact quantized cosine rerank to 10.
    "q124_int8_rerank" ->
      s"""WITH v AS (
           SELECT vec_id, $sqlQuantize AS v,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q8
           FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q8 AS qv8, v AS qv FROM v
                WHERE vec_id IN (0, 1, 2, 3, 4)),
         scored8 AS (
           SELECT query_id, v.vec_id, qv,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY list_sum(list_transform(range(1, 65),
                      i -> qv8[i] * v.q8[i])) DESC, v.vec_id) AS r8
           FROM v JOIN qs ON v.vec_id <> qs.query_id),
         rer AS (
           SELECT s.query_id, s.vec_id,
                  ${sqlQcos("s.qv", "v.v")} AS cosine,
                  row_number() OVER (PARTITION BY s.query_id
                    ORDER BY ${sqlQcos("s.qv", "v.v")} DESC, s.vec_id) AS rank
           FROM scored8 s JOIN v ON v.vec_id = s.vec_id
           WHERE s.r8 <= 25)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine
         FROM rer WHERE rank <= 10
         ORDER BY query_id, rank""",

    // Same 6 unrolled merge rounds, rolled up per source instead of per
    // document (the join to s6 applies the [a-z]+ filter implicitly —
    // the vocabulary only holds matching words, both engines alike).
    "q123_bpe_fertility" -> bpeOracleSql(6,
      """SELECT d.source,
                CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(len(string_split(trim(v.s), ' '))) AS BIGINT)
                  AS n_tokens,
                (1000 * CAST(sum(len(string_split(trim(v.s), ' ')))
                   AS BIGINT)) // CAST(count(*) AS BIGINT)
                  AS fertility_milli
         FROM (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents) d
         JOIN s6 v ON d.w = v.w
         GROUP BY d.source
         ORDER BY source"""),

    // Mirrors the slicing arithmetic on octet lengths (UTF-8 bytes on
    // both sides); the final (possibly short) frame is the least() term.
    "q72_frame_sample" ->
      """SELECT doc_id AS media_id,
                CAST((greatest(octet_length(encode(text)), 1) - 1) // 100 + 1
                     AS BIGINT) AS n_frames,
                CAST(list_sum(
                  [greatest(least(16, octet_length(encode(text)) - off + 1), 0)
                   for off in range(1, greatest(octet_length(encode(text)), 1) + 1, 100)])
                  AS BIGINT) AS total_frame_bytes
         FROM documents
         ORDER BY media_id""",

    "q68_inverted_index" ->
      """WITH tf AS (
           SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents)
           WHERE token <> ''
           GROUP BY token, doc_id)
         SELECT token,
                CAST(count(*) AS BIGINT) AS df,
                CAST(sum(tf) AS BIGINT) AS cf,
                string_agg(CAST(doc_id AS VARCHAR), ','
                           ORDER BY doc_id) AS postings
         FROM tf
         GROUP BY token
         HAVING count(*) BETWEEN 5 AND 400
         ORDER BY token""",

    // The z expression tree must mirror the Spark side token-for-token:
    // each division/subtraction/sqrt is correctly-rounded IEEE over
    // identical inputs, so identical trees give identical bits.
    "q67_zscore" ->
      """WITH stats AS (
           SELECT event_type,
                  count(*) AS n,
                  CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS s,
                  CAST(sum(CAST(value AS DECIMAL(18,3))
                           * CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sq
           FROM events GROUP BY event_type)
         SELECT e.event_id, e.event_type, e.value,
                (e.value - s / n)
                  / sqrt(greatest(sq / n - (s / n) * (s / n), 0.0)) AS z
         FROM events e JOIN stats st ON e.event_type = st.event_type
         ORDER BY e.event_id""",

    // Thresholds are floor(rate·65536) as fixed-width hex, exactly as
    // hashSplit's: 0.5→8000, 0.25→4000, 0.125→2000.
    "q65_stratified_sample" ->
      """SELECT doc_id, lang
         FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
           CASE WHEN lang = 'en' THEN '8000'
                WHEN lang = 'fr' THEN '4000'
                ELSE '2000' END
         ORDER BY doc_id""",

    // Mirrors the Spark-side change-batch construction, collapses to
    // the latest change per key, and full-joins against the base —
    // double arithmetic is +10/+20 on identical parquet doubles, exact
    // in both engines.
    "q64_cdc_merge" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           FROM orders),
         ch AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 10.0 AS o_totalprice, 'U' AS op, 1 AS seq
           FROM base WHERE o_orderkey % 10 = 3
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  o_totalprice + 20.0, 'U', 2
           FROM base WHERE o_orderkey % 100 = 3
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  'D', 1
           FROM base WHERE o_orderkey % 10 = 7
           UNION ALL
           SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
                  o_totalprice, 'I', 1
           FROM base WHERE o_orderkey % 10 = 1),
         latest AS (
           SELECT * FROM (
             SELECT ch.*, row_number() OVER (PARTITION BY o_orderkey
                                             ORDER BY seq DESC) AS rn
             FROM ch) WHERE rn = 1)
         SELECT COALESCE(l.o_orderkey, b.o_orderkey) AS o_orderkey,
                CASE WHEN l.op IS NOT NULL THEN l.o_custkey
                     ELSE b.o_custkey END AS o_custkey,
                CASE WHEN l.op IS NOT NULL THEN l.o_orderstatus
                     ELSE b.o_orderstatus END AS o_orderstatus,
                CASE WHEN l.op IS NOT NULL THEN l.o_totalprice
                     ELSE b.o_totalprice END AS o_totalprice
         FROM base b FULL JOIN latest l ON b.o_orderkey = l.o_orderkey
         WHERE l.op IS NULL OR l.op <> 'D'
         ORDER BY o_orderkey""",

    // The oracle can afford the naive full sort; the rank formula is
    // evaluated in DOUBLE on both sides (VALUES literals are DECIMAL in
    // DuckDB — cast before the product or the floor differs).
    // Same discrete lower-quantile rank (floor((n-1)/2)+1) for both
    // medians; deviations and the 3·MAD flag mirror the Spark op order.
    "q111_mad_outliers" ->
      """WITH ranked AS (
           SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value) AS rnk,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
         med AS (
           SELECT event_type, value AS med FROM ranked
           WHERE rnk = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1),
         dev AS (
           SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
           FROM events e JOIN med m USING (event_type)),
         dranked AS (
           SELECT event_type, adev,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY adev) AS rnk,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM dev),
         mad AS (
           SELECT event_type, adev AS mad FROM dranked
           WHERE rnk = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1)
         SELECT d.event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                max(d.med) AS median_value,
                max(mm.mad) AS mad,
                CAST(sum(CASE WHEN d.adev > 3.0 * mm.mad THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_outliers
         FROM dev d JOIN mad mm USING (event_type)
         GROUP BY d.event_type
         ORDER BY d.event_type""",

    "q63_exact_quantiles" ->
      """WITH ranked AS (
           SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value) AS rnk,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
         qs(q) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99))
         SELECT event_type, CAST(q AS DOUBLE) AS q,
                value AS quantile_value, n AS n_events
         FROM ranked JOIN qs
           ON rnk = CAST(floor((n - 1) * CAST(q AS DOUBLE)) AS BIGINT) + 1
         ORDER BY event_type, q""",

    // Thresholds are floor(cumfrac·65536) as 4-digit hex: 0.8 → cccc,
    // 0.9 → e666 (fixed-width lowercase hex compares like the number).
    "q54_hash_split" ->
      """SELECT doc_id, lang,
                CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'valid'
                     ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",

    "q56_group_topk" ->
      """SELECT user_id, event_id, value, rnk FROM (
           SELECT user_id, event_id, value,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY value DESC, event_id) AS rnk
           FROM events)
         WHERE rnk <= 3
         ORDER BY user_id, rnk""",

    "q44_json_props" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events
         GROUP BY event_type
         ORDER BY event_type""",

    "q45_salted_agg" ->
      """SELECT user_id,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS total_value,
                count(*) AS n_events
         FROM events
         GROUP BY user_id
         ORDER BY user_id""",
    "q49_contamination" ->
      s"""WITH sh AS (
           SELECT doc_id, doc_id % 50 = 0 AS is_bench, $sqlWordShingles AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         bench AS (
           SELECT DISTINCT unnest(sh) AS s FROM sh WHERE is_bench),
         ex AS (
           SELECT doc_id, unnest(sh) AS s FROM sh WHERE NOT is_bench)
         SELECT ex.doc_id,
                count(*)::BIGINT AS n_shingles,
                sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
                sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*) AS contamination
         FROM ex LEFT JOIN bench b ON ex.s = b.s
         GROUP BY ex.doc_id
         ORDER BY ex.doc_id""",

    "q50_vocabulary" ->
      """SELECT token, n, rank FROM (
           SELECT token, n,
                  row_number() OVER (ORDER BY n DESC, token) AS rank
           FROM (SELECT token, count(*) AS n
                 FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
                 GROUP BY token))
         WHERE rank <= 1000
         ORDER BY rank""",

    "q48_pivot" ->
      """SELECT user_id,
                count(*) FILTER (WHERE event_type = 'click') AS click,
                count(*) FILTER (WHERE event_type = 'error') AS error,
                count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS signup,
                count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events
         GROUP BY user_id
         ORDER BY user_id""",

    "q47_exact_median" ->
      """WITH r AS (
           SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type, avg(value) AS median_value, max(n) AS n_events
         FROM r
         WHERE rn = (n+1)//2 OR rn = (n+2)//2
         GROUP BY event_type
         ORDER BY event_type""",

    "q46_curation_pipeline" ->
      s"""WITH kept AS (
           SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         base AS (
           SELECT d.doc_id, d.text FROM documents d JOIN kept USING (doc_id)),
         docs AS (
           SELECT doc_id, $sqlWordShingles AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)),
         sigs AS (
           SELECT doc_id, ${sqlSig(24)} AS sig FROM docs),
         bands AS (
           SELECT doc_id, ${sqlBandUnnest(4, 6)} AS band FROM sigs),
         cand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         losers AS (
           SELECT DISTINCT b AS doc_id FROM (
             SELECT c.a, c.b,
                    len(list_intersect(da.sh, db.sh))::DOUBLE /
                    len(list_distinct(list_concat(da.sh, db.sh))) AS jaccard
             FROM cand c
             JOIN docs da ON c.a = da.doc_id
             JOIN docs db ON c.b = db.doc_id)
           WHERE jaccard >= 0.8),
         surv AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM base
           WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         scored AS (
           SELECT doc_id,
                  len(w)::BIGINT AS n_tokens,
                  least(len(w) / 64.0, 1.0) * 0.4 +
                  (len(list_distinct(w))::DOUBLE / len(w)) * 0.4 +
                  least((len(list_filter(w, x -> x IN ('the','a','of','and','in','is')))::DOUBLE / len(w)) * 4.0, 1.0) * 0.2 AS quality
           FROM surv)
         SELECT doc_id, n_tokens, quality FROM scored
         WHERE quality >= 0.5
         ORDER BY doc_id""",

    // Same span census: distinct 8-gram spans as 60-bit digests, row
    // count per span = its document frequency, integer permille.
    "q117_span_dedup" ->
      s"""WITH spans AS (
           SELECT doc_id,
                  ('0x' || substr(md5(unnest(${sqlWordShinglesN(8)})), 1, 15))::BIGINT AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         freq AS (SELECT g, CAST(count(*) AS BIGINT) AS ndocs
                  FROM spans GROUP BY g)
         SELECT s.doc_id,
                CAST(count(*) AS BIGINT) AS n_spans,
                CAST(sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_spans,
                (1000 * CAST(sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END)
                   AS BIGINT)) // CAST(count(*) AS BIGINT) AS dup_permille
         FROM spans s JOIN freq f USING (g)
         GROUP BY s.doc_id
         ORDER BY doc_id""",

    // Same prefix-blocked containment: rarest-4 probe shingles per doc
    // (ties on the shingle digest), exact intersection counts, integer
    // permille on both sides.
    "q118_containment" ->
      s"""WITH spans AS (
           SELECT doc_id AS id,
                  ('0x' || substr(md5(unnest(${sqlWordShinglesN(3)})), 1, 15))::BIGINT AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz
                   FROM spans GROUP BY id),
         dfreq AS (SELECT g, CAST(count(*) AS BIGINT) AS df
                   FROM spans GROUP BY g),
         pk AS (
           SELECT id AS pid, g FROM (
             SELECT s.id, s.g,
                    row_number() OVER (PARTITION BY s.id
                                       ORDER BY d.df, s.g) AS rk
             FROM spans s JOIN dfreq d USING (g))
           WHERE rk <= 4),
         cands AS (
           SELECT DISTINCT least(pid, oid) AS a, greatest(pid, oid) AS b
           FROM pk JOIN (SELECT id AS oid, g FROM spans) o USING (g)
           WHERE pid <> oid),
         inter AS (
           SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS n
           FROM cands c
           JOIN spans sa ON sa.id = c.a
           JOIN spans sb ON sb.id = c.b AND sb.g = sa.g
           GROUP BY c.a, c.b)
         SELECT i.a AS doc_a, i.b AS doc_b,
                (1000 * i.n) // za.sz AS cont_a_permille,
                (1000 * i.n) // zb.sz AS cont_b_permille
         FROM inter i
         JOIN sizes za ON za.id = i.a
         JOIN sizes zb ON zb.id = i.b
         WHERE (1000 * i.n) // za.sz >= 600 OR (1000 * i.n) // zb.sz >= 600
         ORDER BY doc_a, doc_b""",

    // Same bit-length floor-log2: length(bin(N div cw)) - 1 per token.
    "q119_surprisal" ->
      """WITH words AS (
           SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w
           FROM documents),
         cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
                 FROM words GROUP BY w),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM words)
         SELECT id AS doc_id,
                CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(length(bin(n_total // cw)) - 1) AS BIGINT)
                  AS surprisal_bits,
                (1000 * CAST(sum(length(bin(n_total // cw)) - 1) AS BIGINT))
                  // CAST(count(*) AS BIGINT) AS mean_millibits
         FROM words JOIN cnt USING (w) CROSS JOIN tot
         GROUP BY id
         ORDER BY doc_id""",

    // Same int8 grid (clamp(floor(x*64))) and pure-integer dot ranking.
    "q120_int8_topk" ->
      """WITH v AS (
           SELECT vec_id,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q
           FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q AS qv FROM v
                WHERE vec_id IN (0, 1, 2, 3, 4)),
         scored AS (
           SELECT query_id, v.vec_id,
                  CAST(list_sum(list_transform(range(1, 65),
                    i -> qv[i] * v.q[i])) AS BIGINT) AS dot,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY list_sum(list_transform(range(1, 65),
                      i -> qv[i] * v.q[i])) DESC, v.vec_id) AS rank
           FROM v JOIN qs ON v.vec_id <> qs.query_id)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, dot
         FROM scored WHERE rank <= 10
         ORDER BY query_id, rank""",

    // Same two Lloyd iterations as q51, then: min-L2 assignment (ties →
    // lowest cluster), (cluster, band) sub-banded candidates with the
    // identical hyperplane weight literals, cosine ≥ 0.4 verification,
    // recursive min-label components, keep_id = component min (self if
    // unpaired).
    "q122_semantic_dedup" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, $sqlQuantize AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
           FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIter("c0", "c1")},
         ${sqlLloydIter("c1", "c2")},
         assigned AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) for i in range(0, 64)]),
                               c.cluster) AS rn
             FROM e CROSS JOIN c2 c)
           WHERE rn = 1),
         banded AS (
           SELECT vec_id, cluster,
                  unnest(${sqlHyperplaneBands("v", 16, 4, 64)}) AS band
           FROM assigned),
         cand AS (
           SELECT DISTINCT a.vec_id AS x, b.vec_id AS y
           FROM banded a JOIN banded b
             ON a.cluster = b.cluster AND a.band = b.band
                AND a.vec_id < b.vec_id),
         pairs AS (
           SELECT c.x, c.y
           FROM cand c
           JOIN assigned a ON a.vec_id = c.x
           JOIN assigned b ON b.vec_id = c.y
           WHERE ${sqlQcos("a.v", "b.v")} >= 0.4),
         edges AS (
           SELECT x AS a, y AS b FROM pairs
           UNION SELECT y, x FROM pairs),
         reach(node, r) AS (
           SELECT a, a FROM edges
           UNION
           SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b),
         comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
         SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
                coalesce(c.component, a.vec_id) AS keep_id
         FROM assigned a LEFT JOIN comp c ON c.node = a.vec_id
         ORDER BY vec_id""",

    // One counting subquery per profiled column, unioned — the oracle
    // pays a scan per column where the engine pays one Expand pass.
    "q128_column_profile" -> {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS col_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
                   CAST(min($c) AS DOUBLE) AS min_v,
                   CAST(max($c) AS DOUBLE) AS max_v,
                   CAST(sum(CAST($c AS DECIMAL(18,3))) AS DOUBLE) AS sum_v
            FROM lineitem"""
      }.mkString("", " UNION ALL ", " ORDER BY col_name")
    },

    // Same affine bucket map (identical IEEE expression order), same
    // generated bin frame so empty bins appear with n = 0.
    "q129_histogram" ->
      """WITH base AS (
           SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
           WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
             AND isfinite(CAST(o_totalprice AS DOUBLE))),
         bounds AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
         counts AS (
           SELECT CASE WHEN hi = lo THEN 0
                       ELSE least(CAST(floor((x - lo) / (hi - lo) * 20)
                                       AS BIGINT), 19) END AS bucket,
                  CAST(count(*) AS BIGINT) AS n
           FROM base CROSS JOIN bounds GROUP BY 1),
         bins AS (
           SELECT unnest(range(0, 20)) AS bucket, lo, hi
           FROM bounds)
         SELECT CAST(b.bucket AS BIGINT) AS bucket,
                lo + b.bucket * ((hi - lo) / 20) AS bin_lo,
                CASE WHEN b.bucket = 19 THEN hi
                     ELSE lo + (b.bucket + 1) * ((hi - lo) / 20) END AS bin_hi,
                coalesce(c.n, 0) AS n
         FROM bins b LEFT JOIN counts c ON c.bucket = b.bucket
         ORDER BY bucket""",

    // The salt never changes the result set: the oracle is the PLAIN
    // join's rollup.
    "q130_salted_join" ->
      """SELECT c_mktsegment,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE)
                  AS sum_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",

    // Same (ts µs, event_id) total order for "first"; purchases roll
    // up by that first-touch channel.
    "q131_attribution" ->
      """WITH stamped AS (
           SELECT user_id, event_type, value,
                  first_value(event_type) OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_ns(ts) // 1000, event_id) AS first_touch
           FROM events)
         SELECT first_touch,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(count(*) AS BIGINT) AS n_conversions,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS revenue
         FROM stamped WHERE event_type = 'purchase'
         GROUP BY first_touch
         ORDER BY first_touch""",

    // Identical µs RANGE frame; decimal-exact sum, one edge cast.
    "q132_trailing_window" ->
      """SELECT event_id, user_id, us,
                CAST(sum(CAST(value AS DECIMAL(18,3))) OVER w AS DOUBLE)
                  AS trailing_1h_sum,
                CAST(count(*) OVER w AS BIGINT) AS trailing_1h_n
         FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us, value
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    // Same tail-zip bigram extraction, same bit-length floor-log2 of
    // the context/pair count ratio.
    "q133_bigram_surprisal" ->
      """WITH d AS (
           SELECT doc_id AS id, string_split(text, ' ') AS t
           FROM documents WHERE text IS NOT NULL),
         bg AS (
           SELECT id, t[i] AS w1, t[i + 1] AS w2
           FROM (SELECT id, t, unnest(range(1, len(t))) AS i FROM d)),
         ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
                 FROM bg GROUP BY w1),
         pair AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
                  FROM bg GROUP BY w1, w2)
         SELECT id AS doc_id,
                CAST(count(*) AS BIGINT) AS n_bigrams,
                CAST(sum(length(bin(c1 // cb)) - 1) AS BIGINT)
                  AS surprisal_bits,
                (1000 * CAST(sum(length(bin(c1 // cb)) - 1) AS BIGINT))
                  // CAST(count(*) AS BIGINT) AS mean_millibits
         FROM bg JOIN pair USING (w1, w2) JOIN ctx USING (w1)
         GROUP BY id
         ORDER BY doc_id""",

    // The naive whole-class rank — the semantics the two-phase cutoff
    // reproduces exactly: cap smallest (md5-prefix, id) per class.
    "q136_class_balance" ->
      """WITH ranked AS (
           SELECT doc_id, source, lang, n_chars,
                  row_number() OVER (
                    PARTITION BY source
                    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                             doc_id) AS rn
           FROM documents)
         SELECT doc_id, source, lang, n_chars
         FROM ranked WHERE rn <= 13
         ORDER BY doc_id""",

    // The naive whole-group rank() the bucketed ranks must equal,
    // including tie semantics; integer permille division.
    "q137_percent_rank" ->
      """SELECT event_id, event_type, value,
                CASE WHEN count(*) OVER g = 1 THEN 0
                     ELSE (1000 * (rank() OVER w - 1))
                          // (count(*) OVER g - 1) END AS prank_milli
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY value),
                g AS (PARTITION BY event_type)
         ORDER BY event_id""",

    // Three unrolled peel stages — the same fixed-round contract
    // (peeling is monotone, so a converged round is a no-op).
    "q138_kcore" ->
      """WITH e0 AS (
           SELECT u, v FROM (
             SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
             FROM lineitem)
           UNION
           SELECT v, u FROM (
             SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
             FROM lineitem)),
         k1 AS (SELECT u FROM e0 GROUP BY u HAVING count(*) >= 26),
         e1 AS (SELECT e0.u, e0.v FROM e0
                WHERE e0.u IN (SELECT u FROM k1)
                  AND e0.v IN (SELECT u FROM k1)),
         k2 AS (SELECT u FROM e1 GROUP BY u HAVING count(*) >= 26),
         e2 AS (SELECT e1.u, e1.v FROM e1
                WHERE e1.u IN (SELECT u FROM k2)
                  AND e1.v IN (SELECT u FROM k2)),
         k3 AS (SELECT u FROM e2 GROUP BY u HAVING count(*) >= 26),
         e3 AS (SELECT e2.u, e2.v FROM e2
                WHERE e2.u IN (SELECT u FROM k3)
                  AND e2.v IN (SELECT u FROM k3))
         SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
         FROM e3 GROUP BY u
         ORDER BY node""",

    // Each event unnested to its two hourly-grid 2-hour windows; same
    // exact distinct count.
    "q142_sliding_windows" ->
      """WITH ev AS (
           SELECT date_trunc('hour', ts) AS h, event_type, user_id
           FROM events),
         m AS (
           SELECT unnest([h - INTERVAL 1 HOUR, h]) AS win_start,
                  event_type, user_id
           FROM ev)
         SELECT win_start, event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM m GROUP BY win_start, event_type
         ORDER BY win_start, event_type""",

    // lag() gaps on the same (us, event_id) order, then the q47 rank
    // pick for the median.
    "q143_event_gaps" ->
      """WITH g AS (
           SELECT event_type,
                  CAST(us - lag(us) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id)
                       AS DOUBLE) AS gap
           FROM (SELECT event_id, user_id, event_type,
                        epoch_ns(ts) // 1000 AS us
                 FROM events)),
         r AS (
           SELECT event_type, gap,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY gap) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM g WHERE gap IS NOT NULL)
         SELECT event_type, avg(gap) AS median_value,
                max(n) AS n_events
         FROM r
         WHERE rn = (n+1)//2 OR rn = (n+2)//2
         GROUP BY event_type
         ORDER BY event_type""",

    // Same 60-bit md5 hashes, same bottom-64 thresholds, same
    // θ = min rule and sub-θ inner join; one floor division at the
    // edge from exactly-representable doubles.
    "q140_kmv_intersect" ->
      """WITH ha AS (
           SELECT DISTINCT event_type,
                  ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
           FROM events WHERE event_id % 2 = 0),
         hb AS (
           SELECT DISTINCT event_type,
                  ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
           FROM events WHERE event_id % 2 = 1),
         sa AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                FROM ha),
         sb AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                FROM hb),
         ta AS (SELECT event_type,
                  coalesce(max(CASE WHEN rn = 64 THEN h END),
                           1152921504606846976) AS ta
                FROM sa WHERE rn <= 64 GROUP BY event_type),
         tb AS (SELECT event_type,
                  coalesce(max(CASE WHEN rn = 64 THEN h END),
                           1152921504606846976) AS tb
                FROM sb WHERE rn <= 64 GROUP BY event_type),
         common AS (
           SELECT sa.event_type,
                  CAST(count(*) AS BIGINT) AS n_common,
                  max(least(ta.ta, tb.tb)) AS theta
           FROM sa JOIN sb ON sa.event_type = sb.event_type
                          AND sa.h = sb.h
           JOIN ta ON ta.event_type = sa.event_type
           JOIN tb ON tb.event_type = sa.event_type
           WHERE sa.rn <= 64 AND sb.rn <= 64
             AND sa.h < least(ta.ta, tb.tb)
           GROUP BY sa.event_type)
         SELECT event_type,
                CAST(floor(CAST(n_common AS DOUBLE) *
                     1152921504606846976.0 / CAST(theta AS DOUBLE))
                     AS BIGINT) AS est_common
         FROM common
         ORDER BY event_type""",

    // Same zone keys, same min/max stats, same footer-pruning rule.
    "q141_zone_map" ->
      """WITH zones AS (
           SELECT 'by_orderkey' AS layout,
                  CAST(l_orderkey // 2000 AS BIGINT) AS zone,
                  CAST(count(*) AS BIGINT) AS n_rows,
                  min(l_shipdate) AS min_v, max(l_shipdate) AS max_v
           FROM lineitem GROUP BY 1, 2
           UNION ALL
           SELECT 'by_month',
                  CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT),
                  CAST(count(*) AS BIGINT),
                  min(l_shipdate), max(l_shipdate)
           FROM lineitem GROUP BY 1, 2)
         SELECT layout, zone, n_rows, min_v, max_v,
                (TIMESTAMP '1996-06-30' < min_v OR
                 TIMESTAMP '1996-01-01' > max_v) AS skippable
         FROM zones
         ORDER BY layout, zone""",

    // Interval join against the q109-style version table: version
    // valid at view time, open current version, zero-width dup-ts
    // versions excluded by vf <= us < vt.
    "q139_pit_join" ->
      """WITH hist AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS vf, value
           FROM events WHERE event_type = 'purchase'),
         v AS (
           SELECT user_id,
                  CAST(row_number() OVER w AS BIGINT) AS version,
                  vf, lead(vf) OVER w AS vt, value
           FROM hist
           WINDOW w AS (PARTITION BY user_id ORDER BY vf, event_id)),
         f AS (
           SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
           FROM events WHERE event_type = 'view')
         SELECT f.event_id, f.user_id, f.us, v.version,
                v.value AS value_at_time
         FROM f JOIN v
           ON f.user_id = v.user_id AND v.vf <= f.us
          AND (v.vt IS NULL OR f.us < v.vt)
         ORDER BY event_id""",

    // The Misra-Gries pass is plan-only: the answer is exactly the
    // HAVING form, which is what the oracle states.
    "q145_heavy_hitters" ->
      """WITH fw AS (
           SELECT w FROM (
             SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE regexp_full_match(w, '[a-z]+'))
         SELECT w, CAST(count(*) AS BIGINT) AS cnt
         FROM fw GROUP BY w
         HAVING count(*) * 30 > (SELECT count(*) FROM fw)
         ORDER BY w""",

    "q146_canonical_pick" -> canonicalOracle,

    // Same cells → marginals → full grid → shared-IEEE tree as
    // Stats.chiSquare (zero cells included); the e subtree is written
    // out verbatim everywhere it appears, so both engines evaluate the
    // identical double expression. The grid→cells join is null-safe
    // (IS NOT DISTINCT FROM) to mirror the engine's <=> — a NULL
    // category is a category on both sides.
    "q147_chisq_assoc" ->
      """WITH cells AS (
           SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY lang, source),
         ra AS (SELECT lang, CAST(sum(o) AS BIGINT) AS ra
                FROM cells GROUP BY lang),
         cb AS (SELECT source, CAST(sum(o) AS BIGINT) AS cb
                FROM cells GROUP BY source),
         tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
         SELECT ra.lang, cb.source,
                CAST(COALESCE(o, 0) AS BIGINT) AS o,
                CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)
                  AS expected,
                (CAST(COALESCE(o, 0) AS DOUBLE) -
                 CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) *
                (CAST(COALESCE(o, 0) AS DOUBLE) -
                 CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) /
                (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
                  AS chi2_part
         FROM ra CROSS JOIN cb
         LEFT JOIN cells
           ON cells.lang IS NOT DISTINCT FROM ra.lang
          AND cells.source IS NOT DISTINCT FROM cb.source
         CROSS JOIN tot
         ORDER BY ra.lang, cb.source""",

    // Naive per-class cumulative prefix under 2000 — the whole-class
    // window the two-phase budgetFill reproduces row for row.
    "q148_budget_fill" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
                  COALESCE(sum(n_chars) OVER (PARTITION BY source
                    ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                             doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cb
           FROM documents)
         WHERE cb < 2000 ORDER BY doc_id""",

    // Weighted lower quantile: same ⌈q·W⌉ target arithmetic (one
    // double product, ceil, clamp to 1) and the same RANGE-frame
    // cumulative ("weight of all values ≤ x"), so ties resolve
    // identically without any row-order dependence.
    "q149_weighted_quantile" ->
      """WITH base AS (
           SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS x,
                  CAST(l_quantity AS BIGINT) AS wt FROM lineitem),
         tot AS (SELECT g, CAST(sum(wt) AS BIGINT) AS tw
                 FROM base GROUP BY g),
         tq AS (SELECT g, tw, q,
                  GREATEST(CAST(ceil(q * CAST(tw AS DOUBLE)) AS BIGINT), 1)
                    AS t
                FROM tot CROSS JOIN
                  (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE,
                                  0.9::DOUBLE]) AS q)),
         cum AS (SELECT g, x, sum(wt) OVER (PARTITION BY g ORDER BY x
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
                 FROM base)
         SELECT tq.g AS l_returnflag, tq.q AS q, min(cum.x) AS quantile_value,
                max(tq.tw) AS total_weight
         FROM cum JOIN tq ON cum.g = tq.g AND cum.cw >= tq.t
         GROUP BY tq.g, tq.q
         ORDER BY l_returnflag, q""",

    // Two synchronous rounds unrolled; the arg_max score c·2^40 −
    // label mirrors Graph.labelPropagation's integer tie-break
    // exactly.
    "q150_label_prop" ->
      """WITH fwd AS (
           SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem),
         und AS (SELECT src, dst FROM fwd
                 UNION SELECT dst, src FROM fwd),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
         r1 AS (SELECT u.src AS n, l.label, count(*) AS c
                FROM und u JOIN l0 l ON l.node = u.dst
                GROUP BY u.src, l.label),
         l1 AS (SELECT n AS node,
                       arg_max(label, c * 1099511627776 - label) AS label
                FROM r1 GROUP BY n),
         r2 AS (SELECT u.src AS n, l.label, count(*) AS c
                FROM und u JOIN l1 l ON l.node = u.dst
                GROUP BY u.src, l.label),
         l2 AS (SELECT n AS node,
                       arg_max(label, c * 1099511627776 - label) AS label
                FROM r2 GROUP BY n)
         SELECT node, CAST(label AS BIGINT) AS label FROM l2
         ORDER BY node""",

    // Same derived PII strings; RE2 counts via regexp_extract_all over
    // the IDENTICAL pattern literals (single source: PiiPatterns).
    "q151_pii_scan" ->
      s"""WITH d AS ($sqlPiiDocs)
         SELECT doc_id,
                ${sqlPiiCount("email")} AS n_email,
                ${sqlPiiCount("phone")} AS n_phone,
                ${sqlPiiCount("ipv4")} AS n_ipv4,
                ${sqlPiiCount("ssn")} AS n_ssn,
                ${sqlPiiCount("email")} + ${sqlPiiCount("phone")} +
                ${sqlPiiCount("ipv4")} + ${sqlPiiCount("ssn")} AS n_pii
         FROM d ORDER BY doc_id""",

    // Same chained global replaces in the same declared order.
    "q152_pii_redact" ->
      s"""WITH d AS ($sqlPiiDocs)
         SELECT doc_id, $sqlPiiRedacted AS redacted
         FROM d ORDER BY doc_id""",

    // Combinable count + total + permille share; the ORDER includes the
    // key so the top-20 cut is a total order in both engines.
    "q153_skew_audit" ->
      """WITH c AS (
           SELECT CAST(user_id AS VARCHAR) AS key,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
         t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
         SELECT key, cnt, (1000 * cnt) // total AS share_permille
         FROM c CROSS JOIN t
         ORDER BY cnt DESC, key ASC NULLS FIRST
         LIMIT 20""",

    // Same 2-word line derivation, distinct-doc line frequency per
    // source, and order-preserving rebuild (COALESCE mirrors Spark's
    // empty-array concat_ws = '' when every line is boilerplate).
    "q154_boilerplate" ->
      """WITH w AS (
           SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents),
         d AS (
           SELECT doc_id, source,
                  [array_to_string(ws[i*2+1:i*2+2], ' ')
                   for i in range(0, (len(ws)-1)//2 + 1)] AS ls
           FROM w),
         lines AS (
           SELECT doc_id, source, unnest(ls) AS line,
                  unnest(range(1, len(ls)+1)) AS pos
           FROM d),
         freq AS (
           SELECT source, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM lines GROUP BY source, line),
         j AS (
           SELECT l.doc_id, l.pos, l.line, f.df
           FROM lines l JOIN freq f
             ON l.source = f.source AND l.line = f.line)
         SELECT doc_id,
                COALESCE(string_agg(CASE WHEN df < 3 THEN line END,
                                    chr(10) ORDER BY pos), '') AS clean_text,
                CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_removed
         FROM j GROUP BY doc_id ORDER BY doc_id""",

    // Same integer acceptance: h16 · W < 65536 · k · w.
    "q155_pps_sample" ->
      """WITH t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS w_tot
                    FROM documents)
         SELECT doc_id, source, n_chars
         FROM documents CROSS JOIN t
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                 * w_tot
               < 65536 * 100 * CAST(n_chars AS BIGINT)
         ORDER BY doc_id""",

    // q31's pair pipeline verbatim, rolled up by unordered source pair.
    "q156_source_dup_matrix" ->
      s"""WITH pairs AS (
           WITH docs AS (
             SELECT doc_id, $sqlWordShingles AS sh
             FROM (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents)),
           ${sqlLshPipeline(24, 4, 6, 0.8)})
         SELECT least(da.source, db.source) AS source_x,
                greatest(da.source, db.source) AS source_y,
                CAST(count(*) AS BIGINT) AS n_pairs
         FROM pairs p
         JOIN documents da ON p.doc_a = da.doc_id
         JOIN documents db ON p.doc_b = db.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // Same cutoff literal (both engines read the NANOS parquet floored
    // to µs — the q60/q82 probe contract), same leakage flag.
    "q157_temporal_split" ->
      """WITH train AS (
           SELECT * FROM events
           WHERE ts < TIMESTAMP '2024-01-22 00:00:00'),
         vali AS (
           SELECT * FROM events
           WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'),
         tu AS (SELECT DISTINCT user_id FROM train),
         ta AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_train
                FROM train GROUP BY 1),
         va AS (SELECT v.event_type, CAST(count(*) AS BIGINT) AS n_val,
                       CAST(sum(CASE WHEN tu.user_id IS NOT NULL
                                     THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_val_leaked
                FROM vali v LEFT JOIN tu ON v.user_id = tu.user_id
                GROUP BY 1)
         SELECT COALESCE(ta.event_type, va.event_type) AS event_type,
                COALESCE(n_train, 0) AS n_train,
                COALESCE(n_val, 0) AS n_val,
                COALESCE(n_val_leaked, 0) AS n_val_leaked
         FROM ta FULL OUTER JOIN va ON ta.event_type = va.event_type
         ORDER BY event_type""",

    // Same lower-quantile rank arithmetic (floor((n-1)·q)+1 — one IEEE
    // product) for the 7 interior cutpoints, same x ≥ cut bin rule;
    // the value at a rank is tie-order-free because tied rows share
    // the value.
    "q158_equi_depth_bin" ->
      """WITH base AS (
           SELECT event_id, event_type AS grp, CAST(value AS DOUBLE) AS x
           FROM events
           WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
             AND isfinite(CAST(value AS DOUBLE))),
         n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
               FROM base GROUP BY grp),
         qs AS (SELECT CAST(unnest([0.125, 0.25, 0.375, 0.5,
                                    0.625, 0.75, 0.875]) AS DOUBLE) AS q),
         tgt AS (SELECT grp, q, CAST(floor((n - 1) * q) AS BIGINT) + 1 AS r
                 FROM n CROSS JOIN qs),
         ranked AS (SELECT grp, x,
                           row_number() OVER (PARTITION BY grp ORDER BY x)
                             AS rn
                    FROM base),
         cuts AS (SELECT t.grp, rk.x AS c
                  FROM tgt t JOIN ranked rk
                    ON rk.grp = t.grp AND rk.rn = t.r)
         SELECT b.event_id,
                CAST(sum(CASE WHEN b.x >= c.c THEN 1 ELSE 0 END) AS BIGINT)
                  AS bin
         FROM base b JOIN cuts c ON c.grp = b.grp
         GROUP BY b.event_id ORDER BY event_id""",

    // Same two Lloyd iterations and min-L2 assignment as q122, then a
    // per-cluster integer dispersion rollup.
    "q159_cluster_profile" ->
      s"""WITH e AS (SELECT vec_id, $sqlQuantize AS v FROM embeddings),
         c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
           FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIter("c0", "c1")},
         ${sqlLloydIter("c1", "c2")},
         a AS (
           SELECT vec_id, cluster, d2 FROM (
             SELECT e.vec_id, c.cluster,
                    list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) for i in range(0, 64)]) AS d2,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) for i in range(0, 64)]),
                               c.cluster) AS rn
             FROM e CROSS JOIN c2 c)
           WHERE rn = 1)
         SELECT CAST(cluster AS BIGINT) AS cluster,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(d2) AS BIGINT) // CAST(count(*) AS BIGINT)
                  AS mean_d2,
                CAST(max(d2) AS BIGINT) AS max_d2
         FROM a GROUP BY cluster ORDER BY cluster""",

    // q120's int8 ranking ∩ q35's exact ranking, both top-10, per
    // query — the same two scored CTEs verbatim.
    "q160_recall_at_k" ->
      s"""WITH v AS (SELECT vec_id, $sqlQuantize AS q FROM embeddings),
         v8 AS (
           SELECT vec_id,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q
           FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q AS qv FROM v
                WHERE vec_id IN (0, 1, 2, 3, 4)),
         qs8 AS (SELECT vec_id AS query_id, q AS qv FROM v8
                 WHERE vec_id IN (0, 1, 2, 3, 4)),
         exact AS (
           SELECT query_id, v.vec_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY ${sqlQcos("qv", "v.q")} DESC, v.vec_id) AS rank
           FROM v JOIN qs ON v.vec_id <> qs.query_id),
         approx AS (
           SELECT query_id, v8.vec_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY list_sum(list_transform(range(1, 65),
                      i -> qv[i] * v8.q[i])) DESC, v8.vec_id) AS rank
           FROM v8 JOIN qs8 ON v8.vec_id <> qs8.query_id)
         SELECT e.query_id,
                CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_hit,
                (1000 * CAST(sum(CASE WHEN a.vec_id IS NOT NULL
                                      THEN 1 ELSE 0 END) AS BIGINT))
                  // CAST(count(*) AS BIGINT) AS recall_permille
         FROM exact e
         LEFT JOIN approx a
           ON a.query_id = e.query_id AND a.vec_id = e.vec_id
              AND a.rank <= 10
         WHERE e.rank <= 10
         GROUP BY e.query_id ORDER BY e.query_id""",

    // Same lower-quantile rank arithmetic for p05/p95, same clip.
    "q161_winsorized" ->
      """WITH base AS (
           SELECT event_type AS grp, CAST(value AS DOUBLE) AS x
           FROM events
           WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
             AND isfinite(CAST(value AS DOUBLE))),
         n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
               FROM base GROUP BY grp),
         qs AS (SELECT CAST(unnest([0.05, 0.95]) AS DOUBLE) AS q),
         tgt AS (SELECT grp, q, CAST(floor((n - 1) * q) AS BIGINT) + 1 AS r
                 FROM n CROSS JOIN qs),
         ranked AS (SELECT grp, x,
                           row_number() OVER (PARTITION BY grp ORDER BY x)
                             AS rn
                    FROM base),
         cuts AS (SELECT t.grp,
                         min(CASE WHEN t.q = 0.05 THEN rk.x END) AS p05,
                         min(CASE WHEN t.q = 0.95 THEN rk.x END) AS p95
                  FROM tgt t JOIN ranked rk
                    ON rk.grp = t.grp AND rk.rn = t.r
                  GROUP BY t.grp)
         SELECT b.grp AS event_type,
                CAST(count(*) AS BIGINT) AS n,
                min(c.p05) AS p05, min(c.p95) AS p95,
                CAST(sum(CASE WHEN b.x < c.p05 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_clip_lo,
                CAST(sum(CASE WHEN b.x > c.p95 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_clip_hi,
                CAST(sum(CAST(least(greatest(b.x, c.p05), c.p95)
                              AS DECIMAL(18,3))) AS DOUBLE)
                  AS sum_winsorized
         FROM base b JOIN cuts c ON c.grp = b.grp
         GROUP BY b.grp ORDER BY event_type""",

    // Same (ts, event_id) total order (µs-floored parity per q60/q82),
    // same 12-event cap and comma rebuild.
    "q162_user_sequences" ->
      """WITH r AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                    AS n_total
           FROM events)
         SELECT user_id,
                string_agg(event_type, ',' ORDER BY rn) AS seq,
                CAST(count(*) AS BIGINT) AS seq_len,
                min(n_total) AS n_total
         FROM r WHERE rn <= 12
         GROUP BY user_id ORDER BY user_id""",

    // Same md5-prefix row sample (bottom-256 per flag), same
    // lower-quantile rank over (x, h).
    "q163_sample_quantiles" ->
      """WITH base AS (
           SELECT l_returnflag AS g,
                  ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                     CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS h,
                  CAST(l_extendedprice AS DOUBLE) AS x
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL),
         samp AS (
           SELECT g, h, x FROM (
             SELECT g, h, x,
                    row_number() OVER (PARTITION BY g ORDER BY h) AS rh
             FROM base)
           WHERE rh <= 256),
         m AS (SELECT g, CAST(count(*) AS BIGINT) AS n_sample
               FROM samp GROUP BY g),
         rx AS (SELECT g, x,
                       row_number() OVER (PARTITION BY g ORDER BY x, h)
                         AS rx
                FROM samp),
         qs AS (SELECT unnest([0.5, 0.9]) AS q)
         SELECT rx.g AS l_returnflag, CAST(qs.q AS DOUBLE) AS q,
                rx.x AS est_value, m.n_sample
         FROM rx JOIN m USING (g) CROSS JOIN qs
         WHERE rx.rx = CAST(floor((m.n_sample - 1) * CAST(qs.q AS DOUBLE))
                            AS BIGINT) + 1
         ORDER BY l_returnflag, q""",

    // Each stage re-derived from the green building-block oracles:
    // q38's marker-vote langID, q37's stopword ratio, q31's LSH pair
    // pipeline, q53's recursive min-label components.
    "q164_curation_funnel" ->
      s"""WITH RECURSIVE w AS (
           SELECT doc_id, text, string_split(text, ' ') AS w
           FROM documents),
         lang AS (
           SELECT doc_id FROM (
             SELECT doc_id,
                    greatest(
                      len(list_filter(w, x -> x IN ('the','a','of','and','is'))),
                      len(list_filter(w, x -> x IN ('der','die','das','und','ist'))),
                      len(list_filter(w, x -> x IN ('le','la','et','les','est'))),
                      len(list_filter(w, x -> x IN ('el','los','de','y','es'))))
                      AS best
             FROM w)
           WHERE best >= 1),
         s1 AS (SELECT w.* FROM w JOIN lang USING (doc_id)),
         qual AS (
           SELECT doc_id FROM s1
           WHERE len(list_filter(w, x -> x IN ('the','a','of','and','in','is')))::DOUBLE
                   / len(w) >= 0.04),
         s2 AS (SELECT s1.* FROM s1 JOIN qual USING (doc_id)),
         pairs AS (
           WITH docs AS (SELECT doc_id, $sqlWordShingles AS sh FROM s2),
           ${sqlLshPipeline(24, 4, 6, 0.8)}),
         edges AS (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs),
         reach(node, r) AS (
           SELECT a, a FROM edges
           UNION
           SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b),
         comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
         s3 AS (
           SELECT s2.doc_id FROM s2
           LEFT JOIN comp ON comp.node = s2.doc_id
           WHERE COALESCE(comp.component, s2.doc_id) = s2.doc_id)
         SELECT '0_all' AS stage, CAST(count(*) AS BIGINT) AS n_docs
         FROM documents
         UNION ALL SELECT '1_lang', CAST(count(*) AS BIGINT) FROM s1
         UNION ALL SELECT '2_quality', CAST(count(*) AS BIGINT) FROM s2
         UNION ALL SELECT '3_neardup', CAST(count(*) AS BIGINT) FROM s3
         ORDER BY stage""",

    // ECDFs on the union of observed values; cdf = integer-cum /
    // integer-n in one double division — deterministic; max|Δ| exact.
    "q165_ks_matrix" ->
      """WITH base AS (
           SELECT CAST(source AS VARCHAR) AS s, CAST(n_chars AS DOUBLE) AS x
           FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL),
         counts AS (
           SELECT s, x, CAST(count(*) AS BIGINT) AS c
           FROM base GROUP BY s, x),
         ns AS (SELECT s, CAST(sum(c) AS BIGINT) AS n
                FROM counts GROUP BY s),
         vals AS (SELECT DISTINCT x FROM counts),
         grid AS (
           SELECT ns.s, vals.x, ns.n, COALESCE(ct.c, 0) AS c
           FROM vals CROSS JOIN ns
           LEFT JOIN counts ct ON ct.s = ns.s AND ct.x = vals.x),
         cdf AS (
           SELECT s, x, n,
                  CAST(sum(c) OVER (PARTITION BY s ORDER BY x
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) / CAST(n AS DOUBLE) AS f
           FROM grid)
         SELECT a.s AS sample_a, b.s AS sample_b,
                max(abs(a.f - b.f)) AS ks_stat,
                min(a.n) AS n_a, min(b.n) AS n_b
         FROM cdf a JOIN cdf b ON a.x = b.x AND a.s < b.s
         GROUP BY 1, 2
         ORDER BY sample_a, sample_b""",

    // Same (ts, event_id) per-user order as q162; p_micro = one double
    // division of exact integers, floored.
    "q166_transitions" ->
      """WITH s AS (
           SELECT event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS f
           FROM events),
         c AS (
           SELECT f AS from_type, event_type AS to_type,
                  CAST(count(*) AS BIGINT) AS n_trans
           FROM s WHERE f IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n_trans,
                CAST(floor(1000000 * (CAST(n_trans AS DOUBLE) /
                     CAST(sum(n_trans) OVER (PARTITION BY from_type)
                          AS DOUBLE))) AS BIGINT) AS p_micro
         FROM c ORDER BY from_type, to_type""",

    // HHI from exact DECIMAL(19,0)² sums (width-legal in both engines);
    // every ratio is one double division of exact integers.
    "q167_mixture_report" ->
      """WITH counts AS (
           SELECT CAST(source AS VARCHAR) AS domain,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM documents GROUP BY 1),
         g AS (
           SELECT CAST(sum(n_rows) AS BIGINT) AS N,
                  sum(CAST(n_rows AS DECIMAL(19,0)) *
                      CAST(n_rows AS DECIMAL(19,0))) AS ssq
           FROM counts)
         SELECT domain, n_rows,
                CAST(floor(1000000 * (CAST(n_rows AS DOUBLE) /
                     CAST(N AS DOUBLE))) AS BIGINT) AS share_micro,
                CAST(ssq AS DOUBLE) /
                  (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)) AS hhi,
                (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)) /
                  CAST(ssq AS DOUBLE) AS effective_domains
         FROM counts CROSS JOIN g
         ORDER BY domain NULLS FIRST""",

    // Same trigram set and 60-bit digest as the engine; a LEFT JOIN
    // miss against the even-half reference set marks a novel gram.
    "q168_ngram_novelty" ->
      s"""WITH probe0 AS (
           SELECT doc_id, string_split(text, ' ') AS w
           FROM documents WHERE doc_id % 2 = 1),
         ref0 AS (
           SELECT doc_id, string_split(text, ' ') AS w
           FROM documents WHERE doc_id % 2 = 0),
         refset AS (
           SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
           FROM (SELECT unnest(${sqlWordShinglesN(3)}) AS g
                 FROM (SELECT w FROM ref0))),
         pr AS (
           SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id, unnest(${sqlWordShinglesN(3)}) AS g
                 FROM (SELECT doc_id, w FROM probe0)))
         SELECT pr.doc_id,
                CAST(count(*) AS BIGINT) AS n_ngrams,
                CAST(sum(CASE WHEN r.h IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_novel,
                (1000 * CAST(sum(CASE WHEN r.h IS NULL THEN 1 ELSE 0 END)
                             AS BIGINT)) // CAST(count(*) AS BIGINT)
                  AS novelty_permille
         FROM pr LEFT JOIN refset r ON r.h = pr.h
         GROUP BY pr.doc_id
         ORDER BY pr.doc_id""",

    // Moments in exact DECIMAL(38,4) (products of ≤2-decimal inputs
    // are exactly 4-decimal; the double product is within half an ulp
    // of that grid, so both engines' rounding recovers the true
    // value); the r formula is a fixed double tree over those sums.
    "q169_corr_matrix" ->
      s"""WITH c AS (
           SELECT l_quantity AS x1, l_extendedprice AS x2,
                  l_discount AS x3, l_tax AS x4
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  ${Seq(1, 2, 3, 4).map(i =>
                    s"sum(CAST(x$i AS DECIMAL(38,4))) AS s$i, " +
                    s"sum(CAST(x$i*x$i AS DECIMAL(38,4))) AS q$i")
                    .mkString(", ")},
                  ${Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
                    .map { case (i, j) =>
                      s"sum(CAST(x$i*x$j AS DECIMAL(38,4))) AS p$i$j" }
                    .mkString(", ")}
           FROM c)
         ${sqlCorrPairs.mkString("\n         UNION ALL ")}
         ORDER BY col_a, col_b""",

    // Each side is the q128 profile with a snapshot predicate; deltas
    // and means are fixed double arithmetic over exact components.
    "q170_profile_drift" ->
      s"""WITH pa AS (
           ${sqlProfileSide("o_orderdate < TIMESTAMP '1998-01-01'")}),
         pb AS (
           ${sqlProfileSide("o_orderdate >= TIMESTAMP '1998-01-01'")})
         SELECT pa.col_name,
                pa.n_rows AS n_rows_a, pb.n_rows AS n_rows_b,
                (1000 * pa.n_nulls) // pa.n_rows AS null_permille_a,
                (1000 * pb.n_nulls) // pb.n_rows AS null_permille_b,
                pb.n_distinct - pa.n_distinct AS distinct_delta,
                pa.sum_v / CAST(pa.n_rows - pa.n_nulls AS DOUBLE) AS mean_a,
                pb.sum_v / CAST(pb.n_rows - pb.n_nulls AS DOUBLE) AS mean_b,
                pb.min_v - pa.min_v AS min_delta,
                pb.max_v - pa.max_v AS max_delta
         FROM pa JOIN pb USING (col_name)
         ORDER BY col_name""",

    // Two independent 32-dim Lloyd chains (the q51 recipe per slice),
    // then per-vector (d2, cluster) argmin per subspace — identical
    // init (k smallest vec_ids), identical floored-mean update,
    // identical tie-break.
    "q172_pq_encode" ->
      s"""WITH $sqlPqChain
         SELECT vec_id, code_0, err2_0, code_1, err2_1
         FROM enc0 JOIN enc1 USING (vec_id)
         ORDER BY vec_id""",

    // Same trained chain as q172, then per-query distance tables
    // (query slice × codebook) and scoring by table JOIN on the code —
    // the SQL mirror of ADC's element_at lookup.
    "q173_pq_adc_topk" ->
      s"""WITH $sqlPqChain,
         qt0 AS (
           SELECT e.vec_id AS query_id, c.cluster AS code,
                  ${sqlListD2("e.v", "c.cv", 32)} AS d
           FROM e0 e CROSS JOIN s0c2 c WHERE e.vec_id IN (0,1,2,3,4)),
         qt1 AS (
           SELECT e.vec_id AS query_id, c.cluster AS code,
                  ${sqlListD2("e.v", "c.cv", 32)} AS d
           FROM e1 e CROSS JOIN s1c2 c WHERE e.vec_id IN (0,1,2,3,4)),
         scored AS (
           SELECT q0.query_id, en.vec_id, q0.d + q1.d AS d2_adc,
                  row_number() OVER (PARTITION BY q0.query_id
                                     ORDER BY q0.d + q1.d, en.vec_id)
                    AS rank
           FROM (SELECT * FROM enc0 JOIN enc1 USING (vec_id)) en
           JOIN qt0 q0 ON q0.code = en.code_0
           JOIN qt1 q1 ON q1.query_id = q0.query_id
                      AND q1.code = en.code_1
           WHERE en.vec_id <> q0.query_id)
         SELECT query_id, rank, vec_id, d2_adc FROM scored
         WHERE rank <= 10 ORDER BY query_id, rank""",

    // Byte-offset packing: a file's bin is the 10 kB-aligned range its
    // cumulative START offset falls in — pure window arithmetic, the
    // exact expression compactionPlan computes.
    "q174_compaction_plan" ->
      """WITH f AS (
           SELECT source, doc_id, n_chars,
                  sum(CAST(n_chars AS BIGINT)) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
           FROM documents),
         b AS (
           SELECT source, doc_id, n_chars,
                  CAST((cum - CAST(n_chars AS BIGINT)) // 10000 AS BIGINT)
                    AS bin
           FROM f)
         SELECT source, doc_id, n_chars, bin,
                CAST(count(*) OVER (PARTITION BY source, bin) AS BIGINT)
                  AS bin_files,
                CAST(sum(CAST(n_chars AS BIGINT))
                       OVER (PARTITION BY source, bin) AS BIGINT)
                  AS bin_bytes
         FROM b ORDER BY source, doc_id""",

    // Same int8 grid; two rankings (dot desc / L2 asc) fused by integer
    // reciprocal-rank: Σ 1000000 // (60 + rank) over the top-20 lists.
    "q175_rrf_fusion" ->
      """WITH v AS (
           SELECT vec_id,
                  [greatest(-128, least(127,
                     CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)))
                   for x in embedding] AS q
           FROM embeddings),
         qs AS (SELECT vec_id AS query_id, q AS qv FROM v
                WHERE vec_id IN (0, 1, 2)),
         pairs AS (
           SELECT query_id, v.vec_id,
                  CAST(list_sum(list_transform(range(1, 65),
                    i -> qv[i] * v.q[i])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(range(1, 65),
                    i -> (qv[i] - v.q[i]) * (qv[i] - v.q[i]))) AS BIGINT)
                    AS d2
           FROM v JOIN qs ON v.vec_id <> qs.query_id),
         ranked AS (
           SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, vec_id) AS r_dot,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY d2 ASC, vec_id) AS r_l2
           FROM pairs),
         contrib AS (
           SELECT query_id, vec_id, 1000000 // (60 + r_dot) AS c
           FROM ranked WHERE r_dot <= 20
           UNION ALL
           SELECT query_id, vec_id, 1000000 // (60 + r_l2) AS c
           FROM ranked WHERE r_l2 <= 20),
         fused AS (
           SELECT query_id, vec_id, CAST(sum(c) AS BIGINT) AS rrf,
                  CAST(count(*) AS BIGINT) AS n_lists
           FROM contrib GROUP BY query_id, vec_id),
         final AS (
           SELECT query_id, vec_id, rrf, n_lists,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf DESC, n_lists DESC, vec_id) AS rank
           FROM fused)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, rrf,
                n_lists
         FROM final WHERE rank <= 10
         ORDER BY query_id, rank""",

    // Same md5-threshold bucketing as q54, keyed on the GROUP column.
    // 0.8/0.1/0.1 → cumulative hex bounds cccc / e666.
    "q176_group_split" ->
      """WITH s AS (
           SELECT source, n_chars,
                  CASE WHEN substr(md5(source), 1, 4) < 'cccc' THEN 'train'
                       WHEN substr(md5(source), 1, 4) < 'e666' THEN 'valid'
                       ELSE 'test' END AS split
           FROM documents)
         SELECT split, CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM s GROUP BY split ORDER BY split""",

    // Same driver-computed vnode rings (md5 60-bit positions) as
    // VALUES literals; clockwise distance argmin per key; min_by is
    // total because ring positions are required distinct.
    "q177_shard_plan" ->
      s"""WITH d AS (
           SELECT doc_id,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS kh
           FROM documents),
         r8(vh, s) AS (VALUES ${sqlRing(8, 16)}),
         r9(vh, s) AS (VALUES ${sqlRing(9, 16)}),
         g8 AS (
           SELECT doc_id, min_by(s, (vh - kh + 1152921504606846976) %
                  1152921504606846976) AS ring8
           FROM d CROSS JOIN r8 GROUP BY doc_id),
         g9 AS (
           SELECT doc_id, min_by(s, (vh - kh + 1152921504606846976) %
                  1152921504606846976) AS ring9
           FROM d CROSS JOIN r9 GROUP BY doc_id),
         per AS (
           SELECT d.doc_id, d.doc_id % 8 AS m8, d.doc_id % 9 AS m9,
                  ring8, ring9
           FROM d JOIN g8 USING (doc_id) JOIN g9 USING (doc_id)),
         mods AS (
           SELECT m8 AS shard, CAST(count(*) AS BIGINT) AS n_mod,
                  CAST(sum(CASE WHEN m8 <> m9 THEN 1 ELSE 0 END)
                    AS BIGINT) AS mod_moved
           FROM per GROUP BY m8),
         rings AS (
           SELECT CAST(ring8 AS BIGINT) AS shard,
                  CAST(count(*) AS BIGINT) AS n_ring,
                  CAST(sum(CASE WHEN ring8 <> ring9 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ring_moved
           FROM per GROUP BY ring8)
         SELECT shard, CAST(COALESCE(n_mod, 0) AS BIGINT) AS n_mod,
                CAST(COALESCE(mod_moved, 0) AS BIGINT) AS mod_moved,
                CAST(COALESCE(n_ring, 0) AS BIGINT) AS n_ring,
                CAST(COALESCE(ring_moved, 0) AS BIGINT) AS ring_moved
         FROM mods FULL JOIN rings USING (shard) ORDER BY shard""",

    // Stepped dyadic half-life: 1000 // 2^(age_days div 7), capped at
    // 20 half-lives, anchored to max(ts) — exact integer milli-units.
    "q178_decayed_counts" ->
      """WITH a AS (SELECT max(ts) AS anchor FROM events),
         w AS (
           SELECT event_type,
                  1000 // (1 << least(
                    CAST(date_diff('day', CAST(ts AS DATE),
                      CAST(anchor AS DATE)) AS BIGINT) // 7, 20)) AS w
           FROM events CROSS JOIN a
           WHERE ts IS NOT NULL)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(w) AS BIGINT) AS decayed_milli
         FROM w GROUP BY event_type ORDER BY event_type""",

    // Same simulated next-day snapshot; full-outer classification with
    // IS DISTINCT FROM (the engine's <=>), per-column change counts.
    "q179_snapshot_diff" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
           FROM orders),
         n AS (
           SELECT o_orderkey, o_custkey,
                  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS o_totalprice,
                  CASE WHEN o_orderkey % 5 = 0 THEN 'X'
                       ELSE o_orderstatus END AS o_orderstatus
           FROM orders WHERE o_orderkey % 13 <> 0
           UNION ALL
           SELECT o_orderkey + 10000000, o_custkey, o_totalprice,
                  o_orderstatus
           FROM orders WHERE o_orderkey % 11 = 0),
         j AS (
           SELECT o.o_orderkey AS ka, n.o_orderkey AS kb,
                  o.o_custkey AS ac, n.o_custkey AS bc,
                  o.o_totalprice AS ap, n.o_totalprice AS bp,
                  o.o_orderstatus AS astat, n.o_orderstatus AS bstat
           FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
         SELECT metric, n FROM (
           SELECT 'added' AS metric,
                  CAST(count(*) FILTER (WHERE ka IS NULL) AS BIGINT) AS n
           FROM j
           UNION ALL
           SELECT 'removed',
                  CAST(count(*) FILTER (WHERE kb IS NULL) AS BIGINT)
           FROM j
           UNION ALL
           SELECT 'rows_changed',
                  CAST(count(*) FILTER (WHERE ka IS NOT NULL
                    AND kb IS NOT NULL
                    AND (ac IS DISTINCT FROM bc OR ap IS DISTINCT FROM bp
                         OR astat IS DISTINCT FROM bstat)) AS BIGINT)
           FROM j
           UNION ALL
           SELECT 'rows_same',
                  CAST(count(*) FILTER (WHERE ka IS NOT NULL
                    AND kb IS NOT NULL
                    AND NOT (ac IS DISTINCT FROM bc
                         OR ap IS DISTINCT FROM bp
                         OR astat IS DISTINCT FROM bstat)) AS BIGINT)
           FROM j
           UNION ALL
           SELECT 'col_changed:o_custkey',
                  CAST(count(*) FILTER (WHERE ka IS NOT NULL
                    AND kb IS NOT NULL AND ac IS DISTINCT FROM bc)
                    AS BIGINT)
           FROM j
           UNION ALL
           SELECT 'col_changed:o_totalprice',
                  CAST(count(*) FILTER (WHERE ka IS NOT NULL
                    AND kb IS NOT NULL AND ap IS DISTINCT FROM bp)
                    AS BIGINT)
           FROM j
           UNION ALL
           SELECT 'col_changed:o_orderstatus',
                  CAST(count(*) FILTER (WHERE ka IS NOT NULL
                    AND kb IS NOT NULL AND astat IS DISTINCT FROM bstat)
                    AS BIGINT)
           FROM j)
         ORDER BY metric""",

    // Same integer milli-epoch plan: floor division, 2000-milli cap,
    // uniform 50-milli shares over the 20 sources.
    "q180_epoch_schedule" ->
      s"""WITH tok AS (
           SELECT source,
                  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                    AS BIGINT) AS tokens
           FROM documents GROUP BY source),
         sh(source, share_milli) AS (VALUES ${
             (0 until 20).map(i => s"('src$i', 50)").mkString(", ")})
         SELECT t.source, tokens, CAST(share_milli AS BIGINT) AS share_milli,
                CAST(least(2000, (50000 * share_milli) // tokens)
                  AS BIGINT) AS epochs_milli,
                CAST((tokens * least(2000, (50000 * share_milli) //
                  tokens)) // 1000 AS BIGINT) AS planned_tokens
         FROM tok t JOIN sh USING (source)
         ORDER BY source""",

    // Same stride arithmetic: vt = rank·1e6 // share, schedule =
    // ascending (vt, source, doc_id); unlisted sources dropped.
    "q181_stride_interleave" ->
      s"""WITH w(source, wm) AS (VALUES ${
             (Seq("src0" -> 200, "src1" -> 200) ++
               (2 until 10).map(i => s"src$i" -> 50))
               .map { case (d, m) => s"('$d', $m)" }.mkString(", ")}),
         r AS (
           SELECT doc_id, d.source, wm,
                  row_number() OVER (PARTITION BY d.source
                                     ORDER BY doc_id) AS rk
           FROM documents d JOIN w USING (source)),
         v AS (SELECT doc_id, source,
                      CAST((rk * 1000000) // wm AS BIGINT) AS vtime
               FROM r)
         SELECT doc_id, source, vtime,
                CAST(row_number() OVER (ORDER BY vtime, source, doc_id)
                  AS BIGINT) AS sched_pos
         FROM v ORDER BY sched_pos""",

    // Candidates from q33's band chain; ground truth from the complete
    // shared-shingle blocking, verified at the same threshold. Same
    // doc_id < 400 sample prefix as the engine (the ground truth is
    // quadratic — sample-only by contract).
    "q182_lsh_recall_eval" ->
      s"""WITH docs AS (
           SELECT doc_id, ${sqlCharShingles(5)} AS sh FROM documents
           WHERE doc_id < 400),
         sigs AS (SELECT doc_id, ${sqlSig(36)} AS sig FROM docs),
         bands AS (SELECT doc_id, ${sqlBandUnnest(4, 9)} AS band FROM sigs),
         cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.doc_id < y.doc_id),
         sh1 AS (SELECT doc_id, unnest(sh) AS s FROM docs),
         excand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM sh1 x JOIN sh1 y ON x.s = y.s AND x.doc_id < y.doc_id),
         ex AS (
           SELECT doc_a, doc_b FROM (
             SELECT c.doc_a, c.doc_b,
                    len(list_intersect(da.sh, db.sh))::DOUBLE /
                    len(list_distinct(list_concat(da.sh, db.sh))) AS j
             FROM excand c
             JOIN docs da ON c.doc_a = da.doc_id
             JOIN docs db ON c.doc_b = db.doc_id)
           WHERE j >= 0.5),
         ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex),
         nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
         nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
                FROM ex JOIN cand USING (doc_a, doc_b))
         SELECT n_exact, n_cand, n_hit,
                CASE WHEN n_exact = 0 THEN NULL
                     ELSE (1000 * n_hit) // n_exact END AS recall_milli,
                CASE WHEN n_cand = 0 THEN NULL
                     ELSE (1000 * n_hit) // n_cand END AS efficiency_milli
         FROM ne, nc, nh""",

    // Same (ts, event_id)-ordered lag construction per user; global
    // count; (count desc, gram) top-10.
    "q189_event_trigrams" ->
      """WITH g AS (
           SELECT concat_ws('>', lag(event_type, 2) OVER w,
                    lag(event_type, 1) OVER w, event_type) AS gram,
                  lag(event_type, 2) OVER w AS l2,
                  lag(event_type, 1) OVER w AS l1
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences
         FROM g WHERE l2 IS NOT NULL AND l1 IS NOT NULL
         GROUP BY gram ORDER BY n_occurrences DESC, gram LIMIT 10""",

    // Same integer midrank formula: 2·rank + tie_count − 1, floor
    // division to micro units.
    "q190_auc_quality" ->
      """WITH b AS (
           SELECT (lang = 'en') AS y, CAST(n_chars AS DOUBLE) AS s
           FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
         r AS (
           SELECT y, 2 * rank() OVER (ORDER BY s)
                     + count(*) OVER (PARTITION BY s) - 1 AS r2
           FROM b),
         a AS (
           SELECT CAST(sum(CASE WHEN y THEN r2 ELSE 0 END) AS BIGINT)
                    AS rsum,
                  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_pos,
                  CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_neg
           FROM r)
         SELECT n_pos, n_neg,
                CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                     ELSE ((rsum - n_pos * (n_pos + 1)) * 1000000)
                          // (2 * n_pos * n_neg) END AS BIGINT)
                  AS auc_micro
         FROM a""",

    // Same bottom-k selection: row_number over (md5(id), id) per
    // source, kept at rank <= 5.
    "q188_group_sample" ->
      """SELECT doc_id, source, n_chars, smp_rank FROM (
           SELECT doc_id, source, n_chars,
                  CAST(row_number() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                    AS BIGINT) AS smp_rank
           FROM documents)
         WHERE smp_rank <= 5
         ORDER BY source, smp_rank""",

    // q34's hyperplane-band chain without label blocking, split into
    // corpus/benchmark sides; per-corpus-vector hit rollup.
    "q187_semantic_decontam" ->
      s"""WITH e AS (SELECT vec_id, $sqlQuantize AS q FROM embeddings),
         sig AS (
           SELECT vec_id,
                  [CASE WHEN list_sum(list_transform(range(0, 64),
                         i -> q[i+1] * (('0x' || substr(md5(j::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT % 2001 - 1000))) > 0
                        THEN '1' ELSE '0' END for j in range(0, 16)] AS bits
           FROM e),
         bands AS (
           SELECT vec_id,
                  unnest([g::VARCHAR || ':' || array_to_string(bits[g*4+1:g*4+4], '') for g in range(0, 4)]) AS band
           FROM sig),
         cand AS (
           SELECT DISTINCT c.vec_id AS cid, b.vec_id AS bid
           FROM bands c JOIN bands b ON c.band = b.band
           WHERE c.vec_id >= 100 AND b.vec_id < 100),
         hits AS (
           SELECT cid, ${sqlQcos("ec.q", "eb.q")} AS cosine
           FROM cand
           JOIN e ec ON cand.cid = ec.vec_id
           JOIN e eb ON cand.bid = eb.vec_id)
         SELECT cid AS vec_id, CAST(count(*) AS BIGINT) AS n_hits,
                max(cosine) AS max_cosine
         FROM hits WHERE cosine >= 0.3
         GROUP BY cid ORDER BY vec_id""",

    // Same integer tf·group-idf scoring and (score, token) tie-break.
    "q186_source_terms" ->
      """WITH tf AS (
           SELECT source, t AS token, CAST(count(*) AS BIGINT) AS tfv
           FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                 FROM documents)
           WHERE length(t) >= 4
           GROUP BY source, t),
         ng AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS _ng
                FROM documents),
         gdf AS (SELECT token, CAST(count(*) AS BIGINT) AS group_df
                 FROM tf GROUP BY token),
         scored AS (
           SELECT source, tf.token, tfv, group_df,
                  tfv * ((1000000 * _ng) // group_df) AS score
           FROM tf JOIN gdf USING (token) CROSS JOIN ng),
         ranked AS (
           SELECT source, token, tfv, group_df, score,
                  row_number() OVER (PARTITION BY source
                    ORDER BY score DESC, token) AS rnk
           FROM scored)
         SELECT source, token, tfv AS tf, group_df,
                CAST(score AS BIGINT) AS score, CAST(rnk AS BIGINT) AS rnk
         FROM ranked WHERE rnk <= 3 ORDER BY source, rnk""",

    // q111's rank-selection MAD chain over a derived hourly-rate CTE.
    "q184_hourly_anomaly" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS hr,
                  CAST(count(*) AS DOUBLE) AS n
           FROM events GROUP BY event_type, date_trunc('hour', ts)),
         ranked AS (
           SELECT event_type, n,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY n) AS rnk,
                  count(*) OVER (PARTITION BY event_type) AS cnt
           FROM hourly),
         med AS (
           SELECT event_type, n AS med FROM ranked
           WHERE rnk = CAST(floor((cnt - 1) * 0.5) AS BIGINT) + 1),
         dev AS (
           SELECT h.event_type, abs(h.n - m.med) AS adev, m.med
           FROM hourly h JOIN med m USING (event_type)),
         dranked AS (
           SELECT event_type, adev,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY adev) AS rnk,
                  count(*) OVER (PARTITION BY event_type) AS cnt
           FROM dev),
         mad AS (
           SELECT event_type, adev AS mad FROM dranked
           WHERE rnk = CAST(floor((cnt - 1) * 0.5) AS BIGINT) + 1)
         SELECT d.event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                max(d.med) AS median_value,
                max(mm.mad) AS mad,
                CAST(sum(CASE WHEN d.adev > 3.0 * mm.mad THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_outliers
         FROM dev d JOIN mad mm USING (event_type)
         GROUP BY d.event_type
         ORDER BY d.event_type""",

    // q46's quality formula + q137's rank-permille, grouped by source.
    "q185_calibrated_gate" ->
      """WITH q AS (
           SELECT doc_id, source,
                  least(len(w) / 64.0, 1.0) * 0.4 +
                  (len(list_distinct(w))::DOUBLE / len(w)) * 0.4 +
                  least((len(list_filter(w, x -> x IN
                    ('the','a','of','and','in','is')))::DOUBLE / len(w))
                    * 4.0, 1.0) * 0.2 AS quality
           FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents)),
         pr AS (
           SELECT source, quality,
                  CASE WHEN count(*) OVER g = 1 THEN 0
                       ELSE (1000 * (rank() OVER w - 1))
                            // (count(*) OVER g - 1) END AS prank_milli
           FROM q
           WINDOW w AS (PARTITION BY source ORDER BY quality),
                  g AS (PARTITION BY source))
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN prank_milli >= 500 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept,
                min(CASE WHEN prank_milli >= 500 THEN quality END)
                  AS min_kept_quality
         FROM pr GROUP BY source ORDER BY source""",

    // q53's recursive components, folded to a size census.
    "q183_dup_cluster_census" ->
      s"""$componentsCtes,
         comps AS (SELECT node, min(r) AS component
                   FROM reach GROUP BY node),
         sizes AS (SELECT component, CAST(count(*) AS BIGINT)
                     AS cluster_size
                   FROM comps GROUP BY component)
         SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                CAST(cluster_size * count(*) AS BIGINT) AS n_docs
         FROM sizes GROUP BY cluster_size ORDER BY cluster_size"""
  )

  /** The q172/q173 shared oracle prefix: quantized subspace slices,
    * two independent Lloyd chains (the q51 recipe per slice), and the
    * per-vector code assignment for the whole corpus. */
  private lazy val sqlPqChain: String =
    s"""e0 AS (
           SELECT vec_id, ${sqlQuantizeSlice(1, 32)} AS v FROM embeddings),
         e1 AS (
           SELECT vec_id, ${sqlQuantizeSlice(33, 64)} AS v FROM embeddings),
         s0c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                  v AS cv
           FROM (SELECT vec_id, v FROM e0 ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIterSub("e0", "s0c0", "s0c1", 32)},
         ${sqlLloydIterSub("e0", "s0c1", "s0c2", 32)},
         s1c0 AS (
           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                  v AS cv
           FROM (SELECT vec_id, v FROM e1 ORDER BY vec_id LIMIT 8)),
         ${sqlLloydIterSub("e1", "s1c0", "s1c1", 32)},
         ${sqlLloydIterSub("e1", "s1c1", "s1c2", 32)},
         ${sqlPqAssign("e0", "s0c2", "enc0", "code_0", "err2_0", 32)},
         ${sqlPqAssign("e1", "s1c2", "enc1", "code_1", "err2_1", 32)}"""

  /** Integer squared L2 between two quantized list expressions. CAST
    * to BIGINT: DuckDB's list_sum over BIGINT elements yields HUGEINT,
    * whose python-side dtype conversion varies across duckdb builds
    * (r7 driver-hash divergence suspect #2 — q175, which casts, passed
    * driver-side; q173, which didn't, hash-mismatched). */
  private def sqlListD2(a: String, b: String, dim: Int) =
    s"CAST(list_sum([($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1]) for i in range(0, $dim)]) AS BIGINT)"

  /** Quantized 1-based-inclusive slice [lo, hi] of the embedding —
    * [[sqlQuantize]] over a sub-range. Deliberately indexes element by
    * element via list_transform(range(...)) (the driver-proven q175
    * idiom) instead of `embedding[lo:hi]` slice syntax, whose edge
    * semantics have shifted across DuckDB builds (r7 driver-hash
    * divergence suspect #1). */
  private def sqlQuantizeSlice(lo: Int, hi: Int) =
    s"""list_transform(range($lo, ${hi + 1}),
          i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT))"""

  /** [[sqlLloydIter]] generalized to an arbitrary vectors CTE and
    * dimensionality (the per-subspace PQ training step). */
  private def sqlLloydIterSub(eCte: String, prev: String, next: String,
                              dim: Int) =
    s"""a_$next AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c.cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) for i in range(0, $dim)]),
                               c.cluster) AS rn
             FROM $eCte e CROSS JOIN $prev c)
           WHERE rn = 1),
         m_$next AS (
           SELECT cluster, i,
                  CAST(floor(CAST(sum(v[i+1]) AS DOUBLE) / count(*)) AS BIGINT) AS m
           FROM a_$next, range(0, $dim) t(i)
           GROUP BY cluster, i),
         $next AS (
           SELECT p.cluster, coalesce(mm.cv, p.cv) AS cv
           FROM $prev p
           LEFT JOIN (SELECT cluster, list(m ORDER BY i) AS cv
                      FROM m_$next GROUP BY cluster) mm
             ON p.cluster = mm.cluster)"""

  /** Per-vector nearest-codeword pick for one PQ subspace: (d2,
    * cluster) argmin over the trained codebook. */
  private def sqlPqAssign(eCte: String, cbCte: String, outCte: String,
                          codeName: String, errName: String, dim: Int) =
    s"""$outCte AS (
           SELECT vec_id, cluster AS $codeName,
                  CAST(d2 AS BIGINT) AS $errName FROM (
             SELECT vec_id, cluster, d2,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cluster) AS rn
             FROM (SELECT e.vec_id, c.cluster,
                          list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) for i in range(0, $dim)]) AS d2
                   FROM $eCte e CROSS JOIN $cbCte c))
           WHERE rn = 1)"""

  /** q170's per-side profile CTE body (q128's column-profile mirror
    * with a snapshot predicate). */
  private def sqlProfileSide(pred: String): String =
    Seq("o_orderkey", "o_custkey", "o_totalprice").map { c =>
      s"""SELECT '$c' AS col_name,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
                 CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
                 CAST(min($c) AS DOUBLE) AS min_v,
                 CAST(max($c) AS DOUBLE) AS max_v,
                 CAST(sum(CAST($c AS DECIMAL(18,3))) AS DOUBLE) AS sum_v
          FROM orders WHERE $pred"""
    }.mkString(" UNION ALL ")

  /** q169's six per-pair SELECTs over the 1-row moment CTE `m`: the
    * textbook corrected-moment formula, every factor CAST from the
    * exact decimal sum to DOUBLE first (mirrors Stats.corrMatrix's
    * expression tree token for token). */
  private def sqlCorrPairs: Seq[String] = {
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def d(e: String) = s"CAST($e AS DOUBLE)"
    Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)).map { case (i, j) =>
      s"""SELECT '${names(i - 1)}' AS col_a, '${names(j - 1)}' AS col_b, n,
            (${d("n")} * ${d(s"p$i$j")} - ${d(s"s$i")} * ${d(s"s$j")}) /
            (sqrt(${d("n")} * ${d(s"q$i")} - ${d(s"s$i")} * ${d(s"s$i")}) *
             sqrt(${d("n")} * ${d(s"q$j")} - ${d(s"s$j")} * ${d(s"s$j")}))
              AS corr FROM m"""
    }
  }

  /** q151/q152's derived PII text — the DuckDB mirror of [[piiDocs]].
    * (defs, not vals: referenced from the oracle map's initializer
    * above their definition site.) */
  private def sqlPiiDocs =
    """SELECT doc_id,
         text || ' user' || CAST(doc_id AS VARCHAR) || '@mail.com' ||
         CASE WHEN doc_id % 3 = 0
              THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                   || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
              ELSE '' END ||
         CASE WHEN doc_id % 7 = 0
              THEN ' id 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END AS text
       FROM documents"""

  /** RE2 count of one [[TextAnalysis.PiiPatterns]] entry — the same
    * pattern literal the engine compiles (single source of truth). */
  private def sqlPiiCount(kind: String): String = {
    val pat = graft.operators.TextAnalysis.PiiPatterns.toMap.apply(kind)
    s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT)"
  }

  /** Chained global replaces mirroring [[TextAnalysis.piiRedact]]'s
    * fold order. */
  private def sqlPiiRedacted: String =
    graft.operators.TextAnalysis.PiiPatterns.foldLeft("text") {
      case (acc, (kind, pat)) =>
        s"regexp_replace($acc, '$pat', " +
          s"'<${kind.toUpperCase(java.util.Locale.ROOT)}>', 'g')"
    }
}
