package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Bpe, Cdc, Curation, DataQuality, Dedup, Events, FuzzyJoin, Graph, Layout, Multimodal, Pq, RangeJoin, Reconcile, Search, Similarity, Sketch, Stats, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** Curation and layout queries: sampling, splits, mixtures, epochs, packing, calibration, joins (as-of, fuzzy, range, salted), CDC/SCD2, layout planning (zone maps, compaction, shards), and the DSV2 connector contracts.
  *
  * One of five domain slices of the former single-file
  * PipelineQueries (r16 split, VERDICT item 7) — entries are
  * verbatim; [[PipelineQueries]] aggregates the maps back into the
  * driver-facing surface. */
private[queries] object PipelineCurationQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q115: domain-mixture resampling to 40/30/20/10 over four
    // sources — thresholds derived in-plan from observed counts,
    // md5-prefix acceptance, unlisted domains dropped.
    "q115_mixture_sample" -> ((s, dir) => {
      Curation.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
        Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))
        .select("doc_id", "source")
        .orderBy("doc_id")
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

    // q92: weighted Bernoulli sampling (Curation.weightedSample) —
    // keep probability ∝ n_chars, pure integer inclusion test, no RNG.
    "q92_weighted_sample" -> ((s, dir) => {
      Curation.weightedSample(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars")
        .orderBy("doc_id")
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

    // Salted two-phase aggregation over a skewable key.
    "q45_salted_agg" -> ((s, dir) => {
      Events.saltedSum(t(s, dir, "events"), "user_id",
        col("value").cast("decimal(18,3)"), 8)
        .orderBy("user_id")
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

    // Deterministic PPS sampling: expected ~100 docs kept with
    // probability ∝ n_chars — the compute-budgeted subset that weights
    // token mass, not document count; md5-threshold acceptance, no RNG.
    "q155_pps_sample" -> ((s, dir) => {
      Curation.ppsSample(t(s, dir, "documents"), "doc_id", "n_chars",
        k = 100)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
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

    // SOURCE-MIXTURE CONCENTRATION: per-source shares + HHI +
    // effective-source count. Entropy deliberately absent (ln is not
    // cross-engine exact — see the operator doc).
    "q167_mixture_report" -> ((s, dir) => {
      Curation.mixtureConcentration(t(s, dir, "documents"), "source")
        .orderBy("domain")
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

    // Per-source inspection sample: exactly 5 docs per source by
    // bottom-k md5 order — deterministic, insertion-monotone.
    "q188_group_sample" -> ((s, dir) => {
      Curation.groupSample(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"),
          "source", "doc_id", k = 5)
        .orderBy("source", "smp_rank")
    }),

    // Domain fingerprints: top-3 distinctive tokens per source by
    // integer tf·idf over GROUP document frequency.
    "q186_source_terms" -> ((s, dir) => {
      Search.distinctiveTerms(t(s, dir, "documents"), "source", "text",
          k = 3, minLen = 4)
        .orderBy("source", "rnk")
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

    // SOURCE-OVERLAP MATRIX: pairwise vocabulary Jaccard between the
    // five crawl sources from ONE KMV sketch per source — sketch-sized
    // pairwise math, single corpus pass.
    "q201_source_overlap" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      Sketch.kmvOverlapMatrix(toks, "source", col("tok"), k = 128)
        .orderBy("ga", "gb")
    }),

    // JOIN-AMPLIFICATION AUDIT: top-20 lineitem⋈lineitem partkey hot
    // keys from two count aggregates — the pre-join skew report.
    "q205_join_amplification" -> ((s, dir) => {
      // cast at the call site: the operator keeps native key types
      val li = t(s, dir, "lineitem")
        .withColumn("_k", col("l_partkey").cast("long"))
      Layout.joinAmplification(li, "_k", li, "_k", k = 20)
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

  val oracleSql: Map[String, String] = Map(

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

    // Same integer inclusion test: top-40 hash bits × max weight vs
    // 2^40 × row weight.
    "q92_weighted_sample" ->
      """WITH w AS (SELECT max(n_chars) AS maxw FROM documents)
         SELECT doc_id, n_chars
         FROM documents, w
         WHERE (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                // 1048576) * maxw < 1099511627776 * n_chars
         ORDER BY doc_id""",

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

    "q45_salted_agg" ->
      """SELECT user_id,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS total_value,
                count(*) AS n_events
         FROM events
         GROUP BY user_id
         ORDER BY user_id""",

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
         FROM pr GROUP BY source ORDER BY source"""
  )
}
