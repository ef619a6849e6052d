package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators (engine extensions beyond the
  * reference — SURVEY.md §2.8 "not present" list): event-time windows,
  * gap-based sessionization, JSON property extraction, and a salted
  * two-phase aggregation for skewed keys. Streaming twins live in
  * [[graft.streaming]].
  */
object Events {

  /** Tumbling event-time window aggregation. One shuffle on
    * (window, event_type); partial aggregation runs map-side. At scale
    * the input would be date-partitioned so the window key aligns with
    * partition pruning. */
  def tumblingCounts(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,3)")).cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization: a session breaks after `gapMinutes` of
    * user inactivity. Two window passes over the same (user_id, ts)
    * partitioning — Spark reuses the exchange, so it is one shuffle.
    *
    * Session bounds are emitted as epoch-MICROSECOND bigints, never raw
    * timestamps: the source parquet is TIMESTAMP(NANOS), and an engine
    * that reads nanos natively would disagree with one that truncates at
    * load in the sub-µs digits. unix_micros (Spark) ≡ epoch_us (DuckDB)
    * pins both sides to the same integer. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    val prev = lag(expr("unix_micros(ts)"), 1).over(byUser)
    val isNew = when(prev.isNull ||
      expr("unix_micros(ts)") - prev > gapUs, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(expr("unix_micros(ts)")).as("session_start_us"),
        max(expr("unix_micros(ts)")).as("session_end_us"),
        // id-space bounds: conversion-free BIGINTs that identify the
        // session's extent without touching timestamp semantics — the
        // columns a cross-engine contract can hash exactly (see q43).
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"),
        sum(col("value").cast("decimal(18,3)")).cast("double").as("session_value"))
  }

  /** JSON property extraction + aggregation (codegen'd path, no UDF). */
  def jsonPropAgg(events: DataFrame, jsonPath: String): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), jsonPath).cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))

  /** Ordered funnel analysis: how many users reach each stage of
    * `stages` IN ORDER — stage k counts users with an event of type
    * stages(k) at-or-after their earliest stage-(k-1) completion time.
    * Returns (stage, stage_name, n_users), stage 0 = all users.
    *
    * Each stage is one filtered equi-join against the (user, time)
    * frontier plus a map-side-combinable min — |users| rows of state,
    * never an event-sequence materialization per user; at 100 TB the
    * frontier is broadcastable long after the first selective stage. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             timeCol: String, stages: Seq[String]): DataFrame = {
    var reached = events.select(col(userCol).as("user_id")).distinct()
      .withColumn("_t", lit(Long.MinValue))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(0L).as("stage"), lit("all").as("stage_name"),
        col("n_users"))
    stages.zipWithIndex.foreach { case (st, i) =>
      reached = events.filter(col(typeCol) === st)
        .select(col(userCol).as("user_id"), col(timeCol).as("_ts"))
        .join(reached, "user_id")
        .filter(col("_ts") >= col("_t"))
        .groupBy("user_id").agg(min(col("_ts")).as("_t"))
      out = out.union(reached.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("stage"), lit(st).as("stage_name"),
          col("n_users")))
    }
    out
  }

  /** Merge overlapping/touching intervals per key into coverage
    * islands (gaps-and-islands): an interval starts a new island iff
    * its start exceeds the running max end of everything before it.
    * Returns one row per (key, island) with the island's bounds.
    *
    * One hash shuffle on the key + two running-frame window passes
    * (the sessionize shape). Tie rows (identical intervals) may take
    * either island NUMBER, but island membership — and thus any
    * per-key aggregate over islands — is tie-invariant, which is what
    * the q99 cross-engine contract relies on. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("_new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"))
  }

  /** Cohort retention: bucket users by their first `signupType` event
    * (epoch-µs integer division by `bucketUs`) and count distinct users
    * active in each subsequent bucket, as (cohort_bucket,
    * bucket_offset, n_users) — the classic retention triangle.
    *
    * Input needs (`user_id`, `event_type`, `us`). Shapes: one
    * per-user min over the signup subset (decomposable), one
    * broadcastable join of the cohort frame back onto events, one
    * distinct + count — nothing holds per-user event lists. */
  def cohortRetention(ev: DataFrame, signupType: String,
                      bucketUs: Long): DataFrame = {
    val cohort = ev.filter(col("event_type") === signupType)
      .groupBy("user_id")
      .agg(expr(s"min(us) div CAST($bucketUs AS BIGINT)").as("cohort_bucket"))
    ev.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_bucket"),
        expr(s"us div CAST($bucketUs AS BIGINT)").as("_b"))
      .filter(col("_b") >= col("cohort_bucket"))
      .select(col("user_id"), col("cohort_bucket"),
        (col("_b") - col("cohort_bucket")).as("bucket_offset"))
      .distinct()
      .groupBy("cohort_bucket", "bucket_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Two-phase salted aggregation: phase 1 aggregates on
    * (key, deterministic salt) spreading hot keys over `salts`
    * partitions; phase 2 combines the partials. Same result as a direct
    * groupBy — the shape that survives power-law key skew at 100 TB.
    * All aggregates here must be decomposable (sum/count/min/max). */
  def saltedSum(events: DataFrame, key: String, valueExpr: Column,
                salts: Int): DataFrame =
    events
      .withColumn("_salt", col("event_id") % salts)
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueExpr).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum("_partial").cast("double").as("total_value"),
        sum("_n").as("n_events"))

  /** Salted equi-join — the join twin of [[saltedSum]] for when the
    * PROBE side's key distribution is power-law and the build side is
    * too big to broadcast outright. The probe side gets a
    * deterministic salt in [0, salts); the build side is replicated
    * once per salt value (explode of a literal sequence — `salts`×
    * build-side rows, the price of splitting each hot key's probe rows
    * across `salts` shuffle partitions). Join keys become (key, salt),
    * so one hot key no longer lands in one task. Result rows are
    * exactly those of the unsalted join — the salt never reaches the
    * output.
    *
    * When to reach for it at 100 TB: AQE's skew-split
    * (`spark.sql.adaptive.skewJoin`) handles hot PARTITIONS
    * transparently and should be the first lever; explicit salting is
    * for a single pathological KEY (one partition cannot be split
    * below one key's row count) or engines/stages where AQE cannot
    * re-plan (e.g. the exchange feeding a streaming state store).
    * `salts` trades build-side duplication for parallelism — keep it
    * at the small end (8–32) and size by the hot key's share. */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, salts: Int): DataFrame = {
    require(salts >= 1, "need at least one salt")
    // xxhash64 of the probe ROW (not just the key — every column) so
    // a hot key's rows spread uniformly; deterministic across runs.
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    // The operator exists for the NO-broadcast regime (a broadcast
    // join has no per-key partition to split, and salting it is pure
    // overhead) — pin the shuffle-hash shape so the plan demonstrated
    // at test scale is the plan used at 100 TB, where the build side
    // exceeds the broadcast threshold anyway.
    // Keys resolve through their own side: an unqualified col() would
    // be ambiguous (and throw) whenever the build side carries a
    // column named like probeKey — the conformed-dimension case.
    val rep = replicated.hint("shuffle_hash")
    salted.join(rep,
        salted("_salt") === rep("_salt") &&
          salted(probeKey) === rep(buildKey))
      .drop("_salt")
  }

  /** First-touch attribution: every conversion (row matching
    * `convType`) is credited to the user's FIRST event's type — the
    * acquisition-channel question asked of any event stream. Returns
    * one row per first-touch channel: users converted, conversions,
    * exact-decimal revenue.
    *
    * Shape: one window over (user, time) to stamp each user's first
    * touch (no self-join — the window and the subsequent per-user
    * aggregate shuffle on the same key, so the exchange is reused),
    * then a conversion filter and a channel rollup whose cardinality
    * is the (tiny) event-type domain. The (ts, tiebreak) total order
    * makes "first" deterministic under same-timestamp events. */
  def firstTouchAttribution(events: DataFrame, userCol: String,
                            typeCol: String, tsCol: String,
                            tieCol: String, convType: String,
                            valueCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_first_touch", first(col(typeCol)).over(w))
      .filter(col(typeCol) === convType)
      .groupBy(col("_first_touch").as("first_touch"))
      .agg(countDistinct(col(userCol)).as("n_users"),
        count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(18,3)")).cast("double")
          .as("revenue"))
  }

  /** FIRST-ORDER MARKOV TRANSITION MATRIX of event types: for every
    * consecutive pair of events within a user's (time, tiebreak)-
    * ordered stream, counts (from_type → to_type) and the empirical
    * transition probability — the behavioral summary a sequence-model
    * training build publishes next to its corpus (and the sanity check
    * that generated sessions transition like real ones).
    *
    * Shape at scale: one window shuffle on the user key stamps each
    * event with its predecessor's type (lag — no self-join), then one
    * map-side-combinable count over the (from, to) domain, which is
    * |types|² tiny. The probability normalization windows over THAT
    * aggregated frame, not the events. The (ts, tiebreak) total order
    * makes each user's chain deterministic under equal timestamps.
    * A user's first event has no predecessor and contributes no pair.
    *
    * p_micro = ⌊10⁶ · n/Σn⌋ over one double division of two exact
    * integers — deterministic cross-engine, no double summation.
    * Output: (from_type, to_type, n_trans, p_micro). */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val steps = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("_from", lag(col(typeCol), 1).over(w))
      .filter(col("_from").isNotNull)
    val counts = steps
      .groupBy(col("_from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val wTot = Window.partitionBy("from_type")
    counts
      .withColumn("_tot", sum("n_trans").over(wTot))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        floor(lit(1000000L) *
          (col("n_trans").cast("double") / col("_tot").cast("double")))
          .as("p_micro"))
  }

  /** BEHAVIORAL n-GRAM MINING: the most frequent length-`n` event-type
    * sequences across users — the pattern inventory a sequence-model
    * training build publishes next to its transition matrix
    * ([[transitionMatrix]] is the n=2 distributional view; this ranks
    * the concrete n-grams). Windows per user over (ts, tie), n−1 lags
    * build each contiguous n-gram as a '>'-joined string, then one
    * combinable count and a (count desc, gram) top-k.
    *
    * Shape at scale: ONE shuffle on the user key for the lags (state
    * is n−1 strings per row), one count aggregate with map-side
    * combine over at most |types|ⁿ keys, and the top-k is
    * TakeOrderedAndProject. Returns (gram, n_occurrences) rank-ordered. */
  def topEventNgrams(events: DataFrame, userCol: String, tsCol: String,
                     tieCol: String, typeCol: String, n: Int,
                     k: Int): DataFrame = {
    require(n >= 2 && n <= 6, "n-grams of length 2..6")
    require(k >= 1, "need k >= 1")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    // lag columns materialize BEFORE the filter — Spark rejects window
    // expressions inside WHERE
    val lagged = (1 until n).foldLeft(events)((d, i) =>
      d.withColumn(s"_l$i", lag(col(typeCol), i).over(w)))
    val withGram = lagged
      .filter((1 until n).map(i => col(s"_l$i").isNotNull).reduce(_ && _))
      .withColumn("_gram", concat_ws(">",
        ((n - 1 to 1 by -1).map(i => col(s"_l$i")) :+ col(typeCol)): _*))
    withGram.groupBy(col("_gram").as("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)
  }

  /** TIME-DECAYED counts per key — the freshness-weighting aggregate a
    * curation pipeline uses to score activity where last week counts
    * more than last year (trending sources, decaying user engagement,
    * recency-weighted sampling priors).
    *
    * The decay is HALF-LIFE STEPPED, in integers: an event
    * `floor(age_days / halfLifeDays)` half-lives old contributes
    * `1000 div 2^h` milli-units (h capped at `maxHalfLives` — beyond
    * ~20 the contribution is 0 milli anyway, and the cap keeps the
    * shift bounded). Stepped dyadic decay instead of exp(−λ·age): the
    * weights are exact integers, so the aggregate is order-free,
    * map-side combinable, and bit-identical on any engine — a float
    * exp() aggregate is none of those (IEEE leaves exp rounding to the
    * implementation, and float sums depend on partitioning). The step
    * quantization (a day-312 event weighs like day-364 at a 365-day
    * half-life) is the stated trade.
    *
    * Age anchors to the corpus max timestamp (one broadcast scalar),
    * not wall clock — deterministic and re-runnable. Rows with a NULL
    * timestamp are EXCLUDED up front (stated choice, not an accident
    * of least()'s null-skipping): an event of unknown age has no
    * defensible weight, and counting it in `n_events` while giving it
    * weight 0 would make the two output columns disagree about what
    * the input was. One combinable aggregate; output is keys-sized.
    * Returns (key, n_events, decayed_milli). */
  def decayedCounts(events: DataFrame, keyCol: String, tsCol: String,
                    halfLifeDays: Int, maxHalfLives: Int = 20): DataFrame = {
    require(halfLifeDays >= 1, "half-life must be at least a day")
    require(maxHalfLives >= 1 && maxHalfLives <= 62, "cap must be in [1, 62]")
    val anchor = events.agg(max(col(tsCol)).as("_anchor"))
    events.filter(col(tsCol).isNotNull).crossJoin(broadcast(anchor))
      .withColumn("_h",
        least(expr(s"cast(datediff(_anchor, $tsCol) as bigint) " +
          s"div ${halfLifeDays}L"), lit(maxHalfLives.toLong)))
      .withColumn("_w", expr("1000L div shiftleft(1L, cast(_h as int))"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("_w")).as("decayed_milli"))
  }

  /** INTER-ARRIVAL BURSTINESS per user — the bot/script detector a
    * data-curation pipeline runs before trusting behavioral data: a
    * human's event gaps are overdispersed (bursts and lulls), a
    * scheduled scraper's are metronomic. Score = the squared
    * coefficient of variation of consecutive-event gaps,
    * CV² = n·Σg² div (Σg)² − 1 in micro units: ≈0 for a metronome,
    * ≈1e6 for a Poisson process, ≫1e6 for bursty humans.
    *
    * Exactness contract: gaps are quantized to SECONDS (stated — the
    * burstiness signal lives at second scale); Σg and Σg² are exact
    * int64 (Σg² ≤ n·(3e7)² ≈ 1e19·n/1e4 stays inside 2^63 for
    * year-scale gaps at any plausible per-user volume), and the
    * n·Σg² / (Σg)² products — which CAN pass 2^63 (one dormant-year
    * gap puts g² at ~1e15) — are formed in 128-bit exact integers
    * (DECIMAL(38,0) ≡ the oracle's HUGEINT, the q194 pairing) before
    * the one fixed double expression (q169 discipline).
    * Zero-total-gap users (every event within one second) have zero
    * variance and score 0 by an explicit CASE, not NULL or −1e6.
    *
    * Shape: one (user, ts) window pass for gaps (the sessionize
    * partitioning — exchange-reused if composed), one map-side
    * combinable aggregate, top-k as TakeOrderedAndProject. `minGaps`
    * drops users without enough gaps for the statistic to mean
    * anything. Returns (user_id, n_gaps, mean_gap_s,
    * burstiness_micro), top `k` by (burstiness desc, user). */
  def interArrivalBurstiness(events: DataFrame, userCol: String,
                             tsCol: String, minGaps: Int, k: Int): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col("event_id"))
    val us = expr(s"unix_micros($tsCol)")
    val gaps = events
      .withColumn("_gus", us - lag(us, 1).over(byUser))
      .filter(col("_gus").isNotNull)
      .withColumn("_g", expr("_gus div 1000000L"))
    gaps.groupBy(col(userCol).as("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("_g")).as("_sg"),
        sum(col("_g") * col("_g")).as("_sg2"))
      .filter(col("n_gaps") >= minGaps)
      .select(col("user_id"), col("n_gaps"),
        expr("_sg div n_gaps").as("mean_gap_s"),
        when(col("_sg") === 0L, lit(0L))
          .otherwise(floor(lit(1000000.0) *
            (col("n_gaps").cast("decimal(38,0)") * col("_sg2"))
              .cast("double") /
            (col("_sg").cast("decimal(38,0)") * col("_sg"))
              .cast("double") - lit(1000000.0))
            .cast("long"))
          .as("burstiness_micro"))
      .orderBy(col("burstiness_micro").desc, col("user_id"))
      .limit(k)
  }

  /** EVENT-TIME LATENESS AUDIT — the measurement that justifies a
    * watermark: for each event, how far behind the maximum event time
    * ALREADY ARRIVED did it land (`arrivalCol` is the arrival order —
    * an ingest sequence / kafka offset; here event_id). The bucketed
    * histogram per type is exactly the "what do we lose at a 10-minute
    * watermark" table that sizes every `withWatermark` in the
    * streaming twins — set from data, not folklore.
    *
    * Buckets are fixed integer thresholds on second-quantized lateness
    * (on-time, ≤10s, ≤1m, ≤10m, over), so counts and permille shares
    * are engine-exact. The running max is a global prefix scan over
    * arrival order — single-partition over the audited slice; at
    * ingest scale the audit runs per partition/shard (lateness is
    * per-stream anyway) or two-pass like q181, stated.
    * Returns (event_type, bucket, n, permille), ordered. */
  def latenessAudit(events: DataFrame, typeCol: String, tsCol: String,
                    arrivalCol: String): DataFrame = {
    val us = expr(s"unix_micros($tsCol)")
    val w = Window.orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lateS = greatest(
      expr("(_mx - _us) div 1000000L"), lit(0L))
    val bucketed = events
      .withColumn("_us", us)
      .withColumn("_mx", max(col("_us")).over(w))
      .withColumn("_late",
        when(col("_mx").isNull, lit(0L)).otherwise(lateS))
      .select(col(typeCol).as("event_type"),
        when(col("_late") <= 0, "0_on_time")
          .when(col("_late") <= 10, "1_under_10s")
          .when(col("_late") <= 60, "2_under_1m")
          .when(col("_late") <= 600, "3_under_10m")
          .otherwise("4_over_10m").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
    val totals = bucketed.groupBy("event_type")
      .agg(sum(col("n")).as("_tot"))
    bucketed.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("bucket"), col("n"),
        expr("(1000 * n) div _tot").as("permille"))
      .orderBy("event_type", "bucket")
  }

  /** CONCURRENCY SWEEP-LINE over a set of closed intervals [start, end]:
    * at every boundary instant, how many intervals are open — peak
    * simultaneous sessions, connection-pool sizing, overlap auditing.
    * The classic formulation: concurrency(t) = |starts ≤ t| − |ends < t|
    * (closed intervals: a session ending exactly at t still counts at
    * t). Computing it from per-instant start/end COUNTS instead of
    * ±1-delta rows makes the tie rule structural — there is no
    * same-timestamp ordering to get wrong, and every value is an exact
    * integer aggregate.
    *
    * Shape: one union + one (t) aggregate (map-side combinable; output
    * is |distinct boundaries| ≤ 2·|intervals| rows — interval-count
    * scale, not event scale), then running sums over the global time
    * order. The global-order window is the stated scale point: Spark
    * plans it as a single-partition sort over the boundary rows, which
    * is fine precisely because the aggregate already shrank the data;
    * at extreme cardinality this is the textbook range-partition +
    * per-partition prefix-sum + offset-broadcast two-pass (the q181
    * stride-interleave recipe). NULL bounds are excluded up front
    * ([[decayedCounts]]' posture: an interval with an unknown endpoint
    * has no defensible sweep contribution).
    * Returns (t, concurrency) — one row per boundary instant. */
  def concurrencySweep(intervals: DataFrame, startCol: String,
                       endCol: String): DataFrame = {
    val valid = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val bounds = valid
      .select(col(startCol).as("t"), lit(1L).as("_s"), lit(0L).as("_e"))
      .unionAll(valid
        .select(col(endCol).as("t"), lit(0L).as("_s"), lit(1L).as("_e")))
      .groupBy("t")
      .agg(sum(col("_s")).as("_ns"), sum(col("_e")).as("_ne"))
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .withColumn("_cs", sum(col("_ns")).over(w))
      .withColumn("_ce", sum(col("_ne")).over(w))
      .select(col("t"),
        (col("_cs") - (col("_ce") - col("_ne"))).as("concurrency"))
  }

  /** LAGGED AUTOCORRELATION of the hourly event-count series — the
    * seasonality detector: r(24) ≈ 1 means a strong daily cycle (load
    * forecasting, anomaly baselining must be hour-of-day-conditioned);
    * r(1) measures short-range persistence. The series is the COMPLETE
    * hour grid from first to last event (missing hours count 0 —
    * skipping them would silently splice non-adjacent hours together).
    *
    * Exactness: counts are integers; all five correlation moments are
    * exact DECIMAL(38,0) sums over the lag-joined pairs; r is the
    * textbook formula evaluated ONCE in double over those exact sums
    * (the corrMatrix discipline). NULL timestamps are excluded
    * ([[decayedCounts]] posture).
    *
    * Shape at scale: one map-side-combinable hour count (the grid is
    * hours-sized — 8.8k/year — everything after the first aggregate is
    * driver-trivial); the grid explode and the self-join run at that
    * cardinality. Constant series (zero variance) yield NaN, surfaced
    * not masked. Output per lag: (lag, n_pairs, r). */
  def hourlyAutocorr(events: DataFrame, tsCol: String,
                     lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(l => l >= 1 && l <= 8760),
      s"lags must be in [1, 8760], got $lags")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = events.filter(col(tsCol).isNotNull)
      // div is exact here (date_trunc already floored to the hour)
      .groupBy(expr(
        s"unix_micros(date_trunc('hour', $tsCol)) div 3600000000L")
        .as("_h"))
      .agg(count(lit(1)).as("_n"))
    val grid = counts.agg(min(col("_h")).as("_lo"), max(col("_h")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("_h"))
    val filled = grid.join(counts, Seq("_h"), "left")
      .select(col("_h"), coalesce(col("_n"), lit(0L)).as("_x"))
    lags.map { lag =>
      val y = filled.select((col("_h") - lag).as("_h"),
        col("_x").as("_y"))
      filled.join(y, Seq("_h"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("_x").cast(d38)).as("_sx"),
          sum(col("_y").cast(d38)).as("_sy"),
          sum(col("_x").cast(d38) * col("_y")).as("_sxy"),
          sum(col("_x").cast(d38) * col("_x")).as("_sxx"),
          sum(col("_y").cast(d38) * col("_y")).as("_syy"))
        .select(lit(lag.toLong).as("lag"), col("n_pairs"),
          ((col("n_pairs").cast(d38) * col("_sxy") -
            col("_sx") * col("_sy")).cast("double") /
            (sqrt((col("n_pairs").cast(d38) * col("_sxx") -
              col("_sx") * col("_sx")).cast("double")) *
             sqrt((col("n_pairs").cast(d38) * col("_syy") -
               col("_sy") * col("_sy")).cast("double")))).as("r"))
    }.reduce(_ unionAll _).orderBy("lag")
  }
}
