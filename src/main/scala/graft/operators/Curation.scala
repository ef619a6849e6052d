package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition the
  * individual operators exist for: exact dedup → near-dup removal →
  * quality filter → per-document stats. One call takes a raw document
  * table to a training-ready corpus.
  *
  * Stage order matters at scale: exact dedup first (cheapest, biggest
  * mass reduction on crawl data), then LSH near-dup (pair space already
  * reduced), then narrow per-row scoring on the survivors only.
  */
object Curation {

  /** Curate `docs`: returns surviving documents with their stats.
    *
    * - exact duplicates collapse to the smallest doc_id
    *   ([[Dedup.exact]]);
    * - of every verified near-duplicate pair, the larger id is dropped
    *   ([[Dedup.minHashLsh]] with the given LSH shape);
    * - documents below `minQuality` ([[TextAnalysis.qualityScore]]) are
    *   dropped.
    *
    * Output: (doc_id, n_tokens, quality), one row per surviving doc.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             k: Int, bands: Int, rows: Int, nearDupThreshold: Double,
             minQuality: Double): DataFrame = {
    // exact dedup: survivors are the kept ids
    val kept = Dedup.exact(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exactSurvivors = docs.join(kept, idCol)

    // near-dup removal: drop the b-side of every verified pair
    val nearDupLosers = Dedup.minHashLsh(exactSurvivors, idCol, textCol,
      shingleN = 2, k = k, bands = bands, rows = rows,
      threshold = nearDupThreshold)
      .select(col("doc_b").as(idCol)).distinct()
    val deduped = exactSurvivors.join(nearDupLosers, Seq(idCol), "left_anti")

    // quality gate + stats on the survivors, in one projection (separate
    // quality/stats joins would re-execute the deduped subtree twice)
    TextAnalysis.qualityWithTokenCount(deduped, idCol, textCol)
      .filter(col("quality") >= minQuality)
      .select(col(idCol), col("n_tokens"), col("quality"))
  }

  /** Benchmark decontamination: the fraction of each document's word
    * 2-gram shingles that appear anywhere in the benchmark set
    * (`benchmarkFilter` rows). Shape: benchmark shingles collapse to a
    * distinct set (small — broadcast at scale), then one semi-join-style
    * aggregation per (doc, shingle) pair with map-side partial counts.
    * Returns (id, n_shingles, n_contaminated, contamination). */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    benchmarkFilter: Column): DataFrame = {
    val shingled = docs.select(col(idCol).as("id"), benchmarkFilter.as("is_bench"),
      Dedup.wordShingles(col(textCol), 2).as("sh"))
    val benchShingles = shingled.filter(col("is_bench"))
      .select(explode(col("sh")).as("s")).distinct()
    val exploded = shingled.filter(!col("is_bench"))
      .select(col("id"), explode(col("sh")).as("s"))
    exploded
      .join(benchShingles.withColumn("hit", lit(1L)), Seq("s"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .select(col("id").as(idCol), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles"))
          .as("contamination"))
  }

  /** CONTAMINATION n-GRAM SWEEP — the eval harness behind
    * [[contamination]]'s shingle size: the same benchmark-overlap scan
    * at several n's, reported as corpus-level flag rates. Small n
    * over-flags (common phrases look like leakage), large n
    * under-flags (paraphrases slip through) — this table is how the
    * cutoff gets CHOSEN rather than inherited.
    *
    * ONE corpus pass for ALL n (r13; was one per n): the token split
    * is materialized behind an explode-barrier (DESIGN §5 — the
    * general-n gram builder slices the array once per position, so an
    * inlined split is O(tokens²) per document), every n's distinct
    * grams are tagged with their n in one projection, and a single
    * (shingle_n, digest)-keyed join + rollup serves the whole sweep —
    * shuffle volume is unchanged (the union of all n's grams moves
    * either way) but the corpus is read once, not |ns| times, which
    * at 100 TB is the difference between the sweep costing one scan
    * and costing a scan per knob value. The sweep does NOT consume the
    * corpus-standard MinHash pair artifact (VERDICT r12 #7): it
    * measures benchmark-shingle CONTAINMENT per n, not document-pair
    * similarity — there is no pair set to reuse, and the per-n shingle
    * universes are disjoint by construction, so the single tagged pass
    * above is the shareable artifact for this family.
    *
    * Per n: one distinct-benchmark-shingle set, one exploded
    * corpus-side left join, two integer flag counts (any-hit, ≥half
    * contaminated) and a corpus-level permille — all exact. An eval
    * harness, not the production gate; the gate ships ONE n and, at
    * scale, the Bloom variant [[bloomContamination]]. Shingles shuffle
    * as 8-byte [[Dedup.digest64]] keys, never strings (the span-dedup
    * lesson; a 60-bit collision could only ADD a phantom hit, the
    * oracle hashes identically, and at these cardinalities the
    * probability is astronomically small — same contract as q168).
    * Returns (shingle_n, n_docs, n_flagged_any, n_flagged_half,
    * mean_contamination_permille), one row per n. */
  def contaminationSweep(docs: DataFrame, idCol: String, textCol: String,
                         benchmarkFilter: Column, ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns == ns.sorted && ns.distinct == ns &&
      ns.head >= 1, "shingle sizes must be ascending, distinct, positive")
    // ScanScale before the token explode: the per-n shingle + digest
    // construction below is map work a single-split doc scan serializes
    val tagged = ScanScale.parallelized(docs
      .select(col(idCol).as("id"), benchmarkFilter.as("is_bench"),
        col(textCol).as("_t")))
      .select(col("id"), col("is_bench"),
        explode(array(split(col("_t"), " "))).as("_w"))
      .select(col("id"), col("is_bench"),
        explode(flatten(array(ns.map(n =>
          transform(Dedup.wordShinglesFromTokens(col("_w"), n),
            s => struct(lit(n.toLong).as("n"),
              Dedup.digest64(s).as("s")))): _*))).as("x"))
      .select(col("id"), col("is_bench"),
        col("x.n").as("shingle_n"), col("x.s").as("s"))
    val benchShingles = tagged.filter(col("is_bench"))
      .select("shingle_n", "s").distinct()
    val byN = tagged.filter(!col("is_bench"))
      .join(benchShingles.withColumn("hit", lit(1L)),
        Seq("shingle_n", "s"), "left")
      .groupBy("shingle_n", "id")
      .agg(count(lit(1)).as("_ns"),
        sum(coalesce(col("hit"), lit(0L))).as("_nc"))
      .groupBy("shingle_n")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_nc") >= 1, 1L).otherwise(0L)).as("n_flagged_any"),
        sum(when(col("_nc") * 2 >= col("_ns"), 1L).otherwise(0L))
          .as("n_flagged_half"),
        sum(col("_nc")).as("_snc"), sum(col("_ns")).as("_sns"))
    // The single-pass rollup loses a sweep row when a shingle size has
    // ZERO non-bench documents (groupBy over nothing emits nothing,
    // where the old per-n global aggregate emitted an n_docs=0 row) —
    // re-anchor on the literal n domain so every requested size
    // reports, matching the per-n contract: (n, 0, NULL, NULL, NULL).
    import docs.sparkSession.implicits._
    ns.map(_.toLong).toDF("shingle_n")
      .join(byN, Seq("shingle_n"), "left")
      .select(col("shingle_n"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        col("n_flagged_any"), col("n_flagged_half"),
        expr("(1000 * _snc) div _sns").as("mean_contamination_permille"))
      .orderBy("shingle_n")
  }

  /** Decontamination through a DETERMINISTIC Bloom filter: the
    * held-out set's distinct shingles set `kHash` md5-derived bit
    * positions in a `bits`-wide filter (stored as 32-bit words folded
    * with `bit_or` — a tiny, broadcastable, partial-aggregable build);
    * corpus shingles then probe all `kHash` positions against the
    * broadcast words. Per document: distinct shingles, EXACT hits (set
    * join, the [[contamination]] ground truth) and MAYBE hits (Bloom).
    * The filter never misses (`n_maybe ≥ n_exact` always) and the
    * surplus is the measured false-positive mass.
    *
    * Why at 100 TB: the exact set join ships the benchmark shingle SET
    * through a shuffle; the Bloom filter ships `bits/8` BYTES to every
    * executor regardless of benchmark size — the standard trade for a
    * first-pass gate, with the exact join reserved for flagged docs.
    * Every position is integer md5 arithmetic, so any engine rebuilds
    * the identical filter (no RNG, no sip-hash seeds).
    *
    * ONE digest per shingle (r13; was one per (shingle, j)): the k
    * positions derive arithmetically from a single [[Dedup.digest64]]
    * via double hashing — pos_j = (h1 + j·h2) mod bits with h1 the
    * digest's low 30 bits and h2 an odd stride from its high 30 bits.
    * Kirsch–Mitzenmacher ("Less Hashing, Same Performance", ESA 2006)
    * proves this preserves the Bloom filter's asymptotic
    * false-positive rate; at 100 TB hashing IS the gate's CPU, so
    * k=4 → 1 digests per probe is a 4× cut in the dominant cost
    * (q103 measured 5.0 s → 2.7 s at sf0.1; the oracle mirrors the
    * same integer derivation and gets the same 4× off its md5 bill). */
  def bloomContamination(docs: DataFrame, idCol: String, textCol: String,
                         benchmarkFilter: Column, bits: Int = 65536,
                         kHash: Int = 4,
                         tier: Dedup.DigestTier = Dedup.Md5Tier): DataFrame = {
    // tier (r14): the xx tier swaps md5 for codegen'd xxhash64 at the
    // SAME 60-bit domain, so the double-hashing split is unchanged.
    // Builder and probes must share one tier or membership desyncs
    // into false negatives — which is why it is one parameter here,
    // not one per side. No-false-negative contract is tier-invariant
    // (DigestTierSpec); the FP SET is hash-dependent by construction.
    def positions(s: Column): Column =
      Dedup.bloomPositions(tier.digest(s), kHash, bits)
    // 32-bit words: shifts stay below the sign bit, which DuckDB
    // rejects as overflow on BIGINT << 63
    def mask = expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
    // No ScanScale here (measured neutral, r22: 1.39 → 1.49 s — the
    // probe explode + broadcast word join dominates, not the shingle
    // build on the scan task).
    val shingled = docs.select(col(idCol).as("id"),
      benchmarkFilter.as("is_bench"),
      Dedup.wordShingles(col(textCol), 2).as("sh"))
    val bench = shingled.filter(col("is_bench"))
      .select(explode(col("sh")).as("s")).distinct()
    val words = bench
      .select(explode(positions(col("s"))).as("pos"))
      .select(expr("pos div 32").as("word_idx"), mask.as("m"))
      .groupBy("word_idx").agg(expr("bit_or(m)").as("word"))
    val probes = shingled.filter(!col("is_bench"))
      .select(col("id"), explode(col("sh")).as("s")).distinct()
    val maybe = probes
      .select(col("id"), col("s"), explode(positions(col("s"))).as("pos"))
      .select(col("id"), col("s"), expr("pos div 32").as("word_idx"), mask.as("m"))
      .join(broadcast(words), Seq("word_idx"), "left")
      .select(col("id"), col("s"),
        when(col("word").isNotNull &&
          (col("word").bitwiseAND(col("m")) =!= 0), 1L).otherwise(0L).as("hit"))
      .groupBy("id", "s")
      .agg(min(col("hit")).as("member")) // member ⇔ ALL kHash bits set
    val exact = probes
      .join(bench.withColumn("ex", lit(1L)), Seq("s"), "left")
      .groupBy("id")
      .agg(sum(coalesce(col("ex"), lit(0L))).as("n_exact"))
    maybe.groupBy("id")
      .agg(count(lit(1)).as("n_shingles"), sum(col("member")).as("n_maybe"))
      .join(exact, Seq("id"))
      .select(col("id").as(idCol), col("n_shingles"), col("n_exact"),
        col("n_maybe"))
  }

  /** Deterministic train/valid/test split: each row's bucket comes from
    * the first 4 hex chars of `md5(id)` compared against cumulative
    * fraction thresholds (granularity 1/65536). Pure projection — zero
    * shuffle, no RNG, stable across runs/engines/partitionings, and any
    * engine that can md5 a string reproduces the exact assignment (the
    * property a multi-team 100 TB pipeline actually needs from a split).
    *
    * `splits` = (name, fraction) in order; fractions must sum to 1. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "need at least two split buckets")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    // cumulative upper bounds as 4-digit lowercase hex strings; string
    // comparison on fixed-width hex ≡ numeric comparison
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(f => f"${math.floor(f * 65536).toLong}%04x")
    val chain = splits.init.zip(bounds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), bound)) =>
        val cond = h < lit(bound)
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.get.otherwise(splits.last._1)
    df.withColumn("split", chain)
  }

  /** STRATIFIED K-FOLD ASSIGNMENT + BALANCE AUDIT — the
    * cross-validation layout: every row gets fold = digest64(id) mod k
    * (deterministic, shard-stable, no RNG), and the audit reports per
    * (stratum, fold) counts with each stratum's min/max fold share so
    * an unlucky skew is a read-off, not a surprise. Hash folds are
    * uniform in expectation but not exactly equal — the audit is the
    * point: it quantifies the realized imbalance the modeler accepts
    * (or rejects by re-keying). Leakage caveat: fold identity is keyed
    * on the ROW id — near-duplicate-rich data should key on a group
    * id instead (the [[groupedSplit]] lesson applies verbatim).
    *
    * One combinable (stratum, fold) count; shares per stratum via a
    * window over ≤ k rows per stratum. Output: (stratumCol, fold, n,
    * share_milli, stratum_min_milli, stratum_max_milli), full
    * (stratum × fold) domain — an empty fold reports n = 0. Rows with
    * a NULL id (digest64 of NULL is NULL, so no hash fold exists) are
    * reported under fold = -1 rather than silently dropped: sum(n)
    * always equals the input row count, and a stratum of all-NULL ids
    * shows up as one -1 row plus k zero rows instead of vanishing. */
  def kFoldAudit(df: DataFrame, stratumCol: String, idCol: String,
                 k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2,1000], got $k")
    val folds = df.select(col(stratumCol),
      when(col(idCol).isNull, lit(-1L))
        .otherwise(Dedup.digest64(col(idCol).cast("string")) % k)
        .as("fold"))
      .groupBy(stratumCol, "fold").agg(count(lit(1)).as("n"))
    val sp = df.sparkSession
    import sp.implicits._
    val domain = df.select(col(stratumCol)).distinct()
      .crossJoin((0L until k.toLong).toDF("fold"))
    val w = Window.partitionBy(stratumCol)
    // Full outer: the domain cross only enumerates folds 0..k-1; the
    // NULL-id -1 fold arrives from the counts side and must survive.
    domain.join(folds, Seq(stratumCol, "fold"), "full")
      .select(col(stratumCol), col("fold"),
        coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("_t", sum(col("n")).over(w))
      .withColumn("share_milli", expr("(1000 * n) div _t"))
      .withColumn("stratum_min_milli",
        min(col("share_milli")).over(w))
      .withColumn("stratum_max_milli",
        max(col("share_milli")).over(w))
      .select(col(stratumCol), col("fold"), col("n"), col("share_milli"),
        col("stratum_min_milli"), col("stratum_max_milli"))
  }

  /** LEAKAGE-SAFE grouped split: [[hashSplit]] keyed on a GROUP column
    * instead of the row id, so every row of a group (all pages of a
    * domain, all turns of a conversation, all augmentations of a seed
    * document) lands in the SAME bucket — the property that makes a
    * held-out set actually held out. Splitting near-duplicate-rich data
    * by row id leaks: the test set fills with near-copies of training
    * rows and eval scores inflate. Hashing the group key kills that
    * whole failure class structurally (no straddling is possible — the
    * bucket is a pure function of the group value), at the cost of
    * lumpier split sizes when groups are few or skewed, which is the
    * honest trade and the reason split-size reporting belongs next to
    * this operator. Same 100 TB shape as [[hashSplit]]: pure
    * projection, zero shuffle, zero RNG, engine-portable md5. */
  def groupedSplit(df: DataFrame, groupCol: String,
                   splits: Seq[(String, Double)]): DataFrame =
    hashSplit(df, groupCol, splits)

  /** EPOCH SCHEDULE for a token-budget mixture: given per-domain corpus
    * token counts and target mixture shares, how many times should each
    * domain be repeated (its epoch factor) to fill `budgetTokens`?
    * This is the planning step of mixture training (the duplication
    * ladder of Dolma/SlimPajama-style pipelines): domain d with
    * `tokens_d` raw tokens and target share `w_d` wants
    * `budget · w_d` tokens, i.e. `epochs_d = budget · w_d / tokens_d`
    * passes — capped at `capMilli` because repeating a small domain
    * dozens of times degrades models faster than under-weighting it.
    *
    * All integer milli-arithmetic (`epochs_milli = min(cap,
    * budget·w_milli div tokens)`, floor semantics), so the plan
    * is engine-exact. `planned_tokens = tokens·epochs_milli div 1000`
    * is what the schedule actually delivers — the caller compares it to
    * `budget·w_milli div 1000` to see which domains are cap-starved.
    *
    * Scale shape: one map-side-combinable aggregate over the corpus
    * (token counting is the scan); the schedule itself is
    * domains-sized metadata. Returns (domain, tokens, share_milli,
    * epochs_milli, planned_tokens) — one row per domain present in the
    * corpus AND listed in `shares`. */
  def epochSchedule(docs: DataFrame, domainCol: String, tokens: Column,
                    shares: Seq[(String, Long)], budgetTokens: Long,
                    capMilli: Long): DataFrame = {
    require(shares.nonEmpty && shares.forall(_._2 >= 0),
      "shares must be non-negative milli-fractions")
    require(budgetTokens > 0 && capMilli >= 1000,
      "need a positive budget and a cap of at least one epoch")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = shares.toDF(domainCol, "share_milli")
    docs.groupBy(col(domainCol).as(domainCol))
      .agg(sum(tokens.cast("long")).as("tokens"))
      .join(broadcast(w), domainCol)
      // zero/NULL token mass is ENFORCED, not silently NULLed: the
      // non-ANSI integer div would emit NULL epochs and poison any
      // planned_tokens rollup downstream (canonicalMap's guard style)
      .withColumn("tokens",
        when(col("tokens") > 0L, col("tokens")).otherwise(raise_error(
          concat(lit("epochSchedule: domain "), col(domainCol),
            lit(" has no token mass")))))
      .withColumn("epochs_milli",
        least(lit(capMilli),
          expr(s"(${budgetTokens}L * share_milli) div tokens")))
      .withColumn("planned_tokens",
        expr("(tokens * epochs_milli) div 1000L"))
  }

  /** BOTTOM-K-BY-HASH per-group sample: exactly `k` rows per group
    * (fewer when the group is smaller), chosen as the k smallest
    * `md5(id)` values within the group — the deterministic equivalent
    * of per-stratum reservoir sampling, and the standard way to pull a
    * fixed-size INSPECTION sample per domain (eyeball 50 docs from
    * every source) out of a 100 TB corpus. Hash-order selection makes
    * the sample uniform-ish over ids, stable across runs/engines, and
    * INSERTION-MONOTONE: a new row displaces at most the largest
    * retained hash, so yesterday's sample and today's differ only
    * where the data does (the property audits want).
    *
    * Shape: one shuffle on the group key; the rank filter plans as
    * WindowGroupLimit — per-partition top-k heaps, never a full
    * per-group sort materialization. Returns the input columns plus
    * `smp_rank` (1..k by hash). */
  def groupSample(df: DataFrame, groupCol: String, idCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("smp_rank", row_number().over(w).cast("long"))
      .filter(col("smp_rank") <= k)
  }

  /** STRIDE-SCHEDULED mixture interleave — the deterministic training
    * ORDER companion to [[epochSchedule]] (which decides how much of
    * each domain; this decides WHEN): domain d's r-th example gets
    * virtual time `vt = r·1000000 div share_milli`, and the schedule
    * is the ascending (vt, domain, id) order — classic stride
    * scheduling, so every schedule prefix contains domains in
    * proportion to their shares (a share-200 domain appears twice as
    * often as a share-100 one) with no RNG and no engine-dependent
    * shuffle. Rows of domains absent from `shares` are dropped
    * (stated, like [[mixtureSample]]).
    *
    * Scale shape: one broadcast of the shares, one per-domain window
    * for the rank, and a GLOBAL ordering for the final position. The
    * global `row_number` here is a single-partition sort — right for
    * schedule-sized outputs (a curated epoch), while at 100 TB the
    * position materializes as range-partition-by-(vt, domain, id) +
    * per-partition offsets (prefix sums of partition counts), the
    * standard global-index recipe; `vtime` is kept in the output so
    * that path needs nothing recomputed.
    *
    * Returns (idCol, domainCol, vtime, sched_pos). */
  def strideInterleave(df: DataFrame, idCol: String, domainCol: String,
                       shares: Seq[(String, Long)]): DataFrame = {
    require(shares.nonEmpty && shares.forall(_._2 > 0),
      "shares must be positive milli-fractions")
    val spark = df.sparkSession
    import spark.implicits._
    val w = shares.toDF(domainCol, "_wm")
    val wRank = Window.partitionBy(domainCol).orderBy(idCol)
    df.join(broadcast(w), domainCol)
      .withColumn("_rk", row_number().over(wRank).cast("long"))
      .withColumn("vtime", expr("(_rk * 1000000L) div _wm"))
      .withColumn("sched_pos", row_number()
        .over(Window.orderBy(col("vtime"), col(domainCol), col(idCol)))
        .cast("long"))
      .select(col(idCol), col(domainCol), col("vtime"), col("sched_pos"))
  }

  /** Deterministic stratified sampling: keep each row with a per-stratum
    * rate, decided by comparing the first 4 hex chars of `md5(id)`
    * against the stratum's rate threshold (granularity 1/65536 — same
    * mechanism as [[hashSplit]], and the same 100 TB properties: pure
    * projection, zero shuffle, zero RNG, reproducible on any engine and
    * any partitioning, and a row's fate never changes when other rows
    * come or go). Strata missing from `rates` keep `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Seq[(String, Double)],
                       defaultRate: Double): DataFrame = {
    require((rates.map(_._2) :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "sampling rates must be in [0,1]")
    def hex(r: Double) = f"${math.floor(r * 65536).toLong}%04x"
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val threshold = rates.foldLeft(Option.empty[Column]) {
      case (acc, (stratum, r)) =>
        val cond = col(strataCol) === stratum
        Some(acc.fold(when(cond, hex(r)))(_.when(cond, hex(r))))
    }.fold(lit(hex(defaultRate)))(_.otherwise(hex(defaultRate)))
    df.filter(h < threshold)
  }

  /** Exact per-class cap — keep at most `cap` rows per class, chosen
    * as the `cap` SMALLEST md5-prefix hashes (a deterministic uniform
    * draw, the same coin as [[hashSplit]]) — the class-balancing step
    * of a training-data mix (cap the over-represented crawl domain,
    * keep the rare ones whole).
    *
    * Unlike a rate (`stratifiedSample`), an exact cap needs per-class
    * ORDER STATISTICS — and the naive `row_number().over(partitionBy
    * (class).orderBy(hash)) <= cap` sorts each class in ONE task, the
    * straggler shape a power-law class distribution guarantees. This
    * implements the [[Stats.exactMedian]] trick instead: count rows
    * per (class, 16-bit hash bucket), take the per-class cumulative
    * bucket histogram (a window over ≤ 65,536 count rows per class,
    * never data rows), find the cutoff bucket where the cap lands, and
    * rank ONLY that one bucket's rows (~n/65,536 of the class). Below
    * the cutoff: kept outright; above: dropped; inside: the remaining
    * quota by (hash, id) order. Equal to the naive rank's answer row
    * for row, at 1/65,536th of the sort.
    *
    * Classes with ≤ `cap` rows pass through whole. Output: the kept
    * rows, original columns. */
  def classBalance(df: DataFrame, classCol: String, idCol: String,
                   cap: Int): DataFrame = {
    require(cap >= 1, "need a positive cap")
    // 32-bit hash prefix as fixed-width hex: string order ≡ numeric.
    val withH = df.withColumn("_h8",
      substring(md5(col(idCol).cast("string")), 1, 8))
      .withColumn("_b", expr("conv(substring(_h8, 1, 4), 16, 10)")
        .cast("long"))
    val hist = withH.groupBy(col(classCol).as("_cls"), col("_b"))
      .agg(count(lit(1)).as("_bn"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("_cls").orderBy("_b")
    val cuts = hist
      .withColumn("_cum", sum("_bn").over(wCum))
      .withColumn("_before", col("_cum") - col("_bn"))
      // the bucket where the cap falls, and the quota left inside it
      .filter(col("_before") < cap)
      .withColumn("_quota",
        when(col("_cum") <= cap, col("_bn"))
          .otherwise(lit(cap) - col("_before")))
      .select(col("_cls"), col("_b").as("_cb"), col("_quota"), col("_bn"))
    // Null-safe on the class AND the bucket: GROUP BY (and the naive
    // rank-over-partition this operator reproduces) treats a NULL
    // class as an ordinary partition, so its rows must match their
    // histogram row rather than vanish to an EqualTo mismatch — and a
    // NULL id makes md5(NULL) = NULL, so the bucket key needs the same
    // treatment or NULL-id rows silently drop.
    val joined = withH.join(cuts,
      withH(classCol) <=> cuts("_cls") && withH("_b") <=> cuts("_cb"))
    // full buckets pass through; only the one straddling bucket per
    // class is ranked — and only its own rows enter the window
    val whole = joined.filter(col("_quota") === col("_bn"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("_cls", "_cb").orderBy(col("_h8"), col(idCol))
    val straddle = joined.filter(col("_quota") < col("_bn"))
      .withColumn("_rn", row_number().over(wIn))
      .filter(col("_rn") <= col("_quota"))
      .drop("_rn")
    whole.union(straddle)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-class WEIGHTED budget fill — the token-budget sibling of
    * [[classBalance]]: walk each class's rows in the deterministic
    * (md5(id), id) order and keep rows while the cumulative weight of
    * the rows BEFORE them is under `budget` (so the row that first
    * crosses the budget is still kept — "fill until reached"). With
    * weight = token count this is "give every domain at most B tokens",
    * the mixture-capping step of a training-data recipe, where
    * [[classBalance]] caps document COUNTS.
    *
    * Same two-phase shape as classBalance, with weight sums instead of
    * row counts: per (class, 16-bit hash bucket) weight totals, a
    * cumulative histogram over ≤65,536 COUNT rows per class, then a
    * real prefix-sum window over only the one straddling bucket's rows
    * (~n/65,536 of the class) — never a whole-class window, so a
    * power-law class distribution cannot make straggler tasks. Buckets
    * wholly under budget pass entirely; buckets past it are dropped
    * whole. Row-for-row equal to the naive cumulative-window answer.
    *
    * Weights must be positive (the prefix monotonicity the bucket
    * split relies on); a NULL class is an ordinary class. Output: the
    * kept rows, original columns. */
  def budgetFill(df: DataFrame, classCol: String, idCol: String,
                 weightCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "need a positive budget")
    val w = col(weightCol).cast("long")
    val withH = df.withColumn("_h8",
      substring(md5(col(idCol).cast("string")), 1, 8))
      .withColumn("_b", expr("conv(substring(_h8, 1, 4), 16, 10)")
        .cast("long"))
    val hist = withH.groupBy(col(classCol).as("_cls"), col("_b"))
      .agg(sum(w).as("_bw"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("_cls").orderBy("_b")
    val cuts = hist
      .withColumn("_cumw", sum("_bw").over(wCum))
      .withColumn("_beforew", col("_cumw") - col("_bw"))
      // buckets that START past the budget contribute nothing
      .filter(col("_beforew") < budget)
      .select(col("_cls"), col("_b").as("_cb"), col("_beforew"),
        col("_cumw"))
    // null-safe on class and bucket — same reasoning as classBalance
    val joined = withH.join(cuts,
      withH(classCol) <=> cuts("_cls") && withH("_b") <=> cuts("_cb"))
    // a bucket ending within budget passes whole (every row's prefix
    // is under it); only the straddling bucket needs a real prefix sum
    // — over its own rows only
    val whole = joined.filter(col("_cumw") <= budget)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("_cls", "_cb").orderBy(col("_h8"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val straddle = joined.filter(col("_cumw") > budget)
      .withColumn("_ib", coalesce(sum(w).over(wIn), lit(0L)))
      .filter(col("_beforew") + col("_ib") < budget)
      .drop("_ib")
    whole.union(straddle)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic WEIGHTED Bernoulli sampling: keep each row with
    * probability proportional to its integer weight, p_i = w_i / w_max
    * (the max-weight row is always kept) — importance sampling by
    * document quality/length without RNG. The inclusion test is pure
    * integer arithmetic: keep iff h40 · w_max < 2^40 · w_i, where h40
    * is the top 40 bits of the row's md5-prefix hash — no float
    * probability ever materializes, so any engine and any partitioning
    * reproduces the exact sample (the [[stratifiedSample]] guarantee,
    * extended to per-row weights). w_max arrives as a broadcast
    * single-row cross join, never a collect. Weights must be positive
    * and ≤ ~10^5 so both products stay far inside int64. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val maxW = df.agg(max(col(weightCol)).cast("long").as("_maxw"))
    // h40 = 60-bit md5 prefix div 2^20 (integer `div`, not `/` which is
    // double division in the Column API)
    df.crossJoin(broadcast(maxW))
      .filter(expr(
        s"CAST(conv(substr(md5(CAST($idCol AS STRING)),1,15),16,10) AS LONG) div 1048576"
      ) * col("_maxw") < lit(1099511627776L) * col(weightCol).cast("long"))
      .drop("_maxw")
  }

  /** DOMAIN-MIXTURE resampling: downsample each domain so the kept
    * corpus hits target mixture proportions — the data-mixing step that
    * turns "we have whatever the crawl gave us" into "the training set
    * is 40% web, 30% books, ...". The feasible kept-total is
    * T = min_d(n_d / share_d) (the binding domain keeps everything);
    * each listed domain then keeps rate_d = T·share_d / n_d of its
    * rows; unlisted domains are dropped. Acceptance is the md5-prefix
    * threshold of [[stratifiedSample]] — no RNG, stable under re-runs
    * and partitioning — with the threshold computed IN-PLAN from the
    * observed counts (rates are data-dependent, unlike the static
    * splits). Shapes: one small per-domain count agg broadcast back;
    * acceptance is a pure projection over the corpus scan.
    *
    * The binding domain's keep-everything guarantee is CLAMPED
    * explicitly: floor(T·share/n_d·65536) can land on 65535 for
    * non-dyadic shares (double rounding), which would silently drop
    * ~1/65536 of the very domain the mixture pivots on. The binding
    * domain is detected exactly — its n_d/share_d IS the minimum T,
    * computed by the same double expression, so `=` holds bit-for-bit
    * on any IEEE engine — and gets threshold 65536 (accept all). */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
                    targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "need positive target shares")
    require(targets.map(_._2).sum <= 1.0 + 1e-9,
      s"target shares must sum to <= 1, got ${targets.map(_._2).sum}")
    def shareOf(c: Column): Column = targets.foldLeft(Option.empty[Column]) {
      case (acc, (d, sh)) =>
        Some(acc.fold(when(c === d, sh))(_.when(c === d, sh)))
    }.get // no otherwise: unlisted domains get null and drop out
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("_nd"))
    val tTotal = counts
      .withColumn("_share", shareOf(col(domainCol)))
      .filter(col("_share").isNotNull)
      .agg(min(col("_nd").cast("double") / col("_share")).as("_T"))
    val h4 = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(counts), domainCol)
      .withColumn("_share", shareOf(col(domainCol)))
      .filter(col("_share").isNotNull)
      .crossJoin(broadcast(tTotal))
      .withColumn("_thresh",
        when(col("_nd").cast("double") / col("_share") === col("_T"),
          lit(65536L))
          .otherwise(
            floor(col("_T") * col("_share") / col("_nd") * 65536)
              .cast("long")))
      .filter(h4 < col("_thresh"))
      .drop("_nd", "_share", "_T", "_thresh")
  }

  /** SQUARE-ROOT TEMPERATURE resampling (α = 1/2) — the multilingual /
    * multi-domain rebalance used by the XLM-R / mT5 family: sample
    * domain d with share ∝ n_d^α so head domains (English, web crawl)
    * are down-weighted and tail domains survive, without inverting the
    * order. α = 1/2 specifically because integer square roots keep the
    * whole decision exact: s_d = ⌊√n_d⌋ (correctly-rounded IEEE sqrt of
    * an integer, floored — bit-identical in any engine), target rows
    * for d = budget·s_d/Σs, and each row keeps iff its 16-bit md5
    * prefix clears thr_d = min(2^16, ⌊2^16·budget·s_d/(Σs·n_d)⌋). The
    * products run in DECIMAL(38,0) (128-bit lane in both engines), so
    * no budget/corpus size can overflow the threshold math; general α
    * via pow() is deliberately NOT offered — libm pow is not
    * correctly rounded and would break cross-engine reproducibility.
    *
    * The data-derived-shares sibling of [[mixtureSample]] (which takes
    * target shares as input). Sampling error vs the real target is the
    * hash-threshold granularity (2^-16) plus the isqrt floor — both
    * stated, both deterministic. Rows with a NULL domain are dropped
    * (stated, like mixtureSample's unlisted domains) and do not enter
    * the share denominator.
    *
    * Shape at scale: one combinable count per domain (domain
    * cardinality is small by definition), the Σs fold over that tiny
    * aggregate, broadcast both, then a stateless projection-filter —
    * the corpus itself never shuffles. */
  def sqrtTemperatureSample(df: DataFrame, domainCol: String, idCol: String,
                            budget: Long): DataFrame = {
    require(budget >= 1, s"need a positive row budget, got $budget")
    // NULL-domain rows are EXCLUDED up front (stated, like
    // mixtureSample's unlisted domains): they could never match the
    // domain equi-join below anyway, and counting them into Σs would
    // silently deflate every real domain's threshold — the sample
    // would under-fill the budget with no error.
    val base = df.filter(col(domainCol).isNotNull)
    val counts = base.groupBy(col(domainCol)).agg(count(lit(1)).as("_nd"))
      .withColumn("_s", floor(sqrt(col("_nd"))).cast("long"))
    val tot = counts.agg(sum(col("_s")).as("_st"))
    val h4 = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    base.join(broadcast(counts), domainCol)
      .crossJoin(broadcast(tot))
      .withColumn("_thr",
        least(lit(65536L),
          expr(s"(CAST(65536 AS DECIMAL(19,0)) * CAST($budget AS DECIMAL(19,0))" +
            " * CAST(_s AS DECIMAL(19,0)))" +
            " div (CAST(_st AS DECIMAL(19,0)) * CAST(_nd AS DECIMAL(19,0)))")))
      .filter(h4 < col("_thr"))
      .drop("_nd", "_s", "_st", "_thr")
  }

  /** PPS (probability-proportional-to-size) sampling, deterministic:
    * keep each row with probability min(1, k·w/W) where `w` is the
    * row's weight (tokens, bytes) and W the corpus total — the
    * expected sample size is ≈ k rows, but token-HEAVY documents are
    * preferentially kept, which is what a compute-budgeted training
    * subset wants (sampling documents uniformly under-weights long
    * documents' token mass).
    *
    * The budgeted sibling of [[weightedSample]]: that one pins
    * p ∝ w/w_max (sample size falls out of the data), this one pins
    * the expected SIZE k and lets inclusion probability scale to it.
    *
    * No RNG: acceptance compares the row's 16-bit md5 prefix against
    * an integer threshold — the same hash-threshold machinery as
    * [[stratifiedSample]], so the decision is reproducible row-by-row
    * on any engine with md5. All arithmetic is exact integer:
    * h·W < 65536·k·w, with h < 2¹⁶ and 65536·k·w within long for any
    * realistic budget (w·k < 2⁴⁷). Weights must be non-negative;
    * zero-weight rows are never kept.
    *
    * Shape at scale: one column-pruned aggregate for W (broadcast
    * 1-row attach), then a stateless projection-filter — no shuffle
    * of the corpus, no sort, trivially AQE/codegen friendly. */
  def ppsSample(df: DataFrame, idCol: String, weightCol: String,
                k: Long): DataFrame = {
    require(k >= 1, s"target sample size must be >= 1, got $k")
    val w = col(weightCol).cast("long")
    val total = df.agg(sum(w).as("_W"))
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.crossJoin(broadcast(total))
      .filter(h * col("_W") < lit(65536L) * lit(k) * w)
      .drop("_W")
  }

  /** Sequence PACKING (concat-then-chunk): documents are laid out
    * back-to-back per shard (ordered by `orderCol` within `shardCol`)
    * and the concatenated token stream is cut every `ctxTokens` — the
    * GPT-style packing that turns a curated corpus into fixed-length
    * training sequences. A document's pack is where it STARTS:
    * pack_id = floor(tokens_before / ctx), with tokens_before the exact
    * prefix sum of token counts; `n_boundary_docs` counts documents
    * that straddle a cut (consumers either split them or pad).
    *
    * Scale shape: one window prefix-sum partitioned by shard — shards
    * are the pipeline's distribution unit and bounded by construction
    * (a writer caps shard size), so no unpartitioned window appears —
    * then one map-side-combinable groupBy(shard, pack). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, ctxTokens: Int): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens must be positive, got $ctxTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sized = docs.select(col(shardCol).as("shard"), col(idCol).as("_id"),
      size(split(col(textCol), " ")).cast("long").as("n_tok"))
    sized
      .withColumn("before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("pack_id", (col("before") / ctxTokens).cast("long"))
      .withColumn("straddles",
        col("pack_id") <
          ((col("before") + col("n_tok") - 1) / ctxTokens).cast("long"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("_id")).as("first_doc"),
        max(col("_id")).as("last_doc"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_boundary_docs"))
  }

  /** TARGET-MIXTURE RESAMPLE (water-filling): the LARGEST subset of
    * the corpus whose per-`groupCol` composition matches
    * `targetPermille` (shares summing to 1000) — the data-mixing move
    * (Pile/DoReMi-style domain reweighting) run as exact subset
    * selection instead of importance weights. The binding constraint
    * is the scarcest domain: feasible total
    * T = min_s floor(n_s·1000 / share_s), quota_s = share_s·T div
    * 1000, and each domain keeps its quota by ascending 60-bit
    * [[graft.operators.Dedup.digest64]] of the id — a deterministic
    * uniform subset both engines rank identically. A target domain
    * ABSENT from the corpus forces T = 0 (the mixture is infeasible
    * without it — reported, not papered over); corpus domains outside
    * the target keep nothing.
    *
    * Scale shape: one combinable count per domain, a broadcast of the
    * |targets|-row quota table, and a per-domain rank. WindowGroupLimit
    * (the pre-shuffle top-k cut) only fires for LITERAL rank bounds, so
    * the operator first evaluates the quota table — a bounded,
    * |targets|-row driver action, the parameter-sized class — and
    * filters `rank <= max(quota)` as a literal (map tasks ship at most
    * max-quota rows per domain instead of the whole corpus into the
    * window sort), then applies each domain's exact quota through the
    * broadcast join. Returns one row per TARGET domain: (groupCol,
    * n_before, quota, n_kept, kept_id_sum — the selection digest the
    * oracle re-derives). Contract: idCol must be NUMERIC — kept_id_sum
    * is sum(id), and a non-numeric id would sum to NULL and coalesce to
    * 0, indistinguishable from an empty selection; enforced below so
    * the failure is a loud require, not a silent zero. (A string-keyed
    * corpus should pass digest64(id) as the id column.) */
  def mixtureResample(df: DataFrame, groupCol: String, idCol: String,
                      targetPermille: Seq[(String, Long)]): DataFrame = {
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"mixtureResample idCol '$idCol' must be numeric (kept_id_sum is " +
        s"sum(id)); got ${df.schema(idCol).dataType.simpleString} — " +
        "pass digest64(id) for non-numeric keys")
    val (quotas, ranked) = mixtureInternals(df, groupCol, idCol,
      targetPermille)
    // Bounded driver action (|targets| rows): the literal rank cap that
    // lets Spark plan the pre-shuffle WindowGroupLimit cut — the report
    // only ever reads kept rows, so the cut is lossless here (the
    // membership view below cannot take it: dropped rows ARE its
    // output).
    val maxQuota = quotas.agg(max(col("quota"))).head().getLong(0)
    val kept = ranked
      .filter(col("_rk") <= lit(maxQuota))
      .join(broadcast(quotas.select(col(groupCol), col("quota"))),
        Seq(groupCol))
      .filter(col("_rk") <= col("quota"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"),
        sum(col(idCol)).as("kept_id_sum"))
    quotas.join(kept, Seq(groupCol), "left")
      .select(col(groupCol), col("n_before"), col("quota"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
  }

  /** Per-row membership view of [[mixtureResample]]'s selection: every
    * TARGET-domain row with its verdict — `(groupCol, idCol, kept)` —
    * for audits that need the kept/dropped split itself (q252's
    * selection-bias check) rather than the per-domain report. Same
    * water-filling quotas, same digest ranking; untargeted domains are
    * absent (they keep nothing by contract). */
  def mixtureMembers(df: DataFrame, groupCol: String, idCol: String,
                     targetPermille: Seq[(String, Long)]): DataFrame = {
    val (quotas, ranked) = mixtureInternals(df, groupCol, idCol,
      targetPermille)
    ranked
      .join(broadcast(quotas.select(col(groupCol), col("quota"))),
        Seq(groupCol))
      .select(col(groupCol), col(idCol),
        (col("_rk") <= col("quota")).as("kept"))
  }

  /** Shared core: the quota table and every target-domain row with its
    * per-domain digest rank `_rk`. The report path cuts at the literal
    * max quota (WindowGroupLimit); the membership path ranks every row
    * by necessity — dropped rows are its output. */
  private def mixtureInternals(df: DataFrame, groupCol: String,
                               idCol: String,
                               targetPermille: Seq[(String, Long)])
      : (DataFrame, DataFrame) = {
    require(targetPermille.nonEmpty &&
      targetPermille.map(_._2).sum == 1000L &&
      targetPermille.forall(_._2 > 0) &&
      targetPermille.map(_._1).distinct.size == targetPermille.size,
      "target shares must be distinct domains with positive permille " +
        s"summing to 1000, got $targetPermille")
    val sp = df.sparkSession
    import sp.implicits._
    val target = targetPermille.toDF(groupCol, "share")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_before"))
    val sized = target.join(counts, Seq(groupCol), "left")
      .select(col(groupCol), col("share"),
        coalesce(col("n_before"), lit(0L)).as("n_before"))
    val tFeasible = sized
      .agg(min(expr("n_before * 1000 div share")).as("t_total"))
    val quotas = sized.crossJoin(tFeasible)
      .select(col(groupCol), col("n_before"),
        expr("share * t_total div 1000").as("quota"))
      .localCheckpoint() // evaluated once: feeds the literal cap AND the join
    val w = Window.partitionBy(groupCol)
      .orderBy(col("_h"), col(idCol))
    // Untargeted domains keep nothing — filter them out BEFORE the
    // digest/rank shuffle, not after (the target list is a bounded
    // parameter, so this is a pushed-down isin, not a join).
    val ranked = df
      .filter(col(groupCol).isin(targetPermille.map(_._1): _*))
      .select(col(groupCol), col(idCol),
        Dedup.digest64(col(idCol).cast("string")).as("_h"))
      .withColumn("_rk", row_number().over(w))
    (quotas, ranked)
  }

  /** PADDING-WASTE AUDIT for length-bucketed training batches: when
    * sequences are grouped into power-of-two-ish length buckets and
    * padded to the bucket cap (the standard dynamic-batching recipe),
    * how many tokens does each bucket burn as pad, and how many are
    * lost to truncation at the longest cap? This is the table that
    * decides the bucket ladder before a 100 TB tokenization run —
    * padding is paid in FLOPs on every epoch.
    *
    * `buckets` is the ascending cap ladder; a document's cap is the
    * first bucket ≥ its (truncated) token count, tokens beyond the
    * last cap are truncated (counted, not silently dropped). Pure
    * integer projection + one combinable aggregate over ≤ |buckets|
    * groups; waste = 1000·pad div (pad + kept) per bucket.
    * Returns (bucket_cap, n_docs, sum_tokens, sum_padding,
    * sum_truncated, waste_permille) ordered by cap. */
  def paddingAudit(docs: DataFrame, textCol: String,
                   buckets: Seq[Long]): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted &&
      buckets.distinct == buckets && buckets.head >= 1,
      "buckets must be ascending, distinct, positive")
    val maxLen = buckets.last
    val n = size(split(col(textCol), " ")).cast("long")
    val kept = least(n, lit(maxLen))
    val cap = buckets.init.reverse.foldLeft(lit(maxLen): Column) {
      (acc, b) => when(kept <= b, lit(b)).otherwise(acc)
    }
    docs.select(n.as("_n"), kept.as("_kept"), cap.as("_cap"))
      .groupBy(col("_cap").as("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_kept")).as("sum_tokens"),
        sum(col("_cap") - col("_kept")).as("sum_padding"),
        sum(col("_n") - col("_kept")).as("sum_truncated"))
      .withColumn("waste_permille",
        expr("(1000 * sum_padding) div (sum_padding + sum_tokens)"))
      .orderBy("bucket_cap")
  }

  /** Corpus vocabulary: the `topK` most frequent tokens with their
    * counts and frequency rank (count desc, token asc). The classic
    * pre-tokenizer frequency pass — one hash-shuffle on the token.
    *
    * The global top-k is `orderBy().limit(topK)`, which Spark plans as
    * TakeOrderedAndProject: each partition keeps a topK heap and only
    * topK rows reach the driver-side merge — no single-partition global
    * sort of the whole vocabulary (a `row_number().over(Window.orderBy)`
    * would move EVERY distinct token to one task). Ranking then touches
    * only the ≤topK survivors: they are collected into one sorted array
    * and position-exploded, so the plan carries no unpartitioned window
    * at all. */
  def vocabulary(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    // The topK survivors are ranked through one collect_list array in a
    // single task — bounded memory only because topK is bounded. Guard
    // the assumption rather than silently re-creating the single-task
    // global sort this operator exists to avoid.
    require(topK > 0 && topK <= 1000000,
      s"vocabulary topK must be in [1, 1e6], got $topK — an unbounded " +
        "top-k would funnel the whole vocabulary through one task")
    val top = docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topK)
    // (count desc, token asc) ≡ ascending struct order on (-n, token);
    // the aggregate sees at most topK rows.
    top
      .agg(array_sort(collect_list(struct((-col("n")).as("negn"),
        col("token")))).as("ts"))
      .select(posexplode(col("ts")).as(Seq("pos", "s")))
      .select(col("s.token").as("token"), (-col("s.negn")).as("n"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** SOURCE-MIXTURE CONCENTRATION REPORT: per-domain row counts and
    * corpus shares plus the Herfindahl–Hirschman concentration index
    * (HHI = Σ pᵢ²) and its inverse, the EFFECTIVE NUMBER of domains —
    * the one-line answer to "is this mixture five sources or really
    * one source wearing five labels". Shannon entropy is deliberately
    * NOT emitted: ln() is not correctly-rounded and differs across
    * libm implementations, so an entropy sum cannot satisfy a
    * bit-identical cross-engine contract; HHI is exact rational
    * arithmetic and carries the same signal (1/HHI ≈ perplexity of
    * the mixture).
    *
    * Shape at scale: one map-side-combinable count per domain; the
    * global moments aggregate the tiny domain frame and attach back
    * as a broadcast 1-row cross join. Squares accumulate in
    * DECIMAL(19,0)×DECIMAL(19,0) — exact to 10³⁸, and width-legal in
    * engines that bound decimal multiply at 38 digits. A NULL domain
    * is a domain (usually the interesting one). All derived ratios
    * are one double division of exact integers — deterministic.
    *
    * Output: (domain, n_rows, share_micro, hhi, effective_domains),
    * the last two repeated per row (they are corpus-global). */
  def mixtureConcentration(df: DataFrame, domainCol: String): DataFrame = {
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    // Two consumers (per-domain rows + the global moments); without
    // the checkpoint the global aggregate re-runs the corpus count —
    // a second full scan for a domain-cardinality frame.
    val counts = df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_rows"))
      .localCheckpoint()
    val g = counts.agg(
      sum("n_rows").as("_N"),
      sum(col("n_rows").cast(d19) * col("n_rows").cast(d19)).as("_ssq"))
    val nn = col("_N").cast("double") * col("_N").cast("double")
    val globals = g.select(col("_N"),
      (col("_ssq").cast("double") / nn).as("hhi"),
      (nn / col("_ssq").cast("double")).as("effective_domains"))
    counts.crossJoin(broadcast(globals))
      .select(col("domain"), col("n_rows"),
        floor(lit(1000000L) *
          (col("n_rows").cast("double") / col("_N").cast("double")))
          .as("share_micro"),
        col("hhi"), col("effective_domains"))
  }

  /** OVERLAPPING DOCUMENT CHUNKING — the RAG/embedding-prep shape: cut
    * each document into windows of `chunkTokens` tokens advancing by
    * `stride` (< chunk ⇒ consecutive chunks overlap, the standard
    * retrieval recipe so no answer span straddles a cut unseen). One
    * chunk row per window: ordinal, token count, and a content digest
    * (the dedup/embedding key downstream stages join on).
    *
    * Scale shape: a pure narrow projection — posexplode of a per-row
    * sequence; no shuffle, no state, parallel at parquet-split grain.
    * Chunk text is NOT carried by default (the digest is — at 100 TB
    * materializing overlapped text multiplies the corpus by
    * chunk/stride; downstream re-derives text from (doc, offset) when
    * it actually needs it). Every doc emits ≥ 1 chunk (a short doc is
    * one short chunk; a NULL text is treated as empty — one chunk of
    * the single empty token, identically in both engines, rather than
    * silently vanishing through split(NULL) → posexplode). Output:
    * (idCol, chunk_ord, start_tok, n_tok, chunk_digest). */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride in [1, chunkTokens], got $stride — a stride above the " +
        "chunk size silently drops tokens between windows")
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)),
      lit(stride))
    docs
      .select(col(idCol), toks.as("_t"),
        posexplode(starts).as(Seq("chunk_ord", "_start")))
      .select(col(idCol), col("chunk_ord").cast("long").as("chunk_ord"),
        col("_start").cast("long").as("start_tok"),
        least(lit(chunkTokens.toLong), size(col("_t")) - col("_start"))
          .cast("long").as("n_tok"),
        md5(concat_ws(" ",
          slice(col("_t"), col("_start") + 1, lit(chunkTokens))))
          .as("chunk_digest"))
  }

  /** Corpus-level report over [[chunkDocs]]: per group, how many
    * chunks the corpus becomes and what the overlap costs —
    * overhead_permille = 1000·(chunk_tokens − doc_tokens) div
    * doc_tokens, the storage/compute multiplier the stride choice
    * buys. One chunking pass + one combinable aggregate. */
  def chunkingReport(docs: DataFrame, idCol: String, textCol: String,
                     groupCol: String, chunkTokens: Int,
                     stride: Int): DataFrame = {
    val chunks = chunkDocs(docs, idCol, textCol, chunkTokens, stride)
      .groupBy(idCol)
      .agg(count(lit(1)).as("_nc"), sum(col("n_tok")).as("_ct"))
    docs
      .select(col(groupCol).as("grp"), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("_dt"))
      .join(chunks, Seq(idCol))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nc")).as("n_chunks"),
        sum(col("_dt")).as("doc_tokens"),
        sum(col("_ct")).as("chunk_tokens"))
      .select(col("grp"), col("n_docs"), col("n_chunks"),
        col("doc_tokens"), col("chunk_tokens"),
        expr("(1000 * (chunk_tokens - doc_tokens)) div doc_tokens")
          .as("overhead_permille"))
  }
}
