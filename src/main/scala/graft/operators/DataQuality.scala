package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality gate: each check is a named DataFrame of
  * VIOLATING rows; the report is one (rule, n_violations) row per
  * rule — the verification pass a pipeline runs before promoting a
  * snapshot.
  *
  * Scale shape: every check aggregates to a single count with
  * map-side partials; domain checks are scan-narrow filters, and
  * referential checks are left-anti joins that broadcast the key side
  * when small or shuffle on the key when not — nothing materializes
  * violating rows unless a check is drilled into. The union of
  * single-row aggregates costs nothing. Checks compose: callers pass
  * any (name, violations) list, so table-specific rules live with the
  * tables, not the operator.
  */
object DataQuality {

  def report(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    checks.map { case (name, violations) =>
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"))
    }.reduce(_ union _)
  }

  /** SNAPSHOT PROFILE DRIFT: column-level comparison of two snapshots
    * of the same table — the report a pipeline publishes before
    * promoting `after` over `before` (did a null rate spike, did the
    * value range shift, did cardinality collapse). Composes
    * [[Stats.profileNumeric]] on each side (one aggregate pass per
    * snapshot — two scans total, which is the floor for two inputs)
    * and joins the two per-column frames, which are |cols| rows.
    *
    * Null rates are integer permille; means divide the exact-decimal
    * sum by the exact non-null count (one double division —
    * deterministic); min/max deltas subtract two exact-cast doubles.
    * Output: (col_name, n_rows_a, n_rows_b, null_permille_a,
    * null_permille_b, distinct_delta, mean_a, mean_b, min_delta,
    * max_delta). */
  def profileDrift(before: DataFrame, after: DataFrame,
                   cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, tag: String) =
      Stats.profileNumeric(df, cols).select(
        col("col_name"),
        col("n_rows").as(s"n_rows_$tag"),
        col("n_nulls").as(s"n_nulls_$tag"),
        col("n_distinct").as(s"n_distinct_$tag"),
        col("min_v").as(s"min_$tag"), col("max_v").as(s"max_$tag"),
        col("sum_v").as(s"sum_$tag"))
    side(before, "a").join(side(after, "b"), Seq("col_name"))
      .select(col("col_name"),
        col("n_rows_a"), col("n_rows_b"),
        expr("(1000 * n_nulls_a) div n_rows_a").as("null_permille_a"),
        expr("(1000 * n_nulls_b) div n_rows_b").as("null_permille_b"),
        (col("n_distinct_b") - col("n_distinct_a")).as("distinct_delta"),
        (col("sum_a") / (col("n_rows_a") - col("n_nulls_a")
          .cast("double"))).as("mean_a"),
        (col("sum_b") / (col("n_rows_b") - col("n_nulls_b")
          .cast("double"))).as("mean_b"),
        (col("min_b") - col("min_a")).as("min_delta"),
        (col("max_b") - col("max_a")).as("max_delta"))
  }

  /** FUNCTIONAL-DEPENDENCY AUDIT: does `lhsCol` determine `rhsCol`?
    * The data-contract check behind "source implies language",
    * "order key implies customer" — an FD that mostly holds but not
    * quite usually means a join fanned out or an ingest mixed two
    * feeds. Reports, per violating lhs value (capped at `topN` by
    * violation mass): the distinct rhs count and row count; plus the
    * caller reads total violation mass from the rows.
    *
    * Shape: one combinable (lhs, rhs) count, then lhs-level rollup of
    * that value-pair frame — corpus scanned once, only value pairs
    * shuffle. NULL lhs is a key (reported like any value); NULL rhs
    * counts as a distinct value via the <=> grouping semantics of the
    * pair count. Output: (lhs value as string, n_rows, n_rhs_values),
    * only lhs values with n_rhs_values > 1, hottest first with
    * (n_rows desc, lhs asc) determinism. */
  def fdAudit(df: DataFrame, lhsCol: String, rhsCol: String,
              topN: Int): DataFrame = {
    require(topN >= 1 && topN <= 100000, s"topN in [1,1e5], got $topN")
    df.select(col(lhsCol).cast("string").as("lhs"),
        col(rhsCol).cast("string").as("_rhs"))
      .groupBy("lhs", "_rhs").agg(count(lit(1)).as("_c"))
      .groupBy("lhs")
      .agg(sum(col("_c")).as("n_rows"),
        count(lit(1)).as("n_rhs_values"))
      .filter(col("n_rhs_values") > 1)
      .orderBy(col("n_rows").desc, col("lhs").asc_nulls_first)
      .limit(topN)
  }

  /** REFERENTIAL-INTEGRITY AUDIT: child rows whose foreign key has no
    * parent — per child table relation, the orphan count and rate.
    * NULL foreign keys are counted separately (a NULL FK is a policy
    * question, not an orphan). One left-anti join on the key (parent
    * side deduplicated to distinct keys first, so the anti join probes
    * a key set, not the parent table). Output one row:
    * (n_child, n_null_fk, n_orphans, orphan_permille — of the
    * non-NULL rows). */
  def refIntegrity(child: DataFrame, fkCol: String,
                   parent: DataFrame, pkCol: String): DataFrame = {
    val nonNull = child.filter(col(fkCol).isNotNull)
    val keys = parent.select(col(pkCol).as("_pk")).distinct()
    val orphans = nonNull
      .join(keys, col(fkCol) === col("_pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val totals = child.agg(count(lit(1)).as("n_child"),
      sum(when(col(fkCol).isNull, 1L).otherwise(0L)).as("n_null_fk"))
    totals.crossJoin(broadcast(orphans))
      .select(col("n_child"), col("n_null_fk"), col("n_orphans"),
        expr("(1000 * n_orphans) div (n_child - n_null_fk)")
          .as("orphan_permille"))
  }

  /** Expected Benford first-digit shares, permille: floor(1000·
    * log10(1 + 1/d)) for d = 1..9 — literals, so no transcendental
    * function ever evaluates in-plan (engine-portable by
    * construction). */
  val benfordMilli: Seq[Long] =
    Seq(301L, 176L, 124L, 96L, 79L, 66L, 57L, 51L, 45L)

  /** BENFORD FIRST-DIGIT AUDIT of a positive numeric column — the
    * classic fabricated-data / unit-mix detector: organically grown
    * magnitudes follow log-uniform first digits; synthetic, capped, or
    * unit-mixed columns do not. Values are scaled to integer
    * `cents` (×100 floor) and the first digit is taken from the
    * BIGINT's decimal string — never from double formatting, which is
    * not engine-portable. Non-positive and NULL values are excluded
    * (Benford is only defined on positive magnitudes; their count is
    * n_excluded in every row for visibility). The cents scaling sets
    * the audit's resolution floor: POSITIVE values below 0.01 floor to
    * zero cents and are counted in n_excluded too — right for
    * currency-like columns (the intended domain); a column whose
    * magnitudes live below 0.01 needs pre-scaling by the caller, not
    * this audit as-is.
    *
    * Output per digit 1..9: (digit, n, observed_milli,
    * benford_milli, delta_milli) — one combinable 9-group count over
    * a narrow projection. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val cents = floor(col(valueCol).cast("double") * 100).cast("long")
    val base = df.select(cents.as("_v"))
    val counts = base.filter(col("_v") > 0)
      .select(substring(col("_v").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val totals = base.agg(
      sum(when(col("_v") > 0, 1L).otherwise(0L)).as("_npos"),
      sum(when(col("_v") > 0, 0L).otherwise(1L)).as("n_excluded"))
    val expected = benfordMilli.zipWithIndex.map { case (m, i) =>
      struct(lit(i + 1L).as("digit"), lit(m).as("benford_milli"))
    }
    counts
      .join(df.sparkSession.range(1)
        .select(explode(array(expected: _*)).as("_e"))
        .select(col("_e.digit"), col("_e.benford_milli")),
        Seq("digit"), "right")
      .crossJoin(broadcast(totals))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        expr("(1000 * coalesce(n, 0)) div _npos").as("observed_milli"),
        col("benford_milli"),
        (expr("(1000 * coalesce(n, 0)) div _npos") - col("benford_milli"))
          .as("delta_milli"),
        col("n_excluded"))
      .orderBy("digit")
  }

  /** KEY-SKEW AUDIT of a join/aggregation key — the pre-flight that
    * answers "does this key need salting (or an AQE skew-join) before
    * I shuffle 100 TB on it": the top-k heaviest keys with their
    * permille share of all rows, plus the Gini concentration
    * coefficient of the full group-size distribution (0 = perfectly
    * even keys, →1 = a handful of keys own the table).
    *
    * Exact Gini without a global sort over keys: group sizes are
    * histogrammed into sizes-of-sizes (distinct size s → m_s keys),
    * and because equal-sized keys are interchangeable in the rank sum,
    * Σ rank·size telescopes per block — s·(m·r₀ + m(m+1)/2) with r₀ =
    * keys before the block. The only window runs over DISTINCT SIZE
    * VALUES (bounded by the size spectrum, not by |keys|), and the
    * top-k pick is orderBy+limit, which Spark plans as
    * TakeOrderedAndProject (per-partition top-k, driver merge) — no
    * single-partition sort anywhere. Rank-sum products run in
    * DECIMAL(38,0) so Σrank·size cannot overflow at |keys|·|rows|
    * scale; the milli outputs come back through integral `div`.
    *
    * NULL keys group like any other value (a heavy NULL is exactly the
    * kind of skew this audit exists to surface). Output, one row per
    * top key: (keyCol, rank, n, share_permille, gini_milli, n_keys,
    * n_rows). */
  def keySkew(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1 && topK <= 10000,
      s"topK must be in [1,10000], got $topK")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val sizes = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val hist = sizes.groupBy("n").agg(count(lit(1)).as("m"))
    val wSz = Window.orderBy("n") // distinct sizes only — tiny frame
    val g = hist
      .withColumn("_r0", sum(col("m")).over(wSz) - col("m"))
      .agg(
        sum(col("m")).as("n_keys"),
        sum(col("n").cast(dec38) * col("m")).as("_rows"),
        sum(col("n").cast(dec38) *
          (col("m").cast(dec38) * col("_r0") +
            expr("CAST(m AS DECIMAL(38,0)) * (m + 1) div 2")))
          .as("_iwx"))
      .select(col("n_keys"), col("_rows").cast("long").as("n_rows"),
        expr("""(1000 * (2 * _iwx - (n_keys + 1) * _rows))
                div (CAST(n_keys AS DECIMAL(38,0)) * _rows)""")
          .as("gini_milli"))
    // Tie-break NULLS LAST explicitly: Spark's bare asc sorts NULLs
    // first while DuckDB's default is NULLS LAST — a heavy NULL key
    // tying at a rank boundary must order identically in both engines.
    val top = sizes.orderBy(col("n").desc, col(keyCol).asc_nulls_last)
      .limit(topK)
    top
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n").desc, col(keyCol).asc_nulls_last))
        .cast("long")) // ≤ topK rows: the window is driver-cheap
      .crossJoin(broadcast(g))
      .select(col(keyCol), col("rank"), col("n"),
        expr("(1000 * n) div n_rows").as("share_permille"),
        col("gini_milli"), col("n_keys"), col("n_rows"))
      .orderBy("rank")
  }
}
