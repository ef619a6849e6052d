package graft.operators

import org.apache.spark.sql.DataFrame
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
}
