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
}
