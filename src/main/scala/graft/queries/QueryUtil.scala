package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query surface.
  *
  * Oracle determinism (SURVEY.md §7.4): the driver hash-compares our
  * results against DuckDB, so every floating-point aggregate must be
  * bit-identical across engines. Summing doubles is order-dependent, so
  * money/quantity arithmetic is done in exact DECIMAL and only the final
  * aggregate is cast back to double — both engines then produce the same
  * mathematical value and hence the same IEEE-754 double.
  */
object QueryUtil {
  /** Exact-decimal view of a double column. Scale 3 so 2-decimal money
    * values never land on a rounding halfway point (SURVEY.md §7.4 #5). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 3))

  /** Decimal literal 1 for `1 - discount` style arithmetic. */
  val decOne: Column = lit(1).cast(DecimalType(18, 3))

  /** UTC timestamp literal (session timezone is fixed to UTC). */
  def ts(s: String): Column = lit(s).cast("timestamp")

  /** Deterministic average: CAST(sum(decimal) AS DOUBLE) / count — both
    * engines divide the same two exact numbers. (Plain avg() differs:
    * Spark returns decimal, DuckDB double.) */
  def avgExact(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))
}
