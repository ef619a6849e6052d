package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout: Morton (Z-order) interleaving of
  * two bounded integer dimensions.
  *
  * Why it belongs in a 100 TB engine: parquet file skipping prunes on
  * per-file min/max column stats, which a sort can only make tight for
  * its LEADING column. Sorting by the Morton code of (x, y) instead
  * tiles the (x, y) plane — every run of 4^k consecutive z-values is a
  * 2^k × 2^k square — so files get tight min/max bounds on BOTH
  * columns and selective predicates on either dimension skip files.
  * The repo's write-side layout queries (q70 directory partitioning,
  * q71 bucketing) cover coarse pruning; z-ordering is the fine-grained
  * complement for range predicates on two correlated scan columns
  * (`repartitionByRange(zval) + sortWithinPartitions(zval)` before the
  * write at scale).
  *
  * Pure bit arithmetic (shift/and/or) — codegen'd, zero shuffle, and
  * bit-identical in any engine that has `>>`/`&`, which is what the
  * q85 oracle recomputes.
  */
object Layout {

  /** Morton code of two non-negative columns, `bits` bits each
    * (columns must already be bounded below 2^bits, e.g. via `% 1024`
    * for bits=10). Bit i of x lands at position 2i, bit i of y at
    * 2i+1. */
  def morton(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "morton supports 1..31 bits per dim")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The same interleave as ANSI SQL text (for oracles / pushdown into
    * engines that speak `>>` and `&`), over column names `x` and `y`. */
  def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** ZONE MAP over a dataset laid out in `zoneExpr`-sized units (a
    * stand-in for files/row-groups): per zone, row count and min/max
    * of each stats column, plus whether a `[lo, hi]` range predicate
    * on the FIRST stats column can skip the zone entirely
    * (`hi < min ∨ lo > max` — the parquet footer-stats pruning rule,
    * made inspectable). The skipped-zone share is the measure of how
    * good a layout is for a predicate — this is the auditing companion
    * to the write-side layout ops (q70/q71/q85): compute it BEFORE
    * rewriting 100 TB into a new sort order, on a sample, to know
    * what the rewrite buys.
    *
    * One map-side-combinable aggregation; zones are metadata-sized
    * (one row each), never data-sized. */
  def zoneMap(df: org.apache.spark.sql.DataFrame, zoneExpr: Column,
              statsCol: Column, lo: Column, hi: Column): org.apache.spark.sql.DataFrame =
    df.groupBy(zoneExpr.as("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(statsCol).as("min_v"),
        max(statsCol).as("max_v"))
      .withColumn("skippable", hi < col("min_v") || lo > col("max_v"))
}
