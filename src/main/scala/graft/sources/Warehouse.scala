package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse layout helpers — the source/sink half of the engine
  * (builder brief: "every operator, source/sink"). The reference's only
  * connector is a JDBC metadata lookup (SURVEY.md §3.3, replaced by the
  * session catalog); these are the layouts a 100 TB deployment actually
  * reads and writes:
  *
  *  - **Date-partitioned datasets** (`writeDatePartitioned`): one
  *    directory per day → time-range predicates become partition
  *    pruning (the scan lists only matching directories; verify via
  *    `PartitionFilters` in `.explain`).
  *  - **Bucketed tables** (`writeBucketed`): pre-hashed on the join
  *    key → equi-joins between tables bucketed on the same key skip
  *    the shuffle entirely (SortMergeJoin without Exchange).
  *
  * Both are thin, deliberate wrappers over the DataFrameWriter API —
  * the value is the layout contract, documented and spec-tested, not
  * the code volume.
  */
object Warehouse {

  /** Write `df` partitioned by the DATE of `tsCol` (directory per day).
    * The partition column is materialized as `p_date`. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String,
                           mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(mode)
      .partitionBy("p_date")
      .parquet(path)

  /** Read a date-partitioned dataset. Filters on `p_date` prune
    * directories before any data I/O. */
  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist `df` as a bucketed, sorted table in the session catalog.
    * Joins/aggregations on `keyCol` between tables with identical
    * bucketing read co-located data with no shuffle. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
}
