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

  /** Write `df` as headered CSV. CSV is the interchange format of last
    * resort: strings containing the delimiter/quote/newline are quoted
    * and escaped by the writer, but empty string and null collapse to
    * the same cell — use [[writeJsonLines]] when that distinction (or a
    * nested schema) matters. */
  def writeCsv(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** Read a headered CSV dataset with an explicit schema — never
    * inferSchema: inference is an extra full pass over the data and can
    * flip types between runs. `multiLine` handles quoted embedded
    * newlines (disables input-split parallelism within a file, which is
    * the price of newlines in CSV fields). */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType,
              multiLine: Boolean = false): DataFrame =
    spark.read.option("header", "true").option("multiLine", multiLine.toString)
      .schema(schema).csv(path)

  /** Write `df` as ORC — the columnar alternative to parquet when the
    * surrounding warehouse is ORC-native (Hive heritage, the
    * reference's own ecosystem). Same predicate-pushdown/column-
    * pruning/min-max-stats properties through Spark's vectorized ORC
    * reader; the engine treats the two interchangeably. */
  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Read an ORC dataset (self-describing schema, like parquet). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write `df` as JSON Lines — lossless for strings (newlines and
    * quotes escape), nullable-safe, nested-schema-safe; one object per
    * line keeps files splittable. */
  def writeJsonLines(df: DataFrame, path: String,
                     mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Read JSON Lines with an explicit schema (no inference pass). */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

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

  /** Write `df` to an RDBMS table over JDBC — the executable sink
    * behind the reference's only real connector (its JDBC metadata SPI,
    * `service/MetaDataQueryImpl.java:29-44`, resolves columns for
    * exactly such tables; [[graft.lineage.JdbcMetadataProvider]] is the
    * lookup half, this is the data half).
    *
    * Scale contract: JDBC is the DIMENSION/RESULT-scale edge of the
    * warehouse (reference tables in, aggregates out), not a corpus
    * store — writes funnel through `numPartitions` connections (default
    * 1: most RDBMS ingest paths prefer one well-batched writer;
    * `batchsize` covers the rest). Corpus-scale data belongs in the
    * columnar layouts above. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
                numPartitions: Int = 1,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.coalesce(numPartitions).write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .mode(mode).save()

  /** Read an RDBMS table over JDBC. Catalyst pushes filters and column
    * pruning into the generated SQL (`PushedFilters` in `.explain`
    * become the remote WHERE clause); for large remote tables pass
    * `partitionColumn` bounds via the options overloads of
    * `spark.read.jdbc` to parallelize the range scan — this helper is
    * the single-partition reference/dimension path. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .load()
}
