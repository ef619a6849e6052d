package graft.lineage

import org.apache.spark.sql.SparkSession

/** Pluggable sink-schema source (SURVEY.md §2.1 S11). The reference
  * fetches destination-table columns from live JDBC metadata behind a
  * multi-datasource SPI (`MetaDataQueryImpl.java:29-44`); graft makes
  * the lookup a one-method trait so a JDBC / Hive-metastore / REST
  * catalog implementation can replace the default session-catalog one
  * without touching the parser.
  */
trait MetadataProvider {

  /** Ordered column names of `table` (db-qualified `db.tbl`), or Nil
    * when the table is unknown — lineage then degrades to the
    * ordinal-only destination path, same as the reference's
    * unknown-sink behavior. */
  def tableColumns(table: String): Seq[String]
}

/** Default provider backed by the Spark session catalog. Temp views are
  * not db-scoped, so a `default.`-qualified name falls back to the bare
  * view name. */
final class CatalogMetadataProvider(spark: SparkSession) extends MetadataProvider {
  def tableColumns(table: String): Seq[String] = {
    def fields(n: String) = spark.table(n).schema.map(_.name).toSeq
    try fields(table)
    catch {
      case _: Exception =>
        val bare = table.split('.').last
        try fields(bare) catch { case _: Exception => Nil }
    }
  }
}
