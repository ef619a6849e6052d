package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contract pins for the schema-only in-memory catalog — the
  * second-catalog fixture behind the three-part lineage encoding
  * (corpus statements 41-43). The catalog must behave like a real
  * `CatalogPlugin` for everything analysis touches: DDL round-trips,
  * duplicate/missing names fail by NAME, tables read as empty. */
class MemoryCatalogSpec extends SparkTestBase {

  private def ready(): Unit = {
    spark.conf.set("spark.sql.catalog.memcat",
      classOf[MemoryCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS memcat.db1")
    spark.sql(
      "CREATE TABLE IF NOT EXISTS memcat.db1.t1 (k BIGINT, v STRING)")
  }

  test("create / load / describe / drop round-trip") {
    ready()
    assert(spark.table("memcat.db1.t1").schema.map(_.name) ==
      Seq("k", "v"))
    spark.sql("CREATE TABLE memcat.db1.tmp (x INT)")
    assert(spark.table("memcat.db1.tmp").schema.map(_.name) == Seq("x"))
    spark.sql("DROP TABLE memcat.db1.tmp")
    val gone = intercept[Exception](spark.table("memcat.db1.tmp"))
    assert(gone.getMessage.contains("tmp"))
  }

  test("duplicate creation fails by name; IF NOT EXISTS is idempotent") {
    ready()
    val dup = intercept[Exception](
      spark.sql("CREATE TABLE memcat.db1.t1 (z INT)"))
    assert(dup.getMessage.toLowerCase.contains("already exists"))
    // idempotent re-registration — what registerFixtures relies on
    spark.sql("CREATE TABLE IF NOT EXISTS memcat.db1.t1 (z INT)")
    assert(spark.table("memcat.db1.t1").schema.map(_.name) ==
      Seq("k", "v"), "IF NOT EXISTS must keep the original schema")
  }

  test("tables read as EMPTY — the honest schema-only contract") {
    ready()
    // zero input partitions, so the scan plans and returns no rows
    assert(spark.table("memcat.db1.t1").count() == 0L)
    assert(spark.sql(
      "SELECT k FROM memcat.db1.t1 WHERE k > 0").collect().isEmpty)
  }

  test("namespaces list and protect their tables") {
    ready()
    val ns = spark.sql("SHOW NAMESPACES IN memcat").collect()
      .map(_.getString(0))
    assert(ns.contains("db1"))
    val tables = spark.sql("SHOW TABLES IN memcat.db1").collect()
      .map(_.getString(1))
    assert(tables.contains("t1"))
    // non-cascade drop of a non-empty namespace must refuse
    val full = intercept[Exception](
      spark.sql("DROP NAMESPACE memcat.db1"))
    assert(full.getMessage.toLowerCase.contains("not empty") ||
      full.getMessage.toLowerCase.contains("non-empty"))
  }

  test("forWrite zips destination columns against the v2 sink's schema") {
    // The S10 ordinal-zip through a THREE-PART sink: the metadata
    // provider resolves the v2 table via spark.table, so write-side
    // lineage names catalog-qualified destination columns.
    ready()
    graft.Tables.registerAll(spark, sfDir)
    val df = spark.table("nation")
      .select(col("n_nationkey"), col("n_name"))
    val r = graft.lineage.LineageParser.forWrite(df, "memcat.db1.t1")
    assert(r.outputTables == Set("memcat.db1.t1"))
    assert(r.colLines.map(c => (c.colName.getOrElse(""), c.fromName)).toSet
      == Set(
        ("memcat.db1.t1.k", "default.nation.n_nationkey"),
        ("memcat.db1.t1.v", "default.nation.n_name")))
  }
}
