package graft.lineage

import java.sql.DriverManager

import graft.SparkTestBase

/** S11 parity: sink schemas from live JDBC metadata, tested against an
  * embedded Derby database (ships with Spark for the Hive metastore) —
  * the same `DatabaseMetaData.getColumns` call the reference makes
  * (`MetaDataQueryImpl.java:29-44`), no dialect SQL involved. */
class JdbcMetadataProviderSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftmeta;create=true"
  private def connect() = DriverManager.getConnection(url)

  private lazy val setup: Unit = {
    val c = connect()
    try {
      val st = c.createStatement()
      // quoted identifiers: Derby folds unquoted names to UPPER; the
      // quoted form pins the exact case lineage strings will carry
      st.executeUpdate(
        """CREATE TABLE ext_sink ("d_key" INT, "d_name" VARCHAR(32),
                                  "d_val" DOUBLE)""")
      // underscore-wildcard decoy: an unescaped LIKE pattern for
      // "ext_sink" would ALSO match this table and interleave its
      // columns into the ordinal zip
      st.executeUpdate("""CREATE TABLE extasink ("z_other" INT)""")
    } finally c.close()
  }

  private def provider = { setup; new JdbcMetadataProvider(() => connect()) }

  test("columns come back in ordinal order from DatabaseMetaData") {
    // must NOT pick up `extasink` — `_` is a LIKE wildcard in JDBC
    // metadata patterns and has to be escaped or the two tables'
    // columns interleave silently
    assert(provider.tableColumns("ext_sink") ==
      Seq("d_key", "d_name", "d_val"))
  }

  test("db-qualified names fall back across schemas; unknown tables are Nil") {
    // `default.ext_sink`: no DEFAULT schema server-side, so the lookup
    // degrades to the reference's any-schema pattern and still resolves
    assert(provider.tableColumns("default.ext_sink") ==
      Seq("d_key", "d_name", "d_val"))
    assert(provider.tableColumns("default.nope") == Nil)
  }

  test("INSERT lineage resolves destination columns through JDBC") {
    // the sink exists ONLY in the external database — the round-5 gap:
    // the session catalog can't name its columns, JDBC metadata can
    graft.Tables.registerAll(spark, sfDir)
    val r = LineageParser.parseStatement(spark,
      "INSERT INTO ext_sink SELECT n_nationkey, n_name FROM nation",
      1, metadata = Some(provider))
    val byTo = r.colLines.map(c => c.toName -> c.colName).toMap
    assert(byTo("n_nationkey") == Some("default.ext_sink.d_key"))
    assert(byTo("n_name") == Some("default.ext_sink.d_name"))
    assert(r.outputTables == Set("default.ext_sink"))
  }

  test("dialect registry: reference URL shapes, alias-aware lookup, named failure") {
    // the URL templates mirror DataSourceUtils.getURL's shapes
    assert(JdbcDialects.MySql.url("sales") == "jdbc:mysql://localhost:3306/sales")
    assert(JdbcDialects.PostgreSql.url("sales", "db1", 6432) ==
      "jdbc:postgresql://db1:6432/sales")
    assert(JdbcDialects.OpenGauss.url("g") == "jdbc:opengauss://localhost:5431/g")
    assert(JdbcDialects.Oracle.url("orcl") ==
      "jdbc:oracle:thin:@//localhost:1521/orcl")
    assert(JdbcDialects.SqlServer.url("dw") ==
      "jdbc:sqlserver://localhost:1433;DatabaseName=dw")
    assert(JdbcDialects.H2.url("t") ==
      "jdbc:h2:mem:t;DB_CLOSE_DELAY=-1;DATABASE_TO_UPPER=false;MODE=MYSQL")
    // alias + case-insensitive matching (TypeSPIRegistry.matchesType)
    assert(JdbcDialects.forName("postgres") == JdbcDialects.PostgreSql)
    assert(JdbcDialects.forName("MYSQL") == JdbcDialects.MySql)
    assert(JdbcDialects.forName("mssql") == JdbcDialects.SqlServer)
    // unknown type: a named error, not a guess
    val e = intercept[NoSuchElementException](JdbcDialects.forName("sybase"))
    assert(e.getMessage.contains("sybase"))
  }

  test("forDialect builds a working provider end-to-end (embedded Derby)") {
    setup // the graftmeta database and its tables must exist first
    val p = JdbcMetadataProvider.forDialect(JdbcDialects.Derby, "graftmeta")
    assert(p.tableColumns("ext_sink") == Seq("d_key", "d_name", "d_val"))
    assert(p.tableColumns("nope") == Nil)
  }
}
