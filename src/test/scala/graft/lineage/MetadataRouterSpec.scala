package graft.lineage

/** Routing-registry parity (`datasource/AbstractRoutingDataSource.java`,
  * `utils/DataSourceUtils.java:33-61`, `conf/DatabaseConfInfo.java`):
  * named providers, duplicate-id rejection, named unknown-id failure,
  * and single- vs multi-source route selection. Pure registry behavior
  * — stub providers, no JDBC (the live-JDBC path is
  * [[JdbcMetadataProviderSpec]]'s job). */
class MetadataRouterSpec extends graft.SparkTestBase {

  // Stub catalog; bare-name fallback mirrors the real providers (the
  // parser asks with the db-qualified `default.tbl` form).
  private def catalog(tables: (String, Seq[String])*): MetadataProvider = {
    val m = tables.toMap
    (table: String) =>
      m.get(table).orElse(m.get(table.split('.').last)).getOrElse(Nil)
  }

  test("duplicate ids are rejected, unknown ids fail with a named error") {
    val r = new MetadataRouter().add("mysql_a", catalog())
    val dup = intercept[IllegalArgumentException](r.add("mysql_a", catalog()))
    assert(dup.getMessage.contains("mysql_a"))
    val missing = intercept[NoSuchElementException](r.resolve("pg_b"))
    assert(missing.getMessage.contains("pg_b"))
    assert(missing.getMessage.contains("mysql_a")) // names the known ids
  }

  test("single-source route: source and destination are the same catalog") {
    val r = new MetadataRouter()
      .add("primary", catalog("sink" -> Seq("a", "b")))
      .setRoute(MetadataRouter.single("primary"))
    assert(r.tableColumns("sink") == Seq("a", "b"))
    assert(r.sourceColumns("sink") == Seq("a", "b"))
    assert(r.tableColumns("unknown") == Nil) // degrades like any provider
  }

  test("multi-source route: ordered first-non-empty sources, dest for sinks") {
    val r = new MetadataRouter()
      .add("src1", catalog("t" -> Seq("s1_col")))
      .add("src2", catalog("t" -> Seq("s2_col"), "only2" -> Seq("x")))
      .add("dest", catalog("sink" -> Seq("d1", "d2")))
      .setRoute(MetadataRouter.Route(Seq("src1", "src2"), "dest"))
    // both sources know `t` — registration order wins, deterministically
    assert(r.sourceColumns("t") == Seq("s1_col"))
    // only the later source knows `only2` — the fallback chain reaches it
    assert(r.sourceColumns("only2") == Seq("x"))
    // sink lookups go to the destination catalog only
    assert(r.tableColumns("sink") == Seq("d1", "d2"))
    assert(r.tableColumns("t") == Nil)
  }

  test("routes referencing unregistered ids fail at configuration time") {
    val r = new MetadataRouter().add("a", catalog())
    intercept[NoSuchElementException](
      r.setRoute(MetadataRouter.Route(Seq("a"), "nope")))
    intercept[IllegalStateException](r.tableColumns("t")) // still unrouted
  }

  test("the router feeds INSERT-sink lineage as a plain MetadataProvider") {
    graft.Tables.registerAll(spark, sfDir)
    val router = new MetadataRouter()
      .add("warehouse", catalog("routed_sink" -> Seq("rk", "rn")))
      .setRoute(MetadataRouter.single("warehouse"))
    val res = LineageParser.parseStatement(spark,
      "INSERT INTO routed_sink SELECT n_nationkey, n_name FROM nation",
      1, metadata = Some(router))
    val byTo = res.colLines.map(c => c.toName -> c.colName).toMap
    assert(byTo("n_nationkey") == Some("default.routed_sink.rk"))
    assert(byTo("n_name") == Some("default.routed_sink.rn"))
  }
}
