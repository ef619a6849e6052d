package graft.lineage

import graft.SparkTestBase

/** Golden lineage tests (SURVEY.md §5): exact edge output for one
  * statement per §2 construct. Goldens frozen from LineageProbe; after a
  * deliberate corpus or formatting change, re-run
  * `sbt "runMain graft.lineage.LineageProbe"` and refresh.
  */
class LineageSpec extends SparkTestBase {

  /** (stmt, table_name, col_name, to_name, from_name, conditions). */
  val golden: Seq[(Int, String, String, String, String, String)] = Seq(
    (1, "<EOF>", "", "n_name", "default.nation.n_name", "WHERE:(nation.n_regionkey = 0)"),
    (1, "<EOF>", "", "n_nationkey", "default.nation.n_nationkey", "WHERE:(nation.n_regionkey = 0)"),
    (2, "<EOF>", "", "c_name", "default.customer.c_name", "JOIN:(c.c_custkey = o.o_custkey)|WHERE:(o.o_totalprice > CAST(1000.0BD AS DOUBLE))"),
    (2, "<EOF>", "", "o_totalprice", "default.orders.o_totalprice", "JOIN:(c.c_custkey = o.o_custkey)|WHERE:(o.o_totalprice > CAST(1000.0BD AS DOUBLE))"),
    (3, "<EOF>", "", "n_name", "default.nation.n_name", "LEFTOUTERJOIN:(n.n_regionkey = r.r_regionkey)"),
    (3, "<EOF>", "", "r_name", "default.region.r_name", "LEFTOUTERJOIN:(n.n_regionkey = r.r_regionkey)"),
    (4, "<EOF>", "", "buyer_count", "default.orders.o_custkey", "COLFUN:count(DISTINCT orders.o_custkey)"),
    (5, "<EOF>", "", "cls", "default.orders.o_orderpriority,default.orders.o_orderstatus,default.orders.o_totalprice", "COLFUN:CASE WHEN (orders.o_totalprice > CAST(100.0BD AS DOUBLE)) THEN orders.o_orderstatus ELSE orders.o_orderpriority END"),
    (6, "<EOF>", "", "o_orderkey", "default.orders.o_orderkey", "WHERE:((orders.o_orderstatus IN ('F', 'O')) AND (orders.o_orderpriority IS NOT NULL))"),
    (7, "<EOF>", "", "tag", "default.customer.c_mktsegment,default.customer.c_name", "COLFUN:concat(customer.c_name, customer.c_mktsegment)"),
    (8, "<EOF>", "", "e0", "default.embeddings.embedding", "COLFUN:embeddings.embedding[0]"),
    (9, "<EOF>", "", "r_name", "default.region.r_name", ""),
    (9, "<EOF>", "", "r_regionkey", "default.region.r_regionkey", ""),
    (10, "<EOF>", "", "k", "default.nation.n_nationkey", "JOIN:(nation.n_regionkey = region.r_regionkey)|WHERE:(x.k > 3)"),
    (11, "<EOF>", "", "id", "default.customer.c_custkey&default.supplier.s_suppkey", ""),
    (12, "<EOF>", "", "n_name", "default.nation.n_name", ""),
    (12, "<EOF>", "", "num", "", "COLFUN:123"),
    (12, "<EOF>", "", "str", "", "COLFUN:'x'"),
    (13, "<EOF>", "", "o_custkey", "default.orders.o_custkey", "WHERE:(orders.o_totalprice > CAST(500.0BD AS DOUBLE))"),
    (14, "default.lineage_target", "default.lineage_target.tgt_name", "n_name", "default.nation.n_name", "WHERE:(nation.n_regionkey = 1)"),
    (14, "default.lineage_target", "default.lineage_target.tgt_key", "n_nationkey", "default.nation.n_nationkey", "WHERE:(nation.n_regionkey = 1)"),
    (15, "<EOF>", "", "n_name", "default.nation.n_name", "RIGHTOUTERJOIN:(s.s_nationkey = n.n_nationkey)"),
    (15, "<EOF>", "", "s_name", "default.supplier.s_name", "RIGHTOUTERJOIN:(s.s_nationkey = n.n_nationkey)"),
    (16, "<EOF>", "", "c_name", "default.customer.c_name", "FULLOUTERJOIN:(c.c_nationkey = n.n_nationkey)"),
    (17, "<EOF>", "", "c_name", "default.customer.c_name", "LEFTSEMIJOIN:(customer.c_custkey = orders.o_custkey)"),
    (18, "<EOF>", "", "doc_id", "default.documents.doc_id", ""),
    // the UDTF output carries the generator as COLFUN even though the
    // select item is a bare column — the function application lives in
    // the Generate node (reference E11 analogue for exploded columns)
    (18, "<EOF>", "", "tok", "default.documents.text", "COLFUN:explode(split(documents.text, ' ', -1))"),
    (19, "<EOF>", "", "o_orderkey", "default.orders.o_orderkey", ""),
    (19, "<EOF>", "", "rn", "default.orders.o_custkey,default.orders.o_orderdate", ""),
    (20, "<EOF>", "", "k1", "default.orders.o_orderkey", "COLFUN:(orders.o_orderkey + CAST(1 AS BIGINT))"),
    (20, "<EOF>", "", "k2", "default.orders.o_orderkey", "COLFUN:(orders.o_orderkey & CAST(255 AS BIGINT))"),
    (21, "default.lineage_target", "default.lineage_target.tgt_name", "n_name", "default.nation.n_name", ""),
    (21, "default.lineage_target", "default.lineage_target.tgt_key", "n_nationkey", "default.nation.n_nationkey", ""),
    (22, "<EOF>", "", "o_orderkey", "default.orders.o_orderkey", "WHERE:((orders.o_orderstatus IS NULL) OR orders.o_orderpriority LIKE '1%')"),
    (23, "<EOF>", "", "o_orderkey", "default.orders.o_orderkey", "WHERE:(orders.o_custkey IN (subquery(default.customer)))"),
    (24, "default.lineage_target", "default.lineage_target.tgt_name", "n_name", "default.nation.n_name", "WHERE:(nation.n_regionkey = 2)"),
    (24, "default.lineage_target2", "default.lineage_target2.tgt2_name", "n_name", "default.nation.n_name", ""),
    (24, "default.lineage_target", "default.lineage_target.tgt_key", "n_nationkey", "default.nation.n_nationkey", "WHERE:(nation.n_regionkey = 2)"),
    (24, "default.lineage_target2", "default.lineage_target2.tgt2_region", "n_regionkey", "default.nation.n_regionkey", ""),
    (25, "<EOF>", "", "id", "default.customer.c_custkey&default.supplier.s_suppkey&default.nation.n_nationkey", ""),
    (26, "default.lineage_ctas", "", "r_name", "default.region.r_name", "WHERE:(region.r_regionkey < 3)"),
    (26, "default.lineage_ctas", "", "r_regionkey", "default.region.r_regionkey", "WHERE:(region.r_regionkey < 3)"),
    (27, "<EOF>", "", "big_total", "default.orders.o_totalprice", "WHERE:(`count(1)` > CAST(5 AS BIGINT))"),
    (27, "<EOF>", "", "o_orderstatus", "default.orders.o_orderstatus", "WHERE:(`count(1)` > CAST(5 AS BIGINT))"),
    (28, "<EOF>", "", "n_name", "default.nation.n_name", ""),
    (28, "<EOF>", "", "r_name", "default.region.r_name", ""),
    (29, "<EOF>", "", "c_name", "default.customer.c_name", "LEFTANTIJOIN:(customer.c_custkey = orders.o_custkey)"),
    (30, "<EOF>", "", "n_name", "default.nation.n_name", "JOIN:(a.n_regionkey = b.n_regionkey)"),
    (30, "<EOF>", "", "other", "default.nation.n_name", "JOIN:(a.n_regionkey = b.n_regionkey)"),
    (31, "<EOF>", "", "max_cust", "default.customer.c_custkey", "COLFUN:scalarsubquery()"),
    (31, "<EOF>", "", "o_orderkey", "default.orders.o_orderkey", ""),
    (32, "<EOF>", "", "k", "default.nation.n_regionkey&default.region.r_regionkey", ""),
    (33, "<EOF>", "", "c_name", "default.customer.c_name", ""),
    (34, "default.lineage_part", "default.lineage_part.part_name", "n_name", "default.nation.n_name", "WHERE:(nation.n_regionkey = 3)"),
    (34, "default.lineage_part", "default.lineage_part.part_key", "n_nationkey", "default.nation.n_nationkey", "WHERE:(nation.n_regionkey = 3)"),
    (35, "<EOF>", "", "v_name", "default.nation.n_name", "WHERE:(lineage_view.v_key > 2)|WHERE:(nation.n_regionkey < 4)"),
    (36, "default.lineage_target", "default.lineage_target.tgt_name", "tgt_name", "default.lineage_target.tgt_name", "WHERE:(tgt_key < 5)"),
    (37, "default.lineage_target", "default.lineage_target.tgt_key", "tgt_key", "default.nation.n_nationkey", "MERGE:(t.tgt_key = s.k)"),
    (37, "default.lineage_target", "default.lineage_target.tgt_name", "tgt_name", "default.nation.n_name", "MERGE:(t.tgt_key = s.k)"),
    (37, "default.lineage_target", "default.lineage_target.tgt_name", "tgt_name", "default.nation.n_name", "MERGE:(t.tgt_key = s.k)"),
    (38, "default.dest1", "default.dest1.d_ds", "ds", "default.srcpart.ds", "WHERE:((s.ds = '2008-04-08') AND (s.hr = '11'))"),
    (38, "default.dest1", "default.dest1.d_hr", "hr", "default.srcpart.hr", "WHERE:((s.ds = '2008-04-08') AND (s.hr = '11'))"),
    (38, "default.dest1", "default.dest1.d_key", "key", "default.srcpart.key", "WHERE:((s.ds = '2008-04-08') AND (s.hr = '11'))"),
    (38, "default.dest1", "default.dest1.d_value", "value", "default.srcpart.value", "WHERE:((s.ds = '2008-04-08') AND (s.hr = '11'))"),
    (39, "<EOF>", "", "k", "default.nation.n_regionkey&default.region.r_regionkey", ""),
    (40, "default.lineage_rtas", "", "n_name", "default.nation.n_name", "WHERE:(nation.n_regionkey = 1)"),
    (41, "<EOF>", "", "d_key", "testcat.ns1.cat_docs.d_key", "WHERE:(testcat.ns1.cat_docs.d_key > CAST(1 AS BIGINT))"),
    (41, "<EOF>", "", "d_name", "testcat.ns1.cat_docs.d_name", "WHERE:(testcat.ns1.cat_docs.d_key > CAST(1 AS BIGINT))"),
    (42, "testcat.ns1.cat_sink", "testcat.ns1.cat_sink.s_key", "d_key", "testcat.ns1.cat_docs.d_key", ""),
    (42, "testcat.ns1.cat_sink", "testcat.ns1.cat_sink.s_name", "d_name", "testcat.ns1.cat_docs.d_name", ""),
    (43, "<EOF>", "", "d_name", "testcat.ns1.cat_docs.d_name", "JOIN:(CAST(n.n_nationkey AS BIGINT) = x.d_key)"),
    (43, "<EOF>", "", "n_name", "default.nation.n_name", "JOIN:(CAST(n.n_nationkey AS BIGINT) = x.d_key)")
  )

  test("corpus lineage matches golden edges") {
    val rows = LineageQueries.edges(spark, sfDir).collect().map { r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5))
    }.toSeq
    assert(rows == golden)
  }

  test("three-part names: a non-default catalog keeps its prefix, the session catalog stays two-part") {
    // VERDICT r15 #2: `spark_catalog.default.t` and `testcat.ns1.t`
    // must not collide after truncation; default-catalog output stays
    // two-part so the reference contract and frozen goldens hold.
    LineageQueries.registerFixtures(spark, sfDir)
    val v2 = LineageParser.fromDataFrame(spark.table("testcat.ns1.cat_docs"))
    assert(v2.inputTables == Set("testcat.ns1.cat_docs"))
    assert(v2.colLines.map(_.fromName).toSet ==
      Set("testcat.ns1.cat_docs.d_key", "testcat.ns1.cat_docs.d_name"))
    val v1 = LineageParser.fromDataFrame(spark.table("srcpart"))
    assert(v1.inputTables == Set("default.srcpart"))
  }

  test("USE catalog.namespace threads three-part qualification into later statements") {
    // `USE testcat.ns1` sets a DOTTED current db, and fillDb's
    // no-dot rule then qualifies bare names with the full
    // catalog.namespace prefix — S2 threading composes with the
    // three-part encoding with no special casing.
    LineageQueries.registerFixtures(spark, sfDir)
    val rs = LineageParser.parse(spark,
      "USE testcat.ns1;\nDROP TABLE cat_docs")
    assert(rs.head.operation == Operation.Use)
    assert(rs.head.outputTables == Set("testcat.ns1"))
    assert(rs(1).outputTables == Set("testcat.ns1.cat_docs\tDROP"))
  }

  test("statement splitting honors escaped semicolons") {
    assert(LineageParser.splitStatements("a; b;c") == Seq("a", "b", "c"))
    assert(LineageParser.splitStatements("a\\;b; c") == Seq("a\\;b", "c"))
    assert(LineageParser.splitStatements(";;") == Nil)
  }

  test("fillDb qualifies unqualified names with the current db") {
    assert(LineageParser.fillDb("t") == "default.t")
    assert(LineageParser.fillDb("db.t") == "db.t")
    assert(LineageParser.fillDb("t", "mydb") == "mydb.t")
  }

  test("USE db requalifies subsequent statements") {
    graft.Tables.registerAll(spark, sfDir)
    val rs = LineageParser.parse(spark, "USE mydb; SELECT r_name FROM region")
    assert(rs.head.operation == Operation.Use)
    // Temp views are not db-scoped; the leaf alias path still qualifies
    // with the statement-current db, proving the USE state threaded.
    assert(rs(1).inputTables == Set("mydb.region"))
  }

  test("DDL statements record tab-separated output entries") {
    val drop = LineageParser.parseStatement(spark, "DROP TABLE some_t", 1)
    assert(drop.operation == Operation.Drop)
    assert(drop.outputTables == Set("default.some_t\tDROP"))
    val trunc = LineageParser.parseStatement(spark, "TRUNCATE TABLE some_t", 1)
    assert(trunc.operation == Operation.Truncate)
    val alter = LineageParser.parseStatement(
      spark, "ALTER TABLE some_t RENAME TO other_t", 1)
    assert(alter.operation == Operation.Alter)
    val load = LineageParser.parseStatement(
      spark, "LOAD DATA INPATH '/tmp/x' INTO TABLE some_t", 1)
    assert(load.operation == Operation.Load)
    assert(load.outputTables == Set("default.some_t\tLOAD"))
  }

  test("predicate subqueries contribute their tables to inputTables") {
    graft.Tables.registerAll(spark, sfDir)
    val r = LineageParser.parseStatement(spark,
      "SELECT o_orderkey FROM orders WHERE o_custkey IN " +
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')", 1)
    assert(r.inputTables == Set("default.orders", "default.customer"))
  }

  test("multi-insert fans edges out to every sink") {
    graft.Tables.registerAll(spark, sfDir)
    spark.table("nation").selectExpr("n_name AS a").limit(0)
      .createOrReplaceTempView("mi_t1")
    spark.table("nation").selectExpr("n_nationkey AS b").limit(0)
      .createOrReplaceTempView("mi_t2")
    val r = LineageParser.parseStatement(spark,
      "FROM nation INSERT INTO mi_t1 SELECT n_name INSERT INTO mi_t2 SELECT n_nationkey", 1)
    assert(r.operation == Operation.Insert)
    assert(r.outputTables == Set("default.mi_t1", "default.mi_t2"))
    assert(r.colLines.map(c => (c.tableName, c.toName, c.fromName)).toSet == Set(
      ("default.mi_t1", "n_name", "default.nation.n_name"),
      ("default.mi_t2", "n_nationkey", "default.nation.n_nationkey")))
  }

  test("TABLESAMPLE flows sources through the sample") {
    graft.Tables.registerAll(spark, sfDir)
    val r = LineageParser.parseStatement(spark,
      "SELECT n_name FROM nation TABLESAMPLE (50 PERCENT)", 1)
    assert(r.colLines.map(c => (c.toName, c.fromName)) ==
      Seq(("n_name", "default.nation.n_name")))
    // the BUCKET x OUT OF y form — the one the reference's own smoke
    // fixture uses (LineParser.java:794-805; corpus 38 pins the full
    // statement, this pins the sample form in isolation)
    val b = LineageParser.parseStatement(spark,
      "SELECT n_name FROM nation TABLESAMPLE (BUCKET 1 OUT OF 1)", 1)
    assert(b.colLines.map(c => (c.toName, c.fromName)) ==
      Seq(("n_name", "default.nation.n_name")))
    assert(b.inputTables == Set("default.nation"))
  }

  test("INTERSECT folds both branches positionally; EXCEPT keeps the left") {
    graft.Tables.registerAll(spark, sfDir)
    val i = LineageParser.parseStatement(spark,
      "SELECT n_regionkey AS k FROM nation INTERSECT " +
        "SELECT r_regionkey FROM region", 1)
    // intersect rows carry values from BOTH branches — union's `&` fold
    assert(i.colLines.map(c => (c.toName, c.fromName)) ==
      Seq(("k", "default.nation.n_regionkey&default.region.r_regionkey")))
    val e = LineageParser.parseStatement(spark,
      "SELECT n_regionkey AS k FROM nation EXCEPT " +
        "SELECT r_regionkey FROM region", 1)
    // except rows come from the left branch only; the right just filters
    assert(e.colLines.map(c => (c.toName, c.fromName)) ==
      Seq(("k", "default.nation.n_regionkey")))
    assert(e.inputTables == Set("default.nation", "default.region"))
  }

  test("PIVOT: wide columns fold value + pivot-key sources (golden)") {
    graft.Tables.registerAll(spark, sfDir)
    // Catalyst lowers PIVOT to Aggregate(pivotfirst) + extraction
    // Projects; the generic arms must carry BOTH the aggregated value
    // column and the pivot key into every wide output. Since r13 the
    // wide columns also carry a COLFUN tag with the aggregate the
    // pivot computes (the reference's select-side condition
    // convention, §2.2 step 3) — the ORIGINAL `count(n_nationkey)`,
    // not the internal pivotfirst plumbing or Catalyst's
    // auto-generated subquery qualifier.
    val r = LineageParser.parseStatement(spark,
      "SELECT * FROM (SELECT n_regionkey, n_nationkey FROM nation) " +
        "PIVOT (count(n_nationkey) FOR n_regionkey IN (0 AS r0, 1 AS r1))", 1)
    assert(r.inputTables == Set("default.nation"))
    val fun = Set("COLFUN:count(n_nationkey)")
    assert(r.colLines.map(c => (c.toName, c.fromName, c.conditionSet)) == Seq(
      ("r0", "default.nation.n_nationkey,default.nation.n_regionkey", fun),
      ("r1", "default.nation.n_nationkey,default.nation.n_regionkey", fun)))
  }

  test("UNPIVOT: value column unions all measures; label elides (golden)") {
    graft.Tables.registerAll(spark, sfDir)
    // Catalyst lowers UNPIVOT to Expand (+ an implicit null-excluding
    // Filter). The value column's sources union every unpivoted
    // measure — including one computed from another column — and the
    // label column references only literals, so it stays source-free.
    val stmt = "SELECT * FROM (SELECT n_nationkey, n_regionkey, " +
      "n_nationkey + 100 AS shifted FROM nation) " +
      "UNPIVOT %s(v FOR metric IN (n_regionkey, shifted))"
    val r = LineageParser.parseStatement(spark, stmt.format(""), 1)
    val nullFilter = Set("WHERE:(coalesce(v) IS NOT NULL)")
    assert(r.colLines.map(c => (c.toName, c.fromName, c.conditionSet)) == Seq(
      ("n_nationkey", "default.nation.n_nationkey", nullFilter),
      ("metric", "", nullFilter),
      ("v", "default.nation.n_nationkey,default.nation.n_regionkey",
        nullFilter)))
    // INCLUDE NULLS drops the implicit filter and nothing else
    val incl = LineageParser.parseStatement(spark,
      stmt.format("INCLUDE NULLS "), 1)
    assert(incl.colLines.map(c => (c.toName, c.fromName, c.conditionSet)) ==
      r.colLines.map(c => (c.toName, c.fromName, Set.empty[String])))
  }

  test("CREATE OR REPLACE TABLE AS SELECT is CTAS lineage, not ALTER") {
    graft.Tables.registerAll(spark, sfDir)
    val r = LineageParser.parseStatement(spark,
      "CREATE OR REPLACE TABLE rtas_t AS " +
        "SELECT n_name FROM nation WHERE n_regionkey = 1", 1)
    assert(r.operation == Operation.CreateTable)
    assert(r.outputTables == Set("default.rtas_t"))
    assert(r.colLines.map(c => (c.toName, c.fromName)) ==
      Seq(("n_name", "default.nation.n_name")))
    assert(r.colLines.head.conditionSet == Set("WHERE:(nation.n_regionkey = 1)"))
  }

  test("INSERT ... VALUES records the sink with literal-elided edges") {
    LineageQueries.registerFixtures(spark, sfDir)
    val r = LineageParser.parseStatement(spark,
      "INSERT INTO lineage_target VALUES (99, 'x')", 1)
    assert(r.operation == Operation.Insert)
    assert(r.outputTables == Set("default.lineage_target"))
    assert(r.inputTables.isEmpty)
    // literal-only items: edges exist (one per ordinal) with no sources
    assert(r.colLines.nonEmpty && r.colLines.forall(_.fromName == ""))
  }

  test("INSERT with an explicit column list maps by the list, not schema order") {
    LineageQueries.registerFixtures(spark, sfDir)
    // lineage_target's schema order is (tgt_key, tgt_name); the
    // statement reverses it — the named list must win
    val r = LineageParser.parseStatement(spark,
      "INSERT INTO lineage_target (tgt_name, tgt_key) " +
        "SELECT n_name, n_nationkey FROM nation", 1)
    val byTo = r.colLines.map(c => c.toName -> c.colName).toMap
    assert(byTo("n_name") == Some("default.lineage_target.tgt_name"))
    assert(byTo("n_nationkey") == Some("default.lineage_target.tgt_key"))
  }

  test("CREATE VIEW records sink and select lineage") {
    graft.Tables.registerAll(spark, sfDir)
    val r = LineageParser.parseStatement(spark,
      "CREATE VIEW v_lineage AS SELECT n_name FROM nation WHERE n_regionkey = 2", 1)
    assert(r.operation == Operation.CreateTable)
    assert(r.outputTables == Set("default.v_lineage"))
    assert(r.colLines.map(c => (c.toName, c.fromName)) ==
      Seq(("n_name", "default.nation.n_name")))
    assert(r.colLines.head.conditionSet == Set("WHERE:(nation.n_regionkey = 2)"))
  }

  test("toDataset exposes lineage as queryable rows") {
    graft.Tables.registerAll(spark, sfDir)
    val rs = LineageParser.parse(spark,
      "SELECT n_name FROM nation; SELECT r_name FROM region")
    val df = LineageParser.toDataset(spark, rs)
    assert(df.count() == 2)
    assert(df.filter("stmt = 2").select("from_name").head.getString(0) ==
      "default.region.r_name")
  }

  test("CTAS records sink and select lineage") {
    graft.Tables.registerAll(spark, sfDir)
    val r = LineageParser.parseStatement(
      spark, "CREATE TABLE tgt AS SELECT n_name FROM nation", 1)
    assert(r.operation == Operation.CreateTable)
    assert(r.outputTables == Set("default.tgt"))
    assert(r.colLines.map(c => (c.toName, c.fromName)) ==
      Seq(("n_name", "default.nation.n_name")))
  }

  test("sink schemas come from the pluggable MetadataProvider (S11)") {
    graft.Tables.registerAll(spark, sfDir)
    // A provider standing in for an external catalog (the reference's
    // JDBC metadata source): knows a table Spark's catalog does not.
    val external = new MetadataProvider {
      def tableColumns(table: String): Seq[String] =
        if (table == "default.ext_sink") Seq("dst_name", "dst_key") else Nil
    }
    val r = LineageParser.parseStatement(spark,
      "INSERT INTO ext_sink SELECT n_name, n_nationkey FROM nation",
      1, metadata = Some(external))
    assert(r.colLines.map(_.colName) == Seq(
      Some("default.ext_sink.dst_name"), Some("default.ext_sink.dst_key")))
    // Default (catalog) provider: unknown sink degrades to ordinal-only.
    val bare = LineageParser.parseStatement(spark,
      "INSERT INTO ext_sink SELECT n_name, n_nationkey FROM nation", 1)
    assert(bare.colLines.map(_.colName) == Seq(None, None))
  }

  test("UNIQUEJOIN is declared unsupported with a named error") {
    // Hive syntax the reference also rejects (LineParser.java:248,288);
    // a generic parse error would hide WHAT is unsupported.
    val e = intercept[UnsupportedOperationException] {
      LineageParser.parseStatement(spark,
        "SELECT a.key FROM UNIQUEJOIN PRESERVE t1 a (a.key), t2 b (b.key)", 3)
    }
    assert(e.getMessage.contains("UNIQUEJOIN is not supported"))
    assert(e.getMessage.contains("statement 3"))
    // lower-case and embedded in a larger statement still caught
    intercept[UnsupportedOperationException] {
      LineageParser.parseStatement(spark,
        "select * from uniquejoin t1 a (a.k), t2 b (b.k)", 1)
    }
    // ...but a table merely containing the substring is NOT
    spark.range(1).selectExpr("id AS x")
      .createOrReplaceTempView("uniquejoins_audit")
    val ok = LineageParser.parseStatement(
      spark, "SELECT x FROM uniquejoins_audit", 1)
    assert(ok.operation == Operation.Select)
  }

  test("columnImpact closure chains statements to min depth, to fixpoint") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a.c → b.c → c.c → d.c → e.c → f.c (5 hops) plus a shortcut
    // a.c → c.c: min-depth keeps the shortcut and shortens what follows
    val e = Seq(
      ("a.c", "b.c"), ("b.c", "c.c"), ("c.c", "d.c"),
      ("d.c", "e.c"), ("e.c", "f.c"), ("a.c", "c.c"))
      .toDF("src", "dst")
    val reach = LineageQueries.closure(e)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(reach(("a.c", "b.c")) == 1L)
    assert(reach(("a.c", "c.c")) == 1L) // shortcut beats the 2-hop path
    assert(reach(("a.c", "d.c")) == 2L) // ...and shortens what follows
    assert(reach(("a.c", "f.c")) == 4L)
    assert(reach(("b.c", "f.c")) == 4L)
    assert(reach.values.max == 4L)
  }

  test("closure reaches past the former depth-4 cap on a 6-stage chain") {
    import spark.implicits._
    // VERDICT r16 #1: a 6-stage production pipeline used to get
    // silently truncated reach from the hard `1 to 3` loop — the
    // fixpoint iteration must report the EXACT reach and depth.
    val chain = Seq(
      ("s0.c", "s1.c"), ("s1.c", "s2.c"), ("s2.c", "s3.c"),
      ("s3.c", "s4.c"), ("s4.c", "s5.c"), ("s5.c", "s6.c"))
      .toDF("src", "dst")
    val reach = LineageQueries.closure(chain)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // exact reach: s0 sees all 6 downstream columns, deepest at 6
    assert((1 to 6).forall(i => reach(("s0.c", s"s$i.c")) == i.toLong))
    assert(reach.size == 6 + 5 + 4 + 3 + 2 + 1)
    assert(reach.values.max == 6L)
    // ...and the maxDepth RUNAWAY guard still bounds a pathological
    // request without changing short-graph semantics
    val guarded = LineageQueries.closure(chain, maxDepth = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(guarded.values.max == 3L)
  }

  test("closure converges on a cyclic graph (statement-36 self-edges)") {
    import spark.implicits._
    // a 3-cycle re-derives every pair at ever-larger depths; the
    // min-depth aggregate must discard those and the count-stability
    // check must terminate the loop (not the maxDepth guard)
    val cyc = Seq(("x.c", "y.c"), ("y.c", "z.c"), ("z.c", "x.c"))
      .toDF("src", "dst")
    val reach = LineageQueries.closure(cyc)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(reach.size == 9) // all ordered pairs incl. self-reach
    assert(reach(("x.c", "y.c")) == 1L)
    assert(reach(("x.c", "z.c")) == 2L)
    assert(reach(("x.c", "x.c")) == 3L)
    assert(reach.values.max == 3L)
  }

  test("CTRL mode: control edges opt-in; parity output untouched by default") {
    graft.Tables.registerAll(spark, sfDir)
    val sql = "SELECT n_name FROM nation WHERE n_regionkey = 0"
    val plain = LineageParser.parseStatement(spark, sql, 1)
    assert(!plain.colLines.exists(_.conditionSet.exists(_.startsWith("CTRL:"))))
    val ctrl = LineageParser.parseStatement(spark, sql, 1,
      includeControl = true)
    // value edges byte-identical to the plain run...
    assert(ctrl.colLines.filterNot(
      _.conditionSet.exists(_.startsWith("CTRL:"))) == plain.colLines)
    // ...plus one CTRL edge per (condition site, output column)
    val c = ctrl.colLines.filter(_.conditionSet.exists(_.startsWith("CTRL:")))
    assert(c.map(e => (e.toName, e.fromName)) ==
      Seq(("n_name", "default.nation.n_regionkey")))
    assert(c.head.conditionSet == Set("CTRL:WHERE:(nation.n_regionkey = 0)"))
  }

  test("CTRL mode: literal-only conditions elide, multi-site conditions split") {
    graft.Tables.registerAll(spark, sfDir)
    // HAVING count(1) > 5 reads no column — no CTRL edge for that site
    val having = LineageParser.parseStatement(spark,
      "SELECT o_orderstatus FROM orders GROUP BY o_orderstatus " +
        "HAVING count(1) > 5", 1, includeControl = true)
    assert(!having.colLines.exists(_.conditionSet.exists(_.startsWith("CTRL:"))))
    // two condition sites → two distinct CTRL edges per output, each
    // naming only ITS columns (the per-site grain impact needs)
    val two = LineageParser.parseStatement(spark,
      "SELECT c.c_name FROM customer c JOIN nation n " +
        "ON c.c_nationkey = n.n_nationkey WHERE n.n_regionkey = 1", 1,
      includeControl = true)
    val sites = two.colLines.filter(_.conditionSet.exists(_.startsWith("CTRL:")))
      .map(e => (e.conditionSet.head, e.fromName)).toSet
    assert(sites == Set(
      ("CTRL:JOIN:(c.c_nationkey = n.n_nationkey)",
        "default.customer.c_nationkey,default.nation.n_nationkey"),
      ("CTRL:WHERE:(n.n_regionkey = 1)", "default.nation.n_regionkey")))
  }

  test("CTRL mode: the watermark column is a control dependency of a stream") {
    val df = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "ts TIMESTAMP, k BIGINT"))
      .parquet(s"$sfDir/events.parquet") // schema-only; nothing runs
      .withWatermark("ts", "5 minutes")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "5 minutes"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .select("n")
    val r = LineageParser.fromDataFrame(df, includeControl = true)
    val wm = r.colLines.filter(_.conditionSet.exists(_.startsWith("CTRL:WATERMARK")))
    assert(wm.map(_.fromName).distinct.size == 1)
    assert(wm.head.fromName.endsWith(".ts"))
  }

  test("CTE-wrapped explode keeps the generator COLFUN tag") {
    graft.Tables.registerAll(spark, sfDir)
    // the CTERelationRef re-keys output exprIds; UDTF provenance must
    // cross that mapping or the CTE form silently diverges from the
    // inline form of the same query (r8 review finding)
    val r = LineageParser.parseStatement(spark,
      "WITH t AS (SELECT explode(split(text, ' ')) AS tok FROM documents) " +
        "SELECT tok FROM t", 1)
    val edge = r.colLines.find(_.toName == "tok").get
    assert(edge.fromName == "default.documents.text")
    assert(edge.conditionSet.exists(_.startsWith("COLFUN:explode")))
    // and the inline form produces the identical tag
    val inline = LineageParser.parseStatement(spark,
      "SELECT explode(split(text, ' ')) AS tok FROM documents", 2)
    val it = inline.colLines.find(_.toName == "tok").get
    assert(it.conditionSet.filter(_.startsWith("COLFUN:")) ==
      edge.conditionSet.filter(_.startsWith("COLFUN:")))
  }
}
