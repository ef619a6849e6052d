package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden lineage for PROGRAMMATIC DataFrames (r13 stretch):
  * `LineageParser.fromPlan` runs the same analyzed-plan fold the SQL
  * path uses, so a DataFrame twin of each q24-corpus construct yields
  * the same edges the SQL statement does wherever the analyzer
  * produces the same plan. Twins whose DataFrame literals render
  * differently than parsed SQL literals (e.g. `lit(1000.0)` vs the
  * parser's `CAST(1000.0BD AS DOUBLE)`) carry their own golden —
  * the EDGES and SOURCES always agree; only literal rendering inside
  * condition strings is construction-specific. */
class LineageFromPlanSpec extends SparkTestBase {

  private lazy val ready: Unit =
    LineageQueries.registerFixtures(spark, sfDir)

  /** DataFrame twins, keyed by the corpus statement they mirror. */
  private def twins: Seq[(Int, DataFrame)] = {
    ready
    val nation = spark.table("nation")
    val customer = spark.table("customer")
    val orders = spark.table("orders")
    val supplier = spark.table("supplier")
    val documents = spark.table("documents")
    val region = spark.table("region")
    Seq(
      1 -> nation.where(col("n_regionkey") === 0)
        .select("n_nationkey", "n_name"),
      2 -> customer.as("c")
        .join(orders.as("o"), col("c.c_custkey") === col("o.o_custkey"))
        .where(col("o.o_totalprice") > 1000.0)
        .select(col("c.c_name"), col("o.o_totalprice")),
      4 -> orders.agg(count_distinct(col("o_custkey")).as("buyer_count")),
      5 -> orders.select(
        when(col("o_totalprice") > 100.0, col("o_orderstatus"))
          .otherwise(col("o_orderpriority")).as("cls")),
      10 -> nation
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("k")).as("x")
        .where(col("x.k") > 3).select(col("x.k")),
      11 -> customer.select(col("c_custkey").as("id"))
        .unionAll(supplier.select(col("s_suppkey").as("id"))),
      12 -> nation.select(col("n_name"), lit(123).as("num"),
        lit("x").as("str")),
      18 -> documents.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok")),
      19 -> orders.select(col("o_orderkey"),
        row_number().over(Window.partitionBy("o_custkey")
          .orderBy("o_orderdate")).as("rn")))
  }

  private def rows(r: LineageResult): Set[(String, String, String)] =
    r.colLines.map(c => (c.toName, c.fromName,
      c.conditionSet.toSeq.sorted.mkString("|"))).toSet

  /** Frozen from a probe run (same procedure as LineageSpec). */
  private val golden: Seq[(Int, String, String, String)] = Seq(
    (1, "n_nationkey", "default.nation.n_nationkey", "WHERE:(nation.n_regionkey = 0)"),
    (1, "n_name", "default.nation.n_name", "WHERE:(nation.n_regionkey = 0)"),
    (2, "c_name", "default.customer.c_name", "JOIN:(c.c_custkey = o.o_custkey)|WHERE:(o.o_totalprice > 1000.0D)"),
    (2, "o_totalprice", "default.orders.o_totalprice", "JOIN:(c.c_custkey = o.o_custkey)|WHERE:(o.o_totalprice > 1000.0D)"),
    (4, "buyer_count", "default.orders.o_custkey", "COLFUN:count(DISTINCT orders.o_custkey)"),
    (5, "cls", "default.orders.o_orderpriority,default.orders.o_orderstatus,default.orders.o_totalprice", "COLFUN:CASE WHEN (orders.o_totalprice > 100.0D) THEN orders.o_orderstatus ELSE orders.o_orderpriority END"),
    (10, "k", "default.nation.n_nationkey", "JOIN:(nation.n_regionkey = region.r_regionkey)|WHERE:(x.k > 3)"),
    (11, "id", "default.customer.c_custkey&default.supplier.s_suppkey", ""),
    (12, "n_name", "default.nation.n_name", ""),
    (12, "num", "", "COLFUN:123"),
    (12, "str", "", "COLFUN:'x'"),
    (18, "doc_id", "default.documents.doc_id", ""),
    (18, "tok", "default.documents.text", "COLFUN:explode(split(documents.text, ' ', -1))"),
    (19, "o_orderkey", "default.orders.o_orderkey", ""),
    (19, "rn", "default.orders.o_custkey,default.orders.o_orderdate", ""))

  test("fromPlan edges match the frozen goldens per corpus twin") {
    val byStmt = golden.groupBy(_._1)
    twins.foreach { case (i, df) =>
      val got = rows(LineageParser.fromDataFrame(df))
      val want = byStmt(i).map(g => (g._2, g._3, g._4)).toSet
      assert(got == want, s"twin $i")
    }
  }

  test("forWrite matches the SQL INSERT: sink columns zip by ordinal") {
    ready
    // DataFrame twin of corpus statement 14:
    //   INSERT INTO lineage_target SELECT n_nationkey, n_name
    //   FROM nation WHERE n_regionkey = 1
    val df = spark.table("nation").where(col("n_regionkey") === 1)
      .select("n_nationkey", "n_name")
    val viaWrite = LineageParser.forWrite(df, "lineage_target")
    val viaSql = LineageParser.parseStatement(spark,
      LineageQueries.corpus(13), 1)
    assert(rows(viaWrite) == rows(viaSql))
    assert(viaWrite.outputTables == Set("default.lineage_target"))
    assert(viaWrite.inputTables == viaSql.inputTables)
    assert(viaWrite.colLines.map(_.colName).toSet ==
      viaSql.colLines.map(_.colName).toSet) // S10 ordinal zip
    // explicit column list beats the catalog's ordinal guess
    val swapped = LineageParser.forWrite(df, "lineage_target",
      explicitCols = Seq("tgt_name", "tgt_key"))
    assert(swapped.colLines.map(_.colName.get).toList ==
      List("default.lineage_target.tgt_name",
        "default.lineage_target.tgt_key"))
  }

  /** Where DataFrame and SQL literals render identically, the two
    * construction paths must be INDISTINGUISHABLE — same edges, same
    * tags, same inputTables (fromPlan is an entry point, not a second
    * engine). Twins 2/5 are excluded only because `lit(1000.0)`
    * renders `1000.0D` while the parser's decimal literal renders
    * `CAST(1000.0BD AS DOUBLE)` — sources and edges still agree, as
    * the golden above pins. */
  test("fromPlan equals parseStatement wherever literal rendering agrees") {
    ready
    val sameRendering = Set(1, 4, 10, 11, 12, 18, 19)
    twins.filter(t => sameRendering(t._1)).foreach { case (i, df) =>
      val viaPlan = LineageParser.fromDataFrame(df)
      val viaSql = LineageParser.parseStatement(spark,
        LineageQueries.corpus(i - 1), 1)
      assert(rows(viaPlan) == rows(viaSql), s"twin $i vs SQL")
      assert(viaPlan.inputTables == viaSql.inputTables, s"twin $i inputs")
      assert(viaPlan.outputTables == viaSql.outputTables, s"twin $i outputs")
    }
  }
}
