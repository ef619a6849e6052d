package graft.sources

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Layout contracts: partition pruning actually prunes, bucketed joins
  * actually skip the shuffle — asserted on the physical plan, not just
  * row counts.
  */
class WarehouseSpec extends SparkTestBase {

  test("date-partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = Tables.load(spark, sfDir, "events")
    Warehouse.writeDatePartitioned(events, "ts", dir)

    val pruned = Warehouse.readDatePartitioned(spark, dir)
      .filter(col("p_date") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("p_date"))
    // pruned result matches a full-scan filter on the original data
    val expected = events.filter(to_date(col("ts")) === "2024-01-02").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("CSV and JSON-lines round-trip hostile strings losslessly") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "\"quoted\" and 'single'"),
      (4L, "line\nbreak and tab\there"),
      (5L, "unicode: caffè 日本語 🚀")
    ).toDF("id", "s")

    val csvDir = Files.createTempDirectory("graft_csv").toString
    Warehouse.writeCsv(hostile, csvDir)
    val fromCsv = Warehouse.readCsv(spark, csvDir, hostile.schema,
      multiLine = true) // embedded newline needs multiLine
    assert(fromCsv.orderBy("id").collect().toSeq ==
      hostile.orderBy("id").collect().toSeq)

    val jsonDir = Files.createTempDirectory("graft_json").toString
    Warehouse.writeJsonLines(hostile, jsonDir)
    val fromJson = Warehouse.readJsonLines(spark, jsonDir, hostile.schema)
    assert(fromJson.orderBy("id").collect().toSeq ==
      hostile.orderBy("id").collect().toSeq)
  }

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, sfDir, "orders")
      val lineitem = Tables.load(spark, sfDir, "lineitem")
      Warehouse.writeBucketed(orders.select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", 4)
      Warehouse.writeBucketed(lineitem.select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", 4)
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides read pre-bucketed data: no shuffle exchange in the plan
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(joined.count() == lineitem.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
