package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The DataSource V2 generator: split coverage, determinism, column
  * pruning, and hash parity with the oracle's md5-prefix expression.
  */
class SyntheticDocsSpec extends SparkTestBase {

  private def load(rows: Int, parts: Int) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  test("splits cover the id range exactly once, any partition count") {
    for (parts <- Seq(1, 3, 7, 32)) {
      val df = load(100, parts)
      assert(df.count() == 100, s"parts=$parts")
      assert(df.select("doc_id").distinct().count() == 100, s"parts=$parts")
      assert(df.agg(min("doc_id"), max("doc_id")).collect().head
        .toSeq == Seq(0L, 99L), s"parts=$parts")
    }
  }

  test("rows are deterministic and partition-count-invariant") {
    val a = load(50, 2).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = load(50, 9).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    // spot-check internal consistency: n_chars/n_tokens match text
    val r = load(50, 2).filter(col("doc_id") === 7).collect().head
    val text = r.getAs[String]("text")
    assert(r.getAs[Long]("n_tokens") == text.split(" ").length.toLong)
    assert(r.getAs[Long]("n_chars") == text.length.toLong)
    assert(r.getAs[Long]("n_tokens") >= 20 && r.getAs[Long]("n_tokens") < 50)
  }

  test("column pruning reaches the scan: text absent from the plan") {
    val df = load(100, 4).select("lang", "n_tokens")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("text"))
    // and pruned values equal the full-scan projection
    val pruned = df.orderBy("lang", "n_tokens").collect().map(_.toSeq).toSeq
    val full = load(100, 4).select("lang", "n_tokens")
      .orderBy("lang", "n_tokens").collect().map(_.toSeq).toSeq
    assert(pruned == full)
  }

  test("doc_id range pushdown prunes whole splits and clamps the rest") {
    // grid: 10 splits of 10 over [0,100); [35,62) touches splits 3-6
    val df = load(100, 10).filter(col("doc_id") >= 35 && col("doc_id") < 62)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      (35L until 62L))
    // fully-pushed range predicates leave no post-scan Filter NODE
    // (the plan string still says "PushedFilters" inside the scan)
    val hasFilterNode = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }.nonEmpty
    assert(!hasFilterNode, df.queryExecution.executedPlan.toString)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(doc_id,35"), plan)
    assert(plan.contains("LessThan(doc_id,62"), plan)
  }

  test("non-id predicates stay residual; results match a full scan") {
    val df = load(100, 10)
      .filter(col("doc_id") < 50 && col("lang") === "en")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), plan) // lang is evaluated post-scan
    assert(df.rdd.getNumPartitions == 5)  // id bound still pushed
    val expect = load(100, 10).collect()
      .filter(r => r.getAs[Long]("doc_id") < 50 &&
        r.getAs[String]("lang") == "en").map(_.toSeq).sortBy(_.toString)
    assert(df.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      expect.toSeq)
  }

  test("contradictory/out-of-range pushed bounds plan zero splits") {
    val df = load(100, 10).filter(col("doc_id") === 5000)
    assert(df.rdd.getNumPartitions == 0)
    assert(df.count() == 0)
    val two = load(100, 10)
      .filter(col("doc_id") > 80 && col("doc_id") <= 20)
    assert(two.count() == 0)
  }

  test("limit pushdown shrinks the generated range") {
    // unordered LIMIT n = any n rows; the source emits the first n ids
    val df = load(1000, 8).limit(5)
    assert(df.count() == 5)
    assert(df.rdd.getNumPartitions == 1) // 7 of 8 splits pruned
    // composed with a pushed filter the slice starts at the bound
    val f = load(1000, 8).filter(col("doc_id") >= 700).limit(5)
    assert(f.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      (700L until 705L))
  }

  test("topN pushdown: ORDER BY doc_id LIMIT n reads one boundary slice") {
    val asc = load(1000, 8).orderBy(col("doc_id")).limit(5)
    assert(asc.collect().map(_.getAs[Long]("doc_id")).toSeq ==
      (0L until 5L))
    val desc = load(1000, 8).orderBy(col("doc_id").desc).limit(5)
    assert(desc.collect().map(_.getAs[Long]("doc_id")).toSeq ==
      (999L to 995L by -1L))
    // a non-id ordering is refused: full range still planned
    val other = load(1000, 8).orderBy(col("lang")).limit(5)
    assert(other.count() == 5)
    assert(other.queryExecution.executedPlan.toString
      .contains("bounds=[0,1000)"))
  }

  test("runtime filtering prunes splits to those holding the id set") {
    // Drive the SupportsRuntimeFiltering contract directly (Spark
    // invokes filter() between planning and planInputPartitions when
    // dynamic pruning fires; the contract is ours to honor either way).
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.sources.{Filter, In}
    val df = load(1000, 10)
    val scan = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[SupportsRuntimeFiltering]
    }.get
    assert(scan.filterAttributes().head.fieldNames().toSeq == Seq("doc_id"))
    scan.filter(Array[Filter](In("doc_id", Array(7L, 355L, 356L))))
    val splits = scan.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
      .planInputPartitions()
    // ids live in splits [0,100) and [300,400) — 2 of 10 survive
    assert(splits.length == 2)
  }

  test("reported statistics carry the exact post-pushdown row count") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    def numRows(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r.computeStats().rowCount.get
      }.get
    assert(numRows(load(1000, 8)) == BigInt(1000))
    assert(numRows(load(1000, 8)
      .filter(col("doc_id") >= 35 && col("doc_id") < 62)) == BigInt(27))
  }

  test("h32 equals the oracle's ('0x'||substr(md5(s),1,8))::BIGINT") {
    import spark.implicits._
    val inputs = (0 until 25).map(i => s"$i:lang")
    val sparkSide = inputs.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(sparkSide == inputs.map(SyntheticDocs.h32))
  }
}
