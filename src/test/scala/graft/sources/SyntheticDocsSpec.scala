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

  test("micro-batch stream replays the id line under admission control") {
    // MICRO_BATCH_READ: offsets are id positions; rowsPerBatch caps
    // ids per micro-batch via ReadLimit.maxRows. The batch count pins
    // the admission-control contract (a regression to one big batch
    // would still produce identical rows); the row set pins that rate
    // limiting changes batch boundaries, never data.
    val q = spark.readStream.format("graft.sources.SyntheticDocs")
      .option("rows", "1000").option("partitions", "8")
      .option("rowsPerBatch", "300").load()
      .select("doc_id", "lang", "n_tokens")
      .writeStream.format("memory").queryName("sdocs_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    val got = spark.table("sdocs_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    spark.catalog.dropTempView("sdocs_stream")
    assert(dataBatches == 4, s"ceil(1000/300) = 4, got $dataBatches")
    val expect = load(1000, 8).select("doc_id", "lang", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got.toSeq == expect.toSeq)
  }

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

  test("aggregate pushdown: ungrouped count/min/max/sum served from metadata") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    // 100M rows: if the aggregate were NOT pushed this would still be a
    // doc_id-only generated scan (cheap), but the plan assertions below
    // pin that no Aggregate node and no data row exists at all.
    val df = load(100000000, 64)
      .filter(col("doc_id") >= 1234 && col("doc_id") < 98765432)
      .agg(count(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        sum(col("doc_id")).as("sum_id"))
    // complete pushdown: the Aggregate is GONE from the optimized plan
    assert(df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a }.isEmpty, df.queryExecution.optimizedPlan)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedAggregates"), planStr)
    // closed forms over [1234, 98765432)
    val n = 98765432L - 1234L
    val r = df.collect().head
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("min_id") == 1234L)
    assert(r.getAs[Long]("max_id") == 98765431L)
    assert(r.getAs[Long]("sum_id") ==
      ((BigInt(1234) + BigInt(98765431)) * n / 2).toLong)
  }

  test("aggregate pushdown: empty range yields the (0, NULL...) row") {
    val df = load(100, 4).filter(col("doc_id") >= 500)
      .agg(count(col("doc_id")).as("n"), min(col("doc_id")).as("mn"),
        sum(col("doc_id")).as("sm"))
    val r = df.collect().head
    assert(r.getAs[Long]("n") == 0L)
    assert(r.isNullAt(r.fieldIndex("mn")) && r.isNullAt(r.fieldIndex("sm")))
  }

  test("aggregate pushdown refused: non-id min and non-unique distinct fall back") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    // min on a non-id column is refused but still correct via row scan
    val m = load(200, 4).agg(min(col("lang")).as("mn"))
    assert(m.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a }.nonEmpty)
    val viaRows = load(200, 4).select("lang").collect()
      .map(_.getString(0)).min
    assert(m.collect().head.getString(0) == viaRows)
    // distinct count on a NON-unique column is refused (would be wrong
    // as n), served by scan; distinct on unique doc_id is accepted
    val dl = load(200, 4).agg(countDistinct(col("lang")).as("n"))
    assert(dl.collect().head.getLong(0) == 5L)
    val di = load(200, 4).agg(countDistinct(col("doc_id")).as("n"))
    assert(di.collect().head.getLong(0) == 200L)
  }

  test("grouped aggregate pushdown: partial — split folds, final agg merges") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val df = load(1000, 8)
      .filter(col("doc_id") >= 100 && col("doc_id") < 900)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"),
        max(col("doc_id")).as("mx"), sum(col("doc_id")).as("sm"))
    // PARTIAL pushdown: the final Aggregate STAYS (merges per-split
    // partials) but the scan is the grouped-agg scan, not a row scan
    assert(df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a }.nonEmpty)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedGroupBy: [lang]"), planStr)
    assert(planStr.contains("PushedAggregates"), planStr)
    // values equal the unpushed row-scan computation exactly
    val rows = (100L until 900L).map(i => (SyntheticDocs.langOf(i), i))
    val expect = rows.groupBy(_._1).map { case (l, xs) =>
      (l, xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._2).sum) }.toSeq.sortBy(_._1)
    val got = df.orderBy("lang").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
  }

  test("grouped aggregate pushdown: multi-column grouping and refusal") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    // (lang, source): both groupable -> pushed, values match row scan
    val df = load(500, 4).groupBy("lang", "source")
      .agg(count(lit(1)).as("n"))
    assert(df.queryExecution.executedPlan.toString
      .contains("PushedGroupBy: [lang, source]"),
      df.queryExecution.executedPlan.toString)
    val expect = (0L until 500L)
      .groupBy(i => (SyntheticDocs.langOf(i), SyntheticDocs.sourceOf(i)))
      .view.mapValues(_.size.toLong).toMap
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    // n_tokens is NOT groupable (30-value domain but a per-id hash the
    // fold would have to compute anyway — kept off the contract):
    // refused to the row scan, still correct
    val ref = load(500, 4).groupBy("n_tokens").agg(count(lit(1)).as("n"))
    assert(!ref.queryExecution.executedPlan.toString
      .contains("PushedGroupBy"))
    assert(ref.agg(sum("n")).collect().head.getLong(0) == 500L)
  }

  test("grouped avg is auto-served: Spark rewrites Avg to pushed SUM+COUNT") {
    // The source never classifies Avg (DocsAgg has no arm for it) —
    // it doesn't need to: V2ScanRelationPushDown rewrites a partial
    // Avg into Sum+Count BEFORE offering the aggregation, so the
    // grouped scan serves avg(doc_id) with the existing vocabulary.
    // Pinned so a future classify() change can't silently regress the
    // rewrite into a row scan.
    val df = load(1000, 8)
      .filter(col("doc_id") >= 100 && col("doc_id") < 900)
      .groupBy("lang").agg(avg(col("doc_id")).as("a"))
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedGroupBy: [lang]"), planStr)
    assert(planStr.contains("SUM(doc_id)") && planStr.contains("COUNT("),
      planStr)
    // exact: both sides divide an exact Long sum by an exact Long count
    val expect = (100L until 900L).groupBy(SyntheticDocs.langOf)
      .view.mapValues(xs => xs.sum.toDouble / xs.size).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect)
  }

  test("h32 equals the oracle's ('0x'||substr(md5(s),1,8))::BIGINT") {
    import spark.implicits._
    val inputs = (0 until 25).map(i => s"$i:lang")
    val sparkSide = inputs.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(sparkSide == inputs.map(SyntheticDocs.h32))
  }

  test("validating write commits: round-trip rows merge into the outcome") {
    val wid = "spec_commit"
    SyntheticDocsWrites.clear(wid)
    load(500, 4).write.format("graft.sources.SyntheticDocs")
      .option("rows", "500").option("writeId", wid)
      .mode("append").save()
    val o = SyntheticDocsWrites.get(wid).get
    SyntheticDocsWrites.clear(wid)
    assert(o.status == "committed")
    assert(o.nRows == 500L && o.sumId == 499L * 500L / 2)
    assert(o.minId == 0L && o.maxId == 499L)
    assert(o.nTasks >= 1) // one commit message per successful task
  }

  test("validating write aborts on a tampered row: no quiet commit") {
    val wid = "spec_abort"
    SyntheticDocsWrites.clear(wid)
    val tampered = load(200, 4)
      .withColumn("n_tokens",
        when(col("doc_id") === 137L, lit(-1L)).otherwise(col("n_tokens")))
    val e = intercept[Exception] {
      tampered.write.format("graft.sources.SyntheticDocs")
        .option("rows", "200").option("writeId", wid)
        .mode("append").save()
    }
    // the writer names the failing row and field in the task failure
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m =>
      m.contains("137") && m.contains("n_tokens")) ||
      e.toString.contains("n_tokens"))
    val o = SyntheticDocsWrites.get(wid)
    SyntheticDocsWrites.clear(wid)
    // abort() recorded — and no committed outcome overwrote it
    assert(o.exists(_.status == "aborted"),
      s"expected an aborted outcome, got $o")
  }

  test("overwrite mode validates like append (truncate is a no-op on a storage-less sink)") {
    val wid = "spec_overwrite"
    SyntheticDocsWrites.clear(wid)
    load(120, 3).write.format("graft.sources.SyntheticDocs")
      .option("rows", "120").option("writeId", wid)
      .mode("overwrite").save()
    val o = SyntheticDocsWrites.get(wid).get
    SyntheticDocsWrites.clear(wid)
    assert(o.status == "committed" && o.nRows == 120L)
  }

  test("streaming write: epoch commits merge exactly-once into the outcome") {
    val wid = "spec_stream_commit"
    SyntheticDocsWrites.clear(wid)
    val ckpt = java.nio.file.Files
      .createTempDirectory("sdocs_sw_ckpt").toString
    val q = spark.readStream.format("graft.sources.SyntheticDocs")
      .option("rows", "1000").option("partitions", "4")
      .option("rowsPerBatch", "300").load()
      .writeStream.format("graft.sources.SyntheticDocs")
      .option("rows", "1000").option("writeId", wid)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val o = SyntheticDocsWrites.get(wid).get
    SyntheticDocsWrites.clear(wid)
    assert(o.status == "committed")
    assert(o.nRows == 1000L && o.sumId == 999L * 1000L / 2)
    assert(o.minId == 0L && o.maxId == 999L)
    assert(o.nEpochs == 4, s"ceil(1000/300) = 4 data epochs, got $o")
  }

  test("streaming write: a tampered micro-batch aborts, no quiet commit") {
    val wid = "spec_stream_abort"
    SyntheticDocsWrites.clear(wid)
    val ckpt = java.nio.file.Files
      .createTempDirectory("sdocs_sw_abort_ckpt").toString
    val tampered = spark.readStream.format("graft.sources.SyntheticDocs")
      .option("rows", "400").option("partitions", "4").load()
      .withColumn("n_chars",
        when(col("doc_id") === 251L, lit(-7L)).otherwise(col("n_chars")))
    intercept[Exception] {
      val q = tampered
        .writeStream.format("graft.sources.SyntheticDocs")
        .option("rows", "400").option("writeId", wid)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val o = SyntheticDocsWrites.get(wid)
    SyntheticDocsWrites.clear(wid)
    assert(o.exists(_.status == "aborted"),
      s"expected an aborted outcome, got $o")
  }

  test("a NEW query reusing a writeId starts from a clean outcome") {
    // ADVICE r14: the registry and epoch set are driver-JVM-global, so
    // without the query-start reset a second query reusing the writeId
    // (no clear() between) would dedup its epoch ids against the FIRST
    // query's and keep its stale cumulative counts. Run 1 is the
    // LARGER write so the stale fold is detectable: without the reset,
    // run 2's epochs 0 and 1 are silently skipped and the outcome
    // stays at 900 rows / 3 epochs.
    val wid = "spec_stream_reuse"
    SyntheticDocsWrites.clear(wid)
    def run(rows: Int): SyntheticDocsWrites.Outcome = {
      val ckpt = java.nio.file.Files
        .createTempDirectory("sdocs_sw_reuse").toString
      val q = spark.readStream.format("graft.sources.SyntheticDocs")
        .option("rows", rows.toString).option("partitions", "4")
        .option("rowsPerBatch", "300").load()
        .writeStream.format("graft.sources.SyntheticDocs")
        .option("rows", rows.toString).option("writeId", wid)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      SyntheticDocsWrites.get(wid).get
    }
    val first = run(900)
    assert(first.nRows == 900L && first.nEpochs == 3)
    val second = run(600) // NO clear() — the reset is the contract
    SyntheticDocsWrites.clear(wid)
    assert(second.nRows == 600L && second.nEpochs == 2 &&
      second.maxId == 599L,
      s"stale outcome folded into the reused writeId: $second")
  }

  test("validating write refuses ids outside the declared range") {
    val wid = "spec_range"
    SyntheticDocsWrites.clear(wid)
    intercept[Exception] {
      load(300, 2).write.format("graft.sources.SyntheticDocs")
        .option("rows", "100") // declared smaller than the data's ids
        .option("writeId", wid).mode("append").save()
    }
    val o = SyntheticDocsWrites.get(wid)
    SyntheticDocsWrites.clear(wid)
    assert(o.exists(_.status == "aborted"))
  }
}
