package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Golden lineage for STREAMING DataFrames (VERDICT r14 #6):
  * `LineageParser.fromPlan` over an analyzed `readStream` plan —
  * streaming leaves land in inputTables under the reserved `stream`
  * qualifier (`stream.<source>`, file sources self-describing as
  * `FileSource[<path>]`), the watermark joins the condition set as a
  * `WATERMARK:<col> DELAY <interval>` tag, and everything else
  * (filters, joins, aggregates) is the same fold batch plans take.
  * No query ever RUNS here: lineage reads the analyzed plan only, so
  * no sink or checkpoint is needed. */
class LineageStreamingSpec extends SparkTestBase {

  private lazy val ready: Unit =
    LineageQueries.registerFixtures(spark, sfDir)

  private def eventsPath = s"$sfDir/events.parquet"

  private def eventsStream = {
    ready
    val schema = spark.read.parquet(eventsPath).schema
    spark.readStream.schema(schema).parquet(eventsPath)
  }

  private def src = s"stream.FileSource[$eventsPath]"

  private def rows(r: LineageResult): Set[(String, String, String)] =
    r.colLines.map(c => (c.toName, c.fromName,
      c.conditionSet.toSeq.sorted.mkString("|"))).toSet

  test("file readStream: stream-qualified input table, WHERE tag, leaf edges") {
    val df = eventsStream
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"))
    val r = LineageParser.fromDataFrame(df)
    assert(r.inputTables == Set(src))
    assert(r.outputTables.isEmpty) // <EOF> sink, like any plain query
    assert(rows(r) == Set(
      ("event_id", s"$src.event_id", "WHERE:(event_type = 'click')"),
      ("user_id", s"$src.user_id", "WHERE:(event_type = 'click')")))
  }

  test("watermark + windowed aggregate: WATERMARK condition tag on every edge") {
    // the q66 shape: watermark, tumbling window, count — the watermark
    // is an annotation (condition set), never an edge; the analyzer's
    // own `ts IS NOT NULL` guard for streaming aggregation shows up as
    // an ordinary WHERE tag because it IS an ordinary Filter node
    val df = eventsStream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"))
    val r = LineageParser.fromDataFrame(df)
    assert(r.inputTables == Set(src))
    val conds = "WATERMARK:ts DELAY 10 minutes|WHERE:(ts IS NOT NULL)"
    assert(rows(r) == Set(
      ("event_type", s"$src.event_type", conds),
      ("n", "", conds))) // count(1) references no column (E14)
  }

  test("v2 stream (MemoryStream): stream.<sourceName> input") {
    ready
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)].toDF().toDF("k", "v")
    val r = LineageParser.fromDataFrame(ms.select(col("k")))
    assert(r.inputTables == Set("stream.memory"))
    // the memory relation's native columns are _1/_2; toDF renames
    assert(rows(r) == Set(("k", "stream.memory._1", "")))
  }

  test("typed boundary: transitions' transformWithState plan keeps its stream leaves") {
    // VERDICT r15 #1: a groupByKey().transformWithState pipeline passes
    // through AppendColumns (the grouping closure) and
    // TransformWithState + SerializeFromObject (the processor). The
    // conservative opaque contract: every output column sources from
    // ALL stream inputs, closure-carrying nodes tag FUNC:<node>, and
    // the stream.<source> leaf survives to inputTables.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.EventStreams.EventTyped].toDS()
    val r = LineageParser.fromDataFrame(
      graft.streaming.EventStreams.transitions(spark, events).toDF())
    assert(r.inputTables == Set("stream.memory"))
    val allIn = Seq("event_id", "event_type", "us", "user_id")
      .map(c => s"stream.memory.$c").mkString(",")
    val conds = "FUNC:AppendColumns|FUNC:TransformWithState"
    assert(rows(r) == Set(
      ("user_id", allIn, conds),
      ("from_type", allIn, conds),
      ("to_type", allIn, conds)))
  }

  test("typed boundary: the near-dup gate's plan traces to its document stream") {
    // The engine's flagship twin: banded signatures (stateless
    // projections, including the text IS NOT NULL filter) feeding the
    // stateful bucket fold. Output columns are produced BY the
    // processor, so each sources from the full document stream.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)].toDF().toDF("doc_id", "text")
    val banded = graft.streaming.DocStreams.bandedSignatures(
      docs, "doc_id", "text", 24, 4, 6)
    val r = LineageParser.fromDataFrame(
      graft.streaming.DocStreams.nearDupGate(spark, banded, 24, 12).toDF())
    assert(r.inputTables == Set("stream.memory"))
    val allIn = "stream.memory._1,stream.memory._2"
    val conds = "FUNC:AppendColumns|FUNC:TransformWithState|" +
      "WHERE:(text IS NOT NULL)"
    assert(rows(r) == Set(
      ("doc_a", allIn, conds),
      ("doc_b", allIn, conds),
      ("est_permille", allIn, conds)))
  }

  test("observe (CollectMetrics) is lineage-transparent") {
    // Dataset.observe wraps the plan in a CollectMetrics node whose
    // output IS its child's output — the generic fold arm must pass
    // sources through unchanged, so wrapping the gate in its
    // exactly-once metrics observation never perturbs lineage.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)].toDF().toDF("doc_id", "text")
    val banded = graft.streaming.DocStreams.bandedSignatures(
      docs, "doc_id", "text", 24, 4, 6)
    val gate = graft.streaming.DocStreams.nearDupGate(spark, banded, 24, 12)
    val plain = LineageParser.fromDataFrame(gate.toDF())
    val observed = LineageParser.fromDataFrame(
      graft.streaming.DocStreams.observedGate(gate).toDF())
    assert(rows(observed) == rows(plain))
    assert(observed.inputTables == plain.inputTables)
  }

  test("typed boundary: mapGroups and typed filter stay conservative, pass-through stays precise") {
    // mapGroups produces a fresh object column (all-inputs edge, FUNC
    // tags); a typed filter reads the row opaquely (FUNC:TypedFilter
    // tag) but its child attributes PASS THROUGH with their precise
    // per-column mapping — conservatism only where the plan is
    // actually opaque. Batch plans, same fold.
    import spark.implicits._
    LineageQueries.registerFixtures(spark, sfDir)
    val base = spark.table("nation")
      .select(col("n_nationkey"), col("n_name"))
    val mapped = base.as[(Int, String)]
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, it.length))
      .toDF("k", "n")
    val rm = LineageParser.fromDataFrame(mapped)
    assert(rm.inputTables == Set("default.nation"))
    val allIn = "default.nation.n_name,default.nation.n_nationkey"
    assert(rows(rm).forall { case (_, from, conds) =>
      from == allIn && conds.contains("FUNC:AppendColumns") &&
        conds.contains("FUNC:MapGroups") })
    val filtered = base.as[(Int, String)].filter(_._1 > 2).toDF()
    val rf = LineageParser.fromDataFrame(filtered)
    assert(rows(rf) == Set(
      ("n_nationkey", "default.nation.n_nationkey", "FUNC:TypedFilter"),
      ("n_name", "default.nation.n_name", "FUNC:TypedFilter")))
  }

  test("typed boundary: cogroup unions BOTH children's sources") {
    // The one multi-child typed node: the opaque arm's child fold must
    // merge both grouped datasets' leaf sources into every output
    // column (a cogroup closure can read either side).
    import spark.implicits._
    LineageQueries.registerFixtures(spark, sfDir)
    val left = spark.table("nation")
      .select(col("n_nationkey"), col("n_name")).as[(Int, String)]
      .groupByKey(_._1)
    val right = spark.table("region")
      .select(col("r_regionkey"), col("r_name")).as[(Int, String)]
      .groupByKey(_._1)
    val cg = left.cogroup(right)((k, a, b) =>
      Iterator((k, a.length + b.length))).toDF("k", "n")
    val r = LineageParser.fromDataFrame(cg)
    assert(r.inputTables == Set("default.nation", "default.region"))
    val allIn = Seq("default.nation.n_name", "default.nation.n_nationkey",
      "default.region.r_name", "default.region.r_regionkey").mkString(",")
    assert(rows(r).forall { case (_, from, conds) =>
      from == allIn && conds.contains("FUNC:CoGroup") })
  }

  test("impactAll counts stream-source fan-out beside batch tables") {
    // q273 (VERDICT r15 #8): the impact rollup over the UNION of the
    // batch corpus, the streaming shapes, and the typed twins — "what
    // breaks if this stream source's schema changes" is answerable in
    // the same frame as the batch question. Exact counts live in the
    // frozen q273 oracle; here the structural facts are pinned: the
    // stream source appears as a first-class row, fed by BOTH the
    // streaming corpus and the typed twins (> either alone), and the
    // batch rows are untouched by the union.
    val all = LineageQueries.impactAll(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(all.contains("stream.memory"), s"rows: ${all.keys}")
    assert(all("stream.memory")._3 == 7,
      s"5 streaming + 2 typed statements read the stream: $all")
    val batchOnly = LineageQueries.impact(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!batchOnly.contains("stream.memory"))
    // nation gains exactly the stream-static join's one edge (shape 3
    // reads n_name); every other batch table is untouched by the union
    assert(all("default.nation")._1 == batchOnly("default.nation")._1 + 1)
    (batchOnly - "default.nation").foreach { case (k, v) =>
      assert(all(k) == v, s"batch row $k changed under the union") }
  }

  test("stream-static join: both the stream leaf and the catalog table are inputs") {
    // the enrichedWindowCounts shape: a streaming frame joined against
    // a static dimension — the stream contributes stream.* sources,
    // the dimension ordinary db.table.col ones, under one JOIN tag
    val df = eventsStream
      .join(spark.table("nation"), col("user_id") === col("n_nationkey"))
      .select(col("event_id"), col("n_name"))
    val r = LineageParser.fromDataFrame(df)
    assert(r.inputTables == Set(src, "default.nation"))
    // the analyzer widens the int dimension key to the stream's bigint
    val tag = "JOIN:(user_id = CAST(nation.n_nationkey AS BIGINT))"
    assert(rows(r) == Set(
      ("event_id", s"$src.event_id", tag),
      ("n_name", "default.nation.n_name", tag)))
  }
}
