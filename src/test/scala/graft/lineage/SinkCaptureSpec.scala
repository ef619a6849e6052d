package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Golden lineage for STARTED streaming queries, sink included
  * (VERDICT r16 #2): [[LineageParser.fromStreamingQuery]] reads the
  * ACTUAL sink from the query's resolved WriteToStream — the streaming
  * twin of the reference's automatic INSERT-sink detection (S4,
  * `LineParser.java:300-304`) — instead of a caller-supplied name.
  * Queries start but never need a batch: everything is resolved at
  * `start()`; MemoryStream sources stay empty so runs are instant. */
class SinkCaptureSpec extends SparkTestBase {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def emptyDocs = {
    import spark.implicits._
    org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
      .toDF().toDF("doc_id", "text")
  }

  private def rows(r: LineageResult): Set[(String, String, String)] =
    r.colLines.map(c => (c.toName, c.colName.getOrElse(""), c.fromName)).toSet

  test("toTable sink: catalog identifier + ordinal-zipped dest columns") {
    spark.sql("DROP TABLE IF EXISTS sinkcap_tbl")
    spark.sql("CREATE TABLE sinkcap_tbl (sk_key BIGINT, sk_text STRING) USING parquet")
    val ckpt = java.nio.file.Files.createTempDirectory("sinkcap_ck")
    val q = emptyDocs.writeStream
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .toTable("sinkcap_tbl")
    try {
      val r = LineageParser.fromStreamingQuery(q)
      assert(r.operation == Operation.Insert)
      assert(r.outputTables == Set("default.sinkcap_tbl"))
      assert(r.inputTables == Set("stream.memory"))
      // S10 ordinal zip against the sink's real schema — automatic,
      // not caller-supplied like forWrite
      assert(rows(r) == Set(
        ("doc_id", "default.sinkcap_tbl.sk_key", "stream.memory._1"),
        ("text", "default.sinkcap_tbl.sk_text", "stream.memory._2")))
    } finally {
      q.awaitTermination()
      spark.sql("DROP TABLE IF EXISTS sinkcap_tbl")
    }
  }

  test("path sink: stream.FileSink[<path>] mirrors the source-side encoding") {
    val out = java.nio.file.Files.createTempDirectory("sinkcap_out")
    val ckpt = java.nio.file.Files.createTempDirectory("sinkcap_ck2")
    val q = emptyDocs.filter(col("doc_id") > 3)
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      val r = LineageParser.fromStreamingQuery(q)
      assert(r.operation == Operation.Insert)
      val sink = r.outputTables.head
      assert(sink.startsWith("stream.FileSink[") &&
        sink.contains(out.toString) && sink.endsWith("]"), sink)
      // no catalog schema for a bare path: edges carry no dest colName,
      // the WHERE tag and leaf sources are the ordinary fold's
      val e = r.colLines.find(_.toName == "doc_id").get
      assert(e.colName.isEmpty)
      assert(e.fromName == "stream.memory._1")
      assert(e.conditionSet == Set("WHERE:(doc_id > CAST(3 AS BIGINT))"))
    } finally q.awaitTermination()
  }

  test("memory sink: stream.MemorySink[<query name>] names the temp view") {
    val q = emptyDocs.writeStream.format("memory")
      .queryName("sinkcap_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      val r = LineageParser.fromStreamingQuery(q, index = 7)
      assert(r.statementIndex == 7)
      assert(r.outputTables == Set("stream.MemorySink[sinkcap_mem]"))
      assert(rows(r) == Set(
        ("doc_id", "", "stream.memory._1"),
        ("text", "", "stream.memory._2")))
    } finally {
      q.awaitTermination()
      spark.catalog.dropTempView("sinkcap_mem")
    }
  }

  test("foreachBatch sink: the opaque-callback write still names itself") {
    // the callback is a black box (lineage cannot see inside it), but
    // the query's SOURCE-side edges and the sink's self-description
    // still capture — the degradation is named, never silent
    val ckpt = java.nio.file.Files.createTempDirectory("sinkcap_fb")
    val q = emptyDocs.filter(col("doc_id") > 1).writeStream
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .foreachBatch((_: org.apache.spark.sql.Dataset[
        org.apache.spark.sql.Row], _: Long) => ())
      .start()
    try {
      val r = LineageParser.fromStreamingQuery(q, index = 9)
      assert(r.outputTables.size == 1)
      val sink = r.outputTables.head
      assert(sink.startsWith("stream.") && sink.contains("ForeachBatch"),
        sink)
      assert(r.colLines.map(c => (c.toName, c.fromName)).toSet ==
        Set(("doc_id", "stream.memory._1"), ("text", "stream.memory._2")))
    } finally q.awaitTermination()
  }
}
