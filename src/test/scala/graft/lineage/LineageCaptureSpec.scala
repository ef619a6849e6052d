package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Automatic write capture (r17): a session listener turns every
  * DataFrame write into edges — saveAsTable, insertInto, and raw path
  * writes — while actions (collect/count) produce nothing, and the
  * store-wired variant never observes its own appends. */
class LineageCaptureSpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.Tables.registerAll(spark, sfDir)
  }

  /** The bus is async: poll until the predicate holds or 15 s. */
  private def eventually(pred: => Boolean): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!pred && System.nanoTime() < deadline) Thread.sleep(50)
    assert(pred, "listener did not deliver within 15s")
  }

  private def withTable(name: String)(f: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(wh, name))
    try f finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("saveAsTable / insertInto / path writes are captured; actions are not") {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[LineageResult]()
    val l = LineageCapture.attach(spark, r => buf.add(r))
    try withTable("cap_tbl") {
      val src = spark.table("nation")
        .select(col("n_nationkey").as("k"), col("n_name").as("v"))
      // 1 create-as-select: ONE capture despite the three commands a
      // v1 saveAsTable runs (wrappers skipped, terminal insert kept),
      // warehouse-path heuristic recovers the table name
      src.write.saveAsTable("cap_tbl")
      eventually(buf.size == 1)
      Thread.sleep(500) // the skipped wrapper events must NOT arrive
      assert(buf.size == 1, s"wrapper commands captured: $buf")
      val ctas = buf.poll()
      assert(ctas.outputTables.contains("default.cap_tbl"))
      assert(ctas.inputTables == Set("default.nation"))
      assert(ctas.colLines.map(c => (c.toName, c.fromName)).toSet ==
        Set(("k", "default.nation.n_nationkey"),
          ("v", "default.nation.n_name")))
      // 2 actions emit nothing
      src.count(); src.collect()
      // 3 insert into the existing table
      src.filter(col("k") < 5).write.insertInto("cap_tbl")
      eventually(buf.size == 1)
      val ins = buf.poll()
      assert(ins.operation == Operation.Insert)
      assert(ins.outputTables.exists(_.contains("cap_tbl")))
      assert(ins.colLines.exists(_.conditionSet.exists(c =>
        c.startsWith("WHERE:") && c.contains("k <"))))
      // destination columns zip by ordinal against the (now existing)
      // sink schema — the S10 contract, automatic
      assert(ins.colLines.flatMap(_.colName).toSet ==
        Set("default.cap_tbl.k", "default.cap_tbl.v"))
      // 4 a pure path write gets the file.[<path>] sink
      val dir = java.nio.file.Files
        .createTempDirectory("graft_cap_path").toString
      try {
        src.write.mode("overwrite").parquet(dir)
        eventually(buf.size == 1)
        val pw = buf.poll()
        assert(pw.outputTables.exists(o =>
          o.startsWith("file.[") && o.contains(dir)))
        assert(pw.inputTables == Set("default.nation"))
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    } finally LineageCapture.detach(spark, l)
    // detached: further writes are not observed
    val before = buf.size
    spark.range(3).write.mode("overwrite")
      .parquet("target/graft-cap-detached")
    Thread.sleep(300)
    assert(buf.size == before)
  }

  test("GraftCaptureListener: config-only deployment (store from conf)") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_cap_conf").toString
    // production wires this via --conf spark.sql.queryExecutionListeners
    // (zero-arg construction by Spark) + the store conf; the test
    // registers the same zero-arg instance by hand on the live session
    spark.conf.set("spark.graft.lineage.store", store)
    val l = new GraftCaptureListener
    spark.listenerManager.register(l)
    try withTable("cap_conf_tbl") {
      spark.table("region").select(col("r_regionkey"), col("r_name"))
        .write.saveAsTable("cap_conf_tbl")
      eventually(LineageStore.runs(spark, store).nonEmpty)
      Thread.sleep(500) // self-appends must be filtered here too
      assert(LineageStore.runs(spark, store) == Seq(1L))
      assert(LineageStore.snapshot(spark, store)
        .filter(col("table_name").contains("cap_conf_tbl")).count() == 2)
      // conf unset → the listener goes inert, no new runs
      spark.conf.unset("spark.graft.lineage.store")
      spark.table("region").select(col("r_name"))
        .write.mode("overwrite").saveAsTable("cap_conf_tbl")
      Thread.sleep(700)
      assert(LineageStore.runs(spark, store) == Seq(1L))
    } finally {
      spark.listenerManager.unregister(l)
      spark.conf.unset("spark.graft.lineage.store")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(store))
    }
  }

  test("attachReads logs scans with the PHYSICALLY read columns") {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Seq[(String, Seq[String])])]()
    val l = LineageCapture.attachReads(spark, (i, rs) => buf.add((i, rs)))
    try withTable("cap_read_tbl") {
      spark.table("nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.saveAsTable("cap_read_tbl")
      Thread.sleep(400); buf.clear() // drop the write's own reads
      // a two-column question against a three-column table: the log
      // must show only the pruned pair — proof pruning reached the scan
      spark.table("cap_read_tbl").filter(col("n_regionkey") === 1)
        .select(col("n_name"))
        .write.format("noop").mode("overwrite").save()
      eventually(!buf.isEmpty)
      val (_, reads) = buf.poll()
      assert(reads == Seq("default.cap_read_tbl" ->
        Seq("n_name", "n_regionkey")), reads)
      // a count() needs NO columns — the log shows the scan with an
      // EMPTY column list (metadata-only read), which is itself the
      // pruning fact
      buf.clear()
      spark.table("cap_read_tbl").count()
      eventually(!buf.isEmpty)
      assert(buf.poll()._2 == Seq("default.cap_read_tbl" -> Seq()))
      // actions with no table scan (range) log nothing
      buf.clear()
      spark.range(5).count()
      Thread.sleep(400)
      assert(buf.isEmpty)
    } finally LineageCapture.detach(spark, l)
  }

  test("attachStreams captures a starting query's topology, sink included") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[LineageResult]()
    val l = LineageCapture.attachStreams(spark, r => buf.add(r))
    try {
      val docs = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)].toDF().toDF("doc_id", "text")
      val q = docs.filter(col("doc_id") > 2)
        .writeStream.format("memory").queryName("cap_stream_sink")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        eventually(!buf.isEmpty)
        val r = buf.poll()
        assert(r.outputTables == Set("stream.MemorySink[cap_stream_sink]"))
        assert(r.colLines.map(c => (c.toName, c.fromName)).toSet ==
          Set(("doc_id", "stream.memory._1"), ("text", "stream.memory._2")))
      } finally {
        q.awaitTermination()
        spark.catalog.dropTempView("cap_stream_sink")
      }
    } finally LineageCapture.detachStreams(spark, l)
  }

  test("attachStore accumulates runs without observing its own appends") {
    val local = java.nio.file.Files
      .createTempDirectory("graft_cap_store").toString
    // SCHEME-QUALIFIED store dir on purpose: the hdfs:///-style config
    // the class documents. The self-filter must recognize its appends
    // through the URI form (a rendered-string compare printed
    // file:/x vs file:///x for one location and looped forever).
    val store = "file:" + local
    val l = LineageCapture.attachStore(spark, store)
    try withTable("cap_store_tbl") {
      spark.table("region").select(col("r_regionkey"), col("r_name"))
        .write.saveAsTable("cap_store_tbl")
      eventually(LineageStore.runs(spark, store).nonEmpty)
      // give the bus time to process the append's own event — the
      // self-filter must drop it rather than record run 2
      Thread.sleep(500)
      assert(LineageStore.runs(spark, store) == Seq(1L))
      val snap = LineageStore.snapshot(spark, store)
      assert(snap.filter(col("table_name").contains("cap_store_tbl"))
        .count() == 2)
      // a second real write lands as run 2 (monotonic allocation)
      spark.table("region").select(col("r_regionkey").as("only"))
        .write.mode("overwrite").saveAsTable("cap_store_tbl")
      eventually(LineageStore.runs(spark, store).size == 2)
      Thread.sleep(500)
      assert(LineageStore.runs(spark, store) == Seq(1L, 2L))
      // captured history is a write LOG: statement identity = run id,
      // so the snapshot keeps BOTH writes (nothing silently shadowed
      // by a restarted session's event counter)
      val stmts = LineageStore.snapshot(spark, store)
        .select("run_id", "stmt").distinct()
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(stmts == Set((1L, 1), (2L, 2)))
    } finally {
      LineageCapture.detach(spark, l)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(local))
    }
  }
}
