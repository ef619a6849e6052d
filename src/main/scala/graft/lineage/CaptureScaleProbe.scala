package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the CAPTURE-LOG workload — the store shape
  * [[LineageCapture.attachStore]] produces: one tiny run per observed
  * write, never superseded, so the directory population grows with
  * every write forever and [[LineageStore.compact]] is the
  * reclamation story ([[LineageStore]] scaladoc; VERDICT r17). The
  * probe materializes N one-write runs (a ~N-directory store — the
  * "10k writes/day" shape), times the read paths against the exploded
  * layout, compacts, and times them again; results in DESIGN.md §1.
  *
  * The N runs are laid down in ONE partitioned write (same on-disk
  * layout as N appends at ~1000× the speed — the probe measures READ
  * and COMPACT cost against the layout, not the append loop the store
  * spec already covers). Args: [runs] [edgesPerRun]. */
object CaptureScaleProbe {
  def main(args: Array[String]): Unit = {
    val nRuns = args.headOption.map(_.toInt).getOrElse(10000)
    val perRun = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.sources.parallelPartitionDiscovery.parallelism",
        "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_capture_probe").toString
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    try {
      // run 1 through the real CAPTURE append (stamps the version
      // file and, with stmt == run_id proven from the footer, the
      // `_stmt_eq_run` marker — a plain append would stamp `_mixed`
      // and pin the fast path off); the rest bulk-materialized in the
      // identical layout
      LineageStore.appendCaptured(spark, dir, 1L,
        spark.range(perRun).select(
          lit(1).as("stmt"), lit("INSERT").as("operation"),
          lit("db.sink_1").as("table_name"),
          concat(lit("db.sink_1.c"), col("id")).as("col_name"),
          concat(lit("c"), col("id")).as("to_name"),
          concat(lit("db.src_1.x"), col("id")).as("from_name"),
          lit("").as("conditions")))
      t(s"bulk-materialize ${nRuns - 1} one-write runs") {
        spark.range(2, nRuns + 1)
          .withColumn("k", explode(sequence(lit(0), lit(perRun - 1))))
          .select(col("id").cast("int").as("stmt"),
            lit("INSERT").as("operation"),
            concat(lit("db.sink_"), col("id")).as("table_name"),
            concat(lit("db.sink_"), col("id"), lit(".c"), col("k"))
              .as("col_name"),
            concat(lit("c"), col("k")).as("to_name"),
            concat(lit("db.src_"), col("id"), lit(".x"), col("k"))
              .as("from_name"),
            lit("").as("conditions"),
            col("id").as("run_id"))
          .write.mode("append").partitionBy("run_id").parquet(dir)
      }
      val runsBefore = t("runs() listing, exploded") {
        LineageStore.runs(spark, dir).size }
      val snapBefore = t("snapshot count, exploded") {
        LineageStore.snapshot(spark, dir).count() }
      // r19 plan audits: past 10k runs the resolve drops the FORCED
      // broadcast hint (one row per run through the driver was the
      // r18 scale bug) — Catalyst may still choose a broadcast from
      // its own size estimates while they are small, and grows out of
      // it with the data; the audit checks the hint is gone, by
      // planning with auto-broadcast off
      val prevThreshold =
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val unhinted = LineageStore.snapshot(spark, dir)
        .queryExecution.executedPlan.toString
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
      if (nRuns > 10000)
        require(!unhinted.contains("BroadcastExchange"),
          s"past the run limit the resolve must not FORCE a " +
            s"broadcast:\n$unhinted")
      println(s"resolve hint past 10k runs: forcedBroadcast=" +
        s"${unhinted.contains("BroadcastExchange")} (expect false " +
        s"for nRuns=$nRuns > 10000)")
      // MARKED capture-shaped (the bulk layout upholds stmt == run_id
      // by construction; run 1's appendCaptured proved its own), the
      // resolve disappears: no aggregation, no join, no exchange
      LineageStore.markCaptureShaped(spark, dir)
      val marked = LineageStore.snapshot(spark, dir)
        .queryExecution.executedPlan.toString
      require(!marked.contains("Join") && !marked.contains("Exchange"),
        s"capture-shaped snapshot must be a bare scan:\n$marked")
      val snapFast = t("snapshot count, capture-shaped") {
        LineageStore.snapshot(spark, dir).count() }
      require(snapFast == snapBefore, "fast path changed the snapshot")
      val oneBefore = t("single-run read, exploded") {
        LineageStore.read(spark, dir)
          .filter(col("run_id") === nRuns / 2L).count() }
      val folded = t(s"compact(upToRun=$nRuns)") {
        LineageStore.compact(spark, dir, nRuns.toLong).size }
      val runsAfter = t("runs() listing, compacted") {
        LineageStore.runs(spark, dir).size }
      val snapAfter = t("snapshot count, compacted") {
        LineageStore.snapshot(spark, dir).count() }
      val oneAfter = t("single-run read, compacted") {
        LineageStore.read(spark, dir)
          .filter(col("run_id") === nRuns / 2L).count() }
      // post-compaction appends land beside the segment
      LineageStore.append(spark, dir,
        LineageStore.claimRun(spark, dir),
        spark.range(perRun).select(
          lit(nRuns + 1).as("stmt"), lit("INSERT").as("operation"),
          lit("db.sink_new").as("table_name"), lit("").as("col_name"),
          concat(lit("c"), col("id")).as("to_name"),
          concat(lit("db.src_new.x"), col("id")).as("from_name"),
          lit("").as("conditions")))
      val snapLive = t("snapshot count, compacted + 1 live") {
        LineageStore.snapshot(spark, dir).count() }
      println(s"runs=$runsBefore->$runsAfter folded=$folded " +
        s"snapshot=$snapBefore->$snapAfter (+live=$snapLive) " +
        s"oneRun=$oneBefore->$oneAfter " +
        s"invariant=${snapBefore == snapAfter}")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
      spark.stop()
    }
  }
}
