package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for TIERED compaction (r19, VERDICT r18 top
  * item): the r18 `compact` rewrote the ENTIRE folded history into one
  * `repartition(1)` segment per call — O(history) per maintenance
  * invocation, quadratic cumulative. The tiered version folds only the
  * NEW runs into a new segment and merges segments only past the
  * count threshold, so per-call cost must track the BATCH size, not
  * the store size.
  *
  * The probe materializes `batches` × `runsPerBatch` one-write runs
  * incrementally (bulk layout — identical on-disk shape to N capture
  * appends, see [[CaptureScaleProbe]]) and times `compact` after each
  * batch. Success = the per-call times stay FLAT while the folded
  * store grows 10×, with occasional merge spikes bounded by the tier
  * being merged (never the full store), and the snapshot row count
  * invariant across every fold. Results in DESIGN.md §1.
  *
  * Args: [batches] [runsPerBatch] [edgesPerRun] [maxSegments]. */
object TieredCompactProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(10)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(1000)
    val perRun = args.lift(2).map(_.toInt).getOrElse(4)
    val maxSegments = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.sources.parallelPartitionDiscovery.parallelism",
        "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tiered_probe").toString
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def segCount(): Int = Option(
      new java.io.File(dir, "_compacted").listFiles())
      .getOrElse(Array.empty).map(_.getName).count(_.startsWith("seg_"))
    try {
      // run 1 through the real append (stamps the version file)
      LineageStore.append(spark, dir, 1L,
        spark.range(perRun).select(
          lit(1).as("stmt"), lit("INSERT").as("operation"),
          lit("db.sink_1").as("table_name"),
          concat(lit("db.sink_1.c"), col("id")).as("col_name"),
          concat(lit("c"), col("id")).as("to_name"),
          concat(lit("db.src_1.x"), col("id")).as("from_name"),
          lit("").as("conditions")))
      def materialize(lo: Long, hi: Long): Unit =
        spark.range(lo, hi + 1)
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
      val times = (1 to batches).map { b =>
        val lo = (b - 1).toLong * perBatch + (if (b == 1) 2 else 1)
        val hi = b.toLong * perBatch
        materialize(lo, hi)
        val (folded, sec) = timed {
          LineageStore.compact(spark, dir, hi, maxSegments) }
        println(f"compact batch $b%2d: folded ${folded.size}%5d runs " +
          f"in $sec%6.2f s  (store=${hi} runs, segments=${segCount()})")
        sec
      }
      val snapRows = LineageStore.snapshot(spark, dir).count()
      val expect = batches.toLong * perBatch * perRun
      println(f"first-batch ${times.head}%.2f s, last-batch " +
        f"${times.last}%.2f s, ratio ${times.last / times.head}%.2f " +
        f"(flat = cost tracks batch, not the ${batches}x-grown store)")
      println(s"snapshot rows=$snapRows expected=$expect " +
        s"invariant=${snapRows == expect}")
      // ——— row-group pruning audit (VERDICT r18 #8): segments are
      // sorted and range-partitioned on (run_id, stmt), so a per-run
      // filter must reach the scan as a pushed predicate and the
      // reader must emit a sliver of the store, not scan it all ———
      val probeRun = batches.toLong * perBatch / 2
      val q = LineageStore.read(spark, dir)
        .filter(col("run_id") === probeRun)
      val qe = q.queryExecution
      val got = qe.executedPlan.executeCollect().length
      val scans = qe.executedPlan.collectLeaves()
      val scanRows = scans
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      val pushed = qe.executedPlan.toString.contains("PushedFilters")
      val (_, tOne) = timed { LineageStore.read(spark, dir)
        .filter(col("run_id") === probeRun).count() }
      val (_, tFull) = timed { LineageStore.read(spark, dir).count() }
      println(f"per-run read on compacted store: rows=$got " +
        f"scanRowsEmitted=$scanRows of $expect total " +
        f"(pushdown=$pushed) one-run $tOne%.2f s vs full $tFull%.2f s")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
      spark.stop()
    }
  }
}
