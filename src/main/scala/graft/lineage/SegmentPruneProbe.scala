package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deployment-scale PRUNING evidence for compacted segments (r20,
  * VERDICT r19 #6): the r19 row-group audit ran at a scale where each
  * segment was one ~100 KB file — a single row group — so pruning
  * granularity was the whole segment and the "sub-linear per-run
  * read" claim rested on argument, not measurement. This probe forces
  * DEPLOYMENT-shaped files (many row groups per segment file, the
  * shape a 128 MB `targetSegmentBytes` produces at real volume) by
  * shrinking `parquet.block.size`, compacts a few thousand one-write
  * runs into ONE segment file, and then measures a per-run read three
  * independent ways:
  *
  *  1. FOOTER MATH — of the segment's row groups, how many can
  *     contain the probed run id by their min/max stats, and how many
  *     bytes they hold vs the file (what a stats-pruning reader must
  *     fetch);
  *  2. ACTUAL I/O — task `inputMetrics.bytesRead` for the one-run
  *     count vs the full count;
  *  3. WALL CLOCK — the same pair, timed.
  *
  * Success = each segment file carries MANY row groups, the per-run
  * footprint is a small fraction of the file on all three measures,
  * and the fraction tracks 1/#rowGroups (the compact sort on
  * (run_id, stmt) is what makes the stats ranges disjoint). Results
  * recorded in DESIGN.md §1.
  *
  * Args: [runs] [edgesPerRun] [rowGroupKB]. */
object SegmentPruneProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(4000)
    val perRun = args.lift(1).map(_.toInt).getOrElse(20)
    val rgKb = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deployment-shaped files at probe volume: shrink the row-group
    // target so one segment file carries the many-row-group layout a
    // 128 MB segment has in production
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.block.size", rgKb * 1024)
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.page.size", 8 * 1024)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_prune_probe").toString
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    try {
      // run 1 through the real append (stamps the version file), the
      // rest bulk-materialized in the identical on-disk shape
      LineageStore.append(spark, dir, 1L,
        spark.range(perRun).select(
          lit(1).as("stmt"), lit("INSERT").as("operation"),
          lit("db.sink_1").as("table_name"),
          concat(lit("db.sink_1.c"), col("id")).as("col_name"),
          concat(lit("c"), col("id")).as("to_name"),
          concat(lit("db.src_1.x"), col("id")).as("from_name"),
          lit("").as("conditions")))
      spark.range(2L, runs + 1L)
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
      val (_, tCompact) = timed {
        LineageStore.compact(spark, dir, runs.toLong) }
      println(f"compacted $runs runs (${runs * perRun} rows) " +
        f"in $tCompact%.1f s, row-group target $rgKb KB")
      // ——— 1. footer math: row groups + stats-matching bytes ————————
      val hconf = spark.sessionState.newHadoopConf()
      val segDir = new org.apache.hadoop.fs.Path(dir, "_compacted")
      val hfs = segDir.getFileSystem(hconf)
      val segFiles = hfs.listStatus(segDir).toSeq
        .filter(_.isDirectory)
        .flatMap(d => hfs.listStatus(d.getPath).toSeq)
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
      val probeRun = runs.toLong / 2
      import scala.jdk.CollectionConverters._
      var groups = 0L
      var matchGroups = 0L
      var totalBytes = 0L
      var matchBytes = 0L
      segFiles.foreach { st =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, hconf))
        try reader.getFooter.getBlocks.asScala.foreach { b =>
          groups += 1
          totalBytes += b.getCompressedSize
          val hit = b.getColumns.asScala
            .find(_.getPath.toDotString == "run_id")
            .exists { c =>
              val s = c.getStatistics
              s == null || s.isEmpty ||
                (s.genericGetMin.asInstanceOf[Number]
                  .longValue() <= probeRun &&
                  s.genericGetMax.asInstanceOf[Number]
                    .longValue() >= probeRun)
            }
          if (hit) { matchGroups += 1; matchBytes += b.getCompressedSize }
        } finally reader.close()
      }
      println(f"segment files=${segFiles.size} rowGroups=$groups " +
        f"matching(run=$probeRun)=$matchGroups  " +
        f"bytes ${matchBytes}%,d of ${totalBytes}%,d " +
        f"(${100.0 * matchBytes / totalBytes}%.1f%% of the store)")
      // ——— 2. executed-plan evidence: rows the scan DECODED. With
      // record-level parquet filtering off (the Spark default) a
      // pushed predicate prunes ROW GROUPS by their stats and the scan
      // emits every row of the surviving groups — so the scan's
      // numOutputRows ÷ total IS the row-group pruning ratio as the
      // executed plan experienced it, not a footer argument. ————————
      def scanEmitted(df: org.apache.spark.sql.DataFrame)
          : (Long, Long) = {
        val qe = df.queryExecution
        val out = qe.executedPlan.executeCollect().length.toLong
        (out, qe.executedPlan.collectLeaves()
          .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum)
      }
      def oneRun() = LineageStore.read(spark, dir)
        .filter(col("run_id") === probeRun).select("from_name")
      def all() = LineageStore.read(spark, dir).select("from_name")
      scanEmitted(oneRun()); scanEmitted(all()) // warm
      val ((rows1, emitted1), tOne) = timed(scanEmitted(oneRun()))
      val ((rowsAll, emittedAll), tFull) = timed(scanEmitted(all()))
      println(f"one-run read: result=$rows1 scanDecoded=$emitted1 " +
        f"of $emittedAll (${100.0 * emitted1 / emittedAll}%.1f%% of " +
        f"the store's rows) ${tOne}%.2f s  |  full scan: " +
        f"result=$rowsAll ${tFull}%.2f s")
      require(groups > 1, "probe must produce >1 row group per file")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
      spark.stop()
    }
  }
}
