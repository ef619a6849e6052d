package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for READ-LOG reclamation (r19, VERDICT r18
  * #2): [[LineageCapture.attachReadStore]] writes one `batch_<uuid>/`
  * directory per flush, forever, and [[LineageStore.readLog]] lists
  * and opens ALL of them per query — a year of sessions at 64-action
  * flushes is tens of thousands of directories that every `/reads`
  * and `/deprecation` call must list. The probe materializes N flush
  * batches (bulk: one partitioned write + renames — identical on-disk
  * layout to N appendReads at ~1000× the speed), times the `/reads`
  * aggregation against the exploded layout, runs [[LineageStore
  * .compactReads]], and times it again; then applies
  * [[LineageStore.vacuumReads]] retention. Results in DESIGN.md §1.
  *
  * Args: [flushes] [rowsPerFlush]. */
object ReadLogScaleProbe {
  def main(args: Array[String]): Unit = {
    val flushes = args.headOption.map(_.toInt).getOrElse(10000)
    val perFlush = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.sources.parallelPartitionDiscovery.parallelism",
        "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_readlog_probe").toString
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    try {
      // flush 1 through the real appendReads (stamps the version
      // file, proves the layout); the rest bulk-materialized
      import spark.implicits._
      LineageStore.appendReads(spark, dir,
        (0 until perFlush).map(i =>
          ("s1", 1, s"db.t${i % 50}", s"c$i", 1000L))
          .toDF("session", "action", "table_name", "column_read",
            "ts_ms"))
      val now = System.currentTimeMillis()
      t(s"bulk-materialize ${flushes - 1} flush batches") {
        val tmp = s"$dir/_bulk_tmp"
        spark.range(2, flushes + 1)
          .withColumn("k", explode(sequence(lit(0), lit(perFlush - 1))))
          .select(concat(lit("s"), col("id")).as("session"),
            col("id").cast("int").as("action"),
            concat(lit("db.t"), col("k") % 50).as("table_name"),
            concat(lit("c"), col("k")).as("column_read"),
            // older half of the flushes carry ancient timestamps —
            // the retention pass below reclaims them
            when(col("id") <= flushes / 2, lit(1000L))
              .otherwise(lit(now)).as("ts_ms"),
            col("id").as("b"))
          .write.partitionBy("b").parquet(tmp)
        val base = new java.io.File(tmp)
        base.listFiles().filter(_.getName.startsWith("b="))
          .foreach { f =>
            val n = f.getName.stripPrefix("b=")
            f.renameTo(new java.io.File(s"$dir/_read_log/batch_$n"))
          }
        org.apache.commons.io.FileUtils.deleteDirectory(base)
      }
      def readsAgg(): Long = LineageStore.readLog(spark, dir)
        .groupBy("table_name")
        .agg(countDistinct(concat_ws("#", col("session"),
          col("action"))).as("n_actions"),
          max(col("ts_ms")).as("last_read_ms"))
        .count()
      val aggBefore = t(s"/reads aggregation, $flushes batch dirs") {
        readsAgg() }
      val folded = t("compactReads (fold all batches)") {
        LineageStore.compactReads(spark, dir) }
      val aggAfter = t("/reads aggregation, consolidated") {
        readsAgg() }
      val rowsBefore = LineageStore.readLog(spark, dir).count()
      val removed = t("vacuumReads (retention: drop ancient half)") {
        LineageStore.vacuumReads(spark, dir,
          olderThanMs = 3600L * 1000).size }
      val rowsAfter = LineageStore.readLog(spark, dir).count()
      println(s"tables=$aggBefore->$aggAfter folded=$folded " +
        s"rows=$rowsBefore->$rowsAfter retentionUnits=$removed " +
        s"invariant=${aggBefore == aggAfter}")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
      spark.stop()
    }
  }
}
