package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the lineage-store fixtures (r22): times the
  * LineageStore primitives the q285/q288/q290/q297 fixtures are built
  * from, so optimization targets the step that actually costs, not the
  * fixture wrapper. */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.lineage.{LineageStore, LineageEdge}
    // warmup
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.range(100000).select(col("id"),
        md5(col("id").cast("string")).as("h"))
      w.groupBy(substring(col("h"), 1, 2)).count().count()
    }
    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[storeprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val store = java.nio.file.Files
        .createTempDirectory("graft_storeprobe").toString
      time("9 appendCaptured") {
        (1 to 9).foreach { i =>
          time(s"  append $i") {
            LineageStore.appendCaptured(spark, store, i.toLong,
              spark.createDataFrame(Seq(LineageEdge(i, "INSERT",
                s"db.sink_$i", s"db.sink_$i.c", "c", s"db.src.x$i", ""))))
          }
        }
      }
      time("snapshot+collect") {
        LineageStore.snapshot(spark, store)
          .orderBy("run_id", "stmt").collect()
      }
      time("compact(3)") {
        LineageStore.compact(spark, store, 3L, maxSegments = 2) }
      time("compact(6)") {
        LineageStore.compact(spark, store, 6L, maxSegments = 2) }
      time("compact(9)") {
        LineageStore.compact(spark, store, 9L, maxSegments = 2) }
      time("snapshot+collect post") {
        LineageStore.snapshot(spark, store)
          .orderBy("run_id", "stmt").collect()
      }
      time("claimRun") { LineageStore.claimRun(spark, store) }
      graft.Cleanup.deleteRecursively(java.nio.file.Paths.get(store))
    }
    spark.stop()
  }
}
