package graft
import org.apache.spark.sql.SparkSession
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val rows = SparkEntry.entry(spark).collect()
    println(s"entry rows=${rows.length} time=${(System.nanoTime()-t0)/1e9}")
    rows.take(3).foreach(println)
    // lineage latency: warm statements/sec (full corpus fixtures —
    // sinks, the partitioned table, the view)
    graft.lineage.LineageQueries.registerFixtures(spark, "/root/testdata/sf0.001")
    graft.lineage.LineageQueries.corpus.foreach(s0 =>
      graft.lineage.LineageParser.parseStatement(spark, s0, 1)) // warm
    val t1 = System.nanoTime()
    val n = 5
    (1 to n).foreach(_ => graft.lineage.LineageQueries.corpus.zipWithIndex.foreach {
      case (s0, i) => graft.lineage.LineageParser.parseStatement(spark, s0, i + 1) })
    val perStmt = (System.nanoTime()-t1)/1e6 / (n * graft.lineage.LineageQueries.corpus.size)
    println(f"lineage warm latency: $perStmt%.1f ms/statement")
    spark.stop()
  }
}
