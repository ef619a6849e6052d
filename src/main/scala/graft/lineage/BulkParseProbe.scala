package graft.lineage

import org.apache.spark.sql.SparkSession

/** Measurement harness for [[LineageParser.parseBulk]]: how fast does
  * the driver chew a warehouse-log-sized statement backlog, and what
  * does thread parallelism buy when the bottleneck is the session's
  * analyzer rather than any data read? Prints statements/s at
  * parallelism 1 / 4 / 8 / 16 over N corpus-shaped statements
  * (default 2000); results recorded in DESIGN.md §1. */
object BulkParseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val n = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    LineageQueries.registerFixtures(spark, dir)
    // corpus-shaped population: cycle the golden corpus with varied
    // aliases/limits so no two statements are string-identical (any
    // parse cache can't shortcut) — every statement self-contained.
    val base = LineageQueries.corpus.filter(s =>
      s.startsWith("SELECT") || s.startsWith("WITH"))
    val statements = (0 until n).map { i =>
      val s = base(i % base.length)
      s"SELECT * FROM ($s) bulk_$i"
    }
    // warm once (JIT + analyzer caches)
    LineageParser.parseBulk(spark, statements.take(200), 8)
    for (p <- Seq(1, 4, 8, 16)) {
      val t0 = System.nanoTime()
      val rs = LineageParser.parseBulk(spark, statements, p)
      val dt = (System.nanoTime() - t0) / 1e9
      val bad = rs.count(_.isLeft)
      println(f"parallelism=$p%2d  ${n / dt}%8.0f stmts/s  " +
        f"(${dt}%6.2f s for $n, $bad failures)")
    }
    spark.stop()
  }
}
