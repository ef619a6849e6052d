package graft.lineage

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the corpus lineage as (a) rows, (b) a DuckDB VALUES
  * oracle, (c) Scala golden literals — used to freeze the goldens in
  * LineageQueries/LineageSpec after a deliberate corpus change. */
object LineageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // `typed` as a second arg dumps the q272 typed-boundary corpus,
    // `ctrl` the q277 control-dependency subset, instead of the SQL
    // corpus
    val df =
      if (args.lift(1).contains("typed")) LineageQueries.typedEdges(spark, dir)
      else if (args.lift(1).contains("ctrl")) LineageQueries.ctrlEdges(spark, dir)
      else LineageQueries.edges(spark, dir)
    val rows = df.collect()
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    println("== VALUES oracle ==")
    println(rows.map(r =>
      s"(${r.getInt(0)}, ${q(r.getString(1))}, ${q(r.getString(2))}, ${q(r.getString(3))}, ${q(r.getString(4))}, ${q(r.getString(5))})")
      .mkString(",\n"))
    println("== Scala goldens ==")
    def sq(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    println(rows.map(r =>
      s"(${r.getInt(0)}, ${sq(r.getString(1))}, ${sq(r.getString(2))}, ${sq(r.getString(3))}, ${sq(r.getString(4))}, ${sq(r.getString(5))})")
      .mkString(",\n"))
    spark.stop()
  }
}
