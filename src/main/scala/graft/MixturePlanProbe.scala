package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Curation

/** One-off: does mixtureResample's quota rank plan WindowGroupLimit
  * (needs a literal limit) or a full window sort (column quota)? */
object MixturePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val out = Curation.mixtureResample(df, "source", "doc_id",
      (0 until 5).map(i => (s"src$i", 150L)) ++
        (5 until 10).map(i => (s"src$i", 50L)))
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    println("HAS_WGL=" + p.contains("WindowGroupLimit"))
    println("HAS_WINDOW=" + p.contains("Window"))
    spark.stop()
  }
}
