package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does localCheckpoint preserve hashpartitioning through
  * repartition(col)+dropDuplicates, with and without AQE? Decides the
  * kCorePeel pre-partitioning design (r22). */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def shape(tag: String): Unit = {
      val base = spark.range(100000)
        .select((col("id") % 997).as("u"), (col("id") % 313).as("v"))
      val e = base.repartition(col("u")).dropDuplicates("u", "v")
        .localCheckpoint()
      val agg = e.groupBy("u").agg(count(lit(1)).as("d"))
      println(s"== $tag ==")
      println("checkpoint scan partitioning: " +
        e.queryExecution.executedPlan.outputPartitioning)
      val plan = agg.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      println(s"agg-over-checkpoint exchanges: $nEx")
      println(plan.linesIterator.take(12).mkString("\n"))
    }
    shape("AQE on (default)")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    shape("AQE off")
    spark.stop()
  }
}
