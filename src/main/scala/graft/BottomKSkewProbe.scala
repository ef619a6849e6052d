package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the r15 BottomK measurement (q263's uniform fixture: window
  * 6.8 s vs BottomK 9.8 s) came with an UNMEASURED claim — "under
  * real hot-band skew the ≤ cap-per-partition shuffle bound wins".
  * This measures exactly that: `bucketIndexFrame`'s two shapes on a
  * synthetic banded frame with one boilerplate band holding `hotFrac`
  * of all rows, cap far below the hot band's size.
  *
  *  - WINDOW shape (`row_number` per band → filtered collect_list):
  *    the hot band's ENTIRE input co-locates on one partition for the
  *    sort — the spillable-sort skew cost the r15 note accepted.
  *  - BOTTOM-K shape (`graft_bottom_k`, Spark's CollectTopK reversed):
  *    every partial buffer caps at `cap`, so map-side combine ships at
  *    most cap rows per partition per band — the shuffle never sees
  *    the hot band's full weight.
  *
  * Outputs are equivalent (ids = k smallest doc_ids per band,
  * overflow = remainder). Results → DESIGN.md §5. */
object BottomKSkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(3000000L)
    val cap = args.lift(1).map(_.toInt).getOrElse(1024)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.BottomK.register(spark)

    // one hot band takes every 3rd row (~33%); the rest spread over
    // 997 cold bands. sig is a real 24-long array so shuffle weight
    // is honest (~200 B/row).
    val banded = spark.range(rows).select(
      when(col("id") % 3 === 0, lit("hot"))
        .otherwise(concat(lit("b"), col("id") % 997)).as("band"),
      col("id").as("doc_id"),
      expr("transform(sequence(0, 23), j -> id * 24 + j)").as("sig"))
      .localCheckpoint() // time the aggregation, not the generator

    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(s"$label\t${(System.nanoTime() - t0) / 1000000} ms")
    }

    val byBand = org.apache.spark.sql.expressions.Window
      .partitionBy("band").orderBy("doc_id")
    def windowShape = banded
      .withColumn("rk", row_number().over(byBand))
      .groupBy("band")
      .agg(array_sort(collect_list(
        when(col("rk") <= cap, struct(col("doc_id"), col("sig")))))
        .as("r"),
        count(when(col("rk") > cap, 1)).as("overflow"))
      .select(col("band"), expr("transform(r, x -> x.doc_id)").as("ids"),
        expr("transform(r, x -> x.sig)").as("sigs"), col("overflow"))

    def bottomKShape = banded
      .groupBy("band")
      .agg(array_sort(call_function(graft.functions.BottomK.name,
          struct(col("doc_id"), col("sig")), lit(cap))).as("r"),
        count(lit(1)).as("n"))
      .select(col("band"), expr("transform(r, x -> x.doc_id)").as("ids"),
        expr("transform(r, x -> x.sig)").as("sigs"),
        greatest(col("n") - cap, lit(0L)).as("overflow"))

    println(s"rows=$rows cap=$cap hot=${rows / 3}")
    // alternate to keep warm-up fair; 2 passes each
    Seq(1, 2).foreach { pass =>
      time(s"window\tpass$pass")(windowShape)
      time(s"bottomk\tpass$pass")(bottomKShape)
    }
    // equivalence check on ids + overflow
    val w = windowShape.select("band", "ids", "overflow")
    val b = bottomKShape.select("band", "ids", "overflow")
    val diff = w.exceptAll(b).count() + b.exceptAll(w).count()
    println(s"equivalent\t${diff == 0}")
    spark.stop()
  }
}
