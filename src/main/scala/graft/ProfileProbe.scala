package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for profileNumeric's multi-countDistinct shape
  * (round 7): one Expand-based aggregate (×|cols|+1 row replication)
  * vs per-column two-phase distinct aggregates assembled by crossJoin.
  * Feeds DESIGN.md; not part of the shipped query surface. */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Checkpoints.sweep(spark)
      r
    }
    val li = Tables.load(spark, sfDir, "lineitem")
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax")
    for (round <- 1 to 2) {
      // the OLD single-aggregate shape, inlined: profileNumeric itself
      // was rewired to the per-column form, so the Expand baseline must
      // be rebuilt here for the comparison to stay reproducible. The
      // stack unpivot is NOT decoration — it references every agg
      // column; without it `.count()` lets Catalyst prune the unused
      // aggregate expressions and the branch measures an empty agg
      // (observed: 0.29 s of nothing).
      time(s"expand-agg r$round") {
        val aggs = cols.flatMap { c =>
          Seq(count(col(c)).as(s"__${c}_n"),
            countDistinct(col(c)).as(s"__${c}_d"),
            min(col(c)).cast("double").as(s"__${c}_min"),
            max(col(c)).cast("double").as(s"__${c}_max"),
            sum(col(c).cast("decimal(18,3)")).cast("double")
              .as(s"__${c}_sum"))
        }
        val one = li.agg(count(lit(1)).as("__total"), aggs: _*)
        val stackArgs = cols.map { c =>
          s"'$c', __total, __total - __${c}_n, __${c}_d, " +
            s"__${c}_min, __${c}_max, __${c}_sum"
        }.mkString(", ")
        one.select(expr(
          s"stack(${cols.size}, $stackArgs) AS " +
            "(col_name, n_rows, n_nulls, n_distinct, min_v, max_v, sum_v)"))
          .count()
      }
      // the NEW shape is what profileNumeric ships
      time(s"per-col distinct r$round") {
        operators.Stats.profileNumeric(li, cols).count()
      }
    }
    spark.stop()
  }
}
