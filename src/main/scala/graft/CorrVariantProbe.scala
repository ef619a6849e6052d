package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r21): where does q169's time go, and is the
  * 15-double-to-decimal-casts aggregate the cost? Variants over the
  * same lineitem moment pass:
  *   A — shipped corrMatrix shape: sum(cast(x*y as decimal(38,4))),
  *       15 double->decimal casts per row;
  *   B — cast each column once (4 casts), multiply in decimal:
  *       sum(d4(x)*d4(y)) — exact for 2-decimal money inputs, so the
  *       sums are the same rationals and the final double cast is
  *       bit-identical;
  *   C — plain double sums (NOT shippable: partition-order-dependent
  *       rounding breaks the cross-engine contract) — the lower bound
  *       that prices the decimal discipline.
  * Also prints an exact A-vs-B value comparison on the full corr
  * output (collect + string compare of all 16 digits).
  */
object CorrVariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val df = Tables.load(spark, sfDir, "lineitem")
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    def d4(c: Column) = c.cast(org.apache.spark.sql.types.DecimalType(38, 4))

    def aggsA: Seq[Column] =
      Seq(count(lit(1)).as("_n")) ++
        cols.flatMap(c => Seq(sum(d4(col(c))).as(s"_s_$c"),
          sum(d4(col(c) * col(c))).as(s"_q_$c"))) ++
        pairs.map { case (x, y) => sum(d4(col(x) * col(y))).as(s"_p_${x}_$y") }
    def aggsB: Seq[Column] =
      Seq(count(lit(1)).as("_n")) ++
        cols.flatMap(c => Seq(sum(d4(col(c))).as(s"_s_$c"),
          sum(d4(col(c)) * d4(col(c))).as(s"_q_$c"))) ++
        pairs.map { case (x, y) =>
          sum(d4(col(x)) * d4(col(y))).as(s"_p_${x}_$y") }
    def aggsC: Seq[Column] =
      Seq(count(lit(1)).as("_n")) ++
        cols.flatMap(c => Seq(sum(col(c)).as(s"_s_$c"),
          sum(col(c) * col(c)).as(s"_q_$c"))) ++
        pairs.map { case (x, y) => sum(col(x) * col(y)).as(s"_p_${x}_$y") }

    def time(tag: String, aggs: => Seq[Column]): Unit = {
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        complete.agg(aggs.head, aggs.tail: _*)
          .write.format("noop").mode("overwrite").save()
        println(f"[corr] $tag rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("A-shipped-15casts", aggsA)
    time("B-4casts-decmul", aggsB)
    time("C-double-lowerbound", aggsC)

    // exact value identity A vs B, via the full corr formula
    def corrOut(aggs: Seq[Column]) = {
      val one = complete.agg(aggs.head, aggs.tail: _*)
      val nD = col("_n").cast("double")
      def corrOf(x: String, y: String): Column =
        (nD * col(s"_p_${x}_$y").cast("double") -
          col(s"_s_$x").cast("double") * col(s"_s_$y").cast("double")) /
          (sqrt(nD * col(s"_q_$x").cast("double") -
            col(s"_s_$x").cast("double") * col(s"_s_$x").cast("double")) *
           sqrt(nD * col(s"_q_$y").cast("double") -
             col(s"_s_$y").cast("double") * col(s"_s_$y").cast("double")))
      one.select(pairs.map { case (x, y) =>
        corrOf(x, y).as(s"${x}_$y") }: _*).collect().head
    }
    val a = corrOut(aggsA)
    val b = corrOut(aggsB)
    val same = (0 until a.length).forall { i =>
      java.lang.Double.doubleToRawLongBits(a.getDouble(i)) ==
        java.lang.Double.doubleToRawLongBits(b.getDouble(i))
    }
    println(s"[corr] A==B bitwise: $same  A=$a  B=$b")
    spark.stop()
  }
}
