package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev microbenchmark: scoring-strategy comparison for the IVF
  * assignment hot path (corpus × centroids cross score + argmax).
  * runMain graft.QdotBench [sfDir]
  */
object QdotBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, dir, "embeddings")

    def time(name: String)(f: => Long): Unit = {
      // warm once, measure twice
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${ts.min}%.2fs (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val wA = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("centroid_id"))

    // a) lambda qcosine computed per pair, no materialization
    time("a_lambda_inline") {
      val vecs = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
      val cents = vecs.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("centroid_id"), col("v").as("cv"))
      vecs.join(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"),
          Dedup.qcosine(col("v"), col("cv")).as("ccos"))
        .withColumn("r", row_number().over(wA)).filter(col("r") === 1).count()
    }

    // b) lambda dot + norms materialized behind repartition
    time("b_lambda_norms_repart") {
      val vecs = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
        .repartition(col("vec_id"))
        .withColumn("vn", Dedup.qdot(col("v"), col("v")))
      val cents = vecs.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("vn").as("cn"))
      vecs.join(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"),
          Dedup.qcosineWithNorms(col("v"), col("cv"), col("vn"), col("cn")).as("ccos"))
        .withColumn("r", row_number().over(wA)).filter(col("r") === 1).count()
    }

    // c) unrolled dot + norms materialized behind repartition
    time("c_unrolled_norms_repart") {
      val vecs = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
        .repartition(col("vec_id"))
        .withColumn("vn", Dedup.qdotN(col("v"), col("v"), 64))
      val cents = vecs.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("vn").as("cn"))
      vecs.join(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"),
          (Dedup.qdotN(col("v"), col("cv"), 64).cast("double") /
            sqrt((col("vn") * col("cn")).cast("double"))).as("ccos"))
        .withColumn("r", row_number().over(wA)).filter(col("r") === 1).count()
    }

    // d) unrolled dot, no repartition (tests the collapse hazard)
    time("d_unrolled_collapsed") {
      val vecs = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
        .withColumn("vn", Dedup.qdotN(col("v"), col("v"), 64))
      val cents = vecs.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("vn").as("cn"))
      vecs.join(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"),
          (Dedup.qdotN(col("v"), col("cv"), 64).cast("double") /
            sqrt((col("vn") * col("cn")).cast("double"))).as("ccos"))
        .withColumn("r", row_number().over(wA)).filter(col("r") === 1).count()
    }
    // e) lambda dot + norms in a projection below the join (no shuffle):
    // the join boundary blocks CollapseProject, so quantize+norm run
    // once per row, scoring once per pair.
    time("e_lambda_norms_nojshuffle") {
      val vecs = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
        .withColumn("vn", Dedup.qdot(col("v"), col("v")))
      val cents = vecs.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("vn").as("cn"))
      vecs.join(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"),
          Dedup.qcosineWithNorms(col("v"), col("cv"), col("vn"), col("cn")).as("ccos"))
        .withColumn("r", row_number().over(wA)).filter(col("r") === 1).count()
    }

    // g) native codegen'd QDot expression + max_by argmax
    time("g_native_qdot_maxby") {
      graft.functions.QDot.register(spark)
      val vecs = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
        .withColumn("vn", expr("graft_qdot(v, v)"))
      val cents = vecs.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("vn").as("cn"))
      vecs.join(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"),
          (expr("graft_qdot(v, cv)").cast("double") /
            sqrt((col("vn") * col("cn")).cast("double"))).as("ccos"))
        .groupBy("vec_id")
        .agg(expr("max_by(centroid_id, struct(ccos, -centroid_id))").as("cluster"))
        .count()
    }

    // f) same as e but argmax via max_by aggregation instead of a window
    time("f_lambda_norms_maxby") {
      val vecs = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
        .withColumn("vn", Dedup.qdot(col("v"), col("v")))
      val cents = vecs.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("vn").as("cn"))
      vecs.join(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"),
          Dedup.qcosineWithNorms(col("v"), col("cv"), col("vn"), col("cn")).as("ccos"))
        .groupBy("vec_id")
        .agg(expr("max_by(centroid_id, struct(ccos, -centroid_id))").as("cluster"))
        .count()
    }
    // Pure scoring throughput: sum of dots over the full cross product
    // (5000 × 200 = 1M dot products of dim 64), no argmax.
    graft.functions.QDot.register(spark)
    val vecsM = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("v"))
    val centsM = vecsM.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))
    time("h_dot_lambda_sum") {
      vecsM.join(broadcast(centsM))
        .select(Dedup.qdot(col("v"), col("cv")).as("d"))
        .agg(sum("d")).count()
    }
    time("i_dot_native_sum") {
      vecsM.join(broadcast(centsM))
        .select(expr("graft_qdot(v, cv)").as("d"))
        .agg(sum("d")).count()
    }
    spark.stop()
  }
}
