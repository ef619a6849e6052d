package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over quantized embedding vectors — the
  * trained-centroid companion to [[Similarity.ivfTopK]] (which accepts
  * any centroid set; fixed-id picks are the zero-cost default, these
  * are the quality path).
  *
  * Spark shape per iteration (the classic scalable k-means loop):
  *  1. broadcast current centroids, assign each vector by max_by over
  *     negated squared distance — narrow scan + partial-combine
  *     aggregate, no corpus shuffle;
  *  2. recompute means by posexploding assigned vectors and averaging
  *     per (cluster, dimension) — one shuffle of (cluster, pos, value)
  *     triples with map-side partial sums.
  *
  * Determinism: init = the k smallest vec_ids; quantized integer
  * arithmetic throughout; means floor to longs (sums stay below 2^53 so
  * the double division is exact); ties in assignment break to the
  * lowest cluster id. Same input → bit-identical centroids.
  */
object KMeans {

  import Dedup.{qdot, quantize}

  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  /** Run `iters` Lloyd iterations; returns (cluster, centroid) with
    * `centroid: array<bigint>` in quantized space. */
  def lloyd(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // No ScanScale here (measured r22, paired COLD targeted runs:
    // q122 8.2 -> 9.4 s, q172 3.9 -> 5.0 s, reverted): every lloyd
    // reference re-executes `vecs`, so the inserted repartition pays
    // one extra exchange per init/iteration/consumer and the 8-way
    // broadcast-assignment fan-out already parallelizes the scoring.
    val vecs = corpus
      .select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("v"))

    // deterministic init: the k smallest ids
    var centroids: Seq[(Long, Seq[Long])] = vecs.orderBy("vec_id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Long](1)) }.toSeq

    val dim = centroids.headOption.map(_._2.size).getOrElse(0)

    (1 to iters).foreach { _ =>
      // Per-centroid squared norm rides the broadcast (k rows), so the
      // per-(vector, cluster) score needs ONE native qdot instead of
      // the interpreted zip_with/aggregate lambda (higher-order
      // functions are CodegenFallback — r21, guide §1.2 "per-task
      // work"): argmin d² == argmin (|c|² − 2⟨v,c⟩) because |v|² is a
      // constant shift WITHIN each vec_id group, and the max_by tie
      // struct compares only within the group, so winner and
      // tie-breaks are unchanged.
      val centDf = centroids.toDF("cluster", "cv")
        .withColumn("ncv", qdot(col("cv"), col("cv")))

      // the vector rides THROUGH the assignment aggregate (first(v) is
      // deterministic — every replicated row of a vec_id carries the
      // identical v), so no join-back / corpus re-scan per iteration
      val assigned = vecs.join(broadcast(centDf))
        .select(col("vec_id"), col("v"), col("cluster"),
          (col("ncv") - lit(2L) * qdot(col("v"), col("cv"))).as("d2"))
        .groupBy("vec_id")
        .agg(expr("max_by(cluster, struct(-d2, -cluster))").as("cluster"),
          first(col("v")).as("v"))

      // new centroid = per-dimension floor(mean) over exact long sums.
      // One combinable aggregate with `dim` sum slots per cluster (r21)
      // instead of posexploding the corpus 64-wide and shuffling
      // (cluster, pos, x) triples — same floor(sum/count) expression
      // per dimension, so the means are bit-identical.
      val sums = (0 until dim).map(i =>
        sum(element_at(col("v"), i + 1)).as(s"_s$i"))
      val means = assigned
        .groupBy("cluster")
        .agg(count(lit(1)).as("_n"), sums: _*)
        .select(col("cluster"),
          array((0 until dim).map(i =>
            floor(col(s"_s$i") / col("_n"))): _*).as("cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
      // clusters that lost every vector keep their previous centroid
      val updated = means.toMap
      centroids = centroids.map { case (c, v) => (c, updated.getOrElse(c, v)) }
    }

    centroids.sortBy(_._1).toDF("cluster", "centroid")
  }

  /** Within-cluster sum of squared distances for a centroid set —
    * the objective Lloyd minimizes; used to test convergence. */
  def wcss(corpus: DataFrame, idCol: String, vecCol: String,
           centroids: DataFrame): Double = {
    val vecs = corpus.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("v"))
    vecs.join(broadcast(centroids))
      .select(col("vec_id"), sqDist(col("v"), col("centroid")).as("d2"))
      .groupBy("vec_id").agg(min("d2").as("d2"))
      .agg(sum("d2")).head.getLong(0).toDouble
  }
}
