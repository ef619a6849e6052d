package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (pipeline extension; builder brief).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: the exact baseline — broadcast the (small)
  *    query set against a full corpus scan. One pass over the data, no
  *    corpus shuffle; cost is O(|Q| · n · d) compute, which is the right
  *    trade at any scale when |Q| is small.
  *  - [[ivfTopK]]: the scale path — IVF (inverted-file) partitioning.
  *    Centroids are broadcast, every vector is assigned to its nearest
  *    centroid once (narrow, no shuffle), queries probe only the
  *    `nprobe` nearest clusters. At 100 TB the assignment becomes a
  *    bucketed/partitioned-by-cluster layout so probes touch only
  *    matching partitions (partition pruning on `cluster`).
  *
  * All scoring uses [[Dedup.quantize]]d integer cosine for cross-engine
  * determinism; ties break on vec_id.
  */
object Similarity {

  import Dedup.{quantize, qcosine}

  /** Exact top-k neighbors for each query id (self-match excluded).
    * Returns (query_id, rank, vec_id, cosine). */
  def bruteForceTopK(corpus: DataFrame, queryIds: Seq[Long], idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = corpus.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
      .filter(col("query_id").isin(queryIds: _*))
    val c = corpus.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        qcosine(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** IVF approximate top-k: vectors indexed by nearest of the given
    * centroid ids; each query probes its `nprobe` closest clusters and
    * ranks only vectors inside them. Returns (query_id, rank, vec_id,
    * cosine) — approximate: neighbors outside probed clusters are missed
    * by design. */
  def ivfTopK(corpus: DataFrame, centroidFilter: Column, queryIds: Seq[Long],
              idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val vecs = corpus.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("v"))
    val cents = vecs.filter(centroidFilter)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))

    // Assignment: argmax cosine over broadcast centroids — narrow per-row
    // work, no corpus shuffle. Ties break on centroid_id.
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("centroid_id"))
    val assigned = vecs.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("centroid_id"),
        qcosine(col("v"), col("cv")).as("ccos"))
      .withColumn("r", row_number().over(wAssign))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("v"), col("centroid_id").as("cluster"))

    // Probe set: each query's nprobe nearest centroids.
    val q = vecs.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("centroid_id"))
    val probes = q.join(broadcast(cents))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        qcosine(col("qv"), col("cv")).as("pcos"))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("cluster"))

    // Search only probed clusters (at scale: partition pruning on
    // `cluster`); rank within each query.
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        qcosine(col("qv"), col("v")).as("cosine"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }
}
