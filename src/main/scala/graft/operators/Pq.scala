package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the embedding-compression layer of a
  * billion-vector ANN index (IVF-PQ): split each vector into `m`
  * contiguous subspaces, train an independent k-codeword codebook per
  * subspace (deterministic Lloyd, [[KMeans.lloyd]] on the slices), and
  * store every vector as `m` small code ids instead of d floats —
  * 64 floats become 2 bytes at m=2, k≤256.
  *
  * Scale shape: training collects only m·k·subDim quantized longs to
  * the driver (the same bounded k×d collect [[KMeans]] already makes);
  * ENCODING is a pure narrow projection — the codebooks re-enter the
  * plan as literals, each row computes its m argmins over k candidate
  * structs inside whole-stage codegen, and NOTHING shuffles or joins.
  * At 100 TB the encode pass runs at parquet scan throughput, which is
  * the property that makes PQ viable as a storage codec.
  *
  * Determinism: quantized integer arithmetic throughout (squared-L2
  * in long), argmin ties break to the lowest code id via lexicographic
  * struct ordering on (d2, code) — the exact [[KMeans]] assignment
  * convention, mirrored by the oracle's (d2, cluster) row_number. */
object Pq {

  /** Train per-subspace codebooks: subspace `s` covers vector elements
    * [s·subDim, (s+1)·subDim). Returns, per subspace, the (code,
    * centroid) list in code order — centroids in quantized space,
    * driver-sized (m·k·subDim longs). */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, subDim: Int, k: Int,
                     iters: Int): Seq[Seq[(Long, Seq[Long])]] = {
    require(m >= 1 && subDim >= 1 && k >= 1 && iters >= 1,
      s"m/subDim/k/iters must be positive, got $m/$subDim/$k/$iters")
    (0 until m).map { s =>
      val sub = corpus.select(col(idCol).as("vec_id"),
        slice(col(vecCol), s * subDim + 1, subDim).as("_sub"))
      KMeans.lloyd(sub, "vec_id", "_sub", k, iters).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
        .sortBy(_._1).toSeq
    }
  }

  /** Encode every vector against trained codebooks: for each subspace
    * the nearest codeword id plus the exact quantized squared error.
    * Output: (idCol, code_0, err2_0, ..., code_{m-1}, err2_{m-1}). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             codebooks: Seq[Seq[(Long, Seq[Long])]],
             subDim: Int): DataFrame = {
    val outCols: Seq[Column] = codebooks.zipWithIndex.flatMap {
      case (cb, si) =>
        val sub = Dedup.quantize(
          slice(col(vecCol), si * subDim + 1, subDim))
        val cands = array(cb.map { case (code, cv) =>
          struct(
            aggregate(
              zip_with(sub, typedLit(cv), (x, y) => (x - y) * (x - y)),
              lit(0L), (acc, x) => acc + x).as("d2"),
            lit(code).as("code"))
        }: _*)
        // array_min's lexicographic struct order IS the (d2, code)
        // argmin-with-lowest-id-tie-break.
        val best = array_min(cands)
        Seq(best.getField("code").as(s"code_$si"),
          best.getField("d2").as(s"err2_$si"))
    }
    corpus.select(col(idCol) +: outCols: _*)
  }

  /** ADC (asymmetric distance computation) top-`k`: the IVF-PQ scan
    * loop — each query precomputes its m×k distance TABLE against the
    * codebooks (driver-side, |Q|·m·k longs — bounded like training's
    * collect), and every encoded vector is scored by m table LOOKUPS
    * (`element_at` by code), never by touching the original floats.
    * Approximate by construction: the score is the distance to the
    * vector's quantized reconstruction, so ranking error is bounded by
    * the codebook quantization error (`err2` from [[encode]]).
    *
    * Scale shape: the corpus side is the [[encode]] projection plus a
    * broadcast of |Q| table rows — scoring shuffles NOTHING and scans
    * codes (m longs/row), not vectors (d floats/row); only the scored
    * (query_id, vec_id, d2) stream enters the per-query top-k window.
    * At 100 TB this is the only ANN shape whose scan cost is
    * independent of d. Self-matches excluded; ties break on vec_id.
    * Output: (query_id, rank, vec_id, d2_adc) — integer d2, ascending. */
  def adcTopK(corpus: DataFrame, idCol: String, vecCol: String,
              codebooks: Seq[Seq[(Long, Seq[Long])]], subDim: Int,
              queryIds: Seq[Long], k: Int): DataFrame = {
    val m = codebooks.size
    val qdf = queryTables(corpus, idCol, vecCol, codebooks, subDim,
      queryIds)
    val enc = encode(corpus, idCol, vecCol, codebooks, subDim)
      .select(col(idCol).as("vec_id") +:
        (0 until m).map(s => col(s"code_$s")): _*)
    val score = (0 until m).map { s =>
      element_at(element_at(col("_qt"), s + 1),
        col(s"code_$s").cast("int") + 1)
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2_adc"), col("vec_id"))
    enc.join(broadcast(qdf), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), score.as("d2_adc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "d2_adc")
  }

  /** Per-query ADC distance TABLES as a broadcastable frame
    * (query_id, _qt: array[m][k] of long) — the driver-side
    * |Q|·m·k-longs precompute [[adcTopK]] and
    * [[Similarity.ivfPqTopK]] share. Table entry [s][c] is EXACTLY
    * d2(query's subspace-s quantized slice, codebook s's codeword c)
    * (cb is in code order, so table index == code id). */
  def queryTables(corpus: DataFrame, idCol: String, vecCol: String,
                  codebooks: Seq[Seq[(Long, Seq[Long])]], subDim: Int,
                  queryIds: Seq[Long]): DataFrame = {
    val spark = corpus.sparkSession
    val qRows = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long"), Dedup.quantize(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
    val qTables = qRows.sortBy(_._1).map { case (qid, qv) =>
      org.apache.spark.sql.Row(qid, codebooks.zipWithIndex.map {
        case (cb, s) =>
          val slice = qv.slice(s * subDim, (s + 1) * subDim)
          cb.map { case (_, cv) =>
            slice.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum }
      })
    }
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_qt",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(qTables.toIndexedSeq, 1), qSchema)
  }
}
