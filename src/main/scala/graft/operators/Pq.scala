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
}
