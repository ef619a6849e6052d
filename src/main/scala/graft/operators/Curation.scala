package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition the
  * individual operators exist for: exact dedup → near-dup removal →
  * quality filter → per-document stats. One call takes a raw document
  * table to a training-ready corpus.
  *
  * Stage order matters at scale: exact dedup first (cheapest, biggest
  * mass reduction on crawl data), then LSH near-dup (pair space already
  * reduced), then narrow per-row scoring on the survivors only.
  */
object Curation {

  /** Curate `docs`: returns surviving documents with their stats.
    *
    * - exact duplicates collapse to the smallest doc_id
    *   ([[Dedup.exact]]);
    * - of every verified near-duplicate pair, the larger id is dropped
    *   ([[Dedup.minHashLsh]] with the given LSH shape);
    * - documents below `minQuality` ([[TextAnalysis.qualityScore]]) are
    *   dropped.
    *
    * Output: (doc_id, n_tokens, quality), one row per surviving doc.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             k: Int, bands: Int, rows: Int, nearDupThreshold: Double,
             minQuality: Double): DataFrame = {
    // exact dedup: survivors are the kept ids
    val kept = Dedup.exact(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exactSurvivors = docs.join(kept, idCol)

    // near-dup removal: drop the b-side of every verified pair
    val nearDupLosers = Dedup.minHashLsh(exactSurvivors, idCol, textCol,
      shingleN = 2, k = k, bands = bands, rows = rows,
      threshold = nearDupThreshold)
      .select(col("doc_b").as(idCol)).distinct()
    val deduped = exactSurvivors.join(nearDupLosers, Seq(idCol), "left_anti")

    // quality gate + stats on the survivors, in one projection (separate
    // quality/stats joins would re-execute the deduped subtree twice)
    TextAnalysis.qualityWithTokenCount(deduped, idCol, textCol)
      .filter(col("quality") >= minQuality)
      .select(col(idCol), col("n_tokens"), col("quality"))
  }
}
