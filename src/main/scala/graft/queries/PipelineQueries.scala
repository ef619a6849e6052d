package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Bpe, Cdc, Curation, DataQuality, Dedup, Events, FuzzyJoin, Graph, Layout, Multimodal, Pq, RangeJoin, Reconcile, Search, Similarity, Sketch, Stats, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._


/** Oracle-checked query surface for the training-data pipeline
  * extensions (builder brief; SURVEY.md §7.1 #5): deduplication,
  * similarity search, and text analysis over the `documents` and
  * `embeddings` fixture tables.
  *
  * Cross-engine determinism contract (the driver hash-compares against
  * DuckDB): hashing = md5 over explicit strings; float math = integer
  * quantization first; every query ends in ORDER BY on a unique key.
  */
object PipelineQueries {

  /** Which queries consume a session-level trained-artifact cache, and
    * whether that cache is CURRENTLY warm — consumed by Bench's retime
    * triage so "retimed ≪ in-run" on a cache-backed query reads as
    * artifact playback, not as a transient host stall (VERDICT r9
    * item 3). Thunks, not booleans: warmth is evaluated at retime
    * time, after the in-run pass has populated the caches. Keyed by
    * the BENCHED data dir (ADVICE r16): an any-dir nonEmpty check read
    * warm for one dir when only another dir's cache was populated. */
  val artifactBacked: Map[String, String => Boolean] = {
    val bpe = (dir: String) => bpeMergeCache.keys.exists(_._1 == dir)
    val cent = (dir: String) => centroidCache.keys.exists(_._1 == dir)
    val lpa = (dir: String) => lpaArtifact.keys.exists(_._1 == dir)
    val pq = (dir: String) => pqCache.keys.exists(_._1 == dir)
    Map(
      "q51_ann_ivf_trained" -> cent,
      "q122_semantic_dedup" -> cent,
      "q159_cluster_profile" -> cent,
      "q222_cluster_gini" -> cent,
      "q230_nprobe_sweep" -> cent,
      "q250_embedding_drift" -> cent,
      "q254_scan_cost" -> cent,
      "q73_bpe_merges" -> bpe,
      "q74_bpe_tokenize" -> bpe,
      "q123_bpe_fertility" -> bpe,
      "q150_label_prop" -> lpa,
      "q202_modularity" -> lpa,
      "q172_pq_encode" -> pq,
      "q173_pq_adc_topk" -> pq,
      "q245_ivf_pq" -> ((dir: String) => cent(dir) || pq(dir))) ++ {
      val pairs = (dir: String) => pairArtifact.contains(dir)
      val quality = (dir: String) => qualityArtifact.contains(dir)
      // Dual-artifact consumers get `pairs() || quality()` — a
      // warm-pairs/cold-quality state (or vice versa) still means the
      // retime replays SOME trained cache, so the triage flag must not
      // read "fully cold" (ADVICE r12).
      val both = (dir: String) => pairs(dir) || quality(dir)
      Seq("q31_dedup_minhash_lsh", "q53_dedup_components",
        "q69_dedup_components_star", "q110_triangle_count",
        "q146_canonical_pick", "q156_source_dup_matrix",
        "q183_dup_cluster_census", "q216_triplet_mining",
        "q164_curation_funnel")
        .map(_ -> pairs).toMap ++
        Seq("q185_calibrated_gate", "q237_quality_length_grid",
          "q252_resample_bias")
          .map(_ -> quality).toMap ++
        Seq("q213_quality_dup_profile", "q220_token_funnel",
          "q249_calibration_bins")
          .map(_ -> both).toMap
    }
  }


  /** Aggregated from the five domain slices (r16 split) — same keys,
    * same thunks, same public surface as the pre-split object. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineDedupQueries.queries ++ PipelineAnnQueries.queries ++
    PipelineTextQueries.queries ++ PipelineStatsQueries.queries ++
    PipelineCurationQueries.queries

  val oracleSql: Map[String, String] =
    PipelineDedupQueries.oracleSql ++ PipelineAnnQueries.oracleSql ++
    PipelineTextQueries.oracleSql ++ PipelineStatsQueries.oracleSql ++
    PipelineCurationQueries.oracleSql
}
