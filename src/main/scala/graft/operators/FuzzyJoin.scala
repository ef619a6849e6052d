package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 string join via DELETION-NEIGHBORHOOD blocking (the
  * FastSS / SymSpell family): for a string s, let D(s) be s plus every
  * single-character deletion of s. Two strings within Levenshtein
  * distance 1 (one insert, delete, or substitute) ALWAYS share a
  * member of D(·) — equal strings share s itself; a deletion t of s
  * has t ∈ D(s) ∩ D(t); a substitution at position i shares the
  * variant with position i removed. So an equi-join on deletion
  * variants is a complete candidate generator, and an exact
  * `levenshtein ≤ 1` filter over the candidates makes it precise.
  *
  * Why this shape at 100 TB: the naive fuzzy join is an all-pairs
  * cross product with a per-pair edit-distance — O(n·m) work and an
  * unshardable nested loop. Deletion blocking explodes each side to
  * O(len+1) variant keys, hash-joins on the variant (co-located
  * shuffle, AQE skew-splittable), and pays the exact verify only on
  * candidates — the LSH-candidates-then-verify pattern (Dedup) applied
  * to edit distance.
  *
  * `levenshtein` is a built-in in both Spark and DuckDB with the
  * classic unit-cost definition, so the verify is an exact integer
  * cross-engine (q89's oracle recomputes the whole pipeline).
  */
object FuzzyJoin {

  /** `s` plus each single-character deletion of `s`, deduplicated. */
  private def variantsExpr(c: String): String =
    s"""array_union(array($c),
        transform(sequence(1, length($c)),
          i -> concat(substring($c, 1, i-1),
                      substring($c, i+1, length($c)))))"""

  /** All (left, right) row pairs with `levenshtein(leftCol, rightCol)
    * <= 1`. Inputs should be deduplicated on their string column; the
    * output is distinct. Column names must not collide across sides. */
  def editDistance1Join(left: DataFrame, leftCol: String,
                        right: DataFrame, rightCol: String): DataFrame = {
    val lv = left.withColumn("_variant", explode(expr(variantsExpr(leftCol))))
    val rv = right.withColumn("_variant", explode(expr(variantsExpr(rightCol))))
    lv.join(rv, "_variant").drop("_variant")
      .filter(expr(s"levenshtein($leftCol, $rightCol) <= 1"))
      .distinct()
  }

  /** DOCUMENT-scale edit-distance mining: the `topN` CLOSEST document
    * pairs by full-text Levenshtein, under TOKEN-PREFIX BLOCKING — the
    * other edit-distance regime from [[editDistance1Join]] (that one is
    * short strings / distance ≤ 1 / complete; this one is long texts /
    * unbounded distance / blocked). Near-identical web documents (same
    * template, small diffs) share their opening tokens, so blocking on
    * the first `blockTokens` tokens is both the recall heuristic AND
    * the cost bound: pairs are generated only WITHIN a block, so total
    * Levenshtein work is Σ_b C(|b|, 2) — never corpus² — and each
    * comparison is O(len²) DP. The two knobs to state at 100 TB:
    * `blockTokens` must be large enough that the biggest block stays
    * bounded (skewed prefixes → raise it, or pre-hash a wider prefix),
    * and texts should be length-capped upstream (the DP is quadratic in
    * length). Complete WITHIN blocks; pairs split across blocks are
    * missed by design — the LSH-style recall trade, stated.
    *
    * One co-partitioned self-join on the block key (AQE-splittable),
    * then TakeOrderedAndProject for the global closest-N.
    *
    * `lenCap` makes the length bound a REAL parameter, not advice: the
    * distance is computed on the first `lenCap` characters of each
    * text (prefix edit distance, stated), capping each DP at lenCap².
    * Measured at sf0.1 (14k blocked pairs, texts avg 297 / max 577
    * chars): uncapped ≈ 11 s, cap 120 ≈ 2 s — quadratic cost is the
    * one knob a 100 TB run cannot leave uncapped.
    * Returns (id_a, id_b, dist), id_a < id_b, ordered
    * (dist, id_a, id_b). */
  def closestPairsByEditDistance(docs: DataFrame, idCol: String,
                                 textCol: String, blockTokens: Int,
                                 topN: Int,
                                 lenCap: Int = Int.MaxValue): DataFrame = {
    require(blockTokens >= 1, "need at least one blocking token")
    require(lenCap >= 1, "need a positive length cap")
    val key = array_join(
      slice(split(col(textCol), " "), 1, blockTokens), " ")
    val capped = substring(col(textCol), 1, lenCap)
    val a = docs.select(col(idCol).as("id_a"), capped.as("_ta"),
      key.as("_blk"))
    val b = docs.select(col(idCol).as("id_b"), capped.as("_tb"),
      key.as("_blk"))
    a.join(b, "_blk")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("_ta"), col("_tb")).cast("long").as("dist"))
      .orderBy(col("dist"), col("id_a"), col("id_b"))
      .limit(topN)
  }
}
