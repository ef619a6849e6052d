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
}
