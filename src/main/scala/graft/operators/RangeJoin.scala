package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — attach to every left row the right rows of
  * the same key whose time falls in [t − before, t + after] (engine
  * extension; complements [[AsOfJoin]]'s "most recent single match").
  *
  * NOT expressed as the naive non-equi join `l.key = r.key AND r.t
  * BETWEEN ...`: without an equality on the time axis Spark can only
  * plan BroadcastNestedLoopJoin (or a cartesian per key) — O(|l|·|r|)
  * comparisons per key, the classic 100 TB detonation. Instead the time
  * axis is bucketed with width = before + after: each RIGHT row lands
  * in exactly one bucket, each LEFT row's window covers at most two
  * consecutive buckets, so exploding the left to its covering buckets
  * and equi-joining on (key, bucket) bounds the pair space by bucket
  * occupancy — a plain shuffled hash join that AQE can skew-split —
  * and the exact BETWEEN filter runs on the co-located candidates.
  * No duplicate pairs by construction (right rows are single-bucket).
  */
object RangeJoin {

  /** Left rows keep all their columns; matching right rows arrive as
    * `matchSelect` aggregates. `before`/`after` are in the same units
    * as the time columns (use epoch-micros longs); at least one must be
    * positive. Returns one row per left row (LEFT semantics: zero
    * matches still emit the left row). */
  def intervalJoinAgg(left: DataFrame, right: DataFrame, keyCol: String,
                      lTime: String, rTime: String,
                      before: Long, after: Long,
                      matchAggs: Seq[Column]): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      s"need a non-empty window, got before=$before after=$after")
    val w = before + after
    // exact integral floor-division for non-negative epoch values:
    // (x - x mod w) / w — every term stays an exact integer
    def bucketOf(x: Column): Column =
      ((x - pmod(x, lit(w))) / w).cast("long")
    val lb = left.withColumn("_bucket",
      explode(sequence(bucketOf(col(lTime) - before),
        bucketOf(col(lTime) + after))))
    val rb = right.select(col(keyCol).as("_rk"), col(rTime).as("_rt"))
      .withColumn("_bucket", bucketOf(col("_rt")))
    val leftCols = left.columns.toSeq
    lb.join(rb,
        lb(keyCol) === rb("_rk") && lb("_bucket") === rb("_bucket") &&
          rb("_rt") >= col(lTime) - before && rb("_rt") <= col(lTime) + after,
        "left")
      .groupBy(leftCols.map(lb(_)): _*)
      .agg(matchAggs.head, matchAggs.tail: _*)
  }
}
