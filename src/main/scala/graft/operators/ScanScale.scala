package graft.operators

import org.apache.spark.sql.DataFrame

/** Decouple a SCAN-SHAPED frame's parallelism from its file-split
  * granularity (guide §2.5 — "one huge unsplittable file ...
  * repartition immediately after the read").
  *
  * A parquet file under ~4 MB plans as ONE scan task (the open-cost
  * floor), so any CPU-heavy map stage above it — per-gram hashing,
  * per-vector dot products, explode+digest pipelines — serializes on
  * a single core at any `local[n]` or cluster size. When the plan's
  * partition count sits at less than half the session's shuffle
  * parallelism, round-robin repartition up to it; otherwise return
  * the frame untouched. The condition keeps callers scale-safe: a
  * real corpus scans as thousands of splits, the condition never
  * fires, and no extra pass is paid. Call it on the NARROW doc/row
  * projection BEFORE any explode — repartitioning exploded rows pays
  * sort-before-repartition over the multiplied row count on the one
  * input task (measured slower than not repartitioning at all, r22).
  */
object ScanScale {

  /** `df` repartitioned up to the session shuffle parallelism when it
    * is scan-shaped and file-split-bound; `df` unchanged otherwise.
    * Results are unaffected — callers must be partition-order
    * independent (aggregates, joins, per-row projections), which
    * every operator here is; output ROW ORDER may change, as with
    * any repartition.
    *
    * Applies only to scan-shaped frames (no join/aggregate/window/
    * sort/repartition in the optimized plan): on those the
    * partition-count probe is a side-effect-free file-split count,
    * while on an exchange-bearing frame forcing the RDD under AQE
    * would eagerly execute upstream stages — and such frames already
    * carry shuffle-sized parallelism anyway. */
  def parallelized(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val shuffly = df.queryExecution.optimizedPlan.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Window | _: Sort |
                _: RepartitionOperation | _: GlobalLimit) => p
    }.isDefined
    if (shuffly) df
    else {
      val target = df.sparkSession.sessionState.conf.numShufflePartitions
      if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target)
      else df
    }
  }
}
