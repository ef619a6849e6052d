package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for iterative operators and long-running
  * sessions.
  *
  * `Dataset.localCheckpoint()` persists the materialized rows in the
  * block manager and truncates lineage — which is what makes iterative
  * loops ([[graft.operators.Graph]], [[graft.operators.Bpe]]) plan-size
  * stable — but nothing ever frees those blocks. In a long-running
  * session (a service, or the 114-query bench run) superseded
  * checkpoints accumulate until executor storage memory and driver GC
  * pressure degrade every later query: the round-5 bench measured BPE
  * learning at 2.3× its round-4 time with zero code change, purely from
  * ~25 checkpoint call sites' leftovers plus seven live streaming
  * memory-sink tables. The fix is two-sided:
  *
  *  - operators free each checkpoint as soon as the next one supersedes
  *    it ([[free]]), so a single query's peak extra storage is one
  *    generation, not `iters` generations;
  *  - the harness sweeps everything between independent queries
  *    ([[sweep]]), catching the final checkpoint of each result (which
  *    the operator cannot free — the caller's plan still needs it).
  */
object Checkpoints {

  /** Free the block-manager storage behind `localCheckpoint()`ed
    * frames (no-op on frames with no checkpoint in their plan).
    *
    * A local checkpoint's lineage is TRUNCATED — after freeing, the
    * frame can never be recomputed. Only call this on superseded
    * intermediates that nothing will read again. */
  def free(frames: DataFrame*): Unit =
    frames.foreach(_.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    })

  /** Drop every persisted RDD and SQL-cached plan still registered in
    * the session — between-queries hygiene for a service processing
    * independent requests. Callers must have fully consumed any prior
    * results first: freed checkpoints are unrecomputable. */
  def sweep(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }
}
