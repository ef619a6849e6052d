package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental snapshot maintenance (CDC merge) — apply a keyed change
  * batch (insert / update / delete, ordered by a sequence column) to a
  * base snapshot and produce the next snapshot. The MERGE INTO shape of
  * a lakehouse pipeline, as a pure DataFrame transform (engine
  * extension; the reference is read-only lineage).
  *
  * Scale notes (100 TB):
  *  - Collapsing the batch to its latest change per key is one
  *    hash-shuffle of the CHANGES (small side), not the base.
  *  - The merge itself is one full-outer equi-join on the key — the
  *    base's only shuffle. With a bucketed/pre-partitioned base table
  *    both sides co-locate and the exchange is reused run over run; AQE
  *    broadcasts the collapsed batch when it is small enough.
  *  - All per-key decisions are local to the join row: no windows over
  *    the base, no driver-side state.
  */
object Cdc {

  /** Apply `changes` to `base`.
    *
    * `changes` must carry the base's key and payload columns plus
    * `opCol` ('I' | 'U' | 'D') and `seqCol` (orderable; (key, seq)
    * unique — the latest seq wins per key; I and U are both upserts,
    * D deletes the key).
    *
    * Returns the next snapshot with the base's column set. */
  def applyChanges(base: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], seqCol: String,
                   opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val payload = base.columns.filterNot(keyCols.contains).toSeq

    // Latest change per key: one shuffle of the change batch. A window
    // + filter keeps ordering explicit (and (key, seq) uniqueness makes
    // the pick total); payloads may contain arrays, where a max_by
    // struct would fall back to SortAggregate anyway.
    val wLatest = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(wLatest))
      .filter(col("_rn") === 1)
      .drop("_rn", seqCol)

    val joined = base.as("b").join(latest.as("c"),
      keyCols.map(k => col(s"b.$k") === col(s"c.$k")).reduce(_ && _),
      "full_outer")
    val hasChange = col(s"c.$opCol").isNotNull
    joined
      .filter(!hasChange || col(s"c.$opCol") =!= "D")
      .select(
        keyCols.map(k => coalesce(col(s"c.$k"), col(s"b.$k")).as(k)) ++
          payload.map(p =>
            when(hasChange, col(s"c.$p")).otherwise(col(s"b.$p")).as(p)): _*)
  }

  /** SCD TYPE-2 dimension build: turn a keyed, time-ordered change
    * history into validity intervals — each change opens a version at
    * its `validFromCol` value, closed by the key's next change (open /
    * `is_current` for the latest). The point-in-time lookup this
    * produces pairs with [[RangeJoin]] for as-of-correct joins.
    *
    * `orderCols` must be unique per key (pass a tiebreaker alongside
    * the event time). One window partitioned by the dimension key —
    * the history's natural distribution; version counts per key are
    * bounded by that key's own change count, so no global or
    * low-cardinality partition appears. */
  def scd2(history: DataFrame, keyCols: Seq[String],
           orderCols: Seq[String], validFromCol: String): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "need key and order columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    history
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col(validFromCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
