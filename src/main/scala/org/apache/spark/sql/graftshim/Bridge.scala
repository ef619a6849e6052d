package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Single-purpose accessor for the `private[sql]` `Dataset.ofRows` —
  * the standard pattern for a library that constructs a DataFrame from
  * a hand-built logical plan (custom operators in `graft.plans`).
  * Nothing else from the private surface is touched.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Test-only view of what a `SparkSessionExtensions` instance would
    * register (`buildPlannerStrategies` is `private[sql]`). */
  def plannerStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
                        spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)
}
