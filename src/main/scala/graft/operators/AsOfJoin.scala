package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** As-of join: attach to every left row the payload of the most recent
  * right row at-or-before its timestamp, per key (engine extension —
  * neither the reference nor batch Spark has one; Structured Streaming
  * and pandas-on-Spark each grow their own).
  *
  * NOT implemented as an inequality join: `l JOIN r ON l.key = r.key
  * AND r.t <= l.t` + argmax materializes O(|l|·|r|) rows per key before
  * pruning — a hot key detonates at scale. Instead the classic
  * union-and-scan shape:
  *
  *  1. tag both inputs and union them (right rows sort BEFORE left rows
  *     at equal timestamps, so "at-or-before" is inclusive);
  *  2. one running `last(payload, ignoreNulls)` window per payload
  *     column over (key) ordered by (time, side, tie);
  *  3. keep the left rows.
  *
  * One shuffle on the key, then a single sequential pass per partition —
  * the same cost as sessionization, independent of match fan-out. Skewed
  * keys are bounded by the window's streaming frame (running frames
  * don't buffer the whole partition).
  */
object AsOfJoin {

  /** `left` and `right` must both carry `keyCol`, `timeCol` (any
    * orderable type; use epoch-micros bigints for cross-engine
    * determinism) and `tieCol` (unique within (key, time) on the right —
    * ties resolve to the HIGHEST tie value, "the latest row wins").
    * Adds `asof_<p>` for every right payload column `p`; left rows with
    * no prior right row get nulls, SQL outer-join style. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           timeCol: String, tieCol: String,
           payloadCols: Seq[String]): DataFrame = {
    val keep = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_l", struct(keep.map(col): _*))
      .select(Seq(col(keyCol), col(timeCol), col(tieCol), col("_side"),
        col("_l")) ++
        payloadCols.map(p =>
          lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right
      .withColumn("_side", lit(0))
      .withColumn("_l", lit(null).cast(l.schema("_l").dataType))
      .select(Seq(col(keyCol), col(timeCol), col(tieCol), col("_side"),
        col("_l")) ++ payloadCols.map(col): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = payloadCols.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"asof_$p", last(col(p), ignoreNulls = true).over(w))
    }
    withAsof
      .filter(col("_side") === 1)
      .select(keep.map(n => col("_l").getField(n).as(n)) ++
        payloadCols.map(p => col(s"asof_$p")): _*)
  }

  /** The same as-of semantics as [[asOf]], executed by the NATIVE
    * whole-operator path: a custom `AsOfJoinPlan` logical node planned
    * by [[graft.plans.AsOfJoinStrategy]] into a merge-join physical
    * operator (`AsOfJoinExec`). One hash exchange per side + an
    * O(n+m) forward merge per partition — no union row inflation, no
    * window-function machinery, and the right side ships only its
    * payload columns. Output column contract matches [[asOf]] exactly
    * (left columns, then `asof_<p>` per payload column, nullable).
    *
    * The planner strategy is registered idempotently on the Dataset's
    * session via `experimental.extraStrategies` (the public runtime
    * registration point; `SparkSessionExtensions
    * .injectPlannerStrategy(_ => AsOfJoinStrategy)` is the
    * builder-time equivalent).
    */
  def asOfNative(left: DataFrame, right: DataFrame, keyCol: String,
                 timeCol: String, tieCol: String,
                 payloadCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    // Validate names up front (the node carries names, not attribute
    // refs — see AsOfJoinPlan's scaladoc on self-join exprId dedup)
    // and require them unambiguous per side.
    def attr(p: LogicalPlan, n: String, side: String) = {
      val hits = p.output.filter(_.name == n)
      require(hits.size == 1,
        s"asOfNative: column `$n` must appear exactly once on the $side " +
          s"side, found ${hits.size} in ${p.output.map(_.name).mkString(", ")}")
      hits.head
    }
    Seq(keyCol, timeCol).foreach(attr(lPlan, _, "left"))
    Seq(keyCol, timeCol, tieCol).foreach(attr(rPlan, _, "right"))
    val asofOut = payloadCols.map { p =>
      val a = attr(rPlan, p, "right")
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)()
    }
    val node = AsOfJoinPlan(lPlan, rPlan, keyCol, timeCol, tieCol,
      payloadCols, asofOut)
    org.apache.spark.sql.graftshim.Bridge.ofRows(spark, node)
  }
}
