package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** State-source introspection across the OTHER state types (the gate's
  * ListState is pinned by q271 + DocStreamsSpec): a transformWithState
  * checkpoint's ValueState and MapState read back as DataFrames — the
  * offline-audit pattern ([[DocStreams.gateStateResidents]])
  * generalized to every twin, so operations can answer "what is user
  * X's running total / histogram RIGHT NOW" from a checkpoint without
  * touching the stream. Also guards against the state source's row
  * shape drifting under a Spark upgrade (`key.value`, `value.<fields>`,
  * `user_map_key/value` are not a documented contract upstream). */
class StateAuditSpec extends SparkTestBase {

  import EventStreams._

  test("ValueState audit: runningTotals state reads back per user") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb { withTempDir("state_audit") { base =>
      val ckpt = s"$base/ckpt"
      val in = MemoryStream[EventMilli]
      in.addData(EventMilli(1L, 7L, 1000L, 250L),
        EventMilli(2L, 7L, 2000L, 750L), EventMilli(3L, 9L, 1500L, 100L))
      val q = runningTotals(spark, in.toDS()).toDF()
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
      val got = spark.read.format("statestore")
        .option("stateVarName", "totals").load(ckpt)
        .selectExpr("key.value AS user_id", "value.n AS n",
          "value.sumMillis AS sum_millis")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == Set((7L, 2L, 1000L), (9L, 1L, 100L)))
    } }
  }

  test("MapState audit: the histogram reads back one row per (user, type)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb { withTempDir("state_audit2") { base =>
      val ckpt = s"$base/ckpt"
      val in = MemoryStream[EventTyped]
      in.addData(EventTyped(1L, 7L, 1000L, "A"),
        EventTyped(2L, 7L, 2000L, "A"), EventTyped(3L, 7L, 3000L, "B"))
      val q = typeHistogramStream(spark, in.toDS()).toDF()
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
      val got = spark.read.format("statestore")
        .option("stateVarName", "counts").load(ckpt)
        .selectExpr("key.value AS user_id", "user_map_key.value AS t",
          "user_map_value.value AS n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == Set((7L, "A", 2L), (7L, "B", 1L)))
    } }
  }
}
