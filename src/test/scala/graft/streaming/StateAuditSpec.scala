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

  test("retention stamps state with a visible TTL expiration (the eviction contract)") {
    // The retention specs pin BEHAVIOR (expired keys stop matching);
    // this pins the STATE-SIZE claim behind it: a TTL'd value carries
    // `ttlExpirationMs` in the store, the metadata the provider's
    // sweep evicts on — visible proof the bound is real, not just a
    // read-time filter.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb { withTempDir("state_ttl_audit") { base =>
      val ckpt = s"$base/ckpt"
      val before = System.currentTimeMillis()
      val in = MemoryStream[EventTyped]
      in.addData(EventTyped(1L, 7L, 1000L, "A"))
      val q = transitions(spark, in.toDS(),
          retention = Some(java.time.Duration.ofHours(1))).toDF()
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
      val after = System.currentTimeMillis()
      val rows = spark.read.format("statestore")
        .option("stateVarName", "last").load(ckpt)
        .selectExpr("key.value AS user_id", "value.value.tpe AS tpe",
          "value.ttlExpirationMs AS exp_ms")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.length == 1)
      val (user, tpe, exp) = rows.head
      assert(user == 7L && tpe == "A")
      // expiry = batch processing time + 1 h, bracketed by the run
      val hour = 3600000L
      assert(exp >= before + hour && exp <= after + hour,
        s"ttlExpirationMs $exp outside [$before, $after] + 1h")
    } }
  }

  test("timer audit: exactly ONE pending timer per open session, moved on extension") {
    // The delete-then-register discipline is argued in
    // TimerSessionProcessor's comments; the state source PROVES it:
    // after batch 1 the open session's close is a single timer at
    // last-event + gap; after a batch-2 extension the OLD timer is
    // gone and only the moved one remains — a stale timer here would
    // fire a bogus early close.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb { withTempDir("state_timer_audit") { base =>
      val ckpt = s"$base/ckpt"
      val in = MemoryStream[Event]
      def runOnce(): Unit = {
        val q = timerSessionize(spark, in.toDS(), gapMinutes = 30,
            watermarkDelay = "10 minutes").toDF()
          .writeStream.format("parquet")
          .option("path", s"$base/out").option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .start()
        q.awaitTermination()
      }
      def timers(): Seq[(Long, Long)] =
        spark.read.format("statestore")
          .option("readRegisteredTimers", "true").load(ckpt)
          .selectExpr("key.value AS user_id", "expiration_timestamp_ms")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      def utcMs(s: String): Long =
        java.time.LocalDateTime.parse(s)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      in.addData(Event(1L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "x", 1.0))
      runOnce()
      // session test base runs UTC; Timestamp.valueOf parses in the
      // JVM default zone, which the container pins to UTC too
      assert(timers() == Seq((7L, utcMs("2024-01-01T00:30:00"))))
      in.addData(Event(2L,
        java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 7L, "x", 1.0))
      runOnce()
      assert(timers() == Seq((7L, utcMs("2024-01-01T00:40:00"))),
        "extension must MOVE the single pending timer, not add one")
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
