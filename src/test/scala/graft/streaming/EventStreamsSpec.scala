package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Micro-batch tests for the streaming operators using MemoryStream —
  * real Structured Streaming execution (state store, watermarks), not
  * batch emulation.
  */
class EventStreamsSpec extends SparkTestBase {

  import EventStreams._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed counts finalize once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = windowedCounts(in.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()

    in.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0))
    q.processAllAvailable()
    // next batch pushes the watermark to 23:10, far past hours 0 and 1
    in.addData(Event(4, ts(23 * 60 + 20), 2, "view", 4.0))
    q.processAllAvailable()
    // one more batch so finalized windows are emitted against the
    // advanced watermark
    in.addData(Event(5, ts(23 * 60 + 25), 2, "view", 5.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1.getTime)
    // hour 0 and hour 1 are closed; the 23:00 window stays open (pending)
    assert(rows.toSeq == Seq(
      (ts(0), "click", 2L, 3.0),
      (ts(60), "view", 1L, 3.0)))
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = dedupWithinWatermark(in.toDF(), Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    in.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 1.0), // dup key, same batch
      Event(2, ts(2), 1, "view", 2.0))
    q.processAllAvailable()
    in.addData(Event(1, ts(3), 1, "click", 1.0)) // dup key, later batch
    q.processAllAvailable()
    in.addData(Event(3, ts(5), 2, "view", 3.0))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("sessionize closes sessions on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = sessionize(spark, in.toDS(), gapMinutes = 30, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: two sessions split by a 40-minute gap inside one batch
    in.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(50), 1, "click", 3.0),
      Event(4, ts(55), 1, "click", 4.0))
    q.processAllAvailable()

    // batch 2 pushes the watermark far ahead so user 1's open session
    // times out via EventTimeTimeout
    in.addData(Event(9, ts(600), 2, "view", 9.0))
    q.processAllAvailable()
    in.addData(Event(10, ts(1200), 2, "view", 10.0))
    q.processAllAvailable()
    in.addData(Event(11, ts(1800), 2, "view", 11.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(rows.length == 2)
    assert(rows(0) == Session(1L, ts(0), ts(10), 2L, 3.0))
    assert(rows(1) == Session(1L, ts(50), ts(55), 2L, 7.0))
  }

  test("bounded runs resume exactly-once from a checkpoint (no re-emission)") {
    // The production restart contract: a second AvailableNow run over
    // the same source with the same checkpoint finds no new offsets and
    // appends NOTHING to the file sink — windows finalized in run 1 are
    // not re-emitted. This is what makes scheduled incremental
    // ingestion (run-every-hour AvailableNow jobs) idempotent at scale.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    def source = {
      val raw = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", expr("cast(ts as timestamp)"))
        case _ => raw
      }
    }
    val base = java.nio.file.Files.createTempDirectory("graft_resume")
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"
    def runOnce(): Long = {
      val q = EventStreams.windowedCounts(source, "1 hour", "30 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    val afterFirst = runOnce()
    val afterSecond = runOnce()
    assert(afterFirst > 0L)
    assert(afterSecond == afterFirst,
      "restart from checkpoint re-emitted finalized windows")
  }

  test("stream-static join enriches each batch against the dim table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("k", "segment")
    val in = MemoryStream[Event]
    val q = enrichedWindowCounts(in.toDF(), dim, "user_id", "k", "segment",
      "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("update").start()
    in.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(15), 2, "view", 3.0),
      Event(4, ts(20), 9, "view", 9.0)) // no dim row → dropped by inner join
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(rows.toSeq == Seq(("GOLD", 2L, 3.0), ("SILVER", 1L, 3.0)))
  }

  test("running totals carry ValueState across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb {
      val in = MemoryStream[EventMilli]
      val q = runningTotals(spark, in.toDS())
        .writeStream.format("memory").queryName("running_totals")
        .outputMode("append").start()
      // batch 1: user 1 twice (out of order — the processor re-sorts),
      // user 2 once
      in.addData(
        EventMilli(2L, 1L, 2000L, 2500L),
        EventMilli(1L, 1L, 1000L, 1000L),
        EventMilli(3L, 2L, 1500L, 7000L))
      q.processAllAvailable()
      // batch 2: user 1 again — the fold must RESUME from (2, 3500)
      in.addData(EventMilli(4L, 1L, 9000L, 500L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("running_totals").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(rows.toSeq == Seq(
        (1L, 1L, 1L, 1000L), (2L, 1L, 2L, 3500L),
        (3L, 2L, 1L, 7000L), (4L, 1L, 3L, 4000L)))
    }
  }

  test("transitions chain event types across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb {
      val in = MemoryStream[EventTyped]
      val q = transitions(spark, in.toDS())
        .writeStream.format("memory").queryName("transitions_sink")
        .outputMode("append").start()
      // batch 1, user 1 out of order: chain is A(us=1) → B(us=2);
      // user 2's single event emits nothing yet
      in.addData(
        EventTyped(2L, 1L, 2000L, "B"),
        EventTyped(1L, 1L, 1000L, "A"),
        EventTyped(3L, 2L, 1500L, "X"))
      q.processAllAvailable()
      // batch 2: user 1's chain RESUMES from B; user 2's from X
      in.addData(
        EventTyped(4L, 1L, 9000L, "C"),
        EventTyped(5L, 2L, 9500L, "Y"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("transitions_sink").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set(
        (1L, "A", "B"), (1L, "B", "C"), (2L, "X", "Y")))
    }
  }

  test("interArrivalGaps carry the gap chain across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb {
      val in = MemoryStream[EventTyped]
      val q = interArrivalGaps(spark, in.toDS())
        .writeStream.format("memory").queryName("gaps_sink")
        .outputMode("append").start()
      // batch 1, user 1 out of order: events at 10s and 3s → one 7s
      // gap after the in-batch sort; user 2's single event is silent
      in.addData(
        EventTyped(2L, 1L, 10000000L, "B"),
        EventTyped(1L, 1L, 3000000L, "A"),
        EventTyped(3L, 2L, 1000000L, "X"))
      q.processAllAvailable()
      // batch 2: user 1 resumes from 10s (gap 90s); user 2 from 1s
      // (sub-second gap floors to 0)
      in.addData(
        EventTyped(4L, 1L, 100000000L, "C"),
        EventTyped(5L, 2L, 1999999L, "Y"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("gaps_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(rows == Seq((1L, 7L), (1L, 90L), (2L, 0L)))
    }
  }

  test("kmvSketchStream: sketch log across batches re-folds to the live sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb {
      val in = MemoryStream[KeyedHash]
      val q = kmvSketchStream(spark, in.toDS(), k = 3)
        .writeStream.format("memory").queryName("kmv_sink")
        .outputMode("append").start()
      // batch 1: key a sees hashes {50, 10, 30, 10-dup}
      in.addData(KeyedHash("a", 50L), KeyedHash("a", 10L),
        KeyedHash("a", 30L), KeyedHash("a", 10L))
      q.processAllAvailable()
      // batch 2: a smaller hash evicts 50 from a's bottom-3; key b opens
      in.addData(KeyedHash("a", 20L), KeyedHash("b", 99L))
      q.processAllAvailable()
      q.stop()
      val log = spark.table("kmv_sink").as[KeyedHash].collect()
      // the log contains BOTH versions of a's sketch...
      assert(log.count(_.k == "a") == 6) // 3 rows per batch
      // ...but re-taking the bottom-k per key recovers the live sketch
      val folded = log.groupBy(_.k).map { case (g, rows) =>
        g -> rows.map(_.h).distinct.sorted.take(3).toSeq
      }
      assert(folded("a") == Seq(10L, 20L, 30L))
      assert(folded("b") == Seq(99L))
      // and kmvEstimate over the log behaves per contract: b (fewer
      // than k survivors) is EXACT; a's sketch is full, so it
      // estimates via (k−1)·2^60/h_k — the toy hashes here are tiny,
      // not uniform 60-bit draws, so only the formula (not accuracy)
      // is asserted
      import org.apache.spark.sql.functions.col
      val est = graft.operators.Sketch.kmvEstimate(
        spark.table("kmv_sink").select(col("k").as("g"), col("h")),
        Seq("g"), 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est("b") == 1L)
      assert(est("a") ==
        math.floor(2.0 * 1152921504606846976.0 / 30.0).toLong)
    }
  }

  test("funnelStages advances across batches with the inclusive >= rule") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb {
      val in = MemoryStream[EventTyped]
      val q = funnelStages(spark, in.toDS(), Seq("signup", "view", "purchase"))
        .writeStream.format("memory").queryName("funnel_sink")
        .outputMode("append").start()
      // user 1: view BEFORE signup must not count; the equal-time view
      // at the signup microsecond MUST (inclusive >=, the q91 rule).
      // user 2: signup only.
      in.addData(
        EventTyped(1L, 1L, 500L, "view"),
        EventTyped(2L, 1L, 1000L, "signup"),
        EventTyped(3L, 1L, 1000L, "view"),
        EventTyped(4L, 2L, 700L, "signup"))
      q.processAllAvailable()
      // batch 2: user 1 purchases (stage 3); user 2 purchases WITHOUT
      // a view — no advance.
      in.addData(
        EventTyped(5L, 1L, 2000L, "purchase"),
        EventTyped(6L, 2L, 2000L, "purchase"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("funnel_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)))
    }
  }

  test("streaming CUSUM equals batch on NULL/NaN/Inf series and resumes state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // drift k = 100 cents, threshold h = 300 cents. Series:
    //  "up"  — sustained +200/obs drift: alarms from the 2nd obs on
    //  "mix" — NaN, +Inf and NULL interleaved with finite values
    //          (exclusions counted, statistic unpoisoned)
    //  "gone"— all-NULL: NO output row on either engine
    val fixture: Seq[(String, Timestamp, Long, java.lang.Double)] = Seq(
      ("up", ts(1), 1L, 3.0), ("up", ts(2), 2L, 3.0),
      ("up", ts(3), 3L, 3.0),
      ("mix", ts(1), 4L, Double.NaN), ("mix", ts(2), 5L, 5.0),
      ("mix", ts(3), 6L, Double.PositiveInfinity),
      ("mix", ts(4), 7L, null), ("mix", ts(5), 8L, 0.5),
      ("gone", ts(1), 9L, null), ("gone", ts(2), 10L, null))
    // batch 2 strictly AFTER batch 1 in event time, so the stream's
    // arrival-order fold equals the batch engine's global
    // (us, event_id) order while still exercising cross-batch state
    val (b1, b2) = fixture.partition(_._2.getTime <= ts(3).getTime)
    val batchDf = fixture
      .toDF("event_type", "ts", "event_id", "value")
    val expect = graft.operators.Stats.cusumShift(batchDf, "event_type",
        "ts", "event_id", "value", driftCents = 100L,
        thresholdCents = 300L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(expect.keySet == Set("up", "mix")) // "gone" absent batch-side

    withRocksDb {
      val in = MemoryStream[(String, Timestamp, Long, java.lang.Double)]
      def obs(df: org.apache.spark.sql.DataFrame) = {
        val named = df.toDF("event_type", "ts", "event_id", "value")
        val v = col("value").cast("double")
        val finite = v.isNotNull && !isnan(v) &&
          v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity
        named.select(col("event_type"), expr("unix_micros(ts)").as("us"),
            col("event_id"),
            when(finite, floor(v * 100).cast("long") - 100L).as("d"))
          .as[MetricObs]
      }
      val q = cusumShiftStream(spark, obs(in.toDF()), thresholdCents = 300L)
        .toDF().writeStream.format("memory").queryName("cusum_sink")
        .outputMode("append").start()
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      q.stop()
      // each batch re-emits touched series; n grows monotonically, so
      // the max-n row per series is the final summary
      val got = spark.table("cusum_sink").collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      assert(got == expect)
    }
  }

  test("timer sessionize: gaps close inline, timers fire on watermark, extensions move the timer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // user 1: two sessions — [t0, t0+10m] then (after a 40m gap)
    //   [t0+50m, t0+55m]; the second is OPEN until the watermark
    //   passes its last event + 30m gap.
    // user 2: one event at t0+5m, session open; its timer expiry
    //   (t0+35m) is BEFORE the final watermark → fires.
    // user 3: one event near the end (t0+80m): timer expiry t0+110m
    //   is past the final watermark → stays open, never emitted.
    // batch 2 EXTENDS user 1's second session (t0+56m): the t0+85m
    //   timer must replace the t0+55m+30m one, not double-fire.
    // final watermark = max ts (t0+90m) − 5m delay = t0+85m.
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val b1 = Seq(
      Event(1L, t(0), 1L, "view", 1.0), Event(2L, t(10), 1L, "view", 1.0),
      Event(3L, t(50), 1L, "view", 1.0), Event(4L, t(55), 1L, "view", 1.0),
      Event(5L, t(5), 2L, "view", 1.0))
    val b2 = Seq(
      Event(6L, t(56), 1L, "view", 1.0),
      Event(7L, t(80), 3L, "view", 1.0),
      Event(8L, t(90), 4L, "view", 1.0)) // watermark driver; own session
    withRocksDb {
      val in = MemoryStream[Event]
      val q = timerSessionize(spark, in.toDS(), gapMinutes = 30,
          watermarkDelay = "5 minutes")
        .toDF().writeStream.format("memory").queryName("timer_sess")
        .outputMode("append").start()
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("timer_sess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.dropTempView("timer_sess")
      def usAt(min: Long) = (1700000000000L + min * 60000L) * 1000L
      // user 1: session A (gap-closed, 2 events), session B extended to
      // t+56, timer at t+86 > wm t+85 → B stays open. user 2: timer at
      // t+35 < t+85 → fired with 1 event. users 3, 4: open, unfired.
      assert(got == Set((1L, usAt(0), 2L), (2L, usAt(5), 1L)))
    }
  }

  test("MapState histogram accumulates across batches; argmax pick is split-invariant") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val fixture = Seq(
      EventTyped(1L, 1L, 100L, "view"), EventTyped(2L, 1L, 200L, "view"),
      EventTyped(3L, 1L, 300L, "purchase"), EventTyped(4L, 2L, 400L, "view"),
      EventTyped(5L, 1L, 500L, "view"), EventTyped(6L, 2L, 600L, "signup"))
    val expect = fixture.groupBy(e => (e.user_id, e.event_type))
      .view.mapValues(_.size.toLong).toMap
    withRocksDb {
      val results = Seq(Seq(fixture), Seq(fixture.take(3), fixture.drop(3)))
        .zipWithIndex.map { case (batches, i) =>
          val in = MemoryStream[EventTyped]
          val sink = s"maphist_$i"
          val q = typeHistogramStream(spark, in.toDS())
            .toDF().writeStream.format("memory").queryName(sink)
            .outputMode("append").start()
          batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
          q.stop()
          val rows = spark.table(sink).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          spark.catalog.dropTempView(sink)
          // argmax n per (user, type) — the q260 consumption trick
          rows.groupBy(r => (r._1, r._2)).view
            .mapValues(_.map(_._3).max).toMap
        }
      assert(results(0) == expect)
      assert(results(1) == expect) // split batch: (1, view) counts 2 then 3
    }
  }

  test("timer sessionize: a late event never moves the session boundary backward") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // gap 30m, delay 10m. u1 at t=40m; a LATE u1 event t=35m arrives a
    // batch later (watermark is 30m — not dropped); then t=68m:
    // 68−40 = 28m ≤ gap keeps ONE session. Before the min/max fix the
    // late event shrank lastUs to 35m and 68−35 = 33m > gap split it.
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val batches = Seq(
      Seq(Event(1L, t(40), 1L, "view", 1.0)),
      Seq(Event(2L, t(35), 1L, "view", 1.0)), // late, within delay
      Seq(Event(3L, t(68), 1L, "view", 1.0)),
      Seq(Event(4L, t(120), 9L, "view", 1.0))) // watermark driver
    withRocksDb {
      val in = MemoryStream[Event]
      val q = timerSessionize(spark, in.toDS(), gapMinutes = 30,
          watermarkDelay = "10 minutes")
        .toDF().writeStream.format("memory").queryName("timer_late")
        .outputMode("append").start()
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table("timer_late").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.dropTempView("timer_late")
      // one u1 session, start pulled DOWN to the late 35m, 3 events;
      // the wm (120−10 = 110m) fires its 68+30 = 98m timer. u9 open.
      assert(got == Set((1L, (1700000000000L + 35 * 60000L) * 1000L, 3L)))
    }
  }

  test("timer sessionize: a DEEP-late event forms its own session, not a merge") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // gap 30m but watermark delay 2h: an event can arrive MORE than a
    // gap below the open session's start (t = 10:30 vs session at
    // 12:00, 90m apart). Batch order puts it in its OWN session; the
    // merge arm's `t - lastUs <= gap` is vacuously true for negative
    // deltas, so without the deep-late arm it would glue the two.
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val batches = Seq(
      Seq(Event(1L, t(720), 1L, "view", 1.0)),  // u1 12:00
      Seq(Event(2L, t(630), 1L, "view", 1.0)),  // u1 10:30, deep-late
      Seq(Event(3L, t(1080), 9L, "view", 1.0))) // 18:00 watermark driver
    withRocksDb {
      val in = MemoryStream[Event]
      val q = timerSessionize(spark, in.toDS(), gapMinutes = 30,
          watermarkDelay = "2 hours")
        .toDF().writeStream.format("memory").queryName("timer_deep")
        .outputMode("append").start()
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table("timer_deep").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.dropTempView("timer_deep")
      def usAt(min: Long) = (1700000000000L + min * 60000L) * 1000L
      // deep-late singleton emitted on arrival; the 12:00 session's
      // 12:30 timer fires once the watermark reaches 16:00
      assert(got == Set((1L, usAt(630), 1L), (1L, usAt(720), 1L)))
    }
  }

  test("q260's last-summary-per-series pick is batch-split-invariant") {
    // r13 item 2: the driver query's sink consumption must yield the
    // SAME final rows under any micro-batch split. The pick is argmax
    // of (n + n_excluded) per series — n ALONE is not enough, which
    // this fixture forces: series "a"'s second batch carries only an
    // EXCLUDED (NULL) observation, so two sink rows tie at n = 2 and
    // only the n_excluded term separates final from stale.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fixture: Seq[(String, Timestamp, Long, java.lang.Double)] = Seq(
      ("a", ts(1), 1L, 4.0), ("a", ts(2), 2L, 4.0),
      ("a", ts(3), 3L, null),
      ("b", ts(1), 4L, 2.0), ("b", ts(2), 5L, 9.0))
    val splits: Seq[Seq[Seq[(String, Timestamp, Long, java.lang.Double)]]] =
      Seq(Seq(fixture),                            // one batch
        Seq(fixture.take(2) ++ fixture.drop(3).take(1),
          Seq(fixture(2), fixture(4))))            // "a" gets NULL-only tail
    withRocksDb {
      val results = splits.zipWithIndex.map { case (batches, i) =>
        val in = MemoryStream[(String, Timestamp, Long, java.lang.Double)]
        val named = in.toDF()
          .toDF("event_type", "ts", "event_id", "value")
        val v = col("value").cast("double")
        val finite = v.isNotNull && !isnan(v) &&
          v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity
        val obs = named.select(col("event_type"),
            expr("unix_micros(ts)").as("us"), col("event_id"),
            when(finite, floor(v * 100).cast("long") - 100L).as("d"))
          .as[MetricObs]
        val sink = s"cusum_split_$i"
        val q = cusumShiftStream(spark, obs, thresholdCents = 300L)
          .toDF().writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        q.stop()
        // the q260 driver query's consumption, verbatim
        val last = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy((col("n") + col("n_excluded")).desc)
        val rows = spark.table(sink)
          .withColumn("_rn", row_number().over(last))
          .filter(col("_rn") === 1)
          .select("event_type", "n", "n_excluded", "n_alarms",
            "max_s_cents", "first_alarm_us")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
        spark.catalog.dropTempView(sink)
        rows
      }
      assert(results(0).map(_._1) == Set("a", "b"))
      assert(results(0).exists(r => r._1 == "a" && r._3 == 1L)) // excluded
      assert(results(1) == results(0))
    }
  }

  /** Retention runs use single-batch Trigger.Once executions sharing
    * one checkpoint — the gate's documented TTL quiescence trap
    * (DocStreamsSpec.runGateRuns): under TimeMode.ProcessingTime the
    * engine keeps scheduling TTL-sweep batches, so a long-lived query
    * never quiesces. Expiry is evaluated against the SECOND run's
    * batch timestamp, so real wall-clock between runs exercises the
    * contract. Flake posture (both arms): a host stall only makes an
    * expired key MORE expired, and only an hour-long pause could
    * expire the liveness arm. */
  private def runRetentionBatches(
      batches: Seq[Seq[EventTyped]], sleepMsBetween: Long,
      make: org.apache.spark.sql.Dataset[EventTyped] =>
        org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb { withTempDir("evt_ttl") { base =>
      val ckpt = s"$base/ckpt"
      val out = s"$base/out"
      val in = MemoryStream[EventTyped]
      batches.zipWithIndex.foreach { case (b, i) =>
        if (i > 0 && sleepMsBetween > 0) Thread.sleep(sleepMsBetween)
        in.addData(b: _*)
        val q = make(in.toDS())
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .start()
        q.awaitTermination()
      }
      val outDir = new java.io.File(out)
      val hasData = outDir.isDirectory && outDir.listFiles != null &&
        outDir.listFiles.exists(_.getName.startsWith("part-"))
      if (!hasData) Seq.empty[org.apache.spark.sql.Row]
      else spark.read.parquet(out).collect().toSeq
    } }
  }

  private val shortTtl = Some(java.time.Duration.ofMillis(300))
  private val longTtl = Some(java.time.Duration.ofHours(1))

  test("checkpoint restart: a twin's ValueState survives stop/resume") {
    // retention = None makes the harness a pure RESTART check (each
    // batch is its own query resuming the shared checkpoint): user 7's
    // chain state from run 1 must survive into run 2 or the (A, B)
    // step never emits — the gate's recovery test applied to the
    // ValueState twins.
    val batches = Seq(Seq(EventTyped(1L, 7L, 1000L, "A")),
      Seq(EventTyped(2L, 7L, 2000L, "B")))
    val rows = runRetentionBatches(batches, 0L,
      ds => transitions(spark, ds).toDF())
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      == Seq((7L, "A", "B")))
  }

  test("transitions retention: an idle chain expires and restarts; a live one chains") {
    val batches = Seq(Seq(EventTyped(1L, 7L, 1000L, "A")),
      Seq(EventTyped(2L, 7L, 2000L, "B")))
    val expired = runRetentionBatches(batches, 1500L,
      ds => transitions(spark, ds, retention = shortTtl).toDF())
    // chain restarted: the first post-expiry event emits NO step
    assert(expired.isEmpty, s"expected no transition, got $expired")
    val live = runRetentionBatches(batches, 0L,
      ds => transitions(spark, ds, retention = longTtl).toDF())
    assert(live.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      == Seq((7L, "A", "B")))
  }

  test("interArrivalGaps retention: an idle chain expires; a live one emits the gap") {
    val batches = Seq(Seq(EventTyped(1L, 7L, 1000000L, "A")),
      Seq(EventTyped(2L, 7L, 5000000L, "B")))
    val expired = runRetentionBatches(batches, 1500L,
      ds => interArrivalGaps(spark, ds, retention = shortTtl).toDF())
    assert(expired.isEmpty, s"expected no gap, got $expired")
    val live = runRetentionBatches(batches, 0L,
      ds => interArrivalGaps(spark, ds, retention = longTtl).toDF())
    assert(live.map(r => (r.getLong(0), r.getLong(1))) == Seq((7L, 4L)))
  }

  test("typeHistogram retention: per-ENTRY expiry — idle type restarts, counts restart") {
    // batch 1: type A twice → n=2; batch 2 after the window: A again.
    // Expired arm: A's entry aged out, so batch 2 re-counts from 1.
    // Live arm: the entry survives, batch 2 emits n=3.
    val batches = Seq(
      Seq(EventTyped(1L, 7L, 1000L, "A"), EventTyped(2L, 7L, 2000L, "A")),
      Seq(EventTyped(3L, 7L, 3000L, "A")))
    val expired = runRetentionBatches(batches, 1500L,
      ds => typeHistogramStream(spark, ds, retention = shortTtl).toDF())
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(expired == Set((7L, "A", 2L), (7L, "A", 1L)),
      s"expected the count to RESTART at 1 after expiry, got $expired")
    val live = runRetentionBatches(batches, 0L,
      ds => typeHistogramStream(spark, ds, retention = longTtl).toDF())
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(live == Set((7L, "A", 2L), (7L, "A", 3L)))
  }
}
