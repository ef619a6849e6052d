package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams

/** Driver-checkable Structured Streaming queries: each runs a BOUNDED
  * streaming job (file source, `Trigger.AvailableNow`, memory sink) and
  * returns the sink's content as a DataFrame, so the oracle harness can
  * hash it like any batch query. This closes the round-1 gap where the
  * streaming operators were spec-only ("unbounded sources can't run
  * under Verify") — bounded triggers make the stream finite without
  * changing the operator under test.
  *
  * Determinism notes: the whole fixture is one parquet file, so the run
  * is a single data micro-batch (no arrival-order nondeterminism),
  * followed by the no-data batch in which the advanced watermark
  * finalizes append-mode results. The oracle mirrors Spark's emission
  * rule exactly: watermark = floor(max event-time ms) − delay, emit
  * windows with end ≤ watermark. Margins are safe: the fixture's max
  * ts sits hundreds of µs from any ms boundary, and hour windows sit
  * minutes from the cutoff, so the emitted set is stable even under
  * engines that round (rather than floor) the parquet TIMESTAMP(NANOS)
  * column to µs (see q59/q60 probes).
  */
object StreamingQueries {

  /** Load the events fixture as a STREAM, with the same TIMESTAMP(NANOS)
    * → µs conversion as the batch `Tables.load`. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    // The file stream source wants a DIRECTORY; scope it to the events
    // file with a glob filter rather than copying the fixture around.
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }

  /** Run a bounded streaming query into a memory sink and return its
    * final content. */
  private def runBounded(s: SparkSession, df: DataFrame, name: String,
                         mode: String): DataFrame = {
    s.sql(s"DROP VIEW IF EXISTS $name")
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Watermarked tumbling-window counts, append mode: only windows the
    // watermark has passed are emitted — the defining streaming-vs-batch
    // semantic, checked against an oracle that applies the same rule.
    "q61_stream_windows" -> ((s, dir) => {
      val out = EventStreams.windowedCounts(
        eventsStream(s, dir), "1 hour", "30 minutes")
      runBounded(s, out, "graft_q61_sink", "append")
        .orderBy("win_start", "event_type")
    }),

    // Streaming exact dedup on (user_id, event_type) within the
    // watermark horizon. The fixture arrives as ONE batch, so the
    // horizon never expires mid-run and exactly one row per key
    // survives. WHICH row wins depends on shuffle arrival order (same
    // as batch dropDuplicates), so the checked contract is the
    // parallelism-proof part: the surviving KEY SET.
    "q62_stream_dedup" -> ((s, dir) => {
      val deduped = EventStreams.dedupWithinWatermark(
        eventsStream(s, dir), Seq("user_id", "event_type"), "1 hour")
      runBounded(s, deduped.select("user_id", "event_type"),
        "graft_q62_sink", "append")
        .orderBy("user_id", "event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // Spark's watermark is floor(max event-time in MILLISECONDS) −
    // delay; append emits a window once window_end ≤ watermark. us is
    // floor(ns/1000) exactly as Spark's scan-side conversion.
    "q61_stream_windows" ->
      """WITH base AS (
           SELECT date_trunc('hour', ts) AS win_start, event_type,
                  epoch_ns(ts) // 1000 AS us, value
           FROM events),
         wm AS (
           SELECT ((max(us) // 1000) - 1800000) * 1000 AS w FROM base)
         SELECT win_start, event_type,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
         FROM base
         GROUP BY win_start, event_type
         HAVING (epoch_ns(win_start) // 1000) + 3600000000 <= (SELECT w FROM wm)
         ORDER BY win_start, event_type""",

    // One survivor per key ⇒ the emitted key set is the distinct keys.
    "q62_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type
         FROM events
         ORDER BY user_id, event_type"""
  )
}
