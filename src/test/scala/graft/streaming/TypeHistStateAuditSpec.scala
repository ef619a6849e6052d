package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Offline state audit beyond the gate (VERDICT r16 #4): the type
  * histogram's MAPSTATE read back from its checkpoint through the
  * state data source — the q271 contract on a composite state type,
  * with the stronger split-invariant oracle (state = batch GROUP BY
  * however the input was micro-batched). */
class TypeHistStateAuditSpec extends SparkTestBase {

  private def runAndAudit(split: Boolean): Array[(Long, String, Long)] = {
    import spark.implicits._
    val src = spark.range(24).select(col("id").as("event_id"),
      (col("id") % 3).as("user_id"), col("id").as("us"),
      concat(lit("t"), (col("id") % 2).cast("string")).as("event_type"))
    val dir = java.nio.file.Files.createTempDirectory("ths_src")
    if (split) {
      // two files + maxFilesPerTrigger=1 → two data micro-batches
      src.filter(col("id") < 12).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/a")
      src.filter(col("id") >= 12).coalesce(1)
        .write.mode("append").parquet(s"$dir/a")
    } else src.coalesce(1).write.mode("overwrite").parquet(s"$dir/a")
    withRocksDb {
      val ev = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/a")
        .as[EventStreams.EventTyped]
      val out = EventStreams.typeHistogramStream(spark, ev)
      val ckpt = java.nio.file.Files.createTempDirectory("ths_ck")
      val q = out.toDF().writeStream.format("noop")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      if (split)
        assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
          "split run must see more than one data batch")
      EventStreams.typeHistState(spark, ckpt.toString)
        .orderBy("user_id", "event_type")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    }
  }

  test("checkpoint MapState equals the batch GROUP BY, split-invariant") {
    // 24 events, 3 users × 2 types ⇒ every (user, type) holds 4
    val expected = (0L to 2L).flatMap(u =>
      Seq((u, "t0", 4L), (u, "t1", 4L))).toArray
    assert(runAndAudit(split = false).sameElements(expected))
    // the SAME state contents when the fixture arrives as two batches
    assert(runAndAudit(split = true).sameElements(expected))
  }
}
