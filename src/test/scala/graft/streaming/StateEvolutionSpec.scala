package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

// Top-level (Encoders can't reach test-class inner scopes).
case class EvoIn(k: Long, v: Long)
case class EvoOut(k: Long, total: Long, extra: Long)
case class EvoStV1(total: Long)
case class EvoStV2(total: Long, bonus: Long)

/** V1 processor: state = (total). */
class EvoP1 extends StatefulProcessor[Long, EvoIn, EvoOut] {
  @transient private var st: ValueState[EvoStV1] = _
  override def init(o: OutputMode, t: TimeMode): Unit =
    st = getHandle.getValueState[EvoStV1]("acc",
      org.apache.spark.sql.Encoders.product[EvoStV1], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvoIn],
      tv: TimerValues): Iterator[EvoOut] = {
    val cur = if (st.exists()) st.get() else EvoStV1(0L)
    val next = EvoStV1(cur.total + rows.map(_.v).sum)
    st.update(next)
    Iterator.single(EvoOut(key, next.total, -1L))
  }
}

/** V2 processor: the SAME state variable gains a `bonus` field. */
class EvoP2 extends StatefulProcessor[Long, EvoIn, EvoOut] {
  @transient private var st: ValueState[EvoStV2] = _
  override def init(o: OutputMode, t: TimeMode): Unit =
    st = getHandle.getValueState[EvoStV2]("acc",
      org.apache.spark.sql.Encoders.product[EvoStV2], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvoIn],
      tv: TimerValues): Iterator[EvoOut] = {
    val cur = if (st.exists()) st.get() else EvoStV2(0L, 0L)
    val next = EvoStV2(cur.total + rows.map(_.v).sum, cur.bonus + 1L)
    st.update(next)
    Iterator.single(EvoOut(key, next.total, next.bonus))
  }
}

/** STATE SCHEMA EVOLUTION: under the Avro state encoding, a
  * transformWithState processor whose state case class GAINS a field
  * must resume an existing checkpoint (the production contract that
  * lets a deployed twin add a counter without discarding accumulated
  * state — the reason the twins declare state schemas to the store
  * at all, EventStreams' RunningTotalsProcessor doc). */
class StateEvolutionSpec extends SparkTestBase {

  test("v2 state with an added field resumes a v1 checkpoint (avro encoding)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withRocksDb {
      withConf("spark.sql.streaming.stateStore.encodingFormat", "avro") {
        withTempDir("state_evo") { base =>
          val ckpt = s"$base/ckpt"
          val in = MemoryStream[EvoIn]
          def run(p: StatefulProcessor[Long, EvoIn, EvoOut]): Unit = {
            val q = in.toDS().groupByKey(_.k)
              .transformWithState(p, TimeMode.None(), OutputMode.Append())
              .toDF()
              .writeStream.format("parquet")
              .option("path", s"$base/out")
              .option("checkpointLocation", ckpt)
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.Once())
              .start()
            q.awaitTermination()
          }
          in.addData(EvoIn(7L, 10L))
          run(new EvoP1)
          in.addData(EvoIn(7L, 5L))
          run(new EvoP2) // state gains `bonus` — must resume, not reset
          val rows = spark.read.parquet(s"$base/out")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .toSet
          // run 1 emitted (7, 10, -1); run 2 must fold ON TOP of the
          // recovered total (15, not 5) with the new field defaulted
          // then bumped (bonus = 1)
          assert(rows == Set((7L, 10L, -1L), (7L, 15L, 1L)),
            s"v2 must resume v1's total=10 and fold 5 more: $rows")
        }
      }
    }
  }
}
