package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Interval join semantics: inclusive bounds, left rows without
  * matches survive, bucket-boundary matches are neither lost nor
  * duplicated, and the plan never degenerates to a nested loop. */
class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("matches the naive inequality join incl. bucket boundaries") {
    // window w = before+after = 10; right times straddle bucket edges
    val left = Seq((1L, "a", 100L), (2L, "a", 105L), (3L, "b", 50L),
      (4L, "c", 7L)).toDF("id", "k", "t")
    val right = Seq(("a", 90L), ("a", 95L), ("a", 100L), ("a", 101L),
      ("a", 110L), ("b", 39L), ("b", 40L), ("b", 51L), ("c", 200L))
      .toDF("k", "t")
    val got = RangeJoin.intervalJoinAgg(left, right, "k", "t", "t",
      before = 10L, after = 0L,
      matchAggs = Seq(count(col("_rt")).as("n")))
      .select("id", "n").as[(Long, Long)].collect().toMap
    // naive: id1 t=100 window [90,100] → 90,95,100 = 3
    //        id2 t=105 window [95,105] → 95,100,101 = 3
    //        id3 t=50  window [40,50]  → 40 = 1 (39 is outside)
    //        id4 t=7   window [-3,7]   → none = 0, row still present
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 1L, 4L -> 0L))
  }

  test("no duplicate matches across covered buckets") {
    // right row exactly on a left row's bucket seam must count once
    val left = Seq((1L, "k", 20L)).toDF("id", "k", "t")
    val right = Seq(("k", 10L), ("k", 15L), ("k", 20L)).toDF("k", "t")
    val got = RangeJoin.intervalJoinAgg(left, right, "k", "t", "t",
      before = 10L, after = 0L,
      matchAggs = Seq(count(col("_rt")).as("n")))
      .select("n").as[Long].head()
    assert(got == 3L)
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
    val plan = RangeJoin.intervalJoinAgg(p, v, "user_id", "us", "us",
      1800000000L, 0L, Seq(count(col("_rt")).as("n")))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert("Left keys \\[2\\]".r.findFirstIn(plan).isDefined ||
      plan.contains("_bucket"))
  }
}
