package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** As-of join semantics: inclusive at-or-before match, latest-tie-wins,
  * null for no prior row — pinned on a hand fixture, then cross-checked
  * against a naive inequality-join + argmax on the events fixture (a
  * genuinely different algorithm that must agree everywhere).
  */
class AsOfJoinSpec extends SparkTestBase {

  test("matches at-or-before, inclusive ties, latest right row wins") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // equal-ts to two right rows → inclusive, tie→12
      (2L, 100L, 25L), // between right rows → t=10 wins
      (3L, 100L, 30L), // equal-ts to rid 13 → inclusive
      (4L, 200L, 5L)   // before any right row → null
    ).toDF("id", "k", "t").withColumn("tie", col("id"))
    val right = Seq(
      (11L, 100L, 10L, "a"),
      (12L, 100L, 10L, "b"), // same (k,t) as 11: higher tie wins
      (13L, 100L, 30L, "c"),
      (14L, 200L, 50L, "z")  // after every left row of k=200
    ).toDF("tie", "k", "t", "payload")

    val got = AsOfJoin.asOf(left, right, "k", "t", "tie", Seq("payload"))
      .orderBy("id")
      .select("id", "asof_payload")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
      .toSeq
    assert(got == Seq(
      (1L, Some("b")), (2L, Some("b")), (3L, Some("c")), (4L, None)))
  }

  test("agrees with naive inequality-join + argmax on the events fixture") {
    val raw = Tables.load(spark, sfDir, "events")
    val left = raw.select(col("event_id"), col("user_id"),
      expr("unix_micros(ts)").as("us"), col("event_type"))
    val right = raw.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_id").as("purchase_id"))

    val fast = AsOfJoin.asOf(left, right, "user_id", "us", "event_id",
      Seq("purchase_id"))
      .select(col("event_id"), col("asof_purchase_id"))

    // Naive: materialize every (event, prior purchase) pair, keep the
    // argmax by (us, event_id) — O(n·m) per key, the shape the operator
    // exists to avoid, but an independent definition of the answer.
    val r = right.select(col("user_id").as("r_uid"), col("us").as("r_us"),
      col("event_id").as("r_tie"), col("purchase_id"))
    val naive = left
      .join(r, col("user_id") === col("r_uid") && col("r_us") <= col("us"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("purchase_id"), struct(col("r_us"), col("r_tie")))
        .as("asof_purchase_id"))

    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("native operator matches the hand fixture, including null-payload rows") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 30L), (4L, 200L, 5L)
    ).toDF("id", "k", "t").withColumn("tie", col("id"))
    val right = Seq(
      (11L, 100L, 10L, "a"), (12L, 100L, 10L, "b"),
      (13L, 100L, 30L, "c"), (14L, 200L, 50L, "z")
    ).toDF("tie", "k", "t", "payload")

    val df = AsOfJoin.asOfNative(left, right, "k", "t", "tie", Seq("payload"))
    // The custom physical operator must actually be in the plan
    // (TreeNode renders AsOfJoinExec as "AsOfJoin").
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val got = df.orderBy("id").select("id", "asof_payload")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
      .toSeq
    assert(got == Seq(
      (1L, Some("b")), (2L, Some("b")), (3L, Some("c")), (4L, None)))
  }

  test("native operator agrees with the composed operator on the events fixture") {
    val raw = Tables.load(spark, sfDir, "events")
    val left = raw.select(col("event_id"), col("user_id"),
      expr("unix_micros(ts)").as("us"), col("event_type"))
    val right = raw.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"))

    val composed = AsOfJoin.asOf(left, right, "user_id", "us", "event_id",
      Seq("purchase_id", "purchase_value"))
    val native = AsOfJoin.asOfNative(left, right, "user_id", "us", "event_id",
      Seq("purchase_id", "purchase_value"))
    assert(native.columns.toSeq == composed.columns.toSeq)
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
  }

  test("native operator handles empty right side and left-only keys") {
    import spark.implicits._
    val left = Seq((1L, 7L, 10L, 1L)).toDF("id", "k", "t", "tie")
    val right = Seq.empty[(Long, Long, Long, String)]
      .toDF("tie", "k", "t", "payload")
    val got = AsOfJoin.asOfNative(left, right, "k", "t", "tie", Seq("payload"))
      .collect()
    assert(got.length == 1 && got.head.isNullAt(4))
  }

  test("native operator rejects missing and ambiguous column names up front") {
    import spark.implicits._
    val left = Seq((1L, 2L)).toDF("k", "t")
    val right = Seq((1L, 2L, 3L, "x")).toDF("k", "t", "tie", "payload")
    val noSuch = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left, right, "k", "t", "tie", Seq("nope"))
    }
    assert(noSuch.getMessage.contains("nope"))
    val dup = left.select(col("k"), col("t"), col("t").as("k"))
      .toDF("k", "t", "k") // duplicate name on the left
    val ambiguous = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(dup, right, "k", "t", "tie", Seq("payload"))
    }
    assert(ambiguous.getMessage.contains("exactly once"))
  }
}
