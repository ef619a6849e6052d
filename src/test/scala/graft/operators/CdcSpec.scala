package graft.operators

import graft.SparkTestBase

/** [[Cdc.applyChanges]]: upsert/delete semantics, latest-sequence-wins,
  * and column-set preservation. */
class CdcSpec extends SparkTestBase {

  import spark.implicits._

  test("scd2 builds closed intervals with one open current version per key") {
    val hist = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c"),
      (2L, 150L, "x"))
      .toDF("k", "ts", "payload")
    val dim = Cdc.scd2(hist, Seq("k"), Seq("ts"), "ts")
      .orderBy("k", "version")
      .select("k", "version", "ts", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSeq
    assert(dim == Seq(
      (1L, 1L, 100L, Some(200L), false),
      (1L, 2L, 200L, Some(300L), false),
      (1L, 3L, 300L, None, true),
      (2L, 1L, 150L, None, true)))
  }

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "s", "v")

  test("insert, update, delete in one batch") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L), // update key 2
      (3L, "c", 30.0, "D", 1L),  // delete key 3
      (9L, "z", 90.0, "I", 1L))  // insert key 9
      .toDF("k", "s", "v", "op", "seq")
    val next = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(next == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (9L, "z", 90.0)))
  }

  test("latest sequence wins per key, including delete-then-reinsert") {
    val changes = Seq(
      (1L, "x1", 1.0, "U", 1L),
      (1L, "x2", 2.0, "U", 3L), // latest for key 1
      (1L, "x3", 3.0, "U", 2L),
      (2L, "b", 20.0, "D", 1L),
      (2L, "b9", 99.0, "I", 2L)) // re-insert AFTER the delete: row lives
      .toDF("k", "s", "v", "op", "seq")
    val next = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(next == Seq((1L, "x2", 2.0), (2L, "b9", 99.0), (3L, "c", 30.0)))
  }

  test("empty change batch returns the base unchanged") {
    val changes = Seq.empty[(Long, String, Double, String, Long)]
      .toDF("k", "s", "v", "op", "seq")
    val next = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
    assert(next.orderBy("k").collect().toSeq ==
      base.orderBy("k").collect().toSeq)
    assert(next.columns.toSeq == base.columns.toSeq)
  }
}
