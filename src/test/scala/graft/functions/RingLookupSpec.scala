package graft.functions

import graft.SparkTestBase
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** The binary-search ring lookup must agree exactly with the argmin
  * definition it replaces: shard of minimum (vh − kh) mod 2^60 over a
  * sorted, distinct ring. Any divergence silently breaks q177's hash
  * compare. */
class RingLookupSpec extends SparkTestBase {

  import spark.implicits._

  /** The retired literal-struct-array argmin — kept here as the
    * definitional reference the native expression must match. */
  private def argminAssign(keyHash: org.apache.spark.sql.Column,
                           ring: Seq[(Long, Int)]) = {
    val arr = array(ring.map { case (h, s) =>
      struct(pmod(lit(h) - keyHash, lit(Layout.RingModulus)).as("d"),
        lit(s.toLong).as("s"))
    }: _*)
    array_min(arr).getField("s")
  }

  test("successor semantics: exact hit, between, and wrap-around") {
    RingLookup.register(spark)
    val ring = Seq((10L, 2), (20L, 0), (300L, 1))  // sorted by position
    val pos = lit(ring.map(_._1).toArray)
    val sh = lit(ring.map(_._2.toLong).toArray)
    val cases = Seq(
      0L -> 2L,     // below all → first vnode
      10L -> 2L,    // exact hit counts (distance 0)
      11L -> 0L,    // next position up
      20L -> 0L,
      21L -> 1L,
      300L -> 1L,
      301L -> 2L)   // above all → wraps to index 0
    val got = cases.map(_._1).toDF("kh")
      .select(col("kh"), call_function(RingLookup.name, col("kh"), pos, sh)
        .as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (k, want) => assert(got(k) == want, s"kh=$k") }
  }

  test("matches the argmin definition on real md5 hashes, both rings") {
    RingLookup.register(spark)
    val keys = spark.range(2000).select(
      expr("cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as bigint)")
        .as("kh"))
    for (shards <- Seq(8, 9); vnodes <- Seq(16)) {
      val ring = Layout.hashRing(shards, vnodes)
      val diff = keys.select(
        Layout.ringAssign(spark, col("kh"), ring).as("fast"),
        argminAssign(col("kh"), ring).as("want"))
        .filter(col("fast") =!= col("want"))
      assert(diff.count() == 0, s"shards=$shards")
    }
  }

  test("interpreted path agrees with codegen") {
    RingLookup.register(spark)
    val ring = Layout.hashRing(5, 8)
    val pos = ring.map(_._1).toArray
    val sh = ring.map(_._2.toLong).toArray
    val posAd = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pos)
    val shAd = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sh)
    // direct helper calls (the interpreted/nullSafeEval path)
    def slow(kh: Long): Long = {
      val m = Layout.RingModulus
      ring.map { case (vh, s) => (((vh - kh) % m + m) % m, s.toLong) }.min._2
    }
    // 60-bit-domain keys (the contract) match the argmin exactly,
    // including the domain edges and positions themselves
    val khs = Seq(0L, 1L, pos.min, pos.max, pos.max + 1,
      Layout.RingModulus - 1) ++
      (0L until 500L).map(i => (i * 2305843009213693951L) & (Layout.RingModulus - 1))
    khs.foreach { kh =>
      assert(RingLookup.lookup(kh, posAd, shAd) == slow(kh), s"kh=$kh")
    }
  }
}
