package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Specs for the multimodal plumbing and batch event operators. */
class MultimodalEventsSpec extends SparkTestBase {

  lazy val docs = Tables.load(spark, sfDir, "documents")
  lazy val events = Tables.load(spark, sfDir, "events")

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val types = m.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
    assert(m.count() == docs.count())
  }

  test("typed mapPartitions decode agrees with the columnar decode path") {
    val m = Multimodal.mediaTable(docs)
    val typed = Multimodal.decodeTyped(spark, m)
      .select("media_id", "n_bytes", "width", "height", "n_frames")
    val columnar = Multimodal.decodeColumnar(m)
      .select("media_id", "n_bytes", "width", "height", "n_frames")
    assert(typed.except(columnar).count() == 0)
    assert(columnar.except(typed).count() == 0)
  }

  test("typed decode emits deterministic pseudo-features in [0,1)") {
    val feats = Multimodal.decodeTyped(spark, Multimodal.mediaTable(docs))
      .select(explode(col("features")).as("f"))
      .agg(min("f"), max("f")).head
    assert(feats.getFloat(0) >= 0.0f && feats.getFloat(1) < 1.0f)
  }

  test("frame sampling yields ceil(len/k) frames per media") {
    val m = Multimodal.mediaTable(docs)
    val sampled = Multimodal.frameSample(m, everyK = 100, frameBytes = 16)
      .select(col("media_id"), size(col("frames")).as("n"))
      .join(m.select(col("media_id"), length(col("bytes")).as("len")), "media_id")
    val bad = sampled.filter(col("n") =!= ceil(col("len") / 100.0).cast("int")).count()
    assert(bad == 0)
  }

  test("frame pooling: frame count matches sampling, features hand-verified") {
    import spark.implicits._
    // one 150-char payload → frames at offsets 1 and 101
    val m = Seq((7L, "image", ("ab" * 75).getBytes("UTF-8")))
      .toDF("media_id", "media_type", "bytes")
    val got = Multimodal.framePooling(m, everyK = 100, frameBytes = 16)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._1 == 7L && got._2 == 2L)
    // recompute the pooled quads by hand from the two frame digests
    def quads(s: String): Seq[Long] = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 4).map(i => java.lang.Long.parseLong(h.substring(i * 4, i * 4 + 4), 16))
    }
    val payload = "ab" * 75
    val f1 = quads(payload.substring(0, 16))
    val f2 = quads(payload.substring(100, 116))
    val want = (0 until 4).map(i => (f1(i) + f2(i)) / 2)
    assert(Seq(got._3, got._4, got._5, got._6) == want)
  }

  test("batch sessionize splits on gaps and conserves events") {
    val s = Events.sessionize(events, 30)
    val total = s.agg(sum("n_events")).head.getLong(0)
    assert(total == events.count())
    // session bounds are ordered
    assert(s.filter(col("session_end_us") < col("session_start_us")).count() == 0)
    // session ids are 1..n per user
    val perUser = s.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("session_id").as("mx"))
    assert(perUser.filter(col("n") =!= col("mx")).count() == 0)
  }

  test("salted aggregation equals the direct groupBy") {
    val salted = Events.saltedSum(events, "user_id",
      col("value").cast("decimal(18,3)"), 8)
    val direct = events.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,3)")).cast("double").as("total_value"),
        count(lit(1)).as("n_events"))
    assert(salted.except(direct).count() == 0)
    assert(direct.except(salted).count() == 0)
  }

  test("json prop aggregation counts every event") {
    val r = Events.jsonPropAgg(events, "$.k")
    assert(r.agg(sum("n")).head.getLong(0) == events.count())
  }

  test("salted join equals the plain join, salt column dropped") {
    val dim = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_mktsegment")
    val salted = Events.saltedJoin(events, dim, "user_id", "c_custkey", 8)
    val plain = events.join(dim, col("user_id") === col("c_custkey"))
    assert(!salted.columns.contains("_salt"))
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("salted join resolves same-named keys through their own side") {
    // conformed-dimension shape: both sides carry `user_id`; keys must
    // resolve side-qualified or the join condition is ambiguous
    val dim = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val salted = Events.saltedJoin(events, dim, "user_id", "user_id", 8)
      .select(events("user_id"), col("c_mktsegment"))
    val plain = events.join(dim, events("user_id") === dim("user_id"))
      .select(events("user_id"), col("c_mktsegment"))
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("first-touch attribution: conversions credit the first event") {
    import spark.implicits._
    val ev = Seq(
      // user 1: ad first, then purchase — credit "ad"
      (1L, 1L, "ad", 10.0), (2L, 1L, "purchase", 5.0),
      // user 2: email first, two purchases — both credit "email"
      (3L, 2L, "email", 0.0), (4L, 2L, "purchase", 7.0),
      (5L, 2L, "purchase", 3.0),
      // user 3: purchase IS the first touch — credits itself
      (6L, 3L, "purchase", 2.0),
      // user 4: never converts — absent from output
      (7L, 4L, "ad", 0.0)
    ).toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
    val got = Events.firstTouchAttribution(ev, "user_id", "event_type",
        "ts", "event_id", "purchase", "value")
      .orderBy("first_touch")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("ad", 1L, 1L, 5.0), ("email", 1L, 2L, 10.0),
      ("purchase", 1L, 1L, 2.0)))
  }
}
