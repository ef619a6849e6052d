package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Deterministic split contract: total (every row labelled), stable
  * (identical across runs — it's a pure hash), fraction-faithful at
  * corpus size, and validated up front.
  */
class HashSplitSpec extends SparkTestBase {

  private val splits = Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1))

  test("every row gets a label and fractions are approximately honored") {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = docs.count().toDouble
    val counts = Curation.hashSplit(docs, "doc_id", splits)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n.toLong)
    // md5 is uniform; at 50 docs allow a generous binomial tolerance
    assert(counts("train") / n > 0.6 && counts("train") / n < 0.95)
    assert(counts.keySet == Set("train", "valid", "test") ||
      counts.keySet.subsetOf(Set("train", "valid", "test")))
  }

  test("assignment is a pure function of the id") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = Curation.hashSplit(docs, "doc_id", splits)
      .select("doc_id", "split").collect().toSet
    val b = Curation.hashSplit(docs.repartition(7), "doc_id", splits)
      .select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("fractions that don't sum to 1 are rejected") {
    val docs = Tables.load(spark, sfDir, "documents")
    intercept[IllegalArgumentException] {
      Curation.hashSplit(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("stratified sample: per-stratum rates, partitioning-independent") {
    val docs = Tables.load(spark, sfDir, "documents")
    val rates = Seq("en" -> 0.5, "fr" -> 0.25)
    val s = Curation.stratifiedSample(docs, "doc_id", "lang", rates, 0.125)
    val kept = s.select("doc_id").collect().toSet
    // pure hash: identical under a different partitioning
    val kept2 = Curation
      .stratifiedSample(docs.repartition(7), "doc_id", "lang", rates, 0.125)
      .select("doc_id").collect().toSet
    assert(kept == kept2)
    // a row's fate depends only on (id, own stratum's rate): raising
    // another stratum's rate never evicts previously-kept rows
    val kept3 = Curation
      .stratifiedSample(docs, "doc_id", "lang", Seq("en" -> 0.5, "fr" -> 0.9), 0.125)
      .select("doc_id", "lang").collect()
    val keptFr = kept3.filter(_.getString(1) != "en").map(_.getLong(0)).toSet
    val origFr = s.filter(col("lang") =!= "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(origFr.subsetOf(keptFr ++ kept3.map(_.getLong(0))))
    // per-stratum rate sanity on the en stratum (uniform md5)
    val nEn = docs.filter(col("lang") === "en").count().toDouble
    if (nEn >= 20) {
      val kEn = s.filter(col("lang") === "en").count().toDouble
      assert(kEn / nEn > 0.25 && kEn / nEn < 0.75)
    }
    // out-of-range rates rejected
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(docs, "doc_id", "lang", Seq("en" -> 1.5), 0.1)
    }
  }

  test("classBalance equals the naive per-class rank cap") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    val cap = 37 // odd cap so the cutoff bucket is genuinely straddled
    val got = Curation.classBalance(docs, "source", "doc_id", cap)
    val want = docs.selectExpr("*",
      "row_number() OVER (PARTITION BY source " +
        "ORDER BY substring(md5(CAST(doc_id AS STRING)), 1, 8), doc_id) AS rn")
      .filter(col("rn") <= cap).drop("rn")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // per-class sizes: min(cap, class size)
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (s, n) => assert(kept(s) == math.min(cap.toLong, n)) }
  }

  test("classBalance treats a NULL class as an ordinary partition") {
    import spark.implicits._
    // scraped metadata commonly has NULL sources; the histogram join
    // must be null-safe or the whole NULL class silently vanishes
    val rows: Seq[(Long, Option[String])] =
      (0L until 50L).map(i => (i, if (i % 5 == 0) None else Some(s"s${i % 3}")))
    val docs = rows.toDF("doc_id", "source")
    val cap = 3
    val got = Curation.classBalance(docs, "source", "doc_id", cap)
    val want = docs.selectExpr("*",
      "row_number() OVER (PARTITION BY source " +
        "ORDER BY substring(md5(CAST(doc_id AS STRING)), 1, 8), doc_id) AS rn")
      .filter(col("rn") <= cap).drop("rn")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    assert(got.filter(col("source").isNull).count() == cap)
  }

  test("classBalance keeps NULL-id rows (null-safe bucket key)") {
    import spark.implicits._
    // md5(NULL) is NULL, so a NULL id lands in a NULL hash bucket; the
    // histogram join must be null-safe on the BUCKET too or those rows
    // silently drop — while the naive rank they reproduce keeps them
    // (NULLS FIRST in the hash order).
    val rows: Seq[(Option[Long], String)] =
      (0L until 20L).map(i => (Some(i): Option[Long], s"s${i % 2}")) ++
        Seq((None, "s0"), (None, "s1"))
    val docs = rows.toDF("doc_id", "source")
    val cap = 5
    val got = Curation.classBalance(docs, "source", "doc_id", cap)
    val want = docs.selectExpr("*",
      "row_number() OVER (PARTITION BY source " +
        "ORDER BY substring(md5(CAST(doc_id AS STRING)), 1, 8), doc_id) AS rn")
      .filter(col("rn") <= cap).drop("rn")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // the NULL-id rows rank first (NULL hash) and are kept
    assert(got.filter(col("doc_id").isNull).count() == 2)
  }

  test("classBalance passes small classes through whole") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source")
    val total = docs.count()
    assert(Curation.classBalance(docs, "source", "doc_id",
      cap = total.toInt + 1).count() == total)
  }

  test("budgetFill equals the naive cumulative-prefix window") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    val budget = 900L
    val got = Curation.budgetFill(docs, "source", "doc_id", "n_chars", budget)
    val want = docs.selectExpr("*",
      "COALESCE(sum(n_chars) OVER (PARTITION BY source " +
        "ORDER BY substring(md5(CAST(doc_id AS STRING)), 1, 8), doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb")
      .filter(col("cb") < budget).drop("cb")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // fill-until-reached: each class's kept weight covers the budget
    // (or the whole class), because the crossing row is kept
    val kept = got.groupBy("source").agg(sum("n_chars").as("kw"))
    val tot = docs.groupBy("source").agg(sum("n_chars").as("tw"))
      .withColumnRenamed("source", "_s")
    kept.join(tot, col("source") === col("_s")).collect().foreach { r =>
      assert(r.getAs[Long]("kw") >= math.min(budget, r.getAs[Long]("tw")))
    }
  }

  test("budgetFill: NULL class is a class; oversize budget keeps everything") {
    import spark.implicits._
    val rows: Seq[(Long, Option[String], Long)] =
      (0L until 40L).map(i =>
        (i, if (i % 4 == 0) None else Some(s"s${i % 3}"), 10L + i % 5))
    val df = rows.toDF("doc_id", "source", "w")
    val got = Curation.budgetFill(df, "source", "doc_id", "w", 50L)
    val want = df.selectExpr("*",
      "COALESCE(sum(w) OVER (PARTITION BY source " +
        "ORDER BY substring(md5(CAST(doc_id AS STRING)), 1, 8), doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb")
      .filter(col("cb") < 50L).drop("cb")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    assert(got.filter(col("source").isNull).count() > 0)
    assert(Curation.budgetFill(df, "source", "doc_id", "w", 100000L)
      .count() == rows.size)
  }

  test("ppsSample: deterministic, weight-monotone, saturates at p=1") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i, 1L + i % 100))
    val df = rows.toDF("doc_id", "w")
    val k = 50L
    val got = Curation.ppsSample(df, "doc_id", "w", k)
    // deterministic under repartitioning (pure function of id + W)
    val again = Curation.ppsSample(df.repartition(7), "doc_id", "w", k)
    assert(got.collect().map(_.getLong(0)).toSet ==
      again.collect().map(_.getLong(0)).toSet)
    // expected size ≈ k (md5 uniformity at n=1000 gives a loose band)
    val n = got.count()
    assert(n > k / 2 && n < k * 2, s"sample size $n far from target $k")
    // a row with w·k ≥ W is kept with certainty: every h < 2^16 passes
    val W = rows.map(_._2).sum
    val heavy = df.withColumn("w",
      when(col("doc_id") === 999L, lit(W)).otherwise(col("w")))
    assert(Curation.ppsSample(heavy, "doc_id", "w", k)
      .filter(col("doc_id") === 999L).count() == 1)
    // zero-weight rows are never kept
    val zeroed = df.withColumn("w",
      when(col("doc_id") < 990L, lit(0L)).otherwise(col("w")))
    assert(Curation.ppsSample(zeroed, "doc_id", "w", k)
      .filter(col("doc_id") < 990L).count() == 0)
  }

  test("sqrtTemperatureSample matches the exact isqrt threshold math") {
    // skewed domains: 900 'head' rows, 100 'tail' rows
    val df = spark.range(1000).select(col("id").as("doc_id"),
      when(col("id") < 900L, "head").otherwise("tail").as("dom"))
    val budget = 200L
    val kept = Curation.sqrtTemperatureSample(df, "dom", "doc_id", budget)
    // recompute thresholds by hand: s=isqrt(n), thr=floor(2^16*B*s/(S*n))
    val sHead = math.sqrt(900).toLong; val sTail = math.sqrt(100).toLong
    val s = sHead + sTail
    def thr(sd: Long, nd: Long) =
      math.min(65536L, 65536L * budget * sd / (s * nd))
    val naive = df.withColumn("_h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long"))
      .filter((col("dom") === "head" && col("_h") < thr(sHead, 900)) ||
        (col("dom") === "tail" && col("_h") < thr(sTail, 100)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == naive)
    // α=1/2 semantics: the tail domain keeps a HIGHER fraction than
    // the head (temperature flattens, never inverts)
    val byDom = kept.groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("head").toDouble / 900 < byDom("tail").toDouble / 100)
    assert(byDom("head") > byDom("tail")) // ...but order is preserved
    // NULL domains are dropped AND excluded from the share denominator
    // (r8 review): adding NULL rows must not change what's kept
    val withNull = df.union(spark.range(5000, 5400)
      .select(col("id").as("doc_id"), lit(null).cast("string").as("dom")))
    val keptN = Curation.sqrtTemperatureSample(withNull, "dom", "doc_id",
      budget)
    assert(keptN.select("doc_id").collect().map(_.getLong(0)).toSet == naive)
  }
}
