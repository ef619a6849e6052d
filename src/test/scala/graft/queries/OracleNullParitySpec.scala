package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkTestBase}
import graft.operators.Stats

/** Oracle-text parity under NULL categories. The DuckDB oracles are
  * ANSI enough to run in Spark SQL itself, which lets a spec prove the
  * ORACLE's semantics (not just the engine's) on fixtures the shipped
  * testdata doesn't exercise — here, NULL category keys, where a
  * plain-equality join would silently drop the NULL grid row on both
  * sides and pass verification while being wrong (r7 ADVICE medium). */
class OracleNullParitySpec extends SparkTestBase {

  test("q147 oracle treats a NULL category as a category (engine parity)") {
    // isolated session: suites share one SparkContext, and a temp view
    // named `documents` would shadow the real table for any suite
    // running concurrently — newSession() gets a private temp catalog
    val s = spark.newSession()
    import s.implicits._
    val docs = Seq(
      (Option("en"), "web"), (Option("en"), "web"),
      (Option.empty[String], "web"), (Option.empty[String], "book"),
      (Option("fr"), "book"), (Option("fr"), "web")
    ).toDF("lang", "source")
    docs.createOrReplaceTempView("documents")
    val oracle = s.sql(SparkEntry.oracleSql("q147_chisq_assoc"))
    val engine = Stats.chiSquare(docs, "lang", "source")
    // the NULL lang occupies a full grid row: one cell per source
    assert(oracle.filter(col("lang").isNull).count() == 2)
    assert(engine.filter(col("lang").isNull).count() == 2)
    assert(oracle.except(engine).count() == 0 &&
      engine.except(oracle).count() == 0)
  }
}
