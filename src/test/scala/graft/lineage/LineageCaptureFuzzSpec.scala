package graft.lineage

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** FUZZ for the CAPTURE tier (r19, VERDICT r18 #6): the store model
  * spec randomizes STORE ops; this randomizes the LISTENER path — the
  * sink shapes automatic capture must name and claim correctly
  * (saveAsTable, insertInto, raw path writes, SQL CTAS, SQL INSERT),
  * interleaved with actions (must capture nothing) and writes UNDER
  * THE STORE DIR itself (the self-observation surface — must be
  * filtered, or the observer loops). Each op appends its expectation
  * to a self-computed oracle; after the sequence the store must hold
  * EXACTLY one data run per expected sink, no swallowed errors, no
  * dangling claims. Runs once with the store in a temp dir and once
  * with the store UNDER the warehouse dir — the ADVICE r18 #1
  * regression surface, where catalog-shaped sinks must resolve to
  * warehouse paths before the self check. Deterministic seeds; a
  * mismatch names the op sequence. */
class LineageCaptureFuzzSpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.Tables.registerAll(spark, sfDir)
  }

  private def eventually(what: String)(pred: => Boolean): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!pred && System.nanoTime() < deadline) Thread.sleep(50)
    assert(pred, s"listener did not deliver within 30s: $what")
  }

  /** Expected sink of one captured write: an exact catalog name, or a
    * path whose bracketed capture form must contain the directory. */
  private sealed trait Want {
    def matches(sink: String): Boolean
  }
  private case class Table(name: String) extends Want {
    def matches(sink: String): Boolean = sink == name
  }
  private case class PathSink(dir: String) extends Want {
    def matches(sink: String): Boolean =
      sink.startsWith("file.[") && sink.contains(dir)
  }

  for {
    seed <- Seq(20260816L, 99L)
    underWarehouse <- Seq(false, true)
  } test("fuzzed write sequences capture exactly the non-self sinks " +
      s"(seed $seed, storeUnderWarehouse=$underWarehouse)") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val store =
      if (underWarehouse) {
        val d = new java.io.File(wh, s"fz_store_${seed}")
        org.apache.commons.io.FileUtils.deleteDirectory(d)
        d.getAbsolutePath
      } else java.nio.file.Files
        .createTempDirectory("graft_fuzz_store").toString
    val rnd = new scala.util.Random(
      seed * (if (underWarehouse) 31 else 1))
    val created = scala.collection.mutable.Buffer[String]()
    val tmpDirs = scala.collection.mutable.Buffer[String]()
    val wants = scala.collection.mutable.Buffer[Want]()
    val ops = scala.collection.mutable.Buffer[String]()
    val src = spark.table("region")
      .select(col("r_regionkey").as("k"), col("r_name").as("v"))
    def freshTable(i: Int): String = {
      val t = s"fz_${seed}_${if (underWarehouse) "w" else "t"}_$i"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(wh, t))
      t
    }
    val l = LineageCapture.attachStore(spark, store)
    try {
      for (i <- 1 to 10) {
        rnd.nextInt(12) match {
          case 0 | 1 => // DataFrame saveAsTable (managed CTAS)
            val t = freshTable(i)
            src.write.saveAsTable(t)
            created += t; wants += Table(s"default.$t")
            ops += s"saveAsTable($t)"
          case 2 | 3 => // insertInto an existing table (or create one)
            if (created.isEmpty) {
              val t = freshTable(i)
              src.write.saveAsTable(t)
              created += t; wants += Table(s"default.$t")
              ops += s"saveAsTable($t)"
            } else {
              val t = created(rnd.nextInt(created.size))
              src.filter(col("k") < 3).write.insertInto(t)
              wants += Table(s"default.$t")
              ops += s"insertInto($t)"
            }
          case 4 | 5 => // raw path write
            val d = java.nio.file.Files
              .createTempDirectory(s"graft_fuzz_out$i").toString
            tmpDirs += d
            src.write.mode("overwrite").parquet(d)
            wants += PathSink(d)
            ops += s"pathWrite($d)"
          case 6 => // SQL CTAS
            val t = freshTable(i)
            spark.sql(s"CREATE TABLE $t USING parquet AS " +
              "SELECT r_regionkey AS k, r_name AS v FROM region")
            created += t; wants += Table(s"default.$t")
            ops += s"sqlCtas($t)"
          case 7 => // SQL INSERT
            if (created.isEmpty) {
              val t = freshTable(i)
              src.write.saveAsTable(t)
              created += t; wants += Table(s"default.$t")
              ops += s"saveAsTable($t)"
            } else {
              val t = created(rnd.nextInt(created.size))
              spark.sql(s"INSERT INTO $t " +
                "SELECT r_regionkey + 100, r_name FROM region")
              wants += Table(s"default.$t")
              ops += s"sqlInsert($t)"
            }
          case 8 | 9 => // write UNDER the store dir: self, never captured
            src.write.mode("overwrite").parquet(s"$store/user_out_$i")
            ops += "selfWrite"
          case _ => // actions capture nothing
            src.count(); src.collect()
            ops += "action"
        }
      }
      val seq = ops.mkString(" -> ")
      def dataRuns() = LineageStore.read(spark, store)
        .select("run_id").distinct().count()
      eventually(s"$seq: want ${wants.size} data runs") {
        dataRuns() == wants.size.toLong }
      Thread.sleep(400) // stragglers (a self-capture would arrive late)
      assert(dataRuns() == wants.size.toLong, seq)
      // no dangling claims, no swallowed failures
      assert(LineageStore.runs(spark, store).size == wants.size, seq)
      assert(LineageCapture.captureErrors(spark, store) == 0, seq)
      // every captured run's sink checks off exactly one expectation
      val sinks = LineageStore.snapshot(spark, store)
        .select("run_id", "table_name").distinct().collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        .map(_._2)
      val unmatched = scala.collection.mutable.Buffer(wants.toSeq: _*)
      sinks.foreach { s =>
        val hit = unmatched.indexWhere(_.matches(s))
        assert(hit >= 0, s"captured sink $s matches no expectation " +
          s"(remaining: $unmatched) in $seq")
        unmatched.remove(hit)
      }
      assert(unmatched.isEmpty,
        s"expected sinks never captured: $unmatched in $seq")
    } finally {
      LineageCapture.detach(spark, l)
      created.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      (store +: tmpDirs.toSeq).foreach(d =>
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(d)))
    }
  }
}
