package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // see Checkpoints.sweep: weak-ref cleaner starvation on big heaps
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated name filter (dev iteration only — the
    // driver always runs the full surface).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val fingerprints = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Per-column fingerprint of the written result (crc32-sum over
        // the string form + non-null count): when a driver-side hash
        // mismatch appears, this names the diverging COLUMN instead of
        // leaving a whole-row mystery (r7 q172-q174 lesson).
        fingerprints(name) = columnFingerprints(spark, s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // each result is on disk now; drop its leftover session state
      Checkpoints.sweep(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val fpJson = fingerprints
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/fingerprints.json"), fpJson)
    spark.stop()
  }

  /** One query result's per-column fingerprint as a JSON object string:
    * `{"col": [crc32_sum, non_null_count], ...}`. crc32 over the
    * string-cast value is cheap, order-insensitive (sum), and equally
    * computable in DuckDB for manual divergence triage. */
  private def columnFingerprints(spark: SparkSession,
                                 path: String): String = {
    import org.apache.spark.sql.functions._
    try {
      val df = spark.read.parquet(path)
      val aggs = df.columns.flatMap { c =>
        Seq(sum(crc32(col(c).cast("string").cast("binary"))),
          count(col(c)))
      }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      df.columns.zipWithIndex.map { case (c, i) =>
        val crc = if (r.isNullAt(2 * i)) 0L else r.getLong(2 * i)
        s""""$c": [$crc, ${r.getLong(2 * i + 1)}]"""
      }.mkString("{", ", ", "}")
    } catch { case e: Throwable =>
      s"""{"_error": "${e.getClass.getSimpleName}"}"""
    }
  }
}
