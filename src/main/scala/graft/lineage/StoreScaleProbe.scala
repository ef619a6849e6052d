package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for [[LineageStore]] at warehouse size: R runs,
  * each re-parsing half of a 2000-statement population with 10 edges
  * per statement (~R×10k edge rows), then time the store's read-side
  * operations — snapshot, asOf time travel, cross-run diff,
  * superseded-run detection, vacuum. Results in DESIGN.md §1. Args:
  * [runs] [statements] [edgesPerStmt]. */
object StoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val nRuns = args.headOption.map(_.toInt).getOrElse(24)
    val nStmt = args.lift(1).map(_.toInt).getOrElse(2000)
    val perStmt = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def runEdges(r: Long): DataFrame =
      spark.range(nStmt).filter((col("id") + r) % 2 === 0)
        .select((col("id") + 1).cast("int").as("stmt"))
        .withColumn("k", explode(sequence(lit(0), lit(perStmt - 1))))
        .select(col("stmt"), lit("INSERT").as("operation"),
          concat(lit("db.sink_"), col("stmt")).as("table_name"),
          concat(lit("db.sink_"), col("stmt"), lit(".c"), col("k"))
            .as("col_name"),
          concat(lit("c"), col("k")).as("to_name"),
          concat(lit("db.src_"), col("stmt"), lit(".x"), col("k"))
            .as("from_name"),
          lit("").as("conditions"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_store_probe").toString
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    try {
      t(s"append x$nRuns (~${nRuns * nStmt / 2 * perStmt} rows)") {
        (1L to nRuns).foreach(r =>
          LineageStore.append(spark, dir, r, runEdges(r)))
      }
      val snapN = t("snapshot count") {
        LineageStore.snapshot(spark, dir).count() }
      val asOfN = t(s"snapshot asOf=${nRuns / 2} count") {
        LineageStore.snapshot(spark, dir, Some(nRuns / 2L)).count() }
      val diffN = t("diff(last-1, last) count") {
        LineageStore.diff(spark, dir, nRuns - 1L, nRuns.toLong).count() }
      val dead = t("supersededRuns") {
        LineageStore.supersededRuns(spark, dir) }
      val gone = t("vacuum") { LineageStore.vacuum(spark, dir) }
      val snapAfter = t("snapshot count after vacuum") {
        LineageStore.snapshot(spark, dir).count() }
      println(s"snapshot=$snapN asOf=$asOfN diff=$diffN " +
        s"superseded=${dead.size} vacuumed=${gone.size} " +
        s"snapshotAfter=$snapAfter invariant=${snapN == snapAfter}")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
      spark.stop()
    }
  }
}
