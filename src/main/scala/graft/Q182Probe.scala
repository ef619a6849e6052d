package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level timing for q182 (LSH recall eval): which stage of the
  * exact ground-truth pipeline is serialized/skewed? Run with
  * SPARK_GRAFT_CPUS=32 and =4 — a stage whose wall time is invariant
  * to the core count is the serialized one (VERDICT r9 item 2).
  */
object Q182Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .filter(col("doc_id") < 400)
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n) }
      println(f"[$cpus cores] $name: ${ts.map(_._1).min}%.2fs rows=${ts.head._2}")
    }
    val sigRows = Dedup.charShingleRows(df, "doc_id", "text", 5)
    val hashed = sigRows.select(col("id"),
      Dedup.shingleBaseHash(col("s")).as("h")).distinct()
    time("a_hashed_distinct") { hashed.count() }
    val raw = hashed.as("x").hint("shuffle_hash")
      .join(hashed.as("y").hint("shuffle_hash"),
        col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
    time("b_raw_pairs") { raw.count() }
    val cand = raw.distinct()
    time("c_cand_distinct") { cand.count() }
    time("d_verified") {
      Dedup.sharedShingleJaccardPairs(
        Dedup.charShingleRows(df, "doc_id", "text", 5), 0.5).count()
    }
    time("e_lsh_cand") {
      Dedup.minHashCandidatesOf(sigRows.select(col("id"), col("s")),
        36, 4, 9).count()
    }
    time("f_full_eval") {
      Dedup.lshCandidateEval(
        Dedup.charShingleRows(df, "doc_id", "text", 5),
        k = 36, bands = 4, rows = 9, threshold = 0.5).count()
    }
    spark.stop()
  }
}
