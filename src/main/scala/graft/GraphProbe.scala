package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement main: phase timing of the q53 shape — LSH candidate
  * pairs, then connected components. Not part of the library surface;
  * the numbers it produced are recorded in DESIGN.md §5 (the union
  * double-evaluation finding: symmetrizing an expensive edge list with
  * `fwd.union(reversed)` evaluated the LSH subtree twice until
  * [[graft.operators.Graph.connectedComponents]] checkpointed it).
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val pairs = graft.operators.Dedup.minHashLsh(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 2, k = 24, bands = 4, rows = 6, threshold = 0.8)
    val cc = time("connectedComponents total") {
      val r = graft.operators.Graph.connectedComponents(pairs, "doc_a", "doc_b")
      r.count()
    }
    println(s"[probe] component rows=$cc")
    spark.stop()
  }
}
