package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for semanticDedup's pair-space shapes (round 7):
  * times the all-pairs vs sub-banded within-cluster candidate paths at
  * sf0.1 so the banding's constant-factor cost (vs its asymptotic win)
  * is a number, not a guess. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.SemDedupProbe"
  * Findings feed DESIGN.md §5; not part of the shipped query surface.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Checkpoints.sweep(spark)
      r
    }

    val emb = Tables.load(spark, sfDir, "embeddings")
    // train once outside the timed region (both variants share it)
    val cents = operators.KMeans.lloyd(emb, "vec_id", "embedding", 8, 2)
      .collect()
    import spark.implicits._
    def centDf = cents.toSeq.map(r => (r.getLong(0), r.getSeq[Long](1)))
      .toDF("cluster", "centroid").coalesce(1)

    time("kmeans-train (untimed ref)") { () }
    for (round <- 1 to 2) {
      time(s"all-pairs r$round") {
        operators.Dedup.semanticDedup(emb, centDf, "vec_id", "embedding",
          0.4).count()
      }
      time(s"sub-banded r$round") {
        operators.Dedup.semanticDedup(emb, centDf, "vec_id", "embedding",
          0.4, subPlanes = 16, subBands = 4, dim = 64).count()
      }
    }
    spark.stop()
  }
}
