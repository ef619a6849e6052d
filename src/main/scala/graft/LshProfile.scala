package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object LshProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      f; val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$name: ${ts.min}%.2fs")
    }
    val sh = Dedup.charShingles(col("text"), 5)
    val docs = df.select(col("doc_id").as("id"), sh.as("sh"))
    time("1_shingles_only") { docs.select(size(col("sh"))).agg(sum("size(sh)")).count() }
    val exploded = docs.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), Dedup.shingleBaseHash(col("s")).as("b"))
    time("2_explode_md5") { exploded.agg(sum("b")).count() }
    val k = 36
    val mins = (0 until k).map { i =>
      min((col("b") * (2 * i + 1) + (101 * i + 17)) % Dedup.MinHashPrime).as(s"m$i") }
    val sigs = exploded.groupBy("id").agg(mins.head, mins.tail: _*)
    time("3_sig_agg") { sigs.count() }
    time("4_full_q33") {
      Dedup.minHashLshWith(df, "doc_id", Dedup.charShingles(col("text"), 5),
        k = 36, bands = 4, rows = 9, threshold = 0.5).count()
    }
    spark.stop()
  }
}
