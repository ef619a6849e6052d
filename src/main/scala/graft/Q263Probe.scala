package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage cost breakdown of the bootstrapped near-dup gate (q263):
  * where do its ~13 s at sf0.1 go — corpus banding, index grouping,
  * initial-state seeding, or the streaming run itself? */
object Q263Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val corpus = spark.read.parquet(path).filter(col("doc_id") % 5 =!= 0)
    val banded = graft.streaming.DocStreams.bandedSignatures(
      corpus, "doc_id", "text", 24, 4, 6)
    time("1_corpus_banding_count") { banded.write.format("noop").mode("overwrite").save() }
    val init = time("2_bucket_index_build") {
      graft.streaming.DocStreams.bucketIndex(spark, banded)
    }
    time("3_stream_banding_only") {
      val newDocs = spark.read.parquet(path).filter(col("doc_id") % 5 === 0)
      graft.streaming.DocStreams.bandedSignatures(
        newDocs, "doc_id", "text", 24, 4, 6)
        .write.format("noop").mode("overwrite").save()
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    for (parts <- Seq("1", "4", "8", "32")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"4_streaming_run_p$parts") {
        val newDocs = spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .filter(col("doc_id") % 5 === 0)
        val b = graft.streaming.DocStreams.bandedSignatures(
          newDocs, "doc_id", "text", 24, 4, 6)
        val out = graft.streaming.DocStreams.nearDupGateBooted(
          spark, b, init, 24, 12)
        val q = out.toDF().writeStream.format("memory").queryName("p263")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        println("rows: " + spark.table("p263").count())
        spark.catalog.dropTempView("p263")
      }
    }
    spark.stop()
  }
}
