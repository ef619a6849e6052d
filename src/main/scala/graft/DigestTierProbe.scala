package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, TextAnalysis}

/** Measurement main for the pluggable digest tier (VERDICT r13 item 4):
  * times the q39 fingerprint and q33 char-gram LSH shapes under the
  * checked md5 default vs the production xxhash64 tier at sf0.1,
  * through the same plan-preserving noop sink as Bench. Numbers land in
  * DESIGN.md §5; the correctness contract is DigestTierSpec. */
object DigestTierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      consume(f) // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); consume(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${ts.min}%.2fs")
      Checkpoints.sweep(spark)
    }
    if (sys.env.contains("SPARK_GRAFT_TIER_DEBUG31")) {
      // candidate-count check for the q31 (word-2-shingle) shape: when
      // a tier swap moves THIS benchmark, rule the banding lottery in
      // or out before crediting/blaming the hash (DESIGN §5 lesson)
      for (tier <- Seq[Dedup.DigestTier](Dedup.Md5Tier, Dedup.XxTier)) {
        val tn = if (tier == Dedup.Md5Tier) "md5" else "xx"
        val rows = docs.select(col("doc_id").as("id"),
          explode(Dedup.wordShingleMultiset(col("text"), 2)).as("s"))
        val cand = Dedup.minHashCandidatesOf(rows, 24, 4, 6, tier)
        println(s"q31_candidates/$tn: ${cand.count()}")
      }
      spark.stop(); return
    }
    if (sys.env.contains("SPARK_GRAFT_TIER_DEBUG")) {
      for (tier <- Seq[Dedup.DigestTier](Dedup.Md5Tier, Dedup.XxTier)) {
        val tn = if (tier == Dedup.Md5Tier) "md5" else "xx"
        val exploded = Dedup.charShingleRows(docs, "doc_id", "text", 5)
          .select(col("id"), Dedup.shingleBaseHash(col("s"), tier).as("b"))
        time(s"hash_stage/$tn") { exploded.groupBy("id").agg(sum("b")) }
        val k = 36
        val mins = (0 until k).map { i =>
          min((col("b") * (2 * i + 1) + (101 * i + 17)) % Dedup.MinHashPrime)
            .as(s"m$i") }
        time(s"sig_stage/$tn") { exploded.groupBy("id").agg(mins.head, mins.tail: _*) }
        val stats = exploded.agg(
          countDistinct("b").as("nd"),
          min("b").as("mn"), max("b").as("mx")).collect()(0)
        println(s"b_stats/$tn: distinct=${stats.getLong(0)} " +
          s"min=${stats.getLong(1)} max=${stats.getLong(2)}")
        val sig0 = exploded.groupBy("id")
          .agg(min((col("b") * 1 + 17) % Dedup.MinHashPrime).as("s0"))
          .groupBy("s0").count().orderBy(col("count").desc).limit(3)
          .collect().map(r => s"${r.getLong(0)}x${r.getLong(1)}").mkString(",")
        println(s"sig0_top/$tn: $sig0")
        val cand = Dedup.minHashCandidatesOf(
          Dedup.charShingleRows(docs, "doc_id", "text", 5), 36, 4, 9, tier)
        println(s"n_candidates/$tn: ${cand.count()}")
      }
      spark.stop(); return
    }
    for (tier <- Seq[Dedup.DigestTier](Dedup.Md5Tier, Dedup.XxTier)) {
      val tn = if (tier == Dedup.Md5Tier) "md5" else "xx"
      time(s"q39_fingerprint/$tn") {
        TextAnalysis.fingerprint(docs, "doc_id", "text", tier)
      }
      // the q31 shape (word-2-shingle LSH, the shared-artifact params)
      // completes the family sweep (VERDICT r14 #7)
      time(s"q31_word_lsh/$tn") {
        Dedup.minHashLsh(docs, "doc_id", "text", shingleN = 2, k = 24,
          bands = 4, rows = 6, threshold = 0.8, tier = tier)
      }
      time(s"q33_ngram_lsh/$tn") {
        Dedup.minHashLshWith(docs, "doc_id",
          Dedup.charShingles(col("text"), 5),
          k = 36, bands = 4, rows = 9, threshold = 0.5,
          sigRows = Dedup.charShingleRows(docs, "doc_id", "text", 5),
          tier = tier)
      }
      time(s"q103_bloom_gate/$tn") {
        graft.operators.Curation.bloomContamination(docs, "doc_id",
          "text", col("doc_id") % 50 === 0, bits = 65536, kHash = 4,
          tier = tier)
      }
    }
    spark.stop()
  }
}
