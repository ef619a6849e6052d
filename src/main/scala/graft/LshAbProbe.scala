package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main: A/B the LSH band self-join — lazy double
  * reference (AQE stage-reuse candidate) vs an explicit checkpoint of
  * the banded signatures. Results recorded in DESIGN.md §5. */
object LshAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"),
        Dedup.wordShingles(col("text"), 2).as("sh"))

    def sigs = {
      val mins = (0 until 24).map { i =>
        min((col("b") * (2 * i + 1) + (101 * i + 17)) % Dedup.MinHashPrime).as(s"m$i")
      }
      docs.select(col("id"), explode(col("sh")).as("s"))
        .select(col("id"), Dedup.shingleBaseHash(col("s")).as("b"))
        .groupBy("id").agg(mins.head, mins.tail: _*)
        .select(col("id"), array((0 until 24).map(i => col(s"m$i")): _*).as("sig"))
    }
    def banded = sigs.select(col("id"),
      explode(Dedup.lshBands(col("sig"), 4, 6)).as("band"))

    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    def candCount(b: org.apache.spark.sql.DataFrame): Long =
      b.as("x").hint("shuffle_hash")
        .join(b.as("y").hint("shuffle_hash"),
          col("x.band") === col("y.band") && col("x.id") < col("y.id"))
        .select(col("x.id"), col("y.id")).distinct().count()

    // warm-up
    candCount(banded)
    time("lazy double-ref (warm)") { candCount(banded) }
    time("lazy double-ref (warm)") { candCount(banded) }
    time("checkpointed (warm)") { candCount(banded.localCheckpoint()) }
    time("checkpointed (warm)") { candCount(banded.localCheckpoint()) }

    // char-5-gram (q33) phase decomposition
    val cdocs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"),
        graft.operators.Dedup.charShingleMultiset(col("text"), 5).as("ss"))
    Seq.fill(2) {
      time("char multiset arrays") { cdocs.select(sum(size(col("ss")))).head() }
      time("char + explode") {
        cdocs.select(col("id"), explode(col("ss")).as("s")).count()
      }
      time("char + md5") {
        cdocs.select(col("id"), explode(col("ss")).as("s"))
          .select(sum(Dedup.shingleBaseHash(col("s")))).head()
      }
      time("char + 36 min-aggs") {
        val mins = (0 until 36).map { i =>
          min((col("b") * (2 * i + 1) + (101 * i + 17)) % Dedup.MinHashPrime).as(s"m$i")
        }
        cdocs.select(col("id"), explode(col("ss")).as("s"))
          .select(col("id"), Dedup.shingleBaseHash(col("s")).as("b"))
          .groupBy("id").agg(mins.head, mins.tail: _*).count()
      }
      time("char distinct verify arrays") {
        Tables.load(spark, sfDir, "documents")
          .select(graft.operators.Dedup.charShingles(col("text"), 5).as("sh"))
          .select(sum(size(col("sh")))).head()
      }
    }

    // native md5-prefix expression vs conv(substring(md5)) chain
    graft.functions.Md5Prefix64.register(spark)
    val cgrams = graft.operators.Dedup.charShingleRows(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text", 5)
    Seq.fill(2) {
      time("conv-chain base hash") {
        cgrams.select(sum(Dedup.shingleBaseHash(col("s")))).head()
      }
      time("native Md5Prefix64") {
        cgrams.select(sum(
          call_function(graft.functions.Md5Prefix64.name, col("s"))
            % Dedup.MinHashPrime)).head()
      }
    }

    // position-explode char grams: no array materialization at all
    val ctext = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    Seq.fill(2) {
      time("char posexplode + md5") {
        ctext
          .select(col("id"), col("text"),
            explode(sequence(lit(1), greatest(length(col("text")) - 4, lit(1))))
              .as("p"))
          .select(col("id"),
            Dedup.shingleBaseHash(col("text").substr(col("p"), lit(5))).as("b"))
          .select(sum(col("b"))).head()
      }
    }

    // alternative shingle constructions (signature path only)
    val words = split(col("text"), " ")
    val zipped = zip_with(words, slice(words, 2, 1 << 30),
      (a, b) => concat(a, lit(" "), b))
    val guarded = when(size(words) < 2,
      array(concat_ws(" ", words))).otherwise(zipped)
    val docsZip = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), guarded.as("sh"))
    Seq.fill(2) {
      time("zipwith nondistinct arrays") {
        docsZip.select(sum(size(col("sh")))).head()
      }
      time("zipwith + explode + md5") {
        docsZip.select(col("id"), explode(col("sh")).as("s"))
          .select(sum(Dedup.shingleBaseHash(col("s")))).head()
      }
    }

    // phase decomposition (each warm, includes upstream)
    val exploded = docs.select(col("id"), explode(col("sh")).as("s"))
    val hashed = exploded.select(col("id"), Dedup.shingleBaseHash(col("s")).as("b"))
    Seq.fill(2) {
      time("shingle arrays only") { docs.select(sum(size(col("sh")))).head() }
      time("+ explode") { exploded.count() }
      time("+ md5 base hash") { hashed.select(sum(col("b"))).head() }
      time("+ k-min agg (sigs)") { sigs.count() }
      time("+ band keys") { banded.count() }
    }
    spark.stop()
  }
}
