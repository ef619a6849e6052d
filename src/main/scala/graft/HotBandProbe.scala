package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DocStreams
import graft.streaming.DocStreams.BandedDoc

/** Probe (VERDICT r15 #3): what does a DELIBERATELY HOT band cost the
  * near-dup gate at the DEFAULT cap (65536)? `foldBucket`'s compare
  * loop is single-threaded per band key — the cap bounds it, and the
  * `compared` metric makes it observable, but nobody had MEASURED the
  * wall-clock of a hot band well above the q268/q269 fixtures'
  * cap=2. Two costs, measured separately:
  *
  *  - SEED cost: H residents arriving in one batch into one bucket is
  *    H·(H−1)/2 signature comparisons — the worst case (production
  *    seeds through `bucketIndex` initial state, which compares
  *    nothing; this is the cold-start-from-one-batch pathology).
  *  - STEADY-STATE cost: M incoming docs against a full H-resident
  *    bucket is M·H comparisons per batch — the number that decides
  *    whether a boilerplate band stalls ingest.
  *
  * Signatures are deterministic and pairwise-disagreeing (sig[j] =
  * id·k + j), so the probe measures pure compare cost with zero
  * emissions. Results → DESIGN.md §5. */
object HotBandProbe {
  def main(args: Array[String]): Unit = {
    val hs = if (args.nonEmpty) args.map(_.toInt).toSeq
             else Seq(1000, 5000, 10000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val k = 24
    def sig(id: Long): Seq[Long] = (0 until k).map(j => id * k + j)

    println("H\tphase\tcompared\twall_ms")
    hs.foreach { h =>
      val m = DocStreams.GateMetrics(spark)
      val in = MemoryStream[BandedDoc]
      val out = DocStreams.nearDupGate(spark, in.toDF(), k,
        minAgree = 12, metrics = Some(m))
      val q = out.toDF().writeStream.format("noop")
        .outputMode("append").start()
      // phase 1: H residents into ONE band in one batch (seed cost)
      in.addData((0 until h).map(i => BandedDoc("hot", i.toLong, sig(i))))
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val seedMs = (System.nanoTime() - t0) / 1000000
      val (_, c1, _) = m.snapshot
      println(s"$h\tseed\t$c1\t$seedMs")
      // phase 2: 100 incoming docs against the full bucket (steady state)
      in.addData((0 until 100).map(i =>
        BandedDoc("hot", (h + i).toLong, sig(h + i))))
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val steadyMs = (System.nanoTime() - t1) / 1000000
      val (_, c2, _) = m.snapshot
      println(s"$h\tsteady100\t${c2 - c1}\t$steadyMs")
      q.stop()
    }
    spark.stop()
  }
}
