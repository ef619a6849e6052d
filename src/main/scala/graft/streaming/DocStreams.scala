package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.operators.Dedup

/** Streaming DOCUMENT operators — the ingestion-time twins of the
  * batch curation pipeline ([[graft.operators.Dedup]]), built on the
  * same `transformWithState` pattern as
  * [[graft.streaming.EventStreams]].
  *
  * The flagship here is the NEAR-DUP GATE: the one batch pipeline
  * stage a 100 TB ingest actually wants online ("does this incoming
  * document near-duplicate anything already admitted?") — exact dedup
  * streams trivially (q62's dropDuplicates), but near-dup needs the
  * LSH bucket index to LIVE IN THE STATE STORE, keyed by band, so an
  * incoming document only ever compares against its own buckets'
  * residents, never the corpus.
  */
object DocStreams {

  /** One banded-signature row: a document's full MinHash signature,
    * keyed by ONE of its LSH band buckets (a doc yields `bands` such
    * rows — the same (id, band) index the batch pipeline computes,
    * [[Dedup.minHashLshWith]]). */
  case class BandedDoc(band: String, doc_id: Long, sig: Seq[Long])

  /** An emitted near-dup hit: `est_permille` is the integer MinHash
    * similarity estimate `1000·|agreeing positions| div k` — the
    * signature-level verdict a streaming gate can compute without
    * retaining shingle sets in state. */
  case class NearDupPair(doc_a: Long, doc_b: Long, est_permille: Long)

  /** One LSH bucket's residents: parallel id/signature lists. */
  case class BucketSigs(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** Banded MinHash signatures of a (possibly streaming) document
    * frame — stateless projections only (two explode barriers: one
    * pins the per-shingle base hashes so the k permutations read a
    * materialized array [one md5 per shingle, DESIGN §5], one fans
    * out the band keys), so it composes with `readStream` unchanged.
    * Same signature family and band construction as the batch LSH
    * ([[Dedup.minHashSignatureFromBases]] / [[Dedup.lshBands]]):
    * a doc admitted by the stream gate lands in bit-identical buckets
    * to the batch index. */
  def bandedSignatures(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, bands: Int, rows: Int): DataFrame = {
    require(k == bands * rows, s"k=$k must equal bands*rows=${bands * rows}")
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(array(transform(Dedup.wordShingles(col(textCol), 2),
          s => Dedup.shingleBaseHash(s)))).as("_b"))
      .select(col("doc_id"),
        Dedup.minHashSignatureFromBases(col("_b"), k).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(Dedup.lshBands(col("sig"), bands, rows)).as("band"))
      .select(col("band"), col("doc_id"), col("sig"))
  }

  /** Bucket-resident comparison: per band key, state holds the ids +
    * signatures admitted so far; each incoming doc (processed in
    * doc_id order within a batch, the deterministic-twin contract)
    * compares against every earlier resident and emits the pairs
    * whose signature agreement reaches `minAgree`. State per bucket
    * is bucket-sized and hard-capped at `cap` residents — the skew
    * guard for the known LSH hot-bucket pathology (boilerplate
    * documents): a full bucket admits no one and emits nothing, which
    * a production gate would surface as an overflow metric; the
    * oracle contract assumes the fixture stays under the cap. */
  private class NearDupProcessor(k: Int, minAgree: Int, cap: Int)
      extends StatefulProcessor[String, BandedDoc, NearDupPair] {
    @transient private var state: ValueState[BucketSigs] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BucketSigs]("sigs",
        Encoders.product[BucketSigs], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandedDoc],
        timerValues: TimerValues): Iterator[NearDupPair] = {
      val incoming = rows.toArray.sortBy(_.doc_id)
      val st = if (state.exists()) state.get()
               else BucketSigs(Seq.empty, Seq.empty)
      val ids = scala.collection.mutable.ArrayBuffer(st.ids: _*)
      val sigs = scala.collection.mutable.ArrayBuffer(st.sigs: _*)
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
      incoming.foreach { d =>
        // Idempotent admission: a re-delivered document (at-least-once
        // upstream, a replayed batch) is already a resident of this
        // bucket — re-admitting it would emit a bogus self-pair
        // (agree = k against its own signature) and duplicate every
        // later comparison. The membership probe is bucket-sized, the
        // same bound as the comparison loop below it.
        if (ids.length < cap && !ids.contains(d.doc_id)) {
          var i = 0
          while (i < ids.length) {
            val other = sigs(i)
            var agree = 0
            var j = 0
            while (j < k) {
              if (d.sig(j) == other(j)) agree += 1
              j += 1
            }
            if (agree >= minAgree)
              out += NearDupPair(math.min(ids(i), d.doc_id),
                math.max(ids(i), d.doc_id), 1000L * agree / k)
            i += 1
          }
          ids += d.doc_id
          sigs += d.sig
        }
      }
      state.update(BucketSigs(ids.toSeq, sigs.toSeq))
      out.iterator
    }
  }

  /** STREAMING NEAR-DUP GATE: banded rows in, qualifying
    * (doc_a, doc_b, est_permille) pairs out, doc_a < doc_b. A pair
    * sharing several buckets emits once per shared bucket with the
    * IDENTICAL estimate (it is computed from the full signatures),
    * so consumers dedup with a plain `distinct()` — after which the
    * emitted set equals the batch LSH candidate set filtered to
    * `agreement ≥ minAgree`, which is exactly what the oracle
    * computes. */
  def nearDupGate(spark: SparkSession, banded: DataFrame, k: Int,
                  minAgree: Int, cap: Int = 65536): Dataset[NearDupPair] = {
    import spark.implicits._
    banded.as[BandedDoc]
      .groupByKey(_.band)
      .transformWithState(new NearDupProcessor(k, minAgree, cap),
        TimeMode.None(), OutputMode.Append())
  }
}
