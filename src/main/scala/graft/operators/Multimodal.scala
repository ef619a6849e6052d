package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (pipeline extension; builder brief):
  * image/audio/video payloads modeled as opaque `binary` columns with a
  * typed metadata struct, plus decode / feature-extract / frame-sample
  * operators.
  *
  * This container has no image/audio codecs, so the *decode step* is a
  * clearly-marked deterministic STUB ([[FakeCodec]]) — byte-derived
  * pseudo-metadata and pseudo-features. Everything Spark-side is real
  * and tested: the binary schema, partition-parallel batch decode via
  * `mapPartitions` over a typed `Dataset`, the per-batch shape, and the
  * columnar expression path used by the oracle-checked query.
  *
  * At 100 TB: payload bytes dominate row size, so operators (a) never
  * shuffle the binary column — all derivations are narrow projections;
  * (b) prune it from any plan that only reads metadata (Catalyst column
  * pruning does this for free once metadata lives in separate columns).
  */
object Multimodal {

  /** A media row: payload plus typed metadata. */
  case class MediaRecord(media_id: Long, media_type: String, bytes: Array[Byte])

  /** Decoded view — what a real codec would emit. */
  case class DecodedMedia(media_id: Long, media_type: String, n_bytes: Long,
                          width: Int, height: Int, n_frames: Int,
                          features: Array[Float])

  /** STUB codec — deterministic byte-derived fakes standing in for
    * image/audio decoding (no codec libraries in this environment).
    * Swap this object for a real codec binding in production; the Spark
    * plumbing around it is unchanged. */
  object FakeCodec {
    def width(nBytes: Long): Int = (nBytes % 64).toInt + 1
    def height(nBytes: Long): Int = ((nBytes / 64) % 64).toInt + 1
    def frames(nBytes: Long): Int = (nBytes % 7).toInt + 1

    /** 4 pseudo-features from the payload's md5, each a hex quad scaled
      * to [0, 1). */
    def features(bytes: Array[Byte]): Array[Float] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      (0 until 4).map { i =>
        java.lang.Long.parseLong(hex.substring(i * 4, i * 4 + 4), 16) / 65536.0f
      }.toArray
    }
  }

  /** Fixture media table: documents' text bytes as the opaque payload
    * (media_type round-robins image/audio/video). In production this is
    * the parquet/lance binary column straight off storage. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** Typed decode path: partition-parallel batch decode via
    * mapPartitions — the Scala analogue of a Pandas-UDF batch loop. One
    * codec instance per partition, streaming iterator (no per-partition
    * materialization). */
  def decodeTyped(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition codec setup would go here
      it.map { m =>
        val n = m.bytes.length.toLong
        DecodedMedia(m.media_id, m.media_type, n,
          FakeCodec.width(n), FakeCodec.height(n), FakeCodec.frames(n),
          FakeCodec.features(m.bytes))
      }
    }
  }

  /** Columnar decode path: same stub semantics as pure expressions
    * (codegen'd, oracle-mirrorable). */
  def decodeColumnar(media: DataFrame): DataFrame = {
    val n = length(col("bytes")).cast("long")
    media.select(
      col("media_id"), col("media_type"),
      n.as("n_bytes"),
      (n % 64 + 1).cast("int").as("width"),
      ((n / 64) % 64 + 1).cast("int").as("height"),
      (n % 7 + 1).cast("int").as("n_frames"),
      md5(col("bytes")).as("content_digest"))
  }

  /** The ONE frame-slicing expression ([[frameSample]] and
    * [[framePooling]] share it, so offset geometry cannot silently
    * diverge between q72 and q215): every k-th byte offset as a
    * pseudo-frame slice (a real impl slices at codec boundaries). */
  private def framesExpr(everyK: Int, frameBytes: Int) =
    transform(
      sequence(lit(1), greatest(length(col("bytes")), lit(1)), lit(everyK)),
      off => col("bytes").substr(off, lit(frameBytes)))

  /** Frame sampling: [[framesExpr]] materialized per media row. Narrow,
    * binary column never shuffled. */
  def frameSample(media: DataFrame, everyK: Int, frameBytes: Int): DataFrame =
    media.select(col("media_id"),
      framesExpr(everyK, frameBytes).as("frames"))

  /** TEMPORAL POOLING over sampled frames — the video-embedding
    * pipeline shape end to end: sample frames ([[frameSample]]'s
    * slices), extract a per-frame feature vector, mean-pool into ONE
    * vector per media item. The per-frame "model" is the stub tier
    * (4 integer features = the frame digest's hex quads, 0..65535 —
    * a real deployment swaps in an encoder batch call at exactly this
    * point), but the pipeline shape is the real one: explode to frame
    * rows → ONE digest per frame → narrow quad projection →
    * map-side-combinable sums → integer floor-mean. The binary payload
    * never shuffles (frames derive in the projection; only 4 longs per
    * frame reach the aggregate), and the pooled output is exact
    * integers, engine-reproducible.
    * Returns (media_id, n_frames, f0..f3), f_i = Σ quad_i div n. */
  def framePooling(media: DataFrame, everyK: Int, frameBytes: Int): DataFrame = {
    val frames = framesExpr(everyK, frameBytes)
    val quads = (0 until 4).map { i =>
      conv(substring(col("_h"), i * 4 + 1, 4), 16, 10)
        .cast("long").as(s"_q$i")
    }
    media
      .select(col("media_id"), explode(frames).as("_f"))
      .select(col("media_id"), md5(col("_f")).as("_h"))
      .select(col("media_id") +: quads: _*)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("_q0")).as("_s0"), sum(col("_q1")).as("_s1"),
        sum(col("_q2")).as("_s2"), sum(col("_q3")).as("_s3"))
      .select(col("media_id"), col("n_frames"),
        expr("_s0 div n_frames").as("f0"),
        expr("_s1 div n_frames").as("f1"),
        expr("_s2 div n_frames").as("f2"),
        expr("_s3 div n_frames").as("f3"))
  }

  /** PERCEPTUAL AVERAGE-HASH (aHash) over the payload — the classic
    * 64-bit image near-dup fingerprint, built on the stub tier: the
    * payload is cut into 64 equal byte slices ("pixels" — a real
    * deployment swaps in decoded 8×8 grayscale at exactly this point),
    * each slice reduces to a 16-bit digest value, and bit j is 1 iff
    * pixel j exceeds the 64-pixel floor-mean. Slice locality is the
    * point: a local edit to the payload disturbs only the slices that
    * cover it, so small payload diffs yield small Hamming distances —
    * the property Hamming-banded search ([[ahashNearDup]]) exploits.
    *
    * The 64 bits are carried as FOUR 16-bit band integers (not one
    * int64: the top band would need the sign bit, and 16-bit bands are
    * exactly the LSH blocks the near-dup join buckets on). Everything
    * is a narrow codegen projection — the binary column never
    * shuffles; only (id, 4 smallints) leave the scan.
    * Output: (media_id, n_bytes, bands array<long> of 4). */
  def averageHash64(media: DataFrame): DataFrame = {
    // slice width: floor div, NOT `/` (Spark's `/` on ints is double division)
    val wi = expr("(length(bytes) + 63) div 64")
    val px = transform(sequence(lit(0), lit(63)), j =>
      conv(substring(md5(col("bytes").substr(j * wi + 1, wi)), 1, 4), 16, 10)
        .cast("long"))
    val bits = (mean: Column, pxc: Column) =>
      transform(sequence(lit(0), lit(3)), g =>
        aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, j) =>
          acc + when(element_at(pxc, g * 16 + j + 1) > mean,
            call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)))
    media
      .select(col("media_id"), length(col("bytes")).cast("long").as("n_bytes"),
        px.as("_px0"))
      // Generate barrier: the mean + band expressions below reference
      // the pixel array ~64 times, and lambda-bearing expressions are
      // interpreted (no codegen CSE) — without this barrier
      // CollapseProject inlines the 64-md5 transform into EVERY
      // reference, an O(64²) hashing blowup (measured 214 s → 1.3 s at
      // sf0.1; DESIGN.md §5's CollapseProject lesson). explode of a
      // 1-element array materializes the array once per row, no
      // shuffle, no row-count change.
      .select(col("media_id"), col("n_bytes"),
        explode(array(col("_px0"))).as("_px"))
      .select(col("media_id"), col("n_bytes"), col("_px"),
        (aggregate(col("_px"), lit(0L), _ + _) / lit(64)).cast("long")
          .as("_mean0"))
      // second barrier: the 64 bit-threshold clauses each reference the
      // mean — materialize it once, same no-shuffle explode trick
      .select(col("media_id"), col("n_bytes"), col("_px"),
        explode(array(col("_mean0"))).as("_mean"))
      .select(col("media_id"), col("n_bytes"),
        bits(col("_mean"), col("_px")).as("bands"))
  }

  /** Hamming near-dup pairs over [[averageHash64]] fingerprints via
    * 16-bit band blocking: two payloads within Hamming distance
    * `maxHamming` ≤ 3 of each other agree on at least one of the 4
    * bands (pigeonhole), so candidate generation is an equi-join on
    * (band_index, band_value) — never an all-pairs product — and the
    * exact 64-bit Hamming distance is then verified on the candidate
    * pairs only (the [[graft.operators.Dedup]] LSH posture). The band
    * arrays (4 longs) ride along with the candidates, so verification
    * needs no join back to the corpus. Byte-identical payloads land at
    * distance 0. Output: (media_id_a, media_id_b, hamming),
    * media_id_a < media_id_b, one row per pair. */
  def ahashNearDup(media: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming in [0,3], got $maxHamming — pigeonhole over 4 bands " +
        "guarantees candidate recall only below the band count")
    // ScanScale: the 64-slice-pixel averaging is map work a
    // single-split payload scan serializes (no-op on real inputs).
    val hashed = averageHash64(ScanScale.parallelized(media))
    val keyed = hashed.select(col("media_id"), col("bands"),
      posexplode(col("bands")).as(Seq("_g", "_b")))
    val a = keyed.select(col("media_id").as("media_id_a"),
      col("bands").as("_ba"), col("_g"), col("_b"))
    val b = keyed.select(col("media_id").as("media_id_b"),
      col("bands").as("_bb"), col("_g"), col("_b"))
    a.join(b, Seq("_g", "_b"))
      .filter(col("media_id_a") < col("media_id_b"))
      .select(col("media_id_a"), col("media_id_b"),
        col("_ba"), col("_bb"))
      .distinct()
      .select(col("media_id_a"), col("media_id_b"),
        aggregate(zip_with(col("_ba"), col("_bb"),
          (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
          lit(0L), _ + _).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
