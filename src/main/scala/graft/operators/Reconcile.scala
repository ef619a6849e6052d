package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation digests (anti-entropy): collapse each
  * bucket of rows to the XOR of their 60-bit row hashes. Two table
  * versions then compare by shipping |buckets| (digest, count) rows
  * instead of the tables — the first level of a Merkle comparison,
  * which is how a 100 TB replica check moves kilobytes, not data.
  * Mismatched buckets localize the diff for a targeted row-level
  * repair pass over just those buckets.
  *
  * XOR is commutative/associative/self-inverse, so the aggregate is
  * map-side partial, order-independent, and incrementally maintainable
  * (apply a changed row's hash twice to remove it). Collisions: XOR of
  * 60-bit md5 prefixes — adversarial inputs could cancel, fine for
  * ops-grade drift detection (use the full md5 and a real Merkle tree
  * for cryptographic guarantees). Row strings must be built from
  * deterministically-rendered columns (integers; quantized cents for
  * money — never raw float-to-string).
  */
object Reconcile {

  /** Per-`bucket` digest of `rowStr`: (bucket, n_rows, digest). */
  def digest(df: DataFrame, bucket: Column, rowStr: Column): DataFrame = {
    graft.functions.Md5Prefix64.register(df.sparkSession)
    df.select(bucket.as("bucket"),
      call_function(graft.functions.Md5Prefix64.name, rowStr).as("_h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_h)").as("digest"))
  }
}
