package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The optimizer-rule tier: the declarative digest chain rewrites to
  * the native expression session-wide, bit-identically, and near-miss
  * shapes pass through untouched. */
class DigestChainRewriteSpec extends SparkTestBase {

  import spark.implicits._

  private val chain =
    "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DigestChainRewrite
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == DigestChainRewrite)
  }

  test("the declarative chain rewrites to Md5Prefix64 and stays bit-identical") {
    // non-foldable source (literal relations constant-fold away), and
    // the frame is REBUILT inside withRule: a DataFrame caches its
    // queryExecution lazily, so a pre-rule instance would show the
    // pre-rule plan forever
    def base = graft.Tables.load(spark, sfDir, "documents")
      .selectExpr("doc_id",
        "cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint) as d")
      .orderBy("doc_id").limit(50)
    val want = base.collect().map(_.getLong(1)).toSeq  // un-rewritten
    withRule {
      val df = base
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_md5_prefix64"), s"no rewrite in:\n$opt")
      assert(!opt.contains("conv("))
      val got = df.collect().map(_.getLong(1)).toSeq
      assert(got == want)
    }
  }

  test("near-miss chains are left alone") {
    val df = Seq("abc").toDF("s")
    withRule {
      // wrong prefix length: 14 hex digits is NOT the 60-bit digest
      val p14 = df.selectExpr(
        "cast(conv(substring(md5(s), 1, 14), 16, 10) as bigint) as d")
        .queryExecution.optimizedPlan.toString
      assert(!p14.contains("graft_md5_prefix64"))
      // wrong start position: not the hex PREFIX
      val p2 = df.selectExpr(
        "cast(conv(substring(md5(s), 2, 15), 16, 10) as bigint) as d")
        .queryExecution.optimizedPlan.toString
      assert(!p2.contains("graft_md5_prefix64"))
      // genuinely binary input stays on the built-in path (the native
      // expression's contract is string input)
      val bin = df.selectExpr(
        "cast(conv(substring(md5(cast(s as binary)), 1, 15), 16, 10) as bigint) as d")
      // binary-of-string still qualifies (it IS the analyzer's implicit
      // cast shape) — equality must hold there too
      val wantBin = bin.collect().map(_.getLong(0)).toSeq
      assert(wantBin.nonEmpty)
    }
  }

  test("a corpus-scale expression under the rule matches the un-rewritten run") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("s")).limit(3000)
    // modular fold: a raw sum of 60-bit digests overflows int64 under
    // ANSI; the residues compare exactly just the same
    val want = docs.selectExpr(s"$chain as d")
      .selectExpr("d % 1000000007 as m")
      .agg(sum("m"), count(lit(1))).collect().head
    withRule {
      val got = docs.selectExpr(s"$chain as d")
        .selectExpr("d % 1000000007 as m")
        .agg(sum("m"), count(lit(1))).collect().head
      assert(got == want)
    }
  }
}
