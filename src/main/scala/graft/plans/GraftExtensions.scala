package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Builder-time registration of the graft planner extensions — the
  * `SparkSessionExtensions` route for deployments that own session
  * construction:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  *   // or: .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *   .getOrCreate()
  * }}}
  *
  * Library entry points that receive an already-built session
  * (`AsOfJoin.asOfNative`) register the same strategy idempotently via
  * `spark.experimental.extraStrategies` instead, so either path works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // the declarative md5-prefix chain accelerates session-wide
    // (bit-identical; see DigestChainRewrite)
    extensions.injectOptimizerRule(_ => DigestChainRewrite)
  }
}
