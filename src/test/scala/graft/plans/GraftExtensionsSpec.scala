package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.SparkSessionExtensions

/** The builder-time registration path must register exactly the same
  * strategy object the runtime path (`experimental.extraStrategies`)
  * uses, so either route plans AsOfJoinPlan identically. */
class GraftExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects the as-of planner strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies =
      org.apache.spark.sql.graftshim.Bridge.plannerStrategies(ext, spark)
    assert(strategies.contains(AsOfJoinStrategy))
  }
}
