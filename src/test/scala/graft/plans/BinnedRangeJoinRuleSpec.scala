package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the opt-in Catalyst rewrite of naive non-equi range
  * joins: the rule must change the PLAN (hash join on bin ids instead
  * of a nested loop) without changing the ANSWER, must key off the
  * width config, and must leave non-matching joins untouched.
  */
class BinnedRangeJoinRuleSpec extends SparkSpec {

  // session-level imperative injection (the config-based path is
  // spark.sql.extensions=graft.functions.GraftExtensions); the rule is
  // inert while the width conf is unset, so other suites see no change
  spark.experimental.extraOptimizations =
    (spark.experimental.extraOptimizations :+ BinnedRangeJoinRule).distinct

  private val sf = "/root/testdata/sf0.001"

  private def naiveJoin = {
    val ev = graft.Tables.events(spark, sf)
    val ivl = ev.filter(col("event_id") < 200)
      .select(col("event_id").as("i_id"), col("value").as("i_lo"),
        (col("value") + (col("user_id") % 5) + 1).as("i_hi"))
    ev.select(col("event_id").as("f_id"), col("value"))
      .join(ivl, col("value") >= col("i_lo") && col("value") < col("i_hi"))
      .select(col("f_id"), col("i_id"))
  }

  private def withWidth[A](w: String)(body: => A): A =
    withConf(BinnedRangeJoinRule.WidthKey -> w)(body)

  test("with the width conf set, the naive join plans as a hash join on bin ids") {
    val plan = withWidth("8.0")(naiveJoin.queryExecution.executedPlan.toString)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("__bin"), plan)
  }

  test("without the conf the rule is inert and the naive plan nested-loops") {
    val plan = naiveJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      s"expected the untouched naive plan:\n$plan")
  }

  test("the rewrite is answer-preserving") {
    val off = naiveJoin.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val on = withWidth("8.0")(naiveJoin.collect().map(r => (r.getLong(0), r.getLong(1))).sorted)
    assert(on === off)
    assert(on.nonEmpty)
  }

  test("a join with an extra equi conjunct is left alone (already hash-joinable)") {
    val ev = graft.Tables.events(spark, sf)
    val ivl = ev.filter(col("event_id") < 200)
      .select(col("event_id").as("i_id"), col("user_id").as("i_uid"),
        col("value").as("i_lo"), (col("value") + 5).as("i_hi"))
    val j = ev.select(col("event_id").as("f_id"), col("user_id"), col("value"))
      .join(ivl, col("user_id") === col("i_uid") &&
        col("value") >= col("i_lo") && col("value") < col("i_hi"))
    val plan = withWidth("8.0")(j.queryExecution.executedPlan.toString)
    assert(!plan.contains("__bin"), s"rule fired on an equi-keyed join:\n$plan")
  }
}
