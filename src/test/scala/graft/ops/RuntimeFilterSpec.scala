package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime (bloom-filter) join pruning — Catalyst's SPARK-32268 runtime
  * filtering: when one join side is small and selective, the optimizer
  * injects a bloom filter built from it into the OTHER side's scan
  * stage, discarding non-joining rows before the shuffle. At 100 TB
  * this is the difference between shuffling the full fact table and
  * shuffling only the ~matching fraction — the runtime sibling of
  * static partition pruning (already spec-pinned in PlanAuditSpec).
  * Thresholds are lowered here because the test tables are far below
  * the production defaults (10 MB creation side / 10 GB probe scan).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dimension injects a bloom might_contain filter into the fact scan") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    val orders = graft.Tables.orders(s2, "/root/testdata/sf0.01")
    val lineitem = graft.Tables.lineitem(s2, "/root/testdata/sf0.01")
    val filtered = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val joined = lineitem.join(filtered, col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a runtime bloom filter (might_contain) on the fact side:\n$plan")
    // and it must not change the answer
    val expected = lineitem.join(filtered.hint("broadcast"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expected)
  }
}
