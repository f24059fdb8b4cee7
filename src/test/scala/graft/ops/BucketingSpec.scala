package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketing contract: a join between two tables bucketed the same
  * way on the join key runs WITHOUT any Exchange — the shuffle was paid
  * once at write time (the 100 TB amortization Bucketing's doc claims).
  */
class BucketingSpec extends SparkSpec {

  test("join of two co-bucketed tables is exchange-free and matches the plain join") {
    val s = spark
    import s.implicits._
    val facts = (1 to 5000)
      .map(i => (i.toLong % 97, i.toLong, s"f$i")).toDF("k", "row_id", "fv")
    val dims = (0L to 96L).map(k => (k, s"d$k")).toDF("k", "dv")

    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)
    val bf = Bucketing.readBucketed(s, "b_facts")
    val bd = Bucketing.readBucketed(s, "b_dims")

    // broadcast would bypass the bucketing proof — force the merge path
    val joined = bf.hint("merge").join(bd, Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"),
      s"co-bucketed join must not shuffle either side:\n$plan")
    // NOTE a per-task local Sort remains: since SPARK-28595 the scan
    // never exposes write-time in-bucket sortedness to the planner
    // (multi-split reads can't guarantee it), so sortBy buys a
    // mostly-sorted input for that linear local sort — only the
    // EXCHANGE is eliminated, which is the part that matters at scale
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.contains("SortMergeJoin"), plan)

    // and the answer is the plain join's answer
    val plain = facts.join(dims, Seq("k")).select("k", "row_id", "fv", "dv")
    val viaBuckets = joined.select("k", "row_id", "fv", "dv")
    assert(viaBuckets.count() === plain.count())
    assert(viaBuckets.exceptAll(plain).isEmpty && plain.exceptAll(viaBuckets).isEmpty)
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val s = spark
    import s.implicits._
    val facts = (1 to 3000).map(i => (i.toLong % 53, i.toLong)).toDF("k", "v")
    Bucketing.writeBucketed(facts, "b_agg", "k", 8)
    val agg = Bucketing.readBucketed(s, "b_agg").groupBy("k").agg(sum("v").as("sv"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must reuse the write-time partitioning:\n$plan")
    // value parity with the unbucketed aggregation
    val expect = facts.groupBy("k").agg(sum("v").as("sv"))
    assert(agg.exceptAll(expect).isEmpty && expect.exceptAll(agg).isEmpty)
  }
}
