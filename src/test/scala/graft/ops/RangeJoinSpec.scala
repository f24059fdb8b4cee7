package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the bin-to-equi-key range joins: exact equivalence to
  * the naive non-equi join (the bin key must be a pure candidate
  * generator), and the plan property that justifies their existence —
  * a hash equi-join on the bin id where the naive formulation plans a
  * broadcast-nested-loop.
  */
class RangeJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ev = graft.Tables.events(spark, sf)

  private def intervals(lo: Long, hi: Long, p: String) =
    ev.filter(col("event_id") >= lo && col("event_id") < hi)
      .select(col("event_id").as(s"${p}_id"), col("value").as(s"${p}_lo"),
        (col("value") + (col("user_id") % 5) + 1).as(s"${p}_hi"))

  test("binnedPointJoin returns exactly the naive non-equi join's pairs") {
    val ivl = intervals(0, 200, "i")
    val fact = ev.select(col("event_id").as("f_id"), col("value"))
    val binned = RangeJoin.binnedPointJoin(fact, "value", ivl, "i_lo", "i_hi", 8.0)
      .select(col("f_id"), col("i_id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = fact.join(ivl, col("value") >= col("i_lo") && col("value") < col("i_hi"))
      .select(col("f_id"), col("i_id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(binned.length === naive.length)
    assert(binned === naive)
  }

  test("binnedOverlapJoin returns exactly the naive overlap join's pairs, each once") {
    val a = intervals(0, 150, "a")
    val b = intervals(150, 300, "b")
    val binned = RangeJoin
      .binnedOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", Seq("a_id", "b_id"), 8.0)
      .select(col("a_id"), col("b_id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select(col("a_id"), col("b_id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(binned === naive)
    assert(binned.distinct.length === binned.length, "pairs must surface exactly once")
  }

  test("bin width does not change the answer (candidate generator only)") {
    val ivl = intervals(0, 100, "i")
    val fact = ev.select(col("event_id").as("f_id"), col("value"))
    def res(w: Double) =
      RangeJoin.binnedPointJoin(fact, "value", ivl, "i_lo", "i_hi", w)
        .select(col("f_id"), col("i_id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(res(2.0) === res(8.0))
    assert(res(8.0) === res(64.0))
  }

  test("property: binned == naive on generated data (negatives, empties, boundary values)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    def samples[A](g: Gen[A], n: Int, salt: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(salt + i)))
    // values straddle zero and land on exact bin boundaries (multiples of
    // the widths under test); intervals include zero-length (lo == hi,
    // matches nothing half-open) and reversed (hi < lo) degenerates
    val valGen = Gen.oneOf(
      Gen.chooseNum(-100.0, 100.0),
      Gen.chooseNum(-12, 12).map(_ * 8.0),
      Gen.chooseNum(-12, 12).map(_ * 2.0))
    val ivlGen = for {
      lo <- valGen
      len <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-5.0, 40.0))
    } yield (lo, lo + len)
    val facts = samples(valGen, 300, 0xACE0L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("f_id", "value")
    val ivls = samples(ivlGen, 60, 0xBEEFL).zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("i_id", "i_lo", "i_hi")
    val naive = facts.join(ivls, col("value") >= col("i_lo") && col("value") < col("i_hi"))
      .select(col("f_id"), col("i_id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    Seq(2.0, 8.0, 512.0).foreach { w =>
      val binned = RangeJoin.binnedPointJoin(facts, "value", ivls, "i_lo", "i_hi", w)
        .select(col("f_id"), col("i_id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(binned === naive, s"divergence at bin width $w")
    }
  }

  test("the binned plan is a hash equi-join on the bin id, not a nested loop") {
    val ivl = intervals(0, 200, "i")
    val plan = RangeJoin
      .binnedPointJoin(ev.select(col("value")), "value", ivl, "i_lo", "i_hi", 8.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned join must not plan a nested loop:\n$plan")
    assert(plan.contains("__bin"), plan)
    // and the naive formulation of the same join demonstrably DOES nested-loop
    val naivePlan = ev.select(col("value"))
      .join(ivl, col("value") >= col("i_lo") && col("value") < col("i_hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"),
      s"expected the naive non-equi join to nested-loop (it had no join key):\n$naivePlan")
  }
}
