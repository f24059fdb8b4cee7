package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of the fixed-point Lloyd trainer (ops/KMeans.scala) beyond
  * what the q117 oracle pins: reduction exactness, the empty-cluster
  * guard, Lloyd monotonicity, determinism, and the no-corpus-shuffle
  * plan shape that is the operator's whole 100 TB argument.
  */
class KMeansSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def corpus = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), KMeans.quantize(col("embedding")).as("xq"))

  test("VecSumLong equals the explode-and-sum reference elementwise") {
    val vsum = udaf(new graft.functions.VecSumLong(64))
    val viaAgg = corpus.agg(vsum(col("xq")).as("s"))
      .collect()(0).getSeq[Long](0)
    val viaExplode = corpus
      .select(posexplode(col("xq")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(sum(col("x")).as("sx"))
      .orderBy(col("i")).collect().map(_.getLong(1)).toSeq
    assert(viaAgg == viaExplode)
  }

  test("quantization is exact: floor(float*2^24) round-trips the float") {
    // x == xq/2^24 exactly whenever the float's lowest set bit is
    // >= 2^-24 — true for ~all unit-scale floats; for the rest the
    // error is < 2^-24 and STILL engine-identical (floor of the same
    // double). Spot-check the first vectors.
    val r = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 4)
      .select(col("embedding"), KMeans.quantize(col("embedding")).as("xq"))
      .collect()
    r.foreach { row =>
      val f = row.getSeq[Float](0)
      val q = row.getSeq[Long](1)
      f.zip(q).foreach { case (x, xi) =>
        assert(xi == math.floor(x.toDouble * KMeans.Quant).toLong)
      }
    }
  }

  test("three Lloyd rounds are deterministic: identical output twice") {
    def once() = graft.queries.ClusterOps.q117KmeansLloyd
      .fn(spark, sf).collect().toSeq
    assert(once() == once())
  }

  test("Lloyd inertia is non-increasing across rounds") {
    val c = corpus.persist()
    def inertia(iters: Int): Double = {
      val (assigned, _) = KMeans.run(c, 8, 64, iters)
      assigned.agg(sum(col("dist"))).collect()(0).getDouble(0)
    }
    val i1 = inertia(1)
    val i2 = inertia(2)
    val i3 = inertia(3)
    // the update is the exact integer mean double-rounded once, so the
    // classical monotonicity argument holds up to one ulp per dim
    val eps = 1e-6 * math.abs(i1)
    assert(i2 <= i1 + eps, s"$i2 > $i1")
    assert(i3 <= i2 + eps, s"$i3 > $i2")
    c.unpersist()
  }

  test("an emptied cluster keeps its previous centroid (Lloyd guard)") {
    import spark.implicits._
    // init points 0 and 1 share the SAME vector, so round 1 assigns
    // everything to cid 0 (dist tie → lower cid) and cluster 1 is
    // empty. The guard must freeze cluster 1's centroid at its init
    // (0,0) — which is precisely why round 2 then re-captures points
    // 0 and 1 (cluster 0's centroid moved to the round-1 mean (0.75,
    // 0.75), farther from the origin than the frozen (0,0)). A broken
    // guard (null/dropped centroid) would lose cluster 1 entirely.
    val rows = Seq(
      (0L, Array(0L, 0L)),
      (1L, Array(0L, 0L)),
      (2L, Array(1L, 1L)),
      (3L, Array(2L, 2L))).toDF("vec_id", "xq")
    val (assigned, cents) = KMeans.run(rows, 2, 2, 2)
    val a = assigned.orderBy("vec_id").collect()
    assert(a.map(_.getInt(1)).toSeq == Seq(1, 1, 0, 0), a.mkString(","))
    val mu = cents.orderBy("cid").collect()
    // round-2 update: cluster 0 = mean{(1,1),(2,2)}, cluster 1 = origin
    assert(mu(0).getSeq[Double](1) == Seq(1.5, 1.5))
    assert(mu(1).getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("plan shape: the corpus is never shuffled — no vec_id exchange, assignment is a broadcast fold") {
    val plan = graft.queries.ClusterOps.q117KmeansLloyd
      .fn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(vec_id"),
      "assignment must stay map-side; a vec_id exchange means the corpus shuffles per iteration\n" + plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "codebook must ride a broadcast\n" + plan)
  }
}
